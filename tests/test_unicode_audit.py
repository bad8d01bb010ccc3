from __future__ import annotations

from schema_validator_spark.operators.codequality import (
    BIDI_CONTROL_CHARS,
    CONFUSABLE_CHARS,
    ZERO_WIDTH_CHARS,
    unicode_audit,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _one(spark, content):
    df = spark.createDataFrame([(1, content)], "id long, content string")
    return unicode_audit(df, "content", keep_cols=["id"]).collect()[0]


def test_trojan_source_bidi(spark):
    # the published CVE-2021-42574 early-return example: RLO+LRI
    # reorder a comment so `return` looks commented out
    src = "if accessimpoint == 'user‮ ⁦// check admin'"
    r = _one(spark, src)
    assert r["n_bidi"] == 2
    assert r["verdict"] == "bidi"


def test_every_bidi_char_counts(spark):
    for ch in BIDI_CONTROL_CHARS:
        r = _one(spark, f"x = 1{ch}")
        assert r["n_bidi"] == 1, hex(ord(ch))
        assert r["verdict"] == "bidi"


def test_zero_width_identifier_split(spark):
    # CVE-2021-42694: ZWSP inside an identifier forges a lookalike
    for ch in ZERO_WIDTH_CHARS:
        r = _one(spark, f"def is{ch}Admin(): pass")
        assert r["n_zero_width"] == 1, hex(ord(ch))
        assert r["verdict"] == "invisible"


def test_homoglyph_in_ascii_identifier_flags(spark):
    # Cyrillic е embedded in an ASCII identifier -> adjacency on both
    # sides -> mixed_script
    r = _one(spark, "def sеcure(): pass")
    assert r["n_confusable"] == 1
    assert r["n_mixed_script"] >= 1
    assert r["verdict"] == "mixed_script"


def test_legitimate_cyrillic_comment_is_clean(spark):
    # an all-Cyrillic comment word has confusables but NO ASCII
    # adjacency (the char before/after each confusable is Cyrillic or
    # punctuation) -> must NOT flag
    r = _one(spark, "x = 1  # проверка данных\n")
    assert r["n_confusable"] > 0
    assert r["n_mixed_script"] == 0
    assert r["verdict"] == "clean"


def test_priority_bidi_over_invisible(spark):
    r = _one(spark, "a‮ b​ cеx")
    assert (r["n_bidi"], r["n_zero_width"]) == (1, 1)
    assert r["n_mixed_script"] == 1
    assert r["verdict"] == "bidi"


def test_clean_ascii_and_null(spark):
    assert _one(spark, "def f():\n    return 1\n")["verdict"] == "clean"
    r = _one(spark, None)
    assert (r["n_bidi"], r["n_zero_width"], r["n_confusable"]) == (0, 0, 0)
    assert r["verdict"] == "clean"


def test_plan_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame(
        [(i, "x = 1") for i in range(8)], "id long, content string"
    )
    out = unicode_audit(df, "content", keep_cols=["id"])
    assert n_exchanges(out) == 0
    assert not uses_python(out)
