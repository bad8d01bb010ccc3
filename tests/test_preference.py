from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators.preference import preference_lint
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _lint(spark, rows):
    df = spark.createDataFrame(
        rows, "id long, prompt string, chosen string, rejected string")
    return {r["id"]: r.asDict() for r in
            preference_lint(df, ["id"], "prompt", "chosen",
                            "rejected").collect()}


def test_valid_pair(spark):
    r = _lint(spark, [(1, "q?", "good answer", "bad answer")])[1]
    assert r["first_error"] == "ok" and r["keep"] == 1
    assert r["n_chars_prompt"] == 2
    assert r["n_chars_chosen"] == 11


def test_missing_parts_priority(spark):
    r = _lint(spark, [
        (1, None, "a", "b"),
        (2, "  ", "a", "b"),
        (3, "q", None, "b"),
        (4, "q", "a", ""),
        (5, None, None, None),  # prompt wins the priority chain
    ])
    assert r[1]["first_error"] == "missing_prompt"
    assert r[2]["first_error"] == "missing_prompt"
    assert r[3]["first_error"] == "missing_chosen"
    assert r[4]["first_error"] == "missing_rejected"
    assert r[5]["first_error"] == "missing_prompt"
    assert r[5]["n_chars_prompt"] == 0


def test_identical_exact_vs_folded(spark):
    r = _lint(spark, [
        (1, "q", "same answer", "same answer"),
        (2, "q", "Same   answer", " same answer "),
        (3, "q", "same answer", "different answer"),
    ])
    assert r[1]["first_error"] == "identical"
    assert r[2]["first_error"] == "identical_folded"
    assert r[3]["first_error"] == "ok"


def test_fold_collapses_all_whitespace_kinds(spark):
    r = _lint(spark, [(1, "q", "a\t b\nc", "A B C")])[1]
    assert r["first_error"] == "identical_folded"


def test_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame(
        [(1, "q", "a", "b")],
        "id long, prompt string, chosen string, rejected string")
    out = preference_lint(df, ["id"], "prompt", "chosen", "rejected")
    assert n_exchanges(out) == 0
    assert not uses_python(out)
