from __future__ import annotations

from schema_validator_spark.functions.text import script_mix
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _one(spark, content):
    df = spark.createDataFrame([(1, content)], "id long, content string")
    return script_mix(df, "content", keep_cols=["id"]).collect()[0]


def test_pure_ascii_code(spark):
    r = _one(spark, "def f(): return 42\n")
    assert r["n_latin"] == 10
    assert r["dominant_script"] == "latin"


def test_cjk_comment_dominates(spark):
    r = _one(spark, "x = 1  # 这是一个测试注释，用于验证\n")
    assert r["n_cjk"] == 12
    assert r["n_latin"] == 1
    assert r["dominant_script"] == "cjk"


def test_each_script_counts(spark):
    samples = {
        "cyrillic": "привет",
        "greek": "γεια",
        "kana": "こんにちは",
        "hangul": "안녕하세요",
        "arabic": "مرحبا",
        "devanagari": "नमस्ते",
    }
    for name, word in samples.items():
        r = _one(spark, word)
        assert r[f"n_{name}"] > 0, name
        assert r["dominant_script"] == name, name


def test_latin_accents_count_as_latin(spark):
    r = _one(spark, "café naïve Ā")
    assert r["n_latin"] == len("café") + len("naïve") + 1
    assert r["dominant_script"] == "latin"


def test_tie_breaks_by_class_order(spark):
    # 2 latin letters vs 2 cyrillic letters -> latin (declared first)
    r = _one(spark, "ab пр")
    assert r["n_latin"] == r["n_cyrillic"] == 2
    assert r["dominant_script"] == "latin"


def test_no_letters_and_null(spark):
    assert _one(spark, "123 +-*/ \n")["dominant_script"] == "none"
    assert _one(spark, None)["dominant_script"] == "none"


def test_plan_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(8)], "id long, content string"
    )
    out = script_mix(df, "content", keep_cols=["id"])
    assert n_exchanges(out) == 0
    assert not uses_python(out)
