from __future__ import annotations

import math

from schema_validator_spark.functions.identifiers import casing_profile

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = casing_profile(df, "content", "lang")
    return {r["lang"]: r for r in got.collect()}


def test_class_partition(spark):
    # unregistered lang: no keyword filtering, every token counted
    content = "CONST_A MyClass my_var myVar plain _priv mid_Case"
    r = _run(spark, [(0, "rust", content)])["rust"]
    assert r["n_ids"] == 7
    assert r["n_upper"] == 1  # CONST_A
    assert r["n_pascal"] == 1  # MyClass
    assert r["n_snake"] == 1  # my_var
    assert r["n_camel"] == 1  # myVar
    assert r["n_lower"] == 1  # plain
    assert r["n_other"] == 2  # _priv, mid_Case
    assert math.isclose(r["snake_share"], 1 / 7, rel_tol=1e-4)


def test_keywords_excluded(spark):
    r = _run(spark, [(0, "py", "def my_func(): return my_func")])["py"]
    # def/return are keywords; my_func twice
    assert r["n_ids"] == 2 and r["n_snake"] == 2
    assert r["snake_share"] == 1.0


def test_single_uppercase_letter_is_upper(spark):
    r = _run(spark, [(0, "rust", "T X9 A_B")])["rust"]
    assert r["n_upper"] == 3 and r["n_pascal"] == 0


def test_null_content_and_lang(spark):
    got = _run(spark, [(0, None, None)])
    r = got[""]
    assert r["n_ids"] == 0
    assert r["snake_share"] is None


def test_langs_aggregate_separately(spark):
    got = _run(
        spark,
        [(0, "py", "alpha_one beta_two"), (1, "js", "alphaOne betaTwo")],
    )
    assert got["py"]["n_snake"] == 2 and got["py"]["n_camel"] == 0
    assert got["js"]["n_camel"] == 2 and got["js"]["n_snake"] == 0


def test_digits_inside_classes(spark):
    r = _run(spark, [(0, "rust", "var2name my2Var HTTP2")])["rust"]
    assert r["n_lower"] == 1  # var2name
    assert r["n_camel"] == 1  # my2Var
    assert r["n_upper"] == 1  # HTTP2
