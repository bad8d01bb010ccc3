from __future__ import annotations

import math

from schema_validator_spark.operators.halstead import halstead_metrics

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = halstead_metrics(df, ["doc_id"], "content", "lang", **kw)
    return {r["doc_id"]: r for r in got.collect()}


def test_hand_counted_example(spark):
    # py:  x = x + 1
    # operands: x (x2), 1        -> N2=3, n2=2
    # keywords: none; op chars: = + -> N1=2, n1=2
    got = _run(spark, [(0, "py", "x = x + 1")])
    r = got[0]
    assert (r["n1"], r["n2"], r["big_n1"], r["big_n2"]) == (2, 2, 2, 3)
    n, length = 4, 5
    assert math.isclose(r["volume"], length * math.log2(n))
    assert math.isclose(r["difficulty"], (2 / 2.0) * (3 / 2))
    assert math.isclose(r["effort"], r["difficulty"] * r["volume"])


def test_keywords_are_operators_not_operands(spark):
    got = _run(spark, [(0, "py", "if a: return a")])
    r = got[0]
    # keywords if/return (2 occ, 2 distinct); op chars ':' (1)
    assert r["big_n1"] == 3 and r["n1"] == 3
    # operands: a twice
    assert r["big_n2"] == 2 and r["n2"] == 1


def test_multichar_operator_counts_per_char(spark):
    got = _run(spark, [(0, "go", "a == b")])
    r = got[0]
    assert r["big_n1"] == 2 and r["n1"] == 1  # '==' is two '='
    assert r["n2"] == 2


def test_digit_runs_are_operands(spark):
    got = _run(spark, [(0, "js", "v = 10 + 10 + 2")])
    r = got[0]
    # operands: v, 10, 10, 2 -> N2=4, n2=3
    assert r["big_n2"] == 4 and r["n2"] == 3


def test_empty_and_null_content(spark):
    got = _run(spark, [(0, "py", ""), (1, "py", None)])
    for i in (0, 1):
        r = got[i]
        assert r["n1"] == 0 and r["n2"] == 0
        assert r["volume"] == 0.0 and r["difficulty"] == 0.0
        assert r["effort"] == 0.0


def test_unregistered_lang_has_no_keywords(spark):
    got = _run(spark, [(0, "rust", "if x")])
    r = got[0]
    # 'if' is an operand for an unregistered lang (no stop-list)
    assert r["big_n2"] == 2 and r["big_n1"] == 0


def test_operand_only_file_zero_difficulty_path(spark):
    got = _run(spark, [(0, "py", "word")])
    r = got[0]
    assert r["n1"] == 0 and r["n2"] == 1
    # n>0 so volume>0; difficulty = 0 * 1 = 0
    assert r["difficulty"] == 0.0 and r["effort"] == 0.0
