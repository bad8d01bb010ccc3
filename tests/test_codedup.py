from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.functions.text import array_shingles
from schema_validator_spark.operators.codedup import (
    code_tokens,
    near_dup_code,
)

SCHEMA = "doc_id long, lang string, content string"

GPL = "# Copyright Acme Corp\n# GNU General Public License v2\n\n"
MIT = "# MIT License\n# Copyright Contributors\n\n"


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    kw.setdefault("shingle_k", 2)
    kw.setdefault("num_hashes", 32)
    kw.setdefault("bands", 16)
    kw.setdefault("jaccard_threshold", 0.8)
    got = near_dup_code(df, "doc_id", "content", "lang", **kw).collect()
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}


def _body(k: str) -> str:
    return (
        f"def f{k}(a{k}, b{k}):\n"
        f"    t{k} = a{k} + b{k}\n"
        f"    u{k} = t{k} + a{k}\n"
        f"    v{k} = u{k} + b{k}\n"
        f"    return v{k}\n"
    )


def test_code_tokens_lowercase_and_punct(spark):
    df = spark.createDataFrame([(0,)], "i long").select(
        code_tokens(F.lit("def Foo(x_1):  return x_1+2 # ok")).alias("t")
    )
    assert df.first()["t"] == [
        "def", "foo", "x_1", "return", "x_1", "2", "ok"
    ]


def test_array_shingles_short_array(spark):
    df = spark.createDataFrame([(0,)], "i long").select(
        array_shingles(F.array(F.lit("a")), 3).alias("s"),
        array_shingles(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")), 2
        ).alias("s2"),
    )
    r = df.first()
    assert r["s"] == ["a"]
    assert sorted(r["s2"]) == ["a b", "b c"]


def test_near_dup_found_despite_formatting_and_header(spark):
    # 0 vs 1: identical token stream, different headers + formatting
    got = _pairs(spark, [
        (0, "py", GPL + _body("x")),
        (1, "py", MIT + _body("x").replace("    ", "\t").upper()),
        (2, "py", GPL + _body("zz")),
    ])
    assert got == {(0, 1): 1.0}


def test_shared_header_alone_is_not_similarity(spark):
    # same 2-line GPL header, unrelated bodies: must NOT pair
    got = _pairs(spark, [
        (0, "py", GPL + _body("aa")),
        (1, "py", GPL + _body("bb")),
    ])
    assert got == {}
    # without stripping, the shared header DOES pollute similarity
    raw = _pairs(
        spark,
        [(0, "py", GPL + "x1 = 1\n"), (1, "py", GPL + "y2 = 2\n")],
        strip_headers=False,
        jaccard_threshold=0.3,
    )
    assert (0, 1) in raw


def test_near_dup_tail_append_jaccard(spark):
    # body has 12 distinct bigrams; tail adds 2 -> j = 12/14
    got = _pairs(spark, [
        (0, "py", GPL + _body("k")),
        (1, "py", MIT + _body("k") + "print(z9)\n"),
    ])
    assert got == {(0, 1): round(12 / 14, 6)}
