from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.codedup import code_tokens
from schema_validator_spark.operators.search import (
    bm25_score_py,
    bm25_search,
)

SCHEMA = "doc_id long, content string"

DOCS = [
    (0, "def serialize(obj): return json dumps obj"),
    (1, "mutex lock mutex unlock mutex retry"),
    (2, "quicksort partition pivot quicksort"),
    (3, "serialize mutex serialize"),
    (4, "nothing relevant here at all whatsoever"),
    (5, "serialize"),
]
TERMS = ["serialize", "mutex", "quicksort"]


def _tok(content: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9_]+", content.lower()) if t]


def _run(spark, rows, terms, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return bm25_search(
        df, "doc_id", code_tokens(F.col("content")), terms, **kw
    )


def test_bm25_matches_serial_replay(spark):
    got = {
        r["doc_id"]: r["score_e6"]
        for r in _run(spark, DOCS, TERMS).collect()
    }
    want = bm25_score_py({i: _tok(c) for i, c in DOCS}, TERMS)
    assert got == want
    assert 4 not in got  # no matched term -> excluded


def test_bm25_matched_terms_and_score_sign(spark):
    got = {r["doc_id"]: r for r in _run(spark, DOCS, TERMS).collect()}
    assert got[3]["matched_terms"] == 2
    assert got[5]["matched_terms"] == 1
    assert all(r["score_e6"] > 0 for r in got.values())
    for r in got.values():
        assert r["score"] == pytest.approx(r["score_e6"] / 1e6)


def test_bm25_tf_saturation_and_length_norm(spark):
    got = {
        r["doc_id"]: r["score_e6"]
        for r in _run(spark, DOCS, ["mutex"]).collect()
    }
    # only docs 1 and 3 contain mutex; doc 1 has tf=3 in a len-5 doc
    assert set(got) == {1, 3}
    assert got[1] > got[3]


def test_bm25_top_k_ranks_deterministically(spark):
    out = _run(spark, DOCS, TERMS, top_k=3).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3,
    ]
    full = sorted(
        _run(spark, DOCS, TERMS).collect(),
        key=lambda r: (-r["score_e6"], r["doc_id"]),
    )
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        r["doc_id"] for r in full[:3]
    ]


def test_bm25_arg_validation(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    tk = code_tokens(F.col("content"))
    with pytest.raises(ValueError):
        bm25_search(df, "doc_id", tk, [])
    with pytest.raises(ValueError):
        bm25_search(df, "doc_id", tk, ["a", "a"])
    with pytest.raises(ValueError):
        bm25_search(df, "doc_id", tk, ["a"], k1=0)
    with pytest.raises(ValueError):
        bm25_search(df, "doc_id", tk, ["a"], b=1.5)
    with pytest.raises(ValueError):
        bm25_search(df, "doc_id", tk, ["a"], top_k=0)
