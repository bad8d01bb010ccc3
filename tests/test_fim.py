from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.fim import (
    MIDDLE_TOK,
    PREFIX_TOK,
    SUFFIX_TOK,
    fim_transform,
)


def _h(id_str: str, salt: str, tag: str) -> int:
    return int(hashlib.md5((id_str + salt + tag).encode()).hexdigest()[:8], 16)


def _expected(doc_id: int, text: str, rate: float, spm_rate: float, salt: str):
    """Pure-python replay of the documented recipe."""
    sid = str(doc_id)
    if _h(sid, salt, "-apply") % 1_000_000 >= int(rate * 1_000_000):
        return "none", text
    ln = len(text)
    a = _h(sid, salt, "-a") % (ln + 1)
    b = _h(sid, salt, "-b") % (ln + 1)
    c1, c2 = min(a, b), max(a, b)
    p, m, s = text[:c1], text[c1:c2], text[c2:]
    if _h(sid, salt, "-mode") % 1_000_000 < int(spm_rate * 1_000_000):
        return "spm", SUFFIX_TOK + s + PREFIX_TOK + p + MIDDLE_TOK + m
    return "psm", PREFIX_TOK + p + SUFFIX_TOK + s + MIDDLE_TOK + m


def test_fim_matches_reference_replay(spark):
    rows = [(i, f"def f{i}(x):\n    return x + {i}\n") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    got = {
        r["doc_id"]: (r["fim_mode"], r["fim_text"])
        for r in fim_transform(df, "doc_id", "content").collect()
    }
    modes = set()
    for i, text in rows:
        exp = _expected(i, text, 0.5, 0.5, "fim-v1")
        assert got[i] == exp, f"doc {i}: {got[i]!r} != {exp!r}"
        modes.add(exp[0])
    # at rate=0.5/spm_rate=0.5 over 200 docs all three modes must occur
    assert modes == {"none", "psm", "spm"}


def test_fim_reconstruction_roundtrip(spark):
    """prefix+middle+suffix always reassembles the original text."""
    rows = [(i, "x" * (i % 7) + "abcdef" * (i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    out = fim_transform(df, "doc_id", "content", rate=1.0).select(
        "doc_id", "content", "fim_mode", "fim_text"
    )
    for r in out.collect():
        t = r["fim_text"]
        assert r["fim_mode"] in ("psm", "spm")
        if r["fim_mode"] == "psm":
            rest = t.removeprefix(PREFIX_TOK)
            p, rest = rest.split(SUFFIX_TOK, 1)
            s, m = rest.split(MIDDLE_TOK, 1)
        else:
            rest = t.removeprefix(SUFFIX_TOK)
            s, rest = rest.split(PREFIX_TOK, 1)
            p, m = rest.split(MIDDLE_TOK, 1)
        assert p + m + s == r["content"]


def test_fim_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a")], ["doc_id", "content"]
    )
    rows = {
        r["doc_id"]: r
        for r in fim_transform(df, "doc_id", "content", rate=1.0).collect()
    }
    # empty text: sentinels only, in mode order
    t = rows[1]["fim_text"]
    assert t in (
        PREFIX_TOK + SUFFIX_TOK + MIDDLE_TOK,
        SUFFIX_TOK + PREFIX_TOK + MIDDLE_TOK,
    )
    # NULL text passes through untransformed
    assert rows[2]["fim_mode"] == "none" and rows[2]["fim_text"] is None
    # rate gates
    assert fim_transform(df, "doc_id", "content", rate=0.0).filter(
        F.col("fim_mode") != "none"
    ).count() == 0
    with pytest.raises(ValueError):
        fim_transform(df, "doc_id", "content", rate=1.5)


def test_fim_no_shuffle(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "content"])
    plan = fim_transform(df, "doc_id", "content")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
