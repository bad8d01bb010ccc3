from __future__ import annotations

import pytest

from schema_validator_spark.operators.chunking import chunk_documents


def _brute(rows, chunk, overlap):
    stride = chunk - overlap
    out = []
    for i, text in rows:
        toks = (text or "").split()
        if not toks:
            continue
        k = -(-max(len(toks) - overlap, 1) // stride)
        for j in range(k):
            w = toks[j * stride: j * stride + chunk]
            out.append((i, j, j * stride, len(w), " ".join(w)))
    return sorted(out)


@pytest.mark.parametrize("chunk,overlap", [(4, 0), (4, 1), (5, 2), (3, 0)])
def test_matches_brute_force(spark, chunk, overlap):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one two three"),
        (3, "x"),
        (4, ""),
        (5, None),
        (6, "  padded   spacing   tokens  here  now  "),
        (7, " ".join(f"t{i}" for i in range(23))),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"],
         r["chunk_text"])
        for r in chunk_documents(
            df, "id", "text", chunk_tokens=chunk, overlap=overlap
        ).collect()
    )
    assert got == _brute(rows, chunk, overlap)


def test_every_token_covered_and_overlap_consistent(spark):
    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "id long, text string")
    rows = sorted(
        chunk_documents(df, "id", "text", chunk_tokens=8, overlap=3)
        .collect(),
        key=lambda r: r["chunk_id"],
    )
    covered = set()
    for r in rows:
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        assert r["n_tokens"] >= 1
    assert covered == set(range(50))
    # consecutive chunks overlap by exactly `overlap` except the tail
    for a, b in zip(rows, rows[1:]):
        assert b["start_tok"] - a["start_tok"] == 5  # stride
    # no shuffle: pure per-row plan
    plan = chunk_documents(
        df, "id", "text", chunk_tokens=8, overlap=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_short_doc_yields_one_full_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    got = chunk_documents(df, "id", "text", chunk_tokens=10, overlap=4).collect()
    assert len(got) == 1
    assert got[0]["chunk_text"] == "a b" and got[0]["n_tokens"] == 2


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=4, overlap=4)
