from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.packing import pack_sequences


def _serial_packing(rows, seq_len, salt="v1"):
    """First-principles replay: md5-rank order, concat, chunk."""
    ranked = sorted(
        ((hashlib.md5(f"{i}{salt}".encode()).hexdigest(), i, n) for i, n in rows if n and n > 0),
        key=lambda t: (t[0], t[1]),
    )
    out, g = [], 0
    for _, i, n in ranked:
        c = g
        while c < g + n:
            seq = c // seq_len
            end = min(g + n, (seq + 1) * seq_len)
            out.append((seq, i, c - g, end - g, c - seq * seq_len))
            c = end
        g += n
    return sorted(out)


@pytest.fixture()
def docs(spark):
    rows = [(i, (i * 7919) % 230 + 1) for i in range(200)]
    rows += [(1000, 0), (1001, None)]  # excluded: zero / NULL tokens
    return spark.createDataFrame(rows, "doc_id long, n_tokens long"), rows


def test_matches_serial_replay(spark, docs):
    df, rows = docs
    got = sorted(
        tuple(r)
        for r in pack_sequences(df, "doc_id", "n_tokens", 128).collect()
    )
    assert got == _serial_packing([(i, n) for i, n in rows], 128)


def test_coverage_and_sequence_shape(spark, docs):
    df, rows = docs
    out = pack_sequences(df, "doc_id", "n_tokens", 100)
    # every doc's tokens covered exactly once
    per_doc = {
        r["doc_id"]: r["c"]
        for r in out.groupBy("doc_id")
        .agg(F.sum(F.col("end_tok") - F.col("begin_tok")).alias("c"))
        .collect()
    }
    expect = {i: n for i, n in rows if n and n > 0}
    assert per_doc == expect
    # every sequence holds exactly seq_len tokens except the last
    total = sum(expect.values())
    per_seq = {
        r["seq_id"]: r["c"]
        for r in out.groupBy("seq_id")
        .agg(F.sum(F.col("end_tok") - F.col("begin_tok")).alias("c"))
        .collect()
    }
    assert set(per_seq) == set(range((total + 99) // 100))
    for s, c in per_seq.items():
        assert c == (100 if s < total // 100 else total % 100)
    # slices land inside the sequence
    bad = out.filter(
        (F.col("seq_off") < 0)
        | (F.col("seq_off") + F.col("end_tok") - F.col("begin_tok") > 100)
    ).count()
    assert bad == 0


def test_long_doc_spans_sequences(spark):
    df = spark.createDataFrame(
        [(1, 350), (2, 10)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", 100).collect()
    assert sum(1 for r in out if r["doc_id"] == 1) == 4  # 350 tokens = 4 slices
    # the interior slices are full sequences starting at offset 0
    interior = [r for r in out if r["doc_id"] == 1 and r["begin_tok"] not in (0,)]
    assert all(r["seq_off"] == 0 for r in interior)


def test_drop_partial_tail(spark, docs):
    df, rows = docs
    total = sum(n for _, n in rows if n and n > 0)
    out = pack_sequences(df, "doc_id", "n_tokens", 128, drop_partial_tail=True)
    kept = out.agg(F.sum(F.col("end_tok") - F.col("begin_tok"))).collect()[0][0]
    assert kept == (total // 128) * 128
    assert out.agg(F.max("seq_id")).collect()[0][0] == total // 128 - 1


def test_no_global_sort_in_plan(spark, docs):
    """The plan must not sort the whole corpus: the only windows run per
    _rng range (256-way parallel) or over the 256-row offsets frame."""
    df, _ = docs
    plan = pack_sequences(df, "doc_id", "n_tokens", 128)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # the offsets window is over bucket_sums (256 rows max) —
            # identified by _bsum in its running-sum expression
            assert "_bsum" in line or "_rng" in line, line


# --------------------------------------------------------------- shards

def _serial_shards(rows, shard_bytes, salt="v1"):
    ranked = sorted(
        ((hashlib.md5(f"{i}{salt}".encode()).hexdigest(), i, n)
         for i, n in rows if n and n > 0),
        key=lambda t: (t[0], t[1]),
    )
    out, g = [], 0
    for _, i, n in ranked:
        out.append((i, g // shard_bytes, g, n))
        g += n
    return sorted(out)


def test_assign_shards_matches_serial(spark, docs):
    from schema_validator_spark.operators.packing import assign_shards

    df, rows = docs
    got = sorted(
        tuple(r)
        for r in assign_shards(
            df, "doc_id", "n_tokens", shard_bytes=500
        ).collect()
    )
    assert got == _serial_shards(rows, 500)


def test_assign_shards_num_shards_mode(spark, docs):
    from schema_validator_spark.operators.packing import assign_shards

    df, rows = docs
    out = assign_shards(df, "doc_id", "n_tokens", num_shards=7).collect()
    total = sum(n for _, n in rows if n and n > 0)
    sb = -(-total // 7)
    assert sorted(tuple(r) for r in out) == _serial_shards(rows, sb)
    assert all(0 <= r["shard_id"] < 7 for r in out)
    # every input row with positive size is assigned exactly once
    assert len(out) == sum(1 for _, n in rows if n and n > 0)


def test_assign_shards_offsets_are_exact_prefix_sums(spark, docs):
    from schema_validator_spark.operators.packing import assign_shards

    df, _ = docs
    out = sorted(
        assign_shards(df, "doc_id", "n_tokens", shard_bytes=300).collect(),
        key=lambda r: r["offset"],
    )
    g = 0
    for r in out:
        assert r["offset"] == g
        g += r["size"]


def test_assign_shards_arg_validation(spark, docs):
    from schema_validator_spark.operators.packing import assign_shards

    df, _ = docs
    for kw in ({}, {"shard_bytes": 10, "num_shards": 2},
               {"shard_bytes": 0}, {"num_shards": 0}):
        with pytest.raises(ValueError):
            assign_shards(df, "doc_id", "n_tokens", **kw)
