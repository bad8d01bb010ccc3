from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.packing import pack_sweep
from schema_validator_spark.plans.inspect import uses_python


def _run(spark, counts, max_lens):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "id long, n long")
    return {r["max_len"]: r.asDict()
            for r in pack_sweep(df, "n", max_lens).collect()}


def test_matches_arithmetic(spark):
    counts = [10, 100, 1000, 5000, 0, None]
    got = _run(spark, counts, [64, 1024])
    vals = [c or 0 for c in counts]
    for L in (64, 1024):
        r = got[L]
        assert r["n_docs"] == 6
        assert r["docs_truncated"] == sum(1 for c in vals if c > L)
        assert r["tokens_lost"] == sum(max(c - L, 0) for c in vals)
        assert r["pad_tokens"] == sum(L - min(c, L) for c in vals)
        assert r["n_packed_seqs"] == math.ceil(sum(vals) / L)
        kept = sum(min(c, L) for c in vals)
        assert r["utilization_e6"] == round(kept * 1e6 / (6 * L))


def test_no_truncation_when_l_exceeds_all(spark):
    got = _run(spark, [5, 7], [16])
    r = got[16]
    assert r["docs_truncated"] == 0 and r["tokens_lost"] == 0
    assert r["pad_tokens"] == (16 - 5) + (16 - 7)
    assert r["n_packed_seqs"] == 1


def test_guards(spark):
    df = spark.createDataFrame([(1, 2)], "id long, n long")
    with pytest.raises(ValueError):
        pack_sweep(df, "n", [])
    with pytest.raises(ValueError):
        pack_sweep(df, "n", [0])
    with pytest.raises(ValueError):
        pack_sweep(df, "n", [64, 64])


def test_one_pass_no_python(spark):
    df = spark.createDataFrame([(1, 2)], "id long, n long")
    out = pack_sweep(df, "n", [64, 128])
    assert not uses_python(out)
    # single aggregate over the corpus: exactly one pair of
    # HashAggregate exchanges regardless of |max_lens|
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2
