"""Mergeable quantile sketch (operators/sketch.py): accuracy vs exact
quantiles, merge consistency, drift detection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators import sketch as S


@pytest.fixture(scope="module")
def valdf(spark):
    # two groups with known distributions: uniform [0,1000) and shifted
    n = 20000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "base").otherwise("shifted").alias("commit"),
        (F.pmod(F.xxhash64("id"), 1000).cast("double")
         + F.when(F.col("id") % 2 == 0, 0.0).otherwise(250.0)).alias("value"),
    )
    return df.repartition(8).cache()


def test_sketch_quantiles_close_to_exact(spark, valdf):
    sk = S.sketch(valdf, "value", ["commit"], compression=256)
    rows = {r["commit"]: r for r in sk.collect()}
    exact = valdf.filter(F.col("commit") == "base").approxQuantile(
        "value", [0.25, 0.5, 0.75], 0.0001
    )
    got = S.quantiles_py(
        rows["base"]["means"], rows["base"]["counts"],
        [0.25, 0.5, 0.75], rows["base"]["vmin"], rows["base"]["vmax"],
    )
    for g, e in zip(got, exact):
        assert abs(g - e) < 25, (got, exact)  # 2.5% of range
    assert rows["base"]["n"] == 10000
    assert rows["base"]["vmin"] == 0.0
    assert rows["base"]["vmax"] == 999.0


def test_merge_consistency(spark, valdf):
    """Sketch of the whole ≈ merge of per-partition sketches — the property
    that makes cross-run storage/merging sound."""
    one_part = S.sketch(valdf.coalesce(1), "value", ["commit"], compression=256)
    many_part = S.sketch(valdf.repartition(16), "value", ["commit"], compression=256)
    q = [0.1, 0.5, 0.9]
    a = {r["commit"]: S.quantiles_py(r["means"], r["counts"], q, r["vmin"], r["vmax"])
         for r in one_part.collect()}
    b = {r["commit"]: S.quantiles_py(r["means"], r["counts"], q, r["vmin"], r["vmax"])
         for r in many_part.collect()}
    for k in a:
        assert np.allclose(a[k], b[k], atol=30), (k, a[k], b[k])


def test_sketch_drift_detects_shift(valdf):
    sk = S.sketch(valdf, "value", ["commit"], compression=256)
    d = S.sketch_drift(sk, "commit", "base", "shifted")
    # planted +250 shift on a 0..1000 scale → median shift ≈ 0.25 · scale
    assert d["max_shift"] > 0.15
    same = S.sketch_drift(sk, "commit", "base", "base")
    assert same["max_shift"] < 1e-9


def test_partials_add_no_shuffle(spark):
    from schema_validator_spark.plans import inspect as P

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    partials = S.partial_sketches(src, "value", ["event_type"])
    assert P.n_exchanges(partials) == 0  # stage 1 rides the scan
    # full sketch = exactly the one merge shuffle
    assert P.n_exchanges(S.sketch(src, "value", ["event_type"])) == 1
