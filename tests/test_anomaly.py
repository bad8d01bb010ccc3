from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.anomaly import (
    detect_anomalies,
    metric_history,
)
from schema_validator_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def tbl(spark):
    path = os.path.join(tempfile.mkdtemp(), "t")
    t = SnapshotTable(path)
    # commits of 100, 110, 400 (jump!), 404 rows cumulative
    sizes = [100, 10, 290, 4]
    start = 0
    for n in sizes:
        t.commit(
            spark.range(start, start + n).select(
                F.col("id"),
                F.when(F.col("id") % 10 == 0, None)
                .otherwise(F.col("id") * 1.0).alias("v"),
            )
        )
        start += n
    yield t
    t.drop()


def test_metric_history_values(spark, tbl):
    hist = metric_history(
        spark, tbl,
        {"n_rows": F.count(F.lit(1)),
         "null_frac": F.avg(F.col("v").isNull().cast("int"))},
    )
    got = {(r["snapshot_id"], r["metric"]): r["value"] for r in hist.collect()}
    assert got[(1, "n_rows")] == 100.0
    assert got[(2, "n_rows")] == 110.0
    assert got[(3, "n_rows")] == 400.0
    assert got[(4, "n_rows")] == 404.0
    assert got[(1, "null_frac")] == pytest.approx(0.1)


def test_detect_relative_change(spark, tbl):
    hist = metric_history(spark, tbl, {"n_rows": F.count(F.lit(1))})
    out = detect_anomalies(hist, max_rel_change=0.5)
    flags = {r["snapshot_id"]: r["anomalous"] for r in out.collect()}
    assert flags == {1: False, 2: False, 3: True, 4: False}
    rel = {r["snapshot_id"]: r["rel_change"] for r in out.collect()}
    assert rel[1] is None  # first point: no baseline
    assert rel[3] == pytest.approx(2.636364)


def test_detect_bounds(spark, tbl):
    hist = metric_history(
        spark, tbl, {"null_frac": F.avg(F.col("v").isNull().cast("int"))}
    )
    out = detect_anomalies(hist, bounds={"null_frac": (None, 0.05)})
    assert all(r["anomalous"] for r in out.collect())  # ~10% nulls > 5%
    out2 = detect_anomalies(hist, bounds={"null_frac": (None, 0.5)})
    assert not any(r["anomalous"] for r in out2.collect())


def test_zero_to_nonzero_flagged(spark):
    hist = spark.createDataFrame(
        [(1, "m", 0.0), (2, "m", 5.0), (3, "m", 5.0)],
        "snapshot_id int, metric string, value double",
    )
    out = detect_anomalies(hist, max_rel_change=10.0)
    flags = {r["snapshot_id"]: r["anomalous"] for r in out.collect()}
    assert flags == {1: False, 2: True, 3: False}
