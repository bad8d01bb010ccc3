from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.functions.zorder import zorder_key, zorder_key_sql
from schema_validator_spark.sources.snapshots import (
    SnapshotTable,
    collect_file_stats,
    delete_where,
)


@pytest.fixture()
def tbl():
    path = os.path.join(tempfile.mkdtemp(), "t")
    t = SnapshotTable(path)
    yield t
    t.drop()


def _values_df(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 500).cast("double").alias("value"),
        F.concat(F.lit("u"), (F.col("id") % 7).cast("string")).alias("user"),
    )


def test_footer_stats_match_spark(spark, tbl):
    df = _values_df(spark)
    tbl.commit_clustered(df, ["value"], 4, stats_cols=["value", "event_id"])
    m = tbl._manifest(tbl.current_snapshot_id())
    assert set(m["stats"]) == set(m["files"])
    for f in m["files"]:
        got = m["stats"][f]
        chk = (
            spark.read.parquet(f)
            .agg(
                F.min("value"), F.max("value"), F.count(F.lit(1)),
                F.min("event_id"), F.max("event_id"),
            )
            .collect()[0]
        )
        assert got["cols"]["value"]["min"] == chk[0]
        assert got["cols"]["value"]["max"] == chk[1]
        assert got["rows"] == chk[2]
        assert got["cols"]["event_id"]["min"] == chk[3]
        assert got["cols"]["event_id"]["max"] == chk[4]
        assert got["cols"]["value"]["nulls"] == 0


def test_read_range_row_identical_and_pruned(spark, tbl):
    df = _values_df(spark)
    tbl.commit_clustered(df, ["value"], 8)
    total = len(tbl._manifest(tbl.current_snapshot_id())["files"])
    assert total == 8
    cand = tbl.candidate_files("value", 100.0, 140.0)
    assert 1 <= len(cand) < total  # skipping actually skips
    got = sorted(
        tuple(r) for r in tbl.read_range(spark, "value", 100.0, 140.0).collect()
    )
    want = sorted(
        tuple(r)
        for r in tbl.read(spark).filter(F.col("value").between(100.0, 140.0)).collect()
    )
    assert got == want
    # open-ended bounds
    assert tbl.read_range(spark, "value", lo=450.0).count() == df.filter(
        F.col("value") >= 450.0
    ).count()


def test_no_stats_means_no_pruning(spark, tbl):
    tbl.commit(_values_df(spark, 200))  # no stats_cols
    m = tbl._manifest(tbl.current_snapshot_id())
    assert tbl.candidate_files("value", 0.0, 1.0) == m["files"]
    assert tbl.read_range(spark, "value", 0.0, 1.0).count() == 2  # 0.0 and 1.0


def test_all_null_file_skipped(spark, tbl):
    tbl.commit_clustered(_values_df(spark, 100), ["value"], 2)
    nulls = spark.range(50).select(
        F.col("id").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit("u0").alias("user"),
    )
    tbl.commit(nulls.coalesce(1), stats_cols=["value"])
    m = tbl._manifest(tbl.current_snapshot_id())
    assert len(m["files"]) == 3
    assert len(tbl.candidate_files("value", 0.0, 500.0)) == 2
    assert tbl.read_range(spark, "value", 0.0, 500.0).count() == 100


def test_maintenance_carries_stats_for_untouched_files(spark, tbl):
    tbl.commit_clustered(_values_df(spark), ["value"], 8)
    delete_where(spark, tbl, F.col("value") < 10.0)
    m = tbl._manifest(tbl.current_snapshot_id())
    with_stats = [f for f in m["files"] if f in m["stats"]]
    # 7 of 8 files untouched by the delete keep their manifest stats
    assert len(with_stats) >= 7
    assert len(tbl.candidate_files("value", 400.0, 420.0)) < len(m["files"])


def test_timestamp_stats_prune(spark, tbl):
    base = dt.datetime(2024, 1, 1)
    df = spark.range(240).select(
        F.col("id").alias("event_id"),
        (F.lit(base) + F.make_interval(hours=F.col("id"))).alias("ts"),
    )
    tbl.commit_clustered(df, ["ts"], 6)
    lo, hi = base + dt.timedelta(hours=50), base + dt.timedelta(hours=70)
    assert len(tbl.candidate_files("ts", lo, hi)) < 6
    assert tbl.read_range(spark, "ts", lo, hi).count() == 21


def _py_zorder(vals, bits):
    z = 0
    k = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            z += ((v >> b) & 1) << (b * k + i)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(5, 3), (0, 0), (31, 31), (17, 2), (2, 17)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=5)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_zorder([x, y], 5)
    # SQL form replays identically (DuckDB)
    import duckdb

    expr = zorder_key_sql(["x", "y"], bits=5)
    for x, y in rows:
        (v,) = duckdb.sql(
            f"select {expr} from (select {x} as x, {y} as y)"
        ).fetchone()
        assert v == _py_zorder([x, y], 5)


def test_zorder_clustering_prunes_both_dims(spark, tbl):
    grid = (
        spark.range(32 * 32)
        .select(
            (F.col("id") % 32).cast("int").alias("x"),
            (F.col("id") / 32).cast("int").alias("y"),
        )
        .withColumn("z", zorder_key(["x", "y"], bits=5))
    )
    tbl.commit_clustered(grid, ["z"], 16, stats_cols=["x", "y"])
    nf = len(tbl._manifest(tbl.current_snapshot_id())["files"])
    cx = tbl.candidate_files("x", 0, 3)
    cy = tbl.candidate_files("y", 0, 3)
    assert len(cx) < nf and len(cy) < nf  # BOTH dimensions skip files
    assert tbl.read_range(spark, "x", 0, 3).count() == 4 * 32
    assert tbl.read_range(spark, "y", 0, 3).count() == 4 * 32


def test_collect_file_stats_direct(spark, tmp_path):
    p = str(tmp_path / "d")
    spark.range(10).select(
        F.col("id"), F.lit("abc").alias("s")
    ).coalesce(1).write.parquet(p)
    files = [os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")]
    st = collect_file_stats(files, ["id", "s", "missing_col"])
    assert st[files[0]]["cols"]["id"] == {"min": 0, "max": 9, "nulls": 0}
    assert st[files[0]]["cols"]["s"]["min"] == "abc"
    assert "missing_col" not in st[files[0]]["cols"]
