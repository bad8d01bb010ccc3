"""Snapshot-pinned table semantics (the Iceberg stand-in: manifest-based
time travel, atomic commits, drift-across-commits)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.sources.snapshots import SnapshotTable, drift_across_commits


@pytest.fixture()
def table():
    d = tempfile.mkdtemp(prefix="svs_snap_test_")
    t = SnapshotTable(d)
    yield t
    t.drop()


def test_time_travel_pins_files(spark, table):
    s1 = table.commit(spark.range(100).select(F.col("id").cast("double").alias("v")))
    s2 = table.commit(spark.range(100, 150).select(F.col("id").cast("double").alias("v")))
    assert (s1, s2) == (1, 2)
    # snapshot 1 is immutable: still 100 rows after the append
    assert table.read(spark, s1).count() == 100
    assert table.read(spark, s2).count() == 150
    assert table.read(spark).count() == 150  # default = current
    assert table.snapshot_ids() == [1, 2]
    assert table.history()[1]["operation"] == "append"


def test_overwrite_resets_visible_set_but_keeps_history(spark, table):
    s1 = table.commit(spark.range(10).select(F.col("id").alias("v")))
    s2 = table.commit(spark.range(5).select(F.col("id").alias("v")), mode="overwrite")
    assert table.read(spark, s2).count() == 5
    assert table.read(spark, s1).count() == 10  # history intact


def test_missing_snapshot_fails_fast(spark, table):
    table.commit(spark.range(3).select(F.col("id").alias("v")))
    with pytest.raises(ValueError, match="snapshot 99"):
        table.read(spark, 99)
    with pytest.raises(ValueError, match="append|overwrite"):
        table.commit(spark.range(1), mode="upsert")


def test_drift_across_commits(spark, table):
    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    shifted = spark.range(2000).select((F.col("id") % 100 + 50).cast("double").alias("v"))
    s1 = table.commit(base)
    s2 = table.commit(shifted, mode="overwrite")
    s3 = table.commit(base, mode="overwrite")
    high = drift_across_commits(spark, table, "v", s1, s2).first()
    low = drift_across_commits(spark, table, "v", s1, s3).first()
    assert high["psi"] > 0.25, high["psi"]
    assert low["psi"] < 0.01, low["psi"]
    assert high["baseline"] == "snap1" and high["current"] == "snap2"


def test_read_appended_is_file_delta(spark, table):
    s1 = table.commit(spark.range(100).select(F.col("id").alias("v")))
    s2 = table.commit(spark.range(100, 130).select(F.col("id").alias("v")),
                      mode="append")
    delta = table.read_appended(spark, s1, as_of=s2)
    vals = sorted(r["v"] for r in delta.collect())
    assert vals == list(range(100, 130))  # only commit-2 rows, no comparison
    # steady state: zero new data -> empty frame with the table's schema
    empty = table.read_appended(spark, s2)
    assert empty.count() == 0 and empty.columns == ["v"]


def test_validate_appended_runs_engine_on_delta(spark, table):
    from schema_validator_spark.engine import ValidationEngine
    from schema_validator_spark.sources.snapshots import validate_appended

    s1 = table.commit(spark.range(50).select(F.col("id").alias("v")))
    table.commit(
        spark.range(200, 220).select(F.col("id").alias("v")), mode="append"
    )
    eng = ValidationEngine({"v": "max=210"}, key_cols=["v"])
    res = validate_appended(spark, table, eng, s1)
    # only delta rows validated: 211..219 violate, the 50 old rows never scanned
    assert res.violations.count() == 9


def test_commit_cas_retries_on_conflict(spark, table):
    """The commit point is create-if-absent (os.link), not rename: if a
    concurrent committer wins the snapshot id, the loser rebuilds against
    the new parent and retries — no lost commits."""
    import json
    import os

    s1 = table.commit(spark.range(5).select(F.col("id").alias("v")))
    # simulate a concurrent committer winning snapshot 2 (same file set)
    m2 = dict(table._manifest(s1), snapshot_id=2, parent_id=1, operation="append")
    with open(os.path.join(table._meta, "2.json"), "w") as f:
        json.dump(m2, f)
    sid = table.commit(spark.range(5, 8).select(F.col("id").alias("v")),
                       mode="append")
    assert sid == 3  # retried past the conflicting id
    assert table.read(spark, 3).count() == 8  # winner's files + ours


def test_dedup_appended(spark, tmp_path):
    """Incremental exact dedup of a snapshot delta: cross-commit dups
    drop, intra-delta dups keep the lowest id, fresh rows survive —
    without rereading corpus rows (only its distinct hash index)."""
    from schema_validator_spark.sources.snapshots import (
        SnapshotTable, dedup_appended,
    )

    t = SnapshotTable(str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string")
    s1 = t.commit(base)
    delta = spark.createDataFrame(
        [
            (10, "alpha"),   # cross-commit duplicate -> dropped
            (11, "delta"),   # fresh
            (12, "delta"),   # intra-delta duplicate -> 11 survives
            (13, "epsilon"), # fresh
            (14, None),      # NULL text: hashes as '' — fresh here
        ],
        "doc_id long, text string",
    )
    t.commit(delta, mode="append")
    got = sorted(r["doc_id"] for r in
                 dedup_appended(spark, t, "text", s1).collect())
    assert got == [11, 13, 14]
    # steady state: no new files -> empty result, not an error
    assert dedup_appended(spark, t, "text", t.current_snapshot_id()).count() == 0
