"""Copy-on-write table maintenance over the snapshot stand-in:
MERGE upsert, predicate DELETE, bin-pack compaction, snapshot expiry.

Iceberg-semantics parity for the north rule's table layer (no runtime
jars in this container — see sources/snapshots.py module docstring).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.sources.snapshots import (
    SnapshotTable,
    compact_table,
    delete_where,
    expire_snapshots,
    merge_upsert,
)


@pytest.fixture()
def table(spark):
    path = tempfile.mkdtemp(prefix="svs_maint_")
    t = SnapshotTable(path)
    yield t
    t.drop()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _base(spark, n=100):
    return spark.createDataFrame(
        [(i, f"name-{i}", float(i)) for i in range(n)],
        "id long, name string, score double",
    )


def test_merge_upsert_updates_and_inserts(spark, table):
    s1 = table.commit(_base(spark).repartition(8))
    source = spark.createDataFrame(
        [(3, "UPDATED-3", 333.0), (7, "UPDATED-7", 777.0),
         (200, "NEW-200", 200.0)],
        "id long, name string, score double",
    )
    s2 = merge_upsert(spark, table, source, ["id"])
    got = _rows(table.read(spark, s2))
    expect = sorted(
        [(i, f"name-{i}", float(i)) for i in range(100) if i not in (3, 7)]
        + [(3, "UPDATED-3", 333.0), (7, "UPDATED-7", 777.0),
           (200, "NEW-200", 200.0)]
    )
    assert got == expect
    # time travel: the pre-merge snapshot is untouched
    assert _rows(table.read(spark, s1)) == _rows(_base(spark))


def test_merge_upsert_rewrites_only_affected_files(spark, table):
    # one file per id bucket → a single-key merge must rewrite ~1 file
    df = _base(spark).repartition(8, "id")
    table.commit(df)
    before = set(table._manifest(table.current_snapshot_id())["files"])
    source = spark.createDataFrame(
        [(3, "UPDATED-3", 333.0)], "id long, name string, score double"
    )
    s2 = merge_upsert(spark, table, source, ["id"])
    after = table._manifest(s2)["files"]
    carried = [f for f in after if f in before]
    # most files carried by reference, not rewritten
    assert len(carried) >= len(before) - 1
    assert len(carried) < len(after)


def test_merge_upsert_rejects_ambiguous_source(spark, table):
    table.commit(_base(spark))
    dup = spark.createDataFrame(
        [(3, "A", 1.0), (3, "B", 2.0)], "id long, name string, score double"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(spark, table, dup, ["id"])


def test_merge_upsert_into_empty_table_inserts_all(spark, table):
    src = _base(spark, 5)
    sid = merge_upsert(spark, table, src, ["id"])
    assert _rows(table.read(spark, sid)) == _rows(src)


def test_relative_table_path_merge_and_delete(spark):
    # SnapshotTable created with a RELATIVE path: manifests must still
    # line up with the absolute decoded paths input_file_name() yields,
    # or `untouched = files - affected` keeps every affected file and the
    # merge duplicates rows / the delete is silently undone.
    path = tempfile.mkdtemp(prefix="svs_rel_")
    rel = os.path.relpath(path, os.getcwd())
    t = SnapshotTable(rel)
    try:
        assert os.path.isabs(t.path)
        t.commit(_base(spark, 20).repartition(4, "id"))
        source = spark.createDataFrame(
            [(3, "UPDATED-3", 333.0)], "id long, name string, score double"
        )
        s2 = merge_upsert(spark, t, source, ["id"])
        got = _rows(t.read(spark, s2))
        assert len(got) == 20  # no duplicated rows from kept-and-rewritten files
        assert (3, "UPDATED-3", 333.0) in got
        assert (3, "name-3", 3.0) not in got  # stale matched row really gone
        s3 = delete_where(spark, t, F.col("id") >= 15)
        assert len(_rows(t.read(spark, s3))) == 15  # delete not undone
    finally:
        t.drop()


def test_delete_where_removes_matches_keeps_null_predicate_rows(spark, table):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "id long, v double"
    )
    s1 = table.commit(df.repartition(4))
    s2 = delete_where(spark, table, F.col("v") > 20.0)
    got = _rows(table.read(spark, s2))
    # NULL predicate keeps the row, exactly as SQL DELETE would
    assert got == [(1, 10.0), (2, None)]
    assert len(_rows(table.read(spark, s1))) == 4


def test_delete_where_no_match_is_noop(spark, table):
    s1 = table.commit(_base(spark, 10))
    s2 = delete_where(spark, table, F.col("score") > 1e9)
    assert s2 == s1  # no new snapshot committed


def test_compact_reduces_files_preserves_rows_and_history(spark, table):
    df = _base(spark, 200).repartition(16)
    s1 = table.commit(df)
    n_before = len(table._manifest(s1)["files"])
    assert n_before >= 8
    s2 = compact_table(spark, table, target_files=2)
    files_after = table._manifest(s2)["files"]
    assert len(files_after) <= 2
    assert _rows(table.read(spark, s2)) == _rows(df)
    assert _rows(table.read(spark, s1)) == _rows(df)  # time travel intact
    assert table._manifest(s2)["operation"] == "replace"


def test_expire_snapshots_gc_unreferenced_files(spark, table):
    s1 = table.commit(_base(spark, 50).repartition(4))
    old_files = table._manifest(s1)["files"]
    s2 = compact_table(spark, table, target_files=1)
    removed = expire_snapshots(table, keep_last=1)
    assert set(removed) == set(old_files)
    for f in removed:
        assert not os.path.exists(f)
    assert table.snapshot_ids() == [s2]
    # the surviving snapshot still reads fine
    assert table.read(spark, s2).count() == 50


def test_expire_keeps_shared_files(spark, table):
    s1 = table.commit(_base(spark, 20).repartition(2))
    shared = table._manifest(s1)["files"]
    table.commit(_base(spark, 5).repartition(1), mode="append")
    removed = expire_snapshots(table, keep_last=1)
    # every s1 file is still referenced by s2 (append layers on top)
    assert removed == []
    for f in shared:
        assert os.path.exists(f)
    assert table.snapshot_ids()[-1:] == table.snapshot_ids()
