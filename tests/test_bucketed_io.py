"""Bucketed writes give shuffle-free co-located joins (sources/io.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.plans import inspect as P
from schema_validator_spark.sources.io import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    a = spark.range(10000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("va")
    )
    b = spark.range(5000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("vb")
    )
    write_bucketed(a, "t_bucket_a", ["k"], 8, sort_cols=["k"],
                   path=str(base / "a"))
    write_bucketed(b, "t_bucket_b", ["k"], 8, sort_cols=["k"],
                   path=str(base / "b"))
    yield "t_bucket_a", "t_bucket_b"
    spark.sql("drop table if exists t_bucket_a")
    spark.sql("drop table if exists t_bucket_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    ta, tb = bucketed
    a, b = read_table(spark, ta, "table"), read_table(spark, tb, "table")
    # force the non-broadcast path so the test proves bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "k")
        assert P.n_exchanges(j) == 0, P.executed_plan(j)
        assert "SortMergeJoin" in P.join_kinds(j)
        assert j.count() == 10000 * 10  # 20 va x 10 vb per key x 500 keys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    ta, _ = bucketed
    a = read_table(spark, ta, "table")
    g = a.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    assert P.n_exchanges(g) == 0, P.executed_plan(g)
    assert g.count() == 500
