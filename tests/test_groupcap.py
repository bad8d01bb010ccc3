from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.groupcap import (
    cap_per_group,
    group_cap_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, domain string")


def _expected_keep(ids, cap):
    ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode())
                                        .hexdigest(), i))
    return set(ranked[:cap])


def test_cap_matches_serial_md5_rank(spark):
    rows = [(i, "hot.com") for i in range(50)] + \
           [(100 + i, "cold.com") for i in range(3)]
    kept = {r["doc_id"] for r in
            cap_per_group(_df(spark, rows), "domain", "doc_id",
                          cap=10).collect()}
    assert kept == _expected_keep(list(range(50)), 10) | {100, 101, 102}


def test_under_cap_groups_pass_through_untouched(spark):
    rows = [(i, f"d{i % 20}.com") for i in range(40)]  # 2 per group
    out = cap_per_group(_df(spark, rows), "domain", "doc_id", cap=5)
    assert out.count() == 40
    assert set(out.columns) == {"doc_id", "domain"}


def test_null_group_never_capped(spark):
    rows = [(i, None) for i in range(30)] + [(100 + i, "x.com")
                                             for i in range(30)]
    kept = cap_per_group(_df(spark, rows), "domain", "doc_id", cap=4)
    got = kept.groupBy("domain").count().collect()
    by = {r["domain"]: r["count"] for r in got}
    assert by[None] == 30
    assert by["x.com"] == 4


def test_two_level_equals_single_window(spark):
    rows = [(i, f"g{i % 3}") for i in range(500)]
    df = _df(spark, rows)
    fast = {r["doc_id"] for r in
            cap_per_group(df, "domain", "doc_id", cap=17).collect()}
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    serial = {
        r["doc_id"]
        for r in df.withColumn(
            "_r",
            F.row_number().over(
                w.partitionBy("domain").orderBy(
                    F.md5(F.col("doc_id").cast("string")), "doc_id"
                )
            ),
        )
        .filter(F.col("_r") <= 17)
        .collect()
    }
    assert fast == serial


def test_report_counts(spark):
    rows = [(i, "big.com") for i in range(25)] + \
           [(100, "small.com"), (101, None)]
    rep = {r["domain"]: r for r in
           group_cap_report(_df(spark, rows), "domain", cap=10).collect()}
    assert rep["big.com"]["n_rows"] == 25
    assert rep["big.com"]["n_kept"] == 10
    assert rep["big.com"]["n_dropped"] == 15
    assert rep["small.com"]["n_dropped"] == 0
    assert rep[None]["n_kept"] == 1 and rep[None]["n_dropped"] == 0


def test_report_consistent_with_cap(spark):
    rows = [(i, f"d{i % 7}") for i in range(200)]
    df = _df(spark, rows)
    kept = cap_per_group(df, "domain", "doc_id", cap=12)
    rep = group_cap_report(df, "domain", cap=12)
    got = {r["domain"]: r["count"]
           for r in kept.groupBy("domain").count().collect()}
    for r in rep.collect():
        assert got.get(r["domain"], 0) == r["n_kept"]


def test_guards(spark):
    df = _df(spark, [(1, "a")])
    with pytest.raises(ValueError, match="cap"):
        cap_per_group(df, "domain", "doc_id", cap=0)
    with pytest.raises(ValueError, match="reserved"):
        cap_per_group(df.withColumn("_gn", F.lit(1)), "domain", "doc_id",
                      cap=1)
