from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from schema_validator_spark.operators.rankbucket import rank_buckets


def _serial(spark, df, groups, score, idc, n_buckets=3):
    """Reference semantics: one window per group (the thing the
    distributed form must equal row-for-row)."""
    w = Window.partitionBy(*groups).orderBy(
        F.col(score).asc_nulls_first(), F.col(idc).asc())
    wn = Window.partitionBy(*groups)
    out = df.withColumn("rank", F.row_number().over(w)).withColumn(
        "group_n", F.count(F.lit(1)).over(wn))
    labels = ["head", "middle", "tail"] if n_buckets == 3 else [
        f"b{i}" for i in range(n_buckets)]
    expr = None
    for b, name in enumerate(labels[:-1]):
        c = F.col("rank") * n_buckets <= (b + 1) * F.col("group_n")
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(
            c, F.lit(name))
    return out.withColumn("bucket", expr.otherwise(F.lit(labels[-1])))


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "id long, lang string, score long")


def _collect_map(df):
    return {r["id"]: (r["rank"], r["group_n"], r["bucket"])
            for r in df.collect()}


def test_equals_serial_window_form(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], (i * 37) % 101)
            for i in range(300)]
    df = _mkdf(spark, rows)
    got = _collect_map(rank_buckets(df, ["lang"], "score", "id"))
    want = _collect_map(_serial(spark, df, ["lang"], "score", "id"))
    assert got == want


def test_ties_break_by_id_and_skewed_values(spark):
    # heavy ties + a skewed value distribution crossing range edges
    rows = [(i, "en", 5 if i < 50 else (1000000 + i % 3))
            for i in range(90)]
    df = _mkdf(spark, rows)
    got = _collect_map(rank_buckets(df, ["lang"], "score", "id"))
    want = _collect_map(_serial(spark, df, ["lang"], "score", "id"))
    assert got == want


def test_null_scores_rank_first_null_group_kept(spark):
    rows = [(1, "en", None), (2, "en", 10), (3, None, 7), (4, None, 3)]
    df = _mkdf(spark, rows)
    got = _collect_map(rank_buckets(df, ["lang"], "score", "id"))
    want = _collect_map(_serial(spark, df, ["lang"], "score", "id"))
    assert got == want
    assert got[1][0] == 1  # NULL score ranks first
    assert got[3][0] == 2 and got[4][0] == 1  # NULL group is a group


def test_ccnet_thirds_cut_sizes(spark):
    rows = [(i, "en", i) for i in range(9)]
    got = _collect_map(rank_buckets(_mkdf(spark, rows),
                                    ["lang"], "score", "id"))
    buckets = [got[i][2] for i in range(9)]
    assert buckets == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_custom_bucket_count_labels(spark):
    rows = [(i, "en", i) for i in range(10)]
    got = _collect_map(rank_buckets(_mkdf(spark, rows), ["lang"],
                                    "score", "id", n_buckets=5))
    assert [got[i][2] for i in range(10)] == [
        "b0", "b0", "b1", "b1", "b2", "b2", "b3", "b3", "b4", "b4"]


def test_single_value_group(spark):
    rows = [(i, "en", 42) for i in range(6)]
    got = _collect_map(rank_buckets(_mkdf(spark, rows),
                                    ["lang"], "score", "id"))
    assert sorted(got[i][0] for i in range(6)) == [1, 2, 3, 4, 5, 6]


def test_guards(spark):
    df = _mkdf(spark, [(1, "en", 1)])
    with pytest.raises(ValueError):
        rank_buckets(df, ["lang"], "score", "id", n_buckets=1)
    with pytest.raises(ValueError):
        rank_buckets(df, ["lang"], "score", "id", n_ranges=1)
    with pytest.raises(ValueError):
        rank_buckets(df.withColumn("_rng", F.lit(1)),
                     ["lang"], "score", "id")


def test_no_single_task_sort_for_dominant_group(spark):
    # the plan partitions local windows by (group, _rng), never by
    # group alone: assert the window spec includes _rng
    df = _mkdf(spark, [(i, "en", i) for i in range(50)])
    plan = rank_buckets(df, ["lang"], "score", "id")._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "_rng" in plan


def test_wide_span_scores_no_overflow(spark):
    # regression: long range-key math overflowed (ANSI kill / silent
    # wrap) for hash-scale scores; double math is weakly monotone
    rows = [(1, "en", 0), (2, "en", 3 * 2**54), (3, "en", 2**56),
            (4, "en", -(2**62)), (5, "en", 2**62)]
    df = _mkdf(spark, rows)
    got = _collect_map(rank_buckets(df, ["lang"], "score", "id"))
    want = _collect_map(_serial(spark, df, ["lang"], "score", "id"))
    assert got == want
    assert [got[i][0] for i in (4, 1, 2, 3, 5)] == [1, 2, 3, 4, 5]


def test_output_collision_guard(spark):
    df = _mkdf(spark, [(1, "en", 1)]).withColumn("rank", F.lit(9))
    with pytest.raises(ValueError, match="collide"):
        rank_buckets(df, ["lang"], "score", "id")


def test_max_groups_guard(spark):
    rows = [(i, f"g{i}", i) for i in range(10)]
    df = _mkdf(spark, rows)
    with pytest.raises(ValueError, match="max_groups"):
        rank_buckets(df, ["lang"], "score", "id", max_groups=5)
