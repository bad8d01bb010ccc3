import pytest

from schema_validator_spark.operators.ownership import (
    UNKNOWN_AUTHOR,
    ownership_stats,
)


def _rows(out):
    return {r["path"]: r.asDict() for r in out.collect()}


def test_ownership_basic(spark):
    df = spark.createDataFrame(
        [("a.py", "x")] * 3 + [("a.py", "y")],
        "path string, author string",
    )
    got = _rows(ownership_stats(df, ["path"], "author"))["a.py"]
    assert got["n_commits"] == 4
    assert got["n_authors"] == 2
    assert got["top_author"] == "x"
    assert got["top_share"] == 0.75
    # x alone has 3/4 > 1/2 -> bus factor 1
    assert got["bus_factor"] == 1
    assert got["hhi"] == pytest.approx(0.75**2 + 0.25**2)


def test_ownership_tie_breaks_and_strict_majority(spark):
    # two authors at exactly 50% each: neither alone STRICTLY exceeds
    # half, so bus_factor is 2; top_author is the lexicographic min.
    df = spark.createDataFrame(
        [("a.py", "zed"), ("a.py", "zed"), ("a.py", "amy"), ("a.py", "amy")],
        "path string, author string",
    )
    got = _rows(ownership_stats(df, ["path"], "author"))["a.py"]
    assert got["top_author"] == "amy"
    assert got["top_share"] == 0.5
    assert got["bus_factor"] == 2
    assert got["hhi"] == pytest.approx(0.5)


def test_ownership_null_and_empty_authors_collapse(spark):
    df = spark.createDataFrame(
        [("a.py", None), ("a.py", ""), ("a.py", "x")],
        "path string, author string",
    )
    got = _rows(ownership_stats(df, ["path"], "author"))["a.py"]
    assert got["n_commits"] == 3
    assert got["n_authors"] == 2
    assert got["top_author"] == UNKNOWN_AUTHOR  # 2 commits beat x's 1


def test_ownership_majority_param(spark):
    # 5 authors, 2 commits each; majority=0.75 needs cum > 7.5 -> 4 authors
    rows = [("a.py", f"a{i}") for i in range(5) for _ in range(2)]
    df = spark.createDataFrame(rows, "path string, author string")
    got = _rows(ownership_stats(df, ["path"], "author", majority=0.75))[
        "a.py"
    ]
    assert got["bus_factor"] == 4
    with pytest.raises(ValueError, match="majority"):
        ownership_stats(df, ["path"], "author", majority=1.0)


def test_ownership_multi_key_and_reserved_names(spark):
    df = spark.createDataFrame(
        [("r1", "a.py", "x"), ("r1", "b.py", "y"), ("r2", "a.py", "z")],
        "repo string, path string, author string",
    )
    out = ownership_stats(df, ["repo", "path"], "author")
    assert out.count() == 3
    assert {r["bus_factor"] for r in out.collect()} == {1}
    bad = df.withColumnRenamed("author", "_n")
    with pytest.raises(ValueError, match="_n"):
        ownership_stats(bad, ["repo", "path"], "_n")


def test_ownership_plan_has_two_exchanges(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(
        [("a.py", "x")], "path string, author string"
    )
    out = ownership_stats(df, ["path"], "author")
    # (key, author) agg + key-partitioned window; the final key agg
    # reuses the window's partitioning.
    assert n_exchanges(out) <= 2
