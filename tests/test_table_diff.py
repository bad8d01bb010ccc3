from __future__ import annotations

import pytest

from schema_validator_spark.operators.diff import table_diff, table_diff_summary


@pytest.fixture()
def versions(spark):
    old = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20), (3, "de", 30), (4, None, 40)],
        "id long, lang string, n long",
    )
    new = spark.createDataFrame(
        [
            (1, "en", 10),      # unchanged
            (2, "zh", 20),      # lang changed
            (4, "es", 40),      # NULL -> value change
            (5, "it", 50),      # added
        ],                      # id 3 removed
        "id long, lang string, n long",
    )
    return old, new


def test_diff_rows(spark, versions):
    old, new = versions
    got = {
        r["id"]: (r["status"], sorted(r["changed_cols"]))
        for r in table_diff(old, new, ["id"]).collect()
    }
    assert got == {
        2: ("changed", ["lang"]),
        3: ("removed", []),
        4: ("changed", ["lang"]),
        5: ("added", []),
    }
    assert 1 not in got  # unchanged rows not emitted


def test_summary(spark, versions):
    old, new = versions
    r = table_diff_summary(old, new, ["id"]).collect()[0]
    assert (r["n_old"], r["n_new"]) == (4, 4)
    assert (r["n_added"], r["n_removed"], r["n_changed"]) == (1, 1, 2)
    assert r["n_unchanged"] == 1
    assert r["change_rate"] == pytest.approx(4 / 4)


def test_identical_tables(spark, versions):
    old, _ = versions
    assert table_diff(old, old, ["id"]).count() == 0
    r = table_diff_summary(old, old, ["id"]).collect()[0]
    assert r["n_added"] == r["n_removed"] == r["n_changed"] == 0
    assert r["n_unchanged"] == 4 and r["change_rate"] == 0.0


def test_compare_cols_subset(spark, versions):
    old, new = versions
    got = {
        r["id"]: r["status"]
        for r in table_diff(old, new, ["id"], compare_cols=["n"]).collect()
    }
    # n never changes: only membership changes remain
    assert got == {3: "removed", 5: "added"}
