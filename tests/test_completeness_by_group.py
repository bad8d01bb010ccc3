from __future__ import annotations

import pytest

from schema_validator_spark.operators.profile import completeness_by_group


def test_broken_segment_surfaces(spark):
    rows = (
        [("good", "v", 1.0)] * 8
        + [("broken", None, 2.0)] * 4     # name 100% null in one segment
        + [("good", None, None)] * 2      # some global noise
    )
    df = spark.createDataFrame(rows, "src string, name string, score double")
    got = {
        (r["src"], r["column"]): (r["n_rows"], r["n_nulls"], r["null_rate"])
        for r in completeness_by_group(df, ["src"]).collect()
    }
    assert got[("broken", "name")] == (4, 4, 1.0)
    assert got[("good", "name")] == (10, 2, 0.2)
    assert got[("broken", "score")] == (4, 0, 0.0)
    assert got[("good", "score")] == (10, 2, 0.2)
    # group column itself is not profiled
    assert not any(c == "src" for _, c in got)


def test_null_group_and_explicit_cols(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, None), ("a", 2)], "g string, v long"
    )
    got = {
        (r["g"], r["column"]): r["n_nulls"]
        for r in completeness_by_group(df, ["g"], ["v"]).collect()
    }
    assert got[(None, "v")] == 1 and got[("a", "v")] == 0
    with pytest.raises(ValueError):
        completeness_by_group(df.select("g"), ["g"])
