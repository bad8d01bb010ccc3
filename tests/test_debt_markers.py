from __future__ import annotations

from schema_validator_spark.operators.codequality import (
    debt_markers,
    repo_debt,
)

SCHEMA = "repo string, content string"


def _rows(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = debt_markers(df, "content", keep_cols=["repo"]).collect()
    return {r["repo"]: r for r in got}


def test_marker_boundaries(spark):
    got = _rows(spark, [
        ("a", "x = 1\n# TODO: fix this\ny = 2\n"),
        # two different markers on ONE line: both count, one debt line
        ("b", "// FIXME and HACK here\nz = 3\n"),
        # two of the SAME marker on one line: one line-grain count
        ("c", "# TODO alpha TODO beta\n"),
        # embedded in identifiers / plural: never counts
        ("d", "myTODO = 1\nTODOS = 2\nxHACKy = 3\n"),
        # marker inside a string still counts (syntactic tier)
        ("e", "s = 'XXX placeholder'\n"),
        ("f", None),
    ])
    assert got["a"]["n_todo"] == 1 and got["a"]["n_debt_lines"] == 1
    assert got["b"]["n_fixme"] == 1 and got["b"]["n_hack"] == 1
    assert got["b"]["n_debt_lines"] == 1
    assert got["c"]["n_todo"] == 1 and got["c"]["n_debt_lines"] == 1
    assert got["d"]["n_debt_lines"] == 0
    assert got["e"]["n_xxx"] == 1
    assert got["f"]["n_lines"] == 1 and got["f"]["n_debt_lines"] == 0


def test_marker_at_line_edges(spark):
    got = _rows(spark, [
        ("s", "TODO\nTODO at start\nat end TODO\ncrlf TODO\r\n"),
        # a lone mid-line \r blocks the match in BOTH engines (legacy-
        # Mac fragment; deterministic, encoding_stats flags the file)
        ("t", "with\rcr TODO\n"),
    ])
    # bare line, line-start, line-end, and CRLF-terminated all count
    assert got["s"]["n_todo"] == 4
    assert got["t"]["n_todo"] == 0


def test_repo_rollup(spark):
    df = spark.createDataFrame(
        [
            ("r1", "# TODO a\nx = 1\n"),
            ("r1", "y = 2\n"),
            ("r2", "clean = 1\n"),
        ],
        SCHEMA,
    )
    got = {r["repo"]: r for r in repo_debt(df, "repo", "content").collect()}
    assert got["r1"]["n_files"] == 2
    assert got["r1"]["n_debt_lines"] == 1
    assert got["r1"]["n_lines"] == 5  # trailing \n yields an empty line
    assert round(got["r1"]["debt_per_kline"], 3) == round(1000 / 5, 3)
    assert got["r2"]["n_debt_lines"] == 0 and got["r2"]["debt_per_kline"] == 0.0
