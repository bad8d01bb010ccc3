from __future__ import annotations

from schema_validator_spark.operators.codequality import conflict_markers

SCHEMA = "doc_id long, content string"

CONFLICT = (
    "def f():\n"
    "<<<<<<< HEAD\n"
    "    return 1\n"
    "=======\n"
    "    return 2\n"
    ">>>>>>> feature\n"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = conflict_markers(df, "content", keep_cols=["doc_id"])
    return {r["doc_id"]: r for r in got.collect()}


def test_real_conflict_flags(spark):
    r = _run(spark, [(0, CONFLICT)])[0]
    assert (
        r["n_conflict_starts"],
        r["n_conflict_seps"],
        r["n_conflict_ends"],
    ) == (1, 1, 1)
    assert r["has_conflict"]


def test_rst_underline_alone_never_flags(spark):
    rst = "Title\n=======\n\nbody text\n"
    r = _run(spark, [(0, rst)])[0]
    assert r["n_conflict_seps"] == 1
    assert not r["has_conflict"]


def test_fixture_start_marker_alone_never_flags(spark):
    r = _run(spark, [(0, "x = '<<<<<<< HEAD'\n<<<<<<< ours\n")])[0]
    # quoted marker is mid-line, only the line-anchored one counts
    assert r["n_conflict_starts"] == 1
    assert not r["has_conflict"]


def test_eight_char_runs_do_not_count(spark):
    r = _run(spark, [(0, "<<<<<<<<\n========\n>>>>>>>>\n")])[0]
    assert (
        r["n_conflict_starts"],
        r["n_conflict_seps"],
        r["n_conflict_ends"],
    ) == (0, 0, 0)


def test_bare_markers_at_eof_count(spark):
    # no trailing newline: the last line is still classified
    r = _run(spark, [(0, "<<<<<<<\n=======\n>>>>>>>")])[0]
    assert r["has_conflict"]


def test_null_and_empty(spark):
    got = _run(spark, [(0, None), (1, "")])
    for i in (0, 1):
        assert not got[i]["has_conflict"]
        assert got[i]["n_conflict_starts"] == 0


def test_multiple_conflicts_counted(spark):
    r = _run(spark, [(0, CONFLICT * 3)])[0]
    assert r["n_conflict_starts"] == 3
    assert r["n_conflict_seps"] == 3
    assert r["n_conflict_ends"] == 3
