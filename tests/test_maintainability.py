from __future__ import annotations

import math

from schema_validator_spark.operators.maintainability import (
    MI_COEFFS,
    maintainability_index,
)

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = maintainability_index(df, ["doc_id"], "content", "lang", **kw)
    return {r["doc_id"]: r for r in got.collect()}


def _mi(volume, cyclomatic, n_lines):
    a0, av, ac, al = MI_COEFFS
    raw = (
        a0
        - av * math.log(max(volume, 1.0))
        - ac * cyclomatic
        - al * math.log(n_lines)
    )
    return max(0.0, 100.0 * raw / a0)


def test_hand_computed_example(spark):
    # py: "x = x + 1" — halstead test pins V = 5*log2(4); no branch
    # keywords -> CC = 1; one line.
    got = _run(spark, [(0, "py", "x = x + 1")])
    r = got[0]
    v = 5 * math.log2(4)
    assert math.isclose(r["volume"], v)
    assert r["cyclomatic"] == 1 and r["n_lines"] == 1
    assert math.isclose(r["mi"], _mi(v, 1, 1))


def test_branches_lower_the_score(spark):
    plain = "x = 1\ny = 2\n"
    branchy = "if a and b:\n\tx = 1\n"
    got = _run(spark, [(0, "py", plain), (1, "py", branchy)])
    assert got[1]["cyclomatic"] > got[0]["cyclomatic"]
    # same magnitude of volume/lines; the CC term must dominate
    assert got[1]["mi"] < got[0]["mi"]


def test_empty_and_null_content_score_maximal(spark):
    # V=0 guarded to 1 (ln=0), CC=1, LOC=1 -> raw = 171 - 0.23
    got = _run(spark, [(0, "py", ""), (1, "py", None)])
    want = _mi(0.0, 1, 1)
    for i in (0, 1):
        assert math.isclose(got[i]["mi"], want)
        assert got[i]["mi"] > 99.0


def test_never_negative(spark):
    # pathological: huge volume + deep branching floors at 0
    body = "if a and b or c:\n" * 400 + "x = " + " + ".join(
        f"v{i}" for i in range(400)
    )
    got = _run(spark, [(0, "py", body)])
    assert got[0]["mi"] == 0.0


def test_unregistered_lang_still_scores(spark):
    got = _run(spark, [(0, "cobol", "IF X > 0\nEND-IF\n")])
    r = got[0]
    assert r["cyclomatic"] == 1  # no decision syntax registered
    assert 0.0 <= r["mi"] <= 100.0


def test_longer_files_score_lower(spark):
    short = "x = 1\n"
    long = "x = 1\n" * 200
    got = _run(spark, [(0, "py", short), (1, "py", long)])
    assert got[1]["mi"] < got[0]["mi"]
