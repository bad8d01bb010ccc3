from __future__ import annotations

from schema_validator_spark.operators.codequality import encoding_stats
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _one(spark, content):
    df = spark.createDataFrame([(1, content)], "id long, content string")
    return encoding_stats(df, "content", keep_cols=["id"]).collect()[0]


def test_crlf_file(spark):
    r = _one(spark, "a\r\nb\r\n")
    assert (r["n_crlf"], r["n_lone_lf"], r["n_lone_cr"]) == (2, 0, 0)
    assert r["line_ending"] == "crlf"


def test_lf_and_cr_and_none(spark):
    assert _one(spark, "a\nb\n")["line_ending"] == "lf"
    assert _one(spark, "a\rb")["line_ending"] == "cr"
    assert _one(spark, "single line")["line_ending"] == "none"
    assert _one(spark, "")["line_ending"] == "none"


def test_mixed_endings(spark):
    r = _one(spark, "a\r\nb\nc")
    assert (r["n_crlf"], r["n_lone_lf"]) == (1, 1)
    assert r["line_ending"] == "mixed"


def test_control_bom_replacement(spark):
    r = _one(spark, "﻿x\x07y��")
    assert r["has_bom"] is True
    assert r["n_control"] == 1
    assert r["n_replacement"] == 2
    # tab/LF/CR are NOT control violations
    assert _one(spark, "a\tb\nc\r\n")["n_control"] == 0


def test_null_content(spark):
    r = _one(spark, None)
    assert r["n_chars"] == 0 and r["line_ending"] == "none"
    assert r["has_bom"] is False


def test_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a\nb")], "id long, content string")
    out = encoding_stats(df, "content", keep_cols=["id"])
    assert n_exchanges(out) == 0
    assert not uses_python(out)
