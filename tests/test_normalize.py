from __future__ import annotations

import unicodedata

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.normalize import (
    normalize_text,
    punct_normalize,
)
from schema_validator_spark.plans.inspect import n_exchanges

NFD_CAFE = "café"          # 'café' decomposed
NFC_CAFE = "café"


def _norm(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return {r["id"]: r.asDict()
            for r in normalize_text(df, ["id"], "text").collect()}


def test_nfc_composition(spark):
    assert unicodedata.normalize("NFC", NFD_CAFE) == NFC_CAFE
    r = _norm(spark, [(1, NFD_CAFE)])[1]
    assert r["text_norm"] == NFC_CAFE
    assert r["changed"] == 1
    assert r["n_chars_before"] == 5 and r["n_chars_after"] == 4


def test_punctuation_unification(spark):
    r = _norm(spark, [(1, "“smart” – ‘quotes’ — here now")])[1]
    assert r["text_norm"] == "\"smart\" - 'quotes' - here now"
    assert r["changed"] == 1


def test_zero_width_removed_and_line_endings(spark):
    r = _norm(spark, [(1, "a​b\r\nc\rd﻿")])[1]
    assert r["text_norm"] == "ab\nc\nd"


def test_ascii_identity_and_null(spark):
    r = _norm(spark, [(1, "plain ascii text"), (2, None), (3, "")])
    assert r[1]["text_norm"] == "plain ascii text"
    assert r[1]["changed"] == 0
    assert r[2]["text_norm"] is None
    assert r[2]["changed"] == 0 and r[2]["n_chars_before"] == 0
    assert r[3]["text_norm"] == "" and r[3]["changed"] == 0


def test_already_nfc_non_ascii_unchanged(spark):
    r = _norm(spark, [(1, NFC_CAFE)])[1]
    assert r["text_norm"] == NFC_CAFE and r["changed"] == 0


def test_exact_dedup_repaired(spark):
    # the load-bearing property: NFC/NFD twins hash identically after
    df = spark.createDataFrame(
        [(1, NFD_CAFE), (2, NFC_CAFE)], "id long, text string")
    out = normalize_text(df, ["id"], "text")
    shas = [r[0] for r in out.select(F.sha2("text_norm", 256)).collect()]
    assert shas[0] == shas[1]


def test_punct_tier_is_codegen_only(spark):
    df = spark.createDataFrame([(1, "x–y")], "id long, text string")
    out = df.select(punct_normalize(F.col("text")).alias("t"))
    assert n_exchanges(out) == 0
    assert out.collect()[0]["t"] == "x-y"


def test_reserved_columns_raise(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        normalize_text(df.withColumn("_t2", F.lit(1)), ["id"], "text")


def test_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    assert n_exchanges(normalize_text(df, ["id"], "text")) == 0
