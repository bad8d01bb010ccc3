"""Gopher/MassiveText quality-gate signals — each rule exercised by a
crafted document; the gate is a pure codegen projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.functions import gopher as G
from schema_validator_spark.plans import inspect as P

GOOD = ("the quick brown fox and the lazy dog have gone to the market "
        "with plenty of fresh words that keep this document natural "
        "and varied enough for every single quality check to pass fine "
        "because it contains normal sentences of reasonable length")


def _metrics(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = G.gopher_metrics(df, "text").withColumn(
        "keep", G.gopher_keep(min_tokens=10))
    return out.first()


def test_good_doc_passes(spark):
    r = _metrics(spark, GOOD)
    assert r["keep"] is True
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["stopword_hits"] >= 2
    assert r["dup_2gram_frac"] < 0.2


def test_repetitive_doc_fails(spark):
    r = _metrics(spark, "the cat sat here " * 30)
    assert r["dup_2gram_frac"] > 0.9
    assert r["keep"] is False


def test_symbol_heavy_doc_fails(spark):
    r = _metrics(spark, "### " * 20 + GOOD)
    assert r["symbol_ratio"] > 0.1
    assert r["keep"] is False


def test_no_stopwords_fails(spark):
    r = _metrics(spark, "lorem ipsum dolor sit amet consectetur adipiscing "
                        "elit sed eiusmod tempor incididunt labore dolore")
    assert r["stopword_hits"] < 2
    assert r["keep"] is False


def test_duplicate_lines_detected(spark):
    text = "\n".join(["a good line in the middle of things here"] * 4
                     + ["and another distinct line to finish this off"])
    r = _metrics(spark, text)
    assert r["dup_line_frac"] == 0.6


def test_gate_is_single_pass(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    out = G.gopher_metrics(df, "text")
    P.assert_single_pass(out)
    assert not P.uses_python(out)


def test_null_text_yields_zero_metrics(spark):
    """Review regression: NULL text must give 0-valued metrics and a
    False keep decision (matching the oracle's coalesce-to-'' view),
    never NULL-propagated ones."""
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = G.gopher_metrics(df, "text").withColumn(
        "keep", G.gopher_keep(min_tokens=1)).first()
    assert r["n_tokens"] == 0
    assert r["stopword_hits"] == 0
    assert r["mean_word_len"] == 0.0 and r["dup_2gram_frac"] == 0.0
    assert r["keep"] is False


def test_existing_toks_column_not_clobbered(spark):
    """Review regression: an input that already carries a `_toks` column
    must survive gopher_metrics unchanged (the shared tokenization temp
    column uniquifies around it)."""
    df = spark.createDataFrame([(1, GOOD, "keepme")],
                               "doc_id long, text string, _toks string")
    out = G.gopher_metrics(df, "text")
    r = out.first()
    assert r["_toks"] == "keepme"
    assert r["n_tokens"] > 0
