"""The eighth-session gates are pure projections, so they must run
unchanged as Structured Streaming transformations (the ingest-time
deployment: lint/filter/normalize ON ARRIVAL, not in a nightly batch).
File-source streams drained with trigger=availableNow into memory
sinks — deterministic, no timing races (test_streaming.py pattern)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.chatlint import chat_lint
from schema_validator_spark.operators.normalize import normalize_text
from schema_validator_spark.functions.wordlist import (
    blocked_term_stats,
    filter_blocked_terms,
)
from schema_validator_spark.streaming.validate import run_to_memory


@pytest.fixture(scope="module")
def gate_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gates_in"))
    conv_ok = json.dumps([{"role": "user", "content": "hi"},
                          {"role": "assistant", "content": "yo"}])
    rows = [
        (1, "clean words here", conv_ok, "caf\u00e9"),
        (2, "one vileword present", "not json", "plain"),
        (3, "more clean text", conv_ok, "cafe\u0301"),  # NFD
    ]
    df = spark.createDataFrame(
        rows, "id long, text string, conv string, name string")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _read(spark, d):
    return spark.readStream.schema(
        "id long, text string, conv string, name string").parquet(d)


def test_wordlist_gate_streams(spark, gate_dir):
    s = _read(spark, gate_dir)
    stats = blocked_term_stats(s, ["id"], "text", ["vileword"])
    run_to_memory(stats, "t_gate_stats")
    got = {r["id"]: r["keep"] for r in
           spark.sql("select * from t_gate_stats").collect()}
    assert got == {1: 1, 2: 0, 3: 1}
    kept = filter_blocked_terms(s, ["id"], "text", ["vileword"])
    run_to_memory(kept, "t_gate_kept")
    assert {r["id"] for r in
            spark.sql("select id from t_gate_kept").collect()} == {1, 3}


def test_chat_lint_streams(spark, gate_dir):
    s = _read(spark, gate_dir)
    out = chat_lint(s, ["id"], "conv")
    run_to_memory(out, "t_gate_lint")
    got = {r["id"]: r["first_error"] for r in
           spark.sql("select * from t_gate_lint").collect()}
    assert got == {1: "ok", 2: "invalid_json", 3: "ok"}


def test_normalize_streams(spark, gate_dir):
    s = _read(spark, gate_dir)
    out = normalize_text(s, ["id"], "name")
    run_to_memory(out, "t_gate_norm")
    got = {r["id"]: r.asDict() for r in
           spark.sql("select * from t_gate_norm").collect()}
    # NFD row composes to the same bytes as the NFC row
    assert got[3]["text_norm"] == got[1]["text_norm"] == "caf\u00e9"
    assert got[3]["changed"] == 1 and got[1]["changed"] == 0


def test_synthetic_text_gate_streams(spark, gate_dir):
    from schema_validator_spark.functions.synthtext import (
        synthetic_text_stats,
    )

    s = _read(spark, gate_dir)
    flagged = synthetic_text_stats(
        s.withColumn(
            "text",
            F.when(
                F.col("id") == 2,
                F.lit("As an AI language model, I cannot chat."),
            ).otherwise(F.col("text")),
        ),
        ["id"], "text",
    )
    run_to_memory(flagged, "t_gate_synth")
    got = {r["id"]: r["ai_flag"] for r in
           spark.sql("select * from t_gate_synth").collect()}
    assert got == {1: 0, 2: 1, 3: 0}
