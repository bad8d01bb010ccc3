"""Custom stateful streaming operator (applyInPandasWithState):
running totals accumulate across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import ValidationEngine
from schema_validator_spark.streaming.stateful import running_totals

SCHEMA = "id long, lang string, name string"


@pytest.fixture(scope="module")
def multi_batch_dir(spark, tmp_path_factory):
    """Two files -> maxFilesPerTrigger=1 gives two micro-batches."""
    d = tmp_path_factory.mktemp("stateful_in")
    b1 = [(1, "go", "a"), (2, "go", ""), (3, "py", "c")]
    b2 = [(4, "go", "d"), (5, "go", ""), (6, "py", "")]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(d / "f2"))
    return str(d)


def test_running_totals_accumulate(spark, multi_batch_dir):
    eng = ValidationEngine({"name": "required"}, key_cols=["id"])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{multi_batch_dir}/*")
    )
    out = running_totals(eng, stream, "lang")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("t_running")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from t_running").collect()
    # update mode: one emission per (group, batch); the LAST emission per
    # group carries the cumulative totals
    last = {}
    for r in rows:
        cur = last.get(r["group"])
        if cur is None or r["batches_seen"] > cur["batches_seen"]:
            last[r["group"]] = r
    go, py = last["go"], last["py"]
    assert (go["n_rows"], go["n_rows_failed"], go["n_violations"]) == (4, 2, 2)
    assert (py["n_rows"], py["n_violations"]) == (2, 1)
    # state really crossed batches
    assert max(r["batches_seen"] for r in rows) >= 2
