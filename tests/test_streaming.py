"""Structured Streaming validation (streaming/validate.py).

File-source stream drained with trigger=availableNow into memory sinks —
deterministic, no timing races.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import ValidationEngine
from schema_validator_spark.streaming.validate import (
    run_to_memory,
    summary_stream,
    violations_stream,
)

SCHEMA = "id long, lang string, name string, ts timestamp"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    rows = [
        (1, "go", "alpha", "2026-01-01 00:00:10"),
        (2, "go", "", "2026-01-01 00:00:20"),       # name required fails
        (3, "py", "gamma", "2026-01-01 00:01:10"),
        (4, "zz", "delta", "2026-01-01 00:01:20"),  # lang oneof fails
    ]
    df = spark.createDataFrame(rows, "id long, lang string, name string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture()
def engine():
    return ValidationEngine(
        {"name": "required", "lang": "required|oneof=go,py,rs"},
        key_cols=["id"],
        partition_cols=["lang"],
    )


def _read_stream(spark, d):
    return spark.readStream.schema(SCHEMA).parquet(d)


def test_violations_stream(spark, stream_dir, engine):
    v = violations_stream(engine, _read_stream(spark, stream_dir))
    assert v.isStreaming
    run_to_memory(v, "t_violations", output_mode="append")
    got = {(r["id"], r["field"], r["code"])
           for r in spark.sql("select * from t_violations").collect()}
    assert got == {(2, "name", "required"), (4, "lang", "oneof")}


def test_summary_stream_windowed(spark, stream_dir, engine):
    s = summary_stream(
        engine, _read_stream(spark, stream_dir),
        event_time_col="ts", window_duration="1 minute",
        watermark_delay="2 minutes",
    )
    assert s.isStreaming
    # availableNow drains in one batch; complete mode emits all windows
    run_to_memory(s, "t_summary", output_mode="complete")
    rows = spark.sql("select * from t_summary").collect()
    by_key = {(r["window"].start.minute, r["lang"]): r for r in rows}
    assert by_key[(0, "go")]["n_rows"] == 2
    assert by_key[(0, "go")]["n_rows_failed"] == 1
    assert by_key[(1, "py")]["n_violations"] == 0
    assert by_key[(1, "zz")]["n_violations"] == 1


def test_stream_plan_is_stateless_rowlevel(spark, stream_dir, engine):
    # the violations branch must add no stateful operator (no state store)
    v = violations_stream(engine, _read_stream(spark, stream_dir))
    explain = v._jdf.queryExecution().analyzed().toString()
    assert "StateStore" not in explain


def test_violations_stream_parquet_sink_exactly_once(spark, stream_dir, engine, tmp_path):
    """Production path: violations stream -> parquet sink with a
    streaming checkpoint.  A second availableNow run over the SAME input
    must add no duplicate rows (source offsets are committed)."""
    out = str(tmp_path / "viol_out")
    ckpt = str(tmp_path / "viol_ckpt")

    def run_once():
        v = violations_stream(engine, _read_stream(spark, stream_dir))
        q = (
            v.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).collect()
    assert {(r["id"], r["code"]) for r in first} == {
        (2, "required"), (4, "oneof")
    }
    run_once()  # restart over same input: offsets committed, no re-emit
    second = spark.read.parquet(out).collect()
    assert len(second) == len(first)


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicates arriving inside the watermark
    are dropped; state is watermark-bounded (dropDuplicatesWithinWatermark)."""
    import datetime as dt

    from schema_validator_spark.streaming.validate import dedup_stream, run_to_memory

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=1)),   # dup, different event time
        (2, base),
        (3, base + dt.timedelta(minutes=5)),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    p = str(tmp_path / "dedup_in")
    df.write.parquet(p)
    stream = spark.readStream.schema("k long, ts timestamp").parquet(p)
    out = dedup_stream(stream, ["k"], event_time_col="ts",
                       watermark_delay="10 minutes")
    run_to_memory(out, "t_dedup_stream", output_mode="append")
    got = sorted(r["k"] for r in spark.table("t_dedup_stream").collect())
    assert got == [1, 2, 3]


def test_session_stream_matches_batch_and_sessionize(spark, tmp_path_factory):
    """Native session_window streaming sessions == the same call in batch
    == the batch sessionize window algebra (n_events + duration)."""
    import datetime as dt

    from schema_validator_spark.operators import sessions as SS
    from schema_validator_spark.streaming.sessions import session_stats_stream
    from schema_validator_spark.streaming.validate import run_to_memory

    def ts(minute):
        return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=minute)

    rows = [
        (1, 10, ts(0)), (1, 11, ts(5)),         # session 1 (user 1)
        (1, 12, ts(45)), (1, 13, ts(50)),       # >30min gap -> session 2
        (2, 20, ts(0)),                         # single-event session
        (2, 21, ts(29)), (2, 22, ts(58)),       # chained: gaps < 30min merge
    ]
    d = str(tmp_path_factory.mktemp("sess_in"))
    batch = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    batch.coalesce(1).write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema("user_id long, event_id long, ts timestamp").parquet(d)
    out = session_stats_stream(stream, "user_id", "ts", gap="30 minutes")
    assert out.isStreaming
    run_to_memory(out, "t_sessions", output_mode="complete")
    got = {
        (r["user_id"], r["n_events"], r["duration_us"])
        for r in spark.sql("select * from t_sessions").collect()
    }
    # same call on the batch frame
    got_batch = {
        (r["user_id"], r["n_events"], r["duration_us"])
        for r in session_stats_stream(batch, "user_id", "ts",
                                      gap="30 minutes").collect()
    }
    # batch sessionize ground truth
    want = {
        (r["user_id"], r["n_events"], r["duration_sec"] * 1_000_000)
        for r in SS.session_stats(batch, "user_id", "ts", id_col="event_id",
                                  gap_seconds=1800).collect()
    }
    assert got == got_batch == want
    # user 2's chained 58-minute session survived as ONE session
    assert (2, 2, 29 * 60 * 1_000_000) in got or (2, 3, 58 * 60 * 1_000_000) in got


def test_dedup_stream_against_corpus(spark, tmp_path_factory):
    """Stream-static LEFT ANTI join: stream rows whose content hash is
    already in the static corpus are dropped; fresh rows pass through."""
    from schema_validator_spark.streaming.validate import (
        dedup_stream_against_corpus, run_to_memory,
    )

    d = str(tmp_path_factory.mktemp("ss_dedup"))
    spark.createDataFrame(
        [(10, "alpha"), (11, "fresh one"), (12, None), (13, "beta")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(d)
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string")

    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    out = dedup_stream_against_corpus(stream, corpus, "text")
    assert out.isStreaming
    run_to_memory(out, "t_ss_dedup", output_mode="append")
    got = sorted(r["doc_id"] for r in spark.sql("select * from t_ss_dedup").collect())
    assert got == [11, 12]  # NULL text hashes as '' — absent from corpus


def test_dedup_stream_soak_state_stays_watermark_bounded(spark, tmp_path):
    """Multi-micro-batch soak (VERDICT r4 order #7): 8 rate-limited
    batches (maxFilesPerTrigger=1, one parquet file each) of 100 fresh
    keys x2 duplicates, event time advancing 10 min/batch against a
    5-min watermark.  State must PLATEAU at ~2 windows (current batch +
    one awaiting watermark), not grow with the stream: 800 distinct
    keys pass through while the state store never holds more than 200.
    """
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_validator_spark.streaming.validate import dedup_stream

    d = str(tmp_path / "soak_in")
    os.makedirs(d)
    base = dt.datetime(2024, 1, 1)
    n_files, keys_per = 8, 100
    for i in range(n_files):
        ks, ts = [], []
        for j in range(keys_per):
            k = i * 1000 + j
            t = base + dt.timedelta(seconds=i * 600 + (j % 60))
            ks += [k, k]
            ts += [t, t + dt.timedelta(seconds=30)]
        tbl = pa.table({
            "k": pa.array(ks, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        })
        f = f"{d}/b{i:02d}.parquet"
        pq.write_table(tbl, f)
        # force the file-source pick-up order = batch order
        os.utime(f, (1e9 + i, 1e9 + i))

    stream = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = dedup_stream(
        stream, ["k"], event_time_col="ts", watermark_delay="5 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_soak")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "soak_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # correctness: every duplicate dropped, every distinct key kept once
    assert spark.table("t_dedup_soak").count() == n_files * keys_per

    stats = [
        (p["batchId"], p["stateOperators"][0]["numRowsTotal"],
         p["stateOperators"][0]["numRowsRemoved"])
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    assert len(stats) >= 5, f"soak needs >=5 micro-batches, got {stats}"
    # bounded: never more than 2 watermark windows of keys in state,
    # even though 8 windows' worth of distinct keys flowed through
    assert max(s[1] for s in stats) <= 2 * keys_per, stats
    # and the bound comes from EVICTION, not a short stream: once the
    # watermark starts moving, every batch drops a full window of state
    assert sum(s[2] for s in stats) >= (n_files - 2) * keys_per, stats
