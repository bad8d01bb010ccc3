#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), plus the flagship
full-constraint-suite validation over a generated ``code_files`` table
sized proportionally to the scale factor (sf0.1 → 2,000,000 files).

Prints ONE JSON line:

    {"metric": "...", "value": <total wall sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>,
     "code_files_rows": N, "files_per_sec": R}

Each query is forced end-to-end with a ``noop``-format write (full
computation, zero driver collection).  The scaling-efficiency companion
(north rule: N vs 4N cores) lives in ``bench_scaling.py`` and reports
into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession


DEFAULT_SF_DIR = "/root/testdata/sf0.1"
# north-rule flagship: validated files/sec over code_files at 20M rows/sf.
CODE_FILES_PER_SF = 20_000_000


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("svs-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # sf-scale parquet inputs are tiny (tens of MB); default 128m splits
        # would collapse the scan to 1-2 tasks.  At real scale (>=128MB row
        # groups) the default is right; here we split small so all cores work.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def force(df: DataFrame) -> None:
    """Force full evaluation without driver-side collection."""
    df.write.format("noop").mode("overwrite").save()


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_queries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    for name, fn in entry.queries().items():
        best = None
        for _ in range(3):  # best-of-3: 1st pass pays codegen; the VM's
            t0 = time.perf_counter()  # 3-10x load spikes need >1 clean shot
            force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
    return timings


def code_files_parquet(spark: SparkSession, n_rows: int) -> str:
    """Materialize the deterministic code_files table once (untimed setup)
    so the timed run reads parquet — the shape a real run has."""
    from schema_validator_spark.sources.datagen import code_files

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench", f"code_files_{n_rows}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        code_files(spark, n_rows).write.mode("overwrite").parquet(path)
    return path


def run_code_files_suite(spark: SparkSession, n_rows: int) -> float:
    """Flagship: full constraint suite over the code_files parquet table —
    single-pass form (violations forced end-to-end, per-lang summary
    collected as Observation metrics in the same job).  One warmup pass
    on a slice excludes codegen from the timing; best of 3 timed passes
    damps the sandbox's shared-CPU spikes."""
    from schema_validator_spark.sources.datagen import LANGS, full_suite_engine

    df = spark.read.parquet(code_files_parquet(spark, n_rows))
    eng = full_suite_engine()
    langs = LANGS + ["cobol"]

    v, _ = eng.run(df.limit(20000)).violations_observed(langs)
    force(v)  # codegen warmup

    times = []
    for _i in range(3):
        v, obs = eng.run(df).violations_observed(langs)
        t0 = time.perf_counter()
        force(v)
        _ = obs.get
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_code_files = max(int(CODE_FILES_PER_SF * sf), 100_000)

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    try:
        # warm the JVM/Arrow paths so timings measure the engine, not startup
        force(spark.range(1_000_000).selectExpr("sha2(cast(id as string), 256) h"))

        timings = run_queries(spark, sf_dir)

        t_suite = run_code_files_suite(spark, n_code_files)
        timings["code_files_full_suite"] = round(t_suite, 3)
        print(f"  code_files_full_suite: {t_suite:.3f}s", file=sys.stderr)

        total = round(sum(timings.values()), 3)
        # Per-query map: sidecar file + stderr.  The driver captures only
        # the TAIL of stdout, so a 100+-entry map on the final line gets
        # truncated mid-JSON ("parsed": null in BENCH_r03).  The last
        # stdout line must stay compact and self-contained.
        per_query = {"queries": timings, "sf": sf, "cpus": cpus}
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
        )
        with open(sidecar, "w") as f:
            json.dump(per_query, f, indent=1, sort_keys=True)
        print(json.dumps(per_query), file=sys.stderr)
        out = {
            "metric": f"total wall sec: {len(timings) - 1} headline queries "
                      "@ sf + full constraint suite over generated code_files",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "cpus": cpus,
            "n_queries": len(timings) - 1,
            "code_files_rows": n_code_files,
            "files_per_sec": round(n_code_files / t_suite, 1),
            "suite_sec": round(t_suite, 3),
            "queries_detail": "BENCH_QUERIES.json",
        }
    finally:
        spark.stop()
    # AFTER spark.stop(): the JVM can flush async log lines until it is
    # down; printing last guarantees the compact JSON is the final line
    # of output (the driver tail-captures ~500 bytes and parses the last
    # line — BENCH_r03 recorded parsed:null from a mid-line truncation).
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
