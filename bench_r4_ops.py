#!/usr/bin/env python
"""Capacity points for the round-4 operators (recorded in BENCH.md).

Synthesizes deterministic corpora in-Spark (no external data) at sizes
far beyond the sf parquet, and runs each operator end-to-end:

- edit_join:      1M zero-padded key strings (dense distance-1
                  neighborhoods, the worst realistic case)
- winnow_pairs:   200k ~600-char docs with 2k planted clone blocks
- shared_content: 4M (repo, file) rows over 20k repos incl. planted
                  vendored sets and a capped boilerplate file
- doc_chunks:     200k ~600-char docs -> 32-token windows, overlap 8
- check_suite:    8-assertion suite over 64M generated code_files rows

Usage: python bench_r4_ops.py [cpus]   (default 32; one JSON line per op)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

import bench


def _docs(spark, n):
    """Deterministic ~600-char word-salad docs; ids < 2000 get a shared
    clone block (>= 21 normalized chars) planted mid-doc."""
    words = F.expr(
        "transform(sequence(1, 75), i ->"
        " substring(md5(cast(id * 100 + i as string)), 1, 7))"
    )
    clone = F.when(
        F.col("id") < 2000,
        F.lit(" sharedcloneblockjklmnopqrstuv "),
    ).otherwise(F.lit(" "))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(F.slice(words, 1, 40), " "),
            clone,
            F.array_join(F.slice(words, 41, 35), " "),
        ).alias("text"),
    )


def run_edit_join(spark, n=1_000_000):
    from schema_validator_spark.operators.editjoin import edit_join_exact

    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.format_string("Customer#%09d", F.col("id")).alias("name"),
    )
    t = time.time()
    cnt = edit_join_exact(df, "k", "name", max_dist=1).count()
    return {"op": "edit_join", "rows": n, "pairs": cnt,
            "sec": round(time.time() - t, 1)}


def run_winnow(spark, n=200_000):
    from schema_validator_spark.operators.winnow import winnow_pairs

    t = time.time()
    cnt = winnow_pairs(
        _docs(spark, n), "doc_id", "text",
        k=12, window=10, min_shared=1, max_bucket_size=4000,
    ).count()
    return {"op": "winnow_pairs", "docs": n, "pairs": cnt,
            "sec": round(time.time() - t, 1)}


def run_shared_content(spark, n=4_000_000, repos=20_000):
    from schema_validator_spark.operators.crossrepo import (
        shared_content_pairs,
    )

    # ~200 files/repo; every 50th file is vendored content shared by ~10
    # DIFFERENT repos (prime modulus 7919 keeps copies off the repo
    # cycle); every 197th row is identical boilerplate spread over
    # thousands of repos — the hot bucket the cap must absorb
    df = spark.range(n).select(
        F.concat(F.lit("r"), (F.col("id") % repos).cast("string"))
        .alias("repo"),
        F.when(F.col("id") % 197 == 0, F.lit("boilerplate-license"))
        .when(
            F.col("id") % 50 == 0,
            F.concat(F.lit("vendored-"),
                     ((F.col("id") / 50).cast("long") % 7919).cast("string")),
        )
        .otherwise(F.md5(F.col("id").cast("string")))
        .alias("content"),
    )
    t = time.time()
    cnt = shared_content_pairs(
        df, "repo", "content", min_shared=1, max_repos_per_content=100,
    ).count()
    return {"op": "shared_content", "rows": n, "repos": repos,
            "pairs": cnt, "sec": round(time.time() - t, 1)}


def run_doc_chunks(spark, n=200_000):
    from schema_validator_spark.operators.chunking import chunk_documents

    t = time.time()
    cnt = chunk_documents(
        _docs(spark, n), "doc_id", "text", chunk_tokens=32, overlap=8
    ).count()
    return {"op": "doc_chunks", "docs": n, "chunks": cnt,
            "sec": round(time.time() - t, 1)}


def run_check_suite(spark, n=64_000_000):
    from schema_validator_spark.operators.checks import Check, run_checks
    from schema_validator_spark.sources.datagen import code_files

    df = code_files(spark, n)
    checks = [
        Check("has rows", "size", ">=", 1000),
        Check("content filled", "completeness", ">=", 0.99,
              column="content"),
        Check("lang filled", "completeness", ">=", 0.95, column="lang"),
        Check("paths unique", "uniqueness", ">=", 0.99, column="path"),
        Check("langs bounded", "distinctness", "<=", 0.001, column="lang"),
        Check("repo set bounded", "approx_distinct", "<=", 1e6,
              column="repo"),
        Check("content sane", "compliance", ">=", 0.99,
              predicate="length(content) between 1 and 100000"),
        Check("commit is sha1-hex", "compliance", ">=", 0.99,
              predicate="commit rlike '^[0-9a-f]{40}$'"),
    ]
    t = time.time()
    rows = run_checks(df, checks).collect()
    return {"op": "check_suite", "rows": n,
            "checks": len(rows),
            "statuses": sorted({r["status"] for r in rows}),
            "sec": round(time.time() - t, 1)}


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    only = set(sys.argv[2:])  # optional op-name filter
    spark = bench.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    all_fns = (run_edit_join, run_winnow, run_shared_content,
               run_doc_chunks, run_check_suite)
    for fn in all_fns:
        if only and fn.__name__.removeprefix("run_") not in only:
            continue
        try:
            out = fn(spark)
        except Exception as exc:  # keep later points running
            out = {"op": fn.__name__, "error": str(exc)[:200]}
        out["cpus"] = cpus
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
