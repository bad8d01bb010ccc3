#!/usr/bin/env python
"""End-to-end curation-funnel capacity run (BENCH.md evidence).

The component operators all have individual scale points; this measures
the COMPOSED pipeline (operators/curate.py) at millions of docs — the
shape a real pre-training data run has — and records wall time plus the
per-stage survivor funnel.

Synthetic corpus (deterministic, generated in pure Spark expressions —
no driver-side data): blocks of 20 docs with planted roles so every
funnel stage has a KNOWN expected effect:

    id % 20 in 0..12  (65%)  unique good doc: 90 hash-derived 4-letter
                             words with "the"/"and" planted at per-doc
                             hash-chosen positions (~450 chars, quality
                             ~0.9, Gopher-clean, lang=en).  The stopwords
                             sit at DIFFERENT positions per doc so
                             unrelated docs share ~zero shingles — a
                             fixed shared prefix would give every pair
                             j~0.05 and blow the LSH candidate set up to
                             ~10^9 junk pairs at 8M docs.
    id % 20 == 13     ( 5%)  NULL text        -> validation drop
    id % 20 in 14..16 (15%)  exact copy of the block's role-0 doc
                                              -> exact-dedup drop
    id % 20 in 17..18 (10%)  near-dup: role-0 text + 1 extra token
                             (Jaccard ~0.97)  -> near-dup drop
    id % 20 == 19     ( 5%)  junk ("zz" x30, quality ~0.3)
                                              -> quality drop

Expected funnel at n docs: input n -> valid 0.95n -> quality 0.90n ->
gopher 0.90n -> dedup 0.65n (one survivor per {0,14..18} cluster plus
the 12 other uniques per block).  The script asserts these exactly —
the capacity run doubles as an at-scale correctness check.

Usage:  python bench_curation.py            # default 8M docs
        SPARK_GRAFT_CURATION_DOCS=4000000 python bench_curation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

import bench

N_DOCS = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", "8000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

def synth_docs(spark, n: int):
    """Planted-role corpus, one pure-codegen projection over range(n)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    role = F.col("doc_id") % 20
    # word-hash seed: the dup/near-dup roles (14..18) copy the block's
    # role-0 doc; every other role seeds from its OWN id (a block-wide
    # seed would make roles 0..12 identical -> 13-cliques everywhere)
    src = F.when(role >= 14, F.col("doc_id") - role).otherwise(F.col("doc_id"))

    # "the"/"and" at per-doc positions: satisfies the Gopher stopword
    # rule (>=2 hits) and lang_id=en, WITHOUT a shared cross-doc shingle.
    # ONE transform lambda (not 90 unrolled whens — that blows whole-stage
    # codegen's 64 KB method limit and falls back to interpreted eval).
    p1 = F.pmod(F.xxhash64(src, F.lit(-1)), F.lit(45))
    p2 = F.lit(45) + F.pmod(F.xxhash64(src, F.lit(-2)), F.lit(45))

    def tok(i):
        # 4 lowercase letters from one 64-bit hash: 26^4 vocab so docs
        # are ~all-distinct-token (high rep score)
        h = F.xxhash64(src, i)
        w = F.concat(*[
            F.char(F.lit(97) + F.pmod(h + F.lit(j * 7919), F.lit(26)))
            for j in range(4)
        ])
        return (
            F.when(i == p1, F.lit("the"))
            .when(i == p2, F.lit("and"))
            .otherwise(w)
        )

    body = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(89)), tok), " "
    )
    junk = F.concat_ws(" ", *([F.lit("zz")] * 30))
    text = (
        F.when(role == 13, F.lit(None).cast("string"))
        .when(role == 19, junk)
        .when(role.isin(17, 18),
              F.concat(body, F.lit(" q"), F.col("doc_id").cast("string")))
        .otherwise(body)
    )
    return base.select(
        "doc_id",
        F.lit("en").alias("lang"),
        text.alias("text"),
    )


def docs_parquet(spark, n: int) -> str:
    path = os.path.join(".bench", f"curation_docs_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_docs(spark, n).repartition(CPUS * 4).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    from schema_validator_spark.operators.curate import CurationReport, curate

    spark = bench.build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        path = docs_parquet(spark, N_DOCS)
        docs = spark.read.parquet(path)

        report = CurationReport()
        t0 = time.perf_counter()
        out = curate(
            docs,
            spec={"text": "required", "lang": "required|oneof=en,es,de,fr"},
            min_quality=0.5,
            gopher_gate={},           # Gopher published defaults
            near_dup_threshold=0.8,
            report=report,
        )
        # report-mode materializes each stage; force the final output too
        bench.force(out)
        wall = time.perf_counter() - t0

        n = N_DOCS
        expect = {
            "input": n,
            "valid": n - n // 20,          # role 13 dropped
            "quality": n - 2 * (n // 20),  # + role 19 dropped
            "gopher": n - 2 * (n // 20),   # no additional drops
            "dedup": 13 * (n // 20),       # one survivor per cluster
        }
        for stage_name, want in expect.items():
            got = report.counts[stage_name]
            assert got == want, f"{stage_name}: got {got}, want {want}"

        result = {
            "metric": "curation funnel (validate->quality->gopher->"
                      "exact+near dedup->keep-best), synthetic planted corpus",
            "docs": n,
            "cpus": CPUS,
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n / wall, 1),
            "funnel": report.counts,
            "expected_funnel_exact_match": True,
        }
        print(json.dumps(result))
        _append_bench_md(result)
    finally:
        spark.stop()


_MD_HEAD = "## Curation funnel capacity run"


def _append_bench_md(r: dict) -> None:
    funnel_rows = "\n".join(
        f"| {k} | {v:,} |" for k, v in r["funnel"].items()
    )
    md = f"""{_MD_HEAD} — {r['docs']:,} docs (round 4)

Composed pipeline (`operators/curate.py`): validation (required +
oneof) -> quality gate (>=0.5) -> Gopher gate (published defaults) ->
exact fingerprint dedup + MinHash-LSH near-dup (j>=0.8) -> connected
components -> keep-best.  Deterministic planted-role corpus (see
`bench_curation.py`); every stage count asserted against the planted
expectation, so this is an at-scale correctness check too.

| stage | surviving docs |
|---|---|
{funnel_rows}

**{r['docs']:,} docs end-to-end in {r['wall_sec']}s on local[{r['cpus']}]
= {r['docs_per_sec']:,.0f} docs/s** (report mode: each stage counted =
materialized once; a production run composes lazily into one plan).
Funnel matched the planted expectation exactly.

Reproduce: `python bench_curation.py`.
"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    old = open(path).read()
    if _MD_HEAD in old:  # replace a previous run's section
        i = old.find(_MD_HEAD)
        j = old.find("\n## ", i)
        old = old[:i] + (old[j + 1:] if j != -1 else "")
    with open(path, "w") as f:
        f.write(old.rstrip() + "\n\n" + md)


if __name__ == "__main__":
    main()
