"""remove_repeated_spans — exact substring-level (Lee et al. 2021) dedup.

Reference has no analog (its scope is per-row validation); this is the
LLM-pipeline repeated-span pass: k-gram fingerprint index, first
occurrence survives, all other occurrences' tokens are removed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators import dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.remove_repeated_spans(df, "doc_id", "text", **kw)
    return {r["doc_id"]: (r["text_despan"], r["n_tokens_removed"])
            for r in out.collect()}


def test_cross_doc_span_removed_first_survives(spark):
    span = "alpha beta gamma delta epsilon zeta eta theta"
    got = _run(spark, [
        (1, f"{span} unique1 tail1"),
        (2, f"prefix2 {span} tail2"),
        (3, "totally different words with no shared span at all here ok"),
    ], k=8)
    assert got[1] == (f"{span} unique1 tail1", 0)  # first occurrence kept
    assert got[2] == ("prefix2 tail2", 8)
    assert got[3][1] == 0


def test_within_doc_repetition(spark):
    half = "x y z w a b c d e f g h"
    got = _run(spark, [(1, f"{half} {half}")], k=8)
    assert got[1] == (half, 12)


def test_short_empty_null_docs_pass_through(spark):
    got = _run(spark, [(1, "only three words"), (2, ""), (3, None)], k=8)
    assert got[1] == ("only three words", 0)
    assert got[2] == ("", 0)
    assert got[3] == ("", 0)


def test_overlapping_spans_union_coverage(spark):
    # doc 2 contains a 9-token repeat of doc 1's window -> two overlapping
    # repeated 8-grams; their covered indices union to 9 tokens
    body = "a b c d e f g h i"
    got = _run(spark, [(1, f"{body} one"), (2, f"{body} two")], k=8)
    assert got[1] == (f"{body} one", 0)
    assert got[2] == ("two", 9)


def test_min_count_three_requires_three_occurrences(spark):
    span = "alpha beta gamma delta epsilon zeta eta theta"
    got = _run(spark, [
        (1, f"{span} t1"),
        (2, f"{span} t2"),
    ], k=8, min_count=3)
    assert got[1][1] == 0 and got[2][1] == 0
    got = _run(spark, [
        (1, f"{span} t1"),
        (2, f"{span} t2"),
        (3, f"{span} t3"),
    ], k=8, min_count=3)
    assert got[1][1] == 0 and got[2][1] == 8 and got[3][1] == 8


def test_pathological_long_mostly_covered_doc(spark):
    # scale guard for the rebuild step: one 100k-token doc that is ~90%
    # covered.  The old per-token array_contains membership filter is
    # O(tokens x covered) ~ 9*10^9 comparisons in ONE row; the
    # array_except rebuild is O(tokens + covered) and must finish fast.
    import time

    unit = " ".join(f"w{i}" for i in range(10))  # 10-token boilerplate
    boiler = " ".join([unit] * 9000)             # 90k tokens, all repeats
    uniq = " ".join(f"u{i}" for i in range(10_000))
    t0 = time.monotonic()
    got = _run(spark, [(1, unit), (2, f"{boiler} {uniq}")], k=8)
    wall = time.monotonic() - t0
    assert got[1][1] == 0                       # first occurrence survives
    despan, removed = got[2]
    assert removed >= 89_000                    # boilerplate stripped
    assert despan.split(" ")[-1] == "u9999"     # unique tail intact, ordered
    assert "u0" in despan
    # generous bound: linear rebuild lands in seconds even on the shared
    # VM; the quadratic one would run for minutes
    assert wall < 120, f"rebuild took {wall:.0f}s — quadratic regression?"


def test_original_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h x", "en"), (2, "a b c d e f g h y", "fr")],
        "doc_id long, text string, lang string",
    )
    out = dedup.remove_repeated_spans(df, "doc_id", "text", k=8)
    assert set(out.columns) == {"doc_id", "text", "lang",
                                "text_despan", "n_tokens_removed"}
    assert out.filter(F.col("lang") == "fr").count() == 1
