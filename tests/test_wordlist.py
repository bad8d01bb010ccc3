from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.functions.wordlist import (
    blocked_term_stats,
    filter_blocked_terms,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python

LIST = ["vileword", "scumterm", "NASTYBIT"]


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string")
    out = blocked_term_stats(df, ["id"], "text", LIST, **kw)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_clean_doc_keeps(spark):
    r = _stats(spark, [(1, "a perfectly ordinary sentence")])
    assert r[1]["n_blocked"] == 0
    assert r[1]["blocked_found"] == ""
    assert r[1]["keep"] == 1


def test_any_hit_drops_by_default(spark):
    r = _stats(spark, [(1, "one vileword among twenty other tokens x y z")])
    assert r[1]["n_blocked"] == 1
    assert r[1]["keep"] == 0


def test_occurrences_vs_distinct_and_sorted_join(spark):
    r = _stats(spark, [(1, "scumterm vileword scumterm")])
    assert r[1]["n_blocked"] == 3
    assert r[1]["n_blocked_distinct"] == 2
    assert r[1]["blocked_found"] == "scumterm,vileword"


def test_case_insensitive_both_sides(spark):
    # list entry NASTYBIT lowercases; text uppercases.
    r = _stats(spark, [(1, "VILEWORD and nastybit")])
    assert r[1]["n_blocked"] == 2


def test_token_boundary_no_substring_match(spark):
    # C4 semantics: a blocked term inside a longer token never matches.
    r = _stats(spark, [(1, "vilewords and xscumterm stay clean")])
    assert r[1]["n_blocked"] == 0
    assert r[1]["keep"] == 1


def test_null_and_empty_text_keep(spark):
    r = _stats(spark, [(1, None), (2, ""), (3, "   ")])
    for i in (1, 2, 3):
        assert r[i]["n_tokens"] == 0
        assert r[i]["n_blocked"] == 0
        assert r[i]["keep"] == 1


def test_soft_rate_threshold(spark):
    # 1 hit / 10 tokens = 0.1 rate: drops at 0.05, keeps at 0.1.
    text = "vileword " + " ".join(f"t{i}" for i in range(9))
    assert _stats(spark, [(1, text)], max_hit_rate=0.05)[1]["keep"] == 0
    assert _stats(spark, [(1, text)], max_hit_rate=0.1)[1]["keep"] == 1


def test_filter_form_matches_stats_keep(spark):
    rows = [(i, f"token{i} vileword" if i % 3 == 0 else f"token{i} fine")
            for i in range(30)]
    df = spark.createDataFrame(rows, "id long, text string")
    kept = {r["id"] for r in
            filter_blocked_terms(df, ["id"], "text", LIST).collect()}
    stats = blocked_term_stats(df, ["id"], "text", LIST)
    expect = {r["id"] for r in stats.filter(F.col("keep") == 1).collect()}
    assert kept == expect == {i for i in range(30) if i % 3 != 0}
    # original columns survive the gate
    out = filter_blocked_terms(df, ["id"], "text", LIST)
    assert out.columns == ["id", "text"]


def test_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    out = blocked_term_stats(df, ["id"], "text", LIST)
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_empty_list_and_reserved_columns_raise(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        blocked_term_stats(df, ["id"], "text", [])
    bad = df.withColumn("_toks", F.lit("boom"))
    with pytest.raises(ValueError):
        blocked_term_stats(bad, ["id"], "text", LIST)


def test_long_arithmetic_no_32bit_overflow(spark):
    # ~110k tokens, zero hits: RHS 20000*110000 = 2.2e9 exceeds int32 —
    # the verdict must still be keep (regression: wrapped negative and
    # dropped the doc).
    big_clean = " ".join(f"t{i}" for i in range(110_000))
    r = _stats(spark, [(1, big_clean)], max_hit_rate=0.02)
    assert r[1]["keep"] == 1
    # 3000 hits: LHS 3e9 exceeds int32 — strict gate must still DROP
    # (regression: wrapped negative and kept it).
    many_hits = "vileword " * 3000
    r = _stats(spark, [(2, many_hits)])
    assert r[2]["n_blocked"] == 3000
    assert r[2]["keep"] == 0


def test_rate_scaling_rounds_not_truncates(spark):
    # 3 hits / 10 tokens at max_hit_rate=0.3: 0.3*1e6 float-reprs just
    # below 300000; truncation dropped the boundary doc.
    text = "vileword vileword vileword " + " ".join(
        f"t{i}" for i in range(7))
    assert _stats(spark, [(1, text)], max_hit_rate=0.3)[1]["keep"] == 1


class TestVocabCoverage:
    def test_doc_grain(self, spark):
        from schema_validator_spark.functions.wordlist import (
            vocab_coverage_stats,
        )

        df = spark.createDataFrame(
            [(1, "The cat SAT on zorp"), (2, ""), (3, None),
             (4, "zorp blip zorp")],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in vocab_coverage_stats(
            df, ["doc_id"], "text", ["the", "cat", "sat", "on"]).collect()}
        assert (got[1]["n_tokens"], got[1]["n_oov"]) == (5, 1)
        assert got[1]["oov_rate"] == 0.2
        assert got[2]["n_oov"] == 0 and got[2]["oov_rate"] == 0.0
        assert got[3]["n_oov"] == 0
        assert (got[4]["n_oov"], got[4]["oov_rate"]) == (3, 1.0)

    def test_top_oov(self, spark):
        from schema_validator_spark.functions.wordlist import (
            top_oov_terms,
        )

        df = spark.createDataFrame(
            [(1, "zorp blip zorp aaa"), (2, "blip zorp ok")],
            "doc_id long, text string")
        got = [(r["token"], r["n"]) for r in
               top_oov_terms(df, "text", ["ok"], top_k=2).collect()]
        assert got == [("zorp", 3), ("blip", 2)]

    def test_guards(self, spark):
        from schema_validator_spark.functions.wordlist import (
            top_oov_terms,
            vocab_coverage_stats,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(ValueError, match="vocab"):
            vocab_coverage_stats(df, ["doc_id"], "text", [])
        with _pt.raises(ValueError, match="top_k"):
            top_oov_terms(df, "text", ["a"], top_k=0)
