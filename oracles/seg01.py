"""Driver-contract queries + oracle SQL: rule_violations, partition_summary, sha256_invariant, string_rules_profile, luhn_profile, unique_stats, ....

Split from the monolithic __spark_entry__.py (round 5); the contract is
byte-pinned by tests/test_contract_pin.py."""

from __future__ import annotations

from ._shared import (
    EVENTS_SCHEMA,
    F,
    QC,
    ValidationEngine,
    X,
    _CORR_COLS,
    _doc_engine,
    _t,
    ann,
    dedup,
    drift,
    referential,
    skew,
    uniqueness,
)




# ---------------------------------------------------------------------------
# queries


def q_rule_violations(spark, sf_dir):
    """Row-level constraint eval + violation emission (SURVEY.md §2.0)."""
    res = _doc_engine().run(_t(spark, sf_dir, "documents"))
    return res.violations.select("doc_id", "field", "code")


def q_partition_summary(spark, sf_dir):
    """Per-partition pass/fail summary (validator.go:43-48 generalized)."""
    res = _doc_engine().run(_t(spark, sf_dir, "documents"))
    return res.summary.select("lang", "n_rows", "n_rows_failed", "n_violations")


def q_sha256_invariant(spark, sf_dir):
    """Per-row invariant: sha256(content) (BASELINE.json input_hint)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
    )


def q_string_rules_profile(spark, sf_dir):
    """String/format rule pack applied column-wide: failures per rule."""
    from schema_validator_spark.registry import RuleContext, default_registry
    from pyspark.sql import types as T

    docs = _t(spark, sf_dir, "documents")
    reg = default_registry()
    ctx = RuleContext("text", F.col("text"), T.StringType(), {})
    rules = [
        ("ascii", ()),
        ("lowercase", ()),
        ("contains", ("data",)),
        ("startswith", ("key",)),
        ("number", ()),
        ("alpha", ()),
    ]
    aggs = [
        F.sum((~reg.make(name, ctx, params)).cast("long")).alias(f"r{i}")
        for i, (name, params) in enumerate(rules)
    ]
    # unpivot JVM-side (stack) — no driver collect, no Python workers
    stack_args = ", ".join(
        f"'{name}', r{i}" for i, (name, _p) in enumerate(rules)
    )
    return docs.agg(*aggs).selectExpr(
        f"stack({len(rules)}, {stack_args}) as (rule, n_failed)"
    )


def q_luhn_profile(spark, sf_dir):
    """Pure-SQL Luhn checksum (format.go:378-397) over derived digit strings."""
    from schema_validator_spark.rules.formats import _luhn_ok

    orders = _t(spark, sf_dir, "orders")
    s = F.col("o_orderkey").cast("string")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_luhn_ok(s).cast("long")).alias("n_luhn_valid"),
    )


def q_unique_stats(spark, sf_dir):
    """Exact uniqueness (north_rule: groupBy-count)."""
    return uniqueness.exact_uniqueness_stats(
        _t(spark, sf_dir, "lineitem"), ["l_orderkey"]
    )


def q_duplicate_keys(spark, sf_dir):
    """Duplicate key groups on orders.o_custkey."""
    return uniqueness.duplicate_keys(_t(spark, sf_dir, "orders"), ["o_custkey"])


def q_referential_orphans(spark, sf_dir):
    """RI violations via left_anti against a restricted dimension."""
    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 3)
    out = referential.referential_violations(
        orders, ["o_custkey"], dim, ["c_custkey"], broadcast=True
    )
    return out.select("o_orderkey", "o_custkey")


def q_orphan_stats(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 3)
    return referential.orphan_stats(
        orders, ["o_custkey"], dim, ["c_custkey"], broadcast=True
    ).select("n_rows", "n_orphans")


def q_bloom_referential(spark, sf_dir):
    """Bloom-accelerated EXACT referential check — the scale tier for a
    dim whose key set is too big to broadcast but whose ~1-byte/key
    Bloom fits every executor.  Bloom misses are definite orphans with
    zero joins; Bloom false positives are weeded by an exact anti-join
    over DISTINCT survivor keys only.  num_bits deliberately small so
    BOTH paths (codegen classify + FP verify) carry traffic at the gate
    SFs; the result is exact for any parameters, so the oracle is the
    plain anti-join."""
    from schema_validator_spark.operators.bloom import (
        bloom_referential_violations,
    )

    li = _t(spark, sf_dir, "lineitem")
    dim = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 != 2)
    out = bloom_referential_violations(
        li, ["l_suppkey"], dim, ["s_suppkey"], num_bits=1024, num_hashes=3
    )
    return out.select("l_orderkey", "l_linenumber", "l_suppkey")


def q_categorical_drift(spark, sf_dir):
    """Two-sample categorical drift (chi-square + JSD + TVD) on
    event_type between the even- and odd-user halves of events — ONE
    data shuffle; oracle replays the identical float op sequence."""
    from schema_validator_spark.operators.drift import categorical_drift_df

    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("user_id") % 2 == 0)
    cur = ev.filter(F.col("user_id") % 2 == 1)
    return categorical_drift_df(base, cur, "event_type")


def q_drift_stats(spark, sf_dir):
    """Per-group distribution stats (drift check input)."""
    out = drift.column_stats(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", ["l_returnflag"]
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round(F.col("mean"), 2).alias("mean"),
        F.round(F.col("stddev"), 2).alias("stddev"),
        F.round(F.col("min"), 2).alias("min"),
        F.round(F.col("max"), 2).alias("max"),
    )


def q_drift_buckets(spark, sf_dir):
    """Histogram buckets per event_type — the drift comparison input."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int")
    return (
        ev.groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_column_profile(spark, sf_dir):
    """One-pass per-column stats (north_rule 'column stats')."""
    from schema_validator_spark.operators import profile as PR

    docs = _t(spark, sf_dir, "documents")
    return PR.profile_exact(docs, ["lang", "source", "n_chars"])


def q_salted_distinct(spark, sf_dir):
    """Exact distinct-count under skew: two-level salted aggregation
    (operators/skew.py — the mega-repo path of the north rule)."""
    from schema_validator_spark.operators import skew

    li = _t(spark, sf_dir, "lineitem")
    return skew.salted_count_distinct(li, ["l_returnflag"], "l_partkey", n_salts=16)


def q_sketch_stats(spark, sf_dir):
    """Mergeable quantile sketch (mapInPandas + applyInPandas,
    operators/sketch.py); n/vmin/vmax are exact so the oracle checks them."""
    from schema_validator_spark.operators import sketch as S

    ev = _t(spark, sf_dir, "events")
    sk = S.sketch(ev, "value", ["event_type"], compression=64)
    return sk.select(
        "event_type", "n",
        F.round("vmin", 6).alias("vmin"), F.round("vmax", 6).alias("vmax"),
    )


def q_drift_psi_width(spark, sf_dir):
    """Fully-distributed PSI (equal-width buckets, zero driver compute) —
    the oracle-checked tier of the drift family (quantile-edge PSI is
    rows-only q_drift_psi)."""
    out = drift.psi_df(
        _t(spark, sf_dir, "events"), "value", "event_type",
        "click", "purchase", n_buckets=10,
    )
    return out.select("baseline", F.col("current").alias("curr"), "psi")


def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups (hash groupBy) on documents ∪ shifted copy."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    both = docs.unionByName(shifted)
    groups = dedup.exact_duplicates(both, "doc_id", "text")
    return groups.select(
        "content_sha256",
        "n_docs",
        F.element_at("doc_ids", 1).alias("min_doc_id"),
        F.element_at("doc_ids", -1).alias("max_doc_id"),
    )


def q_vocabulary(spark, sf_dir):
    """Corpus token-frequency table (top-200) — tokenizer-training input."""
    docs = _t(spark, sf_dir, "documents")
    return X.vocabulary(docs, "text", top_n=200)


def q_contamination(spark, sf_dir):
    """Train/eval n-gram contamination sweep: docs sharing 5-grams with
    the 'eval set' (docs 0-4) — benchmark-leakage detection."""
    from schema_validator_spark.operators import decontaminate as D

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") < 5)
    return D.ngram_contamination(docs, eval_df, k=5, min_shared=1)


def q_stratified_sample(spark, sf_dir):
    """Exact per-stratum quotas by deterministic md5 rank (training-data
    curation; operators/sampling.py)."""
    from schema_validator_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    return sampling.stratified_sample_exact(docs, ["lang"], "doc_id", 20) \
        .select("doc_id", "lang")


def q_dedup_pipeline(spark, sf_dir):
    """Full dedup pipeline: exact-dup pairs -> connected components ->
    keep one per cluster (lowest id) over documents ∪ shifted copy."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    both = docs.unionByName(shifted)
    groups = dedup.exact_duplicates(both, "doc_id", "text")
    pairs = groups.select(
        F.element_at("doc_ids", 1).alias("id_a"),
        F.explode(F.slice("doc_ids", 2, F.size("doc_ids") - 1)).alias("id_b"),
    )
    clusters = dedup.cluster_pairs(pairs)
    kept = dedup.dedup_keep_best(both, clusters)
    return kept.select("doc_id")


def q_jaccard_pairs(spark, sf_dir):
    """Token-set Jaccard near-dup pairs within the 'fr' block — BLOCKED
    plan: token-level MinHash banding (shingle_k=1, r=2 × 16 bands →
    P(miss) ≈ (1-j²)^16 < 1e-7 at j ≥ 0.8) generates candidates via
    equi-join, exact Jaccard verifies.  No nested-loop O(n²) stage;
    output equals the exact all-pairs set (DuckDB oracle)."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "fr")
        .filter(X.token_count(F.col("text")) > 0)
        .select("doc_id", "text")
    )
    return dedup.minhash_lsh_candidates(
        docs, "doc_id", "text",
        num_hashes=32, bands=16, shingle_k=1, jaccard_threshold=0.8,
    )


def q_setsim_exact(spark, sf_dir):
    """EXACT set-similarity self-join (PPJoin prefix filter) over the
    same 'fr' corpus as q_jaccard_pairs — no-false-negative tier above
    MinHash banding: prefixes hold each doc's RAREST tokens, so hot
    tokens structurally cannot form a degenerate bucket.  Output equals
    the exact all-pairs set (same oracle as jaccard_pairs)."""
    from schema_validator_spark.operators.setsim import setsim_join_exact

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "fr")
        .select("doc_id", "text")
    )
    return setsim_join_exact(docs, "doc_id", "text", threshold=0.8)


def q_ann_topk(spark, sf_dir):
    """Exact brute-force cosine top-k (ANN baseline); ids+rank only."""
    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.cosine_topk(queries, embs, k=5).select("query_id", "vec_id", "rank")


def q_text_profile(spark, sf_dir):
    """Token counting + fingerprinting over documents."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.fingerprint(F.col("text")).alias("fingerprint"),
        X.rolling_hash(F.col("text")).alias("rolling_hash"),
    )


def q_lang_id_counts(spark, sf_dir):
    """Language-ID heuristic vs labeled lang (confusion counts)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", X.lang_id(F.col("text")).alias("lid"))
        .groupBy("lang", "lid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_quality_scores(spark, sf_dir):
    """Quality scoring over documents (deterministic arithmetic)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.quality_score(F.col("text")).alias("quality")
    )


def q_violation_messages(spark, sf_dir):
    """i18n message rendering (translator.go:77-90) as a pure expression."""
    from schema_validator_spark.i18n import message_column

    res = _doc_engine().run(_t(spark, sf_dir, "documents"))
    return res.violations.select(
        "doc_id", "field", "code", message_column("en").alias("message")
    )


def q_multimodal_magic(spark, sf_dir):
    """Binary payload plumbing: magic-byte sniff vs declared format over
    the deterministic synthetic media table (mismatch stripe at
    media_id % 2 == 0 and % 17 == 3)."""
    from schema_validator_spark.operators import multimodal as M

    media = M.synthetic_media(spark, 2000)
    return media.filter(
        ~M.payload_ok(F.col("payload"), F.col("declared_format"))
    ).select("media_id", "declared_format")


def q_streaming_summary(spark, sf_dir):
    """Structured Streaming validation: the same compiled plan over a
    file stream, watermarked 1-hour windowed summary, drained with
    trigger=availableNow (deterministic — DuckDB oracle via time_bucket)."""
    from schema_validator_spark.streaming.validate import summary_stream

    eng = ValidationEngine(
        {"event_type": "oneof=click,view,signup,purchase", "value": "max=100"},
        partition_cols=["event_type"],
    )
    # file-stream source needs a directory basePath; the glob keeps the
    # source scoped to the events file inside it
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        f"{sf_dir}/events.parquet*"
    )
    s = summary_stream(eng, stream, event_time_col="ts",
                       window_duration="1 hour", watermark_delay="2 hours")
    q = (
        s.writeStream.format("memory").queryName("q_stream_summary")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table("q_stream_summary").select(
        F.col("window.start").alias("window_start"),
        "event_type", "n_rows", "n_rows_failed", "n_violations",
    )


def q_streaming_sessions(spark, sf_dir):
    """Streaming sessionization via Spark's NATIVE session_window (the
    declarative Structured Streaming path — watermarked state, no custom
    stateful UDF), drained with availableNow.  Exact-gap events merge
    (split only when gap is exceeded), so the DuckDB oracle is the same
    lag/flag/cumsum session derivation as the batch tier."""
    from schema_validator_spark.streaming.sessions import session_stats_stream

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        f"{sf_dir}/events.parquet*"
    )
    s = session_stats_stream(stream, "user_id", "ts", gap="30 minutes",
                             watermark_delay="2 hours")
    q = (
        s.writeStream.format("memory").queryName("q_stream_sessions")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table("q_stream_sessions").select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp"))
        .alias("session_start_us"),
        "n_events", "duration_us",
    )


def q_streaming_corpus_dedup(spark, sf_dir):
    """Stream-static LEFT ANTI dedup: a document stream filtered against
    a static corpus hash index (even docs), drained with availableNow —
    survivors are exactly the stream rows whose text no even doc has.
    The dedup authority is the static index, so the stream buffers no
    state; oracle derives survivors relationally from raw text."""
    from schema_validator_spark.streaming.validate import (
        dedup_stream_against_corpus,
    )

    corpus = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    ).select("doc_id", "text")
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(f"{sf_dir}/documents.parquet*").select("doc_id", "text")
    out = dedup_stream_against_corpus(stream, corpus, "text")
    q = (
        out.writeStream.format("memory").queryName("q_ss_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table("q_ss_dedup").select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("text_md5")
    )


def q_conditional_rules(spark, sf_dir):
    """Conditional/presence family over events (required_if + max)."""
    ev = _t(spark, sf_dir, "events")
    eng = ValidationEngine(
        {
            "value": "required_if=event_type,purchase|max=100",
            "event_type": "oneof=click,view,signup,purchase",
        },
        key_cols=["event_id"],
    )
    res = eng.run(ev)
    return (
        res.violations.groupBy("field", "code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_compare_polymorphism(spark, sf_dir):
    """min on a string column = byte-length ≥ (validators.go:117-127)."""
    cust = _t(spark, sf_dir, "customer")
    eng = ValidationEngine(
        {"c_name": "required|min=12", "c_acctbal": "gte=0"},
        key_cols=["c_custkey"],
    )
    res = eng.run(cust)
    return res.violations.groupBy("field", "code").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_cross_field(spark, sf_dir):
    """Cross-field rules, same-row column vs column (rule/field.go)."""
    li = _t(spark, sf_dir, "lineitem")
    eng = ValidationEngine(
        {"l_discount": "ltefield=l_tax"}, key_cols=["l_orderkey", "l_linenumber"]
    )
    return eng.run(li).violations.groupBy("field", "code").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_url_dedup(spark, sf_dir):
    """URL-level dedup via canonicalization: each page (doc_id % 97) is
    crawled through three messy variants — tracking params + different
    case, an explicit default port + fragment, a trailing host dot +
    reordered params.  All three must collapse to ONE canonical string;
    the oracle derives the expected groups from first principles, so
    over- OR under-merging canonicalization fails the gate."""
    from schema_validator_spark.functions import url as U2

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 97).alias("page"),
        (F.col("doc_id") % 3).alias("v"),
    )
    base = F.concat(F.lit("/art/"), F.col("page"))
    url = (
        F.when(F.col("v") == 0, F.concat(
            F.lit("https://news.example.com"), base,
            F.lit("?id="), F.col("page"), F.lit("&utm_source=x")))
        .when(F.col("v") == 1, F.concat(
            F.lit("HTTPS://News.EXAMPLE.com:443"), base,
            F.lit("?id="), F.col("page"), F.lit("#frag")))
        .otherwise(F.concat(
            F.lit("https://news.example.com."), base,
            F.lit("?utm_medium=m&id="), F.col("page")))
    )
    canon = docs.withColumn("canon_url", U2.canonicalize_url(url))
    return canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


def q_json_validation(spark, sf_dir):
    """Semi-structured validation: the events ``props`` column is a JSON
    string; ``from_json`` lifts it into a struct and the SAME rule
    engine validates the nested field via a dotted path (props.k —
    compiler.resolve_path), plus a format rule on the raw JSON text.
    This is the reference's struct-validation core applied to
    schema-on-read data; the oracle re-derives every violation with
    DuckDB's JSON functions."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "props_s", F.from_json(F.col("props"), "k int")
    )
    eng = ValidationEngine(
        {
            "props_s.k": "required|min=5|max=90",
            "props": "required|json",
        },
        key_cols=["event_id"],
    )
    return eng.run(ev).violations.groupBy("field", "code").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------- approximate tier, gated
# (LSH/ANN/PSI tiers; each deterministic with a DuckDB ground-truth oracle —
# see the matching oracle_sql() entries for the exact SQL re-derivation)


def q_minhash_lsh(spark, sf_dir):
    """Banded MinHash near-dup candidates + exact-Jaccard verify.  On the
    documents corpus every true pair sits at j ≥ 0.88, where the r=4 ×
    8-band S-curve miss probability is < 4e-4 per pair — and the xxhash64
    signatures are deterministic, so the output equals the exact
    all-pairs shingle-Jaccard set (the oracle) at the gate SFs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.5
    )


def q_simhash_candidates(spark, sf_dir):
    """SimHash near-dup pairs, portable (md5-bit) signature tier.
    Pigeonhole banding has NO false negatives and the hamming verify
    removes false positives, so the output is exactly the set of pairs
    at distance ≤ 3 — re-derived in full by the DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.simhash_candidates(
        docs, "doc_id", "text", max_hamming=3, portable=True
    )


def _augmented_embeddings(spark, sf_dir):
    """embeddings ∪ scaled copies (vec_id+1000000, 1.5·v): planted true
    neighbors at cosine exactly 1.0.  A positive scale preserves every
    SRP sign bit and the IVF list assignment, so LSH/IVF provably find
    the planted neighbor; the base corpus has no pair above cosine 0.52,
    so planted pairs are the complete ≥-threshold ground truth."""
    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = embs.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
    )
    return embs.unionByName(copies)


def q_srp_ann(spark, sf_dir):
    """SRP-LSH multi-probe top-k over the augmented corpus: each query's
    true top-2 (itself + its planted copy, cosine 1.0) share its bucket
    by construction, so the approximate result equals exact top-2."""
    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.srp_topk(queries, corpus, k=2, n_planes=6).select(
        "query_id", "vec_id", "rank"
    )


def q_ivf_ann(spark, sf_dir):
    """IVF (k-means lists + nprobe) top-k over the augmented corpus: the
    planted copy has the identical normalized vector, hence the identical
    list assignment — always inside the probe set."""
    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.ivf_topk(queries, corpus, k=2, nlist=16, nprobe=4).select(
        "query_id", "vec_id", "rank"
    )


def q_ivf_pq_ann(spark, sf_dir):
    """IVF-PQ (product-quantized) top-k over the augmented corpus — the
    memory tier: the probed index holds only m=8 bytes of code per
    vector; raw vectors are fetched by id ONLY for the 64-deep shortlist
    re-rank, whose EXACT cosines produce the final ranking.  The planted
    copy normalizes to the identical vector, hence identical list AND
    identical PQ code: its quantized (ADC) score ties the query's own
    maximal self-score, so both provably survive any shortlist ≥ 2 and
    the exact re-rank returns the true top-2 (= the oracle)."""
    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.ivf_pq_topk(
        queries, corpus, k=2, nlist=16, nprobe=4, m=8, shortlist=64
    ).select("query_id", "vec_id", "rank")


def q_embedding_neardups(spark, sf_dir):
    """Banded SRP-LSH near-dup pairs over the augmented corpus — every
    planted (v, 1.5·v) pair collides in all bands (identical signature)
    and verifies at cosine 1.0; the oracle recomputes the full exact
    all-pairs cosine ≥ 0.95 set."""
    return dedup.embedding_near_duplicates(
        _augmented_embeddings(spark, sf_dir), "vec_id", "embedding",
        cosine_threshold=0.95, n_planes=32, bands=4,
    )


def q_fuzzy_match(spark, sf_dir):
    """Cross-table record linkage: customer entities fuzzy-matched to
    supplier entities ∪ planted one-char-typo customer entities
    (char-3-gram MinHash blocking across tables, exact Jaccard verify at
    0.6).  Entity keys are name + a table-salted md5 tail — TPC-H's
    zero-heavy names alone are pathologically mutually similar (hundreds
    of thousands of true ≥0.6 pairs at sf0.1), which is realistic for
    names but wrong for an entity key; the high-entropy tail makes the
    planted typos the only true matches.  Oracle = the full exact
    cross-table Jaccard; banding margin asserted by a gate test."""
    from schema_validator_spark.operators import linkage as LK

    ckey = F.concat(
        F.col("c_name"), F.lit(" "),
        F.substring(F.md5(F.concat(F.lit("c"), F.col("c_custkey").cast("string"))), 1, 12),
    )
    skey = F.concat(
        F.col("s_name"), F.lit(" "),
        F.substring(F.md5(F.concat(F.lit("s"), F.col("s_suppkey").cast("string"))), 1, 12),
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", ckey.alias("entity")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", skey.alias("entity")
    )
    planted = cust.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 100000).alias("s_suppkey"),
        F.concat(
            F.substring(F.col("entity"), 1, F.length("entity") - 1), F.lit("x")
        ).alias("entity"),
    )
    right = supp.unionByName(planted)
    return LK.fuzzy_match(
        cust, right, "c_custkey", "s_suppkey", "entity", "entity",
        n=3, threshold=0.6, num_hashes=64, bands=16,
    )


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the embeddings corpus with
    planted duplicate GROUPS: a 1.5x-scaled copy for vec_id % 3 == 0
    (pairs) and an extra 0.75x copy for vec_id % 9 == 0 (triplets).
    Positive scaling preserves the normalized vector exactly, so every
    group member shares the k-means cluster and collides at cosine 1.0;
    the base corpus's max natural pair (~0.52, margin-gated in
    tests/test_entry_oracle.py) sits far below the 0.99 threshold, so
    the planted groups are the COMPLETE pair set and the oracle derives
    every keep/drop decision from first principles (survivor = min id)."""
    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    c1 = embs.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
    )
    c2 = embs.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.75).alias("embedding"),
    )
    corpus = embs.unionByName(c1).unionByName(c2)
    kept = dedup.semdedup(
        corpus, "vec_id", "embedding", cosine_threshold=0.99,
        nlist=32, iters=4,  # smaller cells halve the within-cluster
    )                       # pair count; copies co-cluster at ANY nlist
    return corpus.join(
        kept.select("vec_id", F.lit(1).alias("kept")), "vec_id", "left"
    ).select("vec_id", F.coalesce("kept", F.lit(0)).alias("kept"))


def q_gopher_quality(spark, sf_dir):
    """Gopher/MassiveText quality + repetition signals per document plus
    the combined keep decision — the standard pre-training quality gate,
    all metrics re-derived exactly by the DuckDB oracle."""
    from schema_validator_spark.functions import gopher as G

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = G.gopher_metrics(docs, "text")
    return out.select(
        "doc_id", "n_tokens", "mean_word_len", "symbol_ratio",
        "alpha_word_frac", "dup_line_frac", "dup_2gram_frac",
        "dup_3gram_frac", "stopword_hits",
        G.gopher_keep(min_tokens=10).cast("int").alias("keep"),
    )


def q_clean_docs(spark, sf_dir):
    """C4-style cleaning pass over synthesized multi-line docs (each doc
    gets planted junk: a too-short line, a boilerplate line, a PII line,
    and a duplicated line).  Audit counts + md5 of the cleaned text make
    the whole transform byte-checkable; all regexes are RE2-safe so the
    DuckDB oracle reproduces every edit exactly."""
    from schema_validator_spark.operators import clean as C

    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("short"),
            F.lit("Accept our Privacy Policy and cookie settings now"),
            F.lit("Contact admin@example.com at 192.168.0.1 id 12345678901234."),
            F.col("text"),
        ).alias("text"),
    )
    out = C.clean_documents(synth, "text")
    return out.select(
        "doc_id", "n_lines", "n_lines_kept",
        F.md5("text_clean").alias("clean_md5"),
    )


def _gc_stale_snapshot_dirs(max_age_sec: int = 6 * 3600) -> None:
    """Age-based GC for the pid-suffixed snapshot tables the entry queries
    create in tempdir: a process only drops its OWN tables (concurrent
    gate/bench runs must not race), so dirs from dead pids would otherwise
    accumulate forever.  Anything old enough that no live run can still be
    reading it gets swept."""
    import glob
    import os
    import shutil
    import tempfile
    import time as _time

    now = _time.time()
    for d in glob.glob(os.path.join(tempfile.gettempdir(), "svs_snapshot_*")) + \
            glob.glob(os.path.join(tempfile.gettempdir(), "svs_incr_*")) + \
            glob.glob(os.path.join(tempfile.gettempdir(), "svs_merge_*")) + \
            glob.glob(os.path.join(tempfile.gettempdir(), "svs_pruned_*")) + \
            glob.glob(os.path.join(tempfile.gettempdir(), "svs_anom_*")) + \
            glob.glob(os.path.join(tempfile.gettempdir(), "svs_ingest_*")):
        try:
            if now - os.path.getmtime(d) > max_age_sec:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            continue


def q_incremental_dedup(spark, sf_dir):
    """Incremental exact dedup across snapshot commits — ingest a new
    'crawl' without re-deduping the corpus: commit 1 = even documents;
    commit 2 appends odd docs + copies of every even doc (+10000,
    cross-commit dups) + second copies of odd docs (+20000, intra-delta
    dups).  Survivors = delta rows whose text is absent from commit 1
    and first (lowest id) within the delta; the oracle derives that
    relationally from raw text, so natural text collisions are handled
    identically on both sides."""
    import os
    import tempfile

    from schema_validator_spark.sources.snapshots import (
        SnapshotTable, dedup_appended,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    _gc_stale_snapshot_dirs()
    path = os.path.join(
        tempfile.gettempdir(),
        f"svs_incrdedup_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = SnapshotTable(path)
    t.drop()
    t = SnapshotTable(path)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    s1 = t.commit(even)
    delta = (
        odd
        .unionByName(even.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
        .unionByName(odd.select((F.col("doc_id") + 20000).alias("doc_id"), "text"))
    )
    t.commit(delta, mode="append")
    out = dedup_appended(spark, t, "text", s1)
    return out.select("doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("text_md5"))


def q_stats_pruned_scan(spark, sf_dir):
    """File-level data skipping over a snapshot table: events committed
    CLUSTERED on `value` (range-partitioned + sorted -> tight per-file
    min/max in the manifest, read from parquet footers), then a range
    scan that opens ONLY the files whose stats intersect [50, 100].
    Pruning is pinned in tests (candidate_files < total); here the
    oracle checks the scan is row-identical to a plain filter."""
    import os
    import tempfile

    from schema_validator_spark.sources.snapshots import SnapshotTable

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    _gc_stale_snapshot_dirs()
    path = os.path.join(
        tempfile.gettempdir(),
        f"svs_pruned_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = SnapshotTable(path)
    t.drop()
    t = SnapshotTable(path)
    t.commit_clustered(ev, ["value"], 8)
    pruned = t.read_range(spark, "value", 50.0, 100.0)
    assert len(t.candidate_files("value", 50.0, 100.0)) < 8
    return (
        pruned.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def q_pii_scan(spark, sf_dir):
    """PII governance scan: which documents columns hold emails / IPs /
    SSN-shaped / long-digit spans, how many rows and spans — the
    discovery pass that decides what clean.redact_pii must touch.
    ONE codegen aggregation pass; patterns shared with the redactor
    (single source of truth).  Oracle replays every (column, pattern)
    count with the same regexes."""
    from schema_validator_spark.operators.pii import pii_scan

    docs = _t(spark, sf_dir, "documents")
    return pii_scan(docs, ["text", "lang", "source"])


def q_ingest_quarantine(spark, sf_dir):
    """Malformed-record quarantine on JSONL ingest: documents rows are
    serialized to JSON lines with every doc_id % 10 == 3 line truncated
    mid-string (a torn write), round-tripped through the PERMISSIVE
    reader, split, and audited.  The md5 of the sorted quarantined raw
    lines proves the dead letters are byte-exact; the oracle derives
    everything from documents relationally (it never reads the file)."""
    import os
    import tempfile

    from schema_validator_spark.sources.ingest import (
        ingest_report, read_jsonl_quarantined, split_quarantine,
    )

    _gc_stale_snapshot_dirs()
    path = os.path.join(
        tempfile.gettempdir(),
        f"svs_ingest_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    docs = _t(spark, sf_dir, "documents")
    good_line = F.concat(
        F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
        F.lit(', "lang": "'), F.col("lang"), F.lit('"}'),
    )
    torn_line = F.concat(
        F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
        F.lit(', "lang": "'), F.col("lang"),
    )
    docs.select(
        F.when(F.col("doc_id") % 10 == 3, torn_line)
        .otherwise(good_line)
        .alias("value")
    ).write.mode("overwrite").text(path)

    df = read_jsonl_quarantined(spark, path, "doc_id long, lang string")
    rep = ingest_report(df)
    good, bad = split_quarantine(df)
    md5df = bad.agg(
        F.md5(F.concat_ws("\n", F.array_sort(F.collect_list("raw"))))
        .alias("corrupt_md5")
    )
    sumdf = good.agg(F.sum("doc_id").alias("good_docid_sum"))
    return rep.crossJoin(md5df).crossJoin(sumdf)


def q_reconcile(spark, sf_dir):
    """Control-total reconciliation of per-order quantity sums between
    lineitem and a perturbed rebuild (first line dropped for every 13th
    order, quantities doubled for every 17th): only the planted
    discrepancies surface, balanced keys stay silent."""
    from schema_validator_spark.operators.diff import reconcile_aggregates

    li = _t(spark, sf_dir, "lineitem")
    right = li.filter(
        ~((F.col("l_orderkey") % 13 == 0) & (F.col("l_linenumber") == 1))
    ).select(
        "l_orderkey",
        F.when(
            F.col("l_orderkey") % 17 == 0, F.col("l_quantity") * 2
        ).otherwise(F.col("l_quantity")).alias("l_quantity"),
    )
    out = reconcile_aggregates(
        li, right, ["l_orderkey"],
        left_measure="l_quantity", right_measure="l_quantity",
    )
    # coalesce the compared outputs: `kind` already encodes absence, and
    # NULL-bearing numeric columns decay to float64 in the pandas compare
    sl = F.coalesce(F.col("sum_left"), F.lit(0)).alias("sum_left")
    sr = F.coalesce(F.col("sum_right"), F.lit(0)).alias("sum_right")
    return out.select(
        "l_orderkey", sl, sr,
        F.round(
            F.coalesce(F.col("sum_right"), F.lit(0))
            - F.coalesce(F.col("sum_left"), F.lit(0)), 6
        ).alias("diff"),
        "kind",
    )


def q_segment_completeness(spark, sf_dir):
    """Per-event-type completeness of user_id/value/ts — the
    where-scoped Completeness view that catches a field broken in one
    segment while the global null rate looks healthy; ONE groupBy, all
    null counts in the same pass."""
    from schema_validator_spark.operators.profile import completeness_by_group

    return completeness_by_group(
        _t(spark, sf_dir, "events"), ["event_type"], ["user_id", "value", "ts"]
    )


def q_cusum_shift(spark, sf_dir):
    """CUSUM level-shift detection over daily event volumes with a
    planted sustained ~50% drop after day 22 (only even users kept —
    late enough that the median/MAD baseline stays anchored on the
    normal level instead of straddling the two regimes):
    the reset-at-zero recursion as prefix-sum minus running-min
    windows; point-band checks never see this, CUSUM accumulates it."""
    from schema_validator_spark.operators.freshness import cusum_changepoints

    ev = _t(spark, sf_dir, "events").filter(
        (F.dayofmonth(F.col("ts").cast("date")) <= 22)
        | (F.col("user_id") % 2 == 0)
    )
    out = cusum_changepoints(ev, "ts", grain="day")
    return out.select(
        F.unix_micros(F.col("bucket")).alias("day_us"),
        "n_rows", "cusum_up", "cusum_down", "alarm",
    )


def q_category_coverage(spark, sf_dir):
    """Top-20 users by event volume with cumulative share — the
    concentration view behind skew mitigation; deterministic tie-break
    so the boundary rank is engine-stable."""
    from schema_validator_spark.operators.profile import category_coverage

    return category_coverage(_t(spark, sf_dir, "events"), "user_id", k=20)


def q_join_profile(spark, sf_dir):
    """Join-health audit of lineitem x (2/3 of orders): coverage, key
    multiplicity, and the EXACT would-be join output size — computed
    from two word-count aggs without joining data rows."""
    from schema_validator_spark.operators.diff import join_profile

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 != 1)
    return join_profile(li, orders, ["l_orderkey"], ["o_orderkey"])


def q_table_diff(spark, sf_dir):
    """Row-level diff between documents and a rebuilt version (every
    11th row dropped, every 7th lang rewritten, 5 rows added): one
    keyed full-outer join, change-volume-sized output with per-column
    change attribution."""
    from schema_validator_spark.operators.diff import table_diff

    old = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = _t(spark, sf_dir, "documents")
    new = base.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit("zz"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "n_chars",
    ).unionByName(
        base.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            F.lit("new").alias("lang"),
            "n_chars",
        )
    )
    out = table_diff(old, new, ["doc_id"])
    return out.select(
        "doc_id", "status",
        F.array_join(F.col("changed_cols"), ",").alias("changed"),
    )


def q_fd_discovery(spark, sf_dir):
    """FD discovery over derived documents columns (lang <-> upper(lang)
    is the planted bijection; source and doc_id%7 are independent):
    approximate candidates in ONE sketch pass, exact verify per
    candidate.  Only the exact outputs (determinant, dependent, holds)
    are compared — the HLL counts are engine-specific by design."""
    from schema_validator_spark.operators.uniqueness import discover_fds

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.upper(F.col("lang")).alias("up"),
        "source",
        (F.col("doc_id") % 7).alias("bucket"),
    )
    out = discover_fds(docs, ["lang", "up", "source", "bucket"])
    return out.select("determinant", "dependent", "holds")


def q_volume_anomaly(spark, sf_dir):
    """Robust per-day volume check over events with a planted 90% load
    drop on every day-of-month % 7 == 2 (only user_id % 10 == 0 kept):
    median/MAD band over the freshness grid flags the starved days."""
    from schema_validator_spark.operators.freshness import volume_anomalies

    ev = _t(spark, sf_dir, "events").filter(
        ((F.dayofmonth(F.col("ts").cast("date")) % 7) != 2)
        | (F.col("user_id") % 10 == 0)
    )
    out = volume_anomalies(ev, "ts", grain="day", n_mads=3.0)
    return out.select(
        F.unix_micros(F.col("bucket")).alias("day_us"),
        "n_rows", "deviation", "anomalous",
    )


def q_column_entropy(spark, sf_dir):
    """Deequ information analyzers (Entropy / Distinctness /
    UniqueValueRatio) over three orders columns in ONE unpivoted pass;
    entropy via the map-side-combinable ln(N) - sum(c ln c)/N form the
    oracle replays exactly."""
    from schema_validator_spark.operators.profile import column_entropy

    return column_entropy(
        _t(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority", "o_orderdate"],
    )


def q_semantic_types(spark, sf_dir):
    """Semantic-type detection over typed columns derived from
    documents (md5 hash, integer string, language tag, source label):
    ONE codegen aggregation pass over every (column x detector) pair;
    the oracle replays each count with the same regexes (shared with
    rules/formats.py — single source of truth)."""
    from schema_validator_spark.operators.semantic import detect_semantic_types

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.md5(F.coalesce("text", F.lit(""))).alias("hash"),
        F.col("n_chars").cast("string").alias("num"),
    )
    return detect_semantic_types(docs, ["lang", "source", "hash", "num"])


def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over customer quasi-identifiers
    (nation, market segment): re-identification risk summary in one
    map-side-combinable groupBy — the governance sibling of pii_scan."""
    from schema_validator_spark.operators.privacy import k_anonymity_report

    return k_anonymity_report(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=5
    )


def q_embedding_drift(spark, sf_dir):
    """Embedding-space drift between the even-id half and the odd-id
    half shifted by +0.1 per dimension (a planted encoder change):
    centroid cosine/shift + mean norms, all distributed — shuffle
    volume is #tasks x dims, never rows x dims."""
    from schema_validator_spark.operators.embdrift import embedding_drift

    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base = embs.filter(F.col("vec_id") % 2 == 0)
    cur = embs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", F.transform(F.col("v"), lambda x: x + F.lit(0.1)).alias("v")
    )
    return embedding_drift(base, cur, "v")


def q_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample (k=100, weight = n_chars —
    'prefer longer docs') through the two-level global top-k plan; the
    6dp-rounded key + md5 tie-break make the exact row set replayable
    in any engine."""
    from schema_validator_spark.operators.sampling import sample_weighted

    docs = _t(spark, sf_dir, "documents")
    out = sample_weighted(docs, "doc_id", "n_chars", 100)
    return out.select("doc_id", "n_chars")


def q_category_churn(spark, sf_dir):
    """Enum-membership drift between two halves of documents with
    planted churn ('de' absent from base, 'fr' absent from cur): new /
    gone / common categories with both counts, one data shuffle."""
    from schema_validator_spark.operators.drift import category_churn_df

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("lang") != "de"))
    cur = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("lang") != "fr"))
    return category_churn_df(base, cur, "lang")


def q_freshness(spark, sf_dir):
    """Partition completeness grid over events with planted holes
    (every day-of-month % 7 == 3 dropped): one bucketed count at row
    scale, then a calendar-scale grid join; missing days surface as
    explicit zero rows a row-level rule could never produce."""
    from schema_validator_spark.operators.freshness import partition_freshness

    ev = _t(spark, sf_dir, "events").filter(
        (F.dayofmonth(F.col("ts").cast("date")) % 7) != 3
    )
    out = partition_freshness(ev, "ts", grain="day")
    return out.select(
        F.unix_micros(F.col("bucket")).alias("day_us"), "n_rows", "is_missing"
    )


def q_sequence_gaps(spark, sf_dir):
    """Per-order line-number sequence integrity with planted holes
    (drop linenumber 2 of every 5th order): holes surface as 'gap' rows
    with the missing count — one window pass, no self-join."""
    from schema_validator_spark.operators.sequence import sequence_gaps

    li = _t(spark, sf_dir, "lineitem").filter(
        ~((F.col("l_orderkey") % 5 == 0) & (F.col("l_linenumber") == 2))
    )
    return sequence_gaps(li, ["l_orderkey"], "l_linenumber")


def q_interval_overlaps(spark, sf_dir):
    """SCD2 'one valid record at a time' check over synthetic validity
    intervals derived from events (pure integer arithmetic so the
    oracle replays it): running-max-of-previous-ends window catches
    containment chains a neighbor-only check misses."""
    from schema_validator_spark.operators.sequence import interval_overlaps

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("user_id").alias("k"),
        (F.col("event_id") % 1000).alias("s"),
        (
            (F.col("event_id") % 1000)
            + 1
            + F.floor(F.abs(F.col("value")))
        ).alias("e"),
    ).filter(
        F.col("k").isNotNull() & F.col("s").isNotNull() & F.col("e").isNotNull()
    )
    return interval_overlaps(iv, ["k"], "s", "e")


def q_monotonic(spark, sf_dir):
    """Counter-integrity check: extended price along the line-number
    order within every 20th order — decreases are violations."""
    from schema_validator_spark.operators.sequence import monotonic_violations

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return monotonic_violations(
        li, ["l_orderkey"], "l_linenumber", "l_extendedprice"
    )


def q_benford(spark, sf_dir):
    """Benford first-digit conformity report over extended prices —
    audit-grade fabricated-data check; arithmetic digit extraction so
    the oracle replays it without string formatting."""
    from schema_validator_spark.operators.profile import benford_report

    return benford_report(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


def q_emd_drift(spark, sf_dir):
    """Exact 1-D Wasserstein-1 between click and purchase value
    distributions — the transport-cost drift tier beside PSI and KS
    (same distributed prefix-sum CDF, plus successor gap terms)."""
    from schema_validator_spark.operators import drift

    ev = _t(spark, sf_dir, "events")
    return drift.emd_2sample_df(ev, "value", "event_type", "click", "purchase")


def q_correlation_matrix(spark, sf_dir):
    """Pairwise Pearson correlations over lineitem's numeric measures —
    all 6 pairs in ONE mergeable-moment aggregation pass (Deequ
    Correlation analyzer); oracle replays the covar/stddev form."""
    from schema_validator_spark.operators.correlate import correlation_matrix

    return correlation_matrix(_t(spark, sf_dir, "lineitem"), _CORR_COLS)


def q_mutual_info(spark, sf_dir):
    """Mutual information between orders' status and priority (Deequ
    MutualInformation): one groupBy on the pair, marginals as windows
    over the tiny joint frame; identical float op order in the
    oracle."""
    from schema_validator_spark.operators.correlate import mutual_information

    return mutual_information(
        _t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction over documents wrapped in synthetic
    markup (title/script/style/comment blocks, paragraph tags, an
    anchor): title + link count + md5 of the extracted text make the
    whole regex pipeline byte-checkable; the oracle rebuilds its
    regexp_replace chain from html.pipeline_spec() — single source of
    truth."""
    from schema_validator_spark.functions import html as H

    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><script>var t='</p>';</script></head><body><h1>"),
            F.col("source"),
            F.lit("</h1><p>"),
            F.replace(F.col("text"), F.lit("\n"), F.lit("</p><p>")),
            F.lit('</p><a href="https://ex.org/'),
            F.col("doc_id").cast("string"),
            F.lit('">l</a><!-- c --></body></html>'),
        ).alias("h"),
    )
    return synth.select(
        "doc_id",
        H.html_title(F.col("h")).alias("title"),
        H.html_link_count(F.col("h")).alias("n_links"),
        F.md5(H.html_to_text(F.col("h"))).alias("text_md5"),
    )


def q_pagerank(spark, sf_dir):
    """Domain-ranking PageRank (the web-curation frontier score) over a
    deterministic 60-node link graph derived from documents
    (src = doc_id mod 60, dst = (doc_id div 7) mod 60): 5 iterations,
    damping 0.85, dangling mass redistributed, ranks rounded 6dp at
    every iteration boundary so the recurrence is engine-reproducible.
    The oracle unrolls the same 5 iterations relationally."""
    from schema_validator_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 60).alias("src"),
        F.expr("(doc_id div 7) % 60").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return pagerank(edges, iterations=5).select("node", "rank")


def q_metric_anomaly(spark, sf_dir):
    """Deequ-style anomaly detection over a snapshot table's metric
    history: four cumulative commits (click / +view / +purchase /
    +signup), per-commit row count and null fraction, then
    relative-rate-of-change flagging (threshold 0.5) — the "did this
    commit move a quality metric suspiciously" check.  First points
    carry sentinel -1 (no baseline).  Oracle replays every commit's
    metrics and the window arithmetic relationally."""
    import os
    import tempfile

    from schema_validator_spark.operators.anomaly import (
        detect_anomalies, metric_history,
    )
    from schema_validator_spark.sources.snapshots import SnapshotTable

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    _gc_stale_snapshot_dirs()
    path = os.path.join(
        tempfile.gettempdir(),
        f"svs_anom_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = SnapshotTable(path)
    t.drop()
    t = SnapshotTable(path)
    for et in ["click", "view", "purchase", "signup"]:
        t.commit(ev.filter(F.col("event_type") == et))
    hist = metric_history(
        spark, t,
        {"n_rows": F.count(F.lit(1)),
         "null_frac": F.avg(F.col("value").isNull().cast("int"))},
    )
    out = detect_anomalies(hist, max_rel_change=0.5)
    return out.select(
        "snapshot_id", "metric", "value",
        F.coalesce(F.col("prev"), F.lit(-1.0)).alias("prev"),
        F.coalesce(F.col("rel_change"), F.lit(-1.0)).alias("rel_change"),
        "anomalous",
    )


def q_suggest_constraints(spark, sf_dir):
    """Deequ-style constraint suggestion: profile `customer` in two
    bounded passes (one stats agg; enum values fetched ONLY for
    proven-low-cardinality strings) and emit the spec the table already
    satisfies — required (zero-value semantics), unique, oneof, min/max
    (value bounds for numerics, octet-length bounds for strings),
    omitempty where empties are accepted.  The suggested spec compiles
    into the engine and re-validates the table clean (pinned in tests);
    the oracle re-derives every suggestion from first principles."""
    from schema_validator_spark.operators.suggest import suggestions_df

    cust = _t(spark, sf_dir, "customer")
    out = suggestions_df(cust)
    # numeric bounds as 6dp-scaled-integer STRINGS (nullable bigints turn
    # into float/NaN in the oracle harness's pandas frame; scaled-long
    # text is the established cross-engine-stable form)
    return out.select(
        "column",
        "rule",
        F.when(
            F.col("num_param").isNotNull(),
            F.round(F.col("num_param") * 1e6).cast("long").cast("string"),
        ).otherwise(F.col("param")).alias("param"),
    )


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over two event dimensions —
    the multi-dimensional write layout for file skipping (cluster on z,
    keep stats on x and y; pruning on BOTH dims pinned in tests).  Pure
    bit-interleave codegen; the oracle replays the identical shifts."""
    from schema_validator_spark.functions.zorder import zorder_key

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 32).cast("int").alias("x"),
        F.least(F.floor(F.col("value") / 16.0), F.lit(31)).cast("int").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    return ev.withColumn("z", zorder_key(["x", "y"], bits=5)).select(
        "event_id", "x", "y", "z"
    )


def q_snapshot_drift(spark, sf_dir):
    """Drift ACROSS COMMITS over a snapshot-pinned table (the Iceberg
    semantics of the north rule, manifest-based stand-in — no Iceberg
    runtime jars in this container): commit 1 = click events, commit 2
    appends purchase events; PSI between the two pinned snapshots.  The
    oracle recomputes both snapshot file sets relationally."""
    import os
    import tempfile

    from schema_validator_spark.sources.snapshots import (
        SnapshotTable, drift_across_commits,
    )

    ev = _t(spark, sf_dir, "events")
    # pid suffix: concurrent processes (gate mimic + bench) must not
    # drop() the snapshot table out from under each other's pinned reads
    _gc_stale_snapshot_dirs()
    path = os.path.join(
        tempfile.gettempdir(),
        f"svs_snapshot_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = SnapshotTable(path)
    t.drop()
    t = SnapshotTable(path)
    s1 = t.commit(ev.filter(F.col("event_type") == "click").select("value"))
    s2 = t.commit(
        ev.filter(F.col("event_type") == "purchase").select("value"),
        mode="append",
    )
    out = drift_across_commits(spark, t, "value", s1, s2)
    return out.select("baseline", F.col("current").alias("curr"), "psi")


def q_psi_report(spark, sf_dir):
    """Drift of EVERY event_type against the 'click' baseline in one
    plan (distributed drift_report): exact 6dp decile edges, complete
    group×bucket grid, per-group PSI aggregate."""
    ev = _t(spark, sf_dir, "events")
    out = drift.psi_report_df(ev, "value", "event_type", "click")
    return out.select(F.col("current").alias("curr"), "psi")


def q_schema_evolution(spark, sf_dir):
    """Schema-evolution diff across a simulated commit (drop a column,
    change a type, add a column) — the metadata-level drift check.  The
    oracle re-derives BOTH schemas relationally via DuckDB DESCRIBE, so
    this checks real schema introspection, not a hardcoded expectation."""
    from schema_validator_spark.operators.schema_diff import schema_diff

    docs = _t(spark, sf_dir, "documents")
    evolved = (
        docs.drop("source")
        .withColumn("n_chars", F.col("n_chars").cast("string"))
        .withColumn("quality", F.lit(0.5))
    )
    return schema_diff(spark, docs, evolved)


def q_sessions(spark, sf_dir):
    """Gap-based sessionization of the events stream (30-min silence
    splits a session): per-session event counts and durations, ties
    broken by event_id — deterministic window algebra re-derived exactly
    by the oracle."""
    from schema_validator_spark.operators import sessions as SS

    ev = _t(spark, sf_dir, "events")
    return SS.session_stats(ev, "user_id", "ts", id_col="event_id",
                            gap_seconds=1800)


def q_fd_check(spark, sf_dir):
    """Functional-dependency check o_custkey -> o_orderpriority:
    customers whose orders span more than one priority class (a 1:N
    mapping where a 1:1 was expected is the classic FD data-quality
    violation)."""
    orders = _t(spark, sf_dir, "orders")
    return uniqueness.functional_dependency_violations(
        orders, ["o_custkey"], ["o_orderpriority"]
    )


def q_curation(spark, sf_dir):
    """END-TO-END curation funnel, oracle-checked: validate (required +
    lang oneof) -> quality gate (>= 0.3) -> exact(fingerprint) +
    near-dup(MinHash >= 0.5) edges -> connected components -> keep the
    highest-quality doc per component.  The DuckDB oracle replays every
    stage, including the components via a recursive-CTE transitive
    closure over the EXACT pair set (the blocked MinHash plan equals it
    because every true pair sits at j >= 0.88 on this corpus — the
    minhash_lsh banding-margin gate asserts that at each SF)."""
    from schema_validator_spark.operators.curate import curate

    docs = _t(spark, sf_dir, "documents")
    out = curate(
        docs,
        spec={"text": "required", "lang": "required|oneof=en,es,de,fr"},
        min_quality=0.3,
        near_dup_threshold=0.5,
    )
    return out.select("doc_id")


def q_bpe_pairs(spark, sf_dir):
    """First BPE merge-step statistic: corpus-weighted adjacent-character
    pair counts (vocabulary first, so each distinct word's characters are
    scanned once regardless of frequency)."""
    docs = _t(spark, sf_dir, "documents")
    return X.bpe_pair_counts(docs, "text", top_n=100)


# Training-order-consistent merge table for q_bpe_token_counts (every
# multi-char operand is a prior merge's output; validated at call time).
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "r"), ("a", "t"), ("e", "n"), ("o", "r"), ("an", "d"),
    ("in", "g"), ("e", "s"), ("t", "o"), ("o", "u"), ("ou", "r"),
]


def _bpe_oracle_seg_sql(word_expr: str) -> str:
    """DuckDB replay of functions.text.bpe_segment: delimited-symbol
    string (chr(30)-wrapped chars) then one replace() pass per merge in
    rank order — byte-identical semantics to the Spark expression."""
    s = "chr(30)"
    out = (f"regexp_replace(replace({word_expr}, chr(30), ''), "
           f"'(.)', {s} || '\\1' || {s}, 'g')")
    for a, b in _BPE_MERGES:
        out = (f"replace({out}, {s}||'{a}'||{s}||{s}||'{b}'||{s}, "
               f"{s}||'{a}{b}'||{s})")
    return out


def q_tfidf_keywords(spark, sf_dir):
    """Per-document top-3 tf·idf keywords (corpus-aware salience):
    ranking key rounded 6dp so mathematically-equal score coincidences
    computed via different ln() sequences cannot reorder the top-k
    across engines; ties break on token.  Oracle replays tf, df, idf,
    rounding, and ranking."""
    docs = _t(spark, sf_dir, "documents")
    return X.tfidf_keywords(docs, "doc_id", "text", top_k=3)


def q_bpe_token_counts(spark, sf_dir):
    """Tokenizer APPLICATION: exact per-document BPE token counts under a
    learned merge table (rank-ordered replace passes over the
    distinct-word vocabulary, joined back weighted by word frequency).
    The DuckDB oracle replays every merge pass byte-identically."""
    docs = _t(spark, sf_dir, "documents")
    return X.bpe_token_counts(docs, "doc_id", "text", _BPE_MERGES)


def q_tokenizer_fertility(spark, sf_dir):
    """Per-lang tokenizer-efficiency profile
    (functions/text.tokenizer_fertility): fertility = BPE tokens per
    whitespace word under the shared merge table, plus bytes/chars per
    token — the mixture-budget signal.  Runs on the REAL documents
    (lang, text) columns, no synthesis; the oracle replays the merge
    passes byte-identically via _bpe_oracle_seg_sql."""
    docs = _t(spark, sf_dir, "documents")
    return X.tokenizer_fertility(docs, "lang", "text", _BPE_MERGES)


def q_classifier_scores(spark, sf_dir):
    """fastText-style linear quality classifier (hashed unigram+bigram
    features, md5-derived deterministic weights, sigmoid of the mean):
    one per-row codegen expression, zero shuffle/Python.  Scores compared
    as 6dp-scaled longs (libm-drift-proof, per round-2 ADVICE)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_toks", X.tokens(F.coalesce(F.col("text"), F.lit("")))
    )
    feats = QC.hashed_features(F.col("_toks"), pre_tokenized=True)
    return docs.select(
        "doc_id",
        F.size(feats).alias("n_feats"),
        F.round(
            QC.classifier_score(F.col("_toks"), pre_tokenized=True) * 1e6
        ).cast("long").alias("score_e6"),
    )


def q_classifier_calibration(spark, sf_dir):
    """Reliability bins for the quality classifier
    (operators/calibration.calibration_report — the Guo et al. 2017
    diagram the FineWeb-style threshold choice needs): equal-width
    score bins x (n, mean predicted score, observed positive rate,
    gap).  Labels are a PLANTED integer-hash stripe independent of the
    score — positive probability (doc_id % 11)/10 via md5 residue vs
    an integer threshold, no float boundary anywhere in the label — so
    the report deterministically exhibits real miscalibration numbers
    the oracle replays cell-for-cell.  The raw logit concentrates
    within ~0.02 of zero (mean of ~200 uniform weights), which would
    populate only the two middle bins; it is sharpened with
    temperature T=0.02 (score = sigmoid(logit/T)) — the exact
    scaling knob Guo et al. study — so the score distribution spans
    the bin range and the diagram is non-degenerate.  ONE
    map-side-combinable groupBy on the bin id (≤ 11 groups at any
    corpus size); doubles compare as 6dp-scaled longs per the
    contract convention."""
    from schema_validator_spark.operators.calibration import (
        calibration_report,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "_toks", X.tokens(F.coalesce(F.col("text"), F.lit("")))
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("cal-v1"))), 1, 8),
        16, 10,
    ).cast("long")
    z = QC.classifier_logit(F.col("_toks"), pre_tokenized=True)
    scored = docs.select(
        F.col("doc_id"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z * 50.0))).alias("score"),
        ((u % 1000) < (F.col("doc_id") % 11) * 100).alias("label"),
    )
    rep = calibration_report(scored, "score", "label", n_bins=10)
    return rep.select(
        "bin",
        "n",
        F.round(F.col("mean_score") * 1e6).cast("long")
        .alias("mean_score_e6"),
        F.round(F.col("pos_rate") * 1e6).cast("long")
        .alias("pos_rate_e6"),
        F.round(F.col("gap") * 1e6).cast("long").alias("gap_e6"),
    )


def q_threshold_sweep(spark, sf_dir):
    """Per-cutoff curation outcomes for the quality classifier
    (operators/calibration.threshold_sweep — the companion of the
    reliability report: which t hits the target precision/yield):
    (threshold, n_kept, tp, fp, fn, precision, recall, f1) per
    candidate against the same planted integer-hash label stripe as
    classifier_calibration, same temperature-sharpened score.  ONE
    map-side-combined pass (|T| x 4 conditional aggregates) + a
    constant-size stack unpivot — zero row multiplication.  NULL
    ratios (zero denominators) map to the -1 sentinel on BOTH sides
    (nullable-bigint pandas-bridge convention)."""
    from schema_validator_spark.operators.calibration import (
        threshold_sweep,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "_toks", X.tokens(F.coalesce(F.col("text"), F.lit("")))
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("cal-v1"))), 1, 8),
        16, 10,
    ).cast("long")
    z = QC.classifier_logit(F.col("_toks"), pre_tokenized=True)
    scored = docs.select(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z * 50.0))).alias("score"),
        ((u % 1000) < (F.col("doc_id") % 11) * 100).alias("label"),
    )
    sw = threshold_sweep(
        scored, "score", "label", thresholds=[0.1, 0.3, 0.5, 0.7, 0.9]
    )
    e6 = lambda c: F.coalesce(  # noqa: E731
        F.round(F.col(c) * 1e6).cast("long"), F.lit(-1)
    )
    return sw.select(
        F.round(F.col("threshold") * 1e6).cast("long")
        .alias("threshold_e6"),
        "n_kept", "tp", "fp", "fn",
        e6("precision").alias("precision_e6"),
        e6("recall").alias("recall_e6"),
        e6("f1").alias("f1_e6"),
    )


_THRESHOLD_SWEEP_ORACLE_SQL = r"""
    with base as (
      select doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                         t -> t <> '') as w
      from documents
    ), f as (
      select doc_id,
             list_concat(w,
               case when len(w) >= 2
                    then list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i+1])
                    else [] end) as feats
      from base
    ), scored as (
      select doc_id,
             1.0 / (1.0 + exp(-50.0 * (
               coalesce(list_sum(list_transform(feats,
                 t -> (('0x' || substr(md5(t || 'qc-v1'), 1, 8))::bigint
                       ::double / 4294967296.0) - 0.5)), 0.0)
               / greatest(len(feats), 1)))) as score,
             (('0x' || substr(md5(doc_id::varchar || 'cal-v1'), 1, 8))::bigint
              % 1000) < (doc_id % 11) * 100 as label
      from f
    ), counts as (
      select th,
             sum(case when score >= th then 1 else 0 end) as n_kept,
             sum(case when score >= th and label then 1 else 0 end) as tp,
             sum(case when score >= th and not label then 1 else 0 end) as fp,
             sum(case when score < th and label then 1 else 0 end) as fn
      from scored cross join unnest([0.1, 0.3, 0.5, 0.7, 0.9]) t(th)
      group by th
    ), ratios as (
      select th, n_kept, tp, fp, fn,
             case when tp + fp > 0
                  then round(tp / (tp + fp)::double, 6) end as p,
             case when tp + fn > 0
                  then round(tp / (tp + fn)::double, 6) end as r
      from counts
    )
    select cast(round(th * 1e6) as bigint) as threshold_e6,
           cast(n_kept as bigint) as n_kept,
           cast(tp as bigint) as tp, cast(fp as bigint) as fp,
           cast(fn as bigint) as fn,
           coalesce(cast(round(p * 1e6) as bigint), -1) as precision_e6,
           coalesce(cast(round(r * 1e6) as bigint), -1) as recall_e6,
           coalesce(cast(round(case when p is not null and r is not null
                                     and p + r > 0
                                then round(2 * p * r / (p + r), 6) end
                          * 1e6) as bigint), -1) as f1_e6
    from ratios
"""


_CLASSIFIER_CALIBRATION_ORACLE_SQL = r"""
    with base as (
      select doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                         t -> t <> '') as w
      from documents
    ), f as (
      select doc_id,
             list_concat(w,
               case when len(w) >= 2
                    then list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i+1])
                    else [] end) as feats
      from base
    ), scored as (
      select doc_id,
             1.0 / (1.0 + exp(-50.0 * (
               coalesce(list_sum(list_transform(feats,
                 t -> (('0x' || substr(md5(t || 'qc-v1'), 1, 8))::bigint
                       ::double / 4294967296.0) - 0.5)), 0.0)
               / greatest(len(feats), 1)))) as score,
             (('0x' || substr(md5(doc_id::varchar || 'cal-v1'), 1, 8))::bigint
              % 1000) < (doc_id % 11) * 100 as label
      from f
    )
    select cast(least(floor(score * 10), 9) as int) as bin,
           count(*) as n,
           cast(round(round(avg(score), 6) * 1e6) as bigint)
             as mean_score_e6,
           cast(round(round(avg(case when label then 1.0 else 0.0 end), 6)
                      * 1e6) as bigint) as pos_rate_e6,
           cast(round((round(avg(case when label then 1.0 else 0.0 end), 6)
                       - round(avg(score), 6)) * 1e6) as bigint) as gap_e6
    from scored
    group by 1
"""


# Deterministic URL synthesis for q_url_filter: host pool exercises every
# registered-domain branch (multi-label suffix, bare suffix, unknown TLD).
_URL_SUFFIXES = ["com", "org", "net", "io", "uk", "co.uk", "ac.uk", "jp", "co.jp"]
_URL_HOSTS = [
    "www.example.com", "ads.tracker.co.uk", "good.site.org",
    "blog.example.co.jp", "cdn.tracker.co.uk", "weird.hostlocal",
    "co.uk", "sub.deep.example.ac.uk",
]
_URL_BLOCKLIST = ["example.com", "tracker.co.uk"]


def q_url_filter(spark, sf_dir):
    """Domain-blocklist curation: registered-domain extraction
    (public-suffix longest match, pure codegen InSet probes) plus the
    broadcast left_anti blocklist filter — ads.tracker.co.uk is blocked
    by the blocklist entry tracker.co.uk regardless of subdomain.  URLs
    synthesized deterministically from doc_id; the oracle re-derives
    host, registered domain, and keep decision from first principles."""
    from schema_validator_spark.functions import url as U2

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host_pool = F.array(*[F.lit(h) for h in _URL_HOSTS])
    df = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.element_at(host_pool, (F.col("doc_id") % 8 + 1).cast("int")),
            F.lit("/p/"), F.col("doc_id"),
        ),
    )
    ann = U2.annotate_domains(df, "url", _URL_SUFFIXES)
    kept = (
        U2.filter_blocked_domains(df, "url", _URL_BLOCKLIST, _URL_SUFFIXES)
        .select("doc_id", F.lit(1).alias("kept"))
    )
    return ann.join(kept, "doc_id", "left").select(
        "doc_id", "host", "reg_domain",
        F.coalesce(F.col("kept"), F.lit(0)).alias("kept"),
    )


def q_time_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour/day/month rollups per
    event_type in one unioned plan, coarse grains merging the finer
    grain's (count,sum,min,max) partials instead of re-scanning events.
    NULL values filtered on both sides (a pure-NULL bucket would emit a
    NULL vsum, which decays to NaN through pandas comparators)."""
    from schema_validator_spark.operators import rollup as RU

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = RU.rollup_timeseries(ev, "ts", ["event_type"], "value")
    return out.select(
        "grain", "event_type",
        F.unix_micros(F.col("bucket_start").cast("timestamp"))
        .alias("bucket_us"),
        "n", "vsum", "vmin", "vmax",
    )


def q_quantile_rollup(spark, sf_dir):
    """Percentile-grade continuous aggregate: mergeable quantile
    sketches carried day -> month (coarse grain re-merges the finer
    grain's KB-sized sketch rows, never raw events).  The oracle checks
    the EXACT fields (n, vmin, vmax — lossless through every merge),
    which gates the sketch pipeline's bookkeeping end-to-end; quantile
    accuracy is pinned separately in tests/test_rollup.py."""
    from schema_validator_spark.operators import rollup as RU

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = RU.rollup_quantiles(
        ev, "ts", ["event_type"], "value", grains=("day", "month"), qs=(0.5,)
    )
    return out.select(
        "grain", "event_type",
        F.unix_micros(F.col("bucket_start").cast("timestamp"))
        .alias("bucket_us"),
        "n", "vmin", "vmax",
    )


def q_distinct_rollup(spark, sf_dir):
    """Distinct-users-per-bucket continuous aggregate via Spark's
    built-in Datasketches HLL: day sketches union into month sketches
    (count-distinct doesn't decompose across buckets; its sketch does).
    At gate cardinalities the HLL coupon list is exact, so the oracle is
    plain COUNT(DISTINCT) at both grains."""
    from schema_validator_spark.operators import rollup as RU

    ev = _t(spark, sf_dir, "events")
    out = RU.rollup_distinct(
        ev, "ts", ["event_type"], "user_id", grains=("day", "month")
    )
    return out.select(
        "grain", "event_type",
        F.unix_micros(F.col("bucket_start").cast("timestamp"))
        .alias("bucket_us"),
        "n_distinct",
    )


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style perplexity filter stage: add-alpha bigram LM trained
    on the English slice, every document scored by mean negative
    log-likelihood (broadcast LM joins — the corpus side never
    shuffles).  Oracle replays training AND scoring; NLL compared as a
    6dp-scaled long."""
    from schema_validator_spark.operators import lm as LMOD

    docs = _t(spark, sf_dir, "documents")
    model = LMOD.train_bigram_lm(docs.filter(F.col("lang") == "en"), "text")
    out = LMOD.perplexity_scores(docs, "doc_id", "text", model, alpha=0.1)
    return out.select(
        "doc_id", "n_bigrams",
        F.round(F.col("nll") * 1e6).cast("long").alias("nll_e6"),
    )


def q_asof_join(spark, sf_dir):
    """As-of join (kdb/pandas/DuckDB semantics, backward-inclusive):
    every purchase event enriched with the latest tier update
    at-or-before it.  Runs the HOT-KEY-SAFE chunked tier (the default
    scale path, like the sessions query) against DuckDB's native ASOF
    LEFT JOIN; the plain union-window tier is pinned row-identical to it
    by tests/test_temporal.py.  Timestamps compared as exact epoch
    microseconds."""
    from schema_validator_spark.operators import temporal as T

    ev = _t(spark, sf_dir, "events")
    updates = (
        ev.filter(F.col("event_id") % 10 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("update_id"))
        .withColumn("tier", F.col("update_id") % 3)
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = T.asof_join_chunked(purchases, updates, ["user_id"], "ts")
    # no-match rows surface as -1, not NULL: nullable BIGINTs decay to
    # float64/NaN through pandas-based comparators
    return out.select(
        "event_id", "user_id",
        F.coalesce(F.col("update_id"), F.lit(-1)).alias("update_id"),
        F.coalesce(F.col("tier"), F.lit(-1)).alias("tier"),
        F.coalesce(
            F.unix_micros(F.col("ts_right").cast("timestamp")), F.lit(-1)
        ).alias("matched_ts_us"),  # UTC session -> DuckDB epoch_us-identical
    )


def q_range_join(spark, sf_dir):
    """Range join (click -> purchase by the same user within one hour,
    bounds inclusive) as a binned EQUI-join — never a nested loop; bins
    and the final predicate both in exact integer microseconds.  Oracle
    is DuckDB's native inequality join."""
    from schema_validator_spark.operators import temporal as T

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("ts_click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("ts_purchase"),
    )
    out = T.range_join_binned(
        clicks, purchases, ["user_id"], "ts_click", "ts_purchase",
        lower_seconds=0, upper_seconds=3600,
    )
    return out.select(
        "click_id", "purchase_id", "user_id",
        (F.unix_micros(F.col("ts_purchase").cast("timestamp"))
         - F.unix_micros(F.col("ts_click").cast("timestamp"))).alias("delta_us"),
    )


def q_outlier_stats(spark, sf_dir):
    """Per-group numeric outlier counts (z-score + Tukey IQR fences) with
    6dp-rounded fence statistics so any engine re-derives identical
    borderline decisions."""
    ev = _t(spark, sf_dir, "events")
    return drift.outlier_stats(ev, "value", ["event_type"], round_stats=6)


def q_line_dedup_global(spark, sf_dir):
    """Corpus-wide duplicate-line removal (RefinedWeb/CCNet boilerplate
    pass) over synthesized multi-line docs: each doc = its text, a shared
    boilerplate footer (cross-doc duplicate), then its text again
    (within-doc duplicate).  First occurrence by (doc_id, line_idx)
    survives; oracle re-derives the whole pass byte-exactly."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("text"),
            F.lit("shared boilerplate footer line"),
            F.col("text"),
        ).alias("text"),
    )
    out = dedup.global_line_dedup(docs, "doc_id", "text")
    return out.select(
        "doc_id", "n_lines_kept", F.md5("text_dedup").alias("dedup_md5")
    )


# 9 tokens >= k=8: planted cross-document repeated span for q_span_dedup
_SPAN_SENTINEL = ("shared licence header boilerplate repeated "
                  "across many documents verbatim")


def q_span_dedup(spark, sf_dir):
    """Exact substring-level dedup (Lee et al. 2021 repeated-span pass)
    over documents with a planted shared 9-token suffix on every 7th doc:
    k=8 token-gram fingerprints occurring >= 2 times corpus-wide survive
    only at their first (doc_id, pos) occurrence; all other occurrences'
    tokens are removed.  The DuckDB oracle replays the entire pass and
    byte-checks the cleaned text via md5."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_SENTINEL)),
        ).otherwise(F.col("text")).alias("text"),
    )
    out = dedup.remove_repeated_spans(docs, "doc_id", "text", k=8, min_count=2)
    return out.select(
        "doc_id", "n_tokens_removed", F.md5("text_despan").alias("despan_md5")
    )


def q_token_budget_sample(spark, sf_dir):
    """Token-budget sampling per language (dataset-mixing quotas in
    TOKENS, not rows): deterministic md5-rank walk keeps docs while the
    stratum's running token total stays ≤ 2000."""
    from schema_validator_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", X.token_count(F.col("text")).alias("n_tokens")
    )
    out = sampling.sample_token_budget(docs, ["lang"], "doc_id", "n_tokens", 2000)
    return out.select("doc_id", "lang", "n_tokens")


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (GPT-style concat-and-chunk): documents laid
    end-to-end in deterministic md5-rank order, cut into 256-token
    training sequences.  Output = the packing manifest — one row per
    (sequence, doc-slice) with in-doc and in-sequence token ranges.
    Distributed prefix sum (256 md5-rank ranges), no global sort."""
    from schema_validator_spark.operators import packing

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", X.token_count(F.col("text")).alias("n_tokens")
    )
    out = packing.pack_sequences(docs, "doc_id", "n_tokens", 256)
    return out.select("seq_id", "doc_id", "begin_tok", "end_tok", "seq_off")


def q_temperature_sample(spark, sf_dir):
    """Temperature mixture reweighting (mT5/XLM-R alpha sampling,
    alpha = 1/T): per-language keep probabilities ∝ n^(1/T), rounded
    6dp, applied as deterministic md5-hash acceptance — the corpus never
    shuffles (one tiny count agg broadcast back).  T=2 boosts the
    smaller language slices; oracle replays counts, tempering, and every
    acceptance decision exactly."""
    from schema_validator_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sampling.temperature_sample(
        docs, ["lang"], "doc_id", temperature=2.0, target_fraction=0.3
    )
    return out.select("doc_id", "lang")


def q_incremental_validation(spark, sf_dir):
    """Incremental validation over a snapshot table: commit 1 = click
    events, commit 2 appends purchase events; the manifest file-delta
    scan reads ONLY commit 2's files (no row comparison, no full-table
    scan) and the engine validates just those rows.  Oracle = the same
    rule counts over the purchase slice directly."""
    import os
    import tempfile

    from schema_validator_spark.sources.snapshots import (
        SnapshotTable, validate_appended,
    )

    ev = _t(spark, sf_dir, "events")
    # pid suffix: see q_snapshot_drift (no cross-process drop() races)
    _gc_stale_snapshot_dirs()
    path = os.path.join(
        tempfile.gettempdir(),
        f"svs_incr_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = SnapshotTable(path)
    t.drop()
    t = SnapshotTable(path)
    s1 = t.commit(ev.filter(F.col("event_type") == "click"))
    t.commit(ev.filter(F.col("event_type") == "purchase"), mode="append")
    eng = ValidationEngine(
        {"value": "required|max=100", "event_type": "oneof=click,view,signup,purchase"},
        key_cols=["event_id"],
    )
    res = validate_appended(spark, t, eng, s1)
    return res.violations.groupBy("field", "code").agg(
        F.count(F.lit(1)).alias("n")
    )
