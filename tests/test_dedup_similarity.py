"""Dedup / similarity / text-analysis operator tests — the
training-data-pipeline half of the engine, over the driver testdata
`documents` and `embeddings` tables plus synthetic fixtures."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.functions import similarity as V
from schema_validator_spark.functions import text as X
from schema_validator_spark.operators import ann, dedup

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "Same Text!")],
        "doc_id int, text string",
    )
    groups = dedup.exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]
    # fingerprint dedup also folds case/punct variant 4
    fp = dedup.fingerprint_duplicates(df, "doc_id", "text").collect()
    assert fp[0]["doc_ids"] == [1, 2, 4]
    assert dedup.dedup_exact(df, "text").count() == 3


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("lazy", "sleepy")
    other = "completely different words about spark shuffle partitions and catalyst plans"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id int, text string"
    )
    pairs = dedup.minhash_lsh_candidates(
        df, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.3
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}
    assert pairs[0]["jaccard"] > 0.3


def test_simhash_candidates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.replace("kappa", "lambda", 1)
    other = "one two three four five six seven eight nine ten " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id int, text string"
    )
    pairs = dedup.simhash_candidates(df, "doc_id", "text", max_hamming=8).collect()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "zzzzzzzzzz")],
        "doc_id int, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}


def test_embedding_near_duplicates(spark):
    v = [1.0] * 8
    v_near = [1.0] * 7 + [0.95]
    v_far = [(-1.0) ** i for i in range(8)]
    df = spark.createDataFrame(
        [(1, v), (2, v_near), (3, v_far)], "vec_id int, embedding array<double>"
    )
    pairs = dedup.embedding_near_duplicates(
        df, "vec_id", "embedding", cosine_threshold=0.99, n_planes=8
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}


def test_cosine_topk_exact(embs):
    queries = embs.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = ann.cosine_topk(queries, embs, k=5)
    rows = topk.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 5
        rs.sort(key=lambda r: r["rank"])
        # rank 1 is the query itself (cosine 1.0)
        assert rs[0]["vec_id"] == qid
        assert rs[0]["cosine"] == pytest.approx(1.0, abs=1e-4)
        # scores non-increasing
        assert all(rs[i]["cosine"] >= rs[i + 1]["cosine"] for i in range(4))


def test_srp_topk_recall(embs):
    queries = embs.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann.cosine_topk(queries, embs, k=3).collect()
    approx = ann.srp_topk(queries, embs, k=3, n_planes=6).collect()
    exact_top1 = {r["query_id"]: r["vec_id"] for r in exact if r["rank"] == 1}
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # the query itself (top-1, cosine 1.0, same bucket) must always be found
    hits = sum(1 for q, v in exact_top1.items() if v in approx_by_q.get(q, set()))
    assert hits == len(exact_top1)


def test_text_functions(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the market and it is fine"),
            (2, "el perro y el gato en la casa de los abuelos por la tarde"),
            (3, "aaa aaa aaa aaa aaa"),
        ],
        "doc_id int, text string",
    )
    out = df.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tok"),
        X.lang_id(F.col("text")).alias("lang"),
        X.quality_score(F.col("text")).alias("q"),
        X.fingerprint(F.col("text")).alias("fp"),
        X.rolling_hash(F.col("text")).alias("rh"),
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["n_tok"] == 13
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "es"
    # repetitive doc scores below varied doc
    assert rows[3]["q"] < rows[1]["q"]
    assert len(rows[1]["fp"]) == 32
    assert 0 <= rows[1]["rh"] < 1_000_000_007


def test_shingles_and_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(
        X.word_shingles(F.col("text"), 2).alias("sh"),
        X.char_ngrams(F.col("text"), 3).alias("ng"),
    ).first()
    assert set(row["sh"]) == {"a b", "b c", "c d"}
    assert "a b" in row["ng"]


def test_shingles_linear_form_equals_index_form(spark):
    """word_shingles/char_ngrams are built with chained zip_with over
    shifted slices (the token/char array referenced k times TOTAL) —
    the index form re-evaluated the embedded split/lower once per
    OUTPUT element in interpreted HOF eval, O(len²) per doc.  Pin the
    rewritten form byte-identical to the index form on edge cases."""
    rows = [
        ("a b c d e f g h i j",),
        ("single",),
        ("two words",),
        ("exactly three tokens",),
        ("",), (None,),
        ("  padded   whitespace\ttabs  and\nnewlines here ok",),
        ("ünïcødé tökens über ångström μικρό 中文 分词 测试 again",),
        ("dup dup dup dup dup",),  # array_distinct path
    ]
    df = spark.createDataFrame(rows, "text string")

    def idx_shingles(col, k):
        toks = X.tokens(col)
        n = F.size(toks)
        return F.array_distinct(
            F.when(n >= k, F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )).otherwise(F.array(F.concat_ws(" ", toks))))

    def idx_ngrams(col, n):
        s = F.lower(col)
        ln = F.length(s)
        return F.array_distinct(
            F.when(ln >= n, F.transform(
                F.sequence(F.lit(1), ln - n + 1),
                lambda i: F.substring(s, i, n),
            )).otherwise(F.array(s)))

    for k in (1, 2, 3, 5):
        got = df.select(
            X.word_shingles(F.col("text"), k).alias("new"),
            idx_shingles(F.col("text"), k).alias("old"),
            X.char_ngrams(F.col("text"), k).alias("new_ng"),
            idx_ngrams(F.col("text"), k).alias("old_ng"),
        ).collect()
        for r in got:
            assert r["new"] == r["old"], (k, r)
            assert r["new_ng"] == r["old_ng"], (k, r)


def test_docs_table_text_pipeline(docs):
    """Run the text-analysis suite over the driver documents table."""
    out = docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tok"),
        X.quality_score(F.col("text")).alias("q"),
        X.lang_id(F.col("text")).alias("lid"),
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("q").alias("qmin"),
        F.max("q").alias("qmax"),
    ).first()
    assert agg["n"] == docs.count()
    assert 0.0 <= agg["qmin"] <= agg["qmax"] <= 1.0


def test_cosine_topk_arrow_matches_expression(spark):
    """Arrow-matmul top-k must return the identical ranking as the
    expression-HOF exact form."""
    from pyspark.sql import functions as F
    from schema_validator_spark.operators import ann

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {(r["query_id"], r["rank"]): r["vec_id"]
         for r in ann.cosine_topk(queries, embs, k=5).collect()}
    b = {(r["query_id"], r["rank"]): r["vec_id"]
         for r in ann.cosine_topk_arrow(queries, embs, k=5).collect()}
    assert a == b


def test_ivf_topk_recall(spark):
    """IVF (k-means lists + nprobe) recall@5 vs exact must be high on the
    64-dim corpus; schema matches the exact form."""
    from pyspark.sql import functions as F
    from schema_validator_spark.operators import ann

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = embs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.cosine_topk(queries, embs, k=5).collect()
    approx = ann.ivf_topk(queries, embs, k=5, nlist=16, nprobe=6).collect()
    assert {c for c in ann.ivf_topk(queries, embs, k=2, nlist=8, nprobe=2).columns} \
        == {"query_id", "vec_id", "cosine", "rank"}
    e = {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    a = {}
    for r in approx:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(len(e[q] & a.get(q, set())) for q in e) / sum(len(v) for v in e.values())
    assert recall >= 0.7, recall


def test_ivf_pq_topk_recall_and_exact_rerank(spark):
    """IVF-PQ (quantized shortlist + exact re-rank): recall@5 vs exact
    must be high on the 64-dim corpus; the FINAL cosines must be exact
    (identical to brute force for shared (query, vec) pairs — the PQ
    approximation only picks the shortlist, never the reported score);
    the encoded index carries only m int codes per vector, no raw floats."""
    from pyspark.sql import functions as F
    from schema_validator_spark.operators import ann

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = embs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.cosine_topk(queries, embs, k=5).collect()
    approx = ann.ivf_pq_topk(
        queries, embs, k=5, nlist=16, nprobe=6, m=8, shortlist=64
    ).collect()
    assert {c for c in approx[0].asDict()} == {"query_id", "vec_id", "cosine", "rank"}

    e_sets, e_cos = {}, {}
    for r in exact:
        e_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        e_cos[(r["query_id"], r["vec_id"])] = r["cosine"]
    a_sets = {}
    for r in approx:
        a_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        if (r["query_id"], r["vec_id"]) in e_cos:
            # re-rank scores are exact, bit-identical to brute force
            assert r["cosine"] == pytest.approx(
                e_cos[(r["query_id"], r["vec_id"])], abs=1e-6
            )
    recall = sum(len(e_sets[q] & a_sets.get(q, set())) for q in e_sets) / sum(
        len(v) for v in e_sets.values()
    )
    # bounded by IVF probing, same gate as test_ivf_topk_recall: with
    # shortlist=64 >= all probed candidates here, PQ drops nothing extra
    assert recall >= 0.7, recall

    encoded, cent, books = ann.ivf_pq_build(embs, nlist=16, m=8)
    assert set(encoded.columns) == {"vec_id", "_list", "_code"}
    row = encoded.first()
    assert len(row["_code"]) == 8  # m bytes/vector vs 64*8 raw bytes
    assert all(0 <= c < 256 for c in row["_code"])
    assert books.shape == (8, 256, 8)


def test_ivf_pq_planted_copy_exact_top2(spark):
    """The oracle-gate property: plant an exact scaled copy of each query
    (cosine 1.0, identical normalized vector => identical list + code);
    IVF-PQ top-2 must equal the exact top-2."""
    from pyspark.sql import functions as F
    from schema_validator_spark.operators import ann

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    aug = embs.unionByName(
        embs.select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
        )
    )
    queries = aug.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in ann.cosine_topk(queries, aug, k=2).collect()}
    pq = {(r["query_id"], r["rank"]): r["vec_id"]
          for r in ann.ivf_pq_topk(queries, aug, k=2, nlist=16, nprobe=4,
                                   m=8, shortlist=64).collect()}
    assert pq == exact


def test_cluster_pairs_connected_components(spark):
    """Pairs -> components: chain 1-2-3, clique 10-11-12, isolated pair 20-21."""
    from schema_validator_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.cluster_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_keep_best(spark):
    from schema_validator_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (10, 0.1), (99, 0.2)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    clusters = dedup.cluster_pairs(pairs)
    kept = dedup.dedup_keep_best(docs, clusters, score_col="quality")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # cluster {1,2,3} keeps 2 (best quality); 10 and 99 are singletons
    assert ids == [2, 10, 99]
    # no score: lowest id wins
    kept2 = dedup.dedup_keep_best(docs, clusters)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 10, 99]


def test_stratified_sample_exact_and_split(spark):
    from schema_validator_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    samp = sampling.stratified_sample_exact(docs, ["lang"], "doc_id", 10)
    per = {r["lang"]: r["n"] for r in
           samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(10, base[lang])
    # deterministic: same ids both runs
    again = sampling.stratified_sample_exact(docs, ["lang"], "doc_id", 10)
    assert sorted(r["doc_id"] for r in samp.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in again.select("doc_id").collect())

    train, ev = sampling.split_train_eval(docs, "doc_id", eval_fraction=0.1)
    nt, ne, n = train.count(), ev.count(), docs.count()
    assert nt + ne == n           # exact complements
    assert 0.02 < ne / n < 0.25   # ~10% at 500 rows, loose bound
    # stable across invocations
    train2, _ = sampling.split_train_eval(docs, "doc_id", eval_fraction=0.1)
    assert train2.count() == nt


def test_curation_pipeline_funnel(spark):
    """curate(): validation -> quality/lang filters -> two-tier dedup ->
    stratified sample, with a monotone funnel and planted dups removed."""
    from schema_validator_spark.operators.curate import CurationReport, curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant exact dups: copy 10 docs with shifted ids
    extra = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    both = docs.unionByName(extra)

    rep = CurationReport()
    out = curate(
        both,
        spec={"text": "required", "lang": "required"},
        min_quality=0.3,
        allowed_langs=["en", "es", "de", "fr"],
        sample_per_stratum=50,
        strata_cols=["lang"],
        report=rep,
    )
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    c = rep.counts
    # monotone funnel
    assert c["input"] >= c["valid"] >= c["quality"] >= c["lang"] >= c["dedup"] >= c["sample"]
    assert c["input"] == both.count()
    assert len(ids) == c["sample"] and len(set(ids)) == len(ids)
    # planted exact dups: at most one of (i, i+900000) survives
    surviving = set(ids)
    for i in range(10):
        assert not ({i, i + 900000} <= surviving)


def test_decontaminate_removes_flagged(spark):
    from schema_validator_spark.operators import decontaminate as D

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated content nothing shared here at all"),
         (3, "we said the quick brown fox jumps too")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "quick brown fox jumps over something")], "doc_id long, text string"
    )
    flagged = D.ngram_contamination(train, eval_df, k=4, min_shared=1)
    ids = {r["doc_id"] for r in flagged.collect()}
    assert ids == {1, 3}   # both contain 'quick brown fox jumps'
    clean = D.decontaminate(train, eval_df, k=4)
    assert {r["doc_id"] for r in clean.select("doc_id").collect()} == {2}
    # broadcast path stays broadcast: fact side never shuffles
    from schema_validator_spark.plans import inspect as P
    flg = D.ngram_contamination(train, eval_df, k=4)
    assert "BroadcastHashJoin" in P.join_kinds(flg)


def test_minhash_hot_bucket_cap_bounds_pairs(spark, caplog):
    """A planted degenerate bucket (60 identical docs) must not go
    quadratic when max_bucket_size is set — and the drop is logged."""
    import logging

    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("lazy", "sleepy")
    boiler = "license header " * 5
    rows = [(1, base), (2, near)] + [(100 + i, boiler) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    uncapped = dedup.minhash_lsh_candidates(
        df, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.3
    )
    assert uncapped.count() > 1000  # 60 identical docs -> ~1770 pairs

    with caplog.at_level(logging.WARNING,
                         logger="schema_validator_spark.operators.dedup"):
        capped = dedup.minhash_lsh_candidates(
            df, "doc_id", "text", num_hashes=64, bands=16,
            jaccard_threshold=0.3, max_bucket_size=10,
        )
        got = {(p["id_a"], p["id_b"]) for p in capped.collect()}
    assert got == {(1, 2)}  # hot bucket suppressed, real near-dup kept
    assert any("hot bucket" in r.message for r in caplog.records)


def test_simhash_hot_bucket_cap(spark, caplog):
    import logging

    boiler = "alpha beta gamma delta epsilon zeta " * 4
    rows = [(100 + i, boiler) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert dedup.simhash_candidates(df, "doc_id", "text").count() > 500
    with caplog.at_level(logging.WARNING,
                         logger="schema_validator_spark.operators.dedup"):
        capped = dedup.simhash_candidates(
            df, "doc_id", "text", max_bucket_size=8)
        assert capped.count() == 0
    assert any("hot bucket" in r.message for r in caplog.records)


def test_embedding_neardups_banded_recall_and_cap(spark):
    """Banded SRP: scaled copies (cosine exactly 1.0) are ALWAYS found
    (identical signatures in every band); far vectors never pass verify."""
    import hashlib
    import struct

    def vec(seed, dim=16):
        out = []
        for d in range(dim):
            h = hashlib.sha256(f"t:{seed}:{d}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            out.append((u / 2**64) * 2.0 - 1.0)
        return out

    rows = []
    for i in range(20):
        v = vec(i)
        rows.append((i, v))
        rows.append((1000 + i, [x * 2.5 for x in v]))  # scaled copy, cos=1.0
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    pairs = dedup.embedding_near_duplicates(
        df, "vec_id", "embedding", cosine_threshold=0.999,
        n_planes=16, bands=4,
    )
    got = {(p["id_a"], p["id_b"]) for p in pairs.collect()}
    assert got == {(i, 1000 + i) for i in range(20)}

    # degenerate bucket: 30 identical vectors, capped
    same = [(2000 + i, vec(999)) for i in range(30)]
    df2 = spark.createDataFrame(same, "vec_id int, embedding array<double>")
    capped = dedup.embedding_near_duplicates(
        df2, "vec_id", "embedding", cosine_threshold=0.99,
        n_planes=16, bands=4, max_bucket_size=5, log_dropped=False,
    )
    assert capped.count() == 0


def test_simhash_portable_equals_bruteforce(spark):
    """portable=True (md5-bit signatures): banded output must equal the
    brute-force all-pairs hamming set — pigeonhole banding is exact."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta " * 3),
        (2, "alpha beta gamma delta epsilon zeta eta iota " * 3),
        (3, "one two three four five six seven eight " * 3),
        (4, "alpha beta gamma delta epsilon zeta eta theta " * 3 + "tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    banded = {(r["id_a"], r["id_b"]): r["hamming"]
              for r in dedup.simhash_candidates(
                  df, "doc_id", "text", max_hamming=10, portable=True).collect()}
    sig = dedup.simhash_bits_md5(F.col("text"))
    base = df.select(F.col("doc_id").alias("_id"), sig.alias("_s"))
    l, r = base.alias("l"), base.alias("r")
    brute = {
        (x["id_a"], x["id_b"]): x["h"]
        for x in l.join(r, F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"),
                dedup.hamming(F.col("l._s"), F.col("r._s")).alias("h"))
        .filter(F.col("h") <= 10).collect()
    }
    assert banded == brute and len(brute) > 0


def test_ivf_recall_on_clustered_embeddings(spark):
    """IVF recall gate on CLUSTERED vectors (the distribution IVF is for —
    uniform-random corpora have no neighbor structure to exploit):
    recall@10 >= 0.9 vs exact with nlist=16, nprobe=4."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(16, 32)
    rows = []
    vid = 0
    for c in range(16):
        for _ in range(40):
            v = centers[c] + 0.15 * rng.randn(32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.cosine_topk(queries, df, k=10).collect()
    approx = ann.ivf_topk(queries, df, k=10, nlist=16, nprobe=4, seed=3).collect()
    e, a = {}, {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(len(e[q] & a.get(q, set())) for q in e) / sum(len(v) for v in e.values())
    assert recall >= 0.9, recall


def test_ann_driver_guard_rejects_huge_query_set(spark):
    """A query set beyond max_query_rows must fail fast with guidance —
    never silently collect to the driver."""
    import pytest as _pytest

    corpus = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 7).cast("double") + 1.0
                  for i in range(4)]).alias("embedding"),
    )
    queries = corpus.select(F.col("vec_id").alias("query_id"), "embedding")
    with _pytest.raises(ValueError, match="max_query_rows"):
        ann.cosine_topk_arrow(queries, corpus, k=3, max_query_rows=10)
    listed, cent = ann.ivf_build(corpus, nlist=4)
    with _pytest.raises(ValueError, match="max_query_rows"):
        ann.ivf_query(queries, listed, cent, k=3, max_query_rows=10)
    # within the guard: works
    small = queries.filter(F.col("query_id") < 3)
    assert ann.cosine_topk_arrow(small, corpus, k=3, max_query_rows=10).count() == 9


def test_curation_with_clean_and_gopher_stages(spark):
    """curate() with the round-2 stages wired in: C4 cleanup rewrites the
    text column, the Gopher gate filters on repetition/shape signals, and
    the funnel stays monotone with both stages reported."""
    from schema_validator_spark.operators.curate import CurationReport, curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = CurationReport()
    out = curate(
        docs,
        spec={"text": "required"},
        min_quality=0.2,
        clean=True,
        gopher_gate={"min_tokens": 5, "min_stopword_hits": 0},
        report=rep,
    )
    n = out.count()
    c = rep.counts
    assert set(c) >= {"input", "valid", "clean", "quality", "gopher", "dedup"}
    assert c["input"] >= c["valid"] >= c["clean"] >= c["quality"] >= c["gopher"] >= c["dedup"] == n
    assert n > 0


def test_global_line_dedup(spark):
    """Corpus-wide duplicate-line removal: first occurrence (doc_id,
    line_idx) survives; later within-doc and cross-doc copies drop."""
    rows = [
        (1, "unique alpha line\nshared footer\nunique alpha line"),
        (2, "unique beta line\nshared footer"),
        (3, "shared footer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.global_line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text_dedup"] == "unique alpha line\nshared footer"
    assert out[2]["text_dedup"] == "unique beta line"
    assert out[3]["text_dedup"] == ""
    assert [out[i]["n_lines_kept"] for i in (1, 2, 3)] == [2, 1, 0]


def test_sample_token_budget(spark):
    from schema_validator_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "a", 100) for i in range(50)] + [(100 + i, "b", 400) for i in range(10)],
        "doc_id long, lang string, n_tokens long",
    )
    out = sampling.sample_token_budget(docs, ["lang"], "doc_id", "n_tokens", 1000)
    per = {r["lang"]: r["t"] for r in
           out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    assert per["a"] == 1000   # exactly 10 of the 100-token docs
    assert per["b"] <= 1000 and per["b"] % 400 == 0
    # deterministic
    again = sampling.sample_token_budget(docs, ["lang"], "doc_id", "n_tokens", 1000)
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())


def test_sample_token_budget_distributed_equals_serial(spark):
    """The bucketed two-pass prefix sum must be ROW-identical to the
    serial single-window definition (the oracle semantics) on a skewed
    mixture: one dominant stratum (5000 docs), two small ones."""
    from schema_validator_spark.operators import sampling

    rows = (
        [(i, "web", 7 + i % 13) for i in range(5000)]
        + [(10_000 + i, "code", 31 + i % 5) for i in range(40)]
        + [(20_000 + i, "wiki", 11) for i in range(7)]
        + [(30_000, "web", None)]  # NULL token count -> counts as 0
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    fast = sampling.sample_token_budget(docs, ["lang"], "doc_id", "n_tokens", 3000)
    slow = sampling._sample_token_budget_serial(
        docs.filter(F.col("n_tokens").isNotNull()),
        ["lang"], "doc_id", "n_tokens", 3000,
    )
    got = sorted(r["doc_id"] for r in fast.collect())
    want = sorted(r["doc_id"] for r in slow.collect())
    # serial drops NULL-token rows (NULL cumsum); distributed counts them 0:
    # compare on the non-null universe plus check the null row was kept
    assert [d for d in got if d != 30_000] == want
    # dominant stratum's heavy cumsum runs partitioned by (lang, range),
    # never by lang alone over raw rows — the serial bottleneck is gone
    from schema_validator_spark.plans import inspect as P
    plan = P.executed_plan(fast)
    import re
    raw_windows = [
        m for m in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if "_bsum" not in m
    ]
    assert raw_windows and all("_rng" in m for m in raw_windows), plan


def test_bpe_pair_counts(spark):
    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab")], "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in X.bpe_pair_counts(df, "text").collect()}
    # 'abab' occurs 3x -> pairs ab,ba,ab per occurrence; 'cd' once
    assert got["ab"] == 6 and got["ba"] == 3 and got["cd"] == 1


def test_semdedup_planted_groups(spark):
    """SemDeDup over synthetic clustered embeddings with planted
    duplicate groups of size 2 and 3: exactly one survivor (min id) per
    group, every non-planted vector untouched, pairs match a brute-force
    numpy replay."""
    import numpy as np

    from schema_validator_spark.operators import dedup as D

    rng = np.random.RandomState(11)
    # 6 well-separated direction clusters, 40 vectors each
    centers = rng.randn(6, 16)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(240):
        v = centers[i % 6] + 0.05 * rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    # planted groups: copies (scaled -> cosine exactly 1.0)
    for i in range(0, 240, 10):        # pair partner
        rows.append((1000 + i, [float(x * 1.5) for x in rows[i][1]]))
    for i in range(0, 240, 30):        # triplet third member
        rows.append((2000 + i, [float(x * 0.5) for x in rows[i][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # brute-force ground truth at the chosen threshold
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    ids = [r[0] for r in rows]
    thr = 0.999
    true_pairs = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if sims[i, j] >= thr
    }
    # the planted groups must be the ONLY pairs at this threshold
    assert all(a < 1000 <= b or (1000 <= a < 2000 <= b) for a, b in true_pairs)

    survivors = sorted(
        r["vec_id"] for r in
        D.semdedup(df, "vec_id", "embedding", cosine_threshold=thr,
                   nlist=6, seed=7).collect()
    )
    # expected: every base id survives; all planted copies dropped
    assert survivors == sorted(i for i in ids if i < 1000)

    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.semdedup_pairs(df, "vec_id", "embedding",
                                  cosine_threshold=thr, nlist=6,
                                  seed=7).collect()
    }
    assert got_pairs == true_pairs


def test_semdedup_auto_nlist(spark):
    """nlist=None derives the cluster count from corpus size so the
    Σc² pair work stays linear in n — and the planted-duplicate result
    is unchanged versus an explicit nlist (copies share a cluster by
    construction: identical direction -> identical argmax centroid)."""
    import numpy as np

    from schema_validator_spark.operators import dedup as D

    # formula: max(16, n // 1000)
    assert D._auto_nlist(spark.range(300)) == 16
    assert D._auto_nlist(spark.range(20_000)) == 20
    assert D._auto_nlist(spark.range(50_000)) == 50

    rng = np.random.RandomState(3)
    centers = rng.randn(4, 8)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(80):
        v = centers[i % 4] + 0.05 * rng.randn(8)
        rows.append((i, [float(x) for x in v]))
    for i in range(0, 80, 8):  # planted exact-direction copies
        rows.append((100 + i, [float(x * 2.0) for x in rows[i][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    auto = sorted(r["vec_id"] for r in
                  D.semdedup(df, "vec_id", "embedding",
                             cosine_threshold=0.9999, seed=7).collect())
    assert auto == sorted(i for i, _ in rows if i < 100)

    # cluster-size distribution at the auto-chosen nlist: every vector
    # assigned, no cluster degenerate (bounded well below n)
    from schema_validator_spark.operators import ann as A
    listed, _ = A.ivf_build(df, corpus_id="vec_id", corpus_vec="embedding",
                            nlist=D._auto_nlist(df), seed=7)
    sizes = {r["_list"]: r["c"] for r in
             listed.groupBy("_list").agg(F.count("*").alias("c")).collect()}
    assert sum(sizes.values()) == len(rows)
    assert max(sizes.values()) < len(rows)  # not one degenerate cluster


def test_semdedup_cluster_cap_logs_drops(spark):
    from schema_validator_spark.operators import dedup as D

    rows = [(i, [1.0, 0.0, 0.0]) for i in range(50)]  # one degenerate cluster
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # cap semantics (same as every LSH tier): a bucket over the cap is
    # EXCLUDED from pair generation entirely, with the drop logged
    pairs = D.semdedup_pairs(df, "vec_id", "embedding", nlist=2,
                             max_cluster_size=10, log_dropped=True)
    assert pairs.count() == 0
    uncapped = D.semdedup_pairs(df, "vec_id", "embedding", nlist=2)
    assert uncapped.count() == 50 * 49 / 2


def test_temperature_sample(spark):
    """Temperature mixture sampling: deterministic hash acceptance,
    tempered allocation (T>1 boosts small strata), exact Python replay."""
    import hashlib

    import pytest
    from schema_validator_spark.operators import sampling

    rows = (
        [(i, "web") for i in range(4000)]
        + [(10_000 + i, "code") for i in range(400)]
        + [(20_000 + i, "wiki") for i in range(40)]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")

    def replay(temperature, frac):
        ns = {"web": 4000, "code": 400, "wiki": 40}
        qs = {k: v ** (1.0 / temperature) for k, v in ns.items()}
        qsum, ntot = sum(qs.values()), sum(ns.values())
        ps = {k: round(min(frac * ntot * qs[k] / (qsum * ns[k]), 1.0), 6)
              for k in ns}
        kept = []
        for did, src in rows:
            h = hashlib.md5((str(did) + "v1").encode()).hexdigest()[:8]
            if int(h, 16) / 4294967296.0 < ps[src]:
                kept.append(did)
        return sorted(kept)

    for T, frac in [(1.0, 0.25), (3.0, 0.25), (100.0, 0.5)]:
        got = sorted(
            r["doc_id"]
            for r in sampling.temperature_sample(
                df, ["src"], "doc_id", temperature=T, target_fraction=frac
            ).collect()
        )
        assert got == replay(T, frac), (T, frac)

    # T=1 ~ natural proportions; T=3 shifts share toward small strata
    k1 = sampling.temperature_sample(df, ["src"], "doc_id",
                                     temperature=1.0, target_fraction=0.25)
    k3 = sampling.temperature_sample(df, ["src"], "doc_id",
                                     temperature=3.0, target_fraction=0.25)
    n1 = {r["src"]: r["n"] for r in k1.groupBy("src").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n3 = {r["src"]: r["n"] for r in k3.groupBy("src").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert n3.get("wiki", 0) > n1.get("wiki", 0)
    assert n3["web"] < n1["web"]

    with pytest.raises(ValueError):
        sampling.temperature_sample(df, ["src"], "doc_id",
                                    temperature=0, target_fraction=0.5)
    with pytest.raises(ValueError):
        sampling.temperature_sample(df, ["src"], "doc_id",
                                    temperature=1, target_fraction=0)


def test_token_budget_and_temperature_null_stratum(spark):
    """NULL strata are real strata: the null-safe joins must sample them
    (the round-3 review found plain equi-joins silently dropping them)."""
    from schema_validator_spark.operators import sampling

    rows = ([(i, "web", 10) for i in range(50)]
            + [(1000 + i, None, 10) for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")

    kept = sampling.sample_token_budget(df, ["lang"], "doc_id", "n_tokens", 200)
    by = {k: 0 for k in ("web", None)}
    for r in kept.collect():
        by[r["lang"]] += 1
    assert by["web"] == 20 and by[None] == 20  # 200 tokens / 10 each

    t = sampling.temperature_sample(df, ["lang"], "doc_id",
                                    temperature=1.0, target_fraction=0.9)
    langs = {r["lang"] for r in t.collect()}
    assert None in langs and "web" in langs
    # column set unchanged (no leaked temp columns)
    assert set(t.columns) == {"doc_id", "lang", "n_tokens"}
    assert set(kept.columns) == {"doc_id", "lang", "n_tokens"}


def test_tfidf_keywords(spark):
    """tf-idf keyword extraction: Python replay, deterministic ties,
    min_df filter, corpus-wide tokens score 0 (never keywords over
    rarer terms)."""
    import math

    docs = [
        (1, "spark spark shuffle common"),
        (2, "duck oracle common"),
        (3, "spark oracle common common"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in X.tfidf_keywords(df, "doc_id", "text", top_k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["token"], r["tf"], r["score"]))
    for v in got.values():
        v.sort()

    def score(tf, dfreq):
        return round(tf * math.log(3 / dfreq), 6)

    # doc 1: spark tf=2 df=2 -> 2*ln(1.5); shuffle tf=1 df=1 -> ln(3)
    assert got[1] == [(1, "shuffle", 1, score(1, 1)),
                      (2, "spark", 2, score(2, 2))]
    # doc 2: duck ln(3) beats oracle ln(1.5); 'common' df=3 scores 0
    assert got[2] == [(1, "duck", 1, score(1, 1)),
                      (2, "oracle", 1, score(1, 2))]
    # doc 3: spark and oracle tie exactly (tf=1, df=2) -> token asc
    assert got[3] == [(1, "oracle", 1, score(1, 2)),
                      (2, "spark", 1, score(1, 2))]
    # min_df prunes hapaxes
    only_common = X.tfidf_keywords(df, "doc_id", "text", top_k=5, min_df=2)
    assert {r["token"] for r in only_common.collect()} == {
        "spark", "oracle", "common"}
