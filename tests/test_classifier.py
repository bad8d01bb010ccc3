"""fastText-style quality classifier (functions/classifier.py)."""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from schema_validator_spark.functions import classifier as QC
from schema_validator_spark.operators.curate import CurationReport, curate
from schema_validator_spark.plans import inspect as P


def ref_score(text: str, seed: str = "qc-v1", bias: float = 0.0) -> float:
    """Driver-side bit-for-bit replay of the Spark expression."""
    toks = [t for t in (text or "").strip().split() if t]
    toks = [t for t in " ".join(toks).split()]  # whitespace-normalized
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    total = 0.0
    for f_ in feats:
        h = hashlib.md5((f_ + seed).encode()).hexdigest()[:8]
        total += int(h, 16) / float(1 << 32) - 0.5
    z = bias + total / max(len(feats), 1)
    return 1.0 / (1.0 + math.exp(-z))


def test_score_matches_reference_replay(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "single",
        "two words",
        "  leading   and trailing   whitespace  ",
        "",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    rows = QC.classify_documents(df, "text").orderBy("doc_id").collect()
    for r, t in zip(rows, texts):
        assert abs(r["qc_score"] - ref_score(t or "")) < 1e-12, t
        assert 0.0 < r["qc_score"] < 1.0


def test_zero_feature_doc_scores_sigmoid_of_bias(spark):
    df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    r = QC.classify_documents(df, "text", bias=0.3).collect()[0]
    assert abs(r["qc_score"] - 1.0 / (1.0 + math.exp(-0.3))) < 1e-12


def test_threshold_flag_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i} with shared vocabulary") for i in range(50)],
        "doc_id long, text string",
    )
    a = QC.classify_documents(df, "text", threshold=0.5).collect()
    b = QC.classify_documents(df, "text", threshold=0.5).collect()
    assert sorted((r["doc_id"], r["qc_score"]) for r in a) == \
           sorted((r["doc_id"], r["qc_score"]) for r in b)
    for r in a:
        assert r["qc_score_keep"] == (r["qc_score"] >= 0.5)
    # seed changes the model
    c = QC.classify_documents(df, "text", seed="other").collect()
    assert {r["qc_score"] for r in c} != {r["qc_score"] for r in a}


def test_score_is_single_pass_pure_codegen(spark):
    """The scoring stage must add NO shuffle and NO Python to the plan."""
    df = spark.range(10).withColumn("text", F.lit("some document text"))
    scored = QC.classify_documents(df, "text")
    P.assert_single_pass(scored)
    assert not P.uses_python(scored)


def test_curate_classifier_stage(spark):
    docs = spark.createDataFrame(
        [(i, f"document {i} body with plenty of words to score") for i in range(40)],
        "doc_id long, text string",
    )
    scores = sorted(
        r["s"] for r in docs.select(
            QC.classifier_score(F.col("text")).alias("s")).collect()
    )
    thr = scores[len(scores) // 2]  # median -> guaranteed to split
    rep = CurationReport()
    out = curate(
        docs, min_quality=0.0, classifier_threshold=thr,
        near_dup_threshold=0.99, report=rep,
    )
    kept = out.count()
    direct = docs.filter(
        QC.classifier_score(F.col("text")) >= thr
    ).count()
    assert rep.counts["classifier"] == direct
    assert 0 < direct < 40  # threshold actually splits this corpus
    assert kept <= direct
