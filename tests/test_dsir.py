from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.dsir import dsir_weights
from schema_validator_spark.plans.inspect import n_exchanges, uses_python

NB = 64
SALT = "v1"


def _feats_py(text):
    toks = [t for t in (text or "").lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_py(f):
    return int(hashlib.md5((f + SALT).encode()).hexdigest()[:8], 16) % NB


def _score_py(raw_texts, target_texts, text):
    tc, rc = {}, {}
    for txts, d in ((target_texts, tc), (raw_texts, rc)):
        for t in txts:
            for f in _feats_py(t):
                b = _bucket_py(f)
                d[b] = d.get(b, 0) + 1
    tt = sum(tc.values()) + NB
    rt = sum(rc.values()) + NB
    w = [int(round(1e6 * (math.log((tc.get(b, 0) + 1) / tt)
                          - math.log((rc.get(b, 0) + 1) / rt))))
         for b in range(NB)]
    return sum(w[_bucket_py(f)] for f in _feats_py(text))


RAW = [
    (1, "common web words everywhere filler filler"),
    (2, "quantum flux capacitor physics paper"),
    (3, "common filler junk junk junk"),
    (4, "quantum physics flux notes"),
    (5, None),
    (6, ""),
]
TARGET = [
    (1, "quantum physics flux capacitor"),
    (2, "physics paper quantum theory"),
]


def _run(spark):
    raw = spark.createDataFrame(RAW, "id long, text string")
    tgt = spark.createDataFrame(TARGET, "id long, text string")
    out = dsir_weights(raw, ["id"], "text", tgt, "text",
                       n_buckets=NB, salt=SALT)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_scores_match_python_replay_exactly(spark):
    got = _run(spark)
    raw_texts = [t for _, t in RAW]
    tgt_texts = [t for _, t in TARGET]
    for i, text in RAW:
        want = _score_py(raw_texts, tgt_texts, text)
        assert got[i]["score_e6"] == want, (i, got[i]["score_e6"], want)


def test_target_like_docs_score_higher(spark):
    got = _run(spark)
    target_like = min(got[2]["score_e6"], got[4]["score_e6"])
    off_target = max(got[1]["score_e6"], got[3]["score_e6"])
    assert target_like > off_target


def test_feature_counts(spark):
    got = _run(spark)
    # 6 tokens + 5 bigrams
    assert got[1]["n_features"] == 11
    assert got[5]["n_features"] == 0 and got[5]["score_e6"] == 0
    assert got[6]["n_features"] == 0 and got[6]["score_e6"] == 0


def test_guards(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        dsir_weights(df, ["id"], "text", df, "text", n_buckets=1)
    with pytest.raises(ValueError):
        dsir_weights(df.withColumn("_feats", F.lit(1)),
                     ["id"], "text", df, "text", n_buckets=NB)


def test_scoring_plan_zero_shuffle_zero_python(spark):
    raw = spark.createDataFrame(RAW, "id long, text string")
    tgt = spark.createDataFrame(TARGET, "id long, text string")
    out = dsir_weights(raw, ["id"], "text", tgt, "text",
                       n_buckets=NB, salt=SALT)
    assert n_exchanges(out) == 0
    assert not uses_python(out)
