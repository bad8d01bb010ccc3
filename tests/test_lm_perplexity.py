"""Bigram-LM perplexity scoring (operators/lm.py) — CCNet-style filter."""
from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from schema_validator_spark.operators import lm as LM
from schema_validator_spark.plans import inspect as P

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "the cat ate the fish"),
]
TARGETS = [
    (10, "the cat sat on the mat"),          # fluent under the LM
    (11, "fish rug mat dog zebra unknown"),  # surprising
    (12, "single"),                          # < 2 tokens -> unscorable
    (13, ""),
    (14, None),
]
ALPHA = 0.1


def ref_nll(text: str) -> float | None:
    toks_all = [t for d in REF for t in d[1].split()]
    uni = Counter(toks_all)
    big = Counter()
    for _, d in REF:
        w = d.split()
        big.update(zip(w, w[1:]))
    v = len(uni)
    w = (text or "").split()
    if len(w) < 2:
        return None
    lps = []
    for a, b in zip(w, w[1:]):
        p = (big.get((a, b), 0) + ALPHA) / (uni.get(a, 0) + ALPHA * v)
        lps.append(math.log(p))
    return -sum(lps) / len(lps)


def test_scores_match_reference_replay(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGETS, "doc_id long, text string")
    lm = LM.train_bigram_lm(ref, "text")
    rows = {r["doc_id"]: r for r in
            LM.perplexity_scores(tgt, "doc_id", "text", lm, alpha=ALPHA).collect()}
    assert set(rows) == {10, 11}  # unscorable docs absent
    for did, text in [(10, TARGETS[0][1]), (11, TARGETS[1][1])]:
        assert abs(rows[did]["nll"] - ref_nll(text)) < 1e-9
        assert rows[did]["n_bigrams"] == len(text.split()) - 1
    # fluent text scores strictly lower NLL than the unknown-word soup
    assert rows[10]["nll"] < rows[11]["nll"]


def test_filter_keeps_fluent_docs(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGETS, "doc_id long, text string")
    lm = LM.train_bigram_lm(ref, "text")
    cut = (ref_nll(TARGETS[0][1]) + ref_nll(TARGETS[1][1])) / 2
    kept = LM.perplexity_filter(tgt, "doc_id", "text", lm, max_nll=cut,
                                alpha=ALPHA)
    assert sorted(r["doc_id"] for r in kept.collect()) == [10]
    assert kept.columns == ["doc_id", "text"]


def test_scoring_plan_broadcasts_lm(spark):
    """Corpus side must not shuffle on the join keys: both LM joins are
    broadcast; the only hash exchanges are the LM-table aggregations and
    the final per-doc mean."""
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGETS, "doc_id long, text string")
    lm = LM.train_bigram_lm(ref, "text")
    scores = LM.perplexity_scores(tgt, "doc_id", "text", lm)
    plan = P.executed_plan(scores)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert not P.uses_python(scores)
