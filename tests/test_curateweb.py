from __future__ import annotations

import hashlib

from schema_validator_spark.operators.curateweb import (
    WebCurationReport,
    curate_web,
)

SHARED = ("common shared paragraph block alpha beta gamma delta "
          "epsilon zeta eta theta")


def _docs(spark, n=60):
    rows = []
    for i in range(n):
        if i % 10 == 0:
            text = f"doc {i} text. As an AI language model, I refuse."
        elif i % 10 == 1:
            text = f"doc {i} text with vileword inside"
        elif i % 10 in (2, 3):
            text = SHARED  # identical -> saturation 1.0
        else:
            text = f"unique document number {i} body content here"
        dom = "hot.com" if i % 2 == 0 else f"d{i}.com"
        rows.append((i, text, dom))
    return spark.createDataFrame(rows, "doc_id long, text string, domain string")


def test_funnel_stages_and_survivors(spark):
    df = _docs(spark)
    rep = WebCurationReport()
    out = curate_web(
        df, blocked_terms=["vileword"], domain_cap=5, report=rep,
    )
    survivors = {r["doc_id"] for r in out.collect()}
    # stage drops: %10==0 (synthetic), %10==1 (blocked), %10 in (2,3)
    # (saturated); remaining 36 docs, 18 on hot.com capped at 5
    assert rep.counts["input"] == 60
    assert rep.counts["synthetic_text"] == 54
    assert rep.counts["blocked_terms"] == 48
    assert rep.counts["saturation"] == 36
    assert rep.counts["domain_cap"] == 36 - 18 + 5
    assert len(survivors) == 23
    # the capped hot.com subset is the md5-rank bottom-5 of its
    # stage-3 survivors
    hot = [i for i in range(60)
           if i % 2 == 0 and i % 10 not in (0, 1, 2, 3)]
    expect_hot = set(sorted(
        hot, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:5])
    assert {i for i in survivors if i % 2 == 0} == expect_hot


def test_saturation_is_corpus_relative_to_survivors(spark):
    # two identical docs, but one is ALSO synthetic -> dropped at
    # stage 1, so its twin is no longer corpus-common at stage 3
    rows = [
        (1, SHARED + " As an AI language model, bye.", "a.com"),
        (2, SHARED, "b.com"),
        (3, "something else entirely for padding", "c.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, domain string")
    out = curate_web(df, blocked_terms=["vileword"], domain_cap=10)
    assert {r["doc_id"] for r in out.collect()} == {2, 3}


def test_lazy_plan_without_report(spark):
    df = _docs(spark, 20)
    out = curate_web(df, blocked_terms=["vileword"], domain_cap=5)
    assert out.columns == ["doc_id", "text", "domain"]
    assert out.count() > 0
