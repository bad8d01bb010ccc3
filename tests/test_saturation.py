from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.saturation import (
    filter_saturated,
    gram_doc_frequency,
    ngram_saturation,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens -> 4 5-grams


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_saturates(spark):
    # docs 1-3 share the same text entirely; doc 4 is unique
    rows = [(1, SHARED), (2, SHARED), (3, SHARED),
            (4, "one two three four five six seven eight")]
    got = {r["doc_id"]: r for r in
           ngram_saturation(_df(spark, rows), "doc_id", "text").collect()}
    for i in (1, 2, 3):
        assert got[i]["n_grams"] == 4
        assert got[i]["n_common"] == 4
        assert got[i]["saturation"] == 1.0
    assert got[4]["n_common"] == 0 and got[4]["saturation"] == 0.0


def test_partial_overlap_fraction(spark):
    # doc 1 = shared(8 tokens) + unique tail(5 tokens): 13 tokens -> 9 grams,
    # of which the 4 fully-inside-SHARED grams are shared with doc 2
    rows = [(1, SHARED + " uniq1 uniq2 uniq3 uniq4 uniq5"), (2, SHARED)]
    got = {r["doc_id"]: r for r in
           ngram_saturation(_df(spark, rows), "doc_id", "text").collect()}
    assert got[1]["n_grams"] == 9
    assert got[1]["n_common"] == 4
    assert got[1]["saturation"] == pytest.approx(4 / 9, abs=1e-6)
    assert got[2]["saturation"] == 1.0


def test_short_and_empty_docs_do_not_vanish(spark):
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, ""), (4, None), (5, "solo")]
    got = {r["doc_id"]: r for r in
           ngram_saturation(_df(spark, rows), "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # short docs shingle to ONE gram of all tokens; empties share ''
    assert got[1]["n_grams"] == 1 and got[1]["n_common"] == 1
    assert got[3]["n_common"] == 1 and got[4]["n_common"] == 1  # '' shared
    assert got[5]["n_common"] == 0


def test_min_df_threshold(spark):
    rows = [(i, SHARED) for i in range(3)] + [(9, "a b c d e f g h")]
    high = ngram_saturation(_df(spark, rows), "doc_id", "text", min_df=4)
    assert all(r["n_common"] == 0 for r in high.collect())


def test_doc_frequency_frame(spark):
    rows = [(1, SHARED), (2, SHARED), (3, "other text entirely here now")]
    freq = {r["_g"]: r["doc_freq"]
            for r in gram_doc_frequency(_df(spark, rows), "text").collect()}
    assert freq["alpha beta gamma delta epsilon"] == 2
    assert freq["other text entirely here now"] == 1


def test_filter_form_drops_only_above_threshold(spark):
    rows = [(1, SHARED), (2, SHARED),
            (3, SHARED + " uniq1 uniq2 uniq3 uniq4 uniq5")]
    kept = filter_saturated(_df(spark, rows), "doc_id", "text",
                            max_saturation=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {3}  # 4/9 <= 0.5
    kept_all = filter_saturated(_df(spark, rows), "doc_id", "text",
                                max_saturation=1.0)
    assert kept_all.count() == 3  # strict >: saturation 1.0 survives 1.0


def test_guards(spark):
    df = _df(spark, [(1, "x")])
    with pytest.raises(ValueError, match="min_df"):
        ngram_saturation(df, "doc_id", "text", min_df=0)
    with pytest.raises(ValueError, match="reserved"):
        ngram_saturation(df.withColumnRenamed("text", "_g"), "doc_id", "_g")
