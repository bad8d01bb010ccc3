from __future__ import annotations

import pytest

from schema_validator_spark.functions.synthtext import (
    filter_synthetic_text,
    synthetic_text_stats,
)

HUMAN = ("Short one. Then a much longer rambling sentence full of odd "
         "detail and digression! Tiny. Another moderately sized line "
         "appears here. Why? Because real text is bursty.")
SLOPPY = ("We delve into the vibrant tapestry of results. "
          "We delve into the vibrant tapestry of results. "
          "We delve into the vibrant tapestry of results. "
          "We delve into the vibrant tapestry of results. "
          "We delve into the vibrant tapestry of results. "
          "We delve into the vibrant tapestry of results.")


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in
            synthetic_text_stats(df, ["doc_id"], "text").collect()}


def test_phrase_tier_flags_any_hit(spark):
    got = _stats(spark, [
        (1, "blah blah As an AI language model I cannot do that."),
        (2, "this mentions Regenerate response twice: regenerate response"),
        (3, HUMAN),
    ])
    assert got[1]["phrase_hits"] == 1 and got[1]["ai_flag"] == 1
    # per-phrase presence, not occurrence count
    assert got[2]["phrase_hits"] == 1 and got[2]["ai_flag"] == 1
    assert got[3]["phrase_hits"] == 0 and got[3]["ai_flag"] == 0


def test_statistical_tier_needs_all_three_conditions(spark):
    got = _stats(spark, [
        (1, SLOPPY),                       # uniform + sloppy -> flagged
        (2, HUMAN),                        # bursty, no slop -> clean
        (3, "We delve into vibrant realms."),  # sloppy but 1 sentence
    ])
    assert got[1]["ai_flag"] == 1 and got[1]["phrase_hits"] == 0
    assert got[1]["sent_len_cv"] == 0.0
    assert got[1]["slop_per_1k"] > 15.0
    assert got[2]["ai_flag"] == 0
    assert got[3]["ai_flag"] == 0 and got[3]["n_sents"] == 1


def test_edge_punctuation_and_substrings(spark):
    got = _stats(spark, [
        (1, "One delve, two (tapestry). A delver underscores_ nothing? "
            "Padding sentence here. More padding text follows now. "
            "Final bit arrives.")])
    # 'delve,' and '(tapestry).' match after edge strip; 'delver' and
    # 'underscores_' do: delver is a DIFFERENT token (no match),
    # 'underscores_' strips the trailing underscore and matches
    assert got[1]["slop_hits"] == 3


def test_null_and_empty_text(spark):
    got = _stats(spark, [(1, None), (2, ""), (3, "   ")])
    for r in got.values():
        assert r["n_tokens"] == 0 and r["n_sents"] == 0
        assert r["ai_flag"] == 0
        assert r["slop_per_1k"] == 0.0 and r["sent_len_cv"] == 0.0


def test_cv_matches_hand_computation(spark):
    # sentences of byte lengths 3, 5, 10 -> mean 6, var 8.666..
    got = _stats(spark, [(1, "abc. abcde! abcdefghij?")])
    r = got[1]
    assert r["n_sents"] == 3
    mean = (3 + 5 + 10) / 3
    var = (9 + 25 + 100) / 3 - mean * mean
    assert r["sent_len_cv"] == pytest.approx(var ** 0.5 / mean, abs=1e-12)


def test_filter_form_matches_stats(spark):
    rows = [(i, SLOPPY if i % 3 == 0 else HUMAN) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = filter_synthetic_text(df, "text")
    assert kept.columns == df.columns
    assert {r["doc_id"] for r in kept.collect()} == \
        {i for i in range(30) if i % 3 != 0}


def test_guards(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        synthetic_text_stats(df, ["doc_id"], "text", slop_terms=[])
    with pytest.raises(ValueError, match="min_sentences"):
        synthetic_text_stats(df, ["doc_id"], "text", min_sentences=1)
    bad = df.withColumnRenamed("doc_id", "_toks")
    with pytest.raises(ValueError, match="reserved"):
        synthetic_text_stats(bad, ["_toks"], "text")
    bad2 = df.withColumnRenamed("doc_id", "ai_flag")
    with pytest.raises(ValueError, match="collide"):
        synthetic_text_stats(bad2, ["ai_flag"], "text")


def test_readability_hand_computed(spark):
    from schema_validator_spark.functions.synthtext import (
        readability_stats,
    )

    # "the cat sat. it ran away fast." -> W=7, S=2, Y: the(1) cat(1)
    # sat(1) it(1) ran(1) away(2: a, ay) fast(1) = 8
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran away fast."), (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           readability_stats(df, ["doc_id"], "text").collect()}
    r = got[1]
    assert (r["n_words"], r["n_sents"], r["n_syllables"]) == (7, 2, 8)
    ws, yw = 7 / 2, 8 / 7
    assert r["flesch"] == pytest.approx(206.835 - 1.015 * ws - 84.6 * yw,
                                        abs=1e-9)
    assert r["fk_grade"] == pytest.approx(0.39 * ws + 11.8 * yw - 15.59,
                                          abs=1e-9)
    for i in (2, 3):
        assert got[i]["flesch"] == 0.0 and got[i]["n_words"] == 0


def test_readability_guards(spark):
    from schema_validator_spark.functions.synthtext import (
        readability_stats,
    )

    df = spark.createDataFrame([(1, "x")], "flesch long, text string")
    with pytest.raises(ValueError, match="collide"):
        readability_stats(df, ["flesch"], "text")
