"""BPE merge-table application (functions/text.py bpe_segment & friends).

The load-bearing claim: rank-ordered single-pass `replace` application
equals the priority-queue BPE encoder for training-order-consistent merge
tables.  `ref_bpe_priority` below IS that encoder (merge the lowest-rank
pair present anywhere in the word, all occurrences left-to-right, repeat);
the tests drive both over adversarial and random words.
"""
from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schema_validator_spark.functions import text as X

MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "r"), ("a", "t"), ("e", "n"), ("o", "r"), ("an", "d"),
    ("in", "g"), ("e", "s"), ("t", "o"), ("o", "u"), ("ou", "r"),
]


def ref_bpe_priority(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Classic BPE encode: repeatedly merge the lowest-rank pair present,
    all non-overlapping occurrences left-to-right, until none applies."""
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best = min(
            (ranks[p] for p in zip(syms, syms[1:]) if p in ranks),
            default=None,
        )
        if best is None:
            break
        a, b = merges[best]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def spark_segment(spark, words: list[str], merges) -> dict[str, list[str]]:
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select(
        "w", X.bpe_segment(F.col("w"), merges).alias("seg"),
        X.bpe_word_token_count(F.col("w"), merges).alias("n"),
    ).collect()
    out = {}
    for r in rows:
        toks = [t for t in r["seg"].split(X.BPE_SEP) if t != ""]
        assert len(toks) == r["n"], (r["w"], toks, r["n"])
        out[r["w"]] = toks
    return out


ADVERSARIAL = [
    "the", "there", "thethe", "and", "standing", "ingesting",
    "aaa", "ttt", "ththth", "ananan", "x", "tho", "our", "tour",
    "thorn", "north", "ingratitude", "outstanding", "rendering",
]


def test_segment_matches_priority_encoder(spark):
    got = spark_segment(spark, ADVERSARIAL, MERGES)
    for w in ADVERSARIAL:
        assert got[w] == ref_bpe_priority(w, MERGES), w
        assert "".join(got[w]) == w, w  # lossless segmentation


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.text(alphabet="theinaordgsu", min_size=1, max_size=14),
    min_size=1, max_size=25, unique=True,
))
def test_segment_matches_priority_encoder_random(spark, words):
    got = spark_segment(spark, words, MERGES)
    for w in words:
        assert got[w] == ref_bpe_priority(w, MERGES), w


def test_sep_char_stripped_from_input(spark):
    # Delimiter bytes inside a word are stripped before segmentation
    # (documented; the DuckDB oracle does the same).
    got = spark_segment(spark, ["th" + X.BPE_SEP + "e", X.BPE_SEP], MERGES)
    assert got["th" + X.BPE_SEP + "e"] == ["the"]
    assert got[X.BPE_SEP] == []


def test_validate_rejects_inconsistent_table():
    with pytest.raises(ValueError, match="neither a base character"):
        X.validate_bpe_merges([("ab", "c")])
    X.validate_bpe_merges(MERGES)  # must not raise


def test_bpe_token_counts_per_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "the north wind and the sun"),
            (2, "outstanding   rendering"),
            (3, "   "),  # zero words -> absent from output
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in X.bpe_token_counts(docs, "doc_id", "text", MERGES).collect()
    }
    def n(w):
        return len(ref_bpe_priority(w, MERGES))
    assert rows == {
        1: n("the") * 2 + n("north") + n("wind") + n("and") + n("sun"),
        2: n("outstanding") + n("rendering"),
    }


def test_tokenizer_fertility_per_lang(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "the north wind"),
            (2, "en", "and the sun"),
            (3, "de", "außerordentlich"),   # multibyte: bytes > chars
            (4, "de", "   "),               # whitespace-only
            (5, None, None),                # NULL lang groups as ''
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["lang"]: r
        for r in X.tokenizer_fertility(docs, "lang", "text", MERGES).collect()
    }
    assert set(out) == {"en", "de", ""}

    def n(w):
        return len(ref_bpe_priority(w, MERGES))

    en = out["en"]
    en_tok = n("the") * 2 + n("north") + n("wind") + n("and") + n("sun")
    assert (en["n_docs"], en["n_words"], en["n_bpe_tokens"]) == (2, 6, en_tok)
    assert en["fertility"] == pytest.approx(en_tok / 6)
    assert en["n_bytes"] == en["n_chars"] == len("the north wind") + len(
        "and the sun"
    )
    assert en["bytes_per_token"] == pytest.approx(en["n_bytes"] / en_tok)

    de = out["de"]
    assert de["n_docs"] == 2
    assert de["n_bytes"] > de["n_chars"]  # 'ß' is 2 UTF-8 bytes
    assert de["n_words"] == 1

    empty = out[""]
    assert (empty["n_docs"], empty["n_words"], empty["n_bpe_tokens"]) == (1, 0, 0)
    assert empty["fertility"] is None and empty["bytes_per_token"] is None
