from __future__ import annotations

import hashlib
import random
import re

import pytest

from schema_validator_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)


def _ref_fps(text, k, w):
    """Reference winnowing (leftmost-min tie-break), same md5 hashing."""
    norm = re.sub(r"\s+", "", (text or "").lower())
    if len(norm) < k:
        return set()
    gh = [
        int(hashlib.md5(norm[i:i + k].encode()).hexdigest()[:12], 16)
        for i in range(len(norm) - k + 1)
    ]
    picks = set()
    for j in range(max(len(gh) - w + 1, 1)):
        win = gh[j:j + w]
        m = min(win)
        picks.add((j + win.index(m) + 1, m))
    return picks


@pytest.mark.parametrize("k,w", [(4, 3), (7, 8)])
def test_fingerprints_match_reference(spark, k, w):
    rng = random.Random(11)
    rows = [(i, " ".join(
        "".join(rng.choice("abcdef") for _ in range(rng.randrange(2, 9)))
        for _ in range(rng.randrange(1, 12))
    )) for i in range(40)]
    rows += [(100, "ab"), (101, ""), (102, None), (103, "AB cd EF")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "id", "text", k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    want = {i: _ref_fps(t, k, w) for i, t in rows}
    want = {i: s for i, s in want.items() if s}
    assert got == want


def test_long_common_substring_guarantee(spark):
    # any shared normalized substring of length >= w + k - 1 must yield
    # a shared fingerprint, however different the rest of the docs are
    rng = random.Random(3)
    k, w = 5, 4
    t = w + k - 1  # 8
    common = "zqxjvwpk"  # length exactly t, rare chars
    assert len(common) == t
    rows = []
    for i in range(30):
        a = "".join(rng.choice("abc") for _ in range(rng.randrange(10, 40)))
        b = "".join(rng.choice("def") for _ in range(rng.randrange(10, 40)))
        rows.append((2 * i, a + common + "".join(rng.choice("abc") for _ in range(5))))
        rows.append((2 * i + 1, b + common))
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_pairs(df, "id", "text", k=k, window=w).collect()
    }
    for i in range(30):
        assert (2 * i, 2 * i + 1) in pairs, f"planted pair {i} missed"


def test_whitespace_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "The Quick Brown Fox"), (2, "thequick\nbrownfox")],
        "id long, text string",
    )
    got = winnow_pairs(df, "id", "text", k=5, window=4).collect()
    assert len(got) == 1
    a = {(r["pos"], r["fp"]) for r in
         winnow_fingerprints(df.filter("id=1"), "id", "text", k=5, window=4).collect()}
    b = {(r["pos"], r["fp"]) for r in
         winnow_fingerprints(df.filter("id=2"), "id", "text", k=5, window=4).collect()}
    assert a == b  # identical after normalization


def test_hot_fingerprint_cap_logs(spark, caplog):
    rows = [(i, f"prefix{i} sharedboilerplateblock") for i in range(12)]
    df = spark.createDataFrame(rows, "id long, text string")
    with caplog.at_level("WARNING"):
        got = winnow_pairs(
            df, "id", "text", k=5, window=4, max_bucket_size=3
        ).collect()
    assert any("winnow_pairs" in r.message for r in caplog.records)
    full = winnow_pairs(df, "id", "text", k=5, window=4).collect()
    assert len(got) < len(full)


def test_validation(spark):
    df = spark.createDataFrame([(1, "abcdef")], "id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, "id", "text", k=1)
    with pytest.raises(ValueError):
        winnow_pairs(df, "id", "text", min_shared=0)
