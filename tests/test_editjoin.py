from __future__ import annotations

import random

import pytest

from schema_validator_spark.operators.editjoin import edit_join_exact


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = {}
    keep = [(i, s) for i, s in rows if s]
    for x, (ia, sa) in enumerate(keep):
        for ib, sb in keep[x + 1:]:
            lo, hi = min(ia, ib), max(ia, ib)
            dist = _lev(sa, sb)
            if dist <= d:
                out[(lo, hi)] = dist
    return out


def _mutate(rng, s):
    ops = rng.choice(["sub", "del", "ins"])
    pos = rng.randrange(len(s))
    ch = rng.choice("abcdez")
    if ops == "sub":
        return s[:pos] + ch + s[pos + 1:]
    if ops == "del":
        return s[:pos] + s[pos + 1:]
    return s[:pos] + ch + s[pos:]


@pytest.mark.parametrize("d", [1, 2])
def test_matches_brute_force(spark, d):
    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((i, "".join(rng.choice("abcdef") for _ in range(rng.randrange(4, 12)))))
    # planted typo clusters (1 and 2 edits away)
    for i in range(60, 90):
        base = rows[i - 60][1]
        m = _mutate(rng, base)
        if i % 2:
            m = _mutate(rng, m)
        rows.append((i, m))
    rows.append((98, ""))       # empty excluded
    rows.append((99, None))     # null excluded
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_join_exact(df, "id", "s", max_dist=d).collect()
    }
    assert got == _brute([(i, s) for i, s in rows if s], d)


def test_exact_duplicates_have_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello"), (3, "help")], "id long, s string"
    )
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_join_exact(df, "id", "s", max_dist=2).collect()}
    assert got == {(1, 2): 0, (1, 3): 2, (2, 3): 2}


def test_hot_bucket_cap_drops_and_logs(spark, caplog):
    # 40 single-char strings all produce variant "" — one degenerate bucket
    rows = [(i, ch) for i, ch in enumerate("ab" * 20)]
    df = spark.createDataFrame(rows, "id long, s string")
    with caplog.at_level("WARNING"):
        got = edit_join_exact(
            df, "id", "s", max_dist=1, max_bucket_size=5
        ).collect()
    # the "" bucket (40 rows) was dropped; 'a'/'b' buckets (20 rows) too —
    # with the cap nothing survives, and the drop is logged, not silent
    assert got == []
    assert any("edit_join_exact" in r.message for r in caplog.records)


def test_max_dist_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError):
        edit_join_exact(df, "id", "s", max_dist=3)
