from __future__ import annotations

import random

import pytest

from schema_validator_spark.operators.setsim import setsim_join_exact


def _brute(rows, t):
    sets = {i: set(s.split()) for i, s in rows if s.split()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            j = round(inter / len(sets[a] | sets[b]), 6)
            if j >= t:
                out[(a, b)] = j
    return out


@pytest.mark.parametrize("t", [0.5, 0.8, 1.0])
def test_matches_brute_force(spark, t):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(80):
        k = rng.randrange(3, 12)
        rows.append((i, " ".join(rng.sample(vocab, k))))
    # plant near-duplicate clusters
    for i in range(80, 95):
        base = rows[i - 80][1].split()
        mutated = base[:-1] + [rng.choice(vocab)]
        rows.append((i, " ".join(mutated)))
    rows.append((99, "   "))  # whitespace-only doc excluded
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in setsim_join_exact(df, "id", "text", threshold=t).collect()
    }
    assert got == _brute(rows, t)


def test_shared_frequent_tokens_do_not_explode_or_match(spark):
    # every doc shares 'the' and 'a'; only the planted pair is similar
    rows = [(i, f"the a u{i} v{i} w{i} x{i}") for i in range(50)]
    rows.append((100, rows[0][1]))
    df = spark.createDataFrame(rows, "id long, text string")
    got = setsim_join_exact(df, "id", "text", threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"])
            for r in got] == [(0, 100, 1.0)]


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError):
        setsim_join_exact(df, "id", "text", threshold=0.0)
