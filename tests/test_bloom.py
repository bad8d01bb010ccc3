from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.bloom import (
    bloom_bitmap,
    bloom_referential_violations,
)
from schema_validator_spark.operators.referential import referential_violations
from schema_validator_spark.plans import inspect


@pytest.fixture()
def tables(spark):
    rng = random.Random(7)
    dim = spark.createDataFrame(
        [(k, f"name-{k}") for k in range(0, 200, 2)], "pk long, name string"
    )
    fact = spark.createDataFrame(
        [(i, rng.randrange(0, 220)) for i in range(1000)]
        + [(9999, None)],
        "id long, fk long",
    )
    return fact, dim


def _sorted_rows(df):
    # normalize column order (the two plans emit different orders) and
    # sort None-safely
    rows = [tuple(r) for r in df.select(*sorted(df.columns)).collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def test_no_false_negatives_even_at_tiny_m(spark, tables):
    # probing the dim against its own Bloom can never miss: with the
    # degenerate 64-bit filter every key still tests positive.
    _, dim = tables
    probe = dim.select(F.col("pk").alias("fk"))
    out = bloom_referential_violations(
        probe, ["fk"], dim, ["pk"], num_bits=64, num_hashes=3
    )
    assert out.count() == 0


@pytest.mark.parametrize("num_bits,num_hashes", [(64, 3), (4096, 5)])
def test_exact_vs_left_anti(spark, tables, num_bits, num_hashes):
    # num_bits=64 forces massive false positives -> everything funnels
    # through the verify join; num_bits=4096 is a realistic filter.
    # Both must equal the plain left_anti byte-for-byte.
    fact, dim = tables
    got = bloom_referential_violations(
        fact, ["fk"], dim, ["pk"], num_bits=num_bits, num_hashes=num_hashes
    )
    want = referential_violations(fact, ["fk"], dim, ["pk"])
    assert _sorted_rows(got) == _sorted_rows(want)


def test_null_fk_rows_are_orphans(spark, tables):
    fact, dim = tables
    out = bloom_referential_violations(
        fact, ["fk"], dim, ["pk"], num_bits=1024, num_hashes=4
    )
    assert [r["id"] for r in out.filter(F.col("fk").isNull()).collect()] == [9999]


def test_multicol_keys(spark):
    dim = spark.createDataFrame(
        [(a, b) for a in range(10) for b in ("x", "y")], "a long, b string"
    )
    fact = spark.createDataFrame(
        [(1, 3, "x"), (2, 3, "z"), (3, 11, "x"), (4, None, "x")],
        "id long, ka long, kb string",
    )
    got = bloom_referential_violations(
        fact, ["ka", "kb"], dim, ["a", "b"], num_bits=512, num_hashes=4
    )
    want = referential_violations(fact, ["ka", "kb"], dim, ["a", "b"])
    assert _sorted_rows(got) == _sorted_rows(want)
    assert {r["id"] for r in got.collect()} == {2, 3, 4}


def test_mismatched_int_widths_hash_identically(spark):
    # xxhash64 is type-sensitive: int 7 and bigint 7 hash differently.
    # With fact FK = int and dim PK = bigint, every matched row used to
    # come out Bloom-NEGATIVE (a "definite orphan" that skips the verify
    # join).  The aligned-cast fix must make this byte-equal to the
    # plain anti-join (which type-coerces the equi-keys).
    dim = spark.createDataFrame(
        [(k, f"name-{k}") for k in range(0, 20, 2)], "pk long, name string"
    )
    fact = spark.createDataFrame(
        [(i, i % 22) for i in range(100)], "id long, fk int"
    )
    assert dict(fact.dtypes)["fk"] != dict(dim.dtypes)["pk"]
    got = bloom_referential_violations(
        fact, ["fk"], dim, ["pk"], num_bits=4096, num_hashes=5
    )
    want = referential_violations(fact, ["fk"], dim, ["pk"])
    assert _sorted_rows(got) == _sorted_rows(want)
    # sanity: matched even-key rows below 20 are NOT reported as orphans
    assert not {r["fk"] for r in got.collect()} & set(range(0, 20, 2))


def test_incompatible_key_dtypes_raise(spark):
    # non-integral mismatch (string fk vs long pk) cannot be silently
    # aligned -- must raise instead of emitting wrong "definite orphans"
    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    fact = spark.createDataFrame([("1",), ("3",)], "fk string")
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom_referential_violations(
            fact, ["fk"], dim, ["pk"], num_bits=512, num_hashes=3
        )


def test_bitmap_shape_and_validation(spark, tables):
    _, dim = tables
    bits = bloom_bitmap(dim, ["pk"], num_bits=256, num_hashes=4)
    assert len(bits) == 4
    assert any(b != 0 for b in bits)
    with pytest.raises(ValueError):
        bloom_bitmap(dim, ["pk"], num_bits=100, num_hashes=4)


def test_probe_path_has_no_fact_shuffle(spark, tables):
    # The classify step (everything up to the verify join) must not
    # shuffle fact rows: the only Exchanges in the full plan belong to
    # the distinct-survivor-keys aggregation and the dim-side anti-join
    # -- and the bitmap rides a broadcast, never a shuffle.
    fact, dim = tables
    out = bloom_referential_violations(
        fact, ["fk"], dim, ["pk"], num_bits=4096, num_hashes=5
    )
    assert not inspect.uses_python(out)
    # distinct (2 sides of the exchange pair under AQE counts once in
    # the executed plan) + anti join dim side; fact rows only feed
    # map-side-combined distinct, never a row-preserving shuffle.
    assert inspect.n_exchanges(out) <= 3
    kinds = inspect.join_kinds(out)
    # bitmap = 1-row broadcast nested loop (x2: definite + survivor
    # branches); the distinct-keys anti-join may sort-merge -- that is
    # the point: only DISTINCT keys reach it, never fact rows.  No
    # cartesian anywhere.
    assert "CartesianProduct" not in kinds
    assert kinds.count("BroadcastNestedLoopJoin") == 2
