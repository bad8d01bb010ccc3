from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.engine import ValidationEngine
from schema_validator_spark.operators.suggest import (
    profile_columns,
    suggest_constraints,
    suggestions_df,
)


@pytest.fixture()
def sample(spark):
    rows = [
        (1, "alice", "GOLD", 10.5, None),
        (2, "bob", "SILVER", -3.25, "x"),
        (3, "caroline", "GOLD", 99.0, "y"),
        (4, "dee", "BRONZE", 0.0, None),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, tier string, bal double, note string"
    )


def _rules(spec, col):
    return {(r.name, r.params) for r in spec.get(col, [])}


def test_suggest_rules(sample):
    spec = suggest_constraints(sample)
    assert _rules(spec, "id") == {
        ("required", ()), ("unique", ()), ("min", ("1",)), ("max", ("4",)),
    }
    assert _rules(spec, "tier") == {
        ("required", ()), ("oneof", ("BRONZE", "GOLD", "SILVER")),
        ("min", ("4",)), ("max", ("6",)),
    }
    # bal holds a 0.0 — the reference's `required` fails on zero values,
    # so the suggester must NOT claim it; omitempty guards the bounds
    assert _rules(spec, "bal") == {
        ("omitempty", ()), ("unique", ()),
        ("min", ("-3.25",)), ("max", ("99.0",)),
    }
    # nullable column: no required; omitempty; unique over non-nulls
    assert ("required", ()) not in _rules(spec, "note")
    assert ("omitempty", ()) in _rules(spec, "note")
    assert ("unique", ()) in _rules(spec, "note")
    # name is unique but also length-bounded
    assert ("min", ("3",)) in _rules(spec, "name")
    assert ("max", ("8",)) in _rules(spec, "name")


def test_roundtrip_zero_violations(sample):
    """The Deequ promise: the suggested spec validates its own table
    clean — with REAL rule semantics (parity_stubs off), not the
    reference's always-pass `unique` stub: row rules through the engine,
    `unique` suggestions through the table-level uniqueness operator."""
    from schema_validator_spark.operators.suggest import split_row_and_table
    from schema_validator_spark.operators.uniqueness import duplicate_keys
    from schema_validator_spark.registry import default_registry

    row_spec, unique_cols = split_row_and_table(suggest_constraints(sample))
    assert "id" in unique_cols and "bal" in unique_cols
    eng = ValidationEngine(
        row_spec, key_cols=["id"],
        registry=default_registry(parity_stubs=False),
        allow_driver_only=True,
    )
    assert eng.run(sample).violations.count() == 0
    for c in unique_cols:
        assert duplicate_keys(sample.filter(F.col(c).isNotNull()), [c]).count() == 0


def test_roundtrip_catches_new_bad_rows(spark, sample):
    from schema_validator_spark.registry import default_registry

    from schema_validator_spark.operators.suggest import split_row_and_table

    row_spec, _ = split_row_and_table(suggest_constraints(sample))
    bad = spark.createDataFrame(
        [(5, "zz", "PLATINUM", 1000.0, None)],
        "id long, name string, tier string, bal double, note string",
    )
    eng = ValidationEngine(
        row_spec, key_cols=["id"],
        registry=default_registry(parity_stubs=False),
        allow_driver_only=True,
    )
    codes = {
        (r["field"], r["code"])
        for r in eng.run(sample.unionByName(bad)).violations.collect()
    }
    assert ("tier", "oneof") in codes
    assert ("bal", "max") in codes


def test_enum_max_boundary(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 4}") for i in range(20)], "id long, c string"
    )
    assert ("oneof", ("v0", "v1", "v2", "v3")) in _rules(
        suggest_constraints(df, enum_max=4), "c"
    )
    assert not any(
        r.name == "oneof" for r in suggest_constraints(df, enum_max=3)["c"]
    )


def test_approx_mode_skips_unprovable(sample):
    spec = suggest_constraints(sample, approx=True)
    for c in ("id", "tier"):
        names = {r.name for r in spec.get(c, [])}
        assert "unique" not in names and "oneof" not in names
    assert ("required", ()) in _rules(spec, "id")
    prof = profile_columns(sample, approx=True)
    assert prof["id"]["distinct"] > 0  # HLL estimate present


def test_suggestions_df_matches_spec(sample):
    rows = {
        (r["column"], r["rule"], r["param"], r["num_param"])
        for r in suggestions_df(sample).collect()
    }
    assert ("id", "required", "", None) in rows
    assert ("tier", "oneof", "BRONZE|GOLD|SILVER", None) in rows
    assert ("bal", "min", "", -3.25) in rows
    assert ("bal", "omitempty", "", None) in rows
    assert ("name", "max", "", 8.0) in rows
