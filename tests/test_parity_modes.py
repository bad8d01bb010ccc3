"""parity_stubs flag: reference-parity stubs vs engine-mode real checks
(SURVEY.md risk register, 'Intentional stubs')."""

from __future__ import annotations

import pytest

from schema_validator_spark import ValidationEngine, default_registry
from schema_validator_spark.errors import CompileError


def _codes(spark, reg, spec, rows, schema):
    df = spark.createDataFrame(rows, schema)
    eng = ValidationEngine(spec, key_cols=["id"], registry=reg)
    return {(r["id"], r["code"]) for r in eng.run(df).violations.collect()}


V4 = "016b1a9c-0000-4000-8000-000000000000"  # version digit '4'


def test_uuid_rfc4122_stub_vs_real(spark):
    rows = [(1, V4), (2, "garbage")]
    schema = "id long, u string"
    # parity: uuid4_rfc4122 always passes (format.go:478-480)
    assert _codes(spark, default_registry(), {"u": "uuid4_rfc4122"}, rows, schema) == set()
    # engine mode: real check
    got = _codes(
        spark, default_registry(parity_stubs=False),
        {"u": "uuid4_rfc4122"}, rows, schema,
    )
    assert got == {(2, "uuid4_rfc4122")}
    # and version digit matters: a v4 uuid fails uuid3_rfc4122
    got3 = _codes(
        spark, default_registry(parity_stubs=False),
        {"u": "uuid3_rfc4122"}, rows, schema,
    )
    assert (1, "uuid3_rfc4122") in got3


def test_postcode_field_stub_vs_real(spark):
    rows = [(1, "x")]  # too short for any postcode
    schema = "id long, pc string"
    assert _codes(spark, default_registry(),
                  {"pc": "postcode_iso3166_alpha2_field=country"},
                  rows, schema) == set()
    got = _codes(spark, default_registry(parity_stubs=False),
                 {"pc": "postcode_iso3166_alpha2_field=country"}, rows, schema)
    assert got == {(1, "postcode_iso3166_alpha2_field")}


def test_unique_stub_vs_engine_refusal(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], "id long, v string")
    # parity: the reference 'just passes' (other.go:311-316)
    eng = ValidationEngine({"v": "unique"}, key_cols=["id"])
    assert eng.run(df).violations.count() == 0
    # engine mode: compile-time refusal pointing at the table-level op
    eng2 = ValidationEngine(
        {"v": "unique"}, key_cols=["id"],
        registry=default_registry(parity_stubs=False),
    )
    with pytest.raises(CompileError, match="table-level"):
        eng2.run(df)
