"""Fluent builder (builder.go analog), nested-struct dotted paths
(accessor chain analog), column profiling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import ValidationEngine
from schema_validator_spark.builder import Array, Field, Object
from schema_validator_spark.errors import CompileError
from schema_validator_spark.operators import profile as PR


# ------------------------------------------------------------------ builder


def test_builder_end_to_end(spark):
    # validator_test.go:124-169: code-built schema on dynamic data
    df = spark.createDataFrame(
        [(1, "a@b.co", 20), (2, "", 16), (3, "not-an-email", 30)],
        "id long, email string, age long",
    )
    eng = (
        Object()
        .with_field("email", Field().required().rule("email"))
        .with_field("age", Field().rule("gte", 18))
        .engine(key_cols=["id"])
    )
    got = {(r["id"], r["field"], r["code"])
           for r in eng.run(df).violations.collect()}
    assert got == {
        (2, "email", "required"), (2, "email", "email"), (2, "age", "gte"),
        (3, "email", "email"),
    }


def test_builder_duplicate_field_merges():
    # mergeSchema: duplicate AddField merges validator lists (object.go:85-93)
    o = (
        Object()
        .with_field("name", Field().required())
        .with_field("name", Field().rule("min", 3))
    )
    assert [r.name for r in o.build()["name"]] == ["required", "min"]


def test_builder_required_optional_toggle():
    f = Field().rule("min", 3).required()
    assert [r.name for r in f.rules()] == ["required", "min"]
    f.optional()
    assert [r.name for r in f.rules()] == ["min"]


def test_builder_array_dive(spark):
    df = spark.createDataFrame([(1, ["abc", "x"])], "id long, tags array<string>")
    eng = (
        Object()
        .with_field("tags", Array().rule("min", 1).dive(Field().rule("min", 2)))
        .engine(key_cols=["id"])
    )
    got = {(r["field"], r["code"]) for r in eng.run(df).violations.collect()}
    assert got == {("tags.[1]", "min")}


def test_builder_field_name_labels(spark):
    # fieldNameMap: display name in violations (object.go:100-103)
    df = spark.createDataFrame([(1, "")], "id long, email string")
    eng = (
        Object()
        .with_field("email", Field().required())
        .field_name("email", "E-Mail")
        .engine(key_cols=["id"])
    )
    rows = eng.run(df).violations.collect()
    assert rows[0]["field"] == "E-Mail"


def test_builder_tag_string_field():
    o = Object().with_field("x", "required|min=3")
    assert [r.name for r in o.build()["x"]] == ["required", "min"]


def test_builder_empty_raises():
    with pytest.raises(CompileError):
        Object().build()


# ------------------------------------------------------------- nested paths


@pytest.fixture(scope="module")
def nested(spark):
    return spark.createDataFrame(
        [
            (1, ("alice", ("a@x.io", 30))),
            (2, ("", ("bad", 200))),
        ],
        "id long, meta struct<author string, contact struct<email string, age long>>",
    )


def test_nested_struct_rules(nested):
    eng = ValidationEngine(
        {
            "meta.author": "required",
            "meta.contact.email": "email",
            "meta.contact.age": "lte=150",
        },
        key_cols=["id"],
    )
    got = {(r["id"], r["field"], r["code"])
           for r in eng.run(nested).violations.collect()}
    assert got == {
        (2, "meta.author", "required"),
        (2, "meta.contact.email", "email"),
        (2, "meta.contact.age", "lte"),
    }


def test_nested_cross_field(spark):
    df = spark.createDataFrame(
        [(1, (5, 10)), (2, (9, 3))],
        "id long, r struct<lo long, hi long>",
    )
    eng = ValidationEngine({"r.lo": "ltefield=r.hi"}, key_cols=["id"])
    got = {(r["id"], r["code"]) for r in eng.run(df).violations.collect()}
    assert got == {(2, "ltefield")}


def test_nested_unknown_path_is_compile_error(nested):
    eng = ValidationEngine({"meta.nope": "required"}, key_cols=["id"])
    with pytest.raises(CompileError):
        eng.run(nested)


# ----------------------------------------------------------------- profile


def test_profile_exact_matches_sql(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = {r["column"]: r for r in PR.profile_exact(docs, ["lang", "n_chars"]).collect()}
    exact = docs.agg(
        F.count(F.lit(1)), F.countDistinct("lang"), F.min("n_chars").cast("string")
    ).first()
    assert prof["lang"]["n_rows"] == exact[0]
    assert prof["lang"]["n_distinct"] == exact[1]
    assert prof["n_chars"]["min"] == exact[2]
    assert prof["lang"]["n_nulls"] == 0


def test_profile_single_job_no_python(spark):
    from schema_validator_spark.plans import inspect as P

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = PR.profile(docs)
    assert not P.uses_python(p)
    assert P.n_exchanges(p) == 1  # the single global aggregate
    rows = {r["column"] for r in p.collect()}
    assert rows == {"doc_id", "text", "lang", "source", "n_chars"}


# ------------------------------------------------------- spec-from-dataclass


from dataclasses import dataclass, field as dfield


@dataclass
class _Contact:
    email: str = dfield(default="", metadata={"validate": "required|email"})
    age: int = dfield(default=0, metadata={"validate": "gte=18"})


@dataclass
class _User:
    name: str = dfield(default="", metadata={"validate": "required|min=2",
                                             "name": "Name"})
    internal: str = dfield(default="", metadata={"validate": "-"})
    contact: _Contact = dfield(default=None)


def test_spec_from_dataclass(spark):
    """Entry point A analog (New(User{}) — validator.go:15-22): dataclass
    metadata tags -> spec, nested dataclass -> dotted paths, '-' skips,
    metadata name -> display label."""
    from schema_validator_spark.spec_from_class import (
        engine_from_dataclass, from_dataclass,
    )

    spec, labels = from_dataclass(_User)
    assert spec == {
        "name": "required|min=2",
        "contact.email": "required|email",
        "contact.age": "gte=18",
    }
    assert labels == {"name": "Name"}

    df = spark.createDataFrame(
        [(1, "al", "x", ("a@b.co", 30)), (2, "z", "x", ("bad", 10))],
        "id long, name string, internal string, "
        "contact struct<email string, age long>",
    )
    eng = engine_from_dataclass(_User, key_cols=["id"])
    got = {(r["id"], r["field"], r["code"])
           for r in eng.run(df).violations.collect()}
    assert got == {
        (2, "Name", "min"),               # display label applied
        (2, "contact.email", "email"),
        (2, "contact.age", "gte"),
    }


def test_spec_from_dataclass_rejects_non_dataclass():
    from schema_validator_spark.spec_from_class import from_dataclass

    with pytest.raises(CompileError):
        from_dataclass(int)
