"""End-to-end engine scenarios — the reference's tier-2 tests
(validator_test.go) re-expressed over DataFrames, per FIXTURES.md F2-F8."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import CompileError, ValidationEngine


def _viol_set(res, key):
    return {
        (r[key], r["field"], r["code"])
        for r in res.violations.collect()
    }


def test_users_scenario(spark):
    """F2 — tag-based User (validator_test.go:12-121)."""
    rows = [
        # uid, gender, email, password, confirm, age, created_at
        (1, "male", "a@example.com", "longenough", "longenough", 30,
         datetime.datetime(2023, 1, 1)),
        (2, "male", "a@example.com", "longenough", "different", 30,
         datetime.datetime(2023, 1, 1)),          # confirm != password (:43-49)
        (3, "male", "", "longenough", "longenough", 30,
         datetime.datetime(2023, 1, 1)),          # empty email (:70-76)
        (4, "male", "a@example.com", "longenough", "longenough", 30,
         None),                                   # zero created_at (:95-102)
        (5, "alien", "a@example.com", "short", "short", 12,
         datetime.datetime(2023, 1, 1)),          # oneof + min(len) + min(age)
    ]
    df = spark.createDataFrame(
        rows,
        "uid int, gender string, email string, password string, "
        "confirm string, age int, created_at timestamp",
    )
    eng = ValidationEngine(
        {
            "gender": "oneof=male,female,other",
            "email": "required|email",
            "password": "required|min=8",
            "confirm": "required|eqfield=password",
            "age": "min=18|max=120",
            "created_at": "required",
        },
        key_cols=["uid"],
    )
    got = _viol_set(eng.run(df), "uid")
    assert got == {
        (2, "confirm", "eqfield"),
        (3, "email", "required"),
        (3, "email", "email"),
        (4, "created_at", "required"),
        (5, "gender", "oneof"),
        (5, "password", "min"),
        (5, "age", "min"),
    }


def test_array_dive_scenario(spark):
    """F5 — array size bounds + dive element rules (validator_test.go:231-272,
    parser.go:129-154); violation paths items.[i] (context.go:25-43)."""
    df = spark.createDataFrame(
        [(1, ["abc", "de", "fghi"]), (2, []), (3, ["xyz"])],
        "uid int, items array<string>",
    )
    eng = ValidationEngine({"items": "min=1|max=10|dive|min=3"}, key_cols=["uid"])
    got = _viol_set(eng.run(df), "uid")
    assert got == {
        (1, "items.[1]", "min"),   # "de" shorter than 3 bytes
        (2, "items", "min"),       # empty array fails size >= 1
    }


def test_conditional_constraints(spark):
    """F6 — SchemaModifier truth table as pure conditional constraints
    (validator_test.go:384-431)."""
    df = spark.createDataFrame(
        [
            (1, "t", "", True),    # required=true, empty value → violation
            (2, "t", "", False),   # required=false, empty → pass
            (3, "t", "set", True), # required=true, set → pass
        ],
        "uid int, type string, value string, required boolean",
    )
    eng = ValidationEngine(
        {"type": "required", "value": "required_if=required,true"},
        key_cols=["uid"],
    )
    got = _viol_set(eng.run(df), "uid")
    assert got == {(1, "value", "required_if")}


def test_zero_value_semantics(spark):
    """F8 — IsNilOrZero oracle (data/value_test.go:139-170): "" and 0 and
    false and null fail `required`; non-zero values pass; empty-but-
    non-null array passes (Go: empty non-nil slice is not nil)."""
    df = spark.createDataFrame(
        [
            (1, "", 0, 0.0, False, None, []),
            (2, "x", 5, 1.5, True, datetime.datetime(2023, 1, 1), [1]),
            (3, None, None, None, None, None, None),
            (4, "y", 1, 0.1, True, datetime.datetime(2023, 1, 1), []),
        ],
        "uid int, s string, i int, f double, b boolean, ts timestamp, arr array<int>",
    )
    spec = {c: "required" for c in ("s", "i", "f", "b", "ts", "arr")}
    eng = ValidationEngine(spec, key_cols=["uid"])
    got = _viol_set(eng.run(df), "uid")
    assert got == {
        (1, "s", "required"), (1, "i", "required"), (1, "f", "required"),
        (1, "b", "required"), (1, "ts", "required"),
        # row 1 arr=[] is non-null → passes (documented Spark semantics)
        (3, "s", "required"), (3, "i", "required"), (3, "f", "required"),
        (3, "b", "required"), (3, "ts", "required"), (3, "arr", "required"),
    }


def test_omitempty_short_circuit(spark):
    """omitempty: zero value skips the rest of the rule list
    (other.go:319-325, consumed at field.go:19-21)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "nothexy")], "uid int, h string"
    )
    eng = ValidationEngine({"h": "omitempty|hexadecimal"}, key_cols=["uid"])
    got = _viol_set(eng.run(df), "uid")
    assert got == {(2, "h", "hexadecimal")}


def test_summary_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "go", "x"), (2, "go", ""), (3, "py", "")],
        "uid int, lang string, content string",
    )
    eng = ValidationEngine(
        {"content": "required"}, key_cols=["uid"], partition_cols=["lang"]
    )
    res = eng.run(df)
    summary = {r["lang"]: r.asDict() for r in res.summary.collect()}
    assert summary["go"]["n_rows"] == 2
    assert summary["go"]["n_rows_failed"] == 1
    assert summary["go"]["pass_rate"] == 0.5
    assert summary["py"]["n_violations"] == 1
    counts = {(r["field"], r["code"]): r["n"] for r in res.violation_counts().collect()}
    assert counts == {("content", "required"): 2}
    assert not res.is_valid()


def test_custom_rule_registration(spark):
    """Custom rule parity with registry_test.go:14-44 (`between`)."""
    from schema_validator_spark import default_registry

    reg = default_registry()

    def between(ctx, params):
        lo, hi = int(params[0]), int(params[1])
        return ctx.col.between(lo, hi)

    reg.register("between", between, min_params=2, max_params=2)
    df = spark.createDataFrame([(1, 5), (2, 99)], "uid int, v int")
    eng = ValidationEngine({"v": "between=1,10"}, key_cols=["uid"], registry=reg)
    got = _viol_set(eng.run(df), "uid")
    assert got == {(2, "v", "between")}


def test_sha256_invariant_derived_column(spark):
    """The per-row invariant from BASELINE.json input_hint: a derived
    sha256(content) column validated with len=64|hexadecimal."""
    df = spark.createDataFrame([(1, "package main")], "uid int, content string")
    eng = ValidationEngine(
        {"content_sha256": "len=64|hexadecimal|lowercase"},
        key_cols=["uid"],
        derived={"content_sha256": F.sha2(F.col("content"), 256)},
    )
    assert eng.run(df).is_valid()


def test_unknown_column_raises(spark):
    df = spark.createDataFrame([(1,)], "uid int")
    with pytest.raises(CompileError):
        ValidationEngine({"nope": "required"}).run(df)


def test_driver_only_rejected_by_default(spark):
    df = spark.createDataFrame([("/tmp",)], "p string")
    with pytest.raises(CompileError):
        ValidationEngine({"p": "dir"}).run(df)
    # allowed explicitly:
    res = ValidationEngine({"p": "dir"}, allow_driver_only=True).run(df)
    assert res.is_valid()
