from __future__ import annotations

import pytest

from schema_validator_spark.functions.publicapi import (
    API_PATTERNS,
    api_surface,
    extract_public_symbols,
)

SCHEMA = "repo string, doc_id int, lang string, content string"

ROWS = [
    ("r1", 1, "py",
     "def public_fn(a):\n    pass\n\ndef _private():\n    pass\n\n"
     "class Thing:\n    def method(self):\n        pass\n"
     "async def fetch():\n    pass\n"),
    ("r1", 2, "go",
     "func Exported() int { return 1 }\n"
     "func internal() int { return 2 }\n"
     "func (r *T) Method() {}\n"
     "type Config struct {}\n"),
    ("r1", 3, "js",
     "export function doIt() {}\nexport default class App {}\n"
     "export const VALUE = 1\nfunction helper() {}\n"),
    ("r2", 4, "java",
     "public final class Widget {}\npublic interface Api {}\n"
     "class PackagePrivate {}\n"),
    ("r2", 5, "cobol", "PROCEDURE DIVISION.\n"),
    ("r2", 6, "py", None),
]


def _syms(spark, rows=ROWS):
    df = spark.createDataFrame(rows, SCHEMA)
    return extract_public_symbols(df, ["repo", "doc_id"], "content",
                                  "lang")


def test_per_lang_visibility_conventions(spark):
    got = sorted((r["doc_id"], r["symbol"])
                 for r in _syms(spark).collect())
    assert got == [
        (1, "Thing"), (1, "fetch"), (1, "public_fn"),
        (2, "Config"), (2, "Exported"), (2, "Method"),
        (3, "App"), (3, "VALUE"), (3, "doIt"),
        (4, "Api"), (4, "Widget"),
    ]
    # _private (underscore), internal (lowercase go), helper
    # (unexported js), PackagePrivate (no public), method (indented py)
    # are all absent


def test_api_surface_rollup(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {(r["repo"], r["lang"]): (r["n_symbols"], r["n_occurrences"])
           for r in api_surface(df, "repo", "content", "lang").collect()}
    assert got[("r1", "py")] == (3, 3)
    assert got[("r1", "go")] == (3, 3)
    assert got[("r2", "java")] == (2, 2)
    assert ("r2", "cobol") not in got
    # duplicate declarations count once in n_symbols, twice in sites
    df2 = spark.createDataFrame(
        [("r", 1, "py", "def f():\n    pass\ndef f():\n    pass\n")],
        SCHEMA,
    )
    got2 = api_surface(df2, "repo", "content", "lang").collect()[0]
    assert (got2["n_symbols"], got2["n_occurrences"]) == (1, 2)


def test_validation_and_zero_shuffle(spark):
    with pytest.raises(ValueError, match="empty API pattern"):
        extract_public_symbols(None, ["r"], "c", "l", patterns={})
    assert API_PATTERNS["ts"] == API_PATTERNS["js"]

    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(ROWS, SCHEMA)
    assert n_exchanges(
        extract_public_symbols(df, ["repo", "doc_id"], "content", "lang")
    ) == 0


def test_api_diff(spark):
    from schema_validator_spark.functions.publicapi import api_diff

    old = spark.createDataFrame([
        ("r1", 1, "py", "def f():\n    pass\ndef g():\n    pass\n"),
        ("r1", 2, "py", "def g():\n    pass\n"),   # dup decl of g
        ("r2", 3, "go", "func Run() {}\n"),
    ], SCHEMA)
    new = spark.createDataFrame([
        # f moved file + g renamed to h; extra duplicate f is no change
        ("r1", 9, "py", "def f():\n    pass\ndef h():\n    pass\n"),
        ("r1", 8, "py", "def f():\n    pass\n"),
        ("r2", 7, "go", "func Run() {}\n"),        # unchanged
    ], SCHEMA)
    got = sorted(
        (r["repo"], r["lang"], r["symbol"], r["change"])
        for r in api_diff(old, new, "repo", "content", "lang").collect()
    )
    assert got == [
        ("r1", "py", "g", "removed"),
        ("r1", "py", "h", "added"),
    ]


def test_api_diff_null_repo_is_null_safe(spark):
    from schema_validator_spark.functions.publicapi import api_diff

    # a NULL repo (missing metadata) with an UNCHANGED symbol must not
    # produce phantom removed+added rows; a real change under a NULL
    # repo still reports with the NULL key intact
    old = spark.createDataFrame([
        (None, 1, "py", "def same():\n    pass\ndef gone():\n    pass\n"),
    ], SCHEMA)
    new = spark.createDataFrame([
        (None, 2, "py", "def same():\n    pass\n"),
    ], SCHEMA)
    got = [(r["repo"], r["symbol"], r["change"])
           for r in api_diff(old, new, "repo", "content", "lang").collect()]
    assert got == [(None, "gone", "removed")]
