from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.functions.identifiers import (
    extract_identifiers,
    identifier_vocabulary,
    split_subtokens,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _split(spark, ident):
    df = spark.createDataFrame([(ident,)], "s string")
    return df.select(split_subtokens(F.col("s")).alias("t")).collect()[0]["t"]


def test_split_subtokens(spark):
    assert _split(spark, "parseHTTPResponse") == ["parse", "http", "response"]
    assert _split(spark, "parseHTTPResponse_v2") == [
        "parse", "http", "response", "v2"]
    assert _split(spark, "snake_case_name") == ["snake", "case", "name"]
    assert _split(spark, "SCREAMING_CASE") == ["screaming", "case"]
    assert _split(spark, "__dunder__") == ["dunder"]
    assert _split(spark, "PascalCase") == ["pascal", "case"]
    assert _split(spark, "x") == ["x"]
    assert _split(spark, "HTTPServer2") == ["http", "server2"]


def test_extract_filters_keywords_per_lang(spark):
    rows = [
        (1, "def parseResponse(self): return myValue", "py"),
        (2, "func Do() int { var x int; return x }", "go"),
        (3, "const fooBar = function() { return this.x }", "js"),
        (4, "def return if else", "rust"),  # no keyword list -> keep all
        (5, None, "py"),
    ]
    df = spark.createDataFrame(rows, "id long, content string, lang string")
    out = extract_identifiers(df, ["id"], "content", "lang")
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["id"], []).append(r["identifier"])
    assert by_id[1] == ["parseResponse", "myValue"]   # def/self/return gone
    assert by_id[2] == ["Do", "x", "x"]               # multiplicity kept
    assert by_id[3] == ["fooBar", "x"]
    assert by_id[4] == ["def", "return", "if", "else"]
    assert 5 not in by_id
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_vocabulary(spark):
    rows = [
        (1, "getUserName = getUser + userName", "py"),
        (2, "get_user(x)", "py"),
    ]
    df = spark.createDataFrame(rows, "id long, content string, lang string")
    got = {r["subtoken"]: (r["n_occ"], r["n_identifiers"])
           for r in identifier_vocabulary(df, ["id"], "content", "lang").collect()}
    # 'get' appears in getUserName, getUser, get_user (3 occ, 3 distinct)
    assert got["get"] == (3, 3)
    # 'user' in getUserName, getUser, userName, get_user
    assert got["user"] == (4, 4)
    assert got["name"] == (2, 2)
    assert got["x"] == (1, 1)
