from __future__ import annotations

import pytest

from schema_validator_spark.operators.dobf import obfuscate_identifiers

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = obfuscate_identifiers(df, ["doc_id"], "content", "lang", **kw)
    return {r["doc_id"]: r for r in got.collect()}


def test_basic_rename_first_appearance_order(spark):
    got = _run(spark, [(0, "py", "def f(a, b):\n    return a + b\n")])
    r = got[0]
    # def/return are py keywords; f, a, b rename in appearance order
    assert r["obf_content"] == "def VAR_0(VAR_1, VAR_2):\n    return VAR_1 + VAR_2\n"
    assert r["id_names"] == ["f", "a", "b"]
    assert r["n_ids"] == 3 and r["n_ids_total"] == 3


def test_lossless_outside_identifiers(spark):
    # only keywords, digits and punctuation: output == input byte-exact
    src = "if not True:\n    return 42  # ..., 3.14\n"
    got = _run(spark, [(0, "py", src)])
    assert got[0]["obf_content"] == src
    assert got[0]["n_ids"] == 0 and got[0]["id_names"] == []


def test_repeated_identifier_same_placeholder(spark):
    got = _run(spark, [(0, "go", "func Add(x int) int { return x }\n")])
    r = got[0]
    # func/return/int are go keywords; Add then x
    assert r["obf_content"] == "func VAR_0(VAR_1 int) int { return VAR_1 }\n"
    assert r["id_names"] == ["Add", "x"]


def test_unregistered_lang_renames_everything(spark):
    got = _run(spark, [(0, "rust", "fn main() { let x = 1; }\n")])
    r = got[0]
    assert r["id_names"] == ["fn", "main", "let", "x"]
    assert r["obf_content"] == "VAR_0 VAR_1() { VAR_2 VAR_3 = 1; }\n"


def test_max_ids_cap_keeps_overflow_names(spark):
    got = _run(
        spark,
        [(0, "py", "alpha beta gamma delta\n")],
        max_ids=2,
    )
    r = got[0]
    assert r["obf_content"] == "VAR_0 VAR_1 gamma delta\n"
    assert r["id_names"] == ["alpha", "beta"]
    assert r["n_ids"] == 2 and r["n_ids_total"] == 4


def test_digits_and_underscore_identifiers(spark):
    got = _run(spark, [(0, "js", "_tmp2 = v1 + 99\n")])
    r = got[0]
    # _tmp2 and v1 are identifiers (digit tails stay attached); 99 is
    # a digit token and never renames
    assert r["obf_content"] == "VAR_0 = VAR_1 + 99\n"
    assert r["id_names"] == ["_tmp2", "v1"]


def test_empty_and_null_content(spark):
    got = _run(spark, [(0, "py", ""), (1, "py", None)])
    for i in (0, 1):
        assert got[i]["obf_content"] == ""
        assert got[i]["n_ids"] == 0 and got[i]["n_tokens"] == 0


def test_placeholder_prefix_override(spark):
    got = _run(spark, [(0, "py", "x = y\n")], prefix="ID")
    assert got[0]["obf_content"] == "ID0 = ID1\n"


def test_max_ids_validation(spark):
    df = spark.createDataFrame([(0, "py", "x")], SCHEMA)
    with pytest.raises(ValueError):
        obfuscate_identifiers(df, ["doc_id"], "content", "lang", max_ids=0)


def test_tokenizer_full_coverage_property(spark):
    # adversarial mixed content: concat(tokens) == content, so with an
    # empty keyword table and prefix equal to nothing renamed the
    # operator is byte-lossless; here verify via a no-eligible-ids lang
    src = "##!@ 12ab_c3 \t\n\x00~`'\"weird\\x"
    got = _run(spark, [(0, "zz", src)], keywords={"zz": ("weird", "ab_c3", "x")})
    # 12ab_c3 lexes as digits(12) + identifier(ab_c3): both excluded
    assert got[0]["obf_content"] == src
