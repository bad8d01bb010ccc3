from __future__ import annotations

from schema_validator_spark.operators.codequality import blob_stats
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _one(spark, content):
    df = spark.createDataFrame([(1, content)], "id long, content string")
    return blob_stats(df, "content", keep_cols=["id"]).collect()[0]


def test_base64_blob_drops(spark):
    blob = "iVBORw0KGgoAAAANSUhEUg" * 8  # 176 chars, one run
    r = _one(spark, f"img = '{blob}'\n")
    assert r["n_base64"] == len(blob)
    assert r["keep"] is False


def test_wrapped_base64_counts_across_lines(spark):
    # a 64-char run wrapped at col 32: \n is inside the class
    blob = "A" * 32 + "\n" + "B" * 32
    r = _one(spark, blob)
    assert r["n_base64"] == 65


def test_short_base64ish_run_ignored(spark):
    r = _one(spark, "word = 'someCamelCaseIdentifier'\n")
    assert r["n_base64"] == 0
    assert r["keep"] is True


def test_hex_dump_drops(spark):
    dump = " ".join(["0xDE"] * 40)  # 40 bytes, one qualifying run
    r = _one(spark, dump)
    assert r["n_hex"] >= 150
    assert r["keep"] is False


def test_small_hex_constant_kept(spark):
    r = _one(spark, "color = 0xFF00AA\nmask = 0x0F\n")
    assert r["n_hex"] == 0
    assert r["keep"] is True


def test_unicode_escape_blob(spark):
    esc = "\\u0041" * 12  # 12 chained escapes
    r = _one(spark, f's = "{esc}"')
    assert r["n_uescape"] == 72
    assert r["keep"] is False


def test_few_unicode_escapes_kept(spark):
    r = _one(spark, 's = "\\u00e9\\u00e8"\nprint(s)\n')
    assert r["n_uescape"] == 0
    assert r["keep"] is True


def test_blob_below_threshold_keeps(spark):
    blob = "Q" * 64
    code = "x = 1\n" * 40  # blob is well under 2/5 of chars
    r = _one(spark, code + blob)
    assert r["n_base64"] >= 64
    assert r["keep"] is True


def test_empty_and_null_keep(spark):
    assert _one(spark, "")["keep"] is True
    assert _one(spark, None)["keep"] is True


def test_plan_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame(
        [(i, "x = 1") for i in range(8)], "id long, content string"
    )
    out = blob_stats(df, "content", keep_cols=["id"])
    assert n_exchanges(out) == 0
    assert not uses_python(out)
