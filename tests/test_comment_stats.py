from __future__ import annotations

import pytest

from schema_validator_spark.operators.codequality import comment_stats
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _one(spark, lang, content, **kw):
    df = spark.createDataFrame(
        [(1, lang, content)], "id long, lang string, content string"
    )
    return comment_stats(
        df, "content", "lang", keep_cols=["id"], **kw
    ).collect()[0]


def test_go_line_and_block(spark):
    content = "// a\nx /* b\nc */ y // d\n"
    r = _one(spark, "go", content)
    blk = len("/* b\nc */")
    lines = len("// a") + len("// d")
    assert r["n_chars"] == len(content)
    assert r["n_block_comments"] == 1
    assert r["n_line_comments"] == 2
    assert r["comment_chars"] == blk + lines
    assert r["comment_frac"] == round((blk + lines) / len(content), 6)


def test_line_inside_block_not_double_counted(spark):
    r = _one(spark, "c", "/* // inner */ x\n")
    assert r["n_block_comments"] == 1
    assert r["n_line_comments"] == 0
    assert r["comment_chars"] == len("/* // inner */")


def test_python_hash_comments(spark):
    r = _one(spark, "py", "# x\ny = 1 # y\n")
    assert (r["n_line_comments"], r["n_block_comments"]) == (2, 0)
    assert r["comment_chars"] == 6


def test_unterminated_block_is_code(spark):
    r = _one(spark, "go", "x /* never closed\ny\n")
    assert r["n_block_comments"] == 0
    assert r["comment_chars"] == 0


def test_unknown_lang_and_empty(spark):
    r = _one(spark, "cobol", "// looks like a comment")
    assert (r["comment_chars"], r["comment_frac"]) == (0, 0.0)
    r2 = _one(spark, "go", "")
    assert r2["comment_frac"] is None
    r3 = _one(spark, "go", None)
    assert r3["n_chars"] == 0


def test_custom_syntax_and_empty_map(spark):
    r = _one(spark, "sql", "-- hi\nselect 1\n",
             syntax={"sql": (r"--[^\n]*", None)})
    assert r["n_line_comments"] == 1 and r["comment_chars"] == 5
    with pytest.raises(ValueError):
        _one(spark, "go", "x", syntax={})


def test_zero_shuffle_no_python(spark):
    df = spark.createDataFrame(
        [(1, "go", "// c\nx\n")], "id long, lang string, content string"
    )
    out = comment_stats(df, "content", "lang", keep_cols=["id"])
    assert n_exchanges(out) == 0
    assert not uses_python(out)
