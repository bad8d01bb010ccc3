from __future__ import annotations

from schema_validator_spark.functions.embedded import strip_comments
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _one(spark, content, lang):
    df = spark.createDataFrame(
        [(1, content, lang)], "id long, content string, lang string"
    )
    return strip_comments(df, ["id"], "content", "lang").collect()[0]


def test_py_line_comment_stripped(spark):
    r = _one(spark, "x = 1  # the answer\ny = 2\n", "py")
    assert r["content_stripped"] == "x = 1  \ny = 2\n"
    assert r["n_comment_chars"] == len("# the answer")


def test_hash_inside_string_protected(spark):
    src = 'url = "http://x#frag"  # real comment\n'
    r = _one(spark, src, "py")
    assert r["content_stripped"] == 'url = "http://x#frag"  \n'


def test_slashes_inside_url_literal_protected(spark):
    src = 'u = "https://example.com/a"; // trailing\n'
    r = _one(spark, src, "js")
    assert r["content_stripped"] == 'u = "https://example.com/a"; \n'


def test_block_comment_multiline(spark):
    src = "a = 1;\n/* first\n   second */\nb = 2;\n"
    r = _one(spark, src, "go")
    assert r["content_stripped"] == "a = 1;\n\nb = 2;\n"
    # newlines inside the block body are removed with it, but the
    # surrounding line structure stays
    assert r["n_comment_chars"] == len("/* first\n   second */")


def test_quote_inside_comment_stripped_whole(spark):
    # the comment opened first -> leftmost-first lexing strips the
    # quoted fragment WITH the comment
    r = _one(spark, 'x = 1  # say "hi" now\n', "py")
    assert r["content_stripped"] == "x = 1  \n"


def test_docstring_preserved(spark):
    src = 'def f():\n    """doc # not a comment"""\n    return 1\n'
    r = _one(spark, src, "py")
    assert r["content_stripped"] == src
    assert r["n_comment_chars"] == 0


def test_unregistered_lang_passthrough(spark):
    src = "// looks like a comment\n"
    r = _one(spark, src, "rs")
    assert r["content_stripped"] == src
    assert r["n_comment_chars"] == 0


def test_null_content(spark):
    r = _one(spark, None, "py")
    assert r["content_stripped"] == ""
    assert r["n_comment_chars"] == 0


def test_line_numbers_survive(spark):
    src = "a = 1 // one\nb = 2 /* two */\nc = 3\n"
    r = _one(spark, src, "java")
    assert r["content_stripped"].count("\n") == src.count("\n")


def test_plan_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame(
        [(i, "x = 1 # c", "py") for i in range(8)],
        "id long, content string, lang string",
    )
    out = strip_comments(df, ["id"], "content", "lang")
    assert n_exchanges(out) == 0
    assert not uses_python(out)
