from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.functions.html import (
    html_link_count,
    html_title,
    html_to_text,
)


def _extract(spark, html):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(
        html_to_text(F.col("h")).alias("t"),
        html_title(F.col("h")).alias("title"),
        html_link_count(F.col("h")).alias("links"),
    ).collect()[0]


def test_basic_extraction(spark):
    r = _extract(
        spark,
        "<html><head><title> My  Page </title>"
        "<script>var x = '<p>not text</p>';</script>"
        "<style>body { color: red }</style></head>"
        "<body><h1>Header</h1><p>First para.</p>"
        "<p>Second&nbsp;para &amp; more.</p>"
        '<a href="https://x.example">a link</a>'
        "<!-- hidden comment --></body></html>",
    )
    assert r["t"] == "Header\nFirst para.\nSecond para & more.\na link"
    assert r["title"] == "My Page"
    assert r["links"] == 1


def test_script_and_comment_text_never_leaks(spark):
    r = _extract(
        spark,
        "<script type='text/javascript'>\nSECRET1\n</script>"
        "<!-- SECRET2 -->before<br>after<STYLE>SECRET3</STYLE>",
    )
    assert "SECRET" not in r["t"]
    assert r["t"] == "before\nafter"


def test_entities_and_whitespace(spark):
    r = _extract(spark, "a&lt;b&gt;c &quot;q&quot; &#39;s&#39;   \t end\n\n\nx")
    assert r["t"] == 'a<b>c "q" \'s\' end\nx'


def test_null_and_plain_text(spark):
    df = spark.createDataFrame([(None,), ("no tags here",)], "h string")
    out = [r["t"] for r in df.select(html_to_text(F.col("h")).alias("t")).collect()]
    assert out == ["", "no tags here"]


def test_block_tags_become_newlines(spark):
    r = _extract(spark, "<ul><li>one</li><li>two</li></ul><div>three</div>")
    assert r["t"] == "one\ntwo\nthree"


def test_pure_codegen(spark):
    from schema_validator_spark.plans import inspect

    df = spark.range(10).select(
        html_to_text(F.concat(F.lit("<p>x</p>"), F.col("id"))).alias("t")
    )
    assert not inspect.uses_python(df)
    assert inspect.n_exchanges(df) == 0
