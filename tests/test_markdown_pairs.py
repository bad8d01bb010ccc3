from __future__ import annotations

from schema_validator_spark.functions.markdown import markdown_code_pairs

SCHEMA = "doc_id long, content string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return markdown_code_pairs(df, ["doc_id"], "content", **kw).collect()


def test_basic_pair(spark):
    md = (
        "# Title\n\nThis paragraph explains the example.\n\n"
        "```python\nprint('hi')\nx = 1\n```\ntrailing text\n"
    )
    out = _run(spark, [(0, md)])
    assert len(out) == 1
    p = out[0]
    assert p["pair_index"] == 1
    assert p["info"] == "python"
    assert p["prose"] == "This paragraph explains the example."
    assert p["code"] == "print('hi')\nx = 1\n"


def test_two_blocks_ordered(spark):
    md = (
        "Intro para.\n\n```py\na = 1\n```\n\nSecond explanation.\n\n"
        "```js\nlet b = 2;\n```\ndone\n"
    )
    out = sorted(_run(spark, [(0, md)]), key=lambda r: r["pair_index"])
    assert [p["pair_index"] for p in out] == [1, 2]
    assert out[0]["prose"] == "Intro para."
    assert out[1]["prose"] == "Second explanation."
    assert out[1]["info"] == "js"
    assert out[1]["code"] == "let b = 2;\n"


def test_unclosed_fence_dropped(spark):
    md = "Explains.\n\n```py\ncomplete = True\n```\n\nMore.\n\n```py\nunclosed"
    out = _run(spark, [(0, md)])
    assert len(out) == 1 and out[0]["code"] == "complete = True\n"


def test_no_info_string(spark):
    md = "Some prose here.\n\n```\nraw code\n```\n"
    out = _run(spark, [(0, md)])
    assert out[0]["info"] == "" and out[0]["code"] == "raw code\n"


def test_empty_code_block_dropped(spark):
    md = "Prose.\n\n```python\n```\nafter\n"
    assert _run(spark, [(0, md)]) == []
    # one-line fence with info only and no newline -> code '' -> dropped
    assert _run(spark, [(0, "Prose.\n\n```py```\n")]) == []


def test_missing_prose_dropped_unless_threshold_zero(spark):
    md = "```py\nx = 1\n```\n"
    assert _run(spark, [(0, md)]) == []
    out = _run(spark, [(0, md)], min_prose_chars=0)
    assert len(out) == 1 and out[0]["prose"] == ""


def test_prose_is_last_paragraph_only(spark):
    md = "Old paragraph.\n\nRelevant paragraph.\n\n```py\nz = 3\n```\n"
    out = _run(spark, [(0, md)])
    assert out[0]["prose"] == "Relevant paragraph."
    # tab/space-padded blank separator lines also split paragraphs
    md2 = "First.\n \t \nSecond closest.\n```py\nq = 4\n```\n"
    out2 = _run(spark, [(0, md2)])
    assert out2[0]["prose"] == "Second closest."


def test_null_content_and_plain_doc(spark):
    assert _run(spark, [(0, None), (1, "no fences at all\n")]) == []


def test_pair_index_counts_valid_blocks(spark):
    md = (
        "P1.\n\n```py\na\n```\n\nP2.\n\n```py\nb\n```\n\nP3.\n\n```py\ntail"
    )
    out = sorted(_run(spark, [(0, md)]), key=lambda r: r["pair_index"])
    # third block unclosed -> two pairs, indexes 1 and 2
    assert [p["pair_index"] for p in out] == [1, 2]
    assert [p["code"] for p in out] == ["a\n", "b\n"]
