from __future__ import annotations

import hashlib
import json

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.chatrender import render_chat
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _conv(*turns):
    return json.dumps([{"role": r, "content": c} for r, c in turns])


def _render_py(turns):
    """Independent python replay of the template."""
    out = []
    spans = []
    pos = 0
    for r, c in turns:
        piece = f"<|{r}|>\n{c}\n"
        if r == "assistant":
            s = pos + len(r) + 5
            spans.append((s, s + len(c)))
        pos += len(piece)
        out.append(piece)
    return "".join(out), spans


def _rows(spark, rows):
    df = spark.createDataFrame(rows, "id long, conv string")
    return render_chat(df, ["id"], "conv").collect()


def test_offsets_and_text_match_python_replay(spark):
    turns = [("system", "be nice"), ("user", "hi there"),
             ("assistant", "hello!"), ("user", "thx"),
             ("assistant", "np – any time")]
    rendered, spans = _render_py(turns)
    got = _rows(spark, [(1, _conv(*turns))])
    assert len(got) == 2
    for i, r in enumerate(got):
        assert r["span_idx"] == i
        assert (r["start_char"], r["end_char"]) == spans[i]
        assert r["span_text"] == turns[[2, 4][i]][1]
        assert r["n_chars"] == len(rendered)
        assert r["rendered_md5"] == hashlib.md5(
            rendered.encode()).hexdigest()


def test_span_slices_equal_contents(spark):
    # multi-byte chars: offsets are CHARACTER offsets on both sides
    turns = [("user", "héllo ∑ wörld"), ("assistant", "çä ≠ ascii")]
    got = _rows(spark, [(1, _conv(*turns))])
    assert len(got) == 1
    assert got[0]["span_text"] == "çä ≠ ascii"
    rendered, spans = _render_py(turns)
    assert (got[0]["start_char"], got[0]["end_char"]) == spans[0]


def test_no_assistant_turn_emits_nothing(spark):
    got = _rows(spark, [(1, _conv(("user", "question only")))])
    assert got == []


def test_null_fields_render_empty(spark):
    conv = json.dumps([{"role": "assistant"}])
    got = _rows(spark, [(1, conv)])
    assert len(got) == 1
    assert got[0]["span_text"] == ""
    assert got[0]["start_char"] == got[0]["end_char"]


def test_invalid_json_renders_empty_no_rows(spark):
    got = _rows(spark, [(1, "not json"), (2, None)])
    assert got == []


def test_reserved_columns_raise(spark):
    df = spark.createDataFrame([(1, "[]")], "id long, conv string")
    with pytest.raises(ValueError):
        render_chat(df.withColumn("_r", F.lit(1)), ["id"], "conv")


def test_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([(1, "[]")], "id long, conv string")
    out = render_chat(df, ["id"], "conv")
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_id_collision_with_output_raises(spark):
    df = spark.createDataFrame(
        [(1, "[]", 2)], "id long, conv string, n_chars long")
    with pytest.raises(ValueError):
        render_chat(df, ["id", "n_chars"], "conv")
