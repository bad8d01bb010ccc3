from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.chatlint import (
    chat_lint,
    filter_valid_chats,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _conv(*turns):
    return json.dumps(
        [{"role": r, "content": c} for r, c in turns]
    )


def _lint(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, conv string")
    return {r["id"]: r.asDict()
            for r in chat_lint(df, ["id"], "conv", **kw).collect()}


def test_valid_conversation(spark):
    ok = _conv(("system", "be nice"), ("user", "hi"),
               ("assistant", "hello"), ("user", "thx"),
               ("assistant", "np"))
    r = _lint(spark, [(1, ok)])[1]
    assert r["first_error"] == "ok" and r["keep"] == 1
    assert (r["n_turns"], r["n_system"], r["n_user"],
            r["n_assistant"], r["n_empty"]) == (5, 1, 2, 2, 0)


def test_valid_without_system(spark):
    ok = _conv(("user", "hi"), ("assistant", "hello"))
    assert _lint(spark, [(1, ok)])[1]["first_error"] == "ok"


def test_structural_errors(spark):
    r = _lint(spark, [
        (1, None),
        (2, "   "),
        (3, "not json"),
        (4, '{"role":"user","content":"hi"}'),  # object, not array
        (5, "[]"),
    ])
    assert r[1]["first_error"] == "missing"
    assert r[2]["first_error"] == "missing"
    assert r[3]["first_error"] == "invalid_json"
    assert r[4]["first_error"] == "not_an_array"
    assert r[5]["first_error"] == "empty_conversation"
    for i in (1, 2, 3, 4, 5):
        assert r[i]["keep"] == 0 and r[i]["n_turns"] == 0


def test_role_and_content_errors(spark):
    r = _lint(spark, [
        (1, _conv(("user", "hi"), ("robot", "beep"))),
        (2, json.dumps([{"role": None, "content": "x"}])),
        (3, _conv(("user", "hi"), ("assistant", ""))),
        (4, json.dumps([{"role": "user"}, {"role": "assistant",
                                           "content": "x"}])),
    ])
    assert r[1]["first_error"] == "bad_role"
    assert r[2]["first_error"] == "bad_role"
    assert r[3]["first_error"] == "empty_content"
    assert r[3]["n_empty"] == 1
    assert r[4]["first_error"] == "empty_content"


def test_positional_errors(spark):
    r = _lint(spark, [
        (1, _conv(("user", "a"), ("system", "late"),
                  ("assistant", "b"))),
        (2, _conv(("system", "s"), ("assistant", "a"))),
        (3, _conv(("user", "a"), ("user", "b"), ("assistant", "c"))),
        (4, _conv(("user", "a"), ("assistant", "b"), ("user", "c"))),
        (5, _conv(("system", "s"), ("system", "s2"), ("user", "u"),
                  ("assistant", "a"))),
    ])
    assert r[1]["first_error"] == "system_not_first"
    assert r[2]["first_error"] == "not_user_first"
    assert r[3]["first_error"] == "no_alternation"
    assert r[4]["first_error"] == "not_assistant_last"
    # second system is in the body -> system_not_first
    assert r[5]["first_error"] == "system_not_first"


def test_priority_order(spark):
    # bad role AND empty content AND wrong ending: bad_role wins
    conv = json.dumps([{"role": "robot", "content": ""},
                       {"role": "user", "content": "x"}])
    assert _lint(spark, [(1, conv)])[1]["first_error"] == "bad_role"


def test_scalar_content_coerces(spark):
    # "content": 5 coerces to "5" (documented; DuckDB agrees)
    conv = '[{"role":"user","content":5},{"role":"assistant","content":"x"}]'
    assert _lint(spark, [(1, conv)])[1]["first_error"] == "ok"


def test_custom_role_vocabulary(spark):
    conv = _conv(("user", "hi"), ("critic", "meh"))
    assert _lint(spark, [(1, conv)])[1]["first_error"] == "bad_role"
    r = _lint(spark, [(1, conv)], roles=("user", "critic", "assistant"))
    # critic accepted as a role, but breaks assistant-last
    assert r[1]["first_error"] == "not_assistant_last"


def test_filter_form_matches_keep(spark):
    rows = [
        (1, _conv(("user", "hi"), ("assistant", "yo")), "a"),
        (2, "nope", "b"),
        (3, _conv(("user", "x"), ("user", "y"), ("assistant", "z")), "c"),
    ]
    df = spark.createDataFrame(rows, "id long, conv string, extra string")
    out = filter_valid_chats(df, ["id"], "conv")
    assert out.columns == ["id", "conv", "extra"]
    assert [r["id"] for r in out.collect()] == [1]


def test_guards(spark):
    df = spark.createDataFrame([(1, "x")], "id long, conv string")
    with pytest.raises(ValueError):
        chat_lint(df.withColumn("_p", F.lit(1)), ["id"], "conv")
    with pytest.raises(ValueError):
        chat_lint(df, ["id"], "conv", roles=())
    with pytest.raises(ValueError):
        filter_valid_chats(df.withColumn("keep", F.lit(1)), ["id"], "conv")


def test_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([(1, "[]")], "id long, conv string")
    out = chat_lint(df, ["id"], "conv")
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_leading_whitespace_before_array_is_valid(spark):
    # the JSON parser skips ALL whitespace; the array-shape guard must
    # too (regression: trim() strips spaces only, so a tab/newline
    # before '[' misreported not_an_array)
    conv = "\t\n " + _conv(("user", "hi"), ("assistant", "yo"))
    r = _lint(spark, [(1, conv)])[1]
    assert r["first_error"] == "ok" and r["n_turns"] == 2
