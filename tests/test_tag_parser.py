"""Tag grammar tests — mirror tag/tag.go semantics (splitter '|',
name=param '=', params ',', in-param '|' heuristic)."""

from __future__ import annotations

from schema_validator_spark.tag import Rule, parse


def test_empty():
    assert parse("") == []


def test_single_bare_rule():
    assert parse("required") == [Rule("required", ())]


def test_rule_with_params():
    assert parse("min=8") == [Rule("min", ("8",))]
    assert parse("oneof=a,b,c") == [Rule("oneof", ("a", "b", "c"))]


def test_pipeline():
    assert parse("required|min=8|max=64") == [
        Rule("required", ()),
        Rule("min", ("8",)),
        Rule("max", ("64",)),
    ]


def test_param_then_bare_rule():
    assert parse("oneof=male,female,other|required") == [
        Rule("oneof", ("male", "female", "other")),
        Rule("required", ()),
    ]


def test_pipe_inside_param_not_a_rule_name():
    # "a|b" after '=' where the next segment isn't a validator name:
    # the '|' stays inside the param (tag/tag.go:57-75 heuristic).
    rules = parse("eq=a|1b")
    assert rules == [Rule("eq", ("a|1b",))]


def test_pipe_inside_param_followed_by_rule():
    rules = parse("eq=a|required")
    assert rules == [Rule("eq", ("a",)), Rule("required", ())]


def test_whitespace_trimmed():
    assert parse("min = 8 | required") == [Rule("min", ("8",)), Rule("required", ())]


def test_empty_params_dropped():
    assert parse("oneof=a,,b") == [Rule("oneof", ("a", "b"))]


def test_dive_token():
    assert parse("min=1|dive|min=3") == [
        Rule("min", ("1",)),
        Rule("dive", ()),
        Rule("min", ("3",)),
    ]
