"""Property-based tests (hypothesis) for the pure-Python layers and one
batched SQL-vs-Python oracle property."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from schema_validator_spark import tag
from schema_validator_spark.i18n import translate
from schema_validator_spark.operators.sketch import _compress

# ------------------------------------------------------------------ tag round-trip

_name = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12)
_param = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-:/ ", min_size=1, max_size=10
).map(str.strip).filter(bool)


def _unambiguous(rules):
    """The reference grammar folds a param-less segment that follows a
    rule-with-params into that rule's params (the `|`-inside-params
    lookahead, tag/tag.go:57-75) — exclude exactly those inputs."""
    for prev, cur in zip(rules, rules[1:]):
        if prev[1] and not cur[1]:
            return False
    return True


@given(st.lists(st.tuples(_name, st.lists(_param, max_size=3)),
                min_size=1, max_size=6).filter(_unambiguous))
def test_tag_roundtrip(rules):
    rendered = "|".join(
        n if not ps else f"{n}={','.join(ps)}" for n, ps in rules
    )
    parsed = tag.parse(rendered)
    assert [(r.name, list(r.params)) for r in parsed] == [
        (n, ps) for n, ps in rules
    ]


@given(st.lists(st.tuples(_name, st.lists(_param, max_size=3)),
                min_size=1, max_size=6))
def test_tag_parse_idempotent(rules):
    """Even for ambiguous inputs (where the fold heuristic kicks in),
    render(parse(x)) must be a fixed point."""
    rendered = "|".join(
        n if not ps else f"{n}={','.join(ps)}" for n, ps in rules
    )
    once = tag.parse(rendered)
    re_rendered = "|".join(
        r.name if not r.params else f"{r.name}={','.join(r.params)}" for r in once
    )
    twice = tag.parse(re_rendered)
    assert [(r.name, r.params) for r in once] == [(r.name, r.params) for r in twice]


# ------------------------------------------------------------------ i18n totality

@given(_name, st.text(max_size=30), st.sampled_from(["en", "zh-CN", "xx"]))
def test_translate_total(code, params, lang):
    out = translate(code, path="p", params=params, lang=lang)
    assert isinstance(out, str) and out != ""
    assert "{p1}" not in out and "{params}" not in out and "{path}" not in out


# ------------------------------------------------------------------ sketch compress

@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=1, max_size=500),
    st.integers(min_value=1, max_value=64),
)
def test_compress_invariants(values, compression):
    v = np.asarray(values, dtype=float)
    m, c = _compress(v, np.ones(len(v)), compression)
    assert len(m) <= compression
    assert c.sum() == len(v)                       # mass preserved
    assert np.all(np.diff(m) >= -1e-9)             # centroid means sorted
    assert m.min() >= v.min() - 1e-9 and m.max() <= v.max() + 1e-9
    # weighted mean preserved
    assert abs((m * c).sum() - v.sum()) < 1e-6 * max(1.0, np.abs(v).sum())


# ------------------------------------------------------------------ Luhn SQL oracle

def _luhn_py(s: str) -> bool:
    """The reference's algorithm byte-for-byte (format.go:378-397):
    no digit pre-check — non-digits contribute ord(ch)-ord('0')."""
    if s == "":
        return True  # loop over zero chars -> sum 0 -> %10 == 0
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = ord(ch) - ord("0")
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="0123456789", min_size=0, max_size=19),
                min_size=1, max_size=40))
def test_luhn_sql_matches_python(spark, strings):
    from pyspark.sql import functions as F
    from schema_validator_spark.rules.formats import _luhn_ok

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)],
                               "i long, s string")
    got = {r["i"]: r["ok"] for r in
           df.select("i", _luhn_ok(F.col("s")).alias("ok")).collect()}
    for i, s in enumerate(strings):
        assert got[i] == _luhn_py(s), (s, got[i])


def test_unresolvable_scalar_annotations_still_compile():
    """Review regression: when get_type_hints fails for a class, plain
    scalar annotations ('str', 'Optional[int]', 'str | None') must keep
    working; only unrecognizable names (potential nested dataclasses)
    fail loudly."""
    import dataclasses

    import pytest as _pytest

    from schema_validator_spark.errors import CompileError
    from schema_validator_spark.spec_from_class import _unwrap_optional, from_dataclass

    assert _unwrap_optional("str") is None
    assert _unwrap_optional("Optional[int]") is None
    assert _unwrap_optional("str | None") is None
    # container spellings can never be a nested dataclass — a field
    # annotated 'list[str]'/'Dict[str, int]'/'dict' keeps its rule tag
    # instead of failing compile (round-2 advice)
    assert _unwrap_optional("list[str]") is None
    assert _unwrap_optional("List[str] | None") is None
    assert _unwrap_optional("Optional[Dict[str, int]]") is None
    assert _unwrap_optional("dict") is None
    assert _unwrap_optional("typing.Sequence[int]") is None
    with _pytest.raises(CompileError, match="unresolvable"):
        _unwrap_optional("Contact | None")

    # a class whose OTHER field references an unknown type: the scalar
    # rule field still compiles (get_type_hints fails -> all strings)
    ns = {}
    exec(
        "from __future__ import annotations\n"
        "import dataclasses\n"
        "@dataclasses.dataclass\n"
        "class U:\n"
        "    name: str = dataclasses.field(\n"
        "        default='', metadata={'validate': 'required|min=2'})\n",
        ns,
    )
    spec, _labels = from_dataclass(ns["U"])
    assert spec == {"name": "required|min=2"}
