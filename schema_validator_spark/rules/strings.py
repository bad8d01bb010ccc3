"""String-shape rules (reference: rule/string.go, 240 LoC).

Every rule is a pure Spark SQL expression (JVM-side, whole-stage codegen).
Go's per-rune loops pass the empty string vacuously, so the anchored
regexes use ``*`` (not ``+``); a NULL cell behaves like "" (nil → zero
string under spf13/cast), which the ``as_string`` coalesce guarantees.

Unicode classes: Go ``unicode.IsLetter``/``IsDigit``/``IsSpace`` map to
Java ``\\p{L}``/``\\p{Nd}``/``\\p{IsWhite_Space}``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..registry import Registry, RuleContext
from ._helpers import strict_anchor, CompileError, as_string, java_escape_char_class


def _s(ctx: RuleContext) -> Column:
    return as_string(ctx.col, ctx.dtype)


def _regex_rule(pattern: str):
    pattern = strict_anchor(pattern)

    def factory(ctx: RuleContext, params: tuple[str, ...]) -> Column:
        return _s(ctx).rlike(pattern)

    return factory


def _first_rune(rule: str, params: tuple[str, ...]) -> str:
    if not params or not params[0]:
        raise CompileError(f"rule {rule!r}: empty rune param always fails")
    return params[0][0]


def install(r: Registry) -> None:
    # loop-over-runes rules: empty string passes (string.go:12-79,186-214)
    r.register("alpha", _regex_rule(r"^\p{L}*$"))
    r.register("alphaunicode", _regex_rule(r"^\p{L}*$"))  # same impl, string.go:62
    r.register("alphaspace", _regex_rule(r"^[\p{L}\p{IsWhite_Space}]*$"))
    r.register("alphanum", _regex_rule(r"^[\p{L}\p{Nd}]*$"))
    r.register("alphanumunicode", _regex_rule(r"^[\p{L}\p{Nd}]*$"))  # string.go:52
    r.register("alphanumspace", _regex_rule(r"^[\p{L}\p{Nd}\p{IsWhite_Space}]*$"))
    r.register("ascii", _regex_rule(r"^[\x00-\x7F]*$"))
    r.register("number", _regex_rule(r"^\p{Nd}*$"))
    r.register("numeric", _regex_rule(r"^[\p{Nd}.+-]*$"))  # loose mix, string.go:196
    r.register("printascii", _regex_rule(r"^[\x20-\x7E]*$"))

    def _boolean(ctx, params):
        return _s(ctx).isin("true", "false", "1", "0")

    r.register("boolean", _boolean)

    def _contains(ctx, params):
        return _s(ctx).contains(F.lit(params[0]))

    r.register("contains", _contains, min_params=1, max_params=1)

    def _containsany(ctx, params):
        return _s(ctx).rlike("[" + java_escape_char_class(params[0]) + "]")

    r.register("containsany", _containsany, min_params=1, max_params=1)

    def _containsrune(ctx, params):
        return _s(ctx).contains(F.lit(_first_rune("containsrune", params)))

    r.register("containsrune", _containsrune, min_params=1, max_params=1)

    def _endswith(ctx, params):
        return _s(ctx).endswith(params[0])

    def _endsnotwith(ctx, params):
        return ~_s(ctx).endswith(params[0])

    r.register("endswith", _endswith, min_params=1, max_params=1)
    r.register("endsnotwith", _endsnotwith, min_params=1, max_params=1)

    def _startswith(ctx, params):
        return _s(ctx).startswith(params[0])

    def _startsnotwith(ctx, params):
        return ~_s(ctx).startswith(params[0])

    r.register("startswith", _startswith, min_params=1, max_params=1)
    r.register("startsnotwith", _startsnotwith, min_params=1, max_params=1)

    def _excludes(ctx, params):
        return ~_s(ctx).contains(F.lit(params[0]))

    r.register("excludes", _excludes, min_params=1, max_params=1)

    def _excludesall(ctx, params):
        return ~_s(ctx).rlike("[" + java_escape_char_class(params[0]) + "]")

    r.register("excludesall", _excludesall, min_params=1, max_params=1)

    def _excludesrune(ctx, params):
        return ~_s(ctx).contains(F.lit(_first_rune("excludesrune", params)))

    r.register("excludesrune", _excludesrune, min_params=1, max_params=1)

    def _lowercase(ctx, params):
        s = _s(ctx)
        return s == F.lower(s)

    def _uppercase(ctx, params):
        s = _s(ctx)
        return s == F.upper(s)

    r.register("lowercase", _lowercase)
    r.register("uppercase", _uppercase)

    r.register("multibyte", _regex_rule(r"[^\x00-\x7F]"))  # ≥1 rune >127
