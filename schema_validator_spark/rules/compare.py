"""Comparison rules (reference: rule/compare.go; min/max/len from rule/other.go).

All compile to JVM-side expressions through the polymorphic
``compare_lit`` core, which reproduces compareValue (rule/validators.go:
73-136): numeric compare on numeric columns, **byte-length** compare when a
string column meets an int-castable param (Go ``len`` counts bytes →
``octet_length``, not ``length``), lexicographic otherwise, size compare
for arrays.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import Registry, RuleContext
from ._helpers import as_string, compare_lit, param_int


def _cmp_rule(op: str):
    def factory(ctx: RuleContext, params: tuple[str, ...]):
        return compare_lit(op, ctx.col, ctx.dtype, params[0], op)

    return factory


def install(r: Registry) -> None:
    for op in ("eq", "ne", "gt", "gte", "lt", "lte"):
        r.register(op, _cmp_rule(op), min_params=1, max_params=1)

    def _eq_ic(ctx, params):
        return F.lower(as_string(ctx.col, ctx.dtype)) == F.lit(params[0].lower())

    def _ne_ic(ctx, params):
        return F.lower(as_string(ctx.col, ctx.dtype)) != F.lit(params[0].lower())

    r.register("eq_ignore_case", _eq_ic, min_params=1, max_params=1)
    r.register("ne_ignore_case", _ne_ic, min_params=1, max_params=1)

    # min = gte, max = lte (rule/other.go:100-102)
    def _min(ctx, params):
        return compare_lit("gte", ctx.col, ctx.dtype, params[0], "min")

    def _max(ctx, params):
        return compare_lit("lte", ctx.col, ctx.dtype, params[0], "max")

    r.register("min", _min, min_params=1, max_params=1)
    r.register("max", _max, min_params=1, max_params=1)

    def _len(ctx, params):
        # Go len(Value().String()) = bytes (rule/other.go:92-98).
        n = param_int("len", params[0])
        return F.octet_length(as_string(ctx.col, ctx.dtype)) == F.lit(n)

    r.register("len", _len, min_params=1, max_params=1)
