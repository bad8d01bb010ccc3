"""Cross-field rules (reference: rule/field.go, 63 LoC).

Same-row column-vs-column predicates — no shuffle, no join; the
reference's ``ctx.Parent().GetValue(fieldName)`` (field.go:12) resolves
statically to a sibling Column at compile time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import Registry, RuleContext
from ._helpers import as_string, compare_field


def _field_rule(op: str, code: str):
    def factory(ctx: RuleContext, params: tuple[str, ...]):
        other_col, other_dtype = ctx.sibling(params[0])
        return compare_field(op, ctx.col, ctx.dtype, other_col, other_dtype, code)

    return factory


def install(r: Registry) -> None:
    r.register("eqfield", _field_rule("eq", "eqfield"), min_params=1, max_params=1)
    r.register("nefield", _field_rule("ne", "nefield"), min_params=1, max_params=1)
    r.register("gtfield", _field_rule("gt", "gtfield"), min_params=1, max_params=1)
    r.register("ltfield", _field_rule("lt", "ltfield"), min_params=1, max_params=1)
    r.register("gtefield", _field_rule("gte", "gtefield"), min_params=1, max_params=1)
    r.register("ltefield", _field_rule("lte", "ltefield"), min_params=1, max_params=1)

    def _fieldcontains(ctx: RuleContext, params):
        other_col, other_dtype = ctx.sibling(params[0])
        return as_string(ctx.col, ctx.dtype).contains(as_string(other_col, other_dtype))

    def _fieldexcludes(ctx: RuleContext, params):
        other_col, other_dtype = ctx.sibling(params[0])
        return ~as_string(ctx.col, ctx.dtype).contains(as_string(other_col, other_dtype))

    r.register("fieldcontains", _fieldcontains, min_params=1, max_params=1)
    r.register("fieldexcludes", _fieldexcludes, min_params=1, max_params=1)
