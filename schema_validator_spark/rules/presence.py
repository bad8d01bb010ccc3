"""Presence / conditional / misc rules (reference: rule/other.go, 326 LoC).

``required`` is NOT ``isNotNull``: it is the negation of IsNilOrZero
(data/value.go:101-118) — "" and 0 and false are missing too (SURVEY.md
§1.2).  The conditional families compile to ``F.when`` wrappers so the
whole family stays inside whole-stage codegen.

``dir``/``file``/``uds_exists`` stat the local filesystem in the
reference (other.go:42-64) — an env-dependent check that must not run on
executors at scale; they are registered ``driver_only`` and evaluate the
same semantics only when explicitly allowed (tests / driver-side audits).
"""

from __future__ import annotations

import pandas as pd

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..registry import Registry, RuleContext
from ._helpers import as_string, compare_lit, is_zero, required


def _zero(ctx: RuleContext) -> Column:
    return is_zero(ctx.col, ctx.dtype)


def _req(ctx: RuleContext) -> Column:
    return required(ctx.col, ctx.dtype)


def _sibling_eq(ctx: RuleContext, field: str, expected: str) -> Column:
    """compareValue(Equal, sibling, NewValue(expected)) — other.go:115-131."""
    other_col, other_dtype = ctx.sibling(field)
    return compare_lit("eq", other_col, other_dtype, expected, "required_if")


def _sibling_req(ctx: RuleContext, field: str) -> Column:
    other_col, other_dtype = ctx.sibling(field)
    return required(other_col, other_dtype)


def _any_req(ctx: RuleContext, fields: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for f in fields:
        cond = cond | _sibling_req(ctx, f)
    return cond


def _all_req(ctx: RuleContext, fields: tuple[str, ...]) -> Column:
    cond = F.lit(True)
    for f in fields:
        cond = cond & _sibling_req(ctx, f)
    return cond


def install(r: Registry) -> None:
    r.register("required", lambda ctx, p: _req(ctx))
    r.register("isdefault", lambda ctx, p: _zero(ctx))

    def _oneof(ctx, params):
        # Value().String() membership (other.go:104-111).
        return as_string(ctx.col, ctx.dtype).isin(*params)

    r.register("oneof", _oneof, min_params=1, max_params=None)

    # conditional requires (other.go:115-211)
    def _required_if(ctx, params):
        return F.when(_sibling_eq(ctx, params[0], params[1]), _req(ctx)).otherwise(True)

    def _required_unless(ctx, params):
        return F.when(~_sibling_eq(ctx, params[0], params[1]), _req(ctx)).otherwise(True)

    r.register("required_if", _required_if, min_params=2, max_params=2)
    r.register("required_unless", _required_unless, min_params=2, max_params=2)

    def _required_with(ctx, params):
        return F.when(_any_req(ctx, params), _req(ctx)).otherwise(True)

    def _required_with_all(ctx, params):
        return F.when(_all_req(ctx, params), _req(ctx)).otherwise(True)

    def _required_without(ctx, params):
        return F.when(~_all_req(ctx, params), _req(ctx)).otherwise(True)

    def _required_without_all(ctx, params):
        return F.when(~_any_req(ctx, params), _req(ctx)).otherwise(True)

    r.register("required_with", _required_with, min_params=1, max_params=None)
    r.register("required_with_all", _required_with_all, min_params=1, max_params=None)
    r.register("required_without", _required_without, min_params=1, max_params=None)
    r.register("required_without_all", _required_without_all, min_params=1, max_params=None)

    # excluded family (other.go:213-309): when triggered, value must be zero
    def _excluded_if(ctx, params):
        return F.when(_sibling_eq(ctx, params[0], params[1]), _zero(ctx)).otherwise(True)

    def _excluded_unless(ctx, params):
        return F.when(~_sibling_eq(ctx, params[0], params[1]), _zero(ctx)).otherwise(True)

    r.register("excluded_if", _excluded_if, min_params=2, max_params=2)
    r.register("excluded_unless", _excluded_unless, min_params=2, max_params=2)

    def _excluded_with(ctx, params):
        return F.when(_any_req(ctx, params), _zero(ctx)).otherwise(True)

    def _excluded_with_all(ctx, params):
        return F.when(_all_req(ctx, params), _zero(ctx)).otherwise(True)

    def _excluded_without(ctx, params):
        return F.when(~_all_req(ctx, params), _zero(ctx)).otherwise(True)

    def _excluded_without_all(ctx, params):
        return F.when(~_any_req(ctx, params), _zero(ctx)).otherwise(True)

    r.register("excluded_with", _excluded_with, min_params=1, max_params=None)
    r.register("excluded_with_all", _excluded_with_all, min_params=1, max_params=None)
    r.register("excluded_without", _excluded_without, min_params=1, max_params=None)
    r.register("excluded_without_all", _excluded_without_all, min_params=1, max_params=None)

    # `unique` is a no-op stub in the reference ("just pass",
    # other.go:311-316).  Row-level parity keeps the stub; the REAL
    # table-level uniqueness check lives in operators/uniqueness.py.
    r.register("unique", lambda ctx, p: F.lit(True))

    # omitempty: zero value short-circuits the rest of the rule list
    # (other.go:319-325 + SkipRest consumption at field.go:19-21).
    r.register("omitempty", lambda ctx, p: F.lit(True), modifier=True)

    # path-shaped checks (other.go:42-82)
    def _dirpath(ctx, params):
        s = as_string(ctx.col, ctx.dtype)
        return s.startswith("/") | s.contains("/")

    def _filepath(ctx, params):
        s = as_string(ctx.col, ctx.dtype)
        return s.startswith("/") | s.contains("/") | s.contains("\\")

    r.register("dirpath", _dirpath)
    r.register("filepath", _filepath)

    def _image(ctx, params):
        exts = (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".webp")
        ext = F.lower(F.regexp_extract(as_string(ctx.col, ctx.dtype), r"(\.[^./\\]+)$", 1))
        return ext.isin(*exts)

    r.register("image", _image)

    # env-dependent: os.Stat checks (other.go:42-64, network.go:279-289).
    # Not distributable — at cluster scale the executor filesystem is
    # meaningless.  Compiled as a driver-side broadcast set only when the
    # engine is told the check targets a driver-visible path catalog.
    def _dir(ctx, params):
        return _stat_rule(ctx, want_dir=True)

    def _file(ctx, params):
        return _stat_rule(ctx, want_dir=False)

    def _stat_rule(ctx: RuleContext, *, want_dir: bool) -> Column:
        # Evaluated via a tiny literal-set closure is impossible in general;
        # keep fidelity for tests by delegating to a vectorized UDF that
        # stats the executor-local fs (identical to single-node reference).
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _stat(s: pd.Series) -> pd.Series:
            def check(p):
                if p is None:
                    return False
                try:
                    st = os.stat(p)
                except OSError:
                    return False
                import stat as stat_mod

                isdir = stat_mod.S_ISDIR(st.st_mode)
                return isdir if want_dir else not isdir
            return s.map(check)

        return _stat(as_string(ctx.col, ctx.dtype))

    r.register("dir", _dir, driver_only=True)
    r.register("file", _file, driver_only=True)
