"""Rule registry: name → Column-expression factory.

Mirrors the reference registry's contract (rule/registry.go:61-144):
registration by name, optional aliasing, unknown-rule lookup is a hard
error raised at *compile* time (before any Spark job is submitted), and a
custom rule is any callable producing a boolean Column (True = pass).

Unlike the reference — which dispatches each rule through reflection per
value (rule/registry.go:90-107) — factories here run **once** on the
driver and emit Catalyst expressions; executors never see Python for
expression-backed rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import types as T

from .errors import CompileError


@dataclass
class RuleContext:
    """Compile-time binding of one column to one rule instance.

    ``siblings`` maps every column name in the input row to its
    (Column, DataType) pair — the analog of ``ctx.Parent().GetValue``
    (schema/context.go:94-96), resolved statically.
    """

    name: str
    col: Column
    dtype: T.DataType
    siblings: Mapping[str, tuple[Column, T.DataType]] = field(default_factory=dict)
    parity_stubs: bool = True

    def sibling(self, field_name: str) -> tuple[Column, T.DataType]:
        try:
            return self.siblings[field_name]
        except KeyError as exc:
            raise CompileError(
                f"rule on {self.name!r}: unknown sibling field {field_name!r}"
            ) from exc


RuleFactory = Callable[[RuleContext, tuple[str, ...]], Column]


@dataclass(frozen=True)
class RuleDef:
    name: str
    factory: RuleFactory
    min_params: int = 0
    max_params: int | None = 0  # None = variadic
    modifier: bool = False      # omitempty-style short-circuit marker
    driver_only: bool = False   # env-dependent (dir/file/uds_exists)


class Registry:
    def __init__(self) -> None:
        self._rules: dict[str, RuleDef] = {}

    def register(
        self,
        name: str,
        factory: RuleFactory,
        *,
        min_params: int = 0,
        max_params: int | None = 0,
        modifier: bool = False,
        driver_only: bool = False,
    ) -> None:
        self._rules[name] = RuleDef(
            name, factory, min_params, max_params, modifier, driver_only
        )

    def alias(self, existing: str, new_name: str) -> None:
        """rule/registry.go:137-144 — second name for the same rule."""
        d = self._rules[existing]
        self._rules[new_name] = RuleDef(
            new_name, d.factory, d.min_params, d.max_params, d.modifier, d.driver_only
        )

    def get(self, name: str) -> RuleDef:
        try:
            return self._rules[name]
        except KeyError as exc:
            raise CompileError(f"unknown rule {name!r}") from exc

    def __contains__(self, name: str) -> bool:
        return name in self._rules

    def names(self) -> list[str]:
        return sorted(self._rules)

    def make(self, name: str, ctx: RuleContext, params: tuple[str, ...]) -> Column:
        d = self.get(name)
        if len(params) < d.min_params or (
            d.max_params is not None and len(params) > d.max_params
        ):
            raise CompileError(
                f"rule {name!r}: got {len(params)} params, expected "
                f"[{d.min_params}, {d.max_params if d.max_params is not None else '∞'}]"
            )
        return d.factory(ctx, params)


def default_registry(*, parity_stubs: bool = True) -> Registry:
    """Registry with the full built-in rule pack installed
    (mirrors RegisterDefault, rule/validators.go:15-22).

    ``parity_stubs=True`` (default) keeps the reference's always-pass
    stubs byte-compatible (unique, uuidN_rfc4122,
    postcode_iso3166_alpha2_field); ``False`` swaps in real checks —
    see rules._install_engine_mode."""
    from .rules import install_all

    r = Registry()
    install_all(r, parity_stubs=parity_stubs)
    return r
