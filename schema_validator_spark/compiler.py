"""Spec → Catalyst-expression compiler.

The reference interprets a schema tree per value (schema/object.go:27-78);
we compile the whole constraint spec ONCE on the driver into a single wide
projection so the table scan is one pass (rule fusion, SURVEY.md §4.1):

    df.withColumn("_fails", <array<struct<field,code,params>> of failed checks>)

* Row-level rules become boolean Columns (True = pass).
* ``omitempty`` short-circuits the rest of a column's rule list when the
  value is nil-or-zero (other.go:319-325; SkipRest at field.go:19-21).
* ``dive`` splits array-column rules: before → on the array itself,
  after → per element with indexed violation paths ``items.[i]``
  (parser.go:129-154; path format context.go:25-43).  Element rules must
  be expression-backed (no pandas UDF inside a lambda HOF).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import tag
from .registry import Registry, RuleContext
from .errors import CompileError
from .rules._helpers import is_zero

DIVE = "dive"

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("code", T.StringType(), False),
        T.StructField("params", T.StringType(), True),
    ]
)


@dataclass
class CompiledCheck:
    field: str
    code: str
    params: str
    passes: Column  # boolean, True = pass


@dataclass
class CompiledPlan:
    checks: list[CompiledCheck] = dc_field(default_factory=list)
    elem_fail_arrays: list[Column] = dc_field(default_factory=list)

    def fails_column(self) -> Column:
        """array<struct<field,code,params>> of failed checks for the row.

        Each check selects between two CONSTANT arrays (the violation
        struct is all literals, so Catalyst constant-folds it), then one
        ``concat`` merges them — pure whole-stage codegen, zero per-row
        allocation on the pass path.  ~2× faster warm and ~10× faster on
        first codegen than building array<struct> + filter() HOFs (which
        run interpreted per element): measured at 2M rows, 0.65s vs 1.5s
        warm, 1.3s vs 12.8s cold on local[32].
        """
        empty = F.array().cast(T.ArrayType(VIOLATION_SCHEMA))
        pieces: list[Column] = [
            F.when(F.coalesce(c.passes, F.lit(False)), empty).otherwise(
                F.array(
                    F.struct(
                        F.lit(c.field).alias("field"),
                        F.lit(c.code).alias("code"),
                        F.lit(c.params).alias("params"),
                    )
                )
            )
            for c in self.checks
        ]
        pieces.extend(self.elem_fail_arrays)
        if not pieces:
            return F.array().cast(T.ArrayType(VIOLATION_SCHEMA))
        if len(pieces) == 1:
            return pieces[0]
        return F.concat(*pieces)


def resolve_path(schema: T.StructType, path: str) -> tuple[Column, T.DataType]:
    """Resolve a dotted path (``meta.author.name``) through nested structs
    — the reference's accessor chain (data/accessor.go:61-64 ``cutPath``,
    struct_accessor.go:73-87) done statically against the schema."""
    parts = path.split(".")
    names = {f.name: f for f in schema.fields}
    if parts[0] not in names:
        raise CompileError(f"spec references unknown column {parts[0]!r}")
    dtype = names[parts[0]].dataType
    col = F.col(parts[0])
    for p in parts[1:]:
        if not isinstance(dtype, T.StructType):
            raise CompileError(
                f"path {path!r}: {p!r} is not a struct field (parent is {dtype})"
            )
        sub = {f.name: f for f in dtype.fields}
        if p not in sub:
            raise CompileError(f"path {path!r}: unknown struct field {p!r}")
        dtype = sub[p].dataType
        col = col.getField(p)
    return col, dtype


class _Siblings(dict):
    """Column-name → (Column, DataType), resolving nested dotted paths on
    demand so cross-field rules can reference struct members."""

    def __init__(self, schema: T.StructType) -> None:
        super().__init__(
            {f.name: (F.col(f.name), f.dataType) for f in schema.fields}
        )
        self._schema = schema

    def __missing__(self, key: str):
        val = resolve_path(self._schema, key)  # raises CompileError
        self[key] = val
        return val

    def __contains__(self, key) -> bool:  # `in` must match resolvability
        if super().__contains__(key):
            return True
        try:
            self[key]
            return True
        except CompileError:
            return False


def _normalize_rules(spec_value) -> list[tag.Rule]:
    if isinstance(spec_value, str):
        return tag.parse(spec_value)
    out = []
    for item in spec_value:
        if isinstance(item, tag.Rule):
            out.append(item)
        elif isinstance(item, str):
            out.extend(tag.parse(item))
        elif isinstance(item, (tuple, list)) and len(item) == 2:
            out.append(tag.Rule(item[0], tuple(str(p) for p in item[1])))
        else:
            raise CompileError(f"bad rule spec item: {item!r}")
    return out


def compile_spec(
    spec: dict[str, object],
    schema: T.StructType,
    registry: Registry,
    *,
    allow_driver_only: bool = False,
    field_labels: dict[str, str] | None = None,
) -> CompiledPlan:
    """Compile a {column: tag-string | rule-list} spec against a schema.

    ``field_labels`` maps storage column name → display name in violation
    rows (the fieldNameMap analog, schema/object.go:13,100-103)."""
    field_labels = field_labels or {}
    siblings = _Siblings(schema)
    plan = CompiledPlan()

    for col_name, spec_value in spec.items():
        col, dtype = siblings[col_name]  # resolves nested dotted paths too
        rules = _normalize_rules(spec_value)

        if DIVE in [r.name for r in rules]:
            if not isinstance(dtype, T.ArrayType):
                raise CompileError(f"'dive' on non-array column {col_name!r}")
            i = [r.name for r in rules].index(DIVE)
            outer, inner = rules[:i], rules[i + 1 :]
        else:
            outer, inner = rules, []

        label = field_labels.get(col_name, col_name)
        _compile_column(plan, registry, label, col, dtype, outer, siblings,
                        allow_driver_only)
        if inner:
            _compile_elements(plan, registry, label, col, dtype, inner,
                              siblings, allow_driver_only)

    return plan


def _compile_column(
    plan: CompiledPlan,
    registry: Registry,
    name: str,
    col: Column,
    dtype: T.DataType,
    rules: list[tag.Rule],
    siblings,
    allow_driver_only: bool,
) -> None:
    skip_when_zero = False
    ctx = RuleContext(name=name, col=col, dtype=dtype, siblings=siblings)
    for rule in rules:
        d = registry.get(rule.name)
        if d.driver_only and not allow_driver_only:
            raise CompileError(
                f"rule {rule.name!r} stats the local filesystem and is not "
                f"distributable; pass allow_driver_only=True to compile it"
            )
        if d.modifier:
            skip_when_zero = True
            continue
        passes = registry.make(rule.name, ctx, rule.params)
        if skip_when_zero:
            passes = is_zero(col, dtype) | passes
        plan.checks.append(
            CompiledCheck(name, rule.name, ",".join(rule.params), passes)
        )


def _compile_elements(
    plan: CompiledPlan,
    registry: Registry,
    name: str,
    col: Column,
    dtype: T.ArrayType,
    rules: list[tag.Rule],
    siblings,
    allow_driver_only: bool,
) -> None:
    """Per-element rules: one array<violation> per rule, with paths
    ``name.[i]`` matching the reference's path rendering
    (schema/context.go:25-43, array iteration array.go:42-45)."""
    elem_type = dtype.elementType
    arr = F.coalesce(col, F.array().cast(dtype))
    for rule in rules:
        d = registry.get(rule.name)
        if d.modifier:
            raise CompileError("omitempty inside 'dive' is not supported")

        def _fail_structs(r=rule):
            def elem_pred(x: Column) -> Column:
                ectx = RuleContext(
                    name=f"{name}.[]", col=x, dtype=elem_type, siblings=siblings
                )
                return registry.make(r.name, ectx, r.params)

            indexed = F.transform(
                arr,
                lambda x, i: F.struct(
                    F.coalesce(elem_pred(x), F.lit(False)).alias("ok"),
                    i.alias("i"),
                ),
            )
            failing = F.filter(indexed, lambda st: ~st["ok"])
            return F.transform(
                failing,
                lambda st: F.struct(
                    F.concat(
                        F.lit(f"{name}.["), st["i"].cast("string"), F.lit("]")
                    ).alias("field"),
                    F.lit(r.name).alias("code"),
                    F.lit(",".join(r.params)).alias("params"),
                ),
            )

        plan.elem_fail_arrays.append(_fail_structs())
