"""Constraint suggestion — profile a table and propose the validation
spec it already satisfies (the Deequ ConstraintSuggestion idea applied
to this engine's rule model, reference rule names throughout).

Two bounded passes, both metadata-scale on the driver:

* pass 1 — ONE aggregation row over the table: per column count,
  null count, exact-or-approx distinct count, min/max (numerics),
  min/max length (strings).  Map-side combinable; one shuffle.
* pass 2 — enum candidates, fetched ONLY for the string columns pass 1
  proved low-cardinality (``n_distinct <= enum_max``): a second single
  aggregation collecting ``sort_array(collect_set(col))`` for just those
  columns — driver memory bounded by ``enum_max * n_enum_cols`` values,
  never by table cardinality.

Suggested rules (reference names — the suggested spec compiles straight
into :class:`~schema_validator_spark.engine.ValidationEngine`, and
re-validating the profiled table yields ZERO violations, pinned in
tests):

* ``required``      — column has no NULLs
* ``unique``        — distinct count == non-null count (skipped under
  ``approx=True``: an approximate distinct count cannot PROVE uniqueness)
* ``oneof v1 ...``  — low-cardinality string column's observed values
* ``min``/``max``   — observed value bounds (numerics) or observed
  length bounds (strings) — the reference's octet-length polymorphism
  (SURVEY.md §2.3) means the same rule names express both

At 10^12 rows run with ``approx=True``: distinct counts become
HLL-sketch estimates (one pass, no exact-distinct expand), and
uniqueness/enum suggestions are skipped rather than guessed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tag import Rule

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    enum_max: int = 10,
    approx: bool = False,
) -> dict:
    """The two bounded profiling passes.  Returns
    ``{col: {"rows", "nulls", "distinct", "min", "max", "min_len",
    "max_len", "values"}}`` (``values`` only for enum candidates)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(cols) if cols is not None else list(fields)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        # `required` in the reference fails on the type's ZERO VALUE
        # (IsNilOrZero, SURVEY §2.5) — 0 / '' / false — not just NULL, so
        # the suggestion must profile emptiness with the same semantics
        if isinstance(dt, _NUMERIC):
            empty = F.col(c).isNull() | (F.col(c) == 0)
        elif isinstance(dt, T.StringType):
            empty = F.col(c).isNull() | (F.col(c) == "")
        elif isinstance(dt, T.BooleanType):
            empty = F.col(c).isNull() | (~F.col(c))
        else:
            empty = F.col(c).isNull()
        aggs.append(F.count(F.when(empty, 1)).alias(f"{c}__empty"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        else:
            aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.octet_length(c)).alias(f"{c}__min_len"))
            aggs.append(F.max(F.octet_length(c)).alias(f"{c}__max_len"))
    row = df.agg(*aggs).collect()[0].asDict()

    out = {}
    for c in cols:
        st = {
            "rows": row["_rows"],
            "nulls": row[f"{c}__nulls"],
            "empty": row[f"{c}__empty"],
            "distinct": row[f"{c}__distinct"],
            "min": row.get(f"{c}__min"),
            "max": row.get(f"{c}__max"),
            "min_len": row.get(f"{c}__min_len"),
            "max_len": row.get(f"{c}__max_len"),
        }
        out[c] = st

    if not approx:
        enum_cols = [
            c for c in cols
            if isinstance(fields[c], T.StringType)
            and 0 < out[c]["distinct"] <= enum_max
        ]
        if enum_cols:
            vals = df.agg(*[
                F.sort_array(F.collect_set(c)).alias(c) for c in enum_cols
            ]).collect()[0].asDict()
            for c in enum_cols:
                out[c]["values"] = vals[c]
    return out


def suggest_constraints(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    enum_max: int = 10,
    approx: bool = False,
) -> dict[str, list[Rule]]:
    """Engine-ready suggested spec: ``{column: [Rule, ...]}``."""
    prof = profile_columns(df, cols, enum_max=enum_max, approx=approx)
    spec: dict[str, list[Rule]] = {}
    for c, st in prof.items():
        rules: list[Rule] = []
        nonnull = st["rows"] - st["nulls"]
        required = st["rows"] > 0 and st["empty"] == 0
        if required:
            rules.append(Rule("required", ()))
        if not approx and nonnull > 0 and st["distinct"] == nonnull:
            rules.append(Rule("unique", ()))
        if "values" in st:
            rules.append(Rule("oneof", tuple(st["values"])))
        if st["min"] is not None:
            rules.append(Rule("min", (_fmt(st["min"]),)))
            rules.append(Rule("max", (_fmt(st["max"]),)))
        elif st["min_len"] is not None:
            rules.append(Rule("min", (str(st["min_len"]),)))
            rules.append(Rule("max", (str(st["max_len"]),)))
        if rules and not required:
            # empties exist and are accepted: skip value rules on them,
            # the reference's `omitempty` idiom (other.go zero-value skip)
            rules.insert(0, Rule("omitempty", ()))
        if rules:
            spec[c] = rules
    return spec


def split_row_and_table(
    spec: dict[str, list[Rule]],
) -> tuple[dict[str, list[Rule]], list[str]]:
    """Split a suggested spec into its row-level half (engine-compilable
    under REAL semantics) and the table-level uniqueness half: `unique`
    is a stub in the reference's row model, and this engine's
    ``parity_stubs=False`` registry refuses to pretend a row expression
    can check it — real uniqueness lives in operators.uniqueness
    (duplicate_keys / exact_uniqueness_stats).  Returns
    ``(row_spec, unique_cols)``."""
    row_spec = {}
    unique_cols = []
    for c, rules in spec.items():
        kept = [r for r in rules if r.name != "unique"]
        if any(r.name == "unique" for r in rules):
            unique_cols.append(c)
        if kept:
            row_spec[c] = kept
    return row_spec, unique_cols


def _fmt(v) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


def suggestions_df(df: DataFrame, cols: list[str] | None = None,
                   *, enum_max: int = 10) -> DataFrame:
    """Suggestions as rows ``(column, rule, param, num_param)`` — string
    params in ``param`` ('' when none, enum values '|'-joined), numeric
    bounds in ``num_param`` (so engines compare them as numbers, not
    text).  Exact profiling (the oracle-checkable form)."""
    spark = df.sparkSession
    prof = profile_columns(df, cols, enum_max=enum_max, approx=False)
    rows = []
    for c, st in prof.items():
        nonnull = st["rows"] - st["nulls"]
        crows = []
        required = st["rows"] > 0 and st["empty"] == 0
        if required:
            crows.append((c, "required", "", None))
        if nonnull > 0 and st["distinct"] == nonnull:
            crows.append((c, "unique", "", None))
        if "values" in st:
            crows.append((c, "oneof", "|".join(st["values"]), None))
        if st["min"] is not None:
            crows.append((c, "min", "", float(st["min"])))
            crows.append((c, "max", "", float(st["max"])))
        elif st["min_len"] is not None:
            crows.append((c, "min", "", float(st["min_len"])))
            crows.append((c, "max", "", float(st["max_len"])))
        if crows and not required:
            crows.insert(0, (c, "omitempty", "", None))
        rows.extend(crows)
    return spark.createDataFrame(
        rows, "column string, rule string, param string, num_param double"
    )
