"""Declarative check suite with thresholds — the Deequ
``VerificationSuite`` shape the row-level rule engine doesn't cover:
"this TABLE is acceptable when completeness(text) >= 0.99 and
uniqueness(doc_id) == 1.0", evaluated as ONE report with a per-check
pass/fail status.  The reference analog is the whole-struct Validate
verdict (validator.go:32-44); this is its dataset-level counterpart
mandated by the north rule's per-partition pass/fail summaries.

Metrics (Deequ names):

- ``size``                       — row count (no column)
- ``completeness(c)``            — non-null fraction
- ``compliance(predicate)``      — fraction of rows satisfying a SQL
                                   boolean expression (NULL -> false)
- ``uniqueness(c | (c1,c2,…))``  — values occurring exactly once / rows
- ``distinctness(c | (…))``      — distinct values / rows
- ``min/max/mean/sum/stddev(c)`` — the usual aggregates
- ``quantile(c, q)``             — EXACT interpolated percentile
                                   (Deequ's ApproxQuantile, exact form)
- ``approx_distinct(c)``         — HLL++ distinct estimate

NULL is a value for the frequency metrics (a column of all NULLs has
distinctness 1/n, not 0) — consistent with k_anonymity / discover_fds.
``uniqueness``/``distinctness`` accept a tuple of columns for composite
keys.

Scale shape: every scalar metric rides ONE map-side-combinable
aggregation pass over the table (``quantile`` uses the exact
percentile aggregate — swap in approx_percentile at 10^12 rows if the
value axis is huge); each distinct frequency column-set adds one
word-count-shaped groupBy whose output is distinct-value scale.  The
tiny 1-row metric frames cross-join (broadcast, no shuffle) and the
report is built by ``inline`` over a literal struct array — assertion
arithmetic never touches data rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALAR_METRICS = {
    "size", "completeness", "compliance",
    "min", "max", "mean", "sum", "stddev", "approx_distinct", "quantile",
}
_FREQ_METRICS = {"uniqueness", "distinctness"}
_OPS = {
    ">=": lambda v, t: v >= t,
    "<=": lambda v, t: v <= t,
    ">": lambda v, t: v > t,
    "<": lambda v, t: v < t,
    "==": lambda v, t: v == t,
}


@dataclass(frozen=True)
class Check:
    """One assertion: ``metric(column|predicate) op value``."""

    name: str
    metric: str
    op: str
    value: float
    column: str | tuple[str, ...] | None = None
    predicate: str | None = None
    q: float | None = None

    def __post_init__(self):
        if self.metric not in _SCALAR_METRICS | _FREQ_METRICS:
            raise ValueError(f"unknown metric {self.metric!r}")
        if self.op not in _OPS:
            raise ValueError(f"unknown op {self.op!r}")
        if self.metric == "compliance" and not self.predicate:
            raise ValueError("compliance needs a predicate")
        if self.metric not in ("size", "compliance") and not self.column:
            raise ValueError(f"{self.metric} needs a column")
        if self.metric == "quantile":
            if self.q is None or not 0.0 <= self.q <= 1.0:
                raise ValueError("quantile needs q in [0, 1]")
        if (
            isinstance(self.column, tuple)
            and self.metric not in _FREQ_METRICS
        ):
            raise ValueError(
                f"{self.metric} takes a single column, not a tuple"
            )

    @property
    def columns(self) -> tuple[str, ...]:
        if self.column is None:
            return ()
        if isinstance(self.column, tuple):
            return self.column
        return (self.column,)

    @property
    def subject(self) -> str:
        if self.metric == "compliance":
            return self.predicate
        if self.metric == "quantile":
            return f"{self.column} q={self.q:g}"
        if self.column is None:
            return "*"
        return ",".join(self.columns)


def _scalar_expr(c: Check):
    col = F.col(c.column) if c.column else None
    n = F.count(F.lit(1))
    if c.metric == "size":
        return n.cast("double")
    if c.metric == "completeness":
        return F.count(col) / n
    if c.metric == "compliance":
        return (
            F.sum(F.coalesce(F.expr(c.predicate), F.lit(False)).cast("long"))
            / n
        )
    if c.metric == "approx_distinct":
        return F.approx_count_distinct(col).cast("double")
    if c.metric == "quantile":
        # F.percentile keeps the column a quoted identifier (a column
        # named "a-b" must not parse as the expression a minus b)
        return F.percentile(col, F.lit(float(c.q))).cast("double")
    fn = {"min": F.min, "max": F.max, "mean": F.mean,
          "sum": F.sum, "stddev": F.stddev_samp}[c.metric]
    return fn(col).cast("double")


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check; returns
    ``(check, metric, subject, value, constraint, status)`` in the
    input order (``ord`` column dropped; value rounded 6dp).  status is
    'pass' / 'fail' / 'error' (error = the metric itself is NULL, e.g.
    mean of an all-NULL column)."""
    if not checks:
        raise ValueError("no checks given")
    freq_groups = sorted(
        {c.columns for c in checks if c.metric in _FREQ_METRICS}
    )
    group_idx = {g: i for i, g in enumerate(freq_groups)}

    metrics = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[_scalar_expr(c).alias(f"_m{i}") for i, c in enumerate(checks)
          if c.metric in _SCALAR_METRICS],
    )
    for g, gi in group_idx.items():
        freq = df.groupBy(
            *[F.col(col).alias(f"_k{j}") for j, col in enumerate(g)]
        ).agg(F.count(F.lit(1)).alias("_c"))
        one = freq.agg(
            F.count(F.lit(1)).alias(f"_g{gi}"),
            F.sum((F.col("_c") == 1).cast("long")).alias(f"_u{gi}"),
        )
        metrics = metrics.crossJoin(F.broadcast(one))

    rows = []
    for i, c in enumerate(checks):
        if c.metric in _SCALAR_METRICS:
            val = F.col(f"_m{i}")
        elif c.metric == "uniqueness":
            val = F.col(f"_u{group_idx[c.columns]}") / F.col("_n")
        else:  # distinctness
            val = F.col(f"_g{group_idx[c.columns]}") / F.col("_n")
        val = F.round(val.cast("double"), 6)
        cmp_ok = _OPS[c.op](val, F.lit(float(c.value)))
        status = (
            F.when(val.isNull(), F.lit("error"))
            .when(cmp_ok, F.lit("pass"))
            .otherwise(F.lit("fail"))
        )
        rows.append(
            F.struct(
                F.lit(i).alias("ord"),
                F.lit(c.name).alias("check"),
                F.lit(c.metric).alias("metric"),
                F.lit(c.subject).alias("subject"),
                val.alias("value"),
                F.lit(f"{c.op} {float(c.value):g}").alias("constraint"),
                status.alias("status"),
            )
        )
    return (
        metrics.select(F.inline(F.array(*rows)))
        .orderBy("ord")
        .drop("ord")
    )


def suite_passes(report: DataFrame) -> bool:
    """Driver-side verdict: True iff every check passed (1-row agg)."""
    row = report.agg(
        F.sum((F.col("status") != "pass").cast("long")).alias("bad")
    ).collect()[0]
    return (row["bad"] or 0) == 0
