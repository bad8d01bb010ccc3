"""Physical-plan inspection helpers — make plan quality testable.

The reference has no physical layer (SURVEY.md §4); ours is Catalyst, so
"is the plan right" is a first-class property we assert in CI:

* filters/projections reach the parquet scan (PushedFilters / ReadSchema),
* the row-level path stays inside WholeStageCodegen with zero Python,
* shuffles (Exchange) appear only where the algebra demands them,
* small dimensions broadcast instead of shuffling the fact side.

All helpers parse ``df._jdf.queryExecution()`` output — strings, but the
tokens (Exchange, BatchScan, PushedFilters, WholeStageCodegen,
BroadcastHashJoin) are stable public explain vocabulary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet/DSv2 scan accepted (predicate pushdown proof)."""
    text = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Columns the scan actually reads (column-pruning proof)."""
    text = explain_str(df, "formatted")
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for f in m.group(1).split(","):
            name = f.split(":")[0].strip()
            if name:
                cols.append(name)
    return sorted(set(cols))


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the physical plan (broadcast
    exchanges excluded — they ship the small side, not the data).

    ``\\bExchange\\b`` already fails to match inside ``BroadcastExchange``
    (the preceding ``t`` is a word character), so no subtraction: shuffle
    exchanges print as ``Exchange hashpartitioning/…`` and are exactly
    the word-boundary matches."""
    plan = executed_plan(df)
    return len(re.findall(r"\bExchange\b", plan))


def count_op(df: DataFrame, op: str) -> int:
    return executed_plan(df).count(op)


def uses_python(df: DataFrame) -> bool:
    """True if any Python evaluation (UDF / mapInPandas) is in the plan."""
    return "Python" in executed_plan(df)


def n_codegen_stages(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans.  The executed plan prints them
    as ``*(n) Operator``; the formatted explain as ``WholeStageCodegen (n)``
    — accept either."""
    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    if ids:
        return len(ids)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))


def join_kinds(df: DataFrame) -> list[str]:
    plan = executed_plan(df)
    kinds = []
    for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        kinds.extend([k] * plan.count(k))
    return kinds


def assert_single_pass(df: DataFrame) -> None:
    """Row-level validation plans must be shuffle-free and Python-free
    unless the spec contains a pandas-UDF rule."""
    plan = executed_plan(df)
    assert "Exchange" not in plan, f"unexpected shuffle:\n{plan}"
