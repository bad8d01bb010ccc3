"""Custom stateful streaming operator: running per-group validation
totals via ``applyInPandasWithState``.

The windowed summary (streaming/validate.py) is Spark's built-in stateful
agg; this is the *custom* state path — a per-group running counter that
survives across micro-batches and emits an updated row per batch, with a
processing-time timeout to expire idle groups.  The state per group is
three longs, so state-store size is bounded by live-group cardinality
regardless of row volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..engine import FAILS_COL, ValidationEngine


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_rows_failed", T.LongType()),
        T.StructField("n_violations", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)

STATE_SCHEMA = "n_rows long, n_rows_failed long, n_violations long, batches long"


def running_totals(
    engine: ValidationEngine,
    stream: DataFrame,
    group_col: str,
    *,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of cumulative per-group validation totals.

    Each micro-batch updates (n_rows, n_rows_failed, n_violations,
    batches_seen) for the groups present in the batch and emits their new
    totals.  Idle groups expire after ``idle_timeout_ms`` (processing
    time), emitting a final row before the state is dropped.
    """
    ann = engine.annotate(stream)
    n_fails = F.size(F.col(FAILS_COL))
    slim = ann.select(
        F.col(group_col).cast("string").alias("group"),
        (n_fails > 0).cast("long").alias("_failed"),
        n_fails.cast("long").alias("_viol"),
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, nf, nv, b = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], n, nf, nv, b)],
                columns=["group", "n_rows", "n_rows_failed", "n_violations",
                         "batches_seen"],
            )
            return
        n = nf = nv = 0
        for pdf in pdfs:
            n += len(pdf)
            nf += int(pdf["_failed"].sum())
            nv += int(pdf["_viol"].sum())
        if state.exists:
            pn, pnf, pnv, pb = state.get
        else:
            pn = pnf = pnv = pb = 0
        totals = (pn + n, pnf + nf, pnv + nv, pb + 1)
        state.update(totals)
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(key[0], *totals)],
            columns=["group", "n_rows", "n_rows_failed", "n_violations",
                     "batches_seen"],
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return slim.groupBy("group").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
