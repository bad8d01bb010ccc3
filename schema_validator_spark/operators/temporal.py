"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops (the
brief's preferred tier) — no cartesian products, no Python:

* ``asof_join`` — for each left row, the LATEST right row with the same
  key and ``right.ts <= left.ts`` (inclusive, "backward" direction; the
  kdb/pandas/DuckDB ASOF semantics).  Implemented with the union-window
  trick: tag both sides, union, one window per key ordered by (ts,
  side), carry the last non-null right payload forward, keep left rows.
  ONE shuffle (the window's hash partitioning by key) and NO join node
  at all — compare to the naive join+filter+row_number approach, which
  shuffles three times and explodes on wide tolerance.  Hot-key caveat:
  a single key serializes inside its window task, same trade as
  ``sessions.sessionize`` — ``asof_join_chunked`` below is the
  hot-key-safe tier (identical output, equivalence-tested).
* ``range_join_binned`` — all (left, right) pairs with equal keys and
  ``lower <= right.ts - left.ts <= upper``.  Naively an inequality
  join, which Spark plans as BroadcastNestedLoopJoin / cartesian —
  O(n·m).  Binning makes it an EQUI-join: bucket right rows by
  ``ts div B`` with bin width ``B = upper - lower``, explode each left
  row to its ≤ 2 candidate bins, hash-join on (key, bin), then apply
  the exact predicate.  All timestamp arithmetic in exact integer
  MICROSECONDS (``unix_micros`` / integer ``div``) — candidate
  generation and the final filter are bit-exact and engine-portable,
  zero float-boundary risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def _us(col):
    """Exact epoch microseconds.  TIMESTAMP_NTZ inputs (parquet default)
    are cast to TIMESTAMP first — interpreted in the session timezone,
    which this repo pins to UTC everywhere (session.py, bench.py,
    conftest.py), so the value is identical to DuckDB's ``epoch_us`` on
    the same naive timestamp."""
    return F.unix_micros(col.cast("timestamp"))



def _asof_prepare(left, right, key_cols, ts_col):
    """Shared as-of plumbing: payload-column resolution + the tagged
    union legs (l2, r2).  Both tiers use this, so the row-identical
    guarantee between them rests on ONE copy of the contract."""
    rpay_names = [c for c in right.columns if c not in set(key_cols)]
    payload_only = [c for c in rpay_names if c != ts_col]
    clash = set(payload_only) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    lpay_type = StructType(list(left.schema.fields))
    rpay_type = StructType(
        [f for f in right.schema.fields if f.name in set(rpay_names)]
    )
    l2 = left.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
        F.lit(1).alias("_side"),
    )
    r2 = right.filter(F.col(ts_col).isNotNull()).select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(None).cast(lpay_type).alias("_lpay"),
        F.struct(*[F.col(f.name) for f in rpay_type.fields]).alias("_rpay"),
        F.lit(0).alias("_side"),
    )
    return l2, r2, payload_only


def _asof_finish(matched, left, ts_col, payload_only, tolerance_seconds):
    """Shared as-of epilogue: tolerance gate + output projection over the
    `_match` struct."""
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        in_tol = (
            _us(F.col("_ts")) - _us(F.col(f"_match.{ts_col}"))
        ) <= F.lit(tol_us)
        matched = matched.withColumn("_match", F.when(in_tol, F.col("_match")))
    out_cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{ts_col}").alias(f"{ts_col}_right"))
    out_cols += [F.col(f"_match.{c}").alias(c) for c in payload_only]
    return matched.select(*out_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, enriched with the latest right
    row at-or-before its timestamp (matched ``ts_col`` exposed as
    ``<ts_col>_right``; all columns NULL when no match, or when the
    match is older than ``tolerance_seconds``).

    Right payload columns must not collide with left column names.
    Rows with NULL ``ts_col`` never match (on either side).  Duplicate
    right (key, ts) rows: the greatest payload struct wins
    (deterministic; dedupe upstream to control it).
    """
    l2, r2, payload_only = _asof_prepare(left, right, key_cols, ts_col)
    # right rows sort BEFORE left rows at equal ts -> inclusive match;
    # among equal-ts right rows the greatest payload lands last, so
    # last(ignorenulls) picks it deterministically.
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return _asof_finish(matched, left, ts_col, payload_only, tolerance_seconds)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    *,
    lower_seconds: float,
    upper_seconds: float,
) -> DataFrame:
    """All pairs with equal keys and ``lower <= right.ts - left.ts <=
    upper`` (bounds inclusive, fractional seconds allowed), as an
    equi-join on (key, time bin) — never a nested-loop.  Output: all
    left columns + all non-key right columns (names must not collide).
    NULL timestamps never pair."""
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    lo = int(round(lower_seconds * 1_000_000))
    hi = int(round(upper_seconds * 1_000_000))
    width = hi - lo
    if width <= 0:
        raise ValueError(
            "window narrower than 1 microsecond after rounding "
            f"(lower={lower_seconds}s, upper={upper_seconds}s) — timestamps "
            "have microsecond precision, so the bin width would be 0"
        )

    clash = (set(right.columns) - set(key_cols)) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")

    # integer `div` keeps binning exact at any epoch magnitude (a double
    # floor() sits within ~5e-11 of bin boundaries at year-2024 epochs —
    # too close for comfort when candidates must be a superset).
    l2 = left.withColumn("_lus", _us(F.col(left_ts))).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"(_lus + {lo}) div {width}"),
                F.expr(f"(_lus + {hi}) div {width}"),
            )
        ),
    )
    r2 = right.withColumn("_rus", _us(F.col(right_ts))).withColumn(
        "_bin", F.expr(f"_rus div {width}")
    )
    diff = F.col("_rus") - F.col("_lus")
    return (
        l2.join(r2, [*key_cols, "_bin"])
        .filter((diff >= lo) & (diff <= hi))
        .drop("_bin", "_lus", "_rus")
    )


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    tolerance_seconds: float | None = None,
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Hot-key-safe ``asof_join``: identical output, bounded tasks.

    The plain as-of window serializes a key's full history in one task —
    the same hot-entity trade as ``sessions.sessionize``, fixed the same
    way: window by (key, time chunk), then carry the last right payload
    ACROSS chunks via per-(key, chunk) summary rows.  Unlike chunked
    sessionization no adjacency constraint exists (a match can be
    arbitrarily old), so the carry is a running last-non-null over ALL
    prior chunk summaries — still one row per active chunk per key.
    Any ``chunk_seconds`` > 0 is valid; it only controls parallelism.

    Same contract as ``asof_join`` (inclusive backward match, greatest
    payload on right ts ties, NULL ts never matches, tolerance).
    """
    if chunk_seconds <= 0:
        raise ValueError("chunk_seconds must be positive")
    l2, r2, payload_only = _asof_prepare(left, right, key_cols, ts_col)
    u = l2.unionByName(r2).withColumn(
        "_chunk", F.floor(_us(F.col("_ts")) / F.lit(chunk_seconds * 1_000_000))
    )
    w = (
        Window.partitionBy(*key_cols, "_chunk")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("_local", F.last("_rpay", ignorenulls=True).over(w))

    # one summary row per active (key, chunk): the chunk's last right
    # payload (greatest (_ts, _rpay) among right rows — same tie rule as
    # the window order), then a running carry over PRIOR chunks.
    summ = local.groupBy(*key_cols, "_chunk").agg(
        F.max(
            F.when(F.col("_side") == 0, F.struct("_ts", "_rpay"))
        ).alias("_last_r")
    )
    ws = Window.partitionBy(*key_cols).orderBy(F.col("_chunk").asc())
    carried = (
        summ.withColumn(
            "_carried",
            F.last("_last_r", ignorenulls=True).over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select(*key_cols, "_chunk", F.col("_carried._rpay").alias("_carry"))
    )
    for c in [*key_cols, "_chunk"]:
        carried = carried.withColumnRenamed(c, f"_c_{c}")
    cond = [
        local[c].eqNullSafe(carried[f"_c_{c}"]) for c in [*key_cols, "_chunk"]
    ]
    matched = (
        local.join(carried, cond)  # null-safe: NULL keys/ts are groups too
        .withColumn("_match", F.coalesce(F.col("_local"), F.col("_carry")))
        .filter(F.col("_side") == 1)
    )
    return _asof_finish(matched, left, ts_col, payload_only, tolerance_seconds)
