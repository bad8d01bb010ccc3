"""Z-order (Morton) clustering key as a pure Catalyst expression.

Interleaves the low ``bits`` bits of k non-negative integer columns into
one long, so that sorting/range-partitioning on the key keeps rows close
in EVERY dimension close on disk — the standard lakehouse layout for
multi-dimensional data skipping (Delta OPTIMIZE ZORDER, Iceberg sort
orders).  Cluster a snapshot table with
``commit_clustered(df, ["_z"], n, stats_cols=[dim1, dim2])`` and both
dimensions' per-file min/max stay tight, so :meth:`read_range` prunes
files on either dimension.

Pure bit arithmetic — codegen'd JVM expression, zero Python per row, and
trivially replayable in any SQL engine (the DuckDB oracle re-derives it
with the same shifts).  Inputs must already be bucketed/scaled into
``[0, 2**bits)``; higher bits are ignored, NULL counts as 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[str], *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column in
    ``cols`` (column i supplies output bit ``b * k + i`` from its input
    bit ``b``)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    k = len(cols)
    if bits < 1 or bits * k > 63:
        raise ValueError(f"bits*len(cols) must be in [1, 63], got {bits * k}")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            src = F.coalesce(F.col(c).cast("long"), F.lit(0))
            bit = F.shiftright(src, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + i)
    return z


def zorder_key_sql(cols: list[str], *, bits: int = 16) -> str:
    """The same interleave as ANSI-ish SQL text (DuckDB-compatible) —
    used to build oracle queries that replay the key bit-for-bit."""
    if not cols:
        raise ValueError("zorder_key_sql needs at least one column")
    k = len(cols)
    if bits < 1 or bits * k > 63:
        raise ValueError(f"bits*len(cols) must be in [1, 63], got {bits * k}")
    terms = [
        f"((({c} >> {b}) & 1) << {b * k + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"
