"""PII governance scan — where does personal data live in this table?

Compliance-oriented complement to operators/clean.py's redaction: scan
every string column for the SAME pii patterns (single source of truth:
clean.PII_PATTERNS) and report per (column, pii_type) how many rows
match and how many spans occur.  This is the "data discovery" scan a
governance tool runs before deciding what to redact/deny — redaction
without a scan can't tell you which COLUMNS are contaminated.

Scale shape: ONE pass — every (column x pattern) pair contributes two
map-side-combinable aggregates (rows-matched count, span count via
``regexp_count``) to a single global aggregation producing ONE row; the
melt to (column, pii_type) rows is driver-side over #cols x #patterns
values.  No shuffle of data rows, no UDFs — regexes run inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .clean import PII_PATTERNS


def pii_types() -> list[tuple[str, str]]:
    """(pii_type, pattern) pairs, e.g. ('EMAIL', ...) — names derived
    from the redaction tokens."""
    return [(tok.strip("<>"), pat) for pat, tok in PII_PATTERNS]


def pattern_scan(
    df: DataFrame,
    cols: list[str] | None,
    patterns: list[tuple[str, str]],
    type_col: str,
) -> DataFrame:
    """Shared governance-scan shape (pii_scan + secrets.secret_scan):
    per (column, pattern-type) ``(column, <type_col>, n_rows,
    n_matched, n_spans, match_rate)`` — every (column x pattern) pair
    is two map-side-combinable aggregates in ONE global aggregation;
    the melt to rows is driver-side over #cols x #patterns values.
    ``cols=None`` scans every string column."""
    if not patterns:
        raise ValueError("empty pattern list")
    if cols is None:
        cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        ]
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        s = F.coalesce(F.col(c), F.lit(""))
        for name, pat in patterns:
            aggs.append(
                F.count(F.when(s.rlike(pat), 1)).alias(f"{c}\x00{name}\x00m")
            )
            aggs.append(
                F.sum(F.regexp_count(s, F.lit(pat))).alias(f"{c}\x00{name}\x00s")
            )
    row = df.agg(*aggs).collect()[0].asDict()
    n_rows = row["_rows"]
    out = []
    for c in cols:
        for name, _ in patterns:
            m = row[f"{c}\x00{name}\x00m"]
            s = row[f"{c}\x00{name}\x00s"]
            rate = round(m / n_rows, 6) if n_rows else 0.0
            out.append((c, name, n_rows, m, s, rate))
    return df.sparkSession.createDataFrame(
        out,
        f"column string, {type_col} string, n_rows long, n_matched long, "
        "n_spans long, match_rate double",
    )


def pii_scan(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per (column, pii_type) PII exposure report:
    ``(column, pii_type, n_rows, n_matched, n_spans, match_rate)``.
    ``cols`` defaults to every string column."""
    return pattern_scan(df, cols, pii_types(), "pii_type")
