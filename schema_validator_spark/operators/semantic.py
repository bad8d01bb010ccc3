"""Semantic-type detection: which FORMAT rule does a column already obey?

The discovery pass that powers format-rule suggestion: profile string
columns against the engine's own format regexes (single source of
truth: rules/formats.py `_REGEX_RULES`, the reference's verbatim
patterns) plus a few structural types (integer/decimal/date/email/ip),
and report per (column, type) match rates over NON-NULL values.  A
dominant type (rate >= threshold) becomes a suggested rule — the
format-level counterpart of operators/suggest.py's value-bound
suggestions, and the same single-pass shape as operators/pii.py.

Scale shape: ONE global aggregation — every (column x detector) pair is
a map-side-combinable conditional count; the melt to rows is
driver-side over one collected row.  No shuffle of data rows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..rules.formats import _REGEX_RULES, _UUID_RE

# Curated, non-redundant detector set (the 40-rule registry has many
# same-shape hash aliases); all RE2-safe so the oracle replays them.
DETECTORS: list[tuple[str, str]] = [
    ("integer", r"^[+-]?\d+$"),
    ("decimal", r"^[+-]?\d+\.\d+$"),
    ("iso_date", r"^\d{4}-\d{2}-\d{2}$"),
    ("iso_datetime", r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"),
    ("ipv4", r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"),
    ("uuid", _UUID_RE),
    ("url", r"^https?://[^\s]+$"),
    ("ssn", _REGEX_RULES["ssn"]),
    ("e164_phone", _REGEX_RULES["e164"]),
    ("hexadecimal", _REGEX_RULES["hexadecimal"]),
    ("md5_hash", _REGEX_RULES["md5"]),
    ("sha256_hash", _REGEX_RULES["sha256"]),
    ("semver", _REGEX_RULES["semver"]),
    ("lang_tag", _REGEX_RULES["bcp47_language_tag"]),
]


def detect_semantic_types(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Per (column, detector) report over non-null values:
    ``(column, sem_type, n_nonnull, n_match, match_rate)`` (6dp).
    ``cols`` defaults to every string column."""
    if cols is None:
        cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        ]
    aggs = []
    for c in cols:
        s = F.col(c)
        aggs.append(F.count(s).alias(f"{c}\x00nn"))
        for name, pat in DETECTORS:
            aggs.append(
                F.count(F.when(s.rlike(pat), 1)).alias(f"{c}\x00{name}")
            )
    row = df.agg(*aggs).collect()[0].asDict()
    out = []
    for c in cols:
        nn = row[f"{c}\x00nn"]
        for name, _ in DETECTORS:
            m = row[f"{c}\x00{name}"]
            rate = round(m / nn, 6) if nn else 0.0
            out.append((c, name, nn, m, rate))
    return df.sparkSession.createDataFrame(
        out,
        "column string, sem_type string, n_nonnull long, n_match long, "
        "match_rate double",
    )


def suggest_format_rules(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    min_rate: float = 0.95,
    min_rows: int = 20,
) -> dict[str, list[str]]:
    """Dominant detected types per column: ``{column: [sem_type, ...]}``
    for types matching at least ``min_rate`` of non-null values (and at
    least ``min_rows`` non-nulls — tiny evidence suggests nothing).
    Multiple types can co-dominate (every md5 is also hexadecimal);
    callers pick the most specific."""
    rep = detect_semantic_types(df, cols).collect()
    out: dict[str, list[str]] = {}
    for r in rep:
        if r["n_nonnull"] >= min_rows and r["match_rate"] >= min_rate:
            out.setdefault(r["column"], []).append(r["sem_type"])
    return out
