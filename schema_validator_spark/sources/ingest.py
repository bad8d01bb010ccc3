"""Malformed-record quarantine on semi-structured ingest (JSONL / CSV).

The validation surface BEFORE the engine sees typed rows: crawled /
log-shipped JSONL and CSV arrive with broken lines (truncated writes,
encoding garbage, schema drift), and a validation engine must ingest
them without either crashing (FAILFAST) or silently dropping rows
(DROPMALFORMED).  This wraps Spark's PERMISSIVE reader: every malformed
line is captured verbatim in a corrupt-record column, then split into a
typed good-rows frame and a raw quarantine frame — the standard
dead-letter pattern.

Scale shape: the reader is Spark's native JSON/CSV datasource (JVM
parsing, splittable files, predicate/column pruning on the good path);
the split is two codegen filters over ONE scan each — no Python, no
shuffle.  The report is a single map-side-combinable aggregation.

Gotcha handled here: Spark rejects any plan whose raw-file scan is
column-pruned down to ONLY the internal corrupt-record column
(``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``); the
documented workaround is ``.cache()``, which is exactly wrong at
10^12-row scale.  Instead every frame returned here genuinely requires
schema columns: the quarantine frame carries a ``partial`` struct of
whatever fields DID parse (useful for repair), and the report counts
per-column fill rates — so pruning can never reduce the scan to the
corrupt column alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantined(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """PERMISSIVE JSONL scan: ``schema`` columns plus ``_corrupt_record``
    holding the raw line for malformed records (NULL for good ones)."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv_quarantined(
    spark: SparkSession, path: str, schema: str, **options: str
) -> DataFrame:
    """PERMISSIVE CSV scan with the same quarantine contract."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )


def _anchored(df: DataFrame, pred):
    """AND the predicate with a tautology over EVERY schema column that
    constant folding cannot remove.  Two reasons full-width reference is
    required, not an optimization loss:

    1. Spark rejects plans whose raw-file scan is pruned to only the
       corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
       documented ``.cache()`` workaround is wrong at 10^12 rows.
    2. Corrupt-ness itself depends on which columns the parser is asked
       for: a short CSV row ("2,bb" under a 3-column schema) parses
       clean when pruning only requests the first field, so a pruned
       ``bad.count()`` would DISAGREE with ``bad.collect()``.  Row
       classification must not depend on the downstream projection, and
       that means every quarantine-relative plan pays a full-row parse
       — which is what a correct malformed-row check costs.

    Cost: one length(concat_ws(...)) per row inside codegen."""
    cols = [F.col(c).cast("string") for c in df.columns if c != CORRUPT_COL]
    return pred & (F.length(F.concat_ws("", *cols)) >= -1)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): typed rows with the corrupt column dropped,
    and dead-letter rows ``(source_file, raw, partial)`` — ``raw`` is
    the malformed line verbatim, ``partial`` a struct of the fields the
    PERMISSIVE parser still recovered (repair input; also what keeps
    the scan from being pruned to the corrupt column alone)."""
    schema_cols = [c for c in df.columns if c != CORRUPT_COL]
    good = df.filter(_anchored(df, F.col(CORRUPT_COL).isNull())).drop(CORRUPT_COL)
    bad = df.filter(_anchored(df, F.col(CORRUPT_COL).isNotNull())).select(
        F.input_file_name().alias("source_file"),
        F.col(CORRUPT_COL).alias("raw"),
        F.struct(*[F.col(c) for c in schema_cols]).alias("partial"),
    )
    return good, bad


def ingest_report(df: DataFrame) -> DataFrame:
    """One-row ingest audit in a single map-side-combinable pass:
    ``(n_rows, n_good, n_corrupt, n_null_<col>...)`` — the null counts
    are per-column missing-field rates among GOOD rows (schema-drift
    signal: a field that stopped arriving shows up here before any
    downstream rule fires)."""
    bad = F.col(CORRUPT_COL).isNotNull()
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(~bad, 1)).alias("n_good"),
        F.count(F.when(bad, 1)).alias("n_corrupt"),
    ]
    for c in df.columns:
        if c != CORRUPT_COL:
            aggs.append(
                F.count(F.when(~bad & F.col(c).isNull(), 1)).alias(f"n_null_{c}")
            )
    return df.agg(*aggs)
