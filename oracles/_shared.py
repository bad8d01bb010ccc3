"""Shared helpers for the driver-contract modules: table reader, the doc rule spec, and the cross-family SQL string builders."""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_validator_spark import ValidationEngine
from schema_validator_spark.functions import classifier as QC
from schema_validator_spark.functions import similarity as V
from schema_validator_spark.functions import text as X
from schema_validator_spark.operators import (
    ann,
    dedup,
    drift,
    referential,
    skew,
    uniqueness,
)



# ---------------------------------------------------------------------------
# shared bits


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


DOC_SPEC = {
    "text": "required",
    "lang": "required|oneof=en,es,de,fr",   # zh deliberately outside → violations
    "source": "required|startswith=src|endswith=0",
    "n_chars": "min=1|max=100000",
}


def _doc_engine() -> ValidationEngine:
    return ValidationEngine(DOC_SPEC, key_cols=["doc_id"], partition_cols=["lang"])


# NOTE: watermarks require zoned TIMESTAMP (NTZ rejected by
# EventTimeWatermark), so hour-window starts assume a UTC session — true
# for the driver gate and conftest alike.
EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _check_suite_def():
    from schema_validator_spark.operators.checks import Check

    return [
        Check("has rows", "size", ">=", 100),
        Check("text filled", "completeness", ">=", 0.99, column="text"),
        Check("lang filled", "completeness", ">=", 0.999, column="lang"),
        Check("doc ids unique", "uniqueness", "==", 1.0, column="doc_id"),
        Check("langs are few", "distinctness", "<=", 0.01, column="lang"),
        Check("n_chars in range", "compliance", ">=", 0.95,
              predicate="n_chars between 1 and 100000"),
        Check("mean doc length", "mean", ">=", 50.0, column="n_chars"),
        Check("max doc length", "max", "<=", 100000.0, column="n_chars"),
        Check("median doc length", "quantile", ">=", 50.0,
              column="n_chars", q=0.5),
        Check("doc keyed by id+source", "uniqueness", "==", 1.0,
              column=("doc_id", "source")),
    ]


def _kw_case_sql(var: str) -> str:
    """``case lang when 'py' then {var} in (...) ... else false end``
    membership test over functions/identifiers.KEYWORDS — the shared
    stop-list replay for the dobf/halstead oracles."""
    from schema_validator_spark.functions.identifiers import KEYWORDS

    cases = "\n                 ".join(
        "when '{lg}' then {v} in ({ws})".format(
            lg=lg, v=var, ws=", ".join(f"'{w}'" for w in words)
        )
        for lg, words in sorted(KEYWORDS.items())
    )
    return f"case lang\n                 {cases}\n                 else false end"


def _duck_lit(s: str) -> str:
    """Render a Python string as a DuckDB expression, translating
    newline/tab to chr() calls (DuckDB standard literals have no escape
    sequences) and doubling single quotes.  Returns '' -> `''`."""
    if s == "":
        return "''"
    parts: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch in ("\n", "\t"):
            if buf:
                parts.append("'" + "".join(buf).replace("'", "''") + "'")
                buf = []
            parts.append(f"chr({ord(ch)})")
        else:
            buf.append(ch)
    if buf:
        parts.append("'" + "".join(buf).replace("'", "''") + "'")
    return " || ".join(parts)


def _duck_splice(tmpl: str, kexpr: str = "cast(doc_id as varchar)") -> str:
    """DuckDB expression: ``tmpl`` with every '@' replaced by
    ``kexpr`` — the SQL twin of _clone_splice, shared by every
    template-synthesis oracle."""
    parts = tmpl.split("@")
    out = []
    for i, p in enumerate(parts):
        if i:
            out.append(kexpr)
        if p:
            out.append(_duck_lit(p))
    return " || ".join(out) if out else "''"


def _esc_sq(p: str) -> str:
    """Escape single quotes for interpolation into a DuckDB string
    literal — EVERY oracle that inlines a regex/pattern from a shared
    rule table must route it through here (one hygiene level for every
    single-source-of-truth constant)."""
    return p.replace("'", "''")
