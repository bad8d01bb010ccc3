"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship run: full constraint-suite validation over the
sf0.001 documents table (violations output).

``queries()`` — one entry per implemented operator family from
SURVEY.md §2 (row-level rule packs, table-level uniqueness / referential /
drift, dedup tiers, ANN, text analysis).  Each callable takes
(spark, sf_dir) and returns a DataFrame whose column names match the
corresponding ``oracle_sql()`` exactly.

``oracle_sql()`` — DuckDB-runnable ANSI SQL over the same parquet views.
EVERY query has an oracle (217/217), including the approximate tiers
(MinHash LSH, SimHash, SRP/IVF ANN, PSI): each is deterministic and its
ground truth is re-derived exactly in SQL — see the per-query docstrings
for why the approximate result provably equals the exact set here.

Round 5: the 15k-line monolith is split into the ``oracles/`` package
(VERDICT r4 order #3) — segment modules hold the query callables and
oracle SQL in contract order, ``oracles/registry.py`` holds the dicts.
The contract (names, dict order, SQL bytes) is pinned across the split
by tests/test_contract_pin.py.
"""

from __future__ import annotations

import os
import sys

# the driver may import this file by absolute path; make the sibling
# oracles/ package importable regardless of the caller's sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from oracles._shared import _doc_engine, _t  # noqa: E402
from oracles.registry import oracle_sql, queries  # noqa: E402

__all__ = ["entry", "queries", "oracle_sql"]


def entry(spark: SparkSession) -> DataFrame:
    """Full validation suite over sf0.001 documents → violations table."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    return _doc_engine().run(docs).violations
