"""Value-pattern (mask) profiling — the classic data-profiling view the
format detectors can't give: map every character to its class
(``A`` = upper, ``a`` = lower, ``9`` = digit, punctuation kept) and
rank the masks per column.  One look at the histogram shows "all
values are ``Aa+#9+``, except 12 rows that are ``9+``" — a format
anomaly no predefined regex was watching for.  semantic_types matches
KNOWN formats; this surfaces the unknown ones (and writes the regex
for you: a dominant mask is a format rule waiting to be pinned).

Scale shape: masking is a fixed regexp_replace chain riding the scan
(pure codegen); the (column, mask) groupBy is map-side combined and
bounded by distinct masks (far below distinct values — that's the
point of masking); ranking is a window over that tiny frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mask(col, compress: bool):
    m = F.regexp_replace(col, "[A-Z]+" if compress else "[A-Z]", "A")
    m = F.regexp_replace(m, "[a-z]+" if compress else "[a-z]", "a")
    m = F.regexp_replace(m, "[0-9]+" if compress else "[0-9]", "9")
    # class runs collapse via the +-quantifiers above (punctuation runs
    # stay verbatim) — deliberately NO backreference form: the oracle
    # replays these in RE2, which has no backreferences
    return m


def value_patterns(
    df: DataFrame,
    cols: list[str],
    *,
    top_k: int = 10,
    compress: bool = True,
) -> DataFrame:
    """``(column, mask, n, share, rank)`` — the ``top_k`` most frequent
    masks per column (NULL values excluded; ``share`` is of non-null
    rows, rounded 6dp).  ``compress=True`` collapses repeated classes
    (``Customer#000000042`` -> ``Aa+#9+`` reads ``Aa#9``), so mask
    cardinality stays bounded by STRUCTURE, not value length.  Ties
    rank deterministically (count desc, mask asc)."""
    if not cols:
        raise ValueError("no columns given")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    # ONE stack-unpivot pass (the profile.py pattern — not a scan per
    # column); the mask chain then runs once over the unpivoted value
    parts = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    u = (
        df.selectExpr(f"stack({len(cols)}, {parts}) as (column, _val)")
        .select("column", _mask(F.col("_val"), compress).alias("mask"))
        .filter(F.col("mask").isNotNull())
    )
    counts = u.groupBy("column", "mask").agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("column")
    wr = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("mask").asc()
    )
    return (
        counts.withColumn("share", F.round(F.col("n") / F.sum("n").over(wc), 6))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select("column", "mask", "n", "share", "rank")
    )
