"""Cross-column dependency profiling: Pearson correlation matrix and
categorical mutual information.

Deequ-parity analyzers (Correlation, MutualInformation) the per-column
profile (operators/profile.py) cannot see — they relate PAIRS of
columns.  Complements the functional-dependency check (exact 1:1
integrity) with the statistical tiers: "how linearly related are these
numerics" and "how many nats does one categorical carry about another".

Scale shapes:
- ``correlation_matrix``: ONE global aggregation computes all k·(k-1)/2
  ``corr`` pairs map-side-combined (Pearson co-moments are mergeable);
  the melt to (col_a, col_b, corr) rows is driver-side over a single
  collected row — no shuffle of data rows, no UDFs, same pattern as
  operators/pii.py.
- ``mutual_information``: ONE groupBy on the (a, b) pair (map-side
  combined, shuffle bounded by #tasks x joint cardinality); marginals
  and the MI sum are windows/aggs over the tiny joint-counts frame
  (joint-cardinality scale, not row scale).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def correlation_matrix(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Pairwise Pearson correlations: ``(col_a, col_b, n_rows, corr)``
    for every unordered pair, one row each, ``col_a < col_b`` in the
    column-list order.  ``cols`` defaults to every numeric column.
    ``corr`` is NULL when either side is constant (zero variance),
    matching SQL ``corr`` semantics; rounded 6dp."""
    if cols is None:
        cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, _NUMERIC)
        ]
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least two columns")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for a, b in combinations(cols, 2):
        # not F.corr: under ANSI mode a zero-variance side raises
        # DIVIDE_BY_ZERO inside the aggregate's final division.  The
        # covar/stddev form is the same mergeable-moment single pass,
        # and try_divide yields NULL for constant columns like SQL corr.
        aggs.append(
            F.round(
                F.try_divide(
                    F.covar_samp(F.col(a), F.col(b)),
                    F.stddev_samp(F.col(a)) * F.stddev_samp(F.col(b)),
                ),
                6,
            ).alias(f"{a}\x00{b}")
        )
    row = df.agg(*aggs).collect()[0].asDict()
    out = [
        (a, b, row["_n"], row[f"{a}\x00{b}"])
        for a, b in combinations(cols, 2)
    ]
    return df.sparkSession.createDataFrame(
        out, "col_a string, col_b string, n_rows long, corr double"
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, plus
    both marginal entropies and the normalized coefficient
    ``mi / min(h_a, h_b)`` (1 = one column determines the other,
    0 = independent; NULL when either entropy is 0).

    One row: ``(n_rows, card_a, card_b, h_a, h_b, mi, nmi)`` — floats
    rounded 6dp.  NULL is its own category, like every groupBy in this
    engine.  All terms use the identical float op order the SQL oracle
    replays: p_xy * ln(p_xy / (p_x * p_y)) with p = count / n computed
    divide-first.
    """
    joint = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("c_ab"))
    w_all = Window.partitionBy()
    per = (
        joint.withColumn("n", F.sum("c_ab").over(w_all))
        .withColumn("c_a", F.sum("c_ab").over(Window.partitionBy("_a")))
        .withColumn("c_b", F.sum("c_ab").over(Window.partitionBy("_b")))
        .withColumn("p_ab", F.col("c_ab") / F.col("n"))
        .withColumn("p_a", F.col("c_a") / F.col("n"))
        .withColumn("p_b", F.col("c_b") / F.col("n"))
    )
    return per.agg(
        F.max("n").alias("n_rows"),
        # count_distinct skips NULL; add it back as its own category
        (
            F.count_distinct(F.col("_a"))
            + F.max(F.when(F.col("_a").isNull(), 1).otherwise(0))
        ).alias("card_a"),
        (
            F.count_distinct(F.col("_b"))
            + F.max(F.when(F.col("_b").isNull(), 1).otherwise(0))
        ).alias("card_b"),
        # entropies from the joint frame: group joint cells by marginal
        # probability via sum of p_ab * ln(p_a) terms (each cell carries
        # its marginal's log weighted by the cell mass — sums to the
        # marginal entropy exactly)
        F.round(-F.sum(F.col("p_ab") * F.log(F.col("p_a"))), 6).alias("h_a"),
        F.round(-F.sum(F.col("p_ab") * F.log(F.col("p_b"))), 6).alias("h_b"),
        F.round(
            F.sum(
                F.col("p_ab")
                * F.log(F.col("p_ab") / (F.col("p_a") * F.col("p_b")))
            ),
            6,
        ).alias("mi"),
    ).select(
        "n_rows", "card_a", "card_b", "h_a", "h_b", "mi",
        F.round(
            F.when(
                F.least(F.col("h_a"), F.col("h_b")) > 0,
                F.col("mi") / F.least(F.col("h_a"), F.col("h_b")),
            ),
            6,
        ).alias("nmi"),
    )
