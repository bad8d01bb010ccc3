"""EXACT edit-distance similarity self-join via deletion-neighborhood
blocking (FastSS, Bocek et al. 2007; the SymSpell scheme) — the
typo-tolerant record-matching tier next to setsim's token-set PPJoin.

Guarantee: if levenshtein(s, t) <= d then the depth-d deletion
neighborhoods D_d(s) and D_d(t) intersect (align the two strings; drop
from each side the <= d positions that are substituted / inserted /
deleted and both collapse onto the common matched subsequence).  So an
equi-join on deletion variants has ZERO false negatives; the exact
``levenshtein`` verify (JVM built-in) removes the false positives.
The reference's nearest analogs are its string rules (eq_ignore_case,
contains — rule/strings.go); this is the cross-row generalization the
north rule's entity-resolution tier needs.

Scale shape: per-row work is O(L^d) short strings (L ~ tens for keys /
names), all generated as ONE codegen-friendly SQL expression — no
Python.  Candidates come from a variant equi-join; bucket sizes are
bounded by how many strings share a subsequence, and a degenerate
bucket (e.g. thousands of length-<=d strings all producing "") can be
capped + logged exactly like the LSH tiers (``max_bucket_size``).
The verify runs once per DISTINCT candidate pair (pairs sharing many
variants are deduped BEFORE levenshtein).  Every shuffle is
variant-count shaped and map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from .dedup import _cap_hot_buckets

#: depth-1 deletion neighborhood of column ``c`` (SQL fragment) —
#: every string obtained by deleting exactly one character.
_DEL1 = (
    "transform(sequence(1, length({c})), i ->"
    " concat(substring({c}, 1, i - 1),"
    " substring({c}, i + 1, length({c}))))"
)


def _variants_expr(col: str, max_dist: int):
    """array<string> of all deletion variants of ``col`` up to depth
    ``max_dist`` (including the string itself), distinct."""
    d1 = _DEL1.format(c=col)
    parts = [f"array({col})", d1]
    if max_dist == 2:
        parts.append(
            f"flatten(transform({d1}, _v0 -> " + _DEL1.format(c="_v0") + "))"
        )
    return F.expr(f"array_distinct(concat({', '.join(parts)}))")


def edit_join_exact(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    max_dist: int = 1,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist``, EXACT:
    ``(id_a, id_b, dist)`` with ``id_a < id_b``.  NULL / empty strings
    are excluded (nothing to match on).  ``max_dist`` must be 1 or 2 —
    the deletion-neighborhood size is O(L^d) per string, and beyond
    d=2 a q-gram scheme wins.

    ``max_bucket_size`` (optional) caps degenerate variant buckets with
    a logged drop count, same contract as the LSH candidate generators;
    leave it None for a fully exact join.
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    base = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
        .filter(F.col("_s").isNotNull() & (F.length("_s") > 0))
    )
    variants = base.select(
        "_id",
        "_s",
        F.explode(_variants_expr("_s", max_dist)).alias("_v"),
    )
    variants = _cap_hot_buckets(
        variants, ["_v"], max_bucket_size,
        what="edit_join_exact", log_dropped=log_dropped,
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b, on="_v")
        .filter(F.col("a._id") < F.col("b._id"))
        # length filter: |len(a) - len(b)| > d is impossible at ed <= d
        .filter(
            F.abs(F.length("a._s") - F.length("b._s")) <= F.lit(max_dist)
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._s").alias("_sa"),
            F.col("b._s").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= F.lit(max_dist))
        .select("id_a", "id_b", "dist")
    )
