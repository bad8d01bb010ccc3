"""Leakage-safe train/val/test split — cluster-consistent holdout
assignment.  Hashing each DOCUMENT into a split (the naive recipe)
puts near-duplicate pairs on opposite sides of the train/eval fence —
exactly the contamination ``packing.shard_leakage`` audits.  The fix
(standard in dedup-aware pipeline papers: Lee et al. 2021 §5,
SemDeDup's eval protocol): assign by the document's duplicate-CLUSTER
representative, so every member of a connected near-dup component
lands in the same split *by construction* — split purity is a
property of the function, not a hope about the data.

Reference anchor: determinism-by-hash mirrors the reference's pure
rule evaluation (schema-validator validator.go — no RNG anywhere);
part of the engine-extension surface SURVEY §2.9 mandates.

Scale shape: connected components run at PAIR scale (dup pairs are
sparse — ``dedup.cluster_pairs``: one job/iteration, edges
materialized once), never at corpus scale.  The corpus sees one
left join against the cluster frame (node-scale, broadcast when it
fits — AQE decides) and a pure codegen projection: split =
md5(representative, salt) compared against PRECOMPUTED hex-string
thresholds — fixed-width lowercase hex compares lexicographically
exactly like its numeric value, so there is no float anywhere and any
engine replaying the same md5 reproduces the assignment bit-exactly.

Determinism: same (ids, pairs, ratios, salt) -> same assignment, on
any cluster size, any partitioning.  Changing ``salt`` re-rolls the
assignment without touching cluster structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_W = 15  # first 15 hex chars of md5: 60 bits, inside a bigint


def split_thresholds(ratios: dict[str, float]) -> list[tuple[str, str]]:
    """``[(name, upper_hex_bound)]`` in declaration order; the last
    split's bound is the el-else branch (no string ever exceeds it).
    Exposed so oracles/tests can replay the exact same boundaries."""
    if len(ratios) < 2:
        raise ValueError("need at least two splits")
    if any(not n for n in ratios):
        raise ValueError("empty split name")
    if any(f <= 0 for f in ratios.values()):
        raise ValueError("split fractions must be > 0")
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(ratios)
    for name in names[:-1]:
        cum += ratios[name]
        out.append((name, format(int(cum * 16**_HEX_W), "015x")))
    out.append((names[-1], "g" * _HEX_W))  # 'g' > 'f': never reached
    return out


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    *,
    ratios: dict[str, float] | None = None,
    salt: str = "v1",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Per-document split assignment ``(id, cluster_id, split)``.

    ``pairs`` is any duplicate/near-duplicate pair frame (exact sha
    pairs, MinHash-LSH candidates, SemDeDup output …); ``cluster_id``
    is the connected component's min id (own id for documents in no
    pair).  Every pair — and transitively every component — gets ONE
    split.  Ratios are honored in expectation over clusters (a
    mega-cluster is indivisible by design: splitting it would be the
    leak).  Default ratios: 90/5/5 train/val/test.
    """
    if ratios is None:
        ratios = {"train": 0.90, "val": 0.05, "test": 0.05}
    bounds = split_thresholds(ratios)
    if "cluster_id" in df.columns:
        raise ValueError("reserved column 'cluster_id' present in input")
    from .dedup import cluster_pairs

    cc = cluster_pairs(pairs, id_a=id_a, id_b=id_b, max_iters=max_iters)
    base = df.select(id_col).join(
        cc.withColumnRenamed("doc_id", id_col), on=id_col, how="left"
    )
    rep = F.coalesce(F.col("cluster_id"), F.col(id_col))
    h15 = F.substring(
        F.md5(F.concat(rep.cast("string"), F.lit(salt))), 1, _HEX_W
    )
    split = None
    for name, bound in bounds[:-1]:
        cond = h15 < F.lit(bound)
        split = (
            F.when(cond, F.lit(name))
            if split is None
            else split.when(cond, F.lit(name))
        )
    split = split.otherwise(F.lit(bounds[-1][0]))
    return base.select(
        F.col(id_col),
        rep.alias("cluster_id"),
        split.alias("split"),
    )


def split_leakage(
    assignment: DataFrame, pairs: DataFrame, *,
    id_col: str = "doc_id", id_a: str = "id_a", id_b: str = "id_b",
) -> DataFrame:
    """Audit: pairs whose members sit in DIFFERENT splits — empty for
    any :func:`leakage_safe_split` assignment (pinned in tests), and
    the damage report for a naive per-document hash split."""
    sa = assignment.select(
        F.col(id_col).alias(id_a), F.col("split").alias("_sa")
    )
    sb = assignment.select(
        F.col(id_col).alias(id_b), F.col("split").alias("_sb")
    )
    return (
        pairs.join(sa, id_a)
        .join(sb, id_b)
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            id_a, id_b,
            F.col("_sa").alias("split_a"), F.col("_sb").alias("split_b"),
        )
    )
