"""JSON spec inference — the semi-structured counterpart of
operators/suggest.py: given a STRING column carrying JSON objects,
discover the schema the data already satisfies (per-key types, presence
rates, dominant-type verdicts) so a ``json_validation``-style spec can
be written from evidence instead of guesswork.  The reference's tag
grammar describes known struct fields; ingest pipelines meet unknown
JSON first — this closes that loop.

Built on Spark 4 VARIANT: ``try_parse_json`` rides the scan (malformed
rows become NULL and are counted, never dropped silently),
``variant_explode`` lateral-joins top-level key/value pairs, and
``schema_of_variant`` types each value EXACTLY — a JSON string "1"
stays a string (a ``from_json`` map<string,string> lift would conflate
it with the number 1).

Scale shape: parse + explode is one narrow pass (output = total
top-level keys); the (key, type) groupBy is map-side combined and
bounded by the schema vocabulary, not the row count; presence and
dominance arithmetic are windows over that tiny frame; corpus totals
are one extra 1-row agg broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: map a schema_of_variant string to a canonical JSON type name.
_CANON = (
    "case"
    " when _vt like 'OBJECT%' then 'object'"
    " when _vt like 'ARRAY%' then 'array'"
    " when _vt in ('BIGINT','INT','SMALLINT','TINYINT') then 'int'"
    " when _vt like 'DECIMAL%' or _vt in ('DOUBLE','FLOAT') then 'float'"
    " when _vt = 'STRING' then 'string'"
    " when _vt = 'BOOLEAN' then 'bool'"
    " when _vt = 'VOID' then 'null'"
    " else lower(_vt) end"
)


def infer_json_spec(
    df: DataFrame,
    json_col: str,
    *,
    dominance: float = 0.95,
) -> DataFrame:
    """One row per observed (key, vtype):

    - ``key, vtype, n_type``      — top-level key, canonical type
                                    (int/float/string/bool/object/
                                    array/null), rows with that type
    - ``n_key, presence_rate``    — rows carrying the key at all /
                                    that as a fraction of object rows
    - ``type_share, dominant``    — n_type / n_key; dominant is true
                                    for the majority type iff its share
                                    >= ``dominance`` (the evidence bar
                                    for suggesting a typed rule)
    - ``n_obj, n_corrupt``        — corpus totals: parsed JSON-object
                                    rows, and non-NULL rows that failed
                                    to parse (NEVER silently dropped)
    """
    if not 0.5 < dominance <= 1.0:
        raise ValueError("dominance must be in (0.5, 1]")
    spark = df.sparkSession
    v = df.select(
        F.col(json_col).alias("_raw"),
        F.try_parse_json(F.col(json_col)).alias("_v"),
    ).withColumn(
        "_is_obj",
        F.col("_v").isNotNull()
        & F.expr("schema_of_variant(_v)").startswith("OBJECT"),
    )
    totals = v.agg(
        F.sum(F.col("_is_obj").cast("long")).alias("n_obj"),
        F.sum(
            (F.col("_raw").isNotNull() & F.col("_v").isNull()).cast("long")
        ).alias("n_corrupt"),
    )
    kv = (
        v.filter("_is_obj")
        .select("_v")
        .lateralJoin(spark.tvf.variant_explode(F.col("_v").outer()))
        # project the schema string ONCE — inlining it into the CASE
        # would re-walk the variant per non-matching branch (CSE does
        # not share conditionally-evaluated subexpressions)
        .select(
            "key", F.expr("schema_of_variant(value)").alias("_vt")
        )
        .select("key", F.expr(_CANON).alias("vtype"))
    )
    counts = kv.groupBy("key", "vtype").agg(
        F.count(F.lit(1)).alias("n_type")
    )
    wk = Window.partitionBy("key")
    out = (
        counts.withColumn("n_key", F.sum("n_type").over(wk))
        .withColumn(
            "_max_type", F.max("n_type").over(wk)
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "key",
            "vtype",
            "n_type",
            "n_key",
            F.round(F.col("n_key") / F.col("n_obj"), 6)
            .alias("presence_rate"),
            F.round(F.col("n_type") / F.col("n_key"), 6)
            .alias("type_share"),
            # compare the 6dp-ROUNDED share against the bar: an exactly
            # met threshold (9/10 at 0.9) must pass — n_type >= 0.9 *
            # n_key fails on the IEEE product 9.000000000000002
            (
                (F.col("n_type") == F.col("_max_type"))
                & (
                    F.round(F.col("n_type") / F.col("n_key"), 6)
                    >= F.lit(float(dominance))
                )
            ).alias("dominant"),
            "n_obj",
            "n_corrupt",
        )
    )
    return out


def json_spec_drift(
    base: DataFrame,
    curr: DataFrame,
    json_col: str,
) -> DataFrame:
    """Schema drift between two corpus versions of a JSON column — the
    semi-structured analog of the snapshot drift family: which
    top-level keys were ADDED, REMOVED, or changed their dominant type
    between the ``base`` and ``curr`` frames, plus presence-rate
    movement.

    One row per key observed on EITHER side:

    - ``key, status``             — 'added' (curr only), 'removed'
                                    (base only), or 'common'
    - ``base_type, curr_type``    — the side's majority type (ties
                                    break by type name ascending);
                                    NULL on the missing side
    - ``type_changed``            — 1 iff common and the dominant
                                    types differ
    - ``base_presence, curr_presence, presence_delta`` — 6dp-rounded
                                    key presence per side (0.0 on the
                                    missing side), and curr - base

    Scale shape: both sides reduce to key-vocabulary-grain frames
    inside :func:`infer_json_spec` (bounded by the schema, not the row
    count); the drift join is a full outer equi-join of those tiny
    frames — the corpora themselves are scanned once each and never
    joined row-to-row.
    """

    def key_grain(df, pfx):
        # the dominant-type verdict is recomputed below with explicit
        # tie-breaks, so infer_json_spec's own `dominance` bar (which
        # only shapes its boolean column) is irrelevant here — no
        # dominance parameter is exposed on purpose
        spec = infer_json_spec(df, json_col)
        # majority type with deterministic ties: min over
        # (-n_type, vtype) = largest count, then smallest type name
        return (
            spec.groupBy("key")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("n_type")).alias("nn"),
                        F.col("vtype").alias("t"),
                    )
                ).alias("_b"),
                F.max("n_key").alias("_nk"),
                F.max("n_obj").alias("_no"),
            )
            .select(
                "key",
                F.col("_b")["t"].alias(f"{pfx}_type"),
                F.round(F.col("_nk") / F.col("_no"), 6).alias(
                    f"{pfx}_presence"
                ),
            )
        )

    b = key_grain(base, "base")
    c = key_grain(curr, "curr")
    joined = b.join(c, on="key", how="full_outer")
    status = (
        F.when(F.col("base_type").isNull(), F.lit("added"))
        .when(F.col("curr_type").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    bp = F.coalesce(F.col("base_presence"), F.lit(0.0))
    cp = F.coalesce(F.col("curr_presence"), F.lit(0.0))
    return joined.select(
        "key",
        status.alias("status"),
        "base_type",
        "curr_type",
        F.when(
            F.col("base_type").isNotNull()
            & F.col("curr_type").isNotNull()
            & (F.col("base_type") != F.col("curr_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("type_changed"),
        bp.alias("base_presence"),
        cp.alias("curr_presence"),
        F.round(cp - bp, 6).alias("presence_delta"),
    )
