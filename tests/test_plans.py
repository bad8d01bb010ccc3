"""Physical-plan quality gates (SURVEY.md §4): pushdown, pruning,
codegen, shuffle count, join strategy.  These are the '.explain and
iterate' results pinned as tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import ValidationEngine
from schema_validator_spark.operators import referential
from schema_validator_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def eng():
    return ValidationEngine(
        {"text": "required", "lang": "required|oneof=en,es,de,fr"},
        key_cols=["doc_id"], partition_cols=["lang"],
    )


def test_rowlevel_plan_is_shuffle_and_python_free(docs, eng):
    ann = eng.annotate(docs)
    P.assert_single_pass(ann)          # zero Exchange
    assert not P.uses_python(ann)      # zero per-row Python (north_star)
    assert P.n_codegen_stages(ann) >= 1


def test_violations_branch_adds_no_shuffle(docs, eng):
    v = eng.run(docs).violations
    assert P.n_exchanges(v) == 0       # explode is narrow
    assert not P.uses_python(v)


def test_summary_is_exactly_one_shuffle(docs, eng):
    s = eng.run(docs).summary
    assert P.n_exchanges(s) == 1       # the groupBy — nothing else


def test_filter_pushdown_reaches_scan(docs):
    q = docs.filter(F.col("lang") == "en").select("doc_id")
    pushed = P.pushed_filters(q)
    assert any("lang" in p for p in pushed), pushed


def test_column_pruning(docs, eng):
    # summary needs only the spec columns + partition cols — content-free
    s = eng.run(docs).summary
    cols = P.read_schema(s)
    assert "text" in cols and "lang" in cols
    assert "source" not in cols and "n_chars" not in cols, cols


def test_key_projection_prunes(docs):
    q = docs.select("doc_id")
    assert P.read_schema(q) == ["doc_id"]


def test_referential_broadcasts_small_dim(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    out = referential.referential_violations(
        orders, ["o_custkey"], cust, ["c_custkey"], broadcast=True
    )
    kinds = P.join_kinds(out)
    assert "BroadcastHashJoin" in kinds, kinds
    assert "SortMergeJoin" not in kinds
    # fact side never shuffles
    assert P.n_exchanges(out) == 0


def test_pandas_udf_rules_batch_into_one_arrow_node(spark):
    """SURVEY.md §4.3: all pandas-UDF rules in a spec must cost ONE Arrow
    round trip per batch.  Catalyst's ExtractPythonUDFs collapses the
    independent UDFs into a single ArrowEvalPython node — pinned here."""
    import re

    df = spark.createDataFrame(
        [(1, "1.2.3.4", "10.0.0.0/8", "a@b.co")],
        "id long, ip string, net string, mail string",
    )
    eng = ValidationEngine(
        {"ip": "ipv4", "net": "cidr", "mail": "email"}, key_cols=["id"]
    )
    plan = P.executed_plan(eng.annotate(df))
    assert len(re.findall(r"ArrowEvalPython", plan)) == 1, plan


def test_pandas_udf_rules_are_isolated(spark, docs):
    """A spec with an ipaddress rule uses Python — but ONLY that spec."""
    df = spark.createDataFrame([(1, "1.2.3.4")], "id long, ip string")
    eng_ip = ValidationEngine({"ip": "required|ipv4"}, key_cols=["id"])
    assert P.uses_python(eng_ip.annotate(df))
    eng_re = ValidationEngine({"ip": "required|len=7"}, key_cols=["id"])
    assert not P.uses_python(eng_re.annotate(df))


def test_jaccard_pairs_has_no_nested_loop(spark):
    """Round-2 fix pinned: the headline near-dup query must be an
    equi-join (LSH-blocked) plan — no cartesian / nested-loop stage."""
    import __spark_entry__ as entry

    df = entry.queries()["jaccard_pairs"](spark, SF)
    kinds = P.join_kinds(df)
    assert "CartesianProduct" not in kinds, kinds
    assert "BroadcastNestedLoopJoin" not in kinds, kinds
    assert kinds, "expected equi-joins in the blocked plan"


def test_new_code_metric_ops_ride_the_scan(spark, docs):
    """Session-8 additions pinned: maintainability + conflict_markers
    are pure-codegen single-pass; casing_profile pays exactly its one
    lang groupBy; none touch Python."""
    from schema_validator_spark.functions.identifiers import (
        casing_profile,
    )
    from schema_validator_spark.operators.codequality import (
        conflict_markers,
    )
    from schema_validator_spark.operators.maintainability import (
        maintainability_index,
    )

    code = docs.select(
        "doc_id", F.lit("py").alias("lang"),
        F.col("text").alias("content"),
    )
    mi = maintainability_index(code, ["doc_id"], "content", "lang")
    P.assert_single_pass(mi)
    assert not P.uses_python(mi)

    cm = conflict_markers(code, "content", keep_cols=["doc_id"])
    P.assert_single_pass(cm)
    assert not P.uses_python(cm)

    cp = casing_profile(code, "content", "lang")
    assert P.n_exchanges(cp) == 1
    assert not P.uses_python(cp)


def test_call_graph_joins_are_equi_and_python_free(spark, docs):
    """call_edges must stay an equi-join plan (the call-token explode
    is tamed by the definition-dim semi-join, never a nested loop)."""
    from schema_validator_spark.operators.callgraph import call_edges

    code = docs.select(
        (F.col("doc_id") % 10).cast("string").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("py").alias("lang"),
        F.col("text").alias("content"),
    )
    ce = call_edges(code, "repo", "path", "content", "lang")
    kinds = P.join_kinds(ce)
    assert "CartesianProduct" not in kinds, kinds
    assert "BroadcastNestedLoopJoin" not in kinds, kinds
    assert not P.uses_python(ce)


def test_semantic_overlap_hof_is_one_map_only_pass(spark):
    """The HOF decontamination tier must ride the corpus scan: eval set
    constant-folded into the projection — zero Exchanges, zero joins,
    zero Python (the per-row argmax is an expression, not a groupBy)."""
    from schema_validator_spark.operators.semcontam import semantic_overlap

    train = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("double")
                  for i in range(8)]).alias("embedding"),
    )
    ev = spark.createDataFrame(
        [(1000 + i, [float(i + j) for j in range(8)]) for i in range(4)],
        "vec_id long, embedding array<double>")
    out = semantic_overlap(train, ev)
    assert P.n_exchanges(out) == 0
    assert P.join_kinds(out) == []
    assert not P.uses_python(out)


def test_synthetic_text_is_shuffle_and_python_free(spark, docs):
    from schema_validator_spark.functions.synthtext import (
        synthetic_text_stats,
    )

    out = synthetic_text_stats(docs, ["doc_id"], "text")
    assert P.n_exchanges(out) == 0
    assert P.join_kinds(out) == []
    assert not P.uses_python(out)


def test_edit_pairs_chunked_plan_is_bounded_and_equi(spark):
    """Round-5 tier pinned: the hot-key-safe pairer must stay an
    equi-join plan (null-safe stitch join included — `<=>` is
    hash/SMJ-compatible) with a bounded shuffle count and no Python."""
    from schema_validator_spark.operators.history import (
        edit_pairs_chunked,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.lit("r").alias("repo"),
        (F.col("doc_id") % 7).alias("path").cast("string"),
        F.col("doc_id").alias("commit"),
        F.col("text").alias("content"),
    )
    out = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=10
    )
    kinds = P.join_kinds(out)
    assert "CartesianProduct" not in kinds, kinds
    assert "BroadcastNestedLoopJoin" not in kinds, kinds
    # chunk window + summary agg (reuses partitioning) + summary-lag
    # window + stitch join: the plan must not balloon past that
    assert P.n_exchanges(out) <= 5, P.explain_str(out)
    assert not P.uses_python(out)


def test_video_frames_demux_is_map_only(spark):
    """Round-5 tier pinned: Y4M demux is one Arrow fan-out riding the
    payload scan — zero Exchange."""
    from schema_validator_spark.operators.multimodal import (
        extract_video_frames,
        synthetic_y4m_media,
    )

    out = extract_video_frames(synthetic_y4m_media(spark, 100))
    assert P.n_exchanges(out) == 0, P.explain_str(out)
