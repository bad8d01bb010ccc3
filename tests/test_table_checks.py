"""Table-level operator tests: uniqueness, referential integrity,
distribution drift, checkpoint/resume — the north-rule half of the
engine (SURVEY.md §2.0; no reference analog)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators import drift, referential, uniqueness
from schema_validator_spark.checkpoint import CheckpointedValidation
from schema_validator_spark.sources import datagen
from schema_validator_spark.engine import ValidationEngine


def test_duplicate_keys_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (3, "c"), (3, "c")],
        "k int, v string",
    )
    dups = {r["k"]: r["dup_count"] for r in uniqueness.duplicate_keys(df, ["k"]).collect()}
    assert dups == {1: 2, 3: 3}
    rows = uniqueness.duplicate_rows(df, ["k"]).count()
    assert rows == 5


def test_uniqueness_stats(spark):
    df = spark.range(1000).select((F.col("id") % 500).alias("k"))
    exact = uniqueness.exact_uniqueness_stats(df, ["k"]).first()
    assert exact["n_rows"] == 1000
    assert exact["n_distinct_keys"] == 500
    assert exact["n_dup_keys"] == 500
    approx = uniqueness.uniqueness_stats(df, ["k"]).first()
    assert abs(approx["approx_distinct_keys"] - 500) / 500 < 0.15


def test_referential_violations(spark):
    fact = spark.createDataFrame(
        [(1, "r1"), (2, "r2"), (3, "ghost"), (4, None)], "uid int, repo string"
    )
    dim = spark.createDataFrame([("r1",), ("r2",)], "repo string")
    orphans = {r["uid"] for r in
               referential.referential_violations(fact, ["repo"], dim, broadcast=True).collect()}
    assert orphans == {3, 4}
    stats = referential.orphan_stats(fact, ["repo"], dim, broadcast=True).first()
    assert stats["n_rows"] == 4 and stats["n_orphans"] == 2
    assert stats["orphan_rate"] == 0.5


def test_drift_psi(spark):
    # commit A: uniform 0..99; commit B: shifted 50..149 → high PSI;
    # commit C: same as A → near-zero PSI.
    a = spark.range(2000).select(F.lit("A").alias("commit"), (F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(2000).select(F.lit("B").alias("commit"), (F.col("id") % 100 + 50).cast("double").alias("v"))
    c = spark.range(2000).select(F.lit("C").alias("commit"), (F.col("id") % 100).cast("double").alias("v"))
    df = a.unionByName(b).unionByName(c)

    psi_ab = drift.psi(df, "v", "commit", "A", "B")
    psi_ac = drift.psi(df, "v", "commit", "A", "C")
    assert psi_ab > 0.25, psi_ab
    assert psi_ac < 0.01, psi_ac

    stats = {r["commit"]: r for r in drift.column_stats(df, "v", ["commit"]).collect()}
    assert stats["A"]["n"] == 2000
    assert abs(stats["B"]["mean"] - stats["A"]["mean"] - 50) < 1.0

    report = drift.drift_report(df, "v", "commit", baseline="A")
    by_group = {r["group"]: r["psi"] for r in report}
    assert by_group["B"] > by_group["C"]


def test_datagen_known_violations(spark):
    df = datagen.code_files(spark, 3000)
    assert df.count() == 3000
    eng = datagen.full_suite_engine()
    res = eng.run(df)
    codes = {(r["field"], r["code"]) for r in res.violations.collect()}
    assert ("commit", "lowercase") in codes
    assert ("commit", "len") in codes
    assert ("lang", "oneof") in codes
    assert ("content", "required") in codes
    assert ("path", "startsnotwith") in codes
    # the derived sha256 invariant never fails on generated data
    assert ("content_sha256", "hexadecimal") not in codes
    # skew: mega-repo owns ~20%
    mega = df.filter(F.col("repo") == "bigorg/monorepo").count()
    assert 0.15 < mega / 3000 < 0.25


def test_datagen_referential_orphans(spark):
    files = datagen.code_files(spark, 2000)
    dim = datagen.repos_dim(spark)
    orphans = referential.referential_violations(files, ["repo"], dim, broadcast=True)
    n = orphans.count()
    assert n > 0  # the dropped residue-42 repos
    assert orphans.filter(F.col("repo") == "bigorg/monorepo").count() == 0


def test_checkpoint_resume(spark):
    tmp = tempfile.mkdtemp(prefix="svs_ckpt_")
    try:
        df = datagen.code_files(spark, 1000)
        eng = datagen.full_suite_engine()
        ck = CheckpointedValidation(eng, tmp, bucket_col="repo", n_buckets=8)

        first = ck.run(df)
        assert first["skipped"] == []
        assert len(first["processed"]) > 0

        # resume: everything already done → nothing reprocessed
        second = ck.run(df)
        assert second["processed"] == []
        assert second["skipped"] == first["processed"]

        total = ck.summary(spark).first()
        assert total["n_rows"] == 1000

        # violations on disk match a direct run
        direct = eng.run(df).violations.count()
        on_disk = spark.read.parquet(f"{tmp}/violations").count()
        assert on_disk == direct

        # a spec change invalidates the checkpoint
        eng2 = ValidationEngine({"content": "required"}, key_cols=["repo", "path", "commit"])
        ck2 = CheckpointedValidation(eng2, tmp, bucket_col="repo", n_buckets=8)
        assert ck2.completed_buckets(spark) == set()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_crash_window_idempotent(spark):
    """Crash AFTER a bucket's outputs landed but BEFORE its lineage row
    (checkpoint.py protocol note): resume reprocesses exactly those
    buckets, dynamic partition overwrite REPLACES their outputs, and the
    final state equals a clean one-shot run (no dupes, no gaps)."""
    tmp = tempfile.mkdtemp(prefix="svs_ckpt_crash_")
    try:
        df = datagen.code_files(spark, 1000)
        eng = datagen.full_suite_engine()
        ck = CheckpointedValidation(eng, tmp, bucket_col="repo", n_buckets=8)
        ck.run(df)

        # simulate the crash: drop lineage for half the buckets while
        # their violations partitions remain on disk
        lineage = spark.read.parquet(ck.lineage_path)
        kept = lineage.filter(F.col("_bucket") < 4)
        kept_rows = kept.collect()
        shutil.rmtree(ck.lineage_path)
        spark.createDataFrame(kept_rows, lineage.schema).write.parquet(ck.lineage_path)

        out = ck.run(df)
        assert sorted(out["skipped"]) == [r["_bucket"] for r in
                                          sorted(kept_rows, key=lambda r: r["_bucket"])]
        assert all(b >= 4 for b in out["processed"])

        direct = eng.run(df).violations.count()
        on_disk = spark.read.parquet(f"{tmp}/violations").count()
        assert on_disk == direct  # replaced, not duplicated
        assert ck.summary(spark).first()["n_rows"] == 1000
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_identity_buckets_prune_scan(spark):
    """identity_buckets on a partitioned source: the resume filter lands
    on the partition column and the scan PRUNES completed buckets."""
    tmp = tempfile.mkdtemp(prefix="svs_ckpt_id_")
    try:
        src = f"{tmp}/src"
        (datagen.code_files(spark, 1000)
         .withColumn("bkt", F.pmod(F.xxhash64("repo"), 4).cast("int"))
         .write.partitionBy("bkt").parquet(src))
        df = spark.read.parquet(src)

        eng = ValidationEngine({"content": "required"},
                               key_cols=["repo", "path", "commit"])
        ck = CheckpointedValidation(eng, f"{tmp}/ck", bucket_col="bkt",
                                    n_buckets=4, identity_buckets=True)
        first = ck.run(df)
        assert sorted(first["processed"]) == [0, 1, 2, 3]

        # pretend buckets 2,3 crashed before lineage landed
        lineage = spark.read.parquet(ck.lineage_path)
        kept = lineage.filter(F.col("_bucket") < 2).collect()
        shutil.rmtree(ck.lineage_path)
        spark.createDataFrame(kept, lineage.schema).write.parquet(ck.lineage_path)

        # the resume plan must prune partitions 0,1 at the SCAN
        done = ck.completed_buckets(spark)
        assert done == {0, 1}
        pruned = ck._bucket(df).filter(~F.col("_bucket").isin(*sorted(done)))
        from schema_validator_spark.plans.inspect import explain_str
        txt = explain_str(pruned, "formatted")
        import re
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
        assert m and "bkt" in m.group(1), txt[:2000]

        out = ck.run(df)
        assert sorted(out["processed"]) == [2, 3]
        assert ck.summary(spark).first()["n_rows"] == 1000
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_schema_diff_and_compat(spark):
    from pyspark.sql import types as T
    from schema_validator_spark.operators.schema_diff import (
        assert_compatible, schema_diff,
    )

    before = T.StructType.fromDDL(
        "id long, name string, meta struct<a int, b string>")
    after = T.StructType.fromDDL(
        "id long, name varchar(10), meta struct<a bigint>, extra double")
    # varchar(10) normalizes to string in Spark, so `name` is unchanged
    diff = {r["column"]: (r["change"], r["from_type"], r["to_type"])
            for r in schema_diff(spark, before, after).collect()}
    assert diff == {
        "meta.a": ("type_changed", "int", "bigint"),
        "meta.b": ("removed", "string", None),
        "extra": ("added", None, "double"),
    }
    assert schema_diff(spark, before, before).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="meta.b: removed"):
        assert_compatible(spark, before, after)
    # additions alone are fine by default
    widened = T.StructType.fromDDL("id long, name string, "
                                   "meta struct<a int, b string>, extra double")
    assert_compatible(spark, before, widened)
    with _pytest.raises(ValueError):
        assert_compatible(spark, before, widened, allow_added=False)


def test_cli_sha256_derived_column(spark, tmp_path):
    """--sha256-col derives content_sha256 and validates it (input_hint
    per-row invariant through the CLI surface)."""
    import json as _json
    from schema_validator_spark import cli

    src = str(tmp_path / "in.parquet")
    datagen.code_files(spark, 500).write.parquet(src)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(_json.dumps(
        {"content_sha256": "len=64|hexadecimal|lowercase"}))
    rc = cli.main([
        "--input", src, "--spec", str(spec_file),
        "--key-cols", "repo,path", "--output", str(tmp_path / "out"),
        "--sha256-col", "content",
    ])
    assert rc == 0
    summ = spark.read.parquet(str(tmp_path / "out" / "summary"))
    row = summ.agg(F.sum("n_rows"), F.sum("n_violations")).first()
    assert row[0] == 500 and row[1] == 0  # sha256 of content always valid


def test_psi_quantile_df_distributed(spark):
    """Quantile-edge PSI (exact deciles, zero driver compute): shifted
    distribution scores high, identical scores ~0; the plan contains no
    collect — result is a one-row DataFrame."""
    a = spark.range(2000).select(F.lit("A").alias("commit"),
                                 (F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(2000).select(F.lit("B").alias("commit"),
                                 (F.col("id") % 100 + 50).cast("double").alias("v"))
    c = spark.range(2000).select(F.lit("C").alias("commit"),
                                 (F.col("id") % 100).cast("double").alias("v"))
    df = a.unionByName(b).unionByName(c)

    high = drift.psi_quantile_df(df, "v", "commit", "A", "B").first()
    low = drift.psi_quantile_df(df, "v", "commit", "A", "C").first()
    assert high["baseline"] == "A" and high["current"] == "B"
    assert high["psi"] > 0.25, high["psi"]
    assert low["psi"] < 0.01, low["psi"]


def test_outlier_stats_both_definitions(spark):
    """Planted outliers: 1000 values near 50 plus two extremes — both the
    z-score and IQR-fence counts find exactly the planted rows."""
    base = spark.range(1000).select(
        F.lit("g").alias("grp"), (40 + (F.col("id") % 21)).cast("double").alias("v"))
    extremes = spark.createDataFrame(
        [("g", 10_000.0), ("g", -10_000.0), ("h", 1.0)], "grp string, v double")
    df = base.unionByName(extremes)
    rows = {r["grp"]: r for r in
            drift.outlier_stats(df, "v", ["grp"]).collect()}
    assert rows["g"]["n"] == 1002
    assert rows["g"]["n_outliers_z"] == 2
    assert rows["g"]["n_outliers_iqr"] == 2
    # single-value group: stddev NULL -> no z outliers, IQR degenerate
    assert rows["h"]["n_outliers_z"] == 0 and rows["h"]["n_outliers_iqr"] == 0


def test_psi_report_df_matches_per_pair_quantile_psi(spark):
    """The one-plan all-groups report must equal psi_quantile_df run
    pair-by-pair (same edges, bucketing, eps) — and the shifted group
    scores high while the identical one scores ~0."""
    a = spark.range(2000).select(F.lit("A").alias("commit"),
                                 (F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(2000).select(F.lit("B").alias("commit"),
                                 (F.col("id") % 100 + 50).cast("double").alias("v"))
    c = spark.range(2000).select(F.lit("C").alias("commit"),
                                 (F.col("id") % 100).cast("double").alias("v"))
    df = a.unionByName(b).unionByName(c)
    report = {r["current"]: r["psi"]
              for r in drift.psi_report_df(df, "v", "commit", "A").collect()}
    assert set(report) == {"B", "C"}
    for grp in ("B", "C"):
        pair = drift.psi_quantile_df(df, "v", "commit", "A", grp).first()["psi"]
        assert report[grp] == pair, (grp, report[grp], pair)
    assert report["B"] > 0.25 and report["C"] < 0.01
