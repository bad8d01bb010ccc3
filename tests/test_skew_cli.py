"""Skew utilities + the spark-submit CLI entry point."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators import skew
from schema_validator_spark.sources.datagen import code_files


@pytest.fixture(scope="module")
def skewed(spark):
    # mega-repo owns ~20% of rows
    return code_files(spark, 5000).cache()


def test_key_histogram_flags_megarepo(skewed):
    hist = skew.key_histogram(skewed, ["repo"], top=3).collect()
    assert hist[0]["repo"] == "bigorg/monorepo"
    assert 0.15 < hist[0]["share"] < 0.25


def test_salted_collect_set_matches_plain(skewed):
    plain = {
        r["repo"]: set(r["s"])
        for r in skewed.groupBy("repo")
        .agg(F.collect_set("lang").alias("s"))
        .collect()
    }
    salted = {
        r["repo"]: set(r["lang_set"])
        for r in skew.salted_collect_set(skewed, ["repo"], "lang", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_count_distinct_exact(skewed):
    plain = {
        r["repo"]: r["n"]
        for r in skewed.groupBy("repo")
        .agg(F.countDistinct("path").alias("n"))
        .collect()
    }
    salted = {
        r["repo"]: r["path_n_distinct"]
        for r in skew.salted_count_distinct(skewed, ["repo"], "path", n_salts=8).collect()
    }
    assert salted == plain


def test_repartition_salted_spreads_megarepo(skewed):
    parts = skew.repartition_salted(skewed, ["repo"], n_salts=8, num_partitions=32)
    mega_parts = (
        parts.filter(F.col("repo") == "bigorg/monorepo")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert mega_parts >= 4  # one repo no longer pinned to one partition


# ----------------------------------------------------------------- CLI


def test_cli_direct_mode(spark, tmp_path):
    from schema_validator_spark import cli

    src = str(tmp_path / "in.parquet")
    code_files(spark, 2000).write.parquet(src)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps({
        "commit": "required|len=40|hexadecimal|lowercase",
        "lang": "required|oneof=go,py,java,rs,ts,c,other",
    }))
    out = str(tmp_path / "out")
    rc = cli.main([
        "--input", src, "--spec", str(spec_file),
        "--key-cols", "repo,path,commit", "--partition-cols", "lang",
        "--output", out,
    ])
    assert rc == 0
    viol = spark.read.parquet(f"{out}/violations")
    assert viol.count() > 0  # planted bad commits/langs
    codes = {r["code"] for r in viol.select("code").distinct().collect()}
    assert codes <= {"len", "hexadecimal", "lowercase", "oneof", "required"}
    summ = spark.read.parquet(f"{out}/summary")
    assert summ.agg(F.sum("n_rows")).first()[0] == 2000


def test_cli_fail_on_violation(spark, tmp_path):
    from schema_validator_spark import cli

    src = str(tmp_path / "in2.parquet")
    code_files(spark, 1000).write.parquet(src)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps({"content": "required"}))
    rc = cli.main([
        "--input", src, "--spec", str(spec_file),
        "--key-cols", "repo,path", "--output", str(tmp_path / "o2"),
        "--fail-on-violation",
    ])
    assert rc == 1  # planted empty content rows


def test_cli_checkpoint_mode(spark, tmp_path):
    from schema_validator_spark import cli

    src = str(tmp_path / "in3.parquet")
    code_files(spark, 1000).write.parquet(src)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps({"commit": "required|len=40"}))
    ck = str(tmp_path / "ckpt")
    argv = [
        "--input", src, "--spec", str(spec_file),
        "--key-cols", "repo,path", "--checkpoint-dir", ck,
        "--bucket-col", "repo", "--n-buckets", "8",
    ]
    assert cli.main(argv) == 0
    # idempotent resume: second run skips all buckets
    assert cli.main(argv) == 0
    lineage = spark.read.parquet(f"{ck}/lineage")
    assert lineage.select("_bucket").distinct().count() <= 8
