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


def test_cli_script_mode_no_package(tmp_path, spark):
    """`spark-submit cli.py` runs the file as __main__ with no parent
    package (round-3 fix: relative imports crashed there).  Exercise the
    same path by executing cli.py as a plain script in a subprocess."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    data = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "go"), (2, ""), (3, "zz")], "id long, lang string"
    ).write.parquet(data)
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({"lang": "required|oneof=go,py"}))
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=str(repo))
    r = subprocess.run(
        [sys.executable, str(repo / "schema_validator_spark" / "cli.py"),
         "--input", data, "--format", "parquet", "--spec", str(spec),
         "--key-cols", "id", "--output", out],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])
    # row 2 fails required AND oneof; row 3 fails oneof
    assert got["n_rows"] == 3 and got["n_violations"] == 3
