"""Checkpoint / idempotent resume for long validation runs.

North-rule requirement: an interrupted 10^12-row run must restart
without recomputing finished work.  Protocol (SURVEY.md §4.6):

* rows are assigned to ``n_buckets`` stable buckets by hashing the
  bucket column (e.g. ``repo``) — the unit of restart;
* violations + summary are written ``partitionBy(_bucket)`` with
  dynamic partition overwrite, so re-processing a bucket REPLACES its
  output (idempotent);
* a lineage table records (bucket, spec_hash, n_rows, n_violations,
  finished_at) and is appended only AFTER the bucket's outputs landed —
  a crash between output and lineage just reprocesses that bucket;
* on resume, completed buckets for the same spec_hash are anti-joined
  away, so only pending buckets are scanned (partition pruning does the
  rest when the source is partitioned/bucketed by the same key).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import FAILS_COL, ValidationEngine

BUCKET_COL = "_bucket"


def spec_hash(engine: ValidationEngine) -> str:
    blob = json.dumps(
        {k: str(v) for k, v in sorted(engine.spec.items())}, sort_keys=True
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class CheckpointedValidation:
    def __init__(
        self,
        engine: ValidationEngine,
        checkpoint_dir: str,
        *,
        bucket_col: str,
        n_buckets: int = 64,
        identity_buckets: bool = False,
    ) -> None:
        """``identity_buckets=True``: the bucket IS the (integral)
        bucket_col value, not a hash of it.  Use when the source is
        physically partitioned by that column — the resume filter then
        lands on the partition column and the scan PRUNES completed
        buckets instead of reading and discarding them (verified in
        tests/test_table_checks.py: PartitionFilters in the scan node).
        """
        self.engine = engine
        self.dir = checkpoint_dir.rstrip("/")
        self.bucket_col = bucket_col
        self.n_buckets = n_buckets
        self.identity_buckets = identity_buckets
        self.spec_hash = spec_hash(engine)

    @property
    def lineage_path(self) -> str:
        return f"{self.dir}/lineage"

    def _bucket(self, df: DataFrame) -> DataFrame:
        if self.identity_buckets:
            return df.withColumn(BUCKET_COL, F.col(self.bucket_col).cast("int"))
        return df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(self.bucket_col)), self.n_buckets)
        )

    def completed_buckets(self, spark: SparkSession) -> set[int]:
        try:
            rows = (
                spark.read.parquet(self.lineage_path)
                .filter(F.col("spec_hash") == self.spec_hash)
                .select(BUCKET_COL)
                .distinct()
                .collect()
            )
        except Exception:
            return set()
        return {r[0] for r in rows}

    def run(self, df: DataFrame) -> dict:
        """Validate pending buckets; write violations/summary; append
        lineage.  Returns {'processed': [...], 'skipped': [...]}."""
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        done = self.completed_buckets(spark)
        bucketed = self._bucket(df)
        if done:
            bucketed = bucketed.filter(~F.col(BUCKET_COL).isin(*sorted(done)))

        annotated = self.engine.annotate(bucketed)
        n_fails = F.size(F.col(FAILS_COL))

        violations = annotated.select(
            BUCKET_COL, *self.engine.key_cols, F.explode(FAILS_COL).alias("_v")
        ).select(
            BUCKET_COL,
            *self.engine.key_cols,
            F.col("_v.field").alias("field"),
            F.col("_v.code").alias("code"),
            F.col("_v.params").alias("params"),
        )
        summary = annotated.groupBy(BUCKET_COL).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((n_fails > 0).cast("long")).alias("n_rows_failed"),
            F.sum(n_fails.cast("long")).alias("n_violations"),
        )

        violations.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
            f"{self.dir}/violations"
        )
        # summary is small: collect per-bucket stats, then append lineage
        stats = summary.collect()
        if stats:
            lineage = spark.createDataFrame(
                [
                    (
                        int(r[BUCKET_COL]),
                        self.spec_hash,
                        int(r["n_rows"]),
                        int(r["n_rows_failed"]),
                        int(r["n_violations"]),
                        datetime.datetime.now(datetime.timezone.utc).isoformat(),
                    )
                    for r in stats
                ],
                f"{BUCKET_COL} int, spec_hash string, n_rows long, "
                "n_rows_failed long, n_violations long, finished_at string",
            )
            lineage.write.mode("append").parquet(self.lineage_path)
        return {
            "processed": sorted(int(r[BUCKET_COL]) for r in stats),
            "skipped": sorted(done),
        }

    def summary(self, spark: SparkSession) -> DataFrame:
        """Aggregated lineage for this spec (what a monitoring job reads)."""
        return (
            spark.read.parquet(self.lineage_path)
            .filter(F.col("spec_hash") == self.spec_hash)
            .groupBy("spec_hash")
            .agg(
                F.countDistinct(BUCKET_COL).alias("n_buckets_done"),
                F.sum("n_rows").alias("n_rows"),
                F.sum("n_rows_failed").alias("n_rows_failed"),
                F.sum("n_violations").alias("n_violations"),
            )
        )
