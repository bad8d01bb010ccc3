"""spark-submit entry point (north rule: launched by ``spark-submit
--py-files`` on multi-executor clusters).

    spark-submit --py-files schema_validator_spark.zip \
        -m schema_validator_spark.cli ... # or: spark-submit cli.py ...
    # local dev:
    python -m schema_validator_spark.cli \
        --input /data/code_files --format parquet \
        --spec spec.json --key-cols repo,path,commit --partition-cols lang \
        --output /out/validation --checkpoint-dir /out/ckpt --bucket-col repo

``--spec`` is a JSON file {column: tag-string}, the reference's tag
grammar (``"required|len=40|hexadecimal"``).  Outputs: violations/ and
summary/ parquet under --output, or checkpointed per-bucket outputs +
lineage under --checkpoint-dir when given (idempotent resume).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="schema_validator_spark",
                                description="Distributed constraint validation")
    p.add_argument("--input", required=True, help="table path or name")
    p.add_argument("--format", default="parquet",
                   help="parquet | iceberg | orc | csv | table")
    p.add_argument("--spec", required=True, help="JSON spec file {col: tag}")
    p.add_argument("--key-cols", required=True, help="comma-separated row keys")
    p.add_argument("--partition-cols", default="", help="summary rollup cols")
    p.add_argument("--output", help="output dir (violations/ + summary/)")
    p.add_argument("--checkpoint-dir", help="enable idempotent per-bucket resume")
    p.add_argument("--bucket-col", help="bucket column for checkpointing")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--sha256-col", help="add content_sha256 derived from this column")
    p.add_argument("--fail-on-violation", action="store_true",
                   help="exit 1 if any violation found")
    return p.parse_args(argv)


def load_input(spark, args):
    if args.format == "table":
        return spark.read.table(args.input)
    return spark.read.format(args.format).load(args.input)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    with open(args.spec) as f:
        spec = json.load(f)

    if __package__:
        from .checkpoint import CheckpointedValidation
        from .engine import ValidationEngine
        from .session import get_spark
    else:
        # `spark-submit cli.py` runs this file as __main__ with no parent
        # package; the package itself arrives via --py-files, so absolute
        # imports resolve.  Resolved ONCE here for every module main needs.
        from schema_validator_spark.checkpoint import CheckpointedValidation
        from schema_validator_spark.engine import ValidationEngine
        from schema_validator_spark.session import get_spark

    spark = get_spark("schema-validator-run")
    df = load_input(spark, args)

    derived = {}
    if args.sha256_col:
        derived["content_sha256"] = F.sha2(F.col(args.sha256_col), 256)

    engine = ValidationEngine(
        spec,
        key_cols=[c for c in args.key_cols.split(",") if c],
        partition_cols=[c for c in args.partition_cols.split(",") if c],
        derived=derived,
    )

    if args.checkpoint_dir:
        if not args.bucket_col:
            print("--checkpoint-dir requires --bucket-col", file=sys.stderr)
            return 2

        ckpt = CheckpointedValidation(
            engine, args.checkpoint_dir,
            bucket_col=args.bucket_col, n_buckets=args.n_buckets,
        )
        out = ckpt.run(df)
        print(json.dumps({"mode": "checkpointed", **out}))
        lineage = ckpt.summary(spark).collect()
        n_violations = int(lineage[0]["n_violations"]) if lineage else 0
    else:
        if not args.output:
            print("need --output (or --checkpoint-dir)", file=sys.stderr)
            return 2
        res = engine.run(df)
        res.violations.write.mode("overwrite").parquet(f"{args.output}/violations")
        res.summary.write.mode("overwrite").parquet(f"{args.output}/summary")
        srows = spark.read.parquet(f"{args.output}/summary").collect()
        n_violations = sum(int(r["n_violations"]) for r in srows)
        print(json.dumps({
            "mode": "direct",
            "n_rows": sum(int(r["n_rows"]) for r in srows),
            "n_violations": n_violations,
        }))

    if args.fail_on_violation and n_violations > 0:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
