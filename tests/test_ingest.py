from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.sources.ingest import (
    CORRUPT_COL,
    ingest_report,
    read_csv_quarantined,
    read_jsonl_quarantined,
    split_quarantine,
)

JSON_LINES = [
    '{"id": 1, "name": "ok"}',
    '{"id": 2, "name": "also fine"}',
    '{"id": 3, "name": "broken',          # unterminated string
    'not json at all',
    '{"id": 5}',                          # missing field -> good, name NULL
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(JSON_LINES) + "\n")
    return str(p)


def test_jsonl_split(spark, jsonl_path):
    df = read_jsonl_quarantined(spark, jsonl_path, "id long, name string")
    good, bad = split_quarantine(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 2, 5]
    assert CORRUPT_COL not in good.columns
    raws = sorted(r["raw"] for r in bad.collect())
    assert raws == ["not json at all", '{"id": 3, "name": "broken']
    # .count() on either split must survive column pruning
    assert good.count() == 3 and bad.count() == 2
    assert all(
        os.path.basename(r["source_file"]).startswith("in.jsonl")
        for r in bad.collect()
    )


def test_jsonl_report(spark, jsonl_path):
    r = ingest_report(
        read_jsonl_quarantined(spark, jsonl_path, "id long, name string")
    ).collect()[0]
    assert (r["n_rows"], r["n_good"], r["n_corrupt"]) == (5, 3, 2)


def test_csv_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,aa,9\n2,bb\n3,cc,7\nx,dd,1\n")  # row 2 short, row 4 bad type
    df = read_csv_quarantined(
        spark, str(p), "id long, name string, v long"
    )
    good, bad = split_quarantine(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    assert bad.count() == 2


def test_good_path_stays_codegen(spark, jsonl_path):
    from schema_validator_spark.plans import inspect

    good, _ = split_quarantine(
        read_jsonl_quarantined(spark, jsonl_path, "id long, name string")
    )
    agg = good.agg(F.sum("id").alias("s"))
    assert not inspect.uses_python(agg)
    assert agg.collect()[0]["s"] == 8
