"""C4-style cleaning operator: line filters, within-doc dedup, PII
redaction — all pure SQL expressions (no Python, no shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators import clean as C
from schema_validator_spark.plans import inspect as P


def test_clean_documents_drops_junk_and_dupes(spark):
    text = "\n".join([
        "This is a perfectly reasonable content line.",
        "short",
        "Please accept our Cookie banner",
        "This is a perfectly reasonable content line.",
        "Another good line with enough characters here.",
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = C.clean_documents(df, "text").first()
    kept = row["text_clean"].split("\n")
    assert row["n_lines"] == 5
    assert row["n_lines_kept"] == 2
    assert kept == [
        "This is a perfectly reasonable content line.",
        "Another good line with enough characters here.",
    ]


def test_terminal_punct_filter(spark):
    df = spark.createDataFrame(
        [(1, "A line ending properly.\nA line without terminal punct")],
        "doc_id long, text string",
    )
    row = C.clean_documents(df, "text", require_terminal_punct=True).first()
    assert row["text_clean"] == "A line ending properly."


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user@corp.io or 10.1.2.3 ssn 123-45-6789 card 4111222233334444")],
        "doc_id long, text string",
    )
    out = df.select(C.redact_pii(F.col("text")).alias("r")).first()["r"]
    assert out == "mail <EMAIL> or <IP> ssn <SSN> card <LONGNUM>"


def test_clean_plan_is_single_pass(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    out = C.clean_documents(df, "text")
    P.assert_single_pass(out)
    assert not P.uses_python(out)
