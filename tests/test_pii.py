from __future__ import annotations

import pytest

from schema_validator_spark.operators.pii import pii_scan, pii_types


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "mail me at a.b@example.com or c@d.org", "note"),
        (2, "server 10.0.0.1 and 192.168.1.254 up", "a.b@example.com"),
        (3, "ssn 123-45-6789 ok", None),
        (4, "card 4111111111111111 paid", "clean"),
        (5, "nothing here", "clean"),
    ]
    return spark.createDataFrame(rows, "id long, body string, note string")


def test_scan_counts(docs):
    got = {
        (r["column"], r["pii_type"]): (r["n_matched"], r["n_spans"])
        for r in pii_scan(docs).collect()
    }
    assert got[("body", "EMAIL")] == (1, 2)  # one row, two spans
    assert got[("body", "IP")] == (1, 2)
    assert got[("body", "SSN")] == (1, 1)
    assert got[("body", "LONGNUM")] == (1, 1)
    assert got[("note", "EMAIL")] == (1, 1)
    assert got[("note", "IP")] == (0, 0)
    # string columns only, id excluded
    assert not any(c == "id" for c, _ in got)


def test_match_rate_and_rows(docs):
    rows = {r["column"]: r for r in pii_scan(docs, ["body"]).collect()
            if r["pii_type"] == "EMAIL"}
    r = rows["body"]
    assert r["n_rows"] == 5
    assert r["match_rate"] == pytest.approx(0.2)


def test_pattern_names_match_redaction_tokens():
    assert [n for n, _ in pii_types()] == ["EMAIL", "IP", "SSN", "LONGNUM"]
