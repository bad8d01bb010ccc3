from __future__ import annotations

import pytest

from schema_validator_spark.operators.semantic import (
    detect_semantic_types,
    suggest_format_rules,
)


@pytest.fixture()
def typed(spark):
    rows = [
        (
            str(i),
            f"user{i}@example.com",
            "5f4dcc3b5aa765d61d8327deb882cf99",
            "2024-03-%02d" % (i % 28 + 1),
            None if i == 0 else "1.2.%d" % i,
        )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "id string, mail string, h string, d string, ver string"
    )


def test_detection_rates(spark, typed):
    got = {
        (r["column"], r["sem_type"]): (r["n_nonnull"], r["n_match"], r["match_rate"])
        for r in detect_semantic_types(typed).collect()
    }
    assert got[("id", "integer")] == (40, 40, 1.0)
    assert got[("mail", "email")] == (40, 40, 1.0)
    assert got[("h", "md5_hash")][2] == 1.0
    assert got[("h", "hexadecimal")][2] == 1.0  # md5 is also hex
    assert got[("h", "sha256_hash")][2] == 0.0
    assert got[("d", "iso_date")][2] == 1.0
    assert got[("ver", "semver")] == (39, 39, 1.0)  # null excluded
    assert got[("mail", "integer")][2] == 0.0


def test_suggestions_dominance_and_floors(spark, typed):
    sug = suggest_format_rules(typed)
    assert "email" in sug["mail"]
    assert set(sug["h"]) >= {"md5_hash", "hexadecimal"}
    assert "semver" in sug["ver"]
    # min_rows floor: a 5-row frame suggests nothing
    small = typed.limit(5)
    assert suggest_format_rules(small) == {}


def test_mixed_column_below_threshold(spark):
    rows = [(f"{i}",) if i % 2 else (f"x{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "v string")
    sug = suggest_format_rules(df)
    assert "v" not in sug  # 50% integers is not dominant
