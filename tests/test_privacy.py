from __future__ import annotations

import pytest

from schema_validator_spark.operators.privacy import (
    k_anonymity_groups,
    k_anonymity_report,
    l_diversity_report,
)


@pytest.fixture()
def people(spark):
    # (zip, age_band, diagnosis)
    rows = (
        [("02139", "30-40", "flu")] * 5
        + [("02139", "40-50", "flu"), ("02139", "40-50", "cold"),
           ("02139", "40-50", "flu")]
        + [("94110", "30-40", "covid")]          # singleton -> at risk
        + [(None, "30-40", "flu"), (None, "30-40", "cold")]  # NULL zip group
    )
    return spark.createDataFrame(rows, "zip string, age string, dx string")


def test_groups_and_risk_flag(spark, people):
    g = {
        (r["zip"], r["age"]): (r["group_size"], r["at_risk"])
        for r in k_anonymity_groups(people, ["zip", "age"], k=3).collect()
    }
    assert g[("02139", "30-40")] == (5, False)
    assert g[("02139", "40-50")] == (3, False)
    assert g[("94110", "30-40")] == (1, True)
    assert g[(None, "30-40")] == (2, True)  # NULL QI is one group


def test_report(spark, people):
    r = k_anonymity_report(people, ["zip", "age"], k=3).collect()[0]
    assert r["n_rows"] == 11 and r["n_groups"] == 4
    assert r["min_group_size"] == 1
    assert r["n_risky_groups"] == 2 and r["n_risky_rows"] == 3
    assert r["risky_row_rate"] == pytest.approx(3 / 11, abs=1e-6)
    with pytest.raises(ValueError):
        k_anonymity_report(people, ["zip"], k=1)


def test_l_diversity(spark, people):
    r = l_diversity_report(people, ["zip", "age"], "dx", l=2).collect()[0]
    # groups: (02139,30-40) all-flu -> div 1; (02139,40-50) div 2;
    # (94110,30-40) div 1; (NULL,30-40) div 2
    assert r["n_groups"] == 4
    assert r["min_diversity"] == 1
    assert r["n_low_diversity_groups"] == 2
    assert r["n_exposed_rows"] == 6
