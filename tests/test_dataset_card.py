from __future__ import annotations

from schema_validator_spark.operators.repoprofile import dataset_card


def test_dataset_card_composition(spark):
    rows = [
        ("py", "a", "x = 1"),
        ("py", "a", "x = 1"),      # exact dup
        ("py", "b", "y = 2"),
        ("go", "a", "package a"),
        (None, "c", None),          # unknown lang, NULL content
    ]
    df = spark.createDataFrame(
        rows, "lang string, repo string, content string"
    )
    out = {r["lang"]: r for r in
           dataset_card(df, "lang", "repo", "content").collect()}

    py = out["py"]
    assert (py["n_files"], py["n_repos"], py["n_distinct"]) == (3, 2, 2)
    assert py["n_chars"] == 15
    assert abs(py["dup_frac"] - (1 - 2 / 3)) < 1e-6
    assert abs(py["file_share"] - 3 / 5) < 1e-6

    go = out["go"]
    assert (go["n_files"], go["n_repos"]) == (1, 1)
    assert go["dup_frac"] == 0.0

    unk = out["unknown"]
    assert (unk["n_files"], unk["n_chars"]) == (1, 0)

    # shares sum to 1
    assert abs(sum(r["file_share"] for r in out.values()) - 1.0) < 1e-5
