from __future__ import annotations

from schema_validator_spark.operators.licenses import license_conflicts

MIT = "Permission is hereby granted, free of charge"
GPL = "GNU General Public License"
APACHE = "Licensed under the Apache License"


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "repo string, path string, content string"
    )
    out = license_conflicts(df, "repo", "path", "content")
    return {r["repo"]: r for r in out.collect()}


def test_conflict_and_undeclared(spark):
    rows = [
        # repo a: MIT LICENSE; one vendored Apache-headed file
        # (rank 3 > 1 -> conflict), one MIT-headed (no conflict),
        # one bare-copyright (UNKNOWN header -> ignored), one plain
        ("a", "LICENSE", MIT),
        ("a", "vendor/x.go", f"// {APACHE}\npackage x"),
        ("a", "src/y.go", f"// {MIT}\npackage y"),
        ("a", "src/z.go", "// Copyright 2020 Someone\npackage z"),
        ("a", "src/w.go", "package w"),
        # repo b: GPL LICENSE; Apache header is LESS restrictive
        ("b", "COPYING", GPL),
        ("b", "src/x.go", f"// {APACHE}\npackage x"),
        # repo c: NO license file; GPL header -> undeclared
        ("c", "src/x.go", f"// {GPL}\npackage x"),
        # repo d: unidentifiable LICENSE -> UNKNOWN (rank 8): GPL
        # header can never out-rank it
        ("d", "LICENSE", "all mine"),
        ("d", "src/x.go", f"// {GPL}\npackage x"),
    ]
    out = _run(spark, rows)

    a = out["a"]
    assert a["repo_license"] == "MIT"
    assert a["n_files"] == 5
    assert a["n_header_files"] == 2  # apache + mit; UNKNOWN ignored
    assert a["strictest_header"] == "Apache-2.0"
    assert (a["n_conflicts"], a["n_undeclared"]) == (1, 0)
    assert a["has_conflict"] is True

    b = out["b"]
    assert b["repo_license"] == "GPL"
    assert (b["n_conflicts"], b["n_undeclared"]) == (0, 0)
    assert b["has_conflict"] is False

    c = out["c"]
    assert c["repo_license"] == "NONE"
    assert (c["n_conflicts"], c["n_undeclared"]) == (0, 1)
    assert c["strictest_header"] == "GPL"

    d = out["d"]
    assert d["repo_license"] == "UNKNOWN"
    assert (d["n_conflicts"], d["n_undeclared"]) == (0, 0)


def test_license_file_excluded_from_header_side(spark):
    # the LICENSE file's own text must not count as a header
    rows = [("a", "LICENSE", GPL), ("a", "src/x.go", "package x")]
    out = _run(spark, rows)["a"]
    assert out["n_header_files"] == 0
    assert out["strictest_header"] is None
    assert out["has_conflict"] is False


def test_dual_license_uses_most_restrictive(spark):
    # MIT + GPL license files -> verdict GPL; Apache header fine
    rows = [
        ("a", "LICENSE-MIT", MIT),
        ("a", "LICENSE-GPL.txt", GPL),
        ("a", "src/x.go", f"// {APACHE}\n"),
    ]
    out = _run(spark, rows)["a"]
    assert out["repo_license"] == "GPL"
    assert out["n_conflicts"] == 0
