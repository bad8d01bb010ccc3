from __future__ import annotations

from schema_validator_spark.operators.licenses import (
    LICENSE_MARKERS,
    detect_license,
    license_summary,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python

MIT = "Permission is hereby granted, free of charge, to any person"
APACHE = "Licensed under the Apache License, Version 2.0 (the License)"
GPL = "under the terms of the GNU General Public License as published"
LGPL = "under the terms of the GNU Lesser General Public License"
AGPL = "under the terms of the GNU Affero General Public License"
BSD = "Redistribution and use in source and binary forms, with or without"
MPL = "subject to the terms of the Mozilla Public License, v. 2.0"
UNL = "This is free and unencumbered software released into the public domain"


def _lic(spark, content):
    df = spark.createDataFrame([(1, content)], "id long, content string")
    return detect_license(df, "content").collect()[0]["license"]


def test_each_marker(spark):
    assert _lic(spark, MIT) == "MIT"
    assert _lic(spark, APACHE) == "Apache-2.0"
    assert _lic(spark, GPL) == "GPL"
    assert _lic(spark, LGPL) == "LGPL"
    assert _lic(spark, AGPL) == "AGPL-3.0"
    assert _lic(spark, BSD) == "BSD"
    assert _lic(spark, MPL) == "MPL-2.0"
    assert _lic(spark, UNL) == "Unlicense"


def test_lgpl_not_gpl(spark):
    # "GNU Lesser General Public License" must NOT read as GPL: the
    # GPL marker phrase is not a substring of the LGPL phrase, and
    # priority order puts LGPL first anyway
    assert _lic(spark, LGPL) == "LGPL"
    # a COPYING file quoting both phrases resolves by priority
    assert _lic(spark, LGPL + "\n" + GPL) == "LGPL"


def test_fallbacks(spark):
    assert _lic(spark, "Copyright (c) 2024 Someone") == "UNKNOWN"
    assert _lic(spark, "def f():\n    return 1\n") == "NONE"
    assert _lic(spark, None) == "NONE"


def test_case_insensitive(spark):
    assert _lic(spark, MIT.upper()) == "MIT"


def test_detect_zero_shuffle(spark):
    df = spark.createDataFrame([(1, MIT)], "id long, content string")
    out = detect_license(df, "content")
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_summary_shares(spark):
    rows = [
        ("r1", MIT), ("r1", MIT), ("r1", GPL), ("r1", "x"),
        ("r2", APACHE),
    ]
    df = spark.createDataFrame(rows, "repo string, content string")
    got = {
        (r["repo"], r["license"]): (r["n_files"], r["share"])
        for r in license_summary(df, "repo", "content").collect()
    }
    assert got[("r1", "MIT")] == (2, 0.5)
    assert got[("r1", "GPL")] == (1, 0.25)
    assert got[("r1", "NONE")] == (1, 0.25)
    assert got[("r2", "Apache-2.0")] == (1, 1.0)


def test_marker_names_stable(spark):
    # output values are an API: names must not drift
    assert {n for n, _ in LICENSE_MARKERS} == {
        "Apache-2.0", "AGPL-3.0", "LGPL", "GPL", "MPL-2.0", "MIT",
        "BSD", "Unlicense",
    }


def test_repo_license_dim_and_propagation(spark):
    from schema_validator_spark.operators.licenses import (
        propagate_repo_license,
        repo_license,
    )

    rows = [
        # rA: LICENSE says MIT, COPYING says GPL -> most restrictive GPL
        ("rA", "LICENSE", MIT),
        ("rA", "docs/COPYING", GPL),
        ("rA", "src/a.go", "package a"),
        # rB: single permissive license file, nested, with extension
        ("rB", "sub/pkg/license.md", APACHE),
        ("rB", "src/b.go", "package b"),
        # rC: license file whose text matches no marker -> UNKNOWN
        ("rC", "LICENSE.txt", "proprietary secret sauce"),
        ("rC", "src/c.go", "package c"),
        # rD: no license file at all; a GPL HEADER in source must NOT
        # set the repo verdict (repo-level detection, not file-level),
        # and license-ish source filenames are not license files
        ("rD", "src/license_checker.go", GPL),
        ("rD", "src/d.go", "package d"),
        # rE: suffixed license filename
        ("rE", "LICENSE-MIT", MIT),
        ("rE", "src/e.go", "package e"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, content string")
    dim = {r["repo"]: (r["repo_license"], r["n_license_files"])
           for r in repo_license(df, "repo", "path", "content").collect()}
    assert dim == {
        "rA": ("GPL", 2),
        "rB": ("Apache-2.0", 1),
        "rC": ("UNKNOWN", 1),
        "rE": ("MIT", 1),
    }

    out = propagate_repo_license(df, "repo", "path", "content")
    got = {(r["repo"], r["path"]): r["repo_license"] for r in out.collect()}
    assert got[("rA", "src/a.go")] == "GPL"
    assert got[("rB", "src/b.go")] == "Apache-2.0"
    assert got[("rC", "src/c.go")] == "UNKNOWN"
    assert got[("rD", "src/d.go")] == "NONE"
    assert got[("rD", "src/license_checker.go")] == "NONE"
    assert got[("rE", "src/e.go")] == "MIT"
    assert out.count() == len(rows)
    # broadcast join: the file table never shuffles (the only Exchange
    # is the tiny dim groupBy feeding the broadcast)
    from schema_validator_spark.plans.inspect import join_kinds
    assert any("Broadcast" in k for k in join_kinds(out))


def test_propagate_repo_license_collision_raises(spark):
    import pytest

    from schema_validator_spark.operators.licenses import (
        propagate_repo_license,
    )

    df = spark.createDataFrame(
        [("r", "LICENSE", "x", "MIT")],
        "repo string, path string, content string, repo_license string",
    )
    with pytest.raises(ValueError, match="repo_license"):
        propagate_repo_license(df, "repo", "path", "content")
