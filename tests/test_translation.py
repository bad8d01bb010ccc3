from __future__ import annotations

from schema_validator_spark.operators.translation import cross_lang_pairs

SCHEMA = "repo string, path string, lang string, content string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return cross_lang_pairs(df, "repo", "path", "lang", "content", **kw)


def test_basic_pair_and_orientation(spark):
    out = _run(
        spark,
        [
            ("r", "algo/sort.py", "py", "def sort(): pass"),
            ("r", "algo/sort.go", "go", "func sort() {}"),
            ("r", "algo/other.py", "py", "x"),
        ],
    ).collect()
    assert len(out) == 1
    p = out[0]
    assert (p["lang_a"], p["lang_b"]) == ("go", "py")
    assert p["stem"] == "algo/sort"
    assert p["path_a"] == "algo/sort.go" and p["path_b"] == "algo/sort.py"
    assert p["n_chars_a"] == len("func sort() {}")


def test_three_langs_three_pairs(spark):
    out = _run(
        spark,
        [
            ("r", "m.py", "py", "aaaa"),
            ("r", "m.go", "go", "bb"),
            ("r", "m.js", "js", "cccccccc"),
        ],
    ).collect()
    assert len(out) == 3
    pairs = {(p["lang_a"], p["lang_b"]) for p in out}
    assert pairs == {("go", "js"), ("go", "py"), ("js", "py")}
    ratio = {
        (p["lang_a"], p["lang_b"]): p["size_ratio"] for p in out
    }
    assert ratio[("go", "py")] == 0.5  # 2 vs 4 chars


def test_unambiguous_gate_drops_duplicated_lang(spark):
    rows = [
        ("r", "a/m.py", "py", "x"),
        ("r", "b/m.py", "py", "y"),  # different stem (dir differs) — fine
        ("r", "a/m.go", "go", "z"),
        ("r", "c/n.py", "py", "1"),
        ("r", "c/n2.py", "py", "2"),
        ("r", "c/n.go", "go", "3"),
    ]
    out = _run(spark, rows).collect()
    # a/m pairs; c/n vs c/n2 are different stems so c/n pairs too
    assert {p["stem"] for p in out} == {"a/m", "c/n"}
    dup = [
        ("r", "d/x.py", "py", "1"),
        ("r", "d/x.go", "go", "2"),
        ("r", "d/x.pyi", "py", "3"),  # same stem, lang py twice
    ]
    assert _run(spark, dup).count() == 0
    # with the gate off, both py files pair with the go file
    loose = _run(spark, dup, unambiguous_only=False).collect()
    assert len(loose) == 2
    assert all({p["lang_a"], p["lang_b"]} == {"go", "py"} for p in loose)


def test_cross_repo_never_pairs(spark):
    out = _run(
        spark,
        [
            ("r1", "m.py", "py", "x"),
            ("r2", "m.go", "go", "y"),
        ],
    )
    assert out.count() == 0


def test_null_lang_excluded(spark):
    out = _run(
        spark,
        [
            ("r", "m.py", "py", "x"),
            ("r", "m.go", None, "y"),
        ],
    )
    assert out.count() == 0


def test_stem_strips_one_extension_only(spark):
    out = _run(
        spark,
        [
            ("r", "pkg/data.tar.py", "py", "x"),
            ("r", "pkg/data.tar.go", "go", "y"),
            ("r", "pkg/data.go", "go", "z"),  # stem pkg/data — no pair
        ],
    ).collect()
    assert len(out) == 1 and out[0]["stem"] == "pkg/data.tar"


def test_cap_drops_megastem_when_ambiguous_allowed(spark):
    rows = [("r", f"v{i}/index.js", "js", "x") for i in range(20)] + [
        ("r", f"v{i}/index.py", "py", "y") for i in range(20)
    ]
    # 40 distinct stems actually — force ONE stem instead:
    rows = [("r", f"index.ext{i}", "js" if i % 2 else "py", "x")
            for i in range(20)]
    out = _run(spark, rows, unambiguous_only=False, max_files_per_stem=16)
    assert out.count() == 0  # 20 files in one stem > cap -> dropped whole
    small = [("r", f"index.ext{i}", "js" if i % 2 else "py", "x")
             for i in range(4)]
    assert _run(
        spark, small, unambiguous_only=False, max_files_per_stem=16
    ).count() == 4  # 2 js x 2 py


def test_zero_length_contents_ratio_one(spark):
    out = _run(
        spark,
        [("r", "m.py", "py", ""), ("r", "m.go", "go", "")],
    ).collect()
    assert out[0]["size_ratio"] == 1.0
