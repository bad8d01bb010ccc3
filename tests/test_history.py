from __future__ import annotations

import hashlib

from schema_validator_spark.operators.history import (
    churn_stats,
    latest_files,
)

SCHEMA = "repo string, path string, commit long, lang string, content string"

ROWS = [
    # f1: three commits, last two identical content
    ("r", "f1", 1, "py", "v1"),
    ("r", "f1", 2, "py", "v2"),
    ("r", "f1", 3, "py", "v2"),
    # f2: single version
    ("r", "f2", 7, "go", "only"),
    # f3: NULL content in head version
    ("r", "f3", 1, "py", "x"),
    ("r", "f3", 9, "py", None),
]


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_latest_files_head_selection(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {(r["repo"], r["path"]): r.asDict()
           for r in latest_files(df, ["repo", "path"], "commit").collect()}
    assert len(got) == 3
    f1 = got[("r", "f1")]
    assert f1["commit"] == 3 and f1["content"] == "v2"
    assert got[("r", "f2")]["commit"] == 7
    f3 = got[("r", "f3")]
    assert f3["commit"] == 9 and f3["content"] is None
    # schema: key, version, payload — original column set preserved
    assert sorted(f1) == sorted(["repo", "path", "commit", "lang",
                                 "content"])


def test_latest_files_tie_breaks_on_payload(spark):
    df = spark.createDataFrame(
        [("r", "f", 1, "py", "a"), ("r", "f", 1, "py", "b")], SCHEMA
    )
    got = latest_files(df, ["repo", "path"], "commit").collect()
    assert len(got) == 1
    assert got[0]["content"] == "b"      # greatest payload tuple wins


def test_latest_files_explicit_payload_cols(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = latest_files(
        df, ["repo", "path"], "commit", payload_cols=["content"]
    )
    assert got.columns == ["repo", "path", "commit", "content"]


def test_churn_stats(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["path"]: r.asDict()
           for r in churn_stats(df, ["repo", "path"], "commit",
                                "content").collect()}
    f1 = got["f1"]
    assert f1["n_versions"] == 3
    assert f1["n_distinct_versions"] == 2        # v1, v2 (v2 repeated)
    assert (f1["first_version"], f1["last_version"]) == (1, 3)
    assert f1["head_sha"] == _sha("v2")
    assert f1["churn_ratio"] == round(1 - 2 / 3, 6)
    f2 = got["f2"]
    assert f2["n_versions"] == 1 and f2["churn_ratio"] == 0.0
    # NULL content hashes as '' and still counts as a distinct state
    f3 = got["f3"]
    assert f3["n_distinct_versions"] == 2
    assert f3["head_sha"] == _sha("")


def test_reserved_names_raise(spark):
    import pytest

    df = spark.createDataFrame(
        [("r", "f", 1, "x")],
        "repo string, path string, commit long, _v string",
    )
    with pytest.raises(ValueError, match="_v"):
        latest_files(df, ["repo", "path"], "commit")
    with pytest.raises(ValueError, match="_head"):
        churn_stats(
            df.withColumnRenamed("_v", "_head"),
            ["repo", "path"], "commit", "_head",
        )


def test_one_exchange_plans(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(ROWS, SCHEMA)
    assert n_exchanges(latest_files(df, ["repo", "path"], "commit")) <= 1
    # churn adds the count(distinct) second phase
    assert n_exchanges(
        churn_stats(df, ["repo", "path"], "commit", "content")
    ) <= 2


def test_edit_pairs_basic(spark):
    from schema_validator_spark.operators.history import edit_pairs

    rows = [
        # f1: 1 -> 2 is a real edit (one line swapped of three),
        # 2 -> 3 is byte-identical (changed=False)
        ("r", "f1", 1, "py", "h\na\nb"),
        ("r", "f1", 2, "py", "h\na\nc"),
        ("r", "f1", 3, "py", "h\na\nc"),
        # f2: single version -> no pair
        ("r", "f2", 5, "py", "solo"),
        # f3: NULL -> text (NULL splits as one empty line)
        ("r", "f3", 1, "py", None),
        ("r", "f3", 2, "py", "x"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    got = {
        (r["repo"], r["path"], r["from_version"], r["to_version"]):
            r.asDict()
        for r in edit_pairs(
            df, ["repo", "path"], "commit", "content"
        ).collect()
    }
    assert len(got) == 3
    p12 = got[("r", "f1", 1, 2)]
    assert (p12["n_added"], p12["n_removed"], p12["n_common"]) == (1, 1, 2)
    assert p12["changed"] and abs(p12["line_jaccard"] - 0.5) < 1e-9
    p23 = got[("r", "f1", 2, 3)]
    assert not p23["changed"]
    assert (p23["n_added"], p23["n_removed"], p23["n_common"]) == (0, 0, 3)
    assert p23["line_jaccard"] == 1.0
    pn = got[("r", "f3", 1, 2)]
    # before = [''], after = ['x']: disjoint line sets
    assert (pn["n_added"], pn["n_removed"], pn["n_common"]) == (1, 1, 0)
    assert pn["changed"] and pn["line_jaccard"] == 0.0


def test_edit_pairs_changed_only_and_dup_lines(spark):
    from schema_validator_spark.operators.history import edit_pairs

    rows = [
        # duplicate lines count ONCE (distinct-line sets), but the
        # changed flag sees the raw bytes: v2 only duplicates a line
        ("r", "d", 1, "py", "a\nb"),
        ("r", "d", 2, "py", "a\nb\nb"),
        ("r", "d", 3, "py", "a\nb\nb"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    out = edit_pairs(
        df, ["repo", "path"], "commit", "content", changed_only=True
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["from_version"], r["to_version"]) == (1, 2)
    # distinct-line diff is empty, yet the pair IS a byte change
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (0, 0, 2)
    assert r["changed"] and r["line_jaccard"] == 1.0


def test_edit_pairs_reserved_names(spark):
    import pytest

    from schema_validator_spark.operators.history import edit_pairs

    df = spark.createDataFrame(
        [("r", 1, "x", "y")],
        "repo string, commit long, _sha string, content string",
    )
    with pytest.raises(ValueError, match="_sha"):
        edit_pairs(df, ["repo"], "commit", "content")


# ------------------------------------------------------------ commit_pairs

MSG_SCHEMA = ("repo string, path string, commit long, content string,"
              " message string")

MSG_ROWS = [
    # f1: v1 -> v2 good message; v2 -> v3 merge commit; v3 -> v4
    # unchanged (never a pair under changed_only)
    ("r", "f1", 1, "a\nb", "initial import of the parser"),
    ("r", "f1", 2, "a\nc", "Fix off-by-one in line splitting"),
    ("r", "f1", 3, "a\nd", "Merge branch 'main' into dev"),
    ("r", "f1", 4, "a\nd", "Rewrite everything (no-op pair)"),
    # f2: bot trailer lives in the BODY, subject looks fine
    ("r", "f2", 1, "x", "seed"),
    ("r", "f2", 2, "y",
     "Update parser tables\n\nCo-authored-by: bot <b@x>"),
    # f3: subject too short / NULL message
    ("r", "f3", 1, "p", "seed message here"),
    ("r", "f3", 2, "q", "fix"),
    ("r", "f3", 3, "r", None),
]


def test_commit_pairs_quality_filter(spark):
    from schema_validator_spark.operators.history import commit_pairs

    df = spark.createDataFrame(MSG_ROWS, MSG_SCHEMA)
    got = commit_pairs(
        df, ["repo", "path"], "commit", "content", "message"
    ).collect()
    # only f1 v1->v2 survives: merge rejected, f1 v3->v4 unchanged,
    # body trailer rejected, short subject rejected, NULL rejected
    assert len(got) == 1
    r = got[0]
    assert (r["path"], r["from_version"], r["to_version"]) == ("f1", 1, 2)
    assert r["message"] == "Fix off-by-one in line splitting"
    assert r["n_added"] == 1 and r["n_removed"] == 1
    assert "msg_ok" not in r.asDict()


def test_commit_pairs_audit_mode_keeps_verdict(spark):
    from schema_validator_spark.operators.history import commit_pairs

    df = spark.createDataFrame(MSG_ROWS, MSG_SCHEMA)
    got = {
        (r["path"], r["to_version"]): r["msg_ok"]
        for r in commit_pairs(
            df, ["repo", "path"], "commit", "content", "message",
            quality_only=False,
        ).collect()
    }
    # every CHANGED pair present with a verdict
    assert got == {
        ("f1", 2): True,
        ("f1", 3): False,   # merge subject
        ("f2", 2): False,   # Co-authored-by in body
        ("f3", 2): False,   # subject below min length
        ("f3", 3): False,   # NULL message -> empty subject
    }


def test_commit_pairs_subject_is_first_line(spark):
    from schema_validator_spark.operators.history import commit_pairs

    df = spark.createDataFrame(
        [("r", "f", 1, "a", "seed"),
         ("r", "f", 2, "b", "  Add retry logic to fetcher  \nlong body")],
        MSG_SCHEMA,
    )
    got = commit_pairs(
        df, ["repo", "path"], "commit", "content", "message"
    ).collect()
    assert len(got) == 1
    assert got[0]["message"] == "Add retry logic to fetcher"


def test_commit_pairs_reject_word_boundaries(spark):
    from schema_validator_spark.operators.history import commit_pairs

    rows = [("r", "f", 1, "a", "seed")] + [
        ("r", "f", i + 2, f"v{i}", m)
        for i, m in enumerate([
            "Bumped version to 1.2.3",       # bump stem -> reject
            "Bumper sticker parser added",   # 'bumper' != bump + boundary
            "Autocomplete the import list",  # 'auto' inside a word: keep
            "auto format the whole tree",    # bare 'auto' start -> reject
            "Reverted the cache change",     # revert stem -> reject
        ])
    ]
    df = spark.createDataFrame(rows, MSG_SCHEMA)
    kept = {
        r["message"]
        for r in commit_pairs(
            df, ["repo", "path"], "commit", "content", "message"
        ).collect()
    }
    assert kept == {"Bumper sticker parser added",
                    "Autocomplete the import list"}


def test_edit_pairs_keep_cols_passthrough(spark):
    from schema_validator_spark.operators.history import edit_pairs

    df = spark.createDataFrame(
        [("r", "f", 1, "a", "m1"), ("r", "f", 2, "b", "m2")], MSG_SCHEMA
    )
    got = edit_pairs(
        df, ["repo", "path"], "commit", "content", keep_cols=["message"]
    ).collect()
    assert len(got) == 1
    # the TO side's message rides through
    assert got[0]["message"] == "m2"


# ---------------------------------------------------------------------------
# edit_pairs_chunked (hot-key-safe tier)


def _pairs_sorted(df):
    # None-safe sort key (NULL from_version rows are legal output)
    return sorted(
        tuple("<null>" if v is None else str(v) for v in r)
        for r in df.collect()
    )


def test_edit_pairs_chunked_row_identical(spark):
    from schema_validator_spark.operators.history import (
        edit_pairs,
        edit_pairs_chunked,
    )

    # versions span many width-3 chunks with gaps (empty chunks between
    # populated ones), version ties, NULL content, multiple keys
    rows = [
        ("r", "f1", 1, "py", "h\na"),
        ("r", "f1", 2, "py", "h\nb"),
        ("r", "f1", 3, "py", "h\nb"),      # boundary: chunk 1 starts at 3
        ("r", "f1", 11, "py", "h\nc"),     # empty chunks 2 skipped
        ("r", "f1", 11, "py", "x\nc"),     # version tie
        ("r", "f1", 29, "py", None),       # NULL content far chunk
        ("r", "f2", 5, "go", "solo"),      # single version: no pair
        ("r", "f3", 1, "py", None),
        ("r", "f3", 2, "py", "x"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    serial = edit_pairs(df, ["repo", "path"], "commit", "content")
    chunked = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=3
    )
    assert _pairs_sorted(chunked) == _pairs_sorted(serial)
    assert chunked.columns == serial.columns


def test_edit_pairs_chunked_row_identical_keeps_and_changed_only(spark):
    from schema_validator_spark.operators.history import (
        edit_pairs,
        edit_pairs_chunked,
    )

    rows = [
        ("r", "f", 1, "a\nb", "m1"),
        ("r", "f", 2, "a\nb", "m2"),   # unchanged pair (dropped)
        ("r", "f", 9, "a\nc", "m3"),   # stitch across empty chunk
        ("r", "f", 10, "z", "m4"),
    ]
    df = spark.createDataFrame(rows, MSG_SCHEMA)
    kw = dict(changed_only=True, keep_cols=["message"])
    serial = edit_pairs(df, ["repo", "path"], "commit", "content", **kw)
    chunked = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=4, **kw
    )
    assert _pairs_sorted(chunked) == _pairs_sorted(serial)
    # the stitched (2 -> 9) pair crosses an empty chunk boundary
    assert any(r["from_version"] == 2 and r["to_version"] == 9
               for r in chunked.collect())


def test_edit_pairs_chunked_pathological_hot_key(spark):
    """A 100k-version single file — the degenerate key the serial window
    would sort in ONE task — completes with bounded per-task rows and
    exactly n-1 pairs, every adjacent pair present."""
    from pyspark.sql import functions as F

    from schema_validator_spark.operators.history import edit_pairs_chunked

    n = 100_000
    df = spark.range(n).select(
        F.lit("r").alias("repo"),
        F.lit("poetry.lock").alias("path"),
        F.col("id").alias("commit"),
        F.concat(
            F.lit("common header\ndep=="), (F.col("id") % 50).cast("string")
        ).alias("content"),
    )
    out = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=1000
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("from_version") + 1 == F.col("to_version")).cast("long")
        ).alias("adjacent"),
        F.sum(F.col("changed").cast("long")).alias("n_changed"),
    ).collect()[0]
    assert agg["n"] == n - 1
    assert agg["adjacent"] == n - 1
    # id%50 cycles: every adjacent pair rewrites the dep line
    assert agg["n_changed"] == n - 1
    # spot-check a chunk-boundary pair (999 -> 1000): one line swapped
    b = out.filter(F.col("to_version") == 1000).collect()[0]
    assert (b["from_version"], b["n_added"], b["n_removed"], b["n_common"]) \
        == (999, 1, 1, 1)


def test_edit_pairs_chunked_rejects_bad_inputs(spark):
    import pytest

    from schema_validator_spark.operators.history import edit_pairs_chunked

    df = spark.createDataFrame(
        [("r", "f", "abc123", "x")],
        "repo string, path string, commit string, content string",
    )
    with pytest.raises(ValueError, match="numeric/timestamp"):
        edit_pairs_chunked(df, ["repo", "path"], "commit", "content")
    dfn = spark.createDataFrame(
        [("r", "f", 1, "x")],
        "repo string, path string, commit long, content string",
    )
    with pytest.raises(ValueError, match="chunk_width"):
        edit_pairs_chunked(
            df=dfn, key_cols=["repo", "path"], version_col="commit",
            content_col="content", chunk_width=1,
        )
    clash = dfn.withColumn("_chunk", dfn.commit)
    with pytest.raises(ValueError, match="_chunk"):
        edit_pairs_chunked(clash, ["repo", "path"], "commit", "content")


def test_edit_pairs_chunked_null_versions_match_serial(spark):
    from schema_validator_spark.operators.history import (
        edit_pairs,
        edit_pairs_chunked,
    )

    rows = [
        ("r", "f", None, "py", "a"),
        ("r", "f", None, "py", "b"),   # NULL-version tie, sha breaks it
        ("r", "f", 1, "py", "c"),
        ("r", "f", 12, "py", "d"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    serial = edit_pairs(df, ["repo", "path"], "commit", "content")
    chunked = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=5
    )
    assert _pairs_sorted(chunked) == _pairs_sorted(serial)


def test_commit_pairs_chunked_row_identical(spark):
    from schema_validator_spark.operators.history import commit_pairs

    rows = [("r", "f", 1, "a", "seed")] + [
        ("r", "f", i + 2, f"v{i}", m)
        for i, m in enumerate([
            "Add retry logic to the fetcher",
            "merge branch main",              # reject
            "Fix the off-by-one in chunking",
            "Refactor parser error messages",
        ])
    ]
    df = spark.createDataFrame(rows, MSG_SCHEMA)
    serial = commit_pairs(df, ["repo", "path"], "commit", "content",
                          "message", quality_only=False)
    chunked = commit_pairs(df, ["repo", "path"], "commit", "content",
                           "message", quality_only=False,
                           chunked=True, chunk_width=2)
    assert _pairs_sorted(chunked) == _pairs_sorted(serial)
    assert chunked.columns == serial.columns


def test_edit_pairs_chunked_null_keys_match_serial(spark):
    """Review regression: the stitch join must be NULL-SAFE on key
    columns — a NULL-keyed file previously lost its chunk-boundary
    pairs silently."""
    from schema_validator_spark.operators.history import (
        edit_pairs,
        edit_pairs_chunked,
    )

    rows = [
        ("r", None, v, "py", f"line{v % 3}\nv{v}") for v in range(6)
    ] + [
        ("r", "f", v, "py", f"x{v}") for v in range(4)
    ] + [
        (None, None, v, "py", f"y{v}") for v in range(3)
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    serial = edit_pairs(df, ["repo", "path"], "commit", "content")
    chunked = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=2
    )
    assert _pairs_sorted(chunked) == _pairs_sorted(serial)
    # the NULL-keyed files really did produce boundary-stitched pairs
    assert serial.count() == 5 + 3 + 2


def test_edit_pairs_chunked_nonfinite_versions_match_serial(spark):
    """Review regression: NaN sorts greater than +inf in Spark's double
    ordering but floor(NaN/width) does not respect that — NaN and +inf
    go to the terminal chunk, -inf to its own leading chunk."""
    from schema_validator_spark.operators.history import (
        edit_pairs,
        edit_pairs_chunked,
    )

    inf = float("inf")
    rows = [
        ("r", "f", 0.0, "a"),
        ("r", "f", 1.0, "b"),
        ("r", "f", 2500.0, "c"),
        ("r", "f", float("nan"), "d"),
        ("r", "f", inf, "e"),
        ("r", "f", -inf, "z"),
        ("r", "f", None, "n"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit double, content string"
    )
    serial = edit_pairs(df, ["repo", "path"], "commit", "content")
    chunked = edit_pairs_chunked(
        df, ["repo", "path"], "commit", "content", chunk_width=1000
    )
    assert _pairs_sorted(chunked) == _pairs_sorted(serial)
    assert chunked.count() == 6
