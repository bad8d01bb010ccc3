from __future__ import annotations

from schema_validator_spark.functions.embedded import (
    embedded_text,
    embedded_text_stats,
)

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = embedded_text(df, ["doc_id"], "content", "lang").collect()
    out: dict[int, list[tuple[str, str]]] = {}
    for r in got:
        out.setdefault(r["doc_id"], []).append((r["kind"], r["text"]))
    return {k: sorted(v) for k, v in out.items()}


def test_strings_and_comments_py(spark):
    out = _run(spark, [
        (0, "py", 'x = "hi"\n# note one\ny = 2  # note two\n'),
        # triple-quoted docstring is ONE fragment, not a pair + body
        (1, "py", '"""doc\nspans lines"""\nz = 1\n'),
        (2, "py", "a = 1\n"),
    ])
    assert out[0] == sorted([
        ("string", '"hi"'), ("comment", "# note one"),
        ("comment", "# note two"),
    ])
    assert out[1] == [("string", '"""doc\nspans lines"""')]
    assert 2 not in out


def test_url_in_string_is_not_a_comment(spark):
    out = _run(spark, [
        (0, "js", 'const u = "http://x.io"; // real comment\n'),
    ])
    assert out[0] == sorted([
        ("string", '"http://x.io"'), ("comment", "// real comment"),
    ])


def test_block_before_line_no_double_emit(spark):
    out = _run(spark, [
        (0, "go", "/* block // inner */\na := 1 // tail\n"),
    ])
    assert out[0] == sorted([
        ("comment", "/* block // inner */"), ("comment", "// tail"),
    ])


def test_masking_trades_are_deterministic(spark):
    out = _run(spark, [
        # a quoted fragment inside a comment is a 'string' row, and
        # the comment text carries the mask token where it sat
        (0, "py", '# see "ref"\n'),
    ])
    kinds = dict(out[0])
    assert kinds["string"] == '"ref"'
    assert kinds["comment"] == "# see §"


def test_stats_and_duplicates(spark):
    rows = [
        (0, "py", 'a = "x"\nb = "x"\n# c\n'),
        (1, "rust", '"lit"\n// not extracted: no rust syntax\n'),
        (2, "py", None),
    ]
    df = embedded_text_stats(
        spark.createDataFrame(rows, SCHEMA), ["doc_id"], "content", "lang"
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[0]["n_strings"] == 2 and got[0]["n_comments"] == 1
    assert got[0]["string_chars"] == 6 and got[0]["comment_chars"] == 3
    # unregistered lang: strings still extracted, comments zero
    assert got[1]["n_strings"] == 1 and got[1]["n_comments"] == 0
    assert got[2]["n_strings"] == 0 and got[2]["n_comments"] == 0


def test_comment_lang_mix(spark):
    from schema_validator_spark.functions.embedded import (
        comment_lang_mix,
    )

    rows = [
        # r1: two English-commented files, one Spanish
        ("r1", "py", "# the result is in the set for it\nx = 1\n"),
        ("r1", "py", "# this is the value of it\ny = 2\n"),
        ("r1", "js", "// el que de la y los\nlet z = 3;\n"),
        # r1: no comments -> excluded from the mix entirely
        ("r1", "py", "a = 4\n"),
        # r2: an ENGLISH string literal must not tint the Spanish
        # comment (strings mask before comment extraction)
        ("r2", "js", 'const s = "the of and to is in that";\n'
                     "// el que de la y los un una\n"),
        # r2: stopword-free comment -> unknown, still counted
        ("r2", "go", "// zzz qqq\nvar v = 1\n"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, lang string, content string"
    )
    got = {
        (r["repo"], r["comment_lang"]): r.asDict()
        for r in comment_lang_mix(
            df, "repo", "content", "lang"
        ).collect()
    }
    assert set(got) == {
        ("r1", "en"), ("r1", "es"), ("r2", "es"), ("r2", "unknown"),
    }
    assert got[("r1", "en")]["n_files"] == 2
    assert abs(got[("r1", "en")]["share"] - 2 / 3) < 1e-6
    assert abs(got[("r1", "es")]["share"] - 1 / 3) < 1e-6
    assert got[("r2", "es")]["n_files"] == 1
    assert abs(got[("r2", "unknown")]["share"] - 0.5) < 1e-9
