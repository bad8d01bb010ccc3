from __future__ import annotations

import pytest

from schema_validator_spark.operators.complexity import (
    DECISION_SYNTAX,
    complexity_by_lang,
    complexity_stats,
    decision_pattern,
)

SCHEMA = "doc_id int, lang string, content string"


def _stats(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = complexity_stats(df, "content", "lang", keep_cols=["doc_id"])
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_python_decisions_and_indent(spark):
    got = _stats(spark, [(
        1, "py",
        "def f():\n\tif a and b:\n\t\tfor i in r:\n\t\t\tx = 1\n",
    )])[1]
    assert got["n_decisions"] == 3          # if, and, for
    assert got["n_bool_ops"] == 0           # py has no &&/|| operators
    assert got["cyclomatic"] == 4
    assert got["n_lines"] == 5              # trailing \n -> empty last line
    assert got["max_indent"] == 12          # 3 tabs x TAB_WIDTH
    assert got["decision_density"] == round(3 / 5, 6)


def test_cfamily_bool_ops_counted_by_length_delta(spark):
    got = _stats(spark, [(
        1, "go",
        "func main() {\n\tif a && b || c {\n\t\tx = 1\n\t}\n}\n",
    )])[1]
    assert got["n_decisions"] == 1          # if
    assert got["n_bool_ops"] == 2           # && and ||
    assert got["cyclomatic"] == 4


def test_whole_word_matching_excludes_substrings(spark):
    # "gift" contains "if", "for_each" has no \b after "for", "android"
    # contains "and" — none may count; bare "if" at string edges does.
    got = _stats(spark, [(1, "py", "gift = for_each(android)\nif x:")])[1]
    assert got["n_decisions"] == 1
    assert got["cyclomatic"] == 2


def test_unregistered_lang_and_nulls(spark):
    got = _stats(spark, [
        (1, "cobol", "PROCEDURE DIVISION.\n    IF X > 0\n"),
        (2, "py", None),
        (3, None, "if x:\n    pass\n"),
    ])
    # unregistered lang: zero decisions (contract mirrors COMMENT_SYNTAX)
    assert got[1]["n_decisions"] == 0 and got[1]["cyclomatic"] == 1
    assert got[1]["max_indent"] == 4        # indent still measured
    # NULL content -> one empty line, all-zero metrics, density defined
    assert got[2] == {
        "doc_id": 2, "n_lines": 1, "n_decisions": 0, "n_bool_ops": 0,
        "cyclomatic": 1, "max_indent": 0, "decision_density": 0.0,
    }
    # NULL lang -> unregistered
    assert got[3]["n_decisions"] == 0


def test_blank_lines_and_mixed_tab_space_indent(spark):
    # all-whitespace lines contribute indent 0; "\t x" = 4 + 1 columns
    got = _stats(spark, [(1, "py", "a\n        \n\t x = 1\n")])[1]
    assert got["max_indent"] == 5
    got2 = _stats(spark, [(1, "py", "   \n\t\n")])[1]
    assert got2["max_indent"] == 0


def test_lang_case_folds_and_syntactic_tier_documented(spark):
    # declared lang case-folds; a keyword inside a comment/string DOES
    # count (documented syntactic tier)
    got = _stats(spark, [
        (1, "PY", "if x:\n"),
        (2, "js", "// case note\ns = 'while'\n"),
    ])
    assert got[1]["n_decisions"] == 1
    assert got[2]["n_decisions"] == 2       # case + while, lexical


def test_by_lang_rollup(spark):
    rows = [
        (1, "py", "if a:\n\tif b:\n\t\tx\n"),
        (2, "py", "x = 1\n"),
        (3, "go", "if a && b {\n}\n"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["lang"]: r.asDict()
           for r in complexity_by_lang(df, "content", "lang").collect()}
    py = got["py"]
    assert py["n_files"] == 2
    assert py["total_decisions"] == 2
    assert py["avg_cyclomatic"] == round((3 + 1) / 2, 6)
    assert py["max_cyclomatic"] == 3
    assert py["max_indent"] == 8
    assert got["go"]["total_decisions"] == 2   # if + &&


def test_zero_shuffle_plan(spark):
    # PLANS.md row: per-file metrics are a fixed codegen chain riding
    # the scan — zero Exchanges
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame([(1, "py", "if x:\n")], SCHEMA)
    out = complexity_stats(df, "content", "lang", keep_cols=["doc_id"])
    assert n_exchanges(out) == 0


def test_decision_pattern_longest_first_and_empty_syntax():
    # longest-first alternation so leftmost-FIRST engines can't stop at
    # a prefix alternative ("do" before "double"-style bugs)
    pat = decision_pattern(("do", "if", "while"))
    assert pat == r"\b(?:while|do|if)\b"
    assert set(DECISION_SYNTAX) >= {"py", "go", "js", "ts", "java", "c"}
    with pytest.raises(ValueError, match="empty decision syntax"):
        complexity_stats(None, "c", "l", syntax={})


def test_indent_style_classification(spark):
    from schema_validator_spark.operators.complexity import indent_style

    rows = [
        (1, "go", "func f() {\n\tx := 1\n\ty := 2\n}\n"),
        (2, "py", "def f():\n    pass\n"),
        (3, "py", "def f():\n\tif a:\n            pass\n"),  # both
        (4, "md", "no indent here\nat all\n"),
        (5, "py", None),
        # alignment space after a tab does NOT make it mixed
        (6, "go", "\tx := 1\n\t  aligned\n"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["style"]
           for r in df.select("doc_id",
                              indent_style("content").alias("style"))
           .collect()}
    assert got == {1: "tabs", 2: "spaces", 3: "mixed", 4: "none",
                   5: "none", 6: "tabs"}


def test_indent_profile_rollup(spark):
    from schema_validator_spark.operators.complexity import indent_profile

    rows = [
        (1, "go", "\tx\n"),
        (2, "go", "\ty\n"),
        (3, "go", "  z\n"),
        (4, "PY", "  a\n"),          # lang case-folds
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["lang"]: r.asDict()
           for r in indent_profile(df, "content", "lang").collect()}
    go = got["go"]
    assert go["n_files"] == 3
    assert go["tabs_share"] == round(2 / 3, 6)
    assert go["spaces_share"] == round(1 / 3, 6)
    assert go["mixed_share"] == 0.0
    assert got["py"]["spaces_share"] == 1.0
