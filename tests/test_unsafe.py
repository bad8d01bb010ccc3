from __future__ import annotations

import pytest

from schema_validator_spark.operators.unsafe import (
    UNSAFE_PATTERNS,
    has_unsafe_api,
    unsafe_findings,
    unsafe_rollup,
)

SCHEMA = "doc_id int, lang string, content string"

ROWS = [
    (1, "py", "import pickle\nx = eval(src)\ny = pickle.loads(data)\n"),
    (2, "py", "def ok():\n    return evaluate(x)\n"),     # no \b match
    (3, "js", "eval(s); el.innerHTML = html;\n"),
    (4, "c", "strcpy(a, b); strcat(a, c); system(cmd);\n"),
    (5, "go", "p := unsafe.Pointer(&x)\n"),
    (6, "rb", "eval(x)\n"),                # unregistered lang: no claim
    (7, "py", None),
    (8, None, "eval(x)\n"),
]


def _findings(spark, rows=ROWS):
    df = spark.createDataFrame(rows, SCHEMA)
    return unsafe_findings(df, ["doc_id"], "content", "lang")


def test_findings(spark):
    got = {(r["doc_id"], r["api_class"]): r["n_spans"]
           for r in _findings(spark).collect()}
    assert got == {
        (1, "EVAL_EXEC"): 1,
        (1, "PICKLE_LOAD"): 1,
        (3, "EVAL_EXEC"): 1,
        (3, "INNER_HTML"): 1,
        (4, "UNSAFE_STRING_FN"): 2,       # strcpy + strcat
        (4, "SYSTEM_CALL"): 1,
        (5, "UNSAFE_POINTER"): 1,
    }


def test_lang_scoping_is_strict(spark):
    # ruby eval, NULL lang, NULL content, evaluate() — all clean
    rows = [(1, "rb", "eval(x)"), (2, None, "eval(x)"), (3, "py", None),
            (4, "py", "evaluate(x)")]
    assert _findings(spark, rows).count() == 0


def test_quarantine_predicate(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    flagged = sorted(
        r["doc_id"]
        for r in df.filter(
            has_unsafe_api("content", "lang")
        ).collect()
    )
    assert flagged == [1, 3, 4, 5]


def test_rollup(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {(r["lang"], r["api_class"]): (r["n_files"], r["n_spans"])
           for r in unsafe_rollup(df, ["doc_id"], "content",
                                  "lang").collect()}
    assert got[("c", "UNSAFE_STRING_FN")] == (1, 2)
    assert got[("py", "EVAL_EXEC")] == (1, 1)


def test_ts_aliases_js_and_validation(spark):
    assert UNSAFE_PATTERNS["ts"] == UNSAFE_PATTERNS["js"]
    with pytest.raises(ValueError, match="empty pattern map"):
        unsafe_findings(None, ["i"], "c", "l", patterns={})
    with pytest.raises(ValueError, match="empty pattern map"):
        has_unsafe_api("c", "l", patterns={})


def test_zero_shuffle_findings_plan(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(ROWS, SCHEMA)
    assert n_exchanges(
        unsafe_findings(df, ["doc_id"], "content", "lang")
    ) == 0
