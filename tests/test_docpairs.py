from __future__ import annotations

import hashlib

from schema_validator_spark.operators.docpairs import (
    docstring_pairs,
    extract_nlpl_pairs,
)

FILE = (
    'def add(a, b):\n'
    '    """Add two numbers.\n'
    '\n'
    '    Longer description.\n'
    '    """\n'
    '    return a + b\n'
    '\n'
    'def nodoc(x):\n'
    '    return x\n'
    '\n'
    '@cached\n'
    "async def fetch(url):\n"
    "    '''Fetch it.'''\n"
    "    return await get(url)\n"
)


def _pairs(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id int, lang string, content string"
    )
    return extract_nlpl_pairs(df, ["doc_id"], "content", "lang")


def test_pairs_from_file(spark):
    got = {r["func_name"]: r.asDict()
           for r in _pairs(spark, [(1, "py", FILE)]).collect()}
    assert set(got) == {"add", "fetch"}        # nodoc dropped
    add = got["add"]
    assert add["signature"] == "def add(a, b):"
    assert add["docstring"] == (
        "Add two numbers.\n\n    Longer description.\n    "
    )
    assert add["chunk_idx"] == 0
    fetch = got["fetch"]
    assert fetch["signature"] == "async def fetch(url):"
    assert fetch["docstring"] == "Fetch it."
    assert fetch["chunk_idx"] == 2
    # chunk_sha pins the PL side byte-exactly (decorator attached)
    chunk2 = "@cached\nasync def fetch(url):\n    '''Fetch it.'''" \
             "\n    return await get(url)\n"
    assert fetch["chunk_sha"] == hashlib.sha256(chunk2.encode()).hexdigest()


def test_non_python_filtered_and_nulls(spark):
    rows = [
        (1, "go", 'func F() {}\n'),
        (2, None, FILE),
        (3, "py", None),
    ]
    assert _pairs(spark, rows).count() == 0


def test_quote_styles_and_prefixes(spark):
    rows = [
        (1, "py", 'def a():\n    r"""raw doc"""\n    pass\n'),
        (2, "py", "def b():\n    rb'''bytes doc'''\n    pass\n"),
        (3, "py", 'def c():\n    """"""\n    pass\n'),     # empty doc
        (4, "py", 'def d():\n    x = """not a doc"""\n'),  # not first stmt
    ]
    got = {r["doc_id"]: r.asDict()
           for r in _pairs(spark, rows).collect()}
    assert got[1]["docstring"] == "raw doc"
    assert got[2]["docstring"] == "bytes doc"
    assert got[3]["docstring"] == ""            # empty docstring is a pair
    assert 4 not in got


def test_lexical_limits_no_mis_sample(spark):
    rows = [
        # multi-line signature: no pair (documented)
        (1, "py", 'def f(\n    x,\n):\n    """doc"""\n    pass\n'),
        # comment between def and docstring: no pair (documented)
        (2, "py", 'def g():\n    # note\n    """doc"""\n'),
        # nested def's docstring never leaks to the outer pairless def
        (3, "py", 'def outer():\n    def inner():\n        """in"""\n'),
    ]
    assert _pairs(spark, rows).count() == 0


def test_docstring_pairs_on_prechunked_rows(spark):
    df = spark.createDataFrame(
        [(7, 'def z():\n    """zz"""\n    pass',)],
        "cid int, chunk_text string",
    )
    got = docstring_pairs(df, ["cid"], "chunk_text").collect()
    assert len(got) == 1 and got[0]["docstring"] == "zz"


def test_zero_shuffle_plan(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(
        [(1, "py", FILE)], "doc_id int, lang string, content string"
    )
    assert n_exchanges(
        extract_nlpl_pairs(df, ["doc_id"], "content", "lang")
    ) == 0


def test_docstring_coverage(spark):
    from schema_validator_spark.operators.docpairs import (
        docstring_coverage,
    )

    rows = [
        ("r1", "py", FILE),                       # add+fetch doc'd, nodoc not
        ("r1", "py", "def solo():\n    pass\n"),  # 1 fn, 0 doc'd
        ("r1", "go", "func F() {}\n"),            # filtered
        ("r2", "py", "import os\nX = 1\n"),       # preamble only: no fns
    ]
    df = spark.createDataFrame(
        rows, "repo string, lang string, content string"
    )
    got = {r["repo"]: r.asDict()
           for r in docstring_coverage(df, "repo", "content",
                                       "lang").collect()}
    r1 = got["r1"]
    assert (r1["n_functions"], r1["n_documented"]) == (4, 2)
    assert r1["doc_coverage"] == 0.5
    assert "r2" not in got                        # zero function chunks
