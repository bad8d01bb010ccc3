from __future__ import annotations

from schema_validator_spark.operators.manifests import (
    dependency_edges,
    manifest_deps,
)

SCHEMA = "repo string, path string, content string"

REQS = "requests>=2.0\n# comment\n-r base.txt\nflask[async]==2.1\nnumpy"
GOMOD = (
    "module example.com/me\n\nrequire (\n\tgithub.com/x/y v1.2.3\n"
    "\tgolang.org/z v0.1.0 // indirect\n)\nrequire gopkg.in/yaml.v2 v2.4.0\n"
)
PKG = (
    '{"name": "app", "dependencies": {"react": "^18", "lodash": "4"},'
    ' "devDependencies": {"jest": "^29"}}'
)

ROWS = [
    ("r1", "requirements.txt", REQS),
    ("r1", "go.mod", GOMOD),
    ("r1", "web/package.json", PKG),
    ("r1", "src/main.py", "import os\n"),           # not a manifest
    ("r2", "requirements-dev.txt", "pytest\n"),     # basename variant
    ("r2", "package.json", "{not json"),            # malformed -> 0 deps
    ("r2", "package.json.bak", PKG),                # suffix: no match
]


def _deps(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return manifest_deps(df, ["repo", "path"], "path", "content")


def test_extraction_per_format(spark):
    got = {(r["repo"], r["manifest_type"], r["dep"]): r["kind"]
           for r in _deps(spark).collect()}
    assert got == {
        ("r1", "pip_requirements", "requests"): "runtime",
        ("r1", "pip_requirements", "flask"): "runtime",
        ("r1", "pip_requirements", "numpy"): "runtime",
        ("r1", "go_mod", "github.com/x/y"): "runtime",
        ("r1", "go_mod", "golang.org/z"): "runtime",
        ("r1", "go_mod", "gopkg.in/yaml.v2"): "runtime",
        ("r1", "npm_package", "react"): "runtime",
        ("r1", "npm_package", "lodash"): "runtime",
        ("r1", "npm_package", "jest"): "dev",
        ("r2", "pip_requirements", "pytest"): "runtime",
    }


def test_comment_option_and_module_lines_excluded(spark):
    deps = {r["dep"] for r in _deps(spark).collect()}
    assert "base.txt" not in deps          # -r option line
    assert "example.com/me" not in deps    # go module self-declaration


def test_edges_distinct(spark):
    rows = ROWS + [("r1", "api/requirements.txt", "requests\nnumpy")]
    df = spark.createDataFrame(rows, SCHEMA)
    edges = dependency_edges(df, "repo", "path", "content").collect()
    keyed = [(r["repo"], r["manifest_type"], r["dep"]) for r in edges]
    assert len(keyed) == len(set(keyed))
    assert keyed.count(("r1", "pip_requirements", "requests")) == 1


def test_null_and_empty_content(spark):
    rows = [("r", "requirements.txt", None), ("r", "go.mod", "")]
    df = spark.createDataFrame(rows, SCHEMA)
    assert manifest_deps(df, ["repo"], "path", "content").count() == 0


def test_zero_shuffle_plan(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(ROWS, SCHEMA)
    assert n_exchanges(
        manifest_deps(df, ["repo", "path"], "path", "content")
    ) == 0


def test_url_vcs_and_replace_exclude_not_claimed(spark):
    reqs = (
        "git+https://github.com/a/b.git#egg=b\n"
        "https://files.pythonhosted.org/x/pkg.whl\n"
        "pkg @ https://example.com/pkg.whl\n"
        "torch==2.1 ; python_version < '3.12'\r\n"   # CRLF + marker
        "plain\n"
    )
    gomod = (
        "module m\nrequire (\n\tgood.com/a v1.0.0\n)\n"
        "replace (\n\told.example.com/a v1.0.0 => ./fork\n)\n"
        "exclude (\n\tbad.com/x v1.2.3\n)\n"
        "exclude worse.com/y v9.9.9\n"
        "replace p.com/q v1.0.0 => r.com/s v2.0.0\n"
    )
    rows = [("r", "requirements.txt", reqs), ("r", "go.mod", gomod)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r["manifest_type"], r["dep"])
           for r in manifest_deps(df, ["repo"], "path",
                                  "content").collect()}
    assert got == {
        ("pip_requirements", "pkg"),
        ("pip_requirements", "torch"),
        ("pip_requirements", "plain"),
        ("go_mod", "good.com/a"),
    }
