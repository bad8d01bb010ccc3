from __future__ import annotations

import json

from schema_validator_spark.functions.notebook import (
    extract_code_cells,
    notebook_stats,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python


def _nb(*cells):
    return json.dumps({"cells": [
        {"cell_type": t, "source": src} for t, src in cells
    ]})


NB1 = _nb(
    ("markdown", ["# Title\n", "prose"]),
    ("code", ["import os\n", "print(os.sep)\n"]),
    ("code", ["x = 1"]),
)
NB2 = _nb(("markdown", ["only prose"]))
ROWS = [
    (1, NB1),
    (2, NB2),
    (3, "not a notebook {"),
    (4, None),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, nb string")


def test_extract_code_cells(spark):
    got = {
        (r["id"], r["cell_index"]): (r["code"], r["n_lines"])
        for r in extract_code_cells(_df(spark), ["id"], "nb").collect()
    }
    # cell_index is the position among ALL cells (markdown included)
    assert got == {
        (1, 1): ("import os\nprint(os.sep)\n", 2),
        (1, 2): ("x = 1", 1),
    }


def test_cell_types_filter(spark):
    out = extract_code_cells(
        _df(spark), ["id"], "nb", cell_types=("markdown",)
    ).collect()
    assert {(r["id"], r["cell_index"]) for r in out} == {(1, 0), (2, 0)}


def test_extract_zero_shuffle(spark):
    out = extract_code_cells(_df(spark), ["id"], "nb")
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_notebook_stats(spark):
    got = {
        r["id"]: (r["n_cells"], r["n_code_cells"], r["n_code_lines"],
                  r["parsed"])
        for r in notebook_stats(_df(spark), ["id"], "nb").collect()
    }
    assert got[1] == (3, 2, 3, True)
    assert got[2] == (1, 0, 0, True)
    assert got[3] == (None, None, None, False)
    assert got[4] == (None, None, None, False)


def test_string_source_variant_skipped(spark):
    # nbformat also allows source as ONE string; the array schema
    # parses that cell's source as NULL -> skipped in extraction,
    # counted as a 0-line code cell in stats
    nb = json.dumps({"cells": [{"cell_type": "code", "source": "x=1"}]})
    df = spark.createDataFrame([(1, nb)], "id long, nb string")
    assert extract_code_cells(df, ["id"], "nb").count() == 0
    st = notebook_stats(df, ["id"], "nb").collect()[0]
    assert (st["n_cells"], st["n_code_cells"], st["n_code_lines"]) == (1, 1, 0)
