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


def _nb(cells) -> str:
    import json

    return json.dumps({"cells": cells})


def _md(*lines):
    return {"cell_type": "markdown", "source": list(lines)}


def _code(*lines):
    return {"cell_type": "code", "source": list(lines)}


def test_markdown_code_pairs_basic(spark):
    from schema_validator_spark.functions.notebook import (
        markdown_code_pairs,
    )

    rows = [
        # md -> code pairs; second code cell has no fresh md -> no pair
        (0, _nb([_md("# Title\n", "intro"), _code("x = 1\n"),
                 _code("y = 2\n")])),
        # TWO consecutive md cells join with a newline between cells
        (1, _nb([_md("step one"), _md("step two"), _code("go()")])),
        # code first (no md) and md at the END pair with nothing
        (2, _nb([_code("a = 0"), _md("trailing prose")])),
        # raw cell BETWEEN md and code resets the run
        (3, _nb([_md("ctx"), {"cell_type": "raw", "source": ["r"]},
                 _code("b = 1")])),
        # unparseable notebook: no rows
        (4, "not json {"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {}
    for r in markdown_code_pairs(df, ["doc_id"], "content").collect():
        got.setdefault(r["doc_id"], []).append(r.asDict())
    assert set(got) == {0, 1}
    [p0] = got[0]
    assert p0["cell_index"] == 1 and p0["n_md_cells"] == 1
    assert p0["markdown"] == "# Title\nintro" and p0["code"] == "x = 1\n"
    [p1] = got[1]
    assert p1["cell_index"] == 2 and p1["n_md_cells"] == 2
    assert p1["markdown"] == "step one\nstep two"
    assert p1["code"] == "go()"
