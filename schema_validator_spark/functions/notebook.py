"""Jupyter-notebook code-cell extraction — .ipynb files are JSON, and
a code-corpus pipeline wants the CODE inside them, not the wrapper
(The Stack ships Jupyter as both raw JSON and converted scripts;
Kocetkov et al. 2022 §3.1).  This lifts nbformat's stable core
(``cells[].cell_type`` + ``cells[].source``) with ``from_json`` and
explodes code cells to one row each, preserving cell position as
provenance.

Scale shape: ``from_json`` + ``posexplode`` ride the scan — per-row
codegen/generated iterators, zero shuffles, zero Python; output rows
∝ code cells.  Files that don't parse as notebooks yield NO rows here
by design (``from_json`` PERMISSIVE -> NULL struct) — corrupt-input
ACCOUNTING is operators/jsonspec.py's job; composing both gives the
quarantine view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: nbformat core: the two fields every notebook version carries per
#: cell.  `source` is a list of line strings (nbformat also allows a
#: single string; that variant parses as NULL source and is skipped —
#: modern exporters always write the list form).
NB_SCHEMA = (
    "STRUCT<cells: ARRAY<STRUCT<cell_type: STRING, source: ARRAY<STRING>>>>"
)


def extract_code_cells(
    df: DataFrame,
    id_cols: list[str],
    nb_col: str,
    *,
    cell_types: tuple[str, ...] = ("code",),
) -> DataFrame:
    """``(id_cols..., cell_index, cell_type, code, n_lines)`` — one row
    per kept cell; ``cell_index`` is the cell's position among ALL
    cells (0-based, provenance back into the notebook), ``code`` the
    source lines joined verbatim (nbformat keeps ``\\n`` inside the
    line strings), ``n_lines`` the source-line count."""
    parsed = df.select(
        *id_cols,
        F.from_json(F.col(nb_col), NB_SCHEMA).alias("_nb"),
    )
    cells = parsed.select(
        *id_cols,
        F.posexplode("_nb.cells").alias("cell_index", "_cell"),
    )
    return (
        cells.filter(
            F.col("_cell.cell_type").isin(list(cell_types))
            & F.col("_cell.source").isNotNull()
        )
        .select(
            *id_cols,
            "cell_index",
            F.col("_cell.cell_type").alias("cell_type"),
            F.concat_ws("", F.col("_cell.source")).alias("code"),
            F.size("_cell.source").alias("n_lines"),
        )
    )


def notebook_stats(
    df: DataFrame, id_cols: list[str], nb_col: str
) -> DataFrame:
    """Per-notebook rollup without exploding: ``(id_cols..., n_cells,
    n_code_cells, n_code_lines, parsed)`` — one aggregate-HOF pass,
    zero shuffles; ``parsed=false`` rows (corrupt JSON / non-notebook / no cells array)
    are kept with NULL counts so the corpus accounting stays exact."""
    parsed = df.select(
        *id_cols, F.from_json(F.col(nb_col), NB_SCHEMA).alias("_nb")
    )
    cells = F.col("_nb.cells")
    code = F.filter(cells, lambda c: c.cell_type == F.lit("code"))
    return parsed.select(
        *id_cols,
        F.size(cells).alias("n_cells"),
        F.size(code).alias("n_code_cells"),
        F.aggregate(
            code,
            F.lit(0),
            lambda acc, c: acc + F.coalesce(F.size(c.source), F.lit(0)),
        ).alias("n_code_lines"),
        # PERMISSIVE from_json yields a struct with NULL fields (not a
        # NULL struct) for corrupt JSON, so "parsed as a notebook" keys
        # on the cells field itself
        cells.isNotNull().alias("parsed"),
    )
