"""Mergeable quantile sketches via Arrow-batched Python — the
t-digest/KLL path the north rule names for distribution drift.

``percentile_approx`` (operators/drift.py) is the built-in route; this
module is the *custom sketch* route for when the sketch itself must be
stored, merged across runs, or compared across commits:

* stage 1 — ``partial_sketches``: mapInPandas over the scan; each Arrow
  batch contributes per-group centroid lists (mean, count).  Memory is
  bounded by (groups-in-batch x compression), never by group size.
* stage 2 — ``merge_sketches``: groupBy(group).applyInPandas merging
  centroid lists (sort by mean, weighted re-compress).  One shuffle of
  sketch rows — each a few KB — not of data rows.
* ``quantiles_from_sketch`` / ``sketch_drift`` — reconstruct quantiles,
  compare baseline vs current per group (max quantile shift, scaled).

The compression here is equal-weight (a KLL-flavored simplification,
not t-digest's k-scale tail bias): error is uniform across quantiles.
Deterministic: same input => byte-identical sketch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compress(means: np.ndarray, counts: np.ndarray, compression: int):
    """Weighted re-compression of sorted centroids to <= compression."""
    order = np.argsort(means, kind="mergesort")
    means, counts = means[order], counts[order]
    total = counts.sum()
    if len(means) <= compression:
        return means, counts
    # equal-weight binning by cumulative count
    edges = np.linspace(0, total, compression + 1)
    cum = np.cumsum(counts)
    bin_idx = np.searchsorted(edges, cum, side="left").clip(1, compression) - 1
    out_means = np.zeros(compression)
    out_counts = np.zeros(compression)
    np.add.at(out_counts, bin_idx, counts)
    np.add.at(out_means, bin_idx, means * counts)
    keep = out_counts > 0
    return out_means[keep] / out_counts[keep], out_counts[keep]


def _sketch_schema(group_cols: list[str], df: DataFrame) -> str:
    parts = [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols]
    parts += [
        "n bigint", "vmin double", "vmax double",
        "means array<double>", "counts array<bigint>",
    ]
    return ", ".join(parts)


def partial_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    compression: int = 128,
) -> DataFrame:
    """Per-Arrow-batch per-group centroid sketches (stage 1, no shuffle)."""
    schema = _sketch_schema(group_cols, df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pd.to_numeric(pdf[value_col], errors="coerce")
            pdf = pdf.assign(_v=vals).dropna(subset=["_v"])
            if pdf.empty:
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=True):
                v = g["_v"].to_numpy(dtype=float)
                m, c = _compress(v, np.ones(len(v)), compression)
                key_t = key if isinstance(key, tuple) else (key,)
                rows.append(
                    (*key_t, len(v), float(v.min()), float(v.max()),
                     m.tolist(), c.astype(np.int64).tolist())
                )
            yield pd.DataFrame(
                rows, columns=[*group_cols, "n", "vmin", "vmax", "means", "counts"]
            )

    return df.select(*group_cols, value_col).mapInPandas(run, schema)


def merge_sketches(
    partials: DataFrame,
    group_cols: list[str],
    *,
    compression: int = 128,
) -> DataFrame:
    """Merge per-batch sketches into one per group (stage 2, one shuffle
    of sketch rows)."""
    schema = _sketch_schema(group_cols, partials)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        means_all, counts_all = [], []
        n = 0
        vmin, vmax = np.inf, -np.inf
        for _, r in pdf.iterrows():
            means_all.append(np.asarray(r["means"], dtype=float))
            counts_all.append(np.asarray(r["counts"], dtype=float))
            n += int(r["n"])
            vmin = min(vmin, float(r["vmin"]))
            vmax = max(vmax, float(r["vmax"]))
        m, c = _compress(np.concatenate(means_all), np.concatenate(counts_all),
                         compression)
        return pd.DataFrame(
            [(*key, n, vmin, vmax, m.tolist(), c.astype(np.int64).tolist())],
            columns=[*group_cols, "n", "vmin", "vmax", "means", "counts"],
        )

    return partials.groupBy(*group_cols).applyInPandas(merge, schema)


def sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    compression: int = 128,
) -> DataFrame:
    """stage1 + stage2: one mergeable sketch row per group."""
    return merge_sketches(
        partial_sketches(df, value_col, group_cols, compression=compression),
        group_cols, compression=compression,
    )


def quantiles_py(means, counts, qs: list[float], vmin: float, vmax: float) -> list[float]:
    """Quantile reconstruction from a centroid list (driver-side)."""
    m = np.asarray(means, dtype=float)
    c = np.asarray(counts, dtype=float)
    total = c.sum()
    cum = np.cumsum(c) - c / 2.0  # centroid centers
    out = []
    for q in qs:
        target = q * total
        if target <= cum[0]:
            out.append(float(vmin) if q == 0 else float(m[0]))
        elif target >= cum[-1]:
            out.append(float(vmax) if q == 1 else float(m[-1]))
        else:
            out.append(float(np.interp(target, cum, m)))
    return out


def sketch_drift(
    sketches: DataFrame,
    group_col: str,
    baseline,
    current,
    *,
    qs: list[float] | None = None,
) -> dict:
    """Compare two groups' sketches: per-quantile values + max relative
    shift (driver-side — sketches are tiny)."""
    qs = qs or [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    rows = {r[group_col]: r for r in sketches.filter(
        F.col(group_col).isin(baseline, current)).collect()}
    if baseline not in rows or current not in rows:
        raise ValueError(f"missing group: have {sorted(rows)}")
    b, c = rows[baseline], rows[current]
    qb = quantiles_py(b["means"], b["counts"], qs, b["vmin"], b["vmax"])
    qc = quantiles_py(c["means"], c["counts"], qs, c["vmin"], c["vmax"])
    scale = max(abs(b["vmax"]), abs(b["vmin"]), 1e-12)
    shifts = [abs(x - y) / scale for x, y in zip(qb, qc)]
    return {
        "quantiles": qs,
        "baseline": qb,
        "current": qc,
        "max_shift": max(shifts),
        "mean_shift": sum(shifts) / len(shifts),
    }
