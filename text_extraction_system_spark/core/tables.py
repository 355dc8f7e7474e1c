"""Table-region detection geometry (SURVEY.md I8-I10, re-derived).

The reference's CV pipeline (``ocr/tables/table_detection.py:311-445``)
clusters OCR cell contours into columns by left/middle/right pivot alignment
(+-5 px), consumes overlapping clusters, and accepts a block as a table iff
it has >= 2 multi-cell columns and >= 5 cells with sufficient cell-area share.
This module reimplements that contract over abstract cell boxes (the pixel
work that produced the boxes is stubbed upstream): pure numpy, shared by the
``detect_tables`` operator and the pytest goldens.

Thresholds mirror ``table_detection.py:47-58``:
  PIVOT_TOL      = 5     px pivot alignment tolerance
  MIN_CELLS      = 5     minimum cells per accepted table
  MIN_MC_COLUMNS = 2     minimum multi-cell columns
  MIN_CELL_AREA_SHARE = 0.15  cells must cover >= 15% of the block bbox
"""

from __future__ import annotations

import numpy as np

PIVOT_TOL = 5.0
MIN_CELLS = 5
MIN_MC_COLUMNS = 2
MIN_CELL_AREA_SHARE = 0.15


def _cluster_1d(values: np.ndarray, tol: float) -> np.ndarray:
    """Greedy 1-D clustering: sorted values closer than ``tol`` to the
    running cluster anchor share a label. Returns labels aligned to input."""
    order = np.argsort(values, kind="stable")
    labels = np.zeros(len(values), dtype=np.int64)
    cur = 0
    anchor = None
    for idx in order:
        v = values[idx]
        if anchor is None or v - anchor > tol:
            cur += 1
            anchor = v
        labels[idx] = cur - 1
    return labels


def detect_tables(cells: np.ndarray) -> list[dict]:
    """cells: (n, 4) array of [left, top, width, height] boxes -> accepted
    table regions with row/col grid assignment.

    Column identity = alignment of any pivot (left, mid, right) within
    PIVOT_TOL; here columns cluster on the mid pivot (the reference tries
    l/m/r and keeps the best — mid alone is sufficient for axis-aligned
    grids and keeps the algorithm deterministic). Tables split on vertical
    gaps larger than twice the median row pitch.
    """
    if len(cells) == 0:
        return []
    cells = np.asarray(cells, dtype=np.float64)
    left, top, w, h = cells[:, 0], cells[:, 1], cells[:, 2], cells[:, 3]
    mid = left + w / 2.0

    col_labels = _cluster_1d(mid, PIVOT_TOL)
    row_labels = _cluster_1d(top, PIVOT_TOL)

    # group rows into blocks: split where the gap between consecutive row
    # anchors exceeds 2x the median pitch (separates stacked tables / noise)
    row_anchor = np.array(
        [top[row_labels == r].min() for r in range(row_labels.max() + 1)]
    )
    pitches = np.diff(row_anchor)
    block_of_row = np.zeros(len(row_anchor), dtype=np.int64)
    if len(pitches) > 0:
        med = np.median(pitches[pitches > 0]) if (pitches > 0).any() else 0.0
        cut = (pitches > max(2.0 * med, PIVOT_TOL * 2)) if med > 0 else pitches > PIVOT_TOL * 2
        block_of_row[1:] = np.cumsum(cut)

    out: list[dict] = []
    for b in range(block_of_row.max() + 1):
        rows_in_block = np.where(block_of_row == b)[0]
        mask = np.isin(row_labels, rows_in_block)
        if mask.sum() < MIN_CELLS:
            continue
        bl, bt = left[mask], top[mask]
        bw, bh = w[mask], h[mask]
        bcols = col_labels[mask]
        # multi-cell columns within the block
        uniq, counts = np.unique(bcols, return_counts=True)
        if (counts >= 2).sum() < MIN_MC_COLUMNS:
            continue
        x0, y0 = bl.min(), bt.min()
        x1, y1 = (bl + bw).max(), (bt + bh).max()
        block_area = max((x1 - x0) * (y1 - y0), 1e-9)
        if (bw * bh).sum() / block_area < MIN_CELL_AREA_SHARE:
            continue
        # grid assignment: dense re-ranked row/col indices
        brows = row_labels[mask]
        r_index = {r: i for i, r in enumerate(np.unique(brows))}
        c_index = {c: i for i, c in enumerate(uniq)}
        grid = [
            (int(r_index[r]), int(c_index[c]), int(i))
            for i, (r, c) in enumerate(zip(brows, bcols))
        ]
        out.append({
            "left": float(x0),
            "top": float(y0),
            "width": float(x1 - x0),
            "height": float(y1 - y0),
            "n_rows": len(r_index),
            "n_cols": len(c_index),
            "n_cells": int(mask.sum()),
            "grid": grid,
            "cell_indices": np.where(mask)[0],
        })
    out.sort(key=lambda t: (t["top"], t["left"]))
    return out
