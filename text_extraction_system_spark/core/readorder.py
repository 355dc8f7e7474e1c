"""Column detection + reading-order reconstruction (north_star: "column and
reading-order reconstruction" in the PDF layout parse).

Reference context: the Java layout writer walks text positions in stream
order and re-sorts into visual order before emitting plain text
(``PDFToTextWithCoordinates.java`` sortByPosition/processPage); multi-column
pages must be read column-by-column, not row-by-row. The rebuild's
reconstruction is the classic x-projection cut:

1. project word boxes onto the x axis and merge intervals whose gap is
   smaller than ``COLUMN_GAP_MIN`` — the merged spans are the columns
   (a real column separator is wider than any intra-line word gap);
2. assign each word to the column containing its x-center;
3. reading order = columns left-to-right, within a column by (y, x).

Pure numpy over one page's boxes — runs inside Arrow batches in the
operator, and doubles as the python twin for tests.
"""

from __future__ import annotations

import numpy as np

COLUMN_GAP_MIN = 20.0


def column_spans(x: np.ndarray, w: np.ndarray, gap_min: float = COLUMN_GAP_MIN) -> list[tuple[float, float]]:
    """Merged x-projection intervals (sorted left to right)."""
    if len(x) == 0:
        return []
    order = np.argsort(x, kind="stable")
    spans: list[list[float]] = []
    for i in order:
        lo, hi = float(x[i]), float(x[i] + w[i])
        if spans and lo - spans[-1][1] < gap_min:
            spans[-1][1] = max(spans[-1][1], hi)
        else:
            spans.append([lo, hi])
    return [(a, b) for a, b in spans]


def reading_order(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Indices of the words in reading order (column-major, then y, then x)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    spans = column_spans(x, w)
    starts = np.array([s for s, _ in spans])
    centers = x + w / 2.0
    col = np.searchsorted(starts, centers, side="right") - 1
    return np.lexsort((x, y, col))


def n_columns(x: np.ndarray, w: np.ndarray) -> int:
    return len(column_spans(np.asarray(x, dtype=np.float64), np.asarray(w, dtype=np.float64)))
