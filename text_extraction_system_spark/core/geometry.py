"""Coordinate <-> text mapping primitives (SURVEY.md J4-J7, C2-C4).

Per-document numpy computations (document data is small; these run inside
Arrow UDF batches, never as DataFrame joins):

* ``page_of_char``      — which page contains char offset k; the reference
  uses a golden-ratio search (``pdf_coords_common.py:40-71``); here
  ``np.searchsorted`` over page start offsets.
* ``overlap_area`` / ``overlaps_enough`` — bbox overlap math
  (``coord_text_map.py:43-59``), >= 20% area threshold.
* ``find_longest_location`` — longest run of consecutive chars whose boxes
  overlap a selection area (``coord_text_map.py:96-128``).
* ``line_areas``        — char span -> merged per-line rectangles with greedy
  horizontal extension (``text_coord_map.py:41-150``).
* ``anchor_toc_sections`` — TOC entries -> sections by nearest-symbol search
  within the page's char range (``data_extract.py:220-263``,
  ``coord_text_map.py:69-94``), ends assigned at the next same-or-higher
  level section (``data_extract.py:245-257``).
"""

from __future__ import annotations

import numpy as np

OVERLAP_SHARE = 0.2


def page_of_char(page_starts: np.ndarray, k: int) -> int:
    """Index of the page whose [start, next_start) range contains char k."""
    return int(np.searchsorted(np.asarray(page_starts), k, side="right") - 1)


def overlap_area(boxes: np.ndarray, area: tuple[float, float, float, float]) -> np.ndarray:
    """Vectorized intersection area of (n,4) xywh boxes with one xywh area."""
    b = np.asarray(boxes, dtype=np.float64)
    ax, ay, aw, ah = area
    ix = np.minimum(b[:, 0] + b[:, 2], ax + aw) - np.maximum(b[:, 0], ax)
    iy = np.minimum(b[:, 1] + b[:, 3], ay + ah) - np.maximum(b[:, 1], ay)
    return np.clip(ix, 0, None) * np.clip(iy, 0, None)


def overlaps_enough(boxes: np.ndarray, area, share: float = OVERLAP_SHARE) -> np.ndarray:
    b = np.asarray(boxes, dtype=np.float64)
    own = np.maximum(b[:, 2] * b[:, 3], 1e-12)
    return overlap_area(b, area) / own >= share


def find_longest_location(boxes: np.ndarray, area) -> tuple[int, int] | None:
    """Longest [start, end) run of consecutive chars overlapping ``area``."""
    mask = overlaps_enough(boxes, area)
    if not mask.any():
        return None
    padded = np.concatenate(([False], mask, [False])).astype(np.int8)
    edges = np.flatnonzero(np.diff(padded))
    starts, ends = edges[::2], edges[1::2]
    best = int(np.argmax(ends - starts))
    return int(starts[best]), int(ends[best])


def line_areas(boxes: np.ndarray, start: int, end: int,
               v_tol: float = 2.0) -> list[tuple[float, float, float, float]]:
    """Merged per-line rectangles of the char span [start, end): consecutive
    chars whose vertical positions agree within ``v_tol`` extend the current
    line rect; zero-size separator boxes are skipped.

    Fast path: when every printable char in the span sits at ONE y (a span
    within a single text line — the overwhelmingly common case, and always
    true for paragraph spans of the monospace layout), the merged rect is a
    single vectorized min/max. The general accumulating-rect loop remains
    for multi-line spans (its merge rule compares against the rect's min-y,
    which is not expressible as a compare-to-previous scan)."""
    seg = np.asarray(boxes[start:end], dtype=np.float64)
    if len(seg):
        pr = (seg[:, 2] > 0) & (seg[:, 3] > 0)
        if pr.any():
            ys = seg[pr, 1]
            if (ys == ys[0]).all():
                xs0 = seg[pr, 0]
                x1 = (seg[pr, 0] + seg[pr, 2]).max()
                y1 = (seg[pr, 1] + seg[pr, 3]).max()
                x0 = xs0.min()
                y0 = ys.min()
                return [(float(x0), float(y0), float(x1 - x0), float(y1 - y0))]
        else:
            return []
    out: list[list[float]] = []
    for i in range(start, end):
        x, y, w, h = boxes[i]
        if w <= 0 or h <= 0:
            continue
        if out and abs(out[-1][1] - y) <= v_tol:
            r = out[-1]
            x1 = max(r[0] + r[2], x + w)
            y1 = max(r[1] + r[3], y + h)
            r[0] = min(r[0], x)
            r[1] = min(r[1], y)
            r[2] = x1 - r[0]
            r[3] = y1 - r[1]
        else:
            out.append([x, y, w, h])
    return [tuple(r) for r in out]


def nearest_char(boxes: np.ndarray, lo: int, hi: int, left: float, top: float) -> int:
    """Index (within [lo, hi)) of the printable char closest to (left, top)."""
    seg = np.asarray(boxes[lo:hi], dtype=np.float64)
    printable = (seg[:, 2] > 0) & (seg[:, 3] > 0)
    d = np.where(
        printable,
        (seg[:, 0] - left) ** 2 + (seg[:, 1] - top) ** 2,
        np.inf,
    )
    return lo + int(np.argmin(d))


def anchor_toc_sections(
    toc: list[dict],
    page_bounds: list[tuple[int, int]],
    boxes: np.ndarray,
    text_len: int,
) -> list[dict]:
    """TOC entries {title, level, left, top, page} -> sections anchored at the
    char nearest to the entry's coordinates within its page's char range."""
    secs = []
    for e in toc:
        lo, hi = page_bounds[e["page"]]
        if hi <= lo:
            continue
        start = nearest_char(boxes, lo, hi, e["left"], e["top"])
        secs.append({
            "start": int(start),
            "end": text_len,
            "title": e["title"],
            "level": int(e["level"]),
        })
    secs.sort(key=lambda s: s["start"])
    for i, s in enumerate(secs):
        for j in range(i + 1, len(secs)):
            if secs[j]["level"] <= s["level"]:
                s["end"] = secs[j]["start"]
                break
    return secs
