"""Char-coordinate map (the reference's central IR — SURVEY.md section 1.1).

The reference emits one [x, y, w, h] per character of the plain text, a
parallel array with zero boxes for separator characters
(``PDFToTextWithCoordinates.java:219-225`` addNonPrintableCharBoxes;
``dto.py:168-173`` PDFCoordinates.char_bboxes). The invariant
``len(text) == len(char_bboxes)`` underpins every downstream offset
computation (SURVEY.md section 7.4 "hard parts").

Spans input carries no glyph geometry, so the rebuild lays text out on a
deterministic monospace grid per page: printable char at (line, col) gets
box [CHAR_W*col, CHAR_H*line, CHAR_W, CHAR_H]; '\\n' advances the line,
'\\f' ends the page; both get [0,0,0,0]. Lines/pages reset exactly as the
plain-text assembly defines them, so boxes, pages, and offsets all agree.
"""

from __future__ import annotations

import numpy as np

CHAR_W = 8.0
CHAR_H = 16.0


def char_boxes_page(page_text: str) -> np.ndarray:
    """(len(page_text), 4) float32 boxes for one page's text.

    Vectorized (UTF-32 codepoint array + cumulative sums): the previous
    per-character python loop dominated the coordinate queries — ~2 chars of
    python-loop work per corpus char across the coordinate operators."""
    n = len(page_text)
    out = np.zeros((n, 4), dtype=np.float32)
    if n == 0:
        return out
    codes = np.frombuffer(page_text.encode("utf-32-le"), dtype=np.uint32)
    nl = codes == 10   # '\n' advances the line and resets the column
    ff = codes == 12   # '\f' page end: zero box, no column advance
    printable = ~(nl | ff)
    line = np.cumsum(nl) - nl  # line of each char (exclusive of itself)
    c = np.cumsum(printable)
    col_excl = c - printable   # printable chars in [0, i)
    nl_pos = np.flatnonzero(nl)
    line_base = np.concatenate(([0], c[nl_pos]))  # printable count at line start
    col = col_excl - line_base[line]
    out[printable, 0] = CHAR_W * col[printable]
    out[printable, 1] = CHAR_H * line[printable]
    out[printable, 2] = CHAR_W
    out[printable, 3] = CHAR_H
    return out


def char_boxes(plain_text: str, page_bounds: list[tuple[int, int]]) -> np.ndarray:
    """Boxes for the whole doc, page-by-page (line numbering resets)."""
    if not plain_text:
        return np.zeros((0, 4), dtype=np.float32)
    parts = [char_boxes_page(plain_text[s:e]) for s, e in page_bounds]
    return np.concatenate(parts) if parts else np.zeros((0, 4), dtype=np.float32)


def box_stats(boxes: np.ndarray) -> dict:
    """Aggregates used by the oracle-checked query: counts + coordinate sums
    (exact integers — CHAR_W/CHAR_H are integral)."""
    zero = (boxes[:, 2] == 0) & (boxes[:, 3] == 0) if len(boxes) else np.array([], bool)
    return {
        "n_boxes": int(len(boxes)),
        "n_zero": int(zero.sum()),
        "sum_x": int(boxes[:, 0].sum()),
        "sum_y": int(boxes[:, 1].sum()),
    }
