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
    """(len(page_text), 4) float32 boxes for one page's text."""
    out = np.zeros((len(page_text), 4), dtype=np.float32)
    line = 0
    col = 0
    for i, ch in enumerate(page_text):
        if ch == "\n":
            line += 1
            col = 0
        elif ch == "\f":
            pass  # zero box, page end
        else:
            out[i] = (CHAR_W * col, CHAR_H * line, CHAR_W, CHAR_H)
            col += 1
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
