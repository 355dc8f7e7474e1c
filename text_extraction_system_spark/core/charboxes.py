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


class BatchBoxes:
    """Char boxes for a whole Arrow batch of documents in ONE numpy pass.

    Concatenates every doc's plain text, then computes the same per-page
    monospace layout as ``char_boxes_page`` with page resets expressed as
    forward-filled bases (``np.maximum.accumulate`` over values seeded at
    page/line starts — valid because the underlying cumsums are
    nondecreasing). Replaces the python-per-document ``char_boxes`` calls
    that dominated the coordinate queries (~1 python frame per page per doc
    -> 3 numpy passes per BATCH).

    Attributes:
      boxes     (L, 4) float32 — concatenated char boxes, identical row-for-
                row to per-doc ``char_boxes`` output (pinned by pytest)
      doc_off   (n_docs + 1,) int64 — global char offset of each doc
      printable (L,) bool — chars with a nonzero box
    """

    def __init__(self, texts: list[str], bounds_list: list[list[tuple[int, int]]]):
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        self.doc_off = np.concatenate(([0], np.cumsum(lens)))
        n = int(self.doc_off[-1])
        self.boxes = np.zeros((n, 4), dtype=np.float32)
        self.printable = np.zeros(n, dtype=bool)
        if n == 0:
            return
        all_text = "".join(texts)
        codes = np.frombuffer(all_text.encode("utf-32-le"), dtype=np.uint32)
        nl = codes == 10
        ff = codes == 12
        printable = ~(nl | ff)
        self.printable = printable

        # global page-start indices (each doc's bounds shifted by its offset)
        page_starts: list[int] = []
        for off, bounds, tlen in zip(self.doc_off[:-1], bounds_list, lens):
            covered = 0
            for s, e in bounds:
                page_starts.append(int(off) + s)
                covered += e - s
            # the layout invariant every offset computation rests on: pages
            # tile the text exactly (len(text) == len(char_bboxes))
            if covered != tlen:
                raise ValueError(
                    f"page bounds cover {covered} chars of a {tlen}-char doc"
                )
        ps = np.asarray(page_starts, dtype=np.int64)
        ps = ps[ps < n]  # empty trailing pages have no chars to mark

        # line index, reset at page starts: gline - gline[its page start]
        gline = np.cumsum(nl) - nl
        seed = np.full(n, -1, dtype=np.int64)
        seed[ps] = gline[ps]
        line = gline - np.maximum.accumulate(seed)

        # column, reset at line starts (= page starts + chars after a '\n')
        c = np.cumsum(printable)
        col_excl = c - printable
        is_line_start = np.zeros(n, dtype=bool)
        is_line_start[ps] = True
        after_nl = np.flatnonzero(nl) + 1
        is_line_start[after_nl[after_nl < n]] = True
        seed2 = np.full(n, -1, dtype=np.int64)
        seed2[is_line_start] = col_excl[is_line_start]
        col = col_excl - np.maximum.accumulate(seed2)

        self.boxes[printable, 0] = CHAR_W * col[printable]
        self.boxes[printable, 1] = CHAR_H * line[printable]
        self.boxes[printable, 2] = CHAR_W
        self.boxes[printable, 3] = CHAR_H

    def runs(self, mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Maximal runs of ``mask`` (global [start, end) pairs + doc index),
        never crossing a document boundary."""
        n = len(mask)
        doc_starts = self.doc_off[:-1]
        doc_starts = doc_starts[doc_starts < n]
        prev = np.concatenate(([False], mask[:-1]))
        prev[doc_starts] = False
        starts = np.flatnonzero(mask & ~prev)
        nxt = np.concatenate((mask[1:], [False]))
        inner_starts = doc_starts[doc_starts > 0]
        nxt[inner_starts - 1] = False
        ends = np.flatnonzero(mask & ~nxt) + 1
        docs = np.searchsorted(self.doc_off, starts, side="right") - 1
        return starts, ends, docs

    def doc_sums(self, values: np.ndarray) -> np.ndarray:
        """Per-document sums of a per-char int array (exact int64 cumsum +
        difference at doc offsets — float32 accumulation over a whole batch
        would lose integer exactness past 2^24)."""
        cs = np.concatenate(([0], np.cumsum(values.astype(np.int64))))
        return cs[self.doc_off[1:]] - cs[self.doc_off[:-1]]


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
