"""Char-coordinate operators: box construction + coordinate<->text queries.

``with_char_boxes`` produces the reference's PDFCoordinates analog as an
``array<array<float>>`` column via Arrow batches (``dto.py:168-173``); the
``char_coord_stats`` rows feed the oracle-checked query (the full box array
is validated by pytest invariants, the aggregates by DuckDB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core import charboxes

CHAR_STATS_SCHEMA = (
    "doc_id string, n_chars long, n_boxes long, n_zero long, sum_x long, sum_y long"
)


def _bounds(pages: list) -> list[tuple[int, int]]:
    return [(p["start"], p["end"]) for p in pages]


def char_coord_stats(assembled: DataFrame) -> DataFrame:
    """Per-doc char-box aggregates (len(text)==len(boxes) is part of the
    emitted data: n_chars vs n_boxes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "n_chars", "n_boxes", "n_zero", "sum_x", "sum_y"]
        for pdf in batches:
            rows = []
            for doc_id, text, pages in zip(pdf["doc_id"], pdf["plain_text"], pdf["pages"]):
                t = text or ""
                boxes = charboxes.char_boxes(t, _bounds(pages))
                st = charboxes.box_stats(boxes)
                rows.append((doc_id, len(t), st["n_boxes"], st["n_zero"],
                             st["sum_x"], st["sum_y"]))
            yield pd.DataFrame(rows, columns=cols)

    return assembled.select("doc_id", "plain_text", "pages").mapInPandas(
        gen, schema=CHAR_STATS_SCHEMA
    )


#: J5 selection area: everything on page-local lines 1 and 2, any column
#: (y in [CHAR_H, 3*CHAR_H), x unbounded)
SELECTION_AREA = (0.0, charboxes.CHAR_H, 1e9, 2 * charboxes.CHAR_H)

TEXT_COORDS_SCHEMA = (
    "doc_id string, par_start long, par_end long, x long, y long, w long, h long"
)
COORDS_TEXT_SCHEMA = "doc_id string, sel_start long, sel_end long, sel_text string"


def text_to_coords(assembled: DataFrame) -> DataFrame:
    """J6 text->coords: every paragraph's char span -> merged per-line
    rectangles via geometry.line_areas over the char-box map (reference
    ``text_coord_map.py:41-150``). On the monospace layout each paragraph is
    one line, so exactly one rect per paragraph — which is what makes the
    query SQL-oracle-checkable (CHAR_W/CHAR_H are integral -> exact bigints)."""
    from ..core import geometry, textseg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "par_start", "par_end", "x", "y", "w", "h"]
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, text, pages in zip(pdf["doc_id"], pdf["plain_text"], pdf["pages"]):
                t = text or ""
                boxes = charboxes.char_boxes(t, _bounds(pages))
                for s, e in textseg.paragraph_spans(t):
                    for (x, y, w, h) in geometry.line_areas(boxes, s, e):
                        out["doc_id"].append(doc_id)
                        out["par_start"].append(s)
                        out["par_end"].append(e)
                        out["x"].append(int(x))
                        out["y"].append(int(y))
                        out["w"].append(int(w))
                        out["h"].append(int(h))
            yield pd.DataFrame(out, columns=cols)

    return assembled.select("doc_id", "plain_text", "pages").mapInPandas(
        gen, schema=TEXT_COORDS_SCHEMA
    )


def coords_to_text(assembled: DataFrame) -> DataFrame:
    """J5 coords->text: the longest run of consecutive chars overlapping the
    SELECTION_AREA (>= 20% of each char's own box) and its text — reference
    ``coord_text_map.py:96-128`` find_longest_location. Separator chars have
    zero boxes, so runs never cross lines; the area covers page-local lines
    1-2 of every page, and the winner is the longest such line (earliest on
    ties, matching argmax-first semantics)."""
    from ..core import geometry

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "sel_start", "sel_end", "sel_text"]
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, text, pages in zip(pdf["doc_id"], pdf["plain_text"], pdf["pages"]):
                t = text or ""
                boxes = charboxes.char_boxes(t, _bounds(pages))
                loc = geometry.find_longest_location(boxes, SELECTION_AREA)
                if loc is not None:
                    s, e = loc
                    out["doc_id"].append(doc_id)
                    out["sel_start"].append(s)
                    out["sel_end"].append(e)
                    out["sel_text"].append(t[s:e])
            yield pd.DataFrame(out, columns=cols)

    return assembled.select("doc_id", "plain_text", "pages").mapInPandas(
        gen, schema=COORDS_TEXT_SCHEMA
    )


def with_char_boxes(assembled: DataFrame) -> DataFrame:
    """Append the full char-bbox array column (float32 rows of [x,y,w,h])."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["char_bboxes"] = [
                charboxes.char_boxes(t or "", _bounds(p)).tolist()
                for t, p in zip(pdf["plain_text"], pdf["pages"])
            ]
            yield pdf[["doc_id", "char_bboxes"]]

    boxed = assembled.select("doc_id", "plain_text", "pages").mapInPandas(
        gen, schema="doc_id string, char_bboxes array<array<float>>"
    )
    return assembled.join(boxed, "doc_id")
