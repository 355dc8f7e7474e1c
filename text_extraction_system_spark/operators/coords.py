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
