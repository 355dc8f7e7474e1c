"""Coord<->text mapping goldens (reference analogs: pdf_coords_common /
coord_text_map / text_coord_map tests; TOC anchoring golden numbers from
test_data_extract.py:73-108)."""

from __future__ import annotations

import numpy as np

from text_extraction_system_spark.core import geometry as G


def test_page_of_char():
    starts = np.array([0, 100, 250])
    assert G.page_of_char(starts, 0) == 0
    assert G.page_of_char(starts, 99) == 0
    assert G.page_of_char(starts, 100) == 1
    assert G.page_of_char(starts, 300) == 2


def test_overlap_math():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 10, 10], [5, 5, 10, 10]], float)
    areas = G.overlap_area(boxes, (0, 0, 10, 10))
    assert list(areas) == [100.0, 0.0, 25.0]
    assert list(G.overlaps_enough(boxes, (0, 0, 10, 10))) == [True, False, True]


def test_find_longest_location():
    boxes = np.array(
        [[0, 0, 10, 10]] * 3 + [[500, 500, 10, 10]] * 2 + [[0, 0, 10, 10]] * 5,
        dtype=float,
    )
    assert G.find_longest_location(boxes, (0, 0, 30, 30)) == (5, 10)
    assert G.find_longest_location(boxes, (900, 900, 5, 5)) is None


def test_line_areas_merge_and_separators():
    boxes = np.array(
        [
            [0, 0, 10, 12], [10, 0, 10, 12], [0, 0, 0, 0],  # separator box
            [20, 0, 10, 12],                                  # same line
            [0, 20, 10, 12], [10, 20, 10, 12],                # next line
        ],
        dtype=float,
    )
    rects = G.line_areas(boxes, 0, len(boxes))
    assert rects == [(0.0, 0.0, 30.0, 12.0), (0.0, 20.0, 20.0, 12.0)]


def test_toc_anchoring_reference_golden():
    """Exact scenario and goldens of the reference TOC->sections test."""
    toc = [
        {"title": "Heading 1", "level": 1, "left": 250, "top": 580, "page": 0},
        {"title": "Heading 2", "level": 1, "left": 255, "top": 570, "page": 1},
        {"title": "Heading 1.1", "level": 2, "left": 230, "top": 280, "page": 0},
        {"title": "Heading 3", "level": 1, "left": 251, "top": 580, "page": 2},
    ]
    boxes = np.array(
        [
            [250, 580, 20, 40], [270, 580, 20, 40], [60, 540, 20, 40], [80, 540, 20, 40],
            [252, 578, 20, 40], [274, 578, 20, 40], [60, 540, 20, 40], [80, 536, 20, 40],
            [250, 580, 20, 40], [270, 580, 20, 40], [60, 540, 20, 40],
        ],
        dtype=float,
    )
    page_bounds = [(0, 4), (4, 8), (8, 11)]
    secs = G.anchor_toc_sections(toc, page_bounds, boxes, text_len=11)
    assert len(secs) == 4
    assert secs[1]["title"] == "Heading 1.1"
    assert secs[2]["title"] == "Heading 2"
    assert secs[0]["start"] == 0
    assert secs[1]["start"] == 3
    assert secs[2]["start"] == 4
    # end assignment: H1 (level 1) is closed by H2 (level 1) at start 4 —
    # the level-2 H1.1 in between does NOT close it
    assert secs[0]["end"] == 4
    assert secs[1]["end"] == 4     # H1.1 closed by H2 (level <= 2)
    assert secs[3]["end"] == 11    # last section runs to EOF


def test_toc_end_assignment_rule():
    """Explicit end-rule check: level-2 section does not close a level-1."""
    toc = [
        {"title": "A", "level": 1, "left": 0, "top": 0, "page": 0},
        {"title": "A.1", "level": 2, "left": 0, "top": 50, "page": 0},
        {"title": "B", "level": 1, "left": 0, "top": 100, "page": 0},
    ]
    boxes = np.array([[0, 0, 5, 5], [0, 50, 5, 5], [0, 100, 5, 5]], float)
    secs = G.anchor_toc_sections(toc, [(0, 3)], boxes, text_len=3)
    a, a1, b = secs
    assert (a["start"], a1["start"], b["start"]) == (0, 1, 2)
    assert a["end"] == 2       # closed by B (level 1), not by A.1
    assert a1["end"] == 2      # closed by B (level <= 2)
    assert b["end"] == 3       # runs to EOF


def test_toc_preferred_over_heading_heuristic():
    """Reference choose-TOC branch (data_extract.py:165-181): a doc with both
    a TOC and heading-shaped paragraphs uses the TOC anchors; without a TOC,
    the heading heuristic decides."""
    from text_extraction_system_spark.operators import toc as toc_op

    text = "1. INTRO\nbody body\n\f2. METHODS\nmore body\n\f"
    pages = [
        {"number": 0, "start": 0, "end": 20},
        {"number": 1, "start": 20, "end": len(text)},
    ]
    entries = toc_op.synth_toc(pages)
    with_toc = toc_op.sections_for_doc(text, pages, entries)
    assert [s["source"] for s in with_toc] == ["toc", "toc"]
    assert [s["title"] for s in with_toc] == ["SECTION 0", "SECTION 1"]
    assert [s["start"] for s in with_toc] == [0, 20]
    assert with_toc[0]["end"] == 20 and with_toc[1]["end"] == len(text)

    fallback = toc_op.sections_for_doc(text, pages, [])
    assert [s["source"] for s in fallback] == ["heading", "heading"]
    assert [s["title"] for s in fallback] == ["INTRO", "METHODS"]
