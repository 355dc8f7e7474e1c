"""Char-coordinate map invariants (reference: len(text)==len(charBBoxes),
zero boxes for separators — PDFToTextWithCoordinates.java:219-225,
dto.py:168-173)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_system_spark.core import charboxes, oracle


def test_simple_page_layout():
    boxes = charboxes.char_boxes_page("ab\ncd\n\f")
    assert boxes.shape == (7, 4)
    assert boxes[0].tolist() == [0.0, 0.0, 8.0, 16.0]     # 'a' line 0 col 0
    assert boxes[1].tolist() == [8.0, 0.0, 8.0, 16.0]     # 'b' line 0 col 1
    assert boxes[2].tolist() == [0.0, 0.0, 0.0, 0.0]      # '\n' zero box
    assert boxes[3].tolist() == [0.0, 16.0, 8.0, 16.0]    # 'c' line 1 col 0
    assert boxes[6].tolist() == [0.0, 0.0, 0.0, 0.0]      # '\f' zero box


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab cd. ", min_size=0, max_size=300))
def test_parallel_array_invariant(text):
    """len(plain_text) == len(char_bboxes), separators zero, printables not."""
    ex = oracle.extract("cb", text)
    bounds = [(p["start"], p["end"]) for p in ex.pages]
    boxes = charboxes.char_boxes(ex.plain_text, bounds)
    assert len(boxes) == len(ex.plain_text)
    for i, ch in enumerate(ex.plain_text):
        if ch in "\n\f":
            assert boxes[i].tolist() == [0.0, 0.0, 0.0, 0.0]
        else:
            assert boxes[i][2] == 8.0 and boxes[i][3] == 16.0


def test_line_numbering_resets_per_page():
    text = "aaaa " * 40  # several pages
    ex = oracle.extract("cb2", text)
    assert len(ex.pages) >= 2
    bounds = [(p["start"], p["end"]) for p in ex.pages]
    boxes = charboxes.char_boxes(ex.plain_text, bounds)
    for s, _e in bounds:
        # first printable char of every page is at the grid origin
        assert boxes[s].tolist() == [0.0, 0.0, 8.0, 16.0]


def test_box_stats_match_bruteforce():
    ex = oracle.extract("cb3", "the quick brown fox. " * 10)
    bounds = [(p["start"], p["end"]) for p in ex.pages]
    boxes = charboxes.char_boxes(ex.plain_text, bounds)
    st_ = charboxes.box_stats(boxes)
    assert st_["n_boxes"] == len(ex.plain_text)
    assert st_["n_zero"] == sum(1 for c in ex.plain_text if c in "\n\f")
    assert st_["sum_x"] == int(boxes[:, 0].sum())


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="ab cd. ", min_size=0, max_size=200), max_size=6))
def test_batch_boxes_match_per_doc(texts):
    """BatchBoxes == per-doc char_boxes row-for-row, and its printable runs
    == textseg.paragraph_spans per doc (the batched coords kernels rest on
    both equalities)."""
    from text_extraction_system_spark.core import textseg

    exs = [oracle.extract(f"d{i}", t) for i, t in enumerate(texts)]
    docs_text = [e.plain_text for e in exs]
    bounds = [[(p["start"], p["end"]) for p in e.pages] for e in exs]
    bb = charboxes.BatchBoxes(docs_text, bounds)
    per_doc = [charboxes.char_boxes(t, b) for t, b in zip(docs_text, bounds)]
    stacked = (np.concatenate(per_doc) if per_doc
               else np.zeros((0, 4), np.float32))
    assert bb.boxes.shape == stacked.shape
    assert np.array_equal(bb.boxes, stacked)

    starts, ends, docs = bb.runs(bb.printable)
    got: dict[int, list] = {}
    for s, e, d in zip(starts, ends, docs):
        off = bb.doc_off[d]
        got.setdefault(int(d), []).append((int(s - off), int(e - off)))
    for i, t in enumerate(docs_text):
        assert got.get(i, []) == textseg.paragraph_spans(t)


def test_batch_boxes_rejects_untiled_pages():
    import pytest

    with pytest.raises(ValueError, match="page bounds"):
        charboxes.BatchBoxes(["abcdef"], [[(0, 3)]])


def test_batch_doc_sums_exact_at_scale():
    """int64 cumsum keeps sums exact where float32 accumulation would not
    (one long doc pushes the cumulative x past 2^24)."""
    text = ("x" * 3000 + "\n") * 800  # 2.4M printable chars, one page
    bounds = [[(0, len(text))]]
    bb = charboxes.BatchBoxes([text], bounds)
    got = int(bb.doc_sums(bb.boxes[:, 0])[0])
    # per line: sum of 8*col for col in range(3000)
    assert got == 800 * (8 * 3000 * 2999 // 2)
