"""Text segmentation primitives: sentences, paragraphs, title, sections.

Reference analogs (re-derived deterministically, behavior pinned by our own
fixtures — SURVEY.md section 7.4):

* sentence spans   — lexnlp ``get_sentence_span_list`` (``data_extract.py:149-156``)
* paragraph spans  — lexnlp ``get_paragraph_spans`` (``data_extract.py:160-163``);
  paragraphs are '\\n'-delimited by the layout writer
  (``PDFToTextWithCoordinates.java:581``)
* title            — first of lexnlp ``get_titles`` (``data_extract.py:183-186``)
* sections         — heading heuristic replacing
  ``get_document_sections_with_titles`` (``data_extract.py:169-181``)
* section end assignment — sort by start; a section ends at the next section
  of same-or-higher level (``data_extract.py:245-257``)

All functions work on char offsets into the assembled plain text and return
``(start, end)`` half-open spans, matching the reference DTO conventions
(``dto.py:117-141``).
"""

from __future__ import annotations

import re

from . import spec

_SENT_RE = re.compile(spec.SENTENCE_BOUNDARY_REGEX)
#: maximal runs not containing '\n' or '\f' — C-speed scan; a per-character
#: python loop here costs ~10s per 100M chars and dominates the UDF stage
_PARA_RE = re.compile(r"[^\n\f]+")
#: a heading is a paragraph like "3. TITLE WORDS" or "2.1 Subtitle" —
#: numbering depth gives the level
_HEADING_RE = re.compile(r"^(\d+(?:\.\d+)*)\.?\s+(\S.*)$")


def paragraph_spans(text: str) -> list[tuple[int, int]]:
    """Half-open char spans of paragraphs: maximal runs not containing
    '\\n' or '\\f'. Separator chars belong to no paragraph."""
    return [m.span() for m in _PARA_RE.finditer(text)]


def sentence_spans_in(text: str, start: int, end: int) -> list[tuple[int, int]]:
    """Sentence spans inside one paragraph span of ``text``."""
    seg = text[start:end]
    bounds = [m.end() for m in _SENT_RE.finditer(seg)]
    starts = [0] + bounds
    ends = bounds + [len(seg)]
    return [(start + s, start + e) for s, e in zip(starts, ends) if e > s]


def sentence_spans(text: str) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for ps, pe in paragraph_spans(text):
        out.extend(sentence_spans_in(text, ps, pe))
    return out


def detect_title(text: str) -> str:
    """First paragraph if it is short (<= 80 chars) and not a heading number,
    else ''. Mirrors 'first title candidate' semantics of get_titles."""
    paras = paragraph_spans(text)
    if not paras:
        return ""
    s, e = paras[0]
    cand = text[s:e]
    if 0 < len(cand) <= 80:
        return cand
    return ""


def detect_sections(text: str) -> list[dict]:
    """Heading-heuristic sections over the assembled plain text.

    A paragraph matching ``_HEADING_RE`` opens a section whose level is the
    numbering depth ('2.1' -> level 2). Section body starts at the heading
    start; it ends at the next heading with level <= its own, else at
    len(text) (reference end-assignment: data_extract.py:245-257).
    """
    heads: list[dict] = []
    for ps, pe in paragraph_spans(text):
        m = _HEADING_RE.match(text[ps:pe])
        if not m:
            continue
        level = m.group(1).count(".") + 1
        heads.append({
            "start": ps,
            "end": len(text),
            "title": m.group(2),
            "title_start": ps + m.start(2),
            "title_end": ps + m.end(2),
            "level": level,
            "abs_level": level,
        })
    heads.sort(key=lambda h: h["start"])
    for i, h in enumerate(heads):
        for j in range(i + 1, len(heads)):
            if heads[j]["level"] <= h["level"]:
                h["end"] = heads[j]["start"]
                break
    return heads
