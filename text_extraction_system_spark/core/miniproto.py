"""Minimal proto2 wire-format encoder for the reference's output contract —
vendored (like ``core/minipack``) so the protobuf sink (SURVEY.md S9 third
leg; reference ``tasks.py:464-508``) is a real, CI-exercised code path even
though no protobuf wheel is installed in this container.

Message shapes mirror the reference's
``text_extraction_system_api/proto_files/contract_pages.proto`` and
``contract_char_bboxes.proto`` exactly:

    Pages    { StringValue title=1; StringValue language=2;
               repeated Page pages=3; repeated Sentence sentences=4;
               repeated Paragraph paragraphs=5; repeated Section sections=6;
               repeated TableOfContent table_of_contents=7; }
    Page     { int32 number=1; int32 start=2; int32 end=3;
               float rotation=4; repeated float bbox=5 [packed]; }
    Sentence/Paragraph { int32 start=1; int32 end=2; StringValue language=3; }
    Section  { int32 start=1; int32 end=2; StringValue title=3;
               int32 title_start=4; int32 title_end=5; int32 level=6;
               int32 abs_level=7; float left=8; float top=9; int32 page=10; }
    TableOfContent { StringValue title=1; int32 level=2; int32 left=3;
               int32 top=4; int32 page=5; }
    Coordinates { repeated float coords=1 [packed]; }
    CharBboxes { repeated Coordinates char_bboxes=1; bool __initialised__=2; }

(CharBboxes is the pdf-coordinates leg: the reference wraps each char's
[x, y, w, h] row in a Coordinates submessage before serializing —
``tasks.py:500-502`` — fed here from ``coords.with_char_boxes``.)

Encoding follows the public protobuf wire spec (varints, little-endian
32-bit floats, length-delimited submessages, packed repeated floats), fields
emitted in field-number order — the deterministic layout protoc's C++/Python
encoders produce for these shapes. Golden-tested byte-for-byte against
hand-assembled wire bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Mapping, Sequence

_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5


def _varint(value: int, out: bytearray) -> None:
    if value < 0:
        # proto2 int32: negatives widen to 10-byte two's-complement varints
        value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _tag(field: int, wire: int, out: bytearray) -> None:
    _varint((field << 3) | wire, out)


def _int32(field: int, value: int, out: bytearray) -> None:
    _tag(field, _VARINT, out)
    _varint(int(value), out)


def _float(field: int, value: float, out: bytearray) -> None:
    _tag(field, _I32, out)
    out += struct.pack("<f", value)


def _bytes(field: int, payload: bytes, out: bytearray) -> None:
    _tag(field, _LEN, out)
    _varint(len(payload), out)
    out += payload


def _string_value(field: int, value: str | None, out: bytearray) -> None:
    """google.protobuf.StringValue submessage (field 1 = the string).
    None omits the field entirely (proto2 optional)."""
    if value is None:
        return
    inner = bytearray()
    _bytes(1, value.encode("utf-8"), inner)
    _bytes(field, bytes(inner), out)


def _packed_floats(field: int, values: Sequence[float] | None, out: bytearray) -> None:
    # len() guard, not truthiness: Arrow hands bbox cells over as numpy
    # arrays, whose bool() raises
    if values is None or len(values) == 0:
        return
    _bytes(field, struct.pack(f"<{len(values)}f", *[float(v) for v in values]), out)


def encode_page(page: Mapping) -> bytes:
    out = bytearray()
    _int32(1, page.get("number", 0), out)
    _int32(2, page.get("start", 0), out)
    _int32(3, page.get("end", 0), out)
    if page.get("rotation") is not None:
        _float(4, float(page["rotation"]), out)
    _packed_floats(5, page.get("bbox"), out)
    return bytes(out)


def encode_text_span(span: Mapping) -> bytes:
    """Sentence / Paragraph: start=1, end=2, language=3 (StringValue)."""
    out = bytearray()
    if span.get("start") is not None:
        _int32(1, span["start"], out)
    if span.get("end") is not None:
        _int32(2, span["end"], out)
    _string_value(3, span.get("language"), out)
    return bytes(out)


def encode_section(sec: Mapping) -> bytes:
    out = bytearray()
    if sec.get("start") is not None:
        _int32(1, sec["start"], out)
    if sec.get("end") is not None:
        _int32(2, sec["end"], out)
    _string_value(3, sec.get("title"), out)
    for field, key in ((4, "title_start"), (5, "title_end"),
                       (6, "level"), (7, "abs_level")):
        if sec.get(key) is not None:
            _int32(field, sec[key], out)
    for field, key in ((8, "left"), (9, "top")):
        if sec.get(key) is not None:
            _float(field, float(sec[key]), out)
    if sec.get("page") is not None:
        _int32(10, sec["page"], out)
    return bytes(out)


def encode_toc_item(item: Mapping) -> bytes:
    """TableOfContent: title=1 (StringValue), level=2, left=3, top=4,
    page=5 — left/top are int32 here (unlike Section's floats), per the
    reference schema."""
    out = bytearray()
    _string_value(1, item.get("title"), out)
    for field, key in ((2, "level"), (3, "left"), (4, "top"), (5, "page")):
        if item.get(key) is not None:
            _int32(field, item[key], out)
    return bytes(out)


def encode_pages(structure: Mapping, pages: Sequence[Mapping] = ()) -> bytes:
    """The reference's ``Pages`` top-level message from the engine's
    structure DTO (+ optional page table)."""
    def seq(value) -> Sequence:
        # Arrow hands repeated fields over as numpy arrays (bool() raises)
        return () if value is None else value

    out = bytearray()
    _string_value(1, structure.get("title"), out)
    _string_value(2, structure.get("language"), out)
    for p in seq(pages):
        _bytes(3, encode_page(p), out)
    for s in seq(structure.get("sentences")):
        _bytes(4, encode_text_span(s), out)
    for p in seq(structure.get("paragraphs")):
        _bytes(5, encode_text_span(p), out)
    for s in seq(structure.get("sections")):
        _bytes(6, encode_section(s), out)
    for t in seq(structure.get("table_of_contents")):
        _bytes(7, encode_toc_item(t), out)
    return bytes(out)


def encode_char_bboxes(boxes: Sequence[Sequence[float]] | None,
                       initialised: bool | None = None) -> bytes:
    """``contract_char_bboxes.proto`` CharBboxes: one Coordinates submessage
    (packed floats, field 1) per char box, plus the reference DTO's
    ``__initialised__`` flag (field 2) when present — the exact wrapping the
    reference performs at ``tasks.py:500-502``."""
    out = bytearray()
    if boxes is not None:
        for row in boxes:
            inner = bytearray()
            _packed_floats(1, row, inner)
            _bytes(1, bytes(inner), out)
    if initialised is not None:
        _tag(2, _VARINT, out)
        _varint(1 if initialised else 0, out)
    return bytes(out)
