"""Minimal MessagePack packer (spec subset) — vendored fallback so the
msgpack sink (SURVEY.md S9/C9; reference ``tasks.py:458-541``) is a real,
CI-exercised code path even though the ``msgpack`` wheel is not installed in
this container.

Implements the encoder for the types the structure DTOs actually contain:
None, bool, int, float (float32 when ``use_single_float``, mirroring the
reference's ``use_single_float=True``), str, bytes, list/tuple, dict — wire
format per the public MessagePack spec (https://msgpack.org). Output is
byte-identical to ``msgpack.packb`` for this subset (golden-tested).
"""

from __future__ import annotations

import struct
from collections.abc import Mapping, Sequence


def packb(obj: object, use_single_float: bool = False) -> bytes:
    out = bytearray()
    _pack(obj, out, use_single_float)
    return bytes(out)


def _pack(obj: object, out: bytearray, single: bool) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int) and not isinstance(obj, bool):
        _pack_int(int(obj), out)
    elif isinstance(obj, float):
        if single:
            out.append(0xCA)
            out += struct.pack(">f", obj)
        else:
            out.append(0xCB)
            out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 0x1F:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += bytes(obj)
    elif isinstance(obj, Mapping):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out, single)
            _pack(v, out, single)
    elif isinstance(obj, Sequence):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in obj:
            _pack(v, out, single)
    else:
        # numpy arrays and scalars (Arrow->pandas structs surface both):
        # tolist() converts either to plain Python recursively
        tolist = getattr(obj, "tolist", None)
        if tolist is not None:
            _pack(tolist(), out, single)
            return
        raise TypeError(f"minipack cannot serialize {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if v >= 0:
        if v <= 0x7F:
            out.append(v)
        elif v <= 0xFF:
            out += struct.pack(">BB", 0xCC, v)
        elif v <= 0xFFFF:
            out += struct.pack(">BH", 0xCD, v)
        elif v <= 0xFFFFFFFF:
            out += struct.pack(">BI", 0xCE, v)
        else:
            out += struct.pack(">BQ", 0xCF, v)
    else:
        if v >= -0x20:
            out.append(0x100 + v)
        elif v >= -0x80:
            out += struct.pack(">Bb", 0xD0, v)
        elif v >= -0x8000:
            out += struct.pack(">Bh", 0xD1, v)
        elif v >= -0x80000000:
            out += struct.pack(">Bi", 0xD2, v)
        else:
            out += struct.pack(">Bq", 0xD3, v)
