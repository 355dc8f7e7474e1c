"""Deterministic language identification by stopword hits.

Reference analog: fastText ``lid.176.bin`` applied per sentence / paragraph /
document (``data_extract/lang.py:13-37``, applied ``data_extract.py:151-190``)
with whitespace squashed first (``lang.py:10,23``). The rebuild replaces the
model with a closed-vocabulary scorer so results are reproducible in SQL:
count stopword hits per language over lowercase whitespace tokens; the
language with the most hits wins; ties (and zero hits) resolve by
``spec.LANG_PRIORITY`` order.
"""

from __future__ import annotations

import re

from . import spec

_WS = re.compile(r"\s+")


def detect_language(text: str) -> str:
    tokens = _WS.sub(" ", text.strip().lower()).split(" ") if text.strip() else []
    best_lang = spec.DEFAULT_LANG
    best_hits = 0
    for lang in spec.LANG_PRIORITY:
        sw = set(spec.LANG_STOPWORDS[lang])
        hits = sum(1 for t in tokens if t in sw)
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    return best_lang
