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

#: token -> languages whose stopword list contains it (built once; the UDF
#: calls this per sentence/paragraph/doc, so per-token work must be one
#: dict lookup, not len(LANGS) set membership tests)
_TOKEN_LANGS: dict[str, tuple[str, ...]] = {}
for _lang in spec.LANG_PRIORITY:
    for _w in spec.LANG_STOPWORDS[_lang]:
        _TOKEN_LANGS[_w] = _TOKEN_LANGS.get(_w, ()) + (_lang,)


_CJK_RE = re.compile(spec.CJK_REGEX)


def detect_language(text: str) -> str:
    if _CJK_RE.search(text):
        return "zh"
    # str.split() == squash-\s+-then-split-and-drop-empties, at C speed
    hits = dict.fromkeys(spec.LANG_PRIORITY, 0)
    for t in text.lower().split():
        langs = _TOKEN_LANGS.get(t)
        if langs:
            for lang in langs:
                hits[lang] += 1
    best_lang = spec.DEFAULT_LANG
    best_hits = 0
    for lang in spec.LANG_PRIORITY:
        if hits[lang] > best_hits:
            best_hits = hits[lang]
            best_lang = lang
    return best_lang
