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

import bisect
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


_TOKEN_RE = re.compile(r"\S+")


class LangIndex:
    """Tokenize-once language scorer for many subspans of one document.

    ``LangIndex(text).lang(s, e) == detect_language(text[s:e])`` for every
    span whose boundaries do not cut a ``\\S+`` token — which paragraph and
    sentence spans never do (paragraphs split on the ``\\n``/``\\f``
    separators, sentences immediately after ``'. '``). The structure UDF
    scores the doc + every paragraph + every sentence, so scoring from one
    token-offset index replaces ~3 full tokenizations plus a slice+lower
    allocation per segment.

    Falls back to per-slice detection when ``lower()`` changes the string
    length (rare Unicode case folds would misalign offsets).
    """

    __slots__ = ("text", "_fallback", "_starts", "_ends", "_langs", "_cjk")

    def __init__(self, text: str) -> None:
        self.text = text
        lowered = text.lower()
        self._fallback = len(lowered) != len(text)
        if self._fallback:
            return
        self._cjk = [m.start() for m in _CJK_RE.finditer(text)]
        starts: list[int] = []
        ends: list[int] = []
        langs: list[tuple[str, ...]] = []
        for m in _TOKEN_RE.finditer(lowered):
            ls = _TOKEN_LANGS.get(m.group())
            if ls:
                starts.append(m.start())
                ends.append(m.end())
                langs.append(ls)
        self._starts, self._ends, self._langs = starts, ends, langs

    def lang(self, start: int = 0, end: int | None = None) -> str:
        if end is None:
            end = len(self.text)
        if self._fallback:
            return detect_language(self.text[start:end])
        i = bisect.bisect_left(self._cjk, start)
        if i < len(self._cjk) and self._cjk[i] < end:
            return "zh"
        hits = dict.fromkeys(spec.LANG_PRIORITY, 0)
        i = bisect.bisect_left(self._starts, start)
        n = len(self._starts)
        while i < n and self._starts[i] < end:
            if self._ends[i] <= end:
                for lg in self._langs[i]:
                    hits[lg] += 1
            i += 1
        best_lang = spec.DEFAULT_LANG
        best_hits = 0
        for lg in spec.LANG_PRIORITY:
            if hits[lg] > best_hits:
                best_hits = hits[lg]
                best_lang = lg
        return best_lang
