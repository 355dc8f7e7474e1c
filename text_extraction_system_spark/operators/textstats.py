"""Text-analytics operators — token stats, quality scoring, language ID,
document fingerprinting, simhash. All pure Catalyst expressions (JVM-side,
whole-stage codegen); every one has a DuckDB-SQL twin in ``__spark_entry__``.

These are the training-data-pipeline operators layered on top of the
reference's extraction capabilities (task brief: dedup / quality / lang-ID /
token counting / fingerprinting as first-class components). Language ID
mirrors the reference's per-segment fastText usage (``data_extract/lang.py``)
via the deterministic stopword scorer of ``core.langid``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import spec

_HEX = "0123456789abcdef"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, lowercased, \\s+ squashed first (lang.py:10,23)."""
    squashed = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.filter(F.split(squashed, " "), lambda w: w != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("bigint")


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_col(text: Column) -> Column:
    """Subword-style token count (letter runs / digit runs / punct marks) —
    the cheap proxy for BPE token budgeting in training-data pipelines."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_REGEX), F.lit(0))).cast(
        "bigint"
    )


def _stopword_hits(tokens: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in spec.LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def detect_language_from_tokens(toks: Column, text: Column) -> Column:
    """Argmax of stopword hits with LANG_PRIORITY tie-break; all-zero -> 'en'.
    Matches ``core.langid.detect_language`` exactly. Takes the token array
    as a BOUND value so callers can share one tokenization across signals
    (the naive per-signal form re-evaluated tokens_col once per stopword
    table — 12x per row)."""
    h = {lang: _stopword_hits(toks, lang) for lang in spec.LANG_PRIORITY}
    return (
        F.when(F.regexp_count(text, F.lit(spec.CJK_REGEX)) > 0, "zh")
        .when((h["de"] > h["en"]) & (h["de"] >= h["es"]) & (h["de"] >= h["fr"]), "de")
        .when((h["es"] > h["en"]) & (h["es"] > h["de"]) & (h["es"] >= h["fr"]), "es")
        .when((h["fr"] > h["en"]) & (h["fr"] > h["de"]) & (h["fr"] > h["es"]), "fr")
        .otherwise("en")
    )


def detect_language_col(text: Column) -> Column:
    """One-shot form: tokens let-bound, detection applied once."""
    from .exprutil import let

    return let(tokens_col(text), lambda toks: detect_language_from_tokens(toks, text))


def quality_cols(text: Column) -> dict[str, Column]:
    """Quality-scoring signals: word count, mean word length, stopword ratio,
    punctuation ratio, and a composite keep-score in [0,1]."""
    return quality_cols_from_tokens(tokens_col(text), text)


def quality_cols_from_tokens(toks: Column, text: Column) -> dict[str, Column]:
    """``quality_cols`` with the token array passed as a bound value (see
    detect_language_from_tokens for why)."""
    n_words = F.size(toks)
    n_chars = F.length(text)
    all_sw = sorted({w for ws in spec.LANG_STOPWORDS.values() for w in ws})
    sw_arr = F.array(*[F.lit(w) for w in all_sw])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?'\"()\[\]]", ""))
    safe_words = F.greatest(n_words, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    # no rounding anywhere: both engines produce bit-identical IEEE doubles
    # from identical integer inputs; round() half-up vs binary boundaries
    # would otherwise disagree in the last decimal
    mean_word_len = (
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
        / safe_words
    )
    stopword_ratio = sw_hits / safe_words
    punct_ratio = n_punct / safe_chars
    score = F.when(n_words < spec.QUALITY_MIN_WORDS, 0.0).otherwise(
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.5
        + F.least(F.lit(1.0), stopword_ratio * 5) * 0.3
        + (1.0 - F.least(F.lit(1.0), punct_ratio * 10)) * 0.2
    )
    return {
        "n_words": n_words.cast("bigint"),
        "mean_word_len": mean_word_len,
        "stopword_ratio": stopword_ratio,
        "punct_ratio": punct_ratio,
        "quality_score": score,
    }


def token_hash_col(token: Column, hex_chars: int = spec.FP_HEX_CHARS) -> Column:
    """First ``hex_chars`` hex chars of md5(token) as an integer — same value
    as positional hex arithmetic (the DuckDB oracle's formulation), computed
    with ONE ``conv(hex, 16, 10)`` instead of ``hex_chars`` interpreted
    substring+instr ops per token (2x on the md5 stage at sf0.1)."""
    return F.conv(F.substring(F.md5(token), 1, hex_chars), 16, 10).cast("bigint")


def fingerprint_col(text: Column) -> Column:
    """Rolling polynomial hash over token hashes:
    acc = (acc*FP_BASE + tok) % FP_MOD, acc0 = 0."""
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: token_hash_col(t) % spec.FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * spec.FP_BASE + h) % spec.FP_MOD,
    )


def simhash_col(text: Column, bits: int = 32) -> Column:
    """SimHash over token hashes (8 hex chars -> 32-bit token hash): for each
    bit, vote +1/-1 per token; bit set iff vote > 0."""
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: token_hash_col(t, hex_chars=8))
    # single pass over the token hashes: fold a 32-long vote vector
    # (one md5 per token total; a per-bit formulation would recompute the
    # token hashes `bits` times — measured 12x slower). Bit b is extracted
    # as h % 2^(b+1) >= 2^b against LITERAL power arrays — the previous
    # floor(h / pow(2.0, b)) % 2 paid a double pow + floor per bit per token
    # in the interpreted HOF evaluator (this fold was 1.8s of the 3.1s query)
    powers = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    twopow = F.array(*[F.lit(1 << (b + 1)).cast("bigint") for b in range(bits)])

    def bit_votes(h: Column) -> Column:
        return F.zip_with(
            powers,
            twopow,
            lambda p, q: F.when(h % q >= p, F.lit(1)).otherwise(F.lit(-1)).cast("bigint"),
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v),
    )
    # reference `votes` exactly ONCE: higher-order functions run interpreted
    # (no codegen, no common-subexpression elimination), so indexing the fold
    # result per bit would re-run the whole fold per bit
    contrib = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(contrib, F.lit(0).cast("bigint"), lambda a, x: a + x)


def bigram_col(text: Column) -> Column:
    """Adjacent word 2-grams of the normalized token stream."""
    from .exprutil import let

    def grams(ws: Column) -> Column:
        return F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(tokens_col(text), grams)


def repetition_rows(assembled, text_col: str = "plain_text"):
    """Gopher-style repetition quality signals over the EXTRACTED text (the
    post-extraction filter every LLM data pipeline runs — Rae et al. 2021
    'repetition' heuristics): fraction of duplicate lines (count and
    char-weighted) and the character share of the most frequent word
    2-gram. Line identity uses the engine's own '\\n' paragraph separators;
    '\\f' page marks are stripped first.

    Scale shape: two explode -> two-level hash aggregations (doc_id, key)
    -> per-doc rollup, plus one per-doc top-1 window over 2-gram counts —
    no per-doc state wider than its own lines/grams, shuffles keyed by
    (doc_id, line/gram) hash. Ties on the top 2-gram break to the
    lexicographically smallest gram (deterministic, SQL-portable)."""
    from pyspark.sql.window import Window

    lines_arr = F.filter(
        F.split(F.translate(F.col(text_col), "\f", ""), "\n"),
        lambda x: x != "",
    )
    lines = assembled.select("doc_id", F.explode(lines_arr).alias("line"))
    per_line = lines.groupBy("doc_id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = per_line.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_lines"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("cnt") * F.length("line")).cast("bigint").alias("line_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0)
        ).cast("bigint").alias("dup_chars"),
    )
    grams = assembled.select(
        "doc_id", F.explode(bigram_col(F.col(text_col))).alias("gram")
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("gram"))
    top = (
        per_gram.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("gram").alias("top_gram"), F.col("cnt").alias("top_cnt"))
    )
    gram_tot = per_gram.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.length("gram")).cast("bigint").alias("gram_chars")
    )
    return (
        line_stats.join(top, "doc_id").join(gram_tot, "doc_id")
        .select(
            "doc_id",
            "n_lines",
            ((F.col("n_lines") - F.col("n_distinct")) / F.col("n_lines"))
            .alias("dup_line_frac"),
            (F.col("dup_chars") / F.col("line_chars")).alias("dup_line_char_frac"),
            "top_gram",
            (F.col("top_cnt") * F.length("top_gram") / F.col("gram_chars"))
            .alias("top_gram_char_frac"),
        )
    )


def py_tokens(text: str) -> list:
    """Python twin of ``tokens_col`` (lower -> \\s+ squash -> trim ->
    split-on-space -> drop empties); exact on the corpus alphabet (ASCII —
    Java/Python lowercase and \\s agree there). Shared by Arrow kernels."""
    import re

    squashed = re.sub(r"\s+", " ", (text or "").lower()).strip()
    return [w for w in squashed.split(" ") if w]


def simhash_rows(docs, doc_id_col: str = "doc_id", text_col: str = "text",
                 bits: int = 32):
    """(doc_id, simhash) via one Arrow pass — VALUE-IDENTICAL to the
    ``simhash_col`` fold (pinned by pytest): same token stream, same
    8-hex-char md5 token hashes, same +1/-1 bit votes with bit set iff
    vote > 0, all exact integer arithmetic. The interpreted fold costs
    32 zip_with lambda evaluations per token; the numpy kernel does the
    same votes in one (tokens x bits) pass (~1.5 s -> ~0.4 s at sf0.1)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811 (local, for select)

    def gen(batches):
        shifts = np.arange(bits, dtype=np.uint64)
        for pdf in batches:
            ids: list = []
            vals: list = []
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                toks = py_tokens(text)
                if toks:
                    H = np.fromiter(
                        (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                         for t in toks),
                        dtype=np.uint64, count=len(toks),
                    )
                    ones = ((H[:, None] >> shifts[None, :]) & 1).sum(axis=0)
                    votes = 2 * ones.astype(np.int64) - len(toks)
                    sim = int(((votes > 0).astype(np.uint64) << shifts).sum())
                else:
                    sim = 0  # the fold over zero hashes leaves every vote 0
                ids.append(doc_id)
                vals.append(sim)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype=object),
                "simhash": pd.Series(vals, dtype="int64"),
            })

    return docs.select(
        F.col(doc_id_col).cast("string").alias(doc_id_col), text_col
    ).mapInPandas(gen, schema="doc_id string, simhash bigint")


def repetition_rows_arrow(assembled, text_col: str = "plain_text"):
    """Shuffle-free Arrow twin of ``repetition_rows`` (value-identical,
    pinned by pytest): per-doc line/2-gram counting is bounded by the doc's
    own size, so a python Counter per doc beats exploding every line and
    2-gram into two corpus-wide shuffles — at 10^12 docs the exploded
    groupBy shape moves ~tokens-many rows through the cluster twice for
    counts each task could produce locally. Ties on the top 2-gram break to
    the lexicographically smallest gram, as in the DataFrame form."""
    from collections import Counter

    import pandas as pd

    def gen(batches):
        cols = ["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
                "top_gram", "top_gram_char_frac"]
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                lines = [x for x in (text or "").replace("\f", "").split("\n") if x]
                toks = py_tokens(text)
                grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
                if not lines or not grams:
                    continue  # inner-join semantics of the DataFrame form
                lc = Counter(lines)
                n_lines = len(lines)
                line_chars = sum(len(l) for l in lines)
                dup_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
                gc = Counter(grams)
                top_gram, top_cnt = min(gc.items(), key=lambda kv: (-kv[1], kv[0]))
                gram_chars = sum(len(g) for g in grams)
                out["doc_id"].append(doc_id)
                out["n_lines"].append(n_lines)
                out["dup_line_frac"].append((n_lines - len(lc)) / n_lines)
                out["dup_line_char_frac"].append(dup_chars / line_chars)
                out["top_gram"].append(top_gram)
                out["top_gram_char_frac"].append(top_cnt * len(top_gram) / gram_chars)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=(object if k in ("doc_id", "top_gram")
                                        else "int64" if k == "n_lines" else "float64"))
                 for k, v in out.items()},
                columns=cols,
            )

    return assembled.select("doc_id", text_col).mapInPandas(
        gen,
        schema="doc_id string, n_lines bigint, dup_line_frac double, "
               "dup_line_char_frac double, top_gram string, "
               "top_gram_char_frac double",
    )
