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


def ngram_col(text: Column, n: int) -> Column:
    """Adjacent word n-grams (space-joined) of the normalized token stream;
    empty array below n tokens."""
    from .exprutil import let

    def grams(ws: Column) -> Column:
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(tokens_col(text), grams)


def bigram_col(text: Column) -> Column:
    """Adjacent word 2-grams of the normalized token stream."""
    return ngram_col(text, 2)


#: the full Gopher repetition battery (Rae et al. 2021, Table A1): top
#: n-gram character share for these n ...
TOP_NS = (2, 3, 4)
#: ... and duplicate n-gram character share for these n. Char shares count
#: every occurrence of a gram (sum cnt*len / sum over all occurrences),
#: the Dolma/RedPajama reimplementation convention — Gopher's
#: no-double-count character coverage needs positional interval merging,
#: which buys little discrimination for meaningfully more state.
DUP_NS = (5, 6, 7, 8, 9, 10)


def repetition_rows(assembled, text_col: str = "plain_text"):
    """Gopher-style repetition quality signals over the EXTRACTED text (the
    post-extraction filter every LLM data pipeline runs — Rae et al. 2021
    'repetition' heuristics): fraction of duplicate lines (count and
    char-weighted), the character share of the most frequent word n-gram
    for n in TOP_NS, and the duplicate-n-gram character share for n in
    DUP_NS. Line identity uses the engine's own '\\n' paragraph separators
    ('\\f' page marks stripped first); in this text model lines ARE the
    paragraphs (single-\\n separators), so Gopher's line/paragraph pairs
    collapse to one family. Docs too short for a given n carry NULL for
    that column (they have no n-grams to judge).

    Scale shape: explode -> two-level hash aggregations (doc_id, key) ->
    per-doc rollup per family, plus one per-doc top-1 window per TOP_NS
    size — no per-doc state wider than its own lines/grams, shuffles keyed
    by (doc_id, line/gram) hash. Ties on a top gram break to the
    lexicographically smallest gram (deterministic, SQL-portable). This
    exploded form is the semantic REFERENCE; the served kernel is the
    shuffle-free Arrow twin (repetition_rows_arrow), pinned value-identical."""
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
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("gram"))

    def per_gram_for(n: int):
        grams = assembled.select(
            "doc_id", F.explode(ngram_col(F.col(text_col), n)).alias("gram")
        )
        return grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))

    per_gram = per_gram_for(2)
    top = (
        per_gram.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("gram").alias("top_gram"), F.col("cnt").alias("top_cnt"))
    )
    gram_tot = per_gram.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.length("gram")).cast("bigint").alias("gram_chars")
    )
    out = (
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
    for n in TOP_NS[1:]:
        pg = per_gram_for(n)
        topn = (
            pg.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "doc_id", F.col("gram").alias("tg"), F.col("cnt").alias("tc")
            )
        )
        totn = pg.groupBy("doc_id").agg(
            F.sum(F.col("cnt") * F.length("gram")).cast("bigint").alias("gc")
        )
        frac = topn.join(totn, "doc_id").select(
            "doc_id",
            (F.col("tc") * F.length("tg") / F.col("gc"))
            .alias(f"top_{n}gram_char_frac"),
        )
        out = out.join(frac, "doc_id", "left")
    for n in DUP_NS:
        pg = per_gram_for(n)
        dupn = pg.groupBy("doc_id").agg(
            (
                F.sum(
                    F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram"))
                    .otherwise(0)
                ).cast("bigint")
                / F.sum(F.col("cnt") * F.length("gram")).cast("bigint")
            ).alias(f"dup_{n}gram_char_frac")
        )
        out = out.join(dupn, "doc_id", "left")
    return out


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
    pinned by pytest): per-doc line/n-gram counting is bounded by the doc's
    own size, so python Counters per doc beat exploding every line and
    n-gram into corpus-wide shuffles — at 10^12 docs the exploded groupBy
    shape moves ~tokens-many rows through the cluster once PER GRAM SIZE
    (nine times for the full Gopher battery) for counts each task could
    produce locally. N-grams are counted WITHOUT building a string per
    occurrence — token-tuple Counters for ordinary docs, a numpy rolling
    dense-key chain for giant ones (NP_CHAIN_MIN_TOKENS switch; both paths
    pinned equal) — and only top-count candidates are joined to strings
    for the lexicographic tie-break. Ties break to the lexicographically
    smallest gram, as in the DataFrame form; docs too short for a gram
    size carry None for that column."""
    from collections import Counter

    import pandas as pd

    frac_cols = (
        [f"top_{n}gram_char_frac" for n in TOP_NS[1:]]
        + [f"dup_{n}gram_char_frac" for n in DUP_NS]
    )
    cols = ["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
            "top_gram", "top_gram_char_frac"] + frac_cols

    #: tokens above which the numpy rolling-key chain beats python Counters
    #: (measured: per-call numpy overhead dominates below ~this size — the
    #: sf corpora average ~57 tokens/doc and Counters are ~2.5x faster
    #: there; a 100k-token giant doc inverts it)
    NP_CHAIN_MIN_TOKENS = 4096

    def gen(batches):
        import numpy as np

        def fracs_counter(toks, csum, max_n):
            """Per-n gram fractions via python tuple Counters — the fast
            shape for ordinary documents (tiny constant factors; windows
            materialize as tuples via one C-level zip per size)."""
            tops, dups = {}, {}
            top_gram2 = None
            m1 = len(toks)
            for n in range(2, max_n + 1):
                m = m1 - n + 1
                if m <= 0:
                    break
                cnt = Counter(zip(*(toks[i:m + i] for i in range(n))))
                tot = int(csum[n:m + n].sum() - csum[:m].sum()) + (n - 1) * m
                if n in TOP_NS:
                    mx = max(cnt.values())
                    top = min(
                        " ".join(t) for t, c in cnt.items() if c == mx
                    )
                    tops[n] = mx * len(top) / tot
                    if n == 2:
                        top_gram2 = top
                if n in DUP_NS:
                    dup = sum(
                        c * (sum(map(len, t)) + n - 1)
                        for t, c in cnt.items() if c > 1
                    )
                    dups[n] = dup / tot
            return top_gram2, tops, dups

        def fracs_chain(toks, ids, n_vocab, csum, max_n):
            """Same fractions via an incremental dense rolling encoding:
            level n's gram keys are (level n-1 dense key, next token id)
            pairs packed into one int64 and re-densified by a 1-D
            np.unique — one C-speed sort per gram size, no per-window
            python objects. Keys stay < m * n_vocab, far inside int64 for
            any in-memory document; this is the giant-doc shape."""
            tops, dups = {}, {}
            top_gram2 = None
            prev = ids.astype(np.int64)
            for n in range(2, max_n + 1):
                m = len(ids) - n + 1
                if m <= 0:
                    break
                comb = prev[:m] * np.int64(n_vocab) + ids[n - 1:]
                _u, first, inverse, counts = np.unique(
                    comb, return_index=True, return_inverse=True,
                    return_counts=True,
                )
                occ_lens = csum[n:m + n] - csum[:m] + (n - 1)
                tot = int(occ_lens.sum())
                if n in TOP_NS:
                    mx = int(counts.max())
                    top = min(
                        " ".join(toks[p:p + n]) for p in first[counts == mx]
                    )
                    tops[n] = mx * len(top) / tot
                    if n == 2:
                        top_gram2 = top
                if n in DUP_NS:
                    d = counts > 1
                    lens_u = occ_lens[first]
                    dups[n] = int((counts[d] * lens_u[d]).sum()) / tot
                prev = inverse
            return top_gram2, tops, dups

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                lines = [x for x in (text or "").replace("\f", "").split("\n") if x]
                toks = py_tokens(text)
                if not lines or len(toks) < 2:
                    continue  # inner-join semantics of the DataFrame form
                csum = np.concatenate((
                    [0], np.cumsum([len(t) for t in toks], dtype=np.int64)
                ))
                lc = Counter(lines)
                n_lines = len(lines)
                line_chars = sum(len(l) for l in lines)
                dup_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
                out["doc_id"].append(doc_id)
                out["n_lines"].append(n_lines)
                out["dup_line_frac"].append((n_lines - len(lc)) / n_lines)
                out["dup_line_char_frac"].append(dup_chars / line_chars)
                if len(toks) >= NP_CHAIN_MIN_TOKENS:
                    vocab, ids = np.unique(np.array(toks), return_inverse=True)
                    top_gram, tops, dups = fracs_chain(
                        toks, ids, len(vocab), csum, max(DUP_NS)
                    )
                else:
                    top_gram, tops, dups = fracs_counter(toks, csum, max(DUP_NS))
                out["top_gram"].append(top_gram)
                out["top_gram_char_frac"].append(tops[2])
                for n in TOP_NS[1:]:
                    out[f"top_{n}gram_char_frac"].append(tops.get(n))
                for n in DUP_NS:
                    out[f"dup_{n}gram_char_frac"].append(dups.get(n))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=(object if k in ("doc_id", "top_gram")
                                        or k in frac_cols
                                        else "int64" if k == "n_lines"
                                        else "float64"))
                 for k, v in out.items()},
                columns=cols,
            )

    frac_schema = ", ".join(f"{c} double" for c in frac_cols)
    return assembled.select("doc_id", text_col).mapInPandas(
        gen,
        schema="doc_id string, n_lines bigint, dup_line_frac double, "
               "dup_line_char_frac double, top_gram string, "
               "top_gram_char_frac double, " + frac_schema,
    )


def _doc_token_counts_arrow(docs, doc_id_col: str, text_col: str):
    """(doc_id, token, tf) per-doc term frequencies via one Arrow pass —
    the shuffle-free twin of explode(tokens_col) -> groupBy(doc_id, token)
    (r6): the tf grouping is doc-local, so a python Counter per doc
    produces the distinct counts without shipping every token occurrence
    through the first exchange. Same tokenization as ``tokens_col`` via
    ``py_tokens``; docs with zero tokens emit no rows (explode's
    inner-join semantics). Pinned row-equal by pytest."""
    from collections import Counter

    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids: list = []
            toks: list = []
            tfs: list = []
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                cnt = Counter(py_tokens(text))
                ids.extend([doc_id] * len(cnt))
                toks.extend(cnt.keys())
                tfs.extend(cnt.values())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=object),
                    "token": pd.Series(toks, dtype=object),
                    "tf": pd.Series(tfs, dtype="int64"),
                },
                columns=["doc_id", "token", "tf"],
            )

    return docs.select(
        F.col(doc_id_col).cast("string").alias(doc_id_col), text_col
    ).mapInPandas(gen, schema="doc_id string, token string, tf bigint")


def tfidf_keywords(docs, k: int = 3, doc_id_col: str = "doc_id",
                   text_col: str = "text", vectorized: bool = True):
    """Per-document top-k keywords by TF-IDF — the corpus-level two-pass
    curation operator (per-doc signals like quality/repetition need no
    corpus state; this one does): one token explode feeds BOTH the per-doc
    term frequencies and the corpus document frequencies, then a hash join
    on token brings the IDF weight back to each (doc, token).

    Scoring is INTEGER-exact (oracle-hashable — see the float-exact
    recipe): idf_scaled = (1_000_000 * n_docs) div df (integer division,
    the fixed-point inverse document frequency; the log() of textbook IDF
    is monotone in this, so top-k sets differ only where log-IDF ties
    anyway) and score = tf * idf_scaled, all BIGINT. Ties break by token
    string ascending.

    Scale shape: explode -> (doc, token) count [shuffle 1] -> token df
    aggregate [shuffle 2, vocabulary-sized] -> hash join on token (the
    vocabulary at web scale is ~10^8 rows — NOT broadcastable; the join
    hashes both sides on token) -> per-doc top-k window [shuffle 3 on
    doc_id]. n_docs rides in as a 1-row broadcast cross join.

    ``vectorized=True`` (default, r6): the tf stage runs as the Arrow
    Counter kernel (``_doc_token_counts_arrow`` — per-doc grouping needs
    no exchange), localCheckpointed (the repo's established
    materialize-once pattern, see lsh_candidate_pairs) so the three
    consumers (df, n_docs, the join probe) read the materialized blocks
    instead of re-running the kernel per branch. The token-occurrence
    explode and its corpus-wide first shuffle leave the plan; df/n_docs/
    join/window are unchanged. Row-equal to the expression form
    (pytest), oracle hashes unchanged."""
    from pyspark.sql.window import Window

    if vectorized:
        tf = _doc_token_counts_arrow(docs, doc_id_col, text_col).localCheckpoint(
            eager=False
        )
    else:
        toks = docs.select(
            F.col(doc_id_col).cast("string").alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        tf = toks.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("bigint").alias("tf")
        )
    # df and n_docs derive from tf, NOT from a second/third pass over the
    # raw token explode: the (doc, token) rows are already distinct after
    # the tf aggregate, so count(*) == count_distinct — and because all
    # three branches share the identical tf subtree, Catalyst reuses ONE
    # token-explode shuffle (ReusedExchange) instead of re-scanning and
    # re-exploding the corpus per branch
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    weighted = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("tf") * F.expr("(1000000 * n_docs) div df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"),
                "token", "tf", "df", "score")
    )


def source_stats(docs, doc_id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source"):
    """Per-source corpus distribution report: doc counts, token totals, and
    EXACT rank-based quantiles (p50/p90) of per-doc token counts. Quantiles
    are percentile-disc by rank — the value at rank ceil(q * n) within the
    source's sorted token counts — because interpolated percentiles
    (Spark `percentile`, DuckDB `quantile_cont`) mix floats whose rounding
    is not engine-portable, while rank selection is integer-exact in any
    engine. Ties inside a source break by doc_id so the picked row is
    deterministic.

    Scale shape: one narrow token-count pass, one groupBy-window per
    source (the window sorts WITHIN each source only — no global sort),
    then the per-source rollup. At 10^12 docs a giant source's sort is the
    cost; for monitoring, run on a sample — the operator is unchanged."""
    from pyspark.sql.window import Window

    counts = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.col(source_col).alias("source"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = counts.select(
        "source", "n_tokens",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    return ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.5), F.col("n_tokens"))
        ).cast("bigint").alias("p50_tokens"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.9), F.col("n_tokens"))
        ).cast("bigint").alias("p90_tokens"),
    )
