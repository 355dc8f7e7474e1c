"""Near-duplicate detection: shingling, MinHash signatures, LSH banding,
candidate-pair generation, exact n-gram Jaccard verification.

Scale shape (the reason this is LSH and not O(n^2)): signatures and bands are
per-row Catalyst expressions (narrow); the only shuffle is the band-bucket
self-join, whose buckets are tiny by construction (a band collision implies
high estimated Jaccard). At 10^12 docs the bucket join is the classic
dedup-at-scale plan; a skew guard caps pathological buckets.

MinHash family: h_p(s) = ((2p+1) * h(s) + p) mod MINHASH_MOD over the doc's
distinct shingles, where h(s) is an md5-prefix integer — ONE md5 per shingle,
PERMS cheap affine maps. Deterministic, RNG-free, reproducible in any engine
with md5. (A salted-md5-per-permutation formulation was 16x slower: 27s for
5000 docs at 32 cores, all in interpreted md5+concat churn.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core import spec
from . import exprutil

#: buckets larger than this are dropped as degenerate (boilerplate shingles);
#: a bucket of b docs yields b^2 pairs — this caps join blowup at scale
MAX_BUCKET = 64


def shingles_col(text: Column, k: int = spec.SHINGLE_K) -> Column:
    """Distinct word k-shingles of a text column."""
    words = F.filter(F.split(text, " "), lambda w: w != "")
    n = F.size(words) - (k - 1)
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    )


def minhash_sig_col(shingles: Column, perms: int = spec.MINHASH_PERMS) -> Column:
    """array<bigint> of length ``perms``: min affine-permuted shingle hash.

    The shingle-hash array is let-bound so the md5 pass runs once, not once
    per permutation."""
    from . import textstats

    def sig(hs: Column) -> Column:
        def perm_min(p: Column) -> Column:
            a = (p.cast("bigint") * 2 + 1) * spec.MINHASH_MULT % spec.MINHASH_MOD
            return F.array_min(
                F.transform(hs, lambda h: (h * a + p) % spec.MINHASH_MOD)
            )

        return F.transform(F.sequence(F.lit(0), F.lit(perms - 1)), perm_min)

    hashes = F.transform(
        shingles, lambda s: textstats.token_hash_col(s) % spec.MINHASH_MOD
    )
    return exprutil.let(hashes, sig)


def band_sigs_col(sig: Column, bands: int = spec.LSH_BANDS,
                  perms: int = spec.MINHASH_PERMS) -> Column:
    """array<struct<band:int, band_sig:string>> — md5 of each band's rows."""
    rows = perms // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows + 1, rows), lambda x: x.cast("string")
                    ),
                    ",",
                )
            ).alias("band_sig"),
        ),
    )


def shingle_hash_set(text: str) -> "list[int]":
    """Distinct word-SHINGLE_K-shingle hashes of one text — the python twin
    of ``shingles_col`` + ``token_hash_col % MINHASH_MOD``, value-identical
    by construction (same split-on-space/drop-empties tokenization, same
    md5-prefix integer). Shared by the Arrow signature kernel and tests."""
    import hashlib

    words = [w for w in (text or "").split(" ") if w]
    if len(words) < spec.SHINGLE_K:
        return []
    sh = {
        " ".join(words[i:i + spec.SHINGLE_K])
        for i in range(len(words) - spec.SHINGLE_K + 1)
    }
    return [
        int(hashlib.md5(s.encode()).hexdigest()[:spec.FP_HEX_CHARS], 16)
        % spec.MINHASH_MOD
        for s in sh
    ]


def signature_band_rows_arrow(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    perms: int = spec.MINHASH_PERMS,
    bands: int = spec.LSH_BANDS,
) -> DataFrame:
    """(doc_id, sig, band, band_sig) exploded band rows via ONE Arrow pass —
    VALUE-IDENTICAL to the HOF formulation (``minhash_sig_col`` +
    ``band_sigs_col``; pinned by pytest): md5 is md5 in any engine, the
    affine perm-min is exact int64 arithmetic (h, a_p < 2^31 so products
    stay < 2^62), and min over a set is order-free. The HOF build cost
    ~2.9 s at sf0.1 — almost all of it the per-shingle slice+join transform
    in the interpreted evaluator; the python/numpy kernel does the same
    work at C speed (~0.5 s), which every signature consumer
    (near-dup, incremental dedup, the persisted state write) inherits."""
    import hashlib

    import numpy as np
    import pandas as pd

    A = np.array(
        [((2 * p + 1) * spec.MINHASH_MULT) % spec.MINHASH_MOD for p in range(perms)],
        dtype=np.int64,
    )
    P = np.arange(perms, dtype=np.int64)
    rows_per = perms // bands

    def gen(batches):
        cols = ["doc_id", "sig", "band", "band_sig"]
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                hs_list = shingle_hash_set(text)
                if not hs_list:
                    continue
                hs = np.asarray(hs_list, dtype=np.int64)
                sig = ((hs[None, :] * A[:, None] + P[:, None]) % spec.MINHASH_MOD
                       ).min(axis=1).tolist()
                for b in range(bands):
                    bs = hashlib.md5(
                        ",".join(str(x) for x in sig[b * rows_per:(b + 1) * rows_per])
                        .encode()
                    ).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["sig"].append(sig)
                    out["band"].append(b)
                    out["band_sig"].append(bs)
            # object dtype everywhere: a batch with no surviving docs would
            # otherwise default to empty float64 columns, which Arrow cannot
            # convert to list<int64>/string targets
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()},
                columns=cols,
            )

    return docs.select(
        F.col(doc_id_col).cast("string").alias(doc_id_col), text_col
    ).mapInPandas(
        gen, schema="doc_id string, sig array<bigint>, band int, band_sig string"
    )


def _shingle_hash_rows_arrow(docs: DataFrame, doc_id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """(doc_id, h, n_shingles) exploded distinct-shingle hash rows via one
    Arrow pass (the decontamination shape)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids: list = []
            hs: list = []
            ns: list = []
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                l = shingle_hash_set(text)
                if not l:
                    continue
                ids.extend([doc_id] * len(l))
                hs.extend(l)
                ns.extend([len(l)] * len(l))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=object),
                    "h": pd.Series(hs, dtype="int64"),
                    "n_shingles": pd.Series(ns, dtype="int32"),
                },
                columns=["doc_id", "h", "n_shingles"],
            )

    return docs.select(
        F.col(doc_id_col).cast("string").alias(doc_id_col), text_col
    ).mapInPandas(gen, schema="doc_id string, h bigint, n_shingles int")


def doc_shingles(docs: DataFrame, doc_id_col: str = "doc_id",
                 text_col: str = "text", vectorized: bool = True) -> DataFrame:
    """(doc_id, shingles) for docs with at least one shingle.

    ``vectorized=True`` (r6): one Arrow pass builds the distinct-shingle
    string arrays in python (same split-on-space/drop-empties words, same
    k, emitted sorted — a deterministic order, which array_intersect/union
    set sizes are insensitive to) instead of the interpreted per-shingle
    slice+array_join HOF. Row-equal up to array order (pytest pins the
    jaccard consumers bit-equal)."""
    if vectorized:
        import pandas as pd

        k = spec.SHINGLE_K

        def gen(batches):
            for pdf in batches:
                ids: list = []
                sh: list = []
                for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                    words = [w for w in (text or "").split(" ") if w]
                    if len(words) < k:
                        continue
                    ids.append(doc_id)
                    sh.append(sorted({
                        " ".join(words[i:i + k])
                        for i in range(len(words) - k + 1)
                    }))
                yield pd.DataFrame({
                    "doc_id": pd.Series(ids, dtype=object),
                    "shingles": pd.Series(sh, dtype=object),
                }, columns=["doc_id", "shingles"])

        return docs.select(
            F.col(doc_id_col).cast("string").alias("doc_id"), text_col
        ).mapInPandas(gen, schema="doc_id string, shingles array<string>")
    return docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        shingles_col(F.col(text_col)).alias("shingles"),
    ).where(F.size("shingles") > 0)


def lsh_candidate_pairs(docs: DataFrame, doc_id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs sharing at least one LSH band.

    Plan: narrow sig/band computation -> explode bands -> self-join on
    (band, band_sig) -> distinct. The join keys are hashes, so the shuffle is
    uniformly distributed by construction; MAX_BUCKET drops degenerate keys.
    """
    # Arrow signature kernel (value-identical to the HOF twin); sig dropped
    # before the window so the (band, band_sig) shuffle moves only keys
    exploded = signature_band_rows_arrow(docs, doc_id_col, text_col).drop("sig")
    # skew guard: drop buckets that would explode the pair join
    counted = exploded.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "band_sig"))
    ).where(F.col("bucket_n") <= MAX_BUCKET)
    # the self-join would otherwise re-execute the whole signature plan for
    # each branch. localCheckpoint rather than persist: cached-plan entries
    # live in the CacheManager until an explicit unpersist (they leak across
    # repeated invocations — bench/driver loops), while checkpoint blocks
    # are reference-tracked and freed when the DataFrame is garbage-
    # collected. eager=False so merely CONSTRUCTING the DataFrame
    # (explain(), plan tests, bench warm-up wiring) runs no jobs.
    # TRADE-OFF (not strictly better than persist): localCheckpoint
    # truncates lineage and its blocks are unreplicated — on a CLUSTER an
    # executor loss (or dynamic-allocation decommission) makes the job
    # unrecoverable instead of recomputable. Right for the single-JVM
    # local/bench path; at cluster scale materialize signatures to a real
    # table partitioned by (band, band_sig) instead — durable, resumable,
    # and the join co-locates on the partition key.
    counted = counted.localCheckpoint(eager=False)
    a = counted.select("band", "band_sig", F.col("doc_id").alias("doc_a"))
    b = counted.select("band", "band_sig", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def near_dup_pairs(docs: DataFrame, doc_id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """LSH candidates verified with exact Jaccard over distinct shingles.

    The verify joins are candidate-pair-sized (tiny vs the corpus); shingle
    sets ride along via two hash joins on doc_id.
    """
    pairs = lsh_candidate_pairs(docs, doc_id_col, text_col)
    sh = doc_shingles(docs, doc_id_col, text_col).localCheckpoint(eager=False)
    return (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a")
                     .withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("shingles", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing word k-shingles with
    an evaluation set (the n-gram collision check every LLM training
    pipeline runs before a data release).

    Plan shape at 10^12 train docs: the eval side is a BENCHMARK — tiny by
    nature — so its distinct shingle hashes broadcast; the train side is one
    narrow explode (doc_id, shingle_hash) with no shuffle until the per-doc
    hit aggregation, which hashes on doc_id. Only contaminated docs
    (n_hits >= min_hits) are emitted, so the output is a small report, not a
    second corpus. Shingle identity = the same FP_HEX_CHARS md5-prefix hash
    the dedup family uses (deterministic, engine-agnostic; 28-bit space —
    collisions negligible and identical in any engine).

    Returns (doc_id, n_hits, n_shingles, contamination = n_hits/n_shingles).
    """
    # Arrow shingle-hash kernel on BOTH sides (value-identical to the HOF
    # shingle build — md5 is md5; see shingle_hash_set). The train side
    # stays one narrow (doc_id, h, n_shingles) pass; note the kernel hashes
    # mod MINHASH_MOD, and the md5-prefix space is FP_HEX_CHARS hex chars
    # (7) = 28 bits < MINHASH_MOD, so the mod never fires and the values
    # equal the raw token_hash_col the oracle computes.
    tr = _shingle_hash_rows_arrow(train, doc_id_col, text_col)
    ev = (
        _shingle_hash_rows_arrow(eval_docs, doc_id_col, text_col)
        .select("h")
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
        .select(
            "doc_id",
            "n_hits",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            (F.col("n_hits") / F.col("n_shingles")).cast("double").alias("contamination"),
        )
    )


def signature_rows_hof(docs: DataFrame, doc_id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Pure-Catalyst formulation of the signature band rows — kept as the
    value-twin the Arrow kernel is pinned against (tests/test_plans.py);
    vectorized=False keeps this twin fully independent of python code."""
    sigs = doc_shingles(docs, doc_id_col, text_col, vectorized=False).select(
        "doc_id",
        exprutil.let(
            minhash_sig_col(F.col("shingles")),
            lambda sig: F.struct(sig.alias("sig"), band_sigs_col(sig).alias("bands")),
        ).alias("sb"),
    )
    return sigs.select(
        "doc_id", F.col("sb.sig").alias("sig"), F.explode("sb.bands").alias("b")
    ).select(
        "doc_id", "sig",
        F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"),
    )


def signature_rows(docs: DataFrame, doc_id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, sig, band, band_sig) — the dedup state of a corpus, as a
    plan (no materialization). Degenerate buckets are dropped (MAX_BUCKET),
    so batch joins against the rows are bounded. Signatures come from the
    Arrow kernel (value-identical to the HOF twin, ~6x cheaper)."""
    exploded = signature_band_rows_arrow(docs, doc_id_col, text_col)
    counted = exploded.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "band_sig"))
    )
    return counted.where(F.col("bucket_n") <= MAX_BUCKET).drop("bucket_n")


def signature_table(docs: DataFrame, doc_id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """In-memory signature state: ``signature_rows`` lazily materialized so
    repeated consumers (batch joins, bench reruns) pay the minhash plan once.
    This is the single-JVM convenience path — the DURABLE form is
    ``state.write_signature_table`` (parquet partitioned by
    (band, sig_prefix), read back with partition pruning), which survives
    executor loss and is resumable across jobs; see the localCheckpoint
    trade-off note in lsh_candidate_pairs."""
    return signature_rows(docs, doc_id_col, text_col).localCheckpoint(eager=False)


def incremental_near_dup(
    new_docs: DataFrame,
    committed_sigs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    est_threshold: float = 0.5,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Cross-batch near-dup: which NEW docs duplicate an already-committed
    doc. The production shape of dedup at scale — a batch is signed (narrow,
    batch-sized) and joined against the committed signature_table; the
    committed corpus is never re-shingled, and within-batch pairs are the
    separate near_dup_pairs concern.

    Verification uses the MinHash ESTIMATE (fraction of agreeing signature
    components — the standard sketch estimator of Jaccard), because at
    10^12 committed docs the raw shingle sets are not retained. Returns
    (doc_id, dup_of, est_jaccard) with doc_id from the new batch.

    When ``committed_sigs`` is the persisted table (it carries the
    ``sig_prefix`` partition column — ``state.read_signature_table``), the
    join also keys on (band, sig_prefix): the batch side's key set then
    drives dynamic partition pruning, so a small batch touches only the
    committed partitions holding its candidate buckets instead of scanning
    the whole 10^12-doc signature table."""
    # signature_rows, not signature_table: the batch is consumed exactly once
    # (this join), so a checkpoint buys nothing — and its LogicalRDD boundary
    # would hide the batch's selective filters from the DPP planner
    batch = signature_rows(new_docs, doc_id_col, text_col).select(
        F.col("doc_id").alias("new_id"),
        F.col("sig").alias("sig_new"),
        "band",
        "band_sig",
    )
    keys = ["band", "band_sig"]
    if "sig_prefix" in committed_sigs.columns:
        from . import state

        batch = batch.withColumn("sig_prefix", state.sig_prefix_col(F.col("band_sig")))
        keys = ["band", "sig_prefix", "band_sig"]
    old = committed_sigs.select(
        F.col("doc_id").alias("dup_of"),
        F.col("sig").alias("sig_old"),
        *keys,
    )
    # in the production shape the batch is the small side (a day's arrivals
    # vs the whole committed corpus): broadcasting it means the committed
    # table is never shuffled, and — against the persisted table — dynamic
    # partition pruning drops committed partitions outside the batch's
    # (band, sig_prefix) key set before any signature file is read (spark's
    # DPP is broadcast-reuse-only by default). The hint bypasses
    # autoBroadcastJoinThreshold, so it is caller-controlled: pass
    # broadcast_batch=False for a bulk-reprocess batch that rivals the
    # committed corpus — the join then shuffles both sides instead of
    # collecting an unbounded batch to the driver
    bside = F.broadcast(batch) if broadcast_batch else batch
    cand = (
        bside.join(old, keys)
        .select("new_id", "dup_of", "sig_new", "sig_old")
        .groupBy("new_id", "dup_of")
        .agg(F.first("sig_new").alias("sig_new"), F.first("sig_old").alias("sig_old"))
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_new"), F.col("sig_old"), lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.size(F.col("sig_new"))
    ).cast("double")
    return (
        cand.select(
            F.col("new_id").alias("doc_id"), "dup_of", est.alias("est_jaccard")
        )
        .where(F.col("est_jaccard") >= est_threshold)
    )


#: window width (in tokens) for cross-document duplicated-window scoring —
#: the window-granular analog of exact-substring dedup (Lee et al. 2022,
#: "Deduplicating Training Data Makes Language Models Better"): substrings
#: this long shared across documents are near-certain boilerplate/copies,
#: not coincidence
DUP_WINDOW_TOKENS = 8


def _doc_window_counts_arrow(docs: DataFrame, n: int, doc_id_col: str,
                             text_col: str) -> DataFrame:
    """(doc_id, win, occ) per-doc window-hash counts via one Arrow pass —
    the shuffle-free twin of explode(ngram) -> 60-bit md5 ->
    groupBy(doc_id, win).count(): grouping keyed by (doc, window) is
    per-document local, so each task produces its docs' distinct counts
    with a python Counter instead of shipping every window occurrence
    through an exchange (the r5 plan's first and largest shuffle).
    Hashes are the exact ``token_hash_col(..., hex_chars=15)`` values
    (same md5 prefix, same tokenization via ``py_tokens``); docs with
    fewer than n tokens emit no rows, matching explode's inner-join
    semantics. Pinned row-equal to the expression form by pytest."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from .textstats import py_tokens

    def gen(batches):
        for pdf in batches:
            ids: list = []
            ws: list = []
            occ: list = []
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                toks = py_tokens(text)
                m = len(toks) - n + 1
                if m <= 0:
                    continue
                cnt = Counter(
                    int(hashlib.md5(
                        " ".join(toks[i:i + n]).encode()
                    ).hexdigest()[:15], 16)
                    for i in range(m)
                )
                ids.extend([doc_id] * len(cnt))
                ws.extend(cnt.keys())
                occ.extend(cnt.values())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=object),
                    "win": pd.Series(ws, dtype="int64"),
                    "occ": pd.Series(occ, dtype="int64"),
                },
                columns=["doc_id", "win", "occ"],
            )

    return docs.select(
        F.col(doc_id_col).cast("string").alias(doc_id_col), text_col
    ).mapInPandas(gen, schema="doc_id string, win bigint, occ bigint")


def dup_window_coverage(docs: DataFrame, n: int = DUP_WINDOW_TOKENS,
                        doc_id_col: str = "doc_id",
                        text_col: str = "text",
                        vectorized: bool = True) -> DataFrame:
    """Per-document cross-corpus duplication signal: the fraction of the
    doc's n-token windows that also occur in at least one OTHER document
    (plus the distinct shared-window count). Doc-level MinHash finds
    whole-document near-copies; THIS finds shared boilerplate runs inside
    otherwise-distinct documents — the signal exact-substring dedup cuts
    on, at window granularity (window-fraction, not merged-interval
    character coverage: the ranking is the same and the aggregation needs
    no interval union).

    Scale shape: one window explode, windows immediately collapsed to a
    60-bit md5-prefix integer so every downstream shuffle carries
    (doc_id, bigint) instead of a ~50-char string -> per-(doc, window)
    counts [shuffle 1] -> per-window distinct-doc counts over the distinct
    (doc, window) pairs [shuffle 2, shared-vocabulary-sized] -> hash join
    back on window hash -> per-doc rollup [shuffle 3]. Nothing is
    pairwise; an md5 collision would need ~2^30 distinct shared windows
    per partition-of-interest (birthday bound) and is deterministic and
    engine-identical anyway, so the oracle stays bit-exact. Docs shorter
    than n tokens have no windows and emit no row.

    ``vectorized=True`` (default, r6): stage 1 runs as the Arrow Counter
    kernel (``_doc_window_counts_arrow`` — the per-(doc, window) grouping
    is doc-local, so its corpus-wide exchange disappears), and the
    per-window doc count comes from ``count(*) over (partition by win)``
    instead of the aggregate + join-back — per_doc_win rows are distinct
    per (doc, win), so the window count IS n_docs_with, and the plan
    drops from 3 exchanges + a vocabulary-sized join build side to
    exactly 2 skinny-row exchanges (win, then doc_id); the window count
    also removes the join's broadcast-vs-SMJ cliff when the vocabulary
    outgrows the broadcast threshold. Row-equal to the expression form
    (pytest) and oracle-hash unchanged."""
    from pyspark.sql.window import Window

    from .textstats import ngram_col, token_hash_col

    if vectorized:
        per_doc_win = _doc_window_counts_arrow(docs, n, doc_id_col, text_col)
        counted = per_doc_win.withColumn(
            "n_docs_with", F.count(F.lit(1)).over(Window.partitionBy("win"))
        )
        return (
            counted.groupBy("doc_id")
            .agg(
                F.sum("occ").cast("bigint").alias("n_windows"),
                F.sum(F.when(F.col("n_docs_with") > 1, F.col("occ")).otherwise(0))
                .cast("bigint").alias("dup_windows"),
                F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0))
                .cast("bigint").alias("distinct_shared_windows"),
            )
            .select(
                "doc_id", "n_windows", "dup_windows", "distinct_shared_windows",
                (F.col("dup_windows") / F.col("n_windows")).alias("dup_window_frac"),
            )
        )
    wins = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.explode(ngram_col(F.col(text_col), n)).alias("win_s"),
    ).select("doc_id", token_hash_col(F.col("win_s"), hex_chars=15).alias("win"))
    per_doc_win = wins.groupBy("doc_id", "win").agg(
        F.count(F.lit(1)).cast("bigint").alias("occ")
    )
    win_docs = per_doc_win.groupBy("win").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_with")
    )
    return (
        per_doc_win.join(win_docs, "win")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("bigint").alias("n_windows"),
            F.sum(F.when(F.col("n_docs_with") > 1, F.col("occ")).otherwise(0))
            .cast("bigint").alias("dup_windows"),
            F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0))
            .cast("bigint").alias("distinct_shared_windows"),
        )
        .select(
            "doc_id", "n_windows", "dup_windows", "distinct_shared_windows",
            (F.col("dup_windows") / F.col("n_windows")).alias("dup_window_frac"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-CLUSTER resolution: connected components over the
    near-dup pair graph, labeling every vertex with the minimum doc id
    reachable from it — the step a release pipeline runs after pair
    generation (near-dup is transitive in effect: A~B and B~C must
    collapse to ONE canonical doc even when A~C was never emitted).

    Classic distributed min-label propagation: each round every vertex
    takes the min of its own label and its neighbors' labels (one join
    per direction + a groupBy-min), converging in O(component diameter)
    rounds — near-dup clusters are shallow (stars/chains around a few
    templates), so a handful of rounds closes 10^12-scale graphs too
    (the large-star/small-star optimization of Kiveris et al. exists for
    adversarial diameters; the plan shape here is the standard one).
    Each round ends in ``localCheckpoint`` to truncate the iterative
    lineage (on a cluster: checkpoint to durable storage), and
    convergence is detected by counting changed labels (one small action
    per round). Raises after ``max_iter`` rounds instead of returning a
    silently-partial labeling.

    Returns (doc_id, cluster_id) for every vertex that appears in a pair;
    singletons never enter the graph and keep themselves as canonical by
    construction."""
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).union(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the bound; raise max_iter or switch to "
        "the large-star/small-star variant"
    )
