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


def doc_shingles(docs: DataFrame, doc_id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, shingles) for docs with at least one shingle."""
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
    # let-bind the signature: band_sigs references it LSH_BANDS times, and
    # without the binding the whole minhash fold would re-run per band
    sigs = doc_shingles(docs, doc_id_col, text_col).select(
        "doc_id",
        exprutil.let(
            minhash_sig_col(F.col("shingles")), lambda sig: band_sigs_col(sig)
        ).alias("bands"),
    )
    exploded = sigs.select("doc_id", F.explode("bands").alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )
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
    from . import textstats

    # ONE let-bound expression builds (hash, n_shingles) structs and the
    # generator explodes it: naively selecting size("shingles") alongside
    # explode("shingles") lets Catalyst's project-collapse inline the whole
    # shingle construction into BOTH consumers (plus the non-empty filter) —
    # PySpark HOFs have no CSE, so the array was built 3x per row (measured
    # 5.3 s -> 1.0 s at sf0.1 for this query)
    def hash_structs(text: Column) -> Column:
        return exprutil.let(
            shingles_col(text),
            lambda sh: F.transform(
                sh,
                lambda s: F.struct(
                    textstats.token_hash_col(s).alias("h"),
                    F.size(sh).alias("n_shingles"),
                ),
            ),
        )

    tr = train.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.explode(hash_structs(F.col(text_col))).alias("e"),
    ).select("doc_id", F.col("e.h").alias("h"), F.col("e.n_shingles").alias("n_shingles"))
    ev = (
        eval_docs.select(F.explode(shingles_col(F.col(text_col))).alias("s"))
        .select(textstats.token_hash_col(F.col("s")).alias("h"))
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


def signature_rows(docs: DataFrame, doc_id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, sig, band, band_sig) — the dedup state of a corpus, as a
    plan (no materialization). Degenerate buckets are dropped (MAX_BUCKET),
    so batch joins against the rows are bounded."""
    sigs = doc_shingles(docs, doc_id_col, text_col).select(
        "doc_id",
        exprutil.let(
            minhash_sig_col(F.col("shingles")),
            lambda sig: F.struct(sig.alias("sig"), band_sigs_col(sig).alias("bands")),
        ).alias("sb"),
    )
    exploded = sigs.select(
        "doc_id", F.col("sb.sig").alias("sig"), F.explode("sb.bands").alias("b")
    ).select(
        "doc_id", "sig",
        F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"),
    )
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
    # the batch is by definition the small side (a day's arrivals vs the
    # whole committed corpus): broadcast it so the committed table is never
    # shuffled, and — against the persisted table — so dynamic partition
    # pruning can drop committed partitions outside the batch's
    # (band, sig_prefix) key set before any signature file is read
    # (spark's DPP is broadcast-reuse-only by default)
    cand = (
        F.broadcast(batch).join(old, keys)
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
