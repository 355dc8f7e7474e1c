"""Training-data curation funnel — the composition the individual operators
exist for: language gate -> quality gate -> token budget -> exact dedup ->
per-source accounting. One narrow pass computes every per-doc signal
(Catalyst expressions shared with the lang_id / quality / token_count /
exact_dedup operators), then two small aggregates produce the funnel report.

Scale shape: signals are per-row expressions over the scan (no shuffle);
the only shuffles are the content-hash canonicalization (hash keys, uniform)
and the per-source rollup (tiny). Conditional aggregation gives every funnel
stage's count in the same pass — no per-stage jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats

KEEP_LANG = "en"
MIN_QUALITY = 0.3
MIN_TOKENS = 20
MAX_TOKENS = 80


def doc_signals(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc curation signals in one narrow pass; ``extra_cols``
    pass through untouched (e.g. the ingest timestamp in the streaming twin).

    ONE tokenization feeds every signal: the signals are built as a single
    let-bound struct and surfaced through ``explode(array(struct))`` — a
    Generate node is a projection-collapse BARRIER, so downstream field
    extractions read the materialized struct instead of inlining (and
    re-evaluating) the whole expression per consumer. The naive per-column
    projection re-ran tokens_col ~15x per row (12 stopword tables + the
    quality and count signals)."""
    from .exprutil import let

    def signals(toks) -> F.Column:
        q = textstats.quality_cols_from_tokens(toks, F.col("text"))
        return F.struct(
            textstats.detect_language_from_tokens(toks, F.col("text")).alias(
                "language"
            ),
            F.size(toks).cast("bigint").alias("n_tokens"),
            q["quality_score"].alias("quality_score"),
        )

    with_sig = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
        F.col("lang").alias("declared_lang"),
        F.md5("text").alias("content_hash"),
        F.col("text"),
        *extra_cols,
        F.explode(F.array(let(textstats.tokens_col(F.col("text")), signals))).alias(
            "sig"
        ),
    )
    return with_sig.select(
        "doc_id",
        "source",
        "declared_lang",
        F.col("sig.language").alias("language"),
        F.col("sig.n_tokens").alias("n_tokens"),
        F.col("sig.quality_score").alias("quality_score"),
        "content_hash",
        *extra_cols,
    )


def gates(
    lang: str = KEEP_LANG,
    min_quality: float = MIN_QUALITY,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
) -> dict:
    """The funnel's gate columns over doc_signals output — the single
    definition shared by the batch funnel's stage flags and the streaming
    keep predicate. Language gate = declared metadata AND content detection
    agree (mislabeled-crawl noise drops here)."""
    return {
        "lang_ok": (F.col("declared_lang") == lang) & (F.col("language") == lang),
        "q_ok": F.col("quality_score") >= min_quality,
        "tok_ok": F.col("n_tokens").between(min_tokens, max_tokens),
    }


def keep_predicate(
    lang: str = KEEP_LANG,
    min_quality: float = MIN_QUALITY,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
):
    """AND of all gates (shared batch/streaming)."""
    g = gates(lang, min_quality, min_tokens, max_tokens)
    return g["lang_ok"] & g["q_ok"] & g["tok_ok"]


def funnel(
    docs: DataFrame,
    lang: str = KEEP_LANG,
    min_quality: float = MIN_QUALITY,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
) -> DataFrame:
    """Per-source funnel report: docs entering, surviving each gate in
    sequence, surviving exact dedup, and the token budget kept."""
    s = doc_signals(docs)
    g = gates(lang, min_quality, min_tokens, max_tokens)
    flagged = s.select(
        "*",
        g["lang_ok"].alias("lang_ok"),
        g["q_ok"].alias("q_ok"),
        g["tok_ok"].alias("tok_ok"),
    )
    kept = flagged.where("lang_ok AND q_ok AND tok_ok")
    # one-pass exact dedup: min-doc_id row per content_hash via a window —
    # the groupBy + self-join form evaluated the signal pass once per join
    # branch (see the identical change in the release-manifest query)
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash").orderBy("doc_id")
    surv = (
        kept.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    stages = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).alias("n_lang"),
        F.sum(F.when(F.col("lang_ok") & F.col("q_ok"), 1).otherwise(0)).alias(
            "n_quality"
        ),
        F.sum(
            F.when(F.col("lang_ok") & F.col("q_ok") & F.col("tok_ok"), 1).otherwise(0)
        ).alias("n_tokens_ok"),
    )
    survived = surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_deduped"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        stages.join(survived, "source", "left")
        .na.fill({"n_deduped": 0, "tokens_kept": 0})
        .select(
            "source",
            "n_input",
            "n_lang",
            "n_quality",
            "n_tokens_ok",
            "n_deduped",
            "tokens_kept",
        )
    )
