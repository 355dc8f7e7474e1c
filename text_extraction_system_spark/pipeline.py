"""End-to-end extraction pipeline (the reference's section-3.1 lifecycle,
Spark-first).

    documents(doc_id, text)                      -- or a spans table directly
      -> derive_spans          (built-ins, SPEC section 1)
      -> process_spans         (OCR decide + stub + re-stitch; inline or
                                fan-out/fan-in for giant docs)
      -> assemble              (plain text + page table, built-ins)
      -> segment_structure     (one Arrow UDF: paragraphs/sentences/
                                sections/language/title)

Only the giant-doc branch shuffles; the hot path is a single narrow stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import derive_spans as ds
from .operators import layout, restitch, structure


def extract_from_documents(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    fanout_threshold: int | None = restitch.DEFAULT_FANOUT_THRESHOLD,
    with_structure: bool = True,
) -> DataFrame:
    """documents -> extraction results (one row per doc).

    derive_spans assigns sequential offsets, so density is an invariant
    here — declared statically (dense=True) rather than re-discovered with
    a per-row pass (the round-2 assembly-family bench regression).

    Giant-doc routing happens HERE, on the RAW text length, not downstream
    on ``size(spans)``: a filter over the derived-spans projection gets
    collapsed/pushed by Catalyst so the span-construction HOF re-evaluates
    once for the predicate and again for the output — per branch (measured:
    the two routing filters more than doubled the restitch stage, 1.8 s ->
    4.1 s on 320k docs). ``length(text)`` is a scan-cheap upper bound:
    words <= (len+1)/2 and spans <= 2*ceil(words/8), so any doc that COULD
    exceed ``fanout_threshold`` spans satisfies len > 8*threshold - 17.
    Long-worded docs below the span threshold may still route to fanout —
    harmless, both paths are result-identical (path equivalence is
    pytest-pinned)."""
    if fanout_threshold is not None and fanout_threshold > 0:
        tlen = F.length(F.coalesce(F.col(text_col), F.lit("")))
        cutoff = 8 * fanout_threshold - 17
        # the non-space guard keeps degenerate all-space giants (zero spans)
        # on the inline path, so the fanout branch never needs its
        # empty-doc carry-through union — one fewer plan branch for the
        # downstream structure UDF to be pushed into
        has_word = F.col(text_col).rlike("[^ ]")
        giant_pred = (tlen > cutoff) & has_word
        small = ds.derive_spans(
            docs.where((tlen <= cutoff) | ~has_word),
            doc_id_col=doc_id_col, text_col=text_col,
        )
        giant = ds.derive_spans(
            docs.where(giant_pred), doc_id_col=doc_id_col, text_col=text_col
        )
        stitched = restitch.process_spans_inline(small).unionByName(
            restitch.process_spans_fanout(giant, may_have_empty=False)
        )
        assembled = layout.assemble(stitched, dense=True)
        if not with_structure:
            return assembled
        return structure.with_structure(assembled)
    spans = ds.derive_spans(docs, doc_id_col=doc_id_col, text_col=text_col)
    return extract_from_spans(
        spans,
        fanout_threshold=fanout_threshold,
        with_structure=with_structure,
        dense=True,
    )


def extract_from_spans(
    spans_df: DataFrame,
    fanout_threshold: int | None = restitch.DEFAULT_FANOUT_THRESHOLD,
    with_structure: bool = True,
    dense: bool | None = None,
) -> DataFrame:
    """spans table (input_hint shape) -> extraction results.

    ``dense=None`` (default, externally-authored spans): a per-row O(S)
    probe routes each doc to the slice or offset-keyed assembly. Pass
    ``dense=True`` only when offsets are sequential 0..n-1 by construction
    (restitch preserves and re-sorts on input offsets, so the contract is
    about the INPUT spans, not about restitch)."""
    stitched = restitch.process_spans(spans_df, fanout_threshold=fanout_threshold)
    assembled = layout.assemble(stitched, dense=dense)
    if not with_structure:
        return assembled
    return structure.with_structure(assembled)


def summary(results: DataFrame) -> DataFrame:
    """Flat per-doc summary (stable schema for the driver smoke check)."""
    return results.select(
        "doc_id",
        "needs_ocr",
        F.size("parse_failures").alias("n_failures"),
        F.size("out_spans").alias("n_spans"),
        F.length("plain_text").alias("n_chars"),
        F.size("pages").alias("n_pages"),
        F.col("structure.language").alias("language"),
        F.size("structure.paragraphs").alias("n_paragraphs"),
        F.size("structure.sentences").alias("n_sentences"),
        F.size("structure.sections").alias("n_sections"),
    )
