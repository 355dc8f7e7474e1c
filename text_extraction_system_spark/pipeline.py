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
from pyspark.sql import types as T

from . import schemas
from .operators import derive_spans as ds
from .operators import layout, restitch, structure


def _results_schema(with_structure: bool) -> T.StructType:
    fields = [
        T.StructField("doc_id", T.StringType()),
        T.StructField("needs_ocr", T.BooleanType()),
        T.StructField("parse_failures", T.ArrayType(T.StringType())),
        T.StructField("out_spans", T.ArrayType(schemas.SPAN)),
        T.StructField("plain_text", T.StringType()),
        T.StructField("pages", T.ArrayType(schemas.PAGE)),
    ]
    if with_structure:
        fields.append(T.StructField("structure", schemas.STRUCTURE))
    return T.StructType(fields)


def _extract_documents_arrow(
    docs: DataFrame,
    doc_id_col: str,
    text_col: str,
    with_structure: bool,
) -> DataFrame:
    """Arrow extraction kernel: one vectorized pass per batch running the
    per-document reference semantics (``core.oracle`` — the same module
    every correctness test pins the Catalyst path against) plus the
    engine's own structure segmentation (``structure._structure_of``, the
    function the structure pandas_udf calls). VALUE-IDENTICAL to the
    Catalyst formulation by construction and pinned row-for-row by pytest.
    Measured SLOWER than the expression pipeline (see extract_from_documents)
    — kept as the alternative engine and the runnable reference shape, not
    the default."""
    import pandas as pd

    out_schema = _results_schema(with_structure)
    cols = [f.name for f in out_schema.fields]

    def gen(batches):
        from .core import oracle

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                ex = oracle.extract(str(doc_id), text or "")
                out["doc_id"].append(ex.doc_id)
                out["needs_ocr"].append(ex.needs_ocr)
                out["parse_failures"].append(ex.parse_failures)
                out["out_spans"].append([
                    {"kind": s.kind, "text": s.text,
                     "media_ref": s.media_ref, "offset": s.offset}
                    for s in ex.out_spans
                ])
                out["plain_text"].append(ex.plain_text)
                out["pages"].append(ex.pages)
                if with_structure:
                    out["structure"].append(structure._structure_of(ex.plain_text))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()},
                columns=cols,
            )

    return docs.select(
        F.col(doc_id_col).cast("string").alias(doc_id_col), text_col
    ).mapInPandas(gen, schema=out_schema)


def extract_from_documents(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    fanout_threshold: int | None = restitch.DEFAULT_FANOUT_THRESHOLD,
    with_structure: bool = True,
    engine: str = "catalyst",
) -> DataFrame:
    """documents -> extraction results (one row per doc).

    ``engine="catalyst"`` (default): the pure-expression pipeline —
    measured FASTER than the per-document Arrow kernel (5.6-6.1 s vs
    8.0-8.8 s for 320k docs at 32 cores): the hot loop is let-bound
    JVM-side expression work, while the kernel pays python object
    construction per span. ``engine="arrow"`` runs the same semantics as
    one vectorized pass per batch (``core.oracle`` + the structure
    segmenter — the north_star's pandas/Arrow-UDF shape), pinned
    row-for-row against the expression path (tests/test_integration.py);
    it is the deployment fallback for logic Catalyst cannot express and
    the measured proof that, HERE, it can and should.

    Giant-doc routing happens HERE, on the RAW text length, not downstream
    on ``size(spans)``: a filter over the derived-spans projection gets
    collapsed/pushed by Catalyst so the span-construction HOF re-evaluates
    once for the predicate and again for the output — per branch (measured:
    the two routing filters more than doubled the restitch stage, 1.8 s ->
    4.1 s on 320k docs). ``length(text)`` is a scan-cheap upper bound:
    words <= (len+1)/2 and spans <= 2*ceil(words/8), so any doc that COULD
    exceed ``fanout_threshold`` spans satisfies len > 8*threshold - 17.
    Long-worded docs below the span threshold may still route to fanout —
    harmless, all paths are result-identical (pytest-pinned).

    derive_spans assigns sequential offsets, so density is an invariant
    here — declared statically (dense=True) rather than re-discovered with
    a per-row pass (the round-2 assembly-family bench regression)."""
    route = fanout_threshold is not None and fanout_threshold > 0
    if route:
        tlen = F.length(F.coalesce(F.col(text_col), F.lit("")))
        cutoff = 8 * fanout_threshold - 17
        # the non-space guard keeps degenerate all-space giants (zero spans)
        # on the inline path, so the fanout branch never needs its
        # empty-doc carry-through union — one fewer plan branch for the
        # downstream structure UDF to be pushed into
        has_word = F.col(text_col).rlike("[^ ]")
        giant_pred = (tlen > cutoff) & has_word
        small_docs = docs.where((tlen <= cutoff) | ~has_word)
        giant_docs = docs.where(giant_pred)

    if engine == "arrow":
        if not route:
            return _extract_documents_arrow(
                docs, doc_id_col, text_col, with_structure
            )
        small_res = _extract_documents_arrow(
            small_docs, doc_id_col, text_col, with_structure
        )
        giant = ds.derive_spans(giant_docs, doc_id_col=doc_id_col, text_col=text_col)
        giant_res = layout.assemble(
            restitch.process_spans_fanout(giant, may_have_empty=False), dense=True
        )
        if with_structure:
            giant_res = structure.with_structure(giant_res)
        return small_res.unionByName(giant_res)

    if route:
        small = ds.derive_spans(small_docs, doc_id_col=doc_id_col, text_col=text_col)
        giant = ds.derive_spans(giant_docs, doc_id_col=doc_id_col, text_col=text_col)
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
