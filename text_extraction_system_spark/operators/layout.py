"""Plain-text assembly + page table — pure built-ins (SURVEY.md W5/W6).

Reference semantics: paragraphs end with '\\n', pages end with '\\n\\f'
(``PDFToTextWithCoordinates.java:581-582``); per-page char ranges accumulate
as text is written (``startPage`` Java :86-89, location array :535-543).

Page p owns spans with original offset in [PAGE_SPANS*p, PAGE_SPANS*(p+1)).
Page text = '\\n'.join(non-empty span texts) + '\\n\\f'. Page char bounds are
a running sum over page text lengths — computed with ``aggregate`` over the
page array, still JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import spec


def page_texts_col(out_spans: Column, dense: bool | None = None) -> Column:
    """array<string>: assembled text of each page (with separators).

    Fast path: when offsets are dense 0..n-1 and offset-ordered (always true
    for engine-derived spans — derive_spans assigns sequential offsets and
    restitch re-sorts on them), page ``p`` is exactly the contiguous slice
    ``[p*PAGE_SPANS+1, PAGE_SPANS]`` — O(S) total instead of the per-page
    filter's O(n_pages × S), which is quadratic for a giant doc (10^5 spans
    -> ~2.5e9 comparisons in one task). Externally-authored spans with gaps
    or out-of-order offsets (e.g. an intentionally empty leading page) take
    the offset-keyed filter path, matching core/oracle.assemble's offset
    semantics exactly.

    ``dense`` declares the offset-density invariant STATICALLY:
      * ``True``  — offsets are dense by construction (derive_spans output);
        emit only the slice path, no per-row check. This is the hot path:
        the runtime check costs a full extra zip_with+forall pass over
        ``out_spans`` per row, which round 2's driver bench showed as a
        20-70% regression across every assembly-family query.
      * ``False`` — known-sparse; emit only the offset-keyed path.
      * ``None``  — unknown provenance (external spans tables, the
        input_hint shape): one O(S) runtime density probe per row picks
        the path. Correct for anything, slower than a static contract."""
    from .exprutil import let

    n_pages = (F.element_at(out_spans, -1)["offset"] / spec.PAGE_SPANS).cast("int") + 1
    pages_idx = F.when(
        F.size(out_spans) > 0, F.sequence(F.lit(0), n_pages - 1)
    ).otherwise(F.array().cast("array<int>"))

    def page_end(body: Column) -> Column:
        # F5 null-char scrub on the assembled text (data_extract.py:113-114);
        # applied after the join so a NUL-only span keeps its separator slot
        return F.concat(F.translate(body, "\x00", ""), F.lit(spec.PAGE_END))

    # project the text field ONCE (let-bound): per-page slices then copy
    # PAGE_SPANS string refs instead of PAGE_SPANS full span structs
    def dense_pages(texts: Column) -> Column:
        def page_text(p: Column) -> Column:
            in_page = F.filter(
                F.slice(texts, p * spec.PAGE_SPANS + 1, spec.PAGE_SPANS),
                lambda t: t != "",
            )
            return page_end(F.array_join(in_page, spec.PARAGRAPH_SEP))

        return F.transform(pages_idx, page_text)

    def keyed_pages() -> Column:
        def page_text(p: Column) -> Column:
            in_page = F.filter(
                out_spans,
                lambda s: (s["text"] != "")
                & (F.floor(s["offset"] / spec.PAGE_SPANS).cast("int") == p),
            )
            return page_end(
                F.array_join(F.transform(in_page, lambda s: s["text"]), spec.PARAGRAPH_SEP)
            )

        return F.transform(pages_idx, page_text)

    if dense is True:
        return let(F.transform(out_spans, lambda s: s["text"]), dense_pages)
    if dense is False:
        return keyed_pages()

    is_dense = F.forall(
        F.zip_with(
            out_spans,
            F.sequence(F.lit(0), F.greatest(F.size(out_spans), F.lit(1)) - 1),
            lambda s, i: s["offset"] == i,
        ),
        lambda b: b,
    )
    return F.when(
        is_dense, let(F.transform(out_spans, lambda s: s["text"]), dense_pages)
    ).otherwise(keyed_pages())


def plain_text_col(page_texts: Column) -> Column:
    return F.array_join(page_texts, "")


def pages_col(page_texts: Column) -> Column:
    """array<struct<number,start,end,bbox,rotation>> with running char offsets
    (dto.py:87-98). bbox fixed US-Letter, rotation 0 for derived docs."""
    # running-sum fold: acc = (pages_so_far, pos)
    zero = F.struct(
        F.array().cast(
            "array<struct<number:int,start:int,end:int,bbox:array<float>,rotation:int>>"
        ).alias("pages"),
        F.lit(0).alias("pos"),
    )

    def step(acc: Column, t: Column) -> Column:
        end = acc["pos"] + F.length(t)
        page = F.struct(
            F.size(acc["pages"]).alias("number"),
            acc["pos"].cast("int").alias("start"),
            end.cast("int").alias("end"),
            F.array(F.lit(0.0), F.lit(0.0), F.lit(612.0), F.lit(792.0))
            .cast("array<float>")
            .alias("bbox"),
            F.lit(0).alias("rotation"),
        )
        return F.struct(
            F.concat(acc["pages"], F.array(page)).alias("pages"),
            end.cast("int").alias("pos"),
        )

    return F.aggregate(page_texts, zero, step, lambda acc: acc["pages"])


def assemble(stitched: DataFrame, dense: bool | None = None) -> DataFrame:
    """(doc_id, needs_ocr, parse_failures, out_spans) -> + (plain_text, pages).

    ``dense`` is the static offset-density contract forwarded to
    ``page_texts_col`` — pass True when the spans were engine-derived."""
    with_pages = stitched.withColumn(
        "_page_texts", page_texts_col(F.col("out_spans"), dense=dense)
    )
    return with_pages.select(
        "doc_id",
        "needs_ocr",
        "parse_failures",
        "out_spans",
        plain_text_col(F.col("_page_texts")).alias("plain_text"),
        pages_col(F.col("_page_texts")).alias("pages"),
    )
