"""Archetype corpus (FIXTURES.md section 3) through the full pipeline vs the
oracle — including OCR-decision polarity, failure capture, empty docs, and
the giant-skew doc through the fanout path."""

from __future__ import annotations

import pytest

from text_extraction_system_spark import pipeline, synth
from text_extraction_system_spark.core import oracle


@pytest.fixture(scope="module")
def archetype_results(spark):
    df = synth.corpus_df(spark)
    res = pipeline.extract_from_spans(df, fanout_threshold=256)
    return {r["doc_id"]: r.asDict(recursive=True) for r in res.collect()}


@pytest.fixture(scope="module")
def archetype_oracle():
    out = {}
    for doc_id, spans in synth.corpus():
        in_spans = [
            oracle.Span(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
        ]
        out[doc_id] = oracle.extract_spans(doc_id, in_spans)
    return out


def test_span_equality_all_archetypes(archetype_results, archetype_oracle):
    for doc_id, exp in archetype_oracle.items():
        got = archetype_results[doc_id]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["out_spans"]]
        exp_spans = [(s.kind, s.text, s.media_ref, s.offset) for s in exp.out_spans]
        assert got_spans == exp_spans, doc_id
        assert got["plain_text"] == exp.plain_text, doc_id
        assert got["needs_ocr"] == exp.needs_ocr, doc_id
        assert got["parse_failures"] == exp.parse_failures, doc_id


def test_ocr_polarity(archetype_oracle):
    """media_heavy docs must fire OCR; text_heavy must not (reference:
    test_pdf.py:14-24 positive/negative predicate cases)."""
    assert archetype_oracle["mediaheavy_0"].needs_ocr is True
    assert archetype_oracle["textheavy_0"].needs_ocr is False


def test_media_heavy_gets_ocr_text(archetype_results):
    got = archetype_results["mediaheavy_0"]
    media_texts = [s["text"] for s in got["out_spans"] if s["kind"] == "media"]
    assert media_texts and all(t != "" for t in media_texts)


def test_corrupt_doc_failure_codes(archetype_results):
    got = archetype_results["corrupt_0"]
    assert got["parse_failures"] == ["bad_media_ref:1"]
    # corrupt media contributes no text but keeps its place in the sequence
    kinds = [s["kind"] for s in got["out_spans"]]
    assert kinds == ["text", "media", "text"]
    assert got["out_spans"][1]["text"] == ""


def test_nine_pages_markers(archetype_results):
    got = archetype_results["ninepages_0"]
    assert len(got["pages"]) == 9
    for p in range(9):
        page = got["pages"][p]
        page_text = got["plain_text"][page["start"]: page["end"]]
        assert f"This is page {p + 1}." in page_text
        for q in range(9):
            if q != p:
                assert f"This is page {q + 1}." not in page_text


def test_structured_counts(archetype_results):
    """Reference-style golden counts (test_data_extract.py:30-41 analog)."""
    st = archetype_results["structured_0"]["structure"]
    assert len(st["paragraphs"]) == 5
    # 18: numbered headings split after 'N. ' plus 3+5+6 body sentences
    assert len(st["sentences"]) == 18
    assert len(st["sections"]) == 3
    assert st["sections"][0]["title"] == "INTRODUCTION TO SORTING"
    assert [s["level"] for s in st["sections"]] == [1, 1, 2]
    # section end assignment: sec1 ends where sec2 starts; sec2.1 runs to EOF
    assert st["sections"][0]["end"] == st["sections"][1]["start"]


def test_lang_samples(archetype_results):
    for lang in ("en", "de", "es", "fr", "zh"):
        assert archetype_results[f"lang_{lang}"]["structure"]["language"] == lang


def test_empty_doc(archetype_results):
    got = archetype_results["empty_0"]
    assert got["plain_text"] == ""
    assert got["out_spans"] == []
    assert got["pages"] == []


def test_giant_skew_fanout(archetype_results, archetype_oracle):
    """2000-span doc exceeds the fanout threshold -> explode/gather path."""
    got = archetype_results["giant_0"]
    exp = archetype_oracle["giant_0"]
    assert len(got["out_spans"]) == 2000
    assert got["plain_text"] == exp.plain_text


def test_giant_doc_assembly_is_linear(spark):
    """10^5-span doc assembles in bounded time — pins the F.slice page
    assembly (layout.page_texts_col). The previous per-page filter was
    O(n_pages x n_spans): ~2.5e9 comparisons for this doc (minutes); the
    slice-based assembly is O(n_spans) and finishes in seconds."""
    import time

    from pyspark.sql import functions as F

    from text_extraction_system_spark.core import spec
    from text_extraction_system_spark.operators import layout, restitch

    n = 100_000
    df = spark.range(1).select(
        F.lit("giantperf").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("w"), i.cast("string")).alias("text"),
                F.lit("").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    t0 = time.monotonic()
    row = layout.assemble(restitch.process_spans(df, fanout_threshold=None)).collect()[0]
    elapsed = time.monotonic() - t0
    assert len(row["pages"]) == n // spec.PAGE_SPANS
    assert row["pages"][-1]["end"] == len(row["plain_text"])
    assert elapsed < 60, f"giant-doc assembly took {elapsed:.1f}s — quadratic regression?"


def test_fanout_keeps_empty_docs(spark):
    """Forced-fanout path must not drop zero-span docs (explode eliminates
    the row unless they are carried through explicitly)."""
    df = synth.corpus_df(spark)
    res = pipeline.extract_from_spans(df, fanout_threshold=0)
    rows = {r["doc_id"]: r for r in res.collect()}
    assert rows["empty_0"]["out_spans"] == []
    assert rows["empty_0"]["plain_text"] == ""
    assert len(rows) == df.count()


def test_sparse_offsets_keep_page_semantics(spark):
    """Spans with offset gaps (an intentionally empty leading page) must land
    on the page their OFFSET names, exactly like core/oracle.assemble — the
    slice fast path only applies to dense offset sequences."""
    from pyspark.sql import Row

    spans = [
        Row(kind="text", text="page one a", media_ref="", offset=4),
        Row(kind="text", text="page one b", media_ref="", offset=5),
    ]
    df = spark.createDataFrame([Row(doc_id="sparse_0", spans=spans)])
    res = pipeline.extract_from_spans(df, with_structure=False).collect()[0]
    exp = oracle.extract_spans(
        "sparse_0",
        [
            oracle.Span("text", "page one a", "", 4),
            oracle.Span("text", "page one b", "", 5),
        ],
    )
    assert res["plain_text"] == exp.plain_text == "\n\fpage one a\npage one b\n\f"
    assert len(res["pages"]) == 2
    assert [(p["start"], p["end"]) for p in res["pages"]] == [
        (p["start"], p["end"]) for p in exp.pages
    ]


def test_null_char_scrub(spark):
    """F5: NUL chars never reach the assembled plain text (reference
    data_extract.py:113-114); page offsets stay consistent, and the Spark
    path matches the python oracle byte-for-byte."""
    from pyspark.sql import Row

    spans = [
        Row(kind="text", text="abc\x00def", media_ref="", offset=0),
        Row(kind="text", text="\x00", media_ref="", offset=1),
    ]
    df = spark.createDataFrame([Row(doc_id="nul_0", spans=spans)])
    res = pipeline.extract_from_spans(df, fanout_threshold=None).collect()[0]
    exp = oracle.extract_spans(
        "nul_0",
        [oracle.Span("text", "abc\x00def", "", 0), oracle.Span("text", "\x00", "", 1)],
    )
    assert "\x00" not in res["plain_text"]
    assert res["plain_text"] == exp.plain_text == "abcdef\n\n\f"
    assert res["pages"][0]["end"] == len(res["plain_text"])


def test_language_override(spark):
    """Reference two_langs semantics: forcing the doc language makes every
    segment report it (test_data_extract.py:44-57)."""
    from text_extraction_system_spark.operators import structure as structure_op
    from text_extraction_system_spark.operators import layout, restitch

    df = synth.corpus_df(spark).where("doc_id = 'twolangs_0'")
    assembled = layout.assemble(restitch.process_spans(df))
    res = structure_op.with_structure(assembled, force_language="de").collect()[0]
    st = res["structure"]
    assert st["language"] == "de"
    assert all(p["language"] == "de" for p in st["paragraphs"])
    assert all(s["language"] == "de" for s in st["sentences"])


def test_cumsum_capacity_guard(spark):
    """Over-capacity inputs raise instead of silently corrupting prefix
    sums: the Hillis-Steele unroll covers 2^n_passes elements and not one
    more (layout._cumsum_col guard)."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException, PythonException

    from text_extraction_system_spark.operators import layout

    def scan(n, passes):
        arr = F.sequence(F.lit(1), F.lit(n))
        return spark.range(1).select(
            layout._cumsum_col(arr, n_passes=passes).alias("s")
        ).collect()[0]["s"]

    assert scan(8, 3) == [sum(range(1, k + 1)) for k in range(1, 9)]
    with pytest.raises(Exception, match="capacity exceeded"):
        scan(9, 3)
