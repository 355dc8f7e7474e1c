"""End-to-end parity: Spark pipeline == single-threaded Python oracle.

This is the rebuild's rendition of the reference's golden-assertion test
style (SURVEY.md section 5): span-sequence equality (kind, text, media_ref,
order) per doc_id plus structure equality, on the deterministic corpus.
"""

from __future__ import annotations

import pytest

from text_extraction_system_spark import pipeline
from text_extraction_system_spark.core import oracle


@pytest.fixture(scope="module")
def spark_results(spark, docs_df):
    res = pipeline.extract_from_documents(docs_df)
    return {r["doc_id"]: r.asDict(recursive=True) for r in res.collect()}


@pytest.fixture(scope="module")
def oracle_results(docs_rows):
    return {d: oracle.extract(d, t) for d, t in docs_rows}


def test_row_counts(spark_results, oracle_results):
    assert len(spark_results) == len(oracle_results) == 500


def test_span_sequence_equality(spark_results, oracle_results):
    """The north-rule invariant."""
    for doc_id, exp in oracle_results.items():
        got = spark_results[doc_id]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["out_spans"]]
        exp_spans = [(s.kind, s.text, s.media_ref, s.offset) for s in exp.out_spans]
        assert got_spans == exp_spans, f"span mismatch for doc {doc_id}"


def test_needs_ocr_and_plain_text(spark_results, oracle_results):
    n_ocr = 0
    for doc_id, exp in oracle_results.items():
        got = spark_results[doc_id]
        assert got["needs_ocr"] == exp.needs_ocr, doc_id
        assert got["plain_text"] == exp.plain_text, doc_id
        n_ocr += int(exp.needs_ocr)
    # corpus sanity: both branches actually exercised
    assert 0 < n_ocr < len(oracle_results)


def test_pages(spark_results, oracle_results):
    for doc_id, exp in oracle_results.items():
        got_pages = [
            {k: v for k, v in p.items()} for p in spark_results[doc_id]["pages"]
        ]
        assert got_pages == exp.pages, doc_id


def test_structure(spark_results, oracle_results):
    for doc_id, exp in oracle_results.items():
        st = spark_results[doc_id]["structure"]
        assert st["language"] == exp.language, doc_id
        assert st["title"] == exp.title, doc_id
        assert st["paragraphs"] == exp.paragraphs, doc_id
        assert st["sentences"] == exp.sentences, doc_id


def test_span_texts_contain_no_separator_chars(spark, docs_df):
    """Corpus invariant the paragraph/sentence oracle SQL relies on: span
    texts never contain the paragraph/page separator chars (\\n, \\f) or NUL,
    so 'one non-empty span == one paragraph' holds. Checked over the derived
    spans AND the OCR'd output spans."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import derive_spans as ds
    from text_extraction_system_spark.operators import restitch

    out = restitch.process_spans(ds.derive_spans(docs_df))
    bad = out.select(
        F.exists(
            "out_spans",
            lambda s: s["text"].contains("\n")
            | s["text"].contains("\f")
            | s["text"].contains("\x00"),
        ).alias("bad")
    ).where("bad")
    assert bad.count() == 0


def test_inline_equals_fanout(spark, docs_df, oracle_results):
    """Both physical strategies must produce identical logical results
    (reference J1-J3 chord == our shuffle gather)."""
    res = pipeline.extract_from_documents(
        docs_df.limit(50), fanout_threshold=0, with_structure=False
    )
    rows = res.collect()
    # fanout must not silently drop docs (e.g. zero-span docs eliminated
    # by explode): every input doc comes back.
    assert len(rows) == docs_df.limit(50).count()
    for r in rows:
        exp = oracle_results[r["doc_id"]]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["out_spans"]]
        exp_spans = [(s.kind, s.text, s.media_ref, s.offset) for s in exp.out_spans]
        assert got_spans == exp_spans
        assert r["plain_text"] == exp.plain_text
