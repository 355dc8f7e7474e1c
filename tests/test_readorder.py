"""Column detection + reading-order reconstruction (core.readorder +
operators/readorder_op)."""

from __future__ import annotations

import numpy as np

from text_extraction_system_spark.core import readorder as R


def test_column_spans_merge_and_split():
    # two columns: words at x 0-50ish and 400-450ish; intra gaps < 20
    x = np.array([0.0, 30.0, 400.0, 430.0])
    w = np.array([25.0, 20.0, 25.0, 20.0])
    spans = R.column_spans(x, w)
    assert len(spans) == 2
    assert spans[0] == (0.0, 50.0) and spans[1] == (400.0, 450.0)


def test_reading_order_two_columns():
    """Row-major visual positions must come back column-major."""
    # col 0: (0,0)"a" (0,20)"b"; col 1: (400,0)"c" (400,20)"d"
    words = np.array(["a", "c", "b", "d"], dtype=object)
    x = np.array([0.0, 400.0, 0.0, 400.0])
    y = np.array([0.0, 0.0, 20.0, 20.0])
    w = np.array([10.0, 10.0, 10.0, 10.0])
    order = R.reading_order(x, y, w)
    assert list(words[order]) == ["a", "b", "c", "d"]
    assert R.n_columns(x, w) == 2


def test_reading_order_single_column_rowwise():
    x = np.array([0.0, 40.0, 0.0])
    y = np.array([0.0, 0.0, 20.0])
    w = np.array([30.0, 30.0, 30.0])   # gap 10 < 20 -> one column
    order = R.reading_order(x, y, w)
    assert list(order) == [0, 1, 2]
    assert R.n_columns(x, w) == 1


def test_empty_page():
    assert R.n_columns(np.array([]), np.array([])) == 0
    assert len(R.reading_order(np.array([]), np.array([]), np.array([]))) == 0


def test_operator_recovers_scrambled_tokens(spark):
    """End-to-end: scrambled synthetic word boxes -> exact token sequence
    (the oracle's contract, checked here against the raw tokens directly)."""
    from text_extraction_system_spark.operators import readorder_op, textstats
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {
        r["doc_id"]: (r["reconstructed"], r["n_columns"])
        for r in readorder_op.reconstruct_reading_order(
            readorder_op.synth_word_boxes(docs)
        ).collect()
    }
    exp = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.array_join(textstats.tokens_col(F.col("text")), " ").alias("t"),
        ).collect()
    }
    assert len(got) == 50
    n_multi = 0
    for doc_id, (text, ncols) in got.items():
        assert text == exp[doc_id], doc_id
        assert 1 <= ncols <= 3
        n_multi += ncols > 1
    assert n_multi > 0  # the corpus actually exercises multi-column pages
