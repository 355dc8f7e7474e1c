"""ANN quality goldens — round-2 verdict item 5.

The approximate paths (multi-probe SRP-LSH, IVF) are deterministic and
plan-correct, but nothing pinned their *neighbor quality*: a toy-parameter
ANN returning junk would still hash-match its own oracle. These floors pin
recall@5 against the exact brute-force top-k on the sf0.01 corpus (weak
neighbors — top-5 cosines 0.25-0.49, the hard regime for LSH), measured
first, asserted just below:

  * LSH radius-0 (single-key) recall measured 0.09 -> multi-probe radius 2
    lifts it to a measured 0.74; floor 0.60.
  * IVF (64 cells, probe 8) recall measured 1.00; floor 0.90.

Reference analog: the golden accuracy thresholds camelot is held to in
``data_extract/camelot/camelot.py:63,79``.
"""

from __future__ import annotations

import pytest

from text_extraction_system_spark.operators import similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_pairs(emb):
    rows = similarity.brute_force_topk(emb).collect()
    return {(r["query_id"], r["cand_id"]) for r in rows}


def _recall(approx_df, exact_pairs) -> float:
    approx = {(r["query_id"], r["cand_id"]) for r in approx_df.collect()}
    return len(exact_pairs & approx) / len(exact_pairs)


def test_lsh_multiprobe_recall_floor(emb, exact_pairs):
    rec = _recall(similarity.srp_lsh_topk(emb), exact_pairs)
    assert rec >= 0.60, f"multi-probe LSH recall@5 degraded to {rec:.2f}"


def test_lsh_multiprobe_beats_single_key(emb, exact_pairs):
    """The probe expansion must actually be doing the lifting: radius 0
    (single-key) recall is far below the multi-probe floor on this corpus."""
    r0 = _recall(similarity.srp_lsh_topk(emb, multiprobe=0), exact_pairs)
    r2 = _recall(similarity.srp_lsh_topk(emb), exact_pairs)
    assert r2 > r0 + 0.2, f"radius-2 {r2:.2f} vs radius-0 {r0:.2f}"


def test_ivf_recall_floor(emb, exact_pairs):
    """Hash-centroid IVF (the bit-exact oracle twin). NOTE: on this corpus
    its assignment is degenerate (every vector in one cell — far hash
    centroids reduce argmin to |c|^2), so probing that cell scans the whole
    corpus: recall 1.0 with zero pruning. The floor only pins that the plan
    returns the true neighbors when nothing is pruned; the REAL recall/scan
    trade-off lives in the trained path below."""
    rec = _recall(similarity.ivf_topk(emb), exact_pairs)
    assert rec >= 0.90, f"IVF recall@5 degraded to {rec:.2f}"


@pytest.fixture(scope="module")
def trained(emb):
    return similarity.ivf_train(emb, iters=5)


def test_trained_ivf_actually_partitions(spark, emb, trained):
    """Forgy-seeded Lloyd training produces a real quantizer: occupancy
    spread over many cells with no degenerate catch-all (measured: all 64
    cells used, max 14/500 vectors)."""
    occ = {
        r["cell"]: r["count"]
        for r in similarity.assign_cells_vectorized(emb, centroids=trained)
        .groupBy("cell").count().collect()
    }
    assert len(occ) >= 32, f"only {len(occ)} cells occupied"
    assert max(occ.values()) <= 0.10 * sum(occ.values())


def test_trained_ivf_recall_vs_probes(emb, exact_pairs, trained):
    """The real ANN property: recall rises with probes while scanning a
    bounded corpus fraction (measured 0.60/0.86/0.92 at probe 1/8/16, probe 8
    scanning ~12.5%). Floors just below measured; monotonicity exact."""
    r1 = _recall(similarity.ivf_topk(emb, n_probe=1, centroids=trained), exact_pairs)
    r8 = _recall(similarity.ivf_topk(emb, n_probe=8, centroids=trained), exact_pairs)
    r16 = _recall(similarity.ivf_topk(emb, n_probe=16, centroids=trained), exact_pairs)
    assert r1 <= r8 <= r16, (r1, r8, r16)
    assert r1 >= 0.50 and r8 >= 0.80 and r16 >= 0.88, (r1, r8, r16)


def test_probe_budget_ordering_and_graceful_degradation(emb, exact_pairs):
    """Probe masks come in increasing Hamming distance (lexicographic within
    a distance), so a budget spends its keys on the nearest buckets first:
    budget=1 == single-key lookup, budget=9 (distance <= 1) sits between it
    and the full 37, and the full budget keeps the recall floor."""
    masks = similarity._probe_masks(8, 2)
    assert masks[0] == ()
    assert masks[1:9] == [(b,) for b in range(8)]
    assert len(masks) == 37 and all(len(m) == 2 for m in masks[9:])
    assert similarity._probe_masks(8, 2, budget=9) == masks[:9]

    r_full = _recall(similarity.srp_lsh_topk(emb), exact_pairs)
    r_d1 = _recall(similarity.srp_lsh_topk(emb, probe_budget=9), exact_pairs)
    r_1 = _recall(similarity.srp_lsh_topk(emb, probe_budget=1), exact_pairs)
    r_single = _recall(similarity.srp_lsh_topk(emb, multiprobe=0), exact_pairs)
    assert r_1 == r_single  # budget=1 degenerates to the exact bucket
    assert r_1 <= r_d1 <= r_full, (r_1, r_d1, r_full)
    assert r_full >= 0.60


def test_pq_adc_shortlist_recall_curve(spark):
    """PQ quality pins: pure-ADC ranking is weak on the weak-neighbor sf
    corpus (quantization error vs tiny true-neighbor gaps), but the
    deployment shape — ADC shortlist + exact re-rank — recovers exact
    top-5 as the shortlist grows; the curve must stay above defensive
    floors, and rerank-mode output must contain exactly the exact-cosine
    ordering of the shortlist."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = similarity.pq_train(emb)
    assert len(books) == similarity.PQ_BLOCKS
    assert all(len(b) == similarity.PQ_CENTROIDS for b in books)

    exact = {}
    for r in similarity.brute_force_topk(emb, n_queries=20, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["cand_id"])

    def coverage(L):
        got = {}
        for r in similarity.pq_topk(emb, books, n_queries=20, k=L).collect():
            got.setdefault(r["query_id"], set()).add(r["cand_id"])
        return sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)

    c20, c100 = coverage(20), coverage(100)
    assert c20 >= 0.4, c20          # measured 0.51
    assert c100 >= 0.8, c100        # measured 0.89
    assert c100 >= c20              # coverage grows with the shortlist

    rr = {}
    for r in similarity.pq_topk(emb, books, n_queries=20, k=5,
                                rerank=100).collect():
        rr.setdefault(r["query_id"], set()).add(r["cand_id"])
    rec = sum(len(rr[q] & exact[q]) / 5 for q in exact) / len(exact)
    assert rec >= 0.8, rec          # rerank recall == shortlist coverage


def test_ivf_pq_composition_consistency(spark):
    """IVF-PQ sanity: probing EVERY coarse cell degenerates to pure PQ ADC
    (identical rows — routing only restricts, never rescores), and the
    default 8-probe serving keeps a usable fraction of the pure-ADC top-5
    while scanning a fraction of the corpus."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_train(emb, iters=2)
    books = similarity.pq_train(emb, iters=2)

    def snap(df):
        return {(r["query_id"], r["cand_id"], r["rank"],
                 f"{r['adc_dist']:.17g}") for r in df.collect()}

    allp = snap(similarity.ivf_pq_topk(emb, cents, books,
                                       n_probe=similarity.IVF_CENTROIDS))
    pure = snap(similarity.pq_topk(emb, books))
    assert allp == pure and allp

    probed = {}
    for r in similarity.ivf_pq_topk(emb, cents, books).collect():
        probed.setdefault(r["query_id"], set()).add(r["cand_id"])
    pure_by_q = {}
    for q, c, _r, _d in pure:
        pure_by_q.setdefault(q, set()).add(c)
    overlap = sum(len(probed.get(q, set()) & cs) / len(cs)
                  for q, cs in pure_by_q.items()) / len(pure_by_q)
    assert overlap >= 0.5, overlap  # 8 of 64 cells keeps most ADC winners
