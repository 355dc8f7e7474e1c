"""Physical-plan shape assertions — the 100 TB posture, enforced by tests.

These pin the properties that make the engine scale, so a refactor that
silently adds a shuffle or breaks column pruning fails CI:

* column pruning reaches the parquet scan (ReadSchema carries only used cols)
* the inline extraction path is shuffle-free (no Exchange)
* dimension joins broadcast (BroadcastHashJoin, no SortMergeJoin)
* the fanout path shuffles exactly once (the doc_id gather)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from text_extraction_system_spark import pipeline
from text_extraction_system_spark.operators import derive_spans as ds
from text_extraction_system_spark.operators import restitch

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ds.derive_spans(docs))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    # unused columns must not be read
    assert "lang" not in read_schema and "source" not in read_schema


def test_inline_path_is_shuffle_free(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spans = ds.derive_spans(docs)
    assembled = pipeline.extract_from_spans(
        spans, fanout_threshold=None, with_structure=False
    )
    plan = _plan(assembled)
    assert "Exchange" not in plan, plan


def test_fanout_path_shuffles_once(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spans = ds.derive_spans(docs)
    fanned = restitch.process_spans_fanout(spans)
    plan = _plan(fanned)
    # exactly one exchange: the groupBy(doc_id) gather
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dimension_joins_broadcast(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["nation_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Bucketed tables join with zero shuffles — the co-located-join storage
    strategy for doc_id-keyed joins at scale."""
    from text_extraction_system_spark.operators import bucketing

    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "cast(doc_id as string) doc_id", "text"
    )
    stats = docs.selectExpr("doc_id", "length(text) as n_chars")
    bucketing.write_bucketed(docs, "bk_docs", num_buckets=4)
    bucketing.write_bucketed(stats, "bk_stats", num_buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.bucketed_join(spark, "bk_docs", "bk_stats")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_docs")
        spark.sql("DROP TABLE IF EXISTS bk_stats")


def test_ann_topk_no_pair_join_two_exchanges(spark):
    """r6 shape: the vectorized scorer removed the pair join — candidates
    never join; the only Exchanges are the unsplittable-input spread and
    the tiny partial-top-k ranking shuffle, and no per-pair HOF cosine
    remains in the plan."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["ann_topk"](spark, SF))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan
    assert "zip_with" not in plan, plan


def test_filter_pushdown_reaches_scan(spark):
    """A doc_id predicate must reach the parquet reader as PushedFilters —
    partition/row-group pruning is what makes selective reads cheap at
    100 TB."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id = 42")
    plan = _plan(ds.derive_spans(docs))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "doc_id" in pushed and "42" in pushed, pushed


def test_ivf_topk_shape_and_plan(spark):
    """IVF ANN: no pair join (r6 vectorized scorer — probe sets ride inside
    the kernel), probes are distinct cells (no pair scored twice), ranks
    are dense 1..k per query."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = similarity.ivf_topk(emb, n_queries=5, k=3)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
        assert len({x["cand_id"] for x in rs}) == len(rs)


def test_srp_bucket_space_and_skew_guard(spark):
    """Scale posture of the banded SRP LSH: with 16 planes per band the
    per-band bucket space is 2^16 (not the round-1 flat 16-bucket table),
    and after the MAX_BUCKET guard no (band, bucket) key exceeds the cap —
    the properties that bound the self-join at 10^9+ vectors."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bb = similarity.srp_banded_buckets(emb, n_bands=2, planes_per_band=16)
    rows = bb.groupBy("band", "bucket").count().collect()
    assert all(len(r["bucket"]) == 16 for r in rows)  # 2^16-wide key space
    assert all(r["count"] <= similarity.MAX_BUCKET for r in rows)
    # defaults are banded too, with the same guarantee
    bb_def = similarity.srp_banded_buckets(emb)
    counts = bb_def.groupBy("band", "bucket").count()
    assert counts.agg(F.max("count")).collect()[0][0] <= similarity.MAX_BUCKET
    assert similarity.N_BANDS * similarity.PLANES_PER_BAND >= 16


def test_srp_candidates_subset_of_all_pairs_and_verified(spark):
    """Banded candidates feed an exact-cosine verify: every emitted pair
    meets the threshold, and a pair colliding in several bands appears once."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = similarity.srp_near_dup_pairs(emb, threshold=0.3).collect()
    seen = {(r["id_a"], r["id_b"]) for r in pairs}
    assert len(seen) == len(pairs)  # no duplicate pairs from the band union
    assert all(r["cosine"] >= 0.3 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_ivf_training_descends(spark):
    """One distributed Lloyd step over hash-initialized centroids must not
    increase the assignment inertia (and on real data it strictly
    decreases) — the genuine IVF training path, all DataFrame aggregations."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c0 = similarity.ivf_centroid_values(64, 8)
    i0 = similarity.ivf_inertia(emb, c0)
    c1 = similarity.ivf_train_step(emb, c0)
    i1 = similarity.ivf_inertia(emb, c1)
    c2 = similarity.ivf_train_step(emb, c1)
    i2 = similarity.ivf_inertia(emb, c2)
    assert i1 < i0
    assert i2 <= i1 + 1e-9
    assert len(c1) == 8 and all(len(v) == 64 for v in c1)


def test_vectorized_ivf_assignment_bit_identical(spark):
    """Round-2 verdict item 4: the numpy mapInPandas assignment must choose
    EXACTLY the same cell as the interpreted HOF expression for every row —
    not within tolerance, identical (the accumulation replays the fold's
    multiply/add order). Cell identity is what partitioning needs; a single
    divergent row would send a vector to a different IVF partition."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells_lit = similarity._ivf_cells_lit(64, similarity.IVF_CENTROIDS)
    hof = emb.select(
        "vec_id",
        similarity.ivf_cell_col(
            similarity.ivf_dists_col(F.col("embedding"), cells_lit)
        ).alias("cell"),
    )
    vec = similarity.assign_cells_vectorized(emb).select("vec_id", "cell")
    diff = (
        hof.alias("h")
        .join(vec.alias("v"), "vec_id")
        .where(F.col("h.cell") != F.col("v.cell"))
        .count()
    )
    assert diff == 0
    assert vec.count() == emb.count()


def test_vectorized_topk_bit_identical(spark):
    """r6: the numpy partial-top-k scorer must reproduce the HOF
    broadcast-join formulation EXACTLY — same (query, cand, rank) rows,
    same cosine bits — for both the brute-force and the IVF-probed shape
    (the kernel replays the fold's multiply/add order and the probe-cell
    tie-break)."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    for fn in (similarity.brute_force_topk, similarity.ivf_topk):
        slow = {
            (r["query_id"], r["rank"]): (r["cand_id"], r["cosine"])
            for r in fn(emb, vectorized=False).collect()
        }
        fast = {
            (r["query_id"], r["rank"]): (r["cand_id"], r["cosine"])
            for r in fn(emb, vectorized=True).collect()
        }
        assert fast == slow, fn.__name__


def test_vectorized_srp_signatures_bit_identical(spark):
    """The numpy SRP signature twin must emit EXACTLY the HOF's bucket
    strings for every (row, band) — identical sign bits from the replayed
    fold — on both the 64-dim embeddings and the 16-dim media features."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import multimodal, similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cases = [
        (emb, dict(id_col="vec_id", vec_col="embedding", dim=64)),
        (
            multimodal.extract_features(docs),
            dict(id_col="media_ref", vec_col="feature", dim=multimodal.FEATURE_DIM),
        ),
    ]
    for df, kw in cases:
        hof = similarity.srp_banded_buckets(df, vectorized=False, **kw)
        vec = similarity.srp_banded_buckets(df, vectorized=True, **kw)
        n = hof.count()
        assert vec.count() == n
        joint = hof.join(vec, ["vid", "band", "bucket"]).count()
        assert joint == n, f"{n - joint} divergent (row, band) signatures for {kw}"


def test_contamination_report_semantics_and_plan(spark):
    """Decontamination: a train doc quoting an eval 3-gram is flagged with
    the exact hit count; disjoint docs are absent; the eval side broadcasts
    (the benchmark is small by nature — no shuffle of the train corpus
    against it)."""
    from pyspark.sql import Row

    from text_extraction_system_spark.operators import dedup

    train = spark.createDataFrame(
        [
            Row(doc_id="t1", text="alpha beta gamma delta epsilon"),
            Row(doc_id="t2", text="zeta eta theta iota kappa"),
            Row(doc_id="t3", text="alpha beta gamma zeta eta theta"),
        ]
    )
    eval_docs = spark.createDataFrame(
        [Row(doc_id="e1", text="alpha beta gamma delta")]
    )
    rep = dedup.contamination_report(train, eval_docs)
    assert "BroadcastHashJoin" in rep._jdf.queryExecution().executedPlan().toString()
    rows = {r["doc_id"]: r for r in rep.collect()}
    # eval shingles: {alpha beta gamma, beta gamma delta}
    # t1 (3 shingles) hits both; t3 (4 shingles) hits only the first; t2 none
    assert set(rows) == {"t1", "t3"}
    assert rows["t1"]["n_hits"] == 2 and rows["t1"]["n_shingles"] == 3
    assert rows["t3"]["n_hits"] == 1 and rows["t3"]["n_shingles"] == 4
    assert abs(rows["t1"]["contamination"] - 2 / 3) < 1e-12


def test_split_assignment_stable_and_distributed(spark):
    """Split labels are per-doc deterministic (subset invariance: removing
    docs never reassigns survivors) and roughly follow the weights."""
    from text_extraction_system_spark.operators import splits

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id")
    )
    full = {r["doc_id"]: r["split"] for r in splits.assign_splits(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in splits.assign_splits(docs.limit(250)).collect()
    }
    assert all(full[d] == s for d, s in half.items())  # subset invariance
    n = len(full)
    n_train = sum(1 for s in full.values() if s == "train")
    assert n_train / n > 0.9  # 98% weight, small-sample slack


def test_pack_bins_matches_global_window_and_fills(spark):
    """The two-level distributed prefix sum must reproduce the single
    global-window packing exactly (same (shard, ok) order), bins must be
    dense from 0, and every bin except the last must reach the budget."""
    from pyspark.sql.window import Window as W

    from text_extraction_system_spark.operators import splits, textstats

    budget = 500
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        textstats.token_count_col(F.col("text")).alias("n_tokens"),
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin"])
        for r in splits.pack_bins(docs, budget=budget).collect()
    }
    # single-window reference (the oracle formulation), computed in Spark
    ok = F.md5(F.concat_ws(":", F.lit("pack0"), F.col("doc_id")))
    ref_df = docs.select(
        "doc_id",
        "n_tokens",
        ok.alias("ok"),
        (F.conv(F.substring(ok, 1, 8), 16, 10).cast("bigint")
         % splits.PACK_SHARDS).alias("shard"),
    ).withColumn(
        "cum",
        F.sum("n_tokens").over(
            W.orderBy("shard", "ok", "doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    ref = {
        r["doc_id"]: (r["n_tokens"], (r["cum"] - r["n_tokens"]) // budget)
        for r in ref_df.collect()
    }
    assert got == ref
    # fill property: a PREFIX of bins always holds at least its budgets
    # (individual bins can be light when a straddling doc from the previous
    # bin consumed part of their range — that doc closes ITS bin instead)
    per_bin: dict[int, int] = {}
    for toks, b in got.values():
        per_bin[b] = per_bin.get(b, 0) + toks
    bins = sorted(per_bin)
    assert bins[0] == 0
    prefix = 0
    for b in bins[:-1]:
        prefix += per_bin[b]
        assert prefix >= (b + 1) * budget


def test_incremental_dedup_semantics(spark):
    """Cross-batch dedup: a new doc that is a near-copy of a committed doc is
    flagged with a high sketch estimate; an unrelated new doc is not; and
    the committed side is consumed as a SIGNATURE table (no raw text)."""
    from pyspark.sql import Row

    from text_extraction_system_spark.operators import dedup

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest to hide from every hunter nearby today"
    )
    committed_docs = spark.createDataFrame(
        [Row(doc_id="old1", text=base), Row(doc_id="old2", text="totally different words entirely here now")]
    )
    new_docs = spark.createDataFrame(
        [
            Row(doc_id="new1", text=base + " extra tail"),  # near-copy of old1
            Row(doc_id="new2", text="unrelated content about spark plans and shuffles today"),
        ]
    )
    sigs = dedup.signature_table(committed_docs)
    assert set(sigs.columns) == {"doc_id", "sig", "band", "band_sig"}
    rows = dedup.incremental_near_dup(new_docs, sigs).collect()
    got = {(r["doc_id"], r["dup_of"]): r["est_jaccard"] for r in rows}
    assert ("new1", "old1") in got and got[("new1", "old1")] >= 0.5
    assert all(d != "new2" for d, _ in got)


def test_pack_and_split_invariant_under_partitioning(spark):
    """Distributed-determinism property: physical layout (partition count,
    row order) must never change split labels or pack bins — the guarantee
    that a 1000-executor run and a laptop run emit the same release
    manifest. Repartitioned/shuffled input must produce identical output."""
    from text_extraction_system_spark.operators import splits, textstats

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        textstats.token_count_col(F.col("text")).alias("n_tokens"),
    )
    variants = [
        docs,
        docs.repartition(17),
        docs.repartition(3, "n_tokens").sortWithinPartitions(F.col("doc_id").desc()),
    ]
    packs = [
        {r["doc_id"]: r["bin"] for r in splits.pack_bins(v, budget=777).collect()}
        for v in variants
    ]
    assert packs[0] == packs[1] == packs[2]
    labels = [
        {r["doc_id"]: r["split"] for r in splits.assign_splits(v).collect()}
        for v in variants
    ]
    assert labels[0] == labels[1] == labels[2]


def test_arrow_signature_rows_match_hof(spark):
    """The Arrow signature kernel is VALUE-IDENTICAL to the Catalyst HOF
    formulation — same distinct shingles, same md5-prefix hashes, same
    affine perm-mins, same band md5s (int64 products stay < 2^62)."""
    from text_extraction_system_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = lambda r: (r["doc_id"], r["band"])
    a = {key(r): (tuple(r["sig"]), r["band_sig"])
         for r in dedup.signature_band_rows_arrow(docs).collect()}
    b = {key(r): (tuple(r["sig"]), r["band_sig"])
         for r in dedup.signature_rows_hof(docs).collect()}
    assert a == b and a


def test_arrow_simhash_matches_hof(spark):
    """The Arrow simhash kernel equals the Catalyst vote fold value-for-
    value (same tokens, same md5 token hashes, same bit votes)."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import textstats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"]: r["simhash"]
         for r in textstats.simhash_rows(docs).collect()}
    b = {r["doc_id"]: r["simhash"]
         for r in docs.select(
             F.col("doc_id").cast("string").alias("doc_id"),
             textstats.simhash_col(F.col("text")).alias("simhash"),
         ).collect()}
    assert a == b and a


def test_arrow_readorder_synthesis_matches_hof(spark):
    """The Arrow word-box synthesis equals the Catalyst one value-for-value
    (tokens, md5 column counts, layout coords, md5-keyed scramble order)."""
    from text_extraction_system_spark.operators import readorder_op

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    def snap(df):
        return {
            r["doc_id"]: (tuple(r["words"]), tuple(r["xs"]), tuple(r["ys"]), tuple(r["ws"]))
            for r in df.collect()
        }
    a = snap(readorder_op.synth_word_box_arrays_arrow(docs))
    b = snap(readorder_op.synth_word_box_arrays(docs))
    assert a == b and a


def test_arrow_repetition_matches_dataframe_form(spark):
    """The shuffle-free repetition kernel equals the explode/groupBy
    DataFrame form value-for-value."""
    from text_extraction_system_spark import pipeline
    from text_extraction_system_spark.operators import textstats

    res = pipeline.extract_from_documents(
        spark.read.parquet(f"{SF}/documents.parquet"), with_structure=False
    )
    frac_cols = (
        [f"top_{n}gram_char_frac" for n in textstats.TOP_NS[1:]]
        + [f"dup_{n}gram_char_frac" for n in textstats.DUP_NS]
    )

    def snap(df):
        def fmt(v):
            return None if v is None else f"{v:.17g}"

        return {r["doc_id"]: (r["n_lines"], fmt(r["dup_line_frac"]),
                              fmt(r["dup_line_char_frac"]), r["top_gram"],
                              fmt(r["top_gram_char_frac"]),
                              *[fmt(r[c]) for c in frac_cols])
                for r in df.collect()}
    a = snap(textstats.repetition_rows_arrow(res))
    b = snap(textstats.repetition_rows(res))
    assert a == b and a
    # the full Gopher battery is populated: long docs carry every column,
    # and at least one short doc exercises the NULL (no such n-gram) path
    assert any(all(x is not None for x in v[5:]) for v in a.values())


def test_repetition_chain_path_matches_counter_and_dataframe(spark):
    """The giant-doc numpy rolling-key path produces the same Gopher
    fractions as the Counter path and the exploded DataFrame form: one doc
    above NP_CHAIN_MIN_TOKENS with engineered line and n-gram repeats runs
    through all three."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import textstats

    words = [f"w{i % 97}" for i in range(5000)] + ["alpha", "beta"] * 40
    text = "line one\nline one\n" + " ".join(words)
    big = spark.createDataFrame([("giant", text)], "doc_id string, plain_text string")

    frac_cols = (
        [f"top_{n}gram_char_frac" for n in textstats.TOP_NS[1:]]
        + [f"dup_{n}gram_char_frac" for n in textstats.DUP_NS]
    )

    def snap(df):
        r = df.collect()[0]
        return (r["n_lines"], f"{r['dup_line_frac']:.17g}", r["top_gram"],
                f"{r['top_gram_char_frac']:.17g}",
                *[f"{r[c]:.17g}" for c in frac_cols])

    arrow = snap(textstats.repetition_rows_arrow(big))       # chain path
    frame = snap(textstats.repetition_rows(big))             # exploded form
    assert arrow == frame

    # the Counter path on the same shape of doc, below the switch threshold
    small_words = words[: 2000]
    text_small = "line one\nline one\n" + " ".join(small_words + ["alpha", "beta"] * 40)
    small = spark.createDataFrame(
        [("small", text_small)], "doc_id string, plain_text string"
    )
    assert snap(textstats.repetition_rows_arrow(small)) == snap(
        textstats.repetition_rows(small)
    )


def test_tfidf_vectorized_row_equal(spark):
    """r6: the Arrow tf-Counter formulation of tfidf_keywords must emit
    exactly the explode+groupBy form's rows on a real corpus slice."""
    from text_extraction_system_spark.operators import textstats

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def snap(df):
        return {(r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"], r["score"])
                for r in df.collect()}

    assert snap(textstats.tfidf_keywords(docs, vectorized=True)) == snap(
        textstats.tfidf_keywords(docs, vectorized=False)
    )


def test_dup_windows_vectorized_row_equal(spark):
    """r6: the Arrow Counter + window-count formulation of
    dup_window_coverage must emit EXACTLY the expression form's rows
    (same 60-bit md5 window hashes via py_tokens, same counts) on a real
    corpus slice."""
    from text_extraction_system_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def snap(df):
        return {
            r["doc_id"]: (r["n_windows"], r["dup_windows"],
                          r["distinct_shared_windows"],
                          f"{r['dup_window_frac']:.17g}")
            for r in df.collect()
        }

    assert snap(dedup.dup_window_coverage(docs, vectorized=True)) == snap(
        dedup.dup_window_coverage(docs, vectorized=False)
    )


def test_tfidf_and_dup_windows_semantics(spark):
    """Hand-computed cases for the two corpus-level ops: TF-IDF ranks a
    doc-specific repeated term above corpus-wide terms (fixed-point
    integer IDF), and dup_window_coverage flags exactly the windows shared
    across docs."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import dedup, textstats

    docs = spark.createDataFrame(
        [("a", "zebra zebra common common common"),
         ("b", "common common common apple pie"),
         ("c", "common pie crust")],
        "doc_id string, text string",
    )
    rows = textstats.tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc a: zebra tf=2 df=1 -> score 2*(3e6/1)=6e6; common tf=3 df=3 -> 3*1e6
    a = {r["rank"]: (r["token"], r["score"]) for r in by_doc["a"]}
    assert a[1] == ("zebra", 6_000_000)
    assert a[2] == ("common", 3_000_000)
    # doc c: crust df=1 -> 3_000_000 beats pie df=2 -> 1_500_000
    c = {r["rank"]: r["token"] for r in by_doc["c"]}
    assert c[1] == "crust" and c[2] == "pie"

    w = " ".join
    shared = w(f"s{i}" for i in range(8))           # 8-token run in both
    d1 = shared + " x1 x2 x3"
    d2 = "y0 " + shared + " y1"
    d3 = w(f"z{i}" for i in range(10))              # no overlap
    docs2 = spark.createDataFrame(
        [("1", d1), ("2", d2), ("3", d3)], "doc_id string, text string"
    )
    got = {r["doc_id"]: r for r in dedup.dup_window_coverage(docs2).collect()}
    # d1: 11 tokens -> 4 windows, only the exact shared window duplicated
    assert got["1"]["n_windows"] == 4
    assert got["1"]["dup_windows"] == 1
    assert got["1"]["distinct_shared_windows"] == 1
    assert abs(got["1"]["dup_window_frac"] - 0.25) < 1e-12
    # d2: 10 tokens -> 3 windows, one shared
    assert got["2"]["n_windows"] == 3 and got["2"]["dup_windows"] == 1
    # d3: 3 windows, none shared
    assert got["3"]["n_windows"] == 3 and got["3"]["dup_windows"] == 0


def test_connected_components_transitive_chain(spark):
    """Cluster resolution is transitive across pairs that were never
    directly emitted (A~B, B~C => one cluster) and labels every clustered
    vertex with the component minimum; long chains converge within the
    iteration bound."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import dedup

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"),            # chain -> cluster 'a'
         ("x", "y"),                        # separate pair -> cluster 'x'
         ("m", "n"), ("n", "o"), ("o", "p")],  # longer chain -> 'm'
        "id_a string, id_b string",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x",
                   "m": "m", "n": "m", "o": "m", "p": "m"}

    # a 12-vertex path needs ~diameter rounds; the bound must cut off
    # loudly, not return partial labels
    chain = spark.createDataFrame(
        [(f"v{i:02d}", f"v{i + 1:02d}") for i in range(11)],
        "id_a string, id_b string",
    )
    full = {r["doc_id"]: r["cluster_id"]
            for r in dedup.connected_components(chain).collect()}
    assert set(full.values()) == {"v00"} and len(full) == 12
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=2)


def test_mixture_plan_semantics(spark):
    """Mixture sampling: an oversubscribed source caps at rate 1 and keeps
    every doc (the plan shows the shortfall instead of re-weighting); a
    fractional source keeps a hash-stable subset; rates and targets follow
    the integer formulas exactly."""
    from pyspark.sql import functions as F

    from text_extraction_system_spark.operators import splits

    docs = spark.createDataFrame(
        [(f"a{i}", "tiny", "one two three") for i in range(3)]        # 9 tokens
        + [(f"b{i}", "big", " ".join(["w"] * 50)) for i in range(40)],  # 2000
        "doc_id string, source string, text string",
    )
    plan = {r["source"]: r for r in splits.mixture_plan(
        docs, {"tiny": 1, "big": 1}, token_budget=400
    ).collect()}
    t, b = plan["tiny"], plan["big"]
    # equal weights: each source targets 200 tokens
    assert t["target_tokens"] == 200 and b["target_tokens"] == 200
    # tiny has only 9 tokens -> capped at rate 1, everything kept
    assert t["rate_32"] == 1 << 32
    assert t["docs_sampled"] == t["docs_avail"] == 3
    assert t["tokens_sampled"] == t["tokens_avail"] == 9
    # big keeps the exact integer fraction 200/2000 of the hash space
    assert b["rate_32"] == (200 * (1 << 32)) // 2000
    assert 0 < b["docs_sampled"] < b["docs_avail"]
    # determinism: rerunning yields the identical sample
    again = {r["source"]: r for r in splits.mixture_plan(
        docs, {"tiny": 1, "big": 1}, token_budget=400
    ).collect()}
    assert again["big"]["docs_sampled"] == b["docs_sampled"]
    assert again["big"]["tokens_sampled"] == b["tokens_sampled"]


def test_vectorized_pq_bit_identical(spark):
    """r6: the ADC partial-top-k kernel and the fused assign+encode must
    reproduce the expression/join formulations exactly — same rows, same
    adc/cosine bits — for plain PQ, reranked PQ, and IVF-PQ."""
    from text_extraction_system_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = similarity.pq_train(emb)
    cents = similarity.ivf_train(emb, iters=2)

    def snap(df):
        return {(r["query_id"], r["rank"]): tuple(r) for r in df.collect()}

    cases = [
        (similarity.pq_topk(emb, books, vectorized=True),
         similarity.pq_topk(emb, books, vectorized=False)),
        (similarity.pq_topk(emb, books, rerank=20, vectorized=True),
         similarity.pq_topk(emb, books, rerank=20, vectorized=False)),
        (similarity.ivf_pq_topk(emb, cents, books, vectorized=True),
         similarity.ivf_pq_topk(emb, cents, books, vectorized=False)),
    ]
    for fast, slow in cases:
        assert snap(fast) == snap(slow)
