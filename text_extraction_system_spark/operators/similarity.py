"""Similarity search over an embedding column (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query set
  against the candidate corpus; the scan side stays partition-parallel with
  no shuffle until the final per-query top-k (tiny). The dot product is a
  JVM-side ``zip_with``/``aggregate`` fold in double precision — fully
  deterministic and reproducible in SQL.
* ``srp_lsh_topk`` — the scale path: sign-random-projection buckets from
  deterministic md5-derived hyperplanes; candidates restricted to the same
  bucket. At 10^12 vectors the bucket join replaces the broadcast scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX = "0123456789abcdef"


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (cosine undefined): try_divide
    mirrors DuckDB's x/0.0 -> NULL, instead of the ANSI DIVIDE_BY_ZERO error
    that would kill the job on the first degenerate embedding; both engines
    then sort NULL cosines last under DESC."""
    return F.try_divide(dot_col(a, b), norm_col(a) * norm_col(b))


def _py_dot(a, b) -> float:
    """Python-float twin of ``dot_col``: same ascending-j sequential fold,
    same IEEE-double rounding sequence."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _py_norm(a) -> float:
    import math

    acc = 0.0
    for x in a:
        acc += x * x
    return math.sqrt(acc)


def _null_rank_key(cosine):
    """Sort sentinel reproducing (cosine DESC NULLS LAST, cand_id ASC): real
    cosines live in [-1, 1], so -2.0 orders every NULL after every value."""
    return -2.0 if cosine is None else cosine


def _query_rows(embeddings: DataFrame, n_queries: int,
                id_col: str, vec_col: str) -> list[tuple]:
    """The (tiny) query side as driver rows: n_queries x dim floats — the
    same collect class as the IVF centroid/seed reads (similarity.py
    ``ivf_train``), never the corpus."""
    rows = (
        embeddings.where(F.col(id_col) < n_queries)
        .select(id_col, vec_col).collect()
    )
    return [(r[0], [float(x) for x in r[1]]) for r in rows]


def _scored_topk_partials(
    cands: DataFrame,
    queries: list[tuple],
    k: int,
    probe_cells: dict | None = None,
) -> DataFrame:
    """Per-task partial top-k of exact cosine scores against a small query
    set — the guide-section-8 move: every task scores its own rows against
    the (in-Python) query vectors with one vectorized numpy pass per batch
    and emits only its k best rows per query, so no join ships vectors and
    the final ranking window sees n_tasks x n_queries x k rows instead of
    the full score matrix.

    BIT-IDENTICAL scores to ``cosine_col``: the dot/norm accumulations run
    dim-major in float64 (one vectorized multiply+add per dimension, j
    ascending) — exactly the ``aggregate`` fold's IEEE sequence per row —
    and zero-norm pairs yield NULL like try_divide. Partial top-k keeps, per
    query, the k best under (cosine DESC NULLS LAST, cand_id ASC) — the
    final window's exact total order — so the union of partials is a
    superset of the global top-k and the window output is unchanged
    (pinned by tests/test_plans.py equality vs the HOF formulation).

    ``cands`` must be (cand_id, cv) or (cand_id, cv, cell);
    ``probe_cells`` maps query_id -> cell ids the query probes (None = scan
    everything, the brute-force shape)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in cands.schema.fields}
    out_schema = T.StructType([
        T.StructField("query_id", in_fields["cand_id"].dataType, True),
        T.StructField("cand_id", in_fields["cand_id"].dataType, True),
        T.StructField("cosine", T.DoubleType(), True),
    ])
    has_cell = "cell" in in_fields
    qids = [q[0] for q in queries]
    qvs = [np.asarray(q[1], dtype=np.float64) for q in queries]
    qns = np.asarray([_py_norm(q[1]) for q in queries])
    probes = (
        [np.asarray(sorted(probe_cells[qid]), dtype=np.int64) for qid in qids]
        if probe_cells is not None else None
    )
    m = len(qids)

    def gen(batches):
        # per query: parallel lists of (order_key, cand_id, cosine), <= k each
        best_key = [np.empty(0)] * m
        best_id = [np.empty(0, dtype=object)] * m
        best_cos = [[] for _ in range(m)]
        dim = qvs[0].shape[0] if m else 0
        Q = np.stack(qvs) if m else np.zeros((0, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["cand_id"].to_numpy()
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            cells = pdf["cell"].to_numpy() if has_cell else None
            # candidate norms + all dots, dim-major (the fold's add order)
            nacc = np.zeros(len(X))
            dacc = np.zeros((len(X), m))
            for j in range(dim):
                xj = X[:, j]
                nacc += xj * xj
                dacc += xj[:, None] * Q[None, :, j]
            cn = np.sqrt(nacc)
            for qi in range(m):
                mask = ids != qids[qi]
                if cells is not None and probes is not None:
                    mask &= np.isin(cells, probes[qi])
                if not mask.any():
                    continue
                denom = qns[qi] * cn[mask]
                dot = dacc[mask, qi]
                sid = ids[mask]
                zero = denom == 0.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dot / denom
                key = np.where(zero, -2.0, cos)
                # batch top-k under (key desc, cand_id asc), merged with
                # the running best and re-cut to k
                take = np.lexsort((sid, -key))[: k]
                kk = np.concatenate((best_key[qi], key[take]))
                ii = np.concatenate((best_id[qi], sid[take]))
                cc = best_cos[qi] + [
                    None if zero[t] else float(cos[t]) for t in take
                ]
                order = np.lexsort((ii, -kk))[: k]
                best_key[qi] = kk[order]
                best_id[qi] = ii[order]
                best_cos[qi] = [cc[t] for t in order]
        out = {"query_id": [], "cand_id": [], "cosine": []}
        for qi in range(m):
            for t in range(len(best_id[qi])):
                out["query_id"].append(qids[qi])
                out["cand_id"].append(best_id[qi][t])
                out["cosine"].append(best_cos[qi][t])
        yield pd.DataFrame(out, columns=["query_id", "cand_id", "cosine"])

    return cands.mapInPandas(gen, schema=out_schema)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    ``vectorized=True`` (default): the query vectors ride inside a numpy
    ``mapInPandas`` kernel (n_queries x dim floats — the centroid-collect
    class, never the corpus) that scores each task's rows in one vectorized
    pass per batch and emits per-task partial top-k, so only
    n_tasks x n_queries x k rows reach the ranking window — the interpreted
    per-pair HOF cosine (N x n_queries evaluations, the measured 85% of
    this query's runtime at sf1.0) leaves the plan. Scores are
    bit-identical to ``cosine_col`` (see ``_scored_topk_partials``);
    ``vectorized=False`` keeps the pure-expression broadcast-join
    formulation, equality-pinned by tests/test_plans.py.
    """
    cands = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    if vectorized:
        queries = _query_rows(embeddings, n_queries, id_col, vec_col)
        return _rank_topk(_scored_topk_partials(cands, queries, k), k)
    qs = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        cands.join(F.broadcast(qs))
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_col(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


#: SRP LSH banding defaults: N_BANDS x PLANES_PER_BAND hyperplanes total.
#: A single flat table of few planes (the round-1 shape: 4 planes -> 16
#: buckets) is O(n^2/16) at 10^9+ rows with 16-way key skew; banding keeps
#: each band's bucket space 2^PLANES_PER_BAND wide (raise PLANES_PER_BAND at
#: scale — 16 planes/band gives 65536 buckets/band) while the band union
#: preserves recall for genuinely similar pairs (a cosine-0.9 pair collides
#: in an 8-plane band w.p. ~0.29, in >=1 of 4 bands w.p. ~0.75 — better than
#: the flat 4-plane table's 0.54, with ~16x smaller buckets).
N_BANDS = 4
PLANES_PER_BAND = 8

#: (band, bucket) keys holding more than this many vectors are dropped as
#: degenerate (e.g. zero-ish embeddings all hashing together) — mirrors
#: dedup.MAX_BUCKET; a bucket of b vectors costs b^2 join rows
MAX_BUCKET = 64

#: exact-cosine acceptance threshold for embedding near-duplicate pairs —
#: shared with the DuckDB oracle (interpolated there, never hardcoded)
NEAR_DUP_THRESHOLD = 0.3


def srp_plane_values(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic hyperplanes: plane p component j =
    hexval(md5(p || ':' || j)[0]) - 7.5 (zero-mean, reproducible anywhere —
    the DuckDB oracle recomputes the same md5 expression)."""
    import hashlib

    return [
        [
            float(int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16)) - 7.5
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_plane_col(dim: int, n_planes: int) -> Column:
    """Plane matrix as a LITERAL nested array. The planes depend only on
    (p, j), but an md5-expression formulation is interpreted per ROW by the
    HOF evaluator — n_planes*dim md5 calls per input row (measured: 24x
    slower for 32 planes x 64 dims at sf0.1). Constants belong in the plan."""
    return F.array(
        *[
            F.array(*[F.lit(v) for v in plane]).cast("array<double>")
            for plane in srp_plane_values(dim, n_planes)
        ]
    )


def srp_bucket_col(vec: Column, planes: Column) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec . plane_p)."""
    signs = F.transform(
        planes,
        lambda pl: F.when(dot_col(vec, pl) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(signs, "")


def srp_band_buckets_col(
    vec: Column, n_bands: int = N_BANDS, planes_per_band: int = PLANES_PER_BAND,
    dim: int = 64,
) -> Column:
    """array<struct<band:int, bucket:string>>: per band, the sign bits of
    that band's planes (global plane index band*planes_per_band + j)."""
    planes = srp_plane_col(dim, n_bands * planes_per_band)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            srp_bucket_col(
                vec, F.slice(planes, b * planes_per_band + 1, planes_per_band)
            ).alias("bucket"),
        ),
    )


def _srp_buckets_arr_vectorized(
    embeddings: DataFrame,
    n_bands: int,
    planes_per_band: int,
    dim: int,
    id_col: str,
    vec_col: str,
    keep_vec: bool,
) -> DataFrame:
    """(vid[, vec], buckets array<string>) via one numpy Arrow pass —
    BIT-IDENTICAL to ``srp_band_buckets_col``: the plane dots replay the
    aggregate fold's multiply/add order dim-major (see
    assign_cells_vectorized for the technique), and the sign of an identical
    double is identical. The interpreted HOF form costs
    n_bands*planes_per_band*dim mult-adds per row in the expression
    evaluator — the same per-row CPU story as IVF assignment."""
    import numpy as np
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    planes = srp_plane_values(dim, n_bands * planes_per_band)

    in_fields = [f for f in embeddings.schema.fields if f.name in (id_col, vec_col)]
    out_schema = StructType(
        list(in_fields) + [StructField("buckets", ArrayType(StringType()), False)]
    )
    sel = [id_col, vec_col]

    def gen(batches):
        P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim), exact
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf[sel].copy()
                out["buckets"] = []
                yield out
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            acc = np.zeros((X.shape[0], P.shape[0]))
            for j in range(P.shape[1]):  # dim-major: the fold's add order
                acc += X[:, j : j + 1] * P[None, :, j]
            bits = np.where(acc >= 0, "1", "0")  # (n, n_planes) of '0'/'1'
            out = pdf[sel].copy()
            out["buckets"] = [
                [
                    "".join(row[b * planes_per_band : (b + 1) * planes_per_band])
                    for b in range(n_bands)
                ]
                for row in bits
            ]
            yield out

    res = embeddings.select(*sel).mapInPandas(gen, schema=out_schema)
    if not keep_vec:
        res = res.drop(vec_col)
    return res


def srp_banded_buckets(
    embeddings: DataFrame,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
    vectorized: bool = True,
    materialize: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """(vid, band, bucket[, vec]) rows, degenerate buckets dropped
    (``max_bucket``, default MAX_BUCKET; pass ``max_bucket=0`` to skip the
    guard AND its count-window shuffle — right for a QUERY batch, whose
    intra-batch bucket sizes say nothing about committed-side candidate
    volume).

    The bucket signature is a narrow per-row expression; at 10^12 rows this
    is the table you would materialize once and bucket-partition by
    (band, bucket) — that durable form is ``state.write_srp_buckets``
    (parquet partitioned by (band, bucket_prefix)), which passes
    ``materialize=False`` to get the raw plan for its write.
    ``vectorized=True`` (default) computes signatures with
    the numpy Arrow twin — bit-identical to the HOF (pinned by
    tests/test_plans.py), minus the interpreted-expression CPU."""
    if vectorized:
        arr = _srp_buckets_arr_vectorized(
            embeddings, n_bands, planes_per_band, dim, id_col, vec_col, keep_vec
        )
        cols = [F.col(id_col).alias("vid")]
        if keep_vec:
            cols.append(F.col(vec_col).alias("vec"))
        exploded = arr.select(
            *cols, F.posexplode("buckets").alias("band", "bucket")
        )
    else:
        cols = [F.col(id_col).alias("vid")]
        if keep_vec:
            cols.append(F.col(vec_col).alias("vec"))
        exploded = embeddings.select(
            *cols,
            F.explode(
                srp_band_buckets_col(F.col(vec_col), n_bands, planes_per_band, dim)
            ).alias("bb"),
        ).withColumns(
            {"band": F.col("bb.band"), "bucket": F.col("bb.bucket")}
        ).drop("bb")
    limit = MAX_BUCKET if max_bucket is None else max_bucket
    if limit:
        counted = exploded.withColumn(
            "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
        )
        kept = counted.where(F.col("bucket_n") <= limit).drop("bucket_n")
    else:
        kept = exploded
    # consumers self-join this table: materialize lazily (first action) so
    # the signature + window plan runs once, not once per join branch —
    # same shape as dedup.lsh_candidate_pairs. localCheckpoint blocks are
    # unreplicated and lineage-truncated: fine single-JVM, but an executor
    # loss on a cluster is unrecoverable — at cluster scale write the bucket
    # table out partitioned by (band, bucket) instead (durable, co-located
    # join); see dedup.lsh_candidate_pairs for the full trade-off note.
    return kept.localCheckpoint(eager=False) if materialize else kept


def srp_candidate_pairs(
    embeddings: DataFrame,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct (id_a < id_b) pairs colliding in at least one band —
    the union of per-band bucket self-joins, exactly dedup's LSH shape."""
    bb = srp_banded_buckets(embeddings, n_bands, planes_per_band, dim, id_col, vec_col)
    a = bb.select("band", "bucket", F.col("vid").alias("id_a"))
    b = bb.select("band", "bucket", F.col("vid").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def srp_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded SRP candidates (the
    10^12-vector shape — all-pairs never materializes, buckets are bounded),
    verified with the exact cosine and thresholded."""
    pairs = srp_candidate_pairs(
        embeddings, n_bands, planes_per_band, dim, id_col, vec_col
    )
    vecs = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    return (
        pairs.join(vecs.select(F.col("vid").alias("id_a"), F.col("vec").alias("va")), "id_a")
        .join(vecs.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb")), "id_b")
        .select("id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


#: multi-probe Hamming radius for LSH top-k queries (Lv et al., VLDB'07):
#: each query also probes band buckets within this bit distance of its own.
#: Radius 2 over 8-plane bands = 37 bucket keys per band per query — the
#: probe fan-out multiplies only the (tiny, broadcast) QUERY side; candidate
#: volume stays bounded by MAX_BUCKET per probed key. Measured on the sf0.01
#: corpus (weak neighbors, top-5 cosine 0.25-0.49): recall@5 0.09 -> 0.74.
MULTIPROBE_RADIUS = 2


def _probe_masks(n_bits: int, radius: int,
                 budget: int | None = None) -> list[tuple[int, ...]]:
    """Bit-position subsets of size <= radius (incl. the empty probe), in
    GUARANTEED probe order: increasing Hamming distance, lexicographic by
    bit positions within a distance. A ``budget`` keeps the first N probes —
    so a budget always spends its keys on the nearest buckets first, and
    budget=1 degenerates to the exact single-bucket lookup. This is what
    makes a probe budget meaningful at scale: 16-plane bands (the
    recommended width at 10^9+ vectors) have 137 radius-2 probes, and a
    budget trades recall for query fan-out along a known-good order."""
    from itertools import combinations

    masks = [
        m for r in range(radius + 1) for m in combinations(range(n_bits), r)
    ]
    return masks[:budget] if budget is not None else masks


def _flip_bits_col(bucket: Column, positions: tuple[int, ...], n_bits: int) -> Column:
    """Bucket string with the given STATIC bit positions flipped — a pure
    concat-of-substrings expression (positions are plan constants)."""
    if not positions:
        return bucket
    parts: list[Column] = []
    prev = 0
    for p in positions:
        if p > prev:
            parts.append(F.substring(bucket, prev + 1, p - prev))
        c = F.substring(bucket, p + 1, 1)
        parts.append(F.when(c == "1", F.lit("0")).otherwise(F.lit("1")))
        prev = p + 1
    if prev < n_bits:
        parts.append(F.substring(bucket, prev + 1, n_bits - prev))
    return F.concat(*parts)


def srp_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = MULTIPROBE_RADIUS,
    probe_budget: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates are vectors sharing at least one band
    bucket with the query (queries broadcast; a pair colliding in several
    bands/probes is scored once via the max-aggregate — cosine is
    deterministic per pair, so max == the single score).

    ``multiprobe`` expands each query's bucket keys to Hamming distance <=
    radius within each band (classic multi-probe LSH): with few bands the
    single-key recall on weak-similarity corpora is poor, and adding bands
    multiplies the 10^12-row BUCKET TABLE — probing instead multiplies only
    the broadcast query keys, which is the scale-correct direction.

    ``probe_budget`` caps the probes per band per query, taken in increasing
    Hamming distance (nearest buckets first — see _probe_masks); None keeps
    every probe within the radius (the default 8-plane/radius-2 setup: 37).
    Recall degrades gracefully as the budget shrinks (pinned by
    tests/test_recall.py)."""
    bb = srp_banded_buckets(
        embeddings, n_bands, planes_per_band, dim, id_col, vec_col, keep_vec=True
    )
    masks = _probe_masks(planes_per_band, multiprobe, probe_budget)
    qs = bb.where(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        "band",
        F.explode(
            F.array(
                *[_flip_bits_col(F.col("bucket"), m, planes_per_band) for m in masks]
            )
        ).alias("bucket"),
        F.col("vec").alias("qv"),
    )
    cands = bb.select(
        F.col("vid").alias("cand_id"), "band", "bucket", F.col("vec").alias("cv")
    )
    scored = (
        cands.join(F.broadcast(qs), ["band", "bucket"])
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine_col(F.col("qv"), F.col("cv")).alias("cosine"))
        .groupBy("query_id", "cand_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def incremental_ann_topk(
    new_vecs: DataFrame,
    committed_buckets: DataFrame,
    committed_vecs: DataFrame,
    k: int = 5,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = MULTIPROBE_RADIUS,
    probe_budget: int | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Serve ANN queries for a NEW batch of vectors against the COMMITTED
    corpus's PERSISTED SRP bucket table — the ANN analog of
    ``dedup.incremental_near_dup``: at 10^12 vectors the committed corpus's
    buckets are written once (``state.write_srp_buckets``, partitioned by
    (band, bucket_prefix)) and every arriving batch probes them; the
    committed vectors are never re-hashed.

    The batch side computes its own band buckets (one narrow Arrow pass —
    NO intra-batch skew window: the committed table already dropped its
    degenerate buckets at write time, which is the guard that bounds
    candidate volume) and expands them to ``multiprobe``/``probe_budget``
    keys per band (nearest-first order, see ``_probe_masks``). When the
    committed table carries the ``bucket_prefix`` partition column, probes
    also key on it, so the (broadcast) batch's key set drives dynamic
    partition pruning — a small batch touches only the committed partitions
    holding its probed buckets (plan-asserted by tests/test_plans.py).

    Candidate (query, cand) pairs are deduped across bands/probes BEFORE
    vectors are fetched, then exact cosine is computed from one hash join
    against ``committed_vecs`` (broadcast candidate side: bounded by
    queries x probes x bucket width). Returns (query_id, cand_id, cosine,
    rank<=k). ``broadcast_batch=False`` drops the broadcast hints (and with
    them DPP) for the rare bulk-reprocess case where the batch rivals the
    committed corpus."""
    batch = srp_banded_buckets(
        new_vecs, n_bands, planes_per_band, dim, id_col, vec_col,
        keep_vec=True, materialize=False, max_bucket=0,
    )
    masks = _probe_masks(planes_per_band, multiprobe, probe_budget)
    qs = batch.select(
        F.col("vid").alias("query_id"),
        "band",
        F.explode(
            F.array(
                *[_flip_bits_col(F.col("bucket"), m, planes_per_band) for m in masks]
            )
        ).alias("bucket"),
        F.col("vec").alias("qv"),
    )
    keys = ["band", "bucket"]
    if "bucket_prefix" in committed_buckets.columns:
        from . import state

        qs = qs.withColumn("bucket_prefix", state.bucket_prefix_col(F.col("bucket")))
        keys = ["band", "bucket_prefix", "bucket"]
    old = committed_buckets.select(F.col("vid").alias("cand_id"), *keys)
    qside = F.broadcast(qs) if broadcast_batch else qs
    cands = (
        qside.join(old, keys)
        .where(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.first("qv").alias("qv"))
    )
    vecs = committed_vecs.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    )
    cside = F.broadcast(cands) if broadcast_batch else cands
    scored = cside.join(vecs, "cand_id").select(
        "query_id", "cand_id", cosine_col(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

#: coarse quantizer size / probe count. Real IVF trains centroids with
#: k-means; here they are deterministic hash-derived vectors (the sandbox
#: convention — the partitioning/plan shape is the logic under test, and the
#: oracle can rebuild identical centroids). 64 cells probing 8 scans ~12.5%
#: of the corpus per query; at 10^9+ vectors raise IVF_CENTROIDS toward
#: sqrt(n) and keep n_probe fixed.
IVF_CENTROIDS = 64
IVF_PROBE = 8


def ivf_centroid_values(dim: int = 64, n_centroids: int = IVF_CENTROIDS) -> list[list[float]]:
    """Centroid c component j = hexval(md5('ivf:c:j')[0]) - 7.5 — half-integer
    values, so squared norms are exact dyadics (order-independent in float)."""
    import hashlib

    return [
        [
            float(int(hashlib.md5(f"ivf:{c}:{j}".encode()).hexdigest()[0], 16)) - 7.5
            for j in range(dim)
        ]
        for c in range(n_centroids)
    ]


def _ivf_cells_lit(dim: int, n_centroids: int,
                   centroids: list[list[float]] | None = None) -> Column:
    """Literal array<struct<c2: double, cv: array<double>>> of centroids with
    precomputed squared norms (exact: the default hash centroids are
    half-integers; trained centroids use the same python-float sum so every
    consumer sees one rounding order)."""
    cents = centroids if centroids is not None else ivf_centroid_values(dim, n_centroids)
    return F.array(
        *[
            F.struct(
                F.lit(sum(v * v for v in cv)).alias("c2"),
                F.array(*[F.lit(v) for v in cv]).cast("array<double>").alias("cv"),
            )
            for cv in cents
        ]
    )


def ivf_dists_col(vec: Column, cells: Column) -> Column:
    """array<double> of L2-distance proxies |c|^2 - 2*(vec . c) per centroid
    (argmin-equivalent to true L2; the |vec|^2 term is constant per row)."""
    return F.transform(cells, lambda s: s["c2"] - 2.0 * dot_col(vec, s["cv"]))


def ivf_cell_col(dists: Column) -> Column:
    """0-based index of the nearest centroid (first on exact ties)."""
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_probe_cells_col(dists: Column, n_probe: int) -> Column:
    """0-based indices of the n_probe nearest centroids (lexicographic
    (dist, idx) sort: deterministic tie-break by index)."""
    n = F.size(dists)
    keyed = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(F.element_at(dists, i + 1).alias("d"), i.cast("int").alias("i")),
    )
    return F.transform(
        F.slice(F.array_sort(keyed), 1, n_probe), lambda s: s["i"]
    )


def assign_cells_vectorized(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Numpy twin of ``ivf_cell_col(ivf_dists_col(...))`` — the production
    assignment path (round-2 verdict item 4: the interpreted 64x64 HOF
    mult-add dominated CPU; at 10^9+ vectors it is THE per-row cost).

    BIT-IDENTICAL to the HOF by construction, not by tolerance: the
    accumulation runs dim-major (one vectorized multiply + add per
    dimension, j ascending), which performs exactly the same IEEE-double
    multiply-then-add sequence per (row, cell) as the ``aggregate`` fold —
    no FMA, no numpy pairwise summation, same ``2.0*dot`` and ``c2 - .``
    rounding order, same first-index argmin tie-break. Pinned by
    tests/test_plans.py (exact per-row cell equality on the sf corpus).

    Returns (id_col, vec_col, cell) via one Arrow ``mapInPandas`` pass —
    narrow, no shuffle; partitionBy("cell") downstream is the 10^12-row
    materialization strategy."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = centroids if centroids is not None else ivf_centroid_values(dim, n_centroids)
    # mirror the literal plan constant: python-float sequential sum (exact
    # for half-integer components, and identical rounding regardless)
    c2_list = [sum(v * v for v in cv) for cv in cents]

    out_schema = StructType(
        [f for f in embeddings.schema.fields if f.name in (id_col, vec_col)]
        + [StructField("cell", IntegerType(), False)]
    )

    def gen(batches):
        C = np.asarray(cents, dtype=np.float64)  # (k, dim), exact
        c2 = np.asarray(c2_list, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cell=np.array([], dtype=np.int32))
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # float32 -> double is exact
            acc = np.zeros((X.shape[0], C.shape[0]))
            for j in range(C.shape[1]):  # dim-major: the fold's add order
                acc += X[:, j : j + 1] * C[None, :, j]
            d = c2[None, :] - 2.0 * acc
            out = pdf[[id_col, vec_col]].copy()
            out["cell"] = np.argmin(d, axis=1).astype(np.int32)
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(gen, schema=out_schema)


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an inverted file: every vector is assigned to
    its nearest coarse centroid (one narrow per-row pass — at 10^12 rows this
    is the column you materialize and partition by); each query scans only
    its n_probe nearest cells. Probed cells are distinct, so no pair is
    scored twice. Queries broadcast; the join hashes on the cell id.

    ``centroids`` serves the index from an explicit (e.g. ``ivf_train``-ed)
    quantizer instead of the default deterministic hash centroids — the real
    IVF deployment shape: train once, serve many. Trained centroids cut the
    probes needed at equal recall (pinned by tests/test_recall.py).

    ``vectorized=True`` additionally scores candidates in the same numpy
    kernel class as the assignment (``_scored_topk_partials``): the query
    vectors and their python-replayed probe-cell sets (bit-identical to
    ``ivf_probe_cells_col`` — same dist fold, same (dist, idx) tie-break)
    ride inside the kernel, each task emits its partial top-k, and the
    cell-keyed broadcast join + per-pair HOF cosine leave the plan."""
    from .exprutil import let

    cells_lit = _ivf_cells_lit(dim, n_centroids, centroids)
    if vectorized:
        # production assignment: numpy mapInPandas, bit-identical to the
        # HOF (see assign_cells_vectorized) — keeps the oracle green while
        # dropping the interpreted 64x64 expression from the hot path
        base = assign_cells_vectorized(
            embeddings, n_centroids=n_centroids, dim=dim,
            id_col=id_col, vec_col=vec_col, centroids=centroids,
        ).select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), "cell"
        )
        cents = centroids if centroids is not None else ivf_centroid_values(dim, n_centroids)
        c2 = [sum(v * v for v in cv) for cv in cents]  # _ivf_cells_lit's literal
        queries = _query_rows(embeddings, n_queries, id_col, vec_col)
        probe_cells = {}
        for qid, qv in queries:
            dists = [c2[c] - 2.0 * _py_dot(qv, cents[c]) for c in range(len(cents))]
            probe_cells[qid] = [i for _d, i in sorted(zip(dists, range(len(cents))))[:n_probe]]
        return _rank_topk(
            _scored_topk_partials(base, queries, k, probe_cells=probe_cells), k
        )
    base = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        ivf_cell_col(ivf_dists_col(F.col(vec_col), cells_lit)).alias("cell"),
    )
    qs = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            let(
                ivf_dists_col(F.col(vec_col), cells_lit),
                lambda d: ivf_probe_cells_col(d, n_probe),
            )
        ).alias("cell"),
    )
    scored = (
        base.join(F.broadcast(qs), "cell")
        .where(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("cand_id"),
            cosine_col(F.col("qv"), F.col("vec")).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def ivf_train_step(
    embeddings: DataFrame,
    centroids: list[list[float]],
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """One distributed Lloyd iteration: assign every vector to its nearest
    centroid (the vectorized production assignment path), then recompute
    each centroid as the mean of its members — the real IVF training path,
    entirely as DataFrame aggregations (posexplode to (cell, dim, value),
    one groupBy; no vectors ever reach the driver, only the k x dim means).

    Returns the updated centroid list (empty cells keep their previous
    centroid, the standard k-means convention). The per-(cell, dim) mean is
    a DETERMINISTIC left-fold sum in ascending-id order divided by the
    member count — not ``F.avg``, whose partial-aggregate order varies with
    partitioning, making trained centroids differ in the last ulp between
    runs. The fold makes training bit-reproducible AND bit-checkable against
    an external SQL twin (the driver oracle unrolls these exact folds in
    DuckDB: ``list_reduce(list_prepend(0.0, list(x ORDER BY vid)), +)``).
    Cost: the fold materializes each cell's member values as one sorted
    array per (cell, dim) group — bounded by training-sample occupancy; at
    10^12 rows you train on a sample anyway (see ``ivf_train``), where this
    is noise next to the assignment pass."""
    assigned = assign_cells_vectorized(
        embeddings, n_centroids=len(centroids), dim=dim,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
    ).select(
        F.col(id_col).alias("vid"), "cell",
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    means = (
        assigned.groupBy("cell", "dim")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("vid"), F.col("x").cast("double").alias("x")))
            ).alias("xs")
        )
        .select(
            "cell", "dim",
            (
                F.aggregate(F.col("xs"), F.lit(0.0), lambda a, s: a + s["x"])
                / F.size(F.col("xs"))
            ).alias("m"),
        )
        .collect()  # k*dim tiny rows
    )
    out = [list(cv) for cv in centroids]
    by_cell: dict[int, dict[int, float]] = {}
    for r in means:
        by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["m"])
    for cell, dims in by_cell.items():
        out[cell] = [dims.get(j, out[cell][j]) for j in range(dim)]
    return out


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = 5,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """k-means training end-to-end: Forgy init (the first n_centroids data
    vectors by id — deterministic, and a top-k read at any scale) seeds
    ``iters`` distributed Lloyd steps. Returns the trained quantizer to pass
    to ``ivf_topk(centroids=...)`` — the train-once/serve-many deployment
    shape. Each step is one narrow assignment pass + one k x dim aggregate;
    at 10^12 rows you would train on a uniform sample instead (standard IVF
    practice), which is a ``.sample()`` on the way in.

    Seeding from DATA matters: the deterministic hash centroids sit far from
    any real embedding cloud, so assignment degenerates to argmin |c|^2 —
    on the test corpora every vector lands in ONE cell, and hash-centroid
    IVF prunes nothing (its recall is vacuous). The hash variant remains
    the bit-exact ORACLE twin (plan shape under test); the trained path is
    the one with a real recall/scan trade-off (tests/test_recall.py pins
    occupancy spread and the recall-vs-probes curve)."""
    seed_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col)
        .limit(n_centroids).collect()
    )
    cents = [[float(x) for x in r[vec_col]] for r in seed_rows]
    if len(cents) < n_centroids:  # tiny corpus: pad with hash centroids
        cents += ivf_centroid_values(dim, n_centroids)[len(cents):]
    for _ in range(iters):
        cents = ivf_train_step(embeddings, cents, dim=dim,
                               vec_col=vec_col, id_col=id_col)
    return cents


def ivf_inertia(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Mean distance proxy (|c|^2 - 2 x.c) to the assigned centroid — a
    monotone stand-in for k-means inertia, enough to verify descent."""
    cells_lit = _ivf_cells_lit(len(centroids[0]), len(centroids), centroids)
    return (
        embeddings.select(
            F.array_min(ivf_dists_col(F.col(vec_col), cells_lit)).alias("d")
        )
        .agg(F.avg("d"))
        .collect()[0][0]
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compression half of ANN at scale
# ---------------------------------------------------------------------------

#: PQ geometry: m sub-blocks of dim/m components, k centroids per block.
#: 8 blocks x 16 centroids = 8 4-bit codes per vector — a 64-dim float32
#: embedding (256 B) compresses to 4 B of codes, the 64x reduction that
#: makes a 10^12-vector serving tier fit in memory; IVF routes queries to
#: cells, PQ scores the cell members from codes (the standard pairing).
PQ_BLOCKS = 8
PQ_CENTROIDS = 16


def pq_train(
    embeddings: DataFrame,
    m: int = PQ_BLOCKS,
    k: int = PQ_CENTROIDS,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the m per-block codebooks — each is k-means over the block's
    dim/m-component slices, run through the SAME deterministic Lloyd
    machinery as the IVF quantizer (``ivf_train``: Forgy seed from the
    first k vectors by id, left-fold means), so trained PQ is
    bit-reproducible and the DuckDB oracle can replay all m trainings.
    Returns codebooks[m][k][dim/m]."""
    sub = dim // m
    books = []
    for b in range(m):
        blk = embeddings.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), b * sub + 1, sub).alias(vec_col),
        )
        books.append(
            ivf_train(blk, n_centroids=k, iters=iters, dim=sub,
                      vec_col=vec_col, id_col=id_col)
        )
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, codes array<int>): per block, the index of the nearest
    codebook centroid — the narrow per-row pass whose OUTPUT is what a
    10^12-row deployment materializes (the float vectors leave the serving
    tier). One numpy Arrow pass; per-block distances replay the
    c2 - 2*(dim-major fold) order of ``assign_cells_vectorized``, so the
    SQL twin's argmin picks identical codes."""
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])

    def gen(batches):
        import pandas as pd

        C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]   # (k, sub)
        c2 = [np.asarray([sum(v * v for v in cv) for cv in cb]) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({
                    "vid": pd.Series([], dtype=object),
                    "codes": pd.Series([], dtype=object),
                })
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for b in range(m):
                Xb = X[:, b * sub:(b + 1) * sub]
                acc = np.zeros((X.shape[0], C[b].shape[0]))
                for j in range(sub):  # dim-major: the fold's add order
                    acc += Xb[:, j:j + 1] * C[b][None, :, j]
                codes[:, b] = np.argmin(c2[b][None, :] - 2.0 * acc, axis=1)
            out = pdf[[id_col]].copy()
            out.columns = ["vid"]
            out["codes"] = [list(map(int, row)) for row in codes]
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="vid bigint, codes array<int>"
    )


def pq_assign_encode(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, cell, codes) in ONE Arrow pass — the fusion of
    ``assign_cells_vectorized`` + ``pq_encode`` (r6): the two kernels read
    the same vectors, and joining their outputs on vid paid two exchanges
    for rows that were born co-located. Both computations replay their
    originals bit-exactly (same dim-major folds, same literal c2 sums);
    pinned row-equal to the join form by pytest."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = dim // m
    c2_cells = [sum(v * v for v in cv) for cv in centroids]

    def gen(batches):
        CC = np.asarray(centroids, dtype=np.float64)
        cc2 = np.asarray(c2_cells)
        C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        c2 = [np.asarray([sum(v * v for v in cv) for cv in cb]) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            acc = np.zeros((X.shape[0], CC.shape[0]))
            for j in range(dim):
                acc += X[:, j:j + 1] * CC[None, :, j]
            cells = np.argmin(cc2[None, :] - 2.0 * acc, axis=1).astype(np.int32)
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for b in range(m):
                Xb = X[:, b * sub:(b + 1) * sub]
                a = np.zeros((X.shape[0], C[b].shape[0]))
                for j in range(sub):
                    a += Xb[:, j:j + 1] * C[b][None, :, j]
                codes[:, b] = np.argmin(c2[b][None, :] - 2.0 * a, axis=1)
            out = pdf[[id_col]].copy()
            out.columns = ["vid"]
            out["cell"] = cells
            out["codes"] = [list(map(int, row)) for row in codes]
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="vid bigint, cell int, codes array<int>"
    )


def _py_pq_table(qv: list[float], codebooks: list, sub: int) -> list[float]:
    """Python twin of ``_pq_table_col``: per block b and centroid j,
    c2 - 2*dot(q_b, c_j) with the literal c2 sum and the ascending fold —
    identical IEEE sequence to the expression."""
    tab = []
    for b, cb in enumerate(codebooks):
        qb = qv[b * sub:(b + 1) * sub]
        for cv in cb:
            tab.append(sum(v * v for v in cv) - 2.0 * _py_dot(qb, cv))
    return tab


def _adc_topk_partials(
    cands: DataFrame,
    queries: list[tuple],
    k: int,
    m: int,
    kcent: int,
    probe_cells: dict | None = None,
) -> DataFrame:
    """Per-task partial top-k by ADC distance — the PQ sibling of
    ``_scored_topk_partials``: each query's flattened m x kcent table rides
    inside the kernel, candidates cost one numpy gather + add per block
    (the same ascending-block fold as ``_adc_col``), and only each task's
    k best (adc ASC, cand_id ASC) reach the ranking window. ``queries``
    is [(query_id, tab_list)]; ``cands`` is (cand_id, codes[, cell])."""
    import numpy as np
    import pandas as pd

    qids = [q[0] for q in queries]
    tabs = [np.asarray(q[1]) for q in queries]
    probes = (
        [np.asarray(sorted(probe_cells[qid]), dtype=np.int64) for qid in qids]
        if probe_cells is not None else None
    )
    nq = len(qids)
    has_cell = "cell" in [f.name for f in cands.schema.fields]

    def gen(batches):
        best_key = [np.empty(0)] * nq
        best_id = [np.empty(0, dtype=np.int64)] * nq
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["cand_id"].to_numpy()
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            cells = pdf["cell"].to_numpy() if has_cell else None
            for qi in range(nq):
                mask = ids != qids[qi]
                if cells is not None and probes is not None:
                    mask &= np.isin(cells, probes[qi])
                if not mask.any():
                    continue
                sub_codes = codes[mask]
                sid = ids[mask]
                acc = np.zeros(len(sid))
                t = tabs[qi]
                for b in range(m):  # ascending blocks: _adc_col's fold order
                    acc += t[b * kcent + sub_codes[:, b]]
                take = np.lexsort((sid, acc))[: k]
                kk = np.concatenate((best_key[qi], acc[take]))
                ii = np.concatenate((best_id[qi], sid[take]))
                order = np.lexsort((ii, kk))[: k]
                best_key[qi] = kk[order]
                best_id[qi] = ii[order]
        out = {"query_id": [], "cand_id": [], "adc_dist": []}
        for qi in range(nq):
            for t_ in range(len(best_id[qi])):
                out["query_id"].append(qids[qi])
                out["cand_id"].append(int(best_id[qi][t_]))
                out["adc_dist"].append(float(best_key[qi][t_]))
        yield pd.DataFrame(out, columns=["query_id", "cand_id", "adc_dist"])

    return cands.mapInPandas(
        gen, schema="query_id bigint, cand_id bigint, adc_dist double"
    )


def _pq_table_col(qv: Column, codebooks: list, sub: int) -> Column:
    """Flattened m*k ADC table for one query vector: per block, the
    c2 - 2*q_b.c proxy against that block's codebook (fold order matches
    the numpy encode and the SQL twin)."""
    from .exprutil import let

    def block_table(cells: Column):
        # a closure, NOT `lambda q, cells=cells`: pyspark sniffs lambda
        # arity and a defaulted second parameter turns the binding into
        # the (element, index) transform form — cells would silently
        # become the index (see the identical note in layout._cumsum_col)
        return lambda q: F.transform(
            cells, lambda s: s["c2"] - 2.0 * dot_col(q, s["cv"])
        )

    parts = []
    for b, cb in enumerate(codebooks):
        cells = _ivf_cells_lit(sub, len(cb), cb)
        parts.append(let(F.slice(qv, b * sub + 1, sub), block_table(cells)))
    return F.concat(*parts)


def _adc_col(m: int, kcent: int) -> Column:
    """ADC sum from the bound `tab` and `codes` columns: fold blocks
    ascending from 0.0 — the engine-portable order."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(
            F.col("tab"), b * kcent + F.element_at(F.col("codes"), b + 1) + 1
        ),
    )


def pq_topk(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): each
    query precomputes one m x k distance table against the codebooks
    (c2 - 2*q_b.c — the same monotone L2 proxy as IVF), then every
    candidate costs m TABLE LOOKUPS instead of a dim-length float scan —
    the arithmetic that makes exhaustive scoring of a coarse cell feasible
    when vectors live as codes. Queries broadcast with their flattened
    tables; the ADC sum folds blocks in ascending order from 0.0 (the
    engine-portable order); ties rank by candidate id.

    ``vectorized=True`` (r6): the query tables ride inside a numpy kernel
    (``_adc_topk_partials``) that emits per-task partial top-k — the
    cross join and the interpreted per-pair ADC fold leave the plan;
    bit-identical tables/sums (python twin of ``_pq_table_col``)."""
    from .exprutil import let

    m = len(codebooks)
    kcent = len(codebooks[0])
    sub = dim // m
    codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    if vectorized:
        queries = [
            (qid, _py_pq_table(qv, codebooks, sub))
            for qid, qv in _query_rows(embeddings, n_queries, id_col, vec_col)
        ]
        scored = _adc_topk_partials(
            codes.select(F.col("vid").alias("cand_id"), "codes"),
            queries, rerank if rerank else k, m, kcent,
        )
    else:
        qs = embeddings.where(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"),
            _pq_table_col(F.col(vec_col), codebooks, sub).alias("tab"),
        )
        adc = _adc_col(m, kcent)
        scored = (
            codes.crossJoin(F.broadcast(qs))
            .where(F.col("vid") != F.col("query_id"))
            .select(
                "query_id", F.col("vid").alias("cand_id"), adc.alias("adc_dist")
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("cand_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= (rerank if rerank else k))
        .select("query_id", "cand_id", "adc_dist", "rank")
    )
    if not rerank:
        return shortlist
    vecs = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    qvecs = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    exact = (
        F.broadcast(shortlist.select("query_id", "cand_id"))
        .join(vecs, "cand_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "cand_id",
                cosine_col(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_queries: int = 20,
    k: int = 5,
    n_probe: int = IVF_PROBE,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """IVF-PQ — the composed industry-standard ANN serving architecture:
    the trained IVF quantizer ROUTES (every vector materialized with its
    coarse cell; queries probe their n_probe nearest cells only) and the
    trained PQ codebooks SCORE (cell members cost m table lookups each
    from 4-bit codes — no float vectors in the scan). At 10^12 vectors
    this is the tier layout: codes + cell ids live in memory
    (~code bytes/vector), float vectors stay in cold storage and are
    touched only by ``rerank``'s shortlist fetch.

    Both components are the bit-deterministic trained artifacts
    (``ivf_train`` / ``pq_train``), so the DuckDB oracle replays coarse
    training, all block trainings, encoding, probe selection, and the
    ADC fold — the full composition is hash-checked end to end.

    ``vectorized=True`` (r6): one fused kernel assigns cells AND encodes
    codes (``pq_assign_encode`` — the separate assign/encode kernels were
    joined on vid, two exchanges for born-co-located rows), and the ADC
    scoring runs as per-task partial top-k with python-replayed probe
    cells — the cell broadcast join and the interpreted fold leave the
    plan."""
    from .exprutil import let

    m = len(codebooks)
    kcent = len(codebooks[0])
    sub = dim // m
    if vectorized:
        cands = pq_assign_encode(
            embeddings, centroids, codebooks, dim=dim,
            id_col=id_col, vec_col=vec_col,
        ).select(F.col("vid").alias("cand_id"), "cell", "codes")
        c2 = [sum(v * v for v in cv) for cv in centroids]
        qrows = _query_rows(embeddings, n_queries, id_col, vec_col)
        queries = [(qid, _py_pq_table(qv, codebooks, sub)) for qid, qv in qrows]
        probe_cells = {}
        for qid, qv in qrows:
            dists = [c2[c] - 2.0 * _py_dot(qv, centroids[c])
                     for c in range(len(centroids))]
            probe_cells[qid] = [
                i for _d, i in sorted(zip(dists, range(len(centroids))))[:n_probe]
            ]
        scored = _adc_topk_partials(
            cands, queries, rerank if rerank else k, m, kcent,
            probe_cells=probe_cells,
        )
    else:
        base = assign_cells_vectorized(
            embeddings, n_centroids=len(centroids), dim=dim,
            id_col=id_col, vec_col=vec_col, centroids=centroids,
        ).select(F.col(id_col).alias("vid"), "cell")
        codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
        cands = base.join(codes, "vid")

        cells_lit = _ivf_cells_lit(dim, len(centroids), centroids)
        qs = embeddings.where(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"),
            _pq_table_col(F.col(vec_col), codebooks, sub).alias("tab"),
            F.explode(
                let(
                    ivf_dists_col(F.col(vec_col), cells_lit),
                    lambda d: ivf_probe_cells_col(d, n_probe),
                )
            ).alias("cell"),
        )
        scored = (
            cands.join(F.broadcast(qs), "cell")
            .where(F.col("vid") != F.col("query_id"))
            .select(
                "query_id", F.col("vid").alias("cand_id"),
                _adc_col(m, kcent).alias("adc_dist"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("cand_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= (rerank if rerank else k))
        .select("query_id", "cand_id", "adc_dist", "rank")
    )
    if not rerank:
        return shortlist
    vecs = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    qvecs = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    exact = (
        F.broadcast(shortlist.select("query_id", "cand_id"))
        .join(vecs, "cand_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "cand_id",
                cosine_col(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
