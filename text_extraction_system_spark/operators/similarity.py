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
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    The query side is broadcast (explicitly) — the candidate scan never
    shuffles; only k*n_queries rows reach the ranking window.
    """
    qs = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cands = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        cands.join(F.broadcast(qs))
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_col(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def srp_plane_col(dim: int, n_planes: int) -> Column:
    """Deterministic hyperplanes: plane p component j =
    hexval(md5(p || ':' || j)[0]) - 7.5 (zero-mean, reproducible anywhere)."""
    def component(p: Column, j: Column) -> Column:
        c = F.substring(F.md5(F.concat(p.cast("string"), F.lit(":"), j.cast("string"))), 1, 1)
        return (F.instr(F.lit(_HEX), c) - 1 - F.lit(7.5)).cast("double")

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda j: component(p, j)),
    )


def srp_bucket_col(vec: Column, planes: Column) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec . plane_p)."""
    signs = F.transform(
        planes,
        lambda pl: F.when(dot_col(vec, pl) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(signs, "")


def srp_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates restricted to the
    same SRP bucket (the 10^12-vector shape — all-pairs never materializes),
    verified with the exact cosine and thresholded."""
    planes = srp_plane_col(dim, n_planes)
    wb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        srp_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    a = wb.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"), "bucket")
    b = wb.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def srp_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket.

    The bucket column is a narrow per-row expression; the join is hash-
    partitioned on bucket — this is the plan that survives when the corpus
    no longer fits a broadcast.
    """
    planes = srp_plane_col(dim, n_planes)
    with_bucket = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        srp_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    qs = with_bucket.where(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qv"), "bucket"
    )
    cands = with_bucket.select(
        F.col("vid").alias("cand_id"), F.col("vec").alias("cv"), "bucket"
    )
    scored = (
        cands.join(F.broadcast(qs), "bucket")
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine_col(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
