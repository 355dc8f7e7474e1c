"""Skew-aware partitioning (SURVEY.md section 4 "custom Spark work").

The skew strategy has three layers, matching the north rule:

1. **Cost-salted hash partitioning** for the doc-level UDF stages:
   ``repartition(n, xxhash64(doc_id, salt))`` — expected cost per partition
   is uniform because the key is a hash; the salt decorrelates consecutive
   runs. (A global cost-sort would balance better but requires a
   single-partition sort — not viable at 10^12 docs.)
2. **Span-level fan-out for the heavy tail** (``restitch.process_spans``):
   docs whose span count exceeds the threshold are exploded so no single
   task owns a giant doc; this is what actually bounds the straggler, since
   hashing cannot split one key.
3. **Arrow batch bounding** (``spark.sql.execution.arrow.maxRecordsPerBatch``
   in ``session.py``): one giant doc cannot blow a Python worker's memory.

``partition_cost_stats`` measures the result (max/mean estimated cost per
partition) — used by tests and the bench to show balance, not just assert it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_unsplittable(df: DataFrame, key: str) -> DataFrame:
    """Unsplittable-input guard (optimization guide §2.5 "input skew"): a
    parquet scan cannot split inside a row group, so a SINGLE ROW-GROUP
    file (the driver corpora; gzip-class inputs in production) yields its
    30+ configured splits with every row in ONE of them — every narrow
    stage above the scan (the derive->ocr->restitch chain, every Arrow
    kernel) then runs on one core regardless of cluster size (measured: a
    mapInPandas probe saw 50000/50000 rows in one task at sf1.0). One
    deterministic hash repartition on the table id right after the read
    moves a few MB once and unlocks full parallelism downstream. Partition
    count follows the session's parallelism (x2 slack for hash imbalance),
    so the same code is right at any cluster size; SPARK_GRAFT_SPREAD=0
    disables it (splittable production layouts), SPARK_GRAFT_SPREAD=N pins
    N. Hash on the id (not round-robin) keeps row placement deterministic
    under task retry (guide §2.5, SPARK-38388) and skips the
    sort-before-repartition pass a keyless repartition pays."""
    import os

    spark = df.sparkSession
    n = int(os.environ.get("SPARK_GRAFT_SPREAD",
                           2 * spark.sparkContext.defaultParallelism))
    if n <= 0:
        return df
    return df.repartition(n, F.col(key))


def doc_cost_col(spans: Column) -> Column:
    """Estimated parse cost of a doc: total text bytes + a per-media charge
    (media dominates when OCR fires; mirrors the reference's page-count
    progress estimate, tasks.py:345-354)."""
    return F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.length(s["text"])
        + F.when(s["kind"] == "media", 256).otherwise(0),
    )


def cost_salted_repartition(
    spans_df: DataFrame, num_partitions: int, salt: int = 0
) -> DataFrame:
    """Uniform-in-expectation cost spread for the doc-level stages."""
    return spans_df.repartition(
        num_partitions, F.xxhash64(F.col("doc_id"), F.lit(salt))
    )


def partition_cost_stats(spans_df: DataFrame) -> dict:
    """{'n_partitions', 'max_cost', 'mean_cost', 'balance'} where balance =
    max/mean (1.0 is perfect). The per-partition totals are reduced to
    (count, max, sum) SERVER-side — one scalar row reaches the driver, so
    calling this against a 100k-partition frame is safe (the previous form
    collected one row per partition)."""
    per_part = (
        spans_df.select(doc_cost_col(F.col("spans")).alias("cost"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("cost").alias("cost"))
        .select(F.coalesce(F.col("cost"), F.lit(0)).alias("cost"))
    )
    row = per_part.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("cost").alias("mx"),
        F.sum("cost").alias("tot"),
    ).collect()[0]
    n = row["n"] or 0
    mx = row["mx"] or 0
    mean = (row["tot"] or 0) / max(n, 1)
    return {
        "n_partitions": n,
        "max_cost": mx,
        "mean_cost": mean,
        "balance": (mx / mean) if mean else 0.0,
    }
