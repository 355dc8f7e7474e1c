"""Bucketed storage for co-located doc_id joins (SURVEY.md section 4 /
scale posture).

At 10^12 docs, every doc_id-keyed join (results vs new input for resume
deltas, results vs annotations, shard reconciliation) would shuffle both
sides. Bucketing the stored tables by doc_id pre-partitions them on disk:
Spark reads matching buckets and joins with NO Exchange on either side.
On Iceberg the same is `bucket(N, doc_id)` partition transforms +
storage-partitioned joins.

``tests/test_plans.py::test_bucketed_join_no_exchange`` pins the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, num_buckets: int = 16, key: str = "doc_id"
) -> None:
    """Persist as a bucketed+sorted table keyed for co-located joins."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key)
