"""SparkSession factory with the engine's tuned configuration.

Scale posture (SURVEY.md section 4): Arrow enabled for every pandas UDF,
bounded Arrow batches so one giant document cannot blow an executor
(north-rule ``maxRecordsPerBatch``), AQE on for runtime coalescing/skew.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
#: r6: 512 -> 8192 rows, now paired with a BYTE bound (Spark 4's
#: maxBytesPerBatch). 512-row batches made the small-matrix numpy kernels
#: (PQ encode: 8 blocks x 16 centroids per batch) overhead-dominated; the
#: byte cap is the honest giant-row guard the record cap only proxied
#: (512 rows x 1 MB plain_text was 512 MB under the old setting; now any
#: batch stops at 32 MB regardless of row width).
DEFAULT_MAX_RECORDS_PER_BATCH = 8192
DEFAULT_MAX_BYTES_PER_BATCH = 32 << 20


def get_spark(
    app_name: str = "spark-text-extract",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate rewrites explode(expr) into
        # Filter(size(expr)>0 AND isnotnull(expr)) + explode(expr): for a
        # computed array column the pushed filter RE-EVALUATES the entire
        # expression per row (twice, once per conjunct) below the Generate —
        # for the derive->ocr->restitch span chain that tripled every
        # exploding query (extract_restitch 12.9 s -> 2.8 s at sf1.0, plan
        # shrank from 3 inlined copies of the chain to 1). Every explode in
        # this engine is over a computed/Arrow-produced array, where the
        # inferred filter only costs; none scans a stored array column where
        # it could prune I/O.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(DEFAULT_MAX_RECORDS_PER_BATCH))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(DEFAULT_MAX_BYTES_PER_BATCH))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # local mode: one JVM hosts all task threads — size the heap for the
        # thread count or GC serializes the interpreted-HOF allocation storm.
        # 64g (was 24g): a 47-query session accumulates plans/codegen/
        # broadcasts, and at 24g the LAST-built queries ran 3-5x their
        # isolated cost from GC pressure (curation_funnel 5.0 s in-sweep vs
        # 1.05 s isolated; 64g sweep: 1.14 s — guide §5). Heap is a max,
        # not a reservation; env-overridable for smaller hosts, and cluster
        # deployments size executors separately anyway.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
