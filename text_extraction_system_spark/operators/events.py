"""Event-stream batch analogs: sessionization and tumbling windows.

The reference has no stream semantics (SURVEY.md section 2.10) — these are
the standard large-pipeline operators added per the task brief. Batch
formulations here; ``streaming/`` carries the Structured Streaming twins.

Numeric note: double sums are not associative, so aggregates over the
``value`` column go through fixed-point micro-units (floor(x*1e6) as bigint)
— bit-stable regardless of partitioning and reproducible in any SQL engine
(double->decimal casts are NOT portable: Spark rounds the shortest decimal
repr, other engines the true binary value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_SEC = 1800


def _us(c) -> "F.Column":
    """Epoch micros of a (possibly NTZ) timestamp; session tz is pinned UTC
    so NTZ-as-UTC matches DuckDB's epoch_us on naive timestamps."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds ``gap_sec``. One shuffle (partition by user),
    then pure window functions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            _us(F.col("ts"))
            - _us(F.lag("ts").over(w))
            > gap_sec * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_sid = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sid.groupBy("user_id", "session_seq").agg(
        _us(F.min("ts")).alias("session_start_us"),
        _us(F.max("ts")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def tumbling_counts(events: DataFrame, interval: str = "hour") -> DataFrame:
    """Tumbling-window aggregate per (window, event_type); fixed-point sum."""
    return (
        events.select(
            _us(F.date_trunc(interval, F.col("ts"))).alias("window_start_us"),
            "event_type",
            F.floor(F.col("value") * F.lit(1000000.0)).cast("bigint").alias("v"),
        )
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_value_micros"),
        )
    )
