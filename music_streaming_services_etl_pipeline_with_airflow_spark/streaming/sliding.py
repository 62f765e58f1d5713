"""Sliding event-time windows + watermark late-data semantics.

Completes the §2.10 streaming mapping: tumbling (hourly_stream), session
(sessions), and here sliding windows — 1-hour windows every 15 minutes —
plus the watermark contract: in append mode, events later than the
watermark behind the max seen event time are dropped from closed windows.
Both behaviors are pinned by tests (batch-equivalence for the window
arithmetic; an explicit late-row drop scenario for the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Batch form of the sliding-window count — each event lands in
    window/slide overlapping windows (here 4)."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def run_sliding_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "15 minutes",
    query_name: str = "sliding_counts",
) -> DataFrame:
    """availableNow sliding-window aggregation with a watermark, append
    mode — returns the emitted (closed) windows."""
    src = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(query_name)
    return spark.createDataFrame(out.collect(), out.schema)
