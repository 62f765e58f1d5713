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
    scratch: str | None = None,
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
    return run_stream_to_df(agg, scratch=scratch)


from ..plans.registry import register  # noqa: E402
from .runner import EVENTS_SCHEMA, run_stream_to_df, stage_events  # noqa: E402


@register(
    "streaming_sliding_window",
    # Real oracle: in append mode over one bounded staged folder the
    # emitted set is exactly the sliding windows the final watermark
    # closed — window_end <= max(ts) - 2h. Each event lands in 4
    # epoch-aligned windows: starts time_bucket(15min, ts) - k*15min,
    # k = 0..3.
    """
    WITH k AS (SELECT UNNEST(range(4)) AS k),
    w AS (
        SELECT time_bucket(INTERVAL '15 minutes', e.ts)
                   - k.k * INTERVAL '15 minutes' AS window_start
        FROM events e CROSS JOIN k
    ),
    g AS (
        SELECT window_start,
               window_start + INTERVAL '1 hour' AS window_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w GROUP BY 1
    )
    SELECT window_start, window_end, n_events
    FROM g
    WHERE window_end <= (SELECT MAX(ts) - INTERVAL '2 hours' FROM events)
    """,
    doc="Sliding event-time windows on a stream: 1-hour windows sliding "
    "every 15 minutes (each event in 4 windows) with a 2h watermark, "
    "APPEND mode — only windows the watermark has closed emit, so the "
    "result is replay-stable; the final horizon stays in state. "
    "availableNow trigger; batch-equivalence for the closed set pinned "
    "by tests/test_streaming_sliding.py.",
)
def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stage_events(sf_dir, "events_sliding")
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
    return run_stream_to_df(agg, scratch="streaming_sliding")
