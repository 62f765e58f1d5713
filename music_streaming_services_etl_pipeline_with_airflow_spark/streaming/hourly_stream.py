"""Structured Streaming upgrade of the hourly KPIs (SURVEY §2.10 mapping).

The reference's "streaming" is daily-rescanned CSV batches; the semantic
equivalents land here as a real stream: file source → event-time tumbling
window (1 hour) + watermark for late data → windowed aggregation →
``availableNow`` trigger (process-everything-then-stop, the batch-parity
mode) → memory sink.

At scale this is the production shape: the S3 drop-folder becomes
``readStream`` with file-notification, the watermark bounds state, and the
sink becomes a ``foreachBatch`` partition-overwrite upsert (sinks module).
Exact distinct counts are not allowed in streaming aggregation — the
streaming variant uses ``approx_count_distinct`` (HLL), exactly the 100 TB
recommendation for the batch path too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .runner import EVENTS_SCHEMA

def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the windowed streaming aggregation over the events file source to
    completion (availableNow) and return the result as a DataFrame."""
    # the file source requires a *directory* (the production drop-folder);
    # stage the events file into one (testdata itself is read-only)
    from .runner import run_stream_to_df, stage_events

    stream_dir = stage_events(sf_dir, "events")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
    )
    windowed = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
    )
    # complete-mode aggregation: the memory sink is the only complete-capable
    # sink; each run gets a unique table name inside run_stream_to_df, so the
    # lazy projection below stays valid with no driver round-trip here
    return run_stream_to_df(windowed, output_mode="complete").select(
        F.to_date("w.start").alias("date"),
        F.hour("w.start").cast("long").alias("hour"),
        "n_events",
        "approx_users",
    )


from ..plans.registry import register  # noqa: E402


@register(
    "streaming_hourly_window",
    # Real oracle: with availableNow over a bounded staged folder, the
    # complete-mode windowed aggregation equals the batch group-by exactly.
    # approx_users (HLL, engine-specific) stays on the underlying function
    # for the pytest parity check but is excluded from the oracle-compared
    # projection.
    """
    SELECT CAST(ts AS DATE) AS date,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming: file source → withWatermark(1h) → tumbling "
    "1-hour event-time window agg → availableNow trigger → memory sink. "
    "Oracle-checked on the exact fields (date, hour, n_events); the HLL "
    "approx_users column is pytest-only.",
)
def q_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_event_counts_stream(spark, sf_dir).select(
        "date", "hour", "n_events"
    )


@register(
    "streaming_topk_event_type",
    # availableNow + complete-mode agg ⇒ the materialized (window, type)
    # counts equal the batch group-by, so the ranked projection equals the
    # batch top-1 per hour with the same total-order tie-break.
    """
    WITH c AS (
        SELECT CAST(ts AS DATE) AS date,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS top_n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT date, hour, event_type AS top_event_type, top_n FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY date, hour
                                     ORDER BY top_n DESC, event_type) AS rn
        FROM c
    ) WHERE rn = 1
    """,
    doc="Streaming top-k: the reference's top-artist-per-hour (O2) semantic "
    "in-stream. The stream maintains incremental (1h window, event_type) "
    "counts — rank-over-window is not a streaming-supported operation, so "
    "the top-1 projection (count DESC, type ASC — total order) runs on the "
    "materialized snapshot at the sink, the standard agg-in-stream / "
    "rank-at-serving split a production dashboard uses. At scale the "
    "streaming state is |windows|x|types| counters (bounded by the "
    "watermark horizon), and the serving-side rank touches only that "
    "aggregate relation, never raw events.",
)
def q_streaming_topk_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .runner import run_stream_to_df, stage_events

    stream_dir = stage_events(sf_dir, "events")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
    )
    windowed = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("top_n"))
    )
    snap = run_stream_to_df(windowed, output_mode="complete").select(
        F.to_date("w.start").alias("date"),
        F.hour("w.start").cast("long").alias("hour"),
        F.col("event_type").alias("top_event_type"),
        "top_n",
    )
    rk = Window.partitionBy("date", "hour").orderBy(
        F.desc("top_n"), F.asc("top_event_type")
    )
    return (
        snap.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select("date", "hour", "top_event_type", "top_n")
    )


@register(
    "streaming_ohlc_window",
    # Real oracle: SHARED with the batch w11_ohlc_resample (one constant,
    # plans/breadth.OHLC_ORACLE) — with availableNow over a bounded staged
    # folder, the complete-mode windowed min_by/max_by aggregate equals
    # the batch per-(type, hour) selection exactly.
    None,  # placeholder; replaced below to avoid an import cycle at module top
    doc="Streaming OHLC: the market-data resample maintained IN-STREAM — "
    "per (event_type, 1h window) open/close by min_by/max_by over the "
    "total (ts, event_id) order, high/low extremes, complete mode. "
    "Selection aggregates carry their argmax inside the streaming "
    "partials, so the maintained state is O(windows), not O(events); "
    "the batch twin (w11_ohlc_resample) and this stream share ONE "
    "oracle string, so the two surfaces can never drift. The same "
    "-0.0 canonicalization applies (a {-0.0, 0.0} tie would otherwise "
    "pick an engine-arbitrary representative).",
)
def q_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .runner import run_stream_to_df, stage_events

    d = stage_events(sf_dir, "events_ohlc")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(d)
        .withColumn("value", F.col("value") + F.lit(0.0))
    )
    agg = (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, struct(ts, event_id))").alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
    return run_stream_to_df(agg, output_mode="complete")


def _wire_ohlc_oracle() -> None:
    """Attach the shared batch oracle post-registration (plans.breadth is
    already imported by the registry before the streaming modules, but a
    module-top import here would create a cycle on direct import)."""
    from ..plans.breadth import OHLC_ORACLE
    from ..plans.registry import _REGISTRY

    _REGISTRY["streaming_ohlc_window"].oracle = OHLC_ORACLE


_wire_ohlc_oracle()
