"""Streaming dedup + stream-stream joins — the remaining Structured
Streaming operator families.

- ``streaming_dedup``: exactly-once event delivery from an at-least-once
  source via ``dropDuplicatesWithinWatermark`` — state holds only ids seen
  within the watermark horizon (bounded, unlike a naive dropDuplicates).
- ``stream_stream_interval_join``: correlate two event streams on key with
  an event-time interval condition; watermarks on both sides bound the
  join state. The canonical impression⋈click shape.

Both run with availableNow over staged folders and are pytest-verified
against their batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_mem_counter = [0]


def _run_to_memory(writer_df: DataFrame, output_mode: str = "append") -> DataFrame:
    _mem_counter[0] += 1
    name = f"sdj_mem_{_mem_counter[0]}"
    spark = writer_df.sparkSession
    q = (
        writer_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return spark.createDataFrame(out.collect(), out.schema)


def dedup_stream(
    spark: SparkSession, source_dir: str, schema: str, watermark: str = "1 hour"
) -> DataFrame:
    """At-least-once → exactly-once: drop replayed event_ids within the
    watermark horizon."""
    src = spark.readStream.schema(schema).parquet(source_dir)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return _run_to_memory(deduped)


def interval_join_streams(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    schema_left: str,
    schema_right: str,
    max_gap_minutes: int = 30,
) -> DataFrame:
    """impressions ⋈ clicks: same user, click within [impression_ts,
    impression_ts + gap]."""
    imp = (
        spark.readStream.schema(schema_left)
        .parquet(left_dir)
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        spark.readStream.schema(schema_right)
        .parquet(right_dir)
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            f"""imp_user = clk_user AND
                clk_ts >= imp_ts AND
                clk_ts <= imp_ts + interval {max_gap_minutes} minutes"""
        ),
    ).select("imp_user", "imp_id", "clk_id", "imp_ts", "clk_ts")
    return _run_to_memory(joined)
