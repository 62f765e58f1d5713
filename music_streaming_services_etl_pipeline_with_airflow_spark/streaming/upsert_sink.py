"""foreachBatch upsert sink — the streaming end of the idempotency fix.

The reference's warehouse load is append-only COPY (re-runs duplicate rows,
SURVEY §8.6). In streaming, exactly-once-per-partition lands as
``foreachBatch`` + dynamic partition overwrite: each micro-batch rewrites
only the date partitions it touches, so replays (or late re-deliveries of a
whole partition) converge instead of duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import sinks


def partition_overwrite_each_batch(path: str, partition_by: tuple[str, ...] = ("date",)):
    """Returns the foreachBatch callback: micro-batch → idempotent
    partition-overwrite into the warehouse path."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from . import ingest as _ingest

        _ingest._capture_plan(
            "streaming_foreachbatch_upsert.batch_frame", batch_df
        )
        sinks.write_warehouse(batch_df, path, partition_by, mode="overwrite_partitions")

    return _write


# ---------------------------------------------------------------------------
# Registry entry: the full streaming→warehouse production path as a query
# ---------------------------------------------------------------------------

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register


@register(
    "streaming_foreachbatch_upsert",
    # Real oracle: availableNow over the bounded staged folder makes the
    # warehouse read-back equal the plain per-(date, event_type) count.
    # Idempotency under replay is additionally pinned by
    # test_foreachbatch_upsert_sink.
    """
    SELECT CAST(ts AS DATE) AS date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc="The production streaming→warehouse path end-to-end: events file "
    "stream → per-(date, event_type) counts → foreachBatch dynamic "
    "partition overwrite into a parquet warehouse → read the warehouse "
    "back. Replayed micro-batches rewrite their partitions instead of "
    "appending duplicates (the streaming end of the reference's §8.6 "
    "COPY-append fix). availableNow trigger; complete-mode aggregate "
    "restated per batch.",
)
def q_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .runner import EVENTS_SCHEMA, stage_events

    from ..workdirs import fresh_work_dir

    d = stage_events(sf_dir, "events_upsert")
    work = fresh_work_dir("streaming_foreachbatch_upsert")
    wh = os.path.join(work, "daily_counts")
    ckpt = os.path.join(work, "ckpt")
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    agg = src.groupBy(
        F.to_date("ts").alias("date"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    q = (
        agg.writeStream.foreachBatch(
            partition_overwrite_each_batch(wh, ("date",))
        )
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(wh).select(
        "date", "event_type", F.col("n_events").cast("long").alias("n_events")
    )
