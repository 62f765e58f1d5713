"""Sliding windows + watermark late-data semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.sliding import (
    sliding_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_sliding_windows_overlap_math(spark):
    """1h windows sliding 15min: every event is in exactly 4 windows, and
    each window's count equals the sum of events in its span."""
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    win = sliding_event_counts(ev)
    total = win.agg(F.sum("n_events")).first()[0]
    assert total == 4 * n_events


def _write_batch(spark, rows, path):
    df = spark.createDataFrame(rows, "ts timestamp, k string")
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Checkpointed continuation across two micro-batches (parquet file
    sink): an event arriving behind the watermark must not re-open its
    already-closed windows; an in-bound event must land."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run():
        stream = spark.readStream.schema("ts timestamp, k string").parquet(src)
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("window_start"), F.col("n").alias("n_events")
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.window_start, r.n_events) for r in spark.read.parquet(out).collect()}

    # batch 1: 00:30 and 12:00 → max event time 12:00, watermark 10:00 →
    # the 00:00-01:00 window family closes and emits
    _write_batch(
        spark,
        [
            (datetime.datetime(2024, 1, 1, 0, 30), "a"),
            (datetime.datetime(2024, 1, 1, 12, 0), "b"),
        ],
        src,
    )
    emitted1 = run()
    assert any(ws.hour == 0 for ws, _ in emitted1), "hour-0 windows must close"

    # batch 2: one LATE event (00:45 ≪ watermark) + one in-bound (12:30)
    _write_batch(
        spark,
        [
            (datetime.datetime(2024, 1, 1, 0, 45), "late"),
            (datetime.datetime(2024, 1, 1, 12, 30), "ok"),
        ],
        src,
    )
    emitted2 = run()
    delta = emitted2 - emitted1
    # late row dropped: no hour-0 window re-emits (no count change ever
    # becomes visible for a closed window)
    assert not any(ws.hour == 0 for ws, _ in delta), f"late rows leaked: {delta}"
    # run 1's emissions are immutable
    assert emitted1 <= emitted2
