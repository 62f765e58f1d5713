"""Measure the CDC bucketed-write win: rewrite bytes per applied batch as a
function of touched buckets.

Builds a keyed state table of N_KEYS rows under the bucketed CDC applier
(256 buckets), then applies small change batches (1, 8, 64 keys) and
reports, for each, the bytes written by that commit vs the full state
bytes — expected ratio ≈ touched_buckets / 256, where the pre-round-7
applier rewrote 100% of the state every batch.

Usage: python tools/cdc_bucket_measure.py [n_keys]
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
    make_cdc_applier,
)

N_BUCKETS = 256
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def du(paths: list[str]) -> int:
    total = 0
    for p in paths:
        for dirpath, _, files in os.walk(p):
            total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("cdc_bucket_measure")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    root = "/tmp/spark_engine_cdc_measure"
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(f"{root}/state")
    apply_batch = make_cdc_applier(t, n_buckets=N_BUCKETS)

    base_ts = dt.datetime(2024, 1, 1)
    seed = spark.range(n_keys).select(
        F.col("id").alias("event_id"),
        F.lit(base_ts).cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    t0 = time.time()
    apply_batch(seed, 0)
    seed_s = time.time() - t0
    v1 = t.latest_version()
    state_bytes = du(t._manifest(v1)["dirs"])
    print(f"seeded {n_keys} keys into {N_BUCKETS} buckets: "
          f"{state_bytes/1e6:.1f} MB in {seed_s:.1f}s")

    for i, batch_keys in enumerate((1, 8, 64), start=1):
        delta = spark.range(batch_keys).select(
            (F.col("id") + 10_000_000 * i).alias("event_id"),
            F.lit(base_ts + dt.timedelta(minutes=i)).cast("timestamp").alias("ts"),
            (F.col("id") * 12345 % n_keys).alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(7.5).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        prev_v = t.latest_version()
        prev_map = t._bucket_map(prev_v)
        t0 = time.time()
        apply_batch(delta, i)
        wall = time.time() - t0
        v = t.latest_version()
        new_map = t._bucket_map(v)
        touched = [b for b in new_map if new_map[b] != prev_map.get(b)]
        written = du([d for b in touched for d in new_map[b]])
        print(
            f"batch of {batch_keys:>3} keys: touched {len(touched):>3}/{N_BUCKETS} "
            f"buckets, wrote {written/1e6:>7.2f} MB "
            f"({100.0 * written / state_bytes:>5.2f}% of state) in {wall:.1f}s"
        )

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
