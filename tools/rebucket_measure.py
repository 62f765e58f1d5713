"""Growth replica for SnapshotTable.rebucket (r14, VERDICT r13 ask 2):
the near-dup / pack index tables fix their bucket count at creation from
an expected-rows estimate, so a corpus that grows far past the estimate
makes every whole-bucket read O(corpus/constant) — the exact hazard the
IVF requantize migration closed for list counts. This replica puts the
restored bound on record:

- seed a bucketed keyed table at the UNDERSIZED creation-time count b0
  (as if the corpus then grew ~n/b0-per-bucket past the estimate),
- measure the per-bucket read (rows + wall) and a single-key
  merge_bucketed (the applier's per-batch rewrite unit) at b0,
- rebucket to the properly-sized b1 (one atomic
  commit_buckets(replace_all_buckets=True) pass),
- re-measure: rows-per-bucket and the bucket-granular op walls must drop
  ~b1/b0, restoring the O(corpus/constant)->O(constant) bound.

Usage: python tools/rebucket_measure.py [n_rows] [b0] [b1]
(defaults 800_000 8 128 — a 16x resize)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_rebucket_measure"
SCHEMA = "k long, s string"


def measure(spark, t, n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )

    occ = t.bucket_occupancy(spark, "k")
    # single-bucket read: the unit every probe / erase / merge pays
    walls, rows = [], 0
    for _ in range(3):
        t0 = time.monotonic()
        rows = t.read_buckets(spark, [1], SCHEMA, n_buckets=n_buckets).count()
        walls.append(time.monotonic() - t0)
    read_wall = sorted(walls)[1]
    # single-key merge: the applier's per-batch rewrite unit
    delta = spark.createDataFrame([(12345, "upd")], SCHEMA).select(
        "k", F.col("s").alias("d_s")
    )
    t0 = time.monotonic()
    t.merge_bucketed(
        spark,
        delta,
        on="k",
        update={"s": "d_s"},
        insert_defaults={"s": "d_s"},
        n_buckets=n_buckets,
        schema=SCHEMA,
    )
    merge_wall = time.monotonic() - t0
    return {
        "n_buckets": n_buckets,
        "rows_per_bucket_mean": occ["mean_bucket_rows"],
        "rows_per_bucket_max": occ["max_bucket_rows"],
        "bucket_read_rows": rows,
        "bucket_read_wall_s": round(read_wall, 3),
        "single_key_merge_wall_s": round(merge_wall, 2),
    }


def main() -> int:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    b0 = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b1 = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    spark = get_spark("rebucket_measure")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    t = SnapshotTable(f"{ROOT}/t")
    bucket0 = SnapshotTable.bucket_of(F.col("k"), b0)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("s"),
    )
    t.commit_buckets(
        df.withColumn("_bucket", bucket0),
        list(range(b0)),
        n_buckets=b0,
        extra={"last_batch_id": 41},
    )
    before = measure(spark, t, b0)
    t0 = time.monotonic()
    t.rebucket(spark, "k", b1)
    mig_wall = time.monotonic() - t0
    assert t.latest_manifest_field("last_batch_id") == 41  # cursor survives
    after = measure(spark, t, b1)
    print({"phase": "before", **before})
    print({
        "phase": "rebucket",
        "n_rows": n,
        "wall_s": round(mig_wall, 2),
        "us_per_row": round(mig_wall / n * 1e6, 2),
    })
    print({"phase": "after", **after})
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
