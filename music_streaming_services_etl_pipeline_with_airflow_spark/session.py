"""SparkSession factory tuned for both local testing and the 100 TB design
point.

Scale notes (local[32] here; 1000-executor cluster in production):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting — the
  genre/hour group keys in the reference workload are low-cardinality and
  skewed, exactly what AQE skew handling is for.
- ``spark.sql.shuffle.partitions`` sized from env (32 locally); at cluster
  scale AQE coalesces from a high initial number, so we set the *initial*
  number, not a hand-tuned final one.
- UTC session timezone so date/hour extraction is engine-independent and
  matches the DuckDB oracle (naive timestamps).
- ``parquet.nanosAsLong``: the driver testdata writes TIMESTAMP(NANOS)
  which Spark's vectorized reader rejects; we read as long and convert
  once at the source boundary (sources.tables).
- Arrow enabled for the few Pandas-UDF operators (multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "music-streaming-spark-engine") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of our tuning to a session we did
    not create (the driver hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # foreign sessions default to 200 shuffle partitions — size to the
        # local core count (AQE coalesces upward workloads anyway)
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus),
        )
    except Exception:
        pass  # static confs on a live session: best-effort
    return spark
