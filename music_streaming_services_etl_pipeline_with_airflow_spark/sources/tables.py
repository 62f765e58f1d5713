"""Parquet testdata source (S4-equivalent for the driver tables).

Normalizes the one physical quirk of the driver data — ``events.ts`` is
written as parquet TIMESTAMP(NANOS), which Spark's vectorized reader will
only surface as a nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``)
— into a proper TimestampType at the source boundary, so every operator
downstream sees clean types.

Scale note: these are plain ``spark.read.parquet`` scans — column pruning
and predicate pushdown reach the parquet reader (verify with
``.explain``: ReadSchema / PushedFilters). No ``.cache()`` here; callers
decide on persistence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalize ``events.ts`` to TimestampType.

    The physical form of ``events.ts`` depends on the writer/reader pair:
    - parquet TIMESTAMP(NANOS) + ``nanosAsLong`` → ``bigint`` nanoseconds
      (PySpark ≤4.0 behavior this code was first written against);
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → ``timestamp_ntz``
      (what PySpark 4.1.2 surfaces for the same testdata);
    - already ``timestamp`` → pass through.
    All three converge to TimestampType here, at the ONE source boundary,
    so neither batch nor streaming code ever sees a physical unit again.
    """
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # int64 nanos -> microsecond timestamp. Integer division
            # (`div`), NOT `/1000`: float division routes an ~1.7e18 int64
            # through a double (2^53 mantissa) and lands ±1µs off.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            # NTZ wall-clock reinterpreted in the session tz (UTC in every
            # entrypoint here) — same instant, canonical type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register every driver table as a temp view → the spark.sql surface
    (SURVEY §2.9 / §3.3)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
