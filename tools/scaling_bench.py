"""Scale-up measurement behind SCALING.md: build a 10× replica of sf0.1
(shifted keys) in /tmp/sf1, then time representative queries at
sf0.01 / sf0.1 / sf1′ with the bench methodology (best-of-2, noop sink).

Usage: python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sf1"
REP = 10
SHIFT = 10_000_000

QUERIES = [
    "genre_kpis_daily_onepass",
    "hourly_kpis_fast",
    "a3_hourly_distinct_counts",
    "dedup_minhash_lsh",
    "text_tfidf_top_terms",
    "sessionize_events",
    "j4_multiway_dim_rollup",
]


def build(spark) -> None:
    if os.path.exists(f"{OUT}/lineitem.parquet/_SUCCESS"):
        return
    reps = spark.range(REP).select(F.col("id").alias("rep"))

    def replicate(table: str, key: str, parts: int) -> None:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        big = (
            df.crossJoin(reps)
            .withColumn(key, F.col(key) + F.col("rep") * SHIFT)
            .drop("rep")
        )
        big.repartition(parts).write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")

    replicate("lineitem", "l_orderkey", 32)
    replicate("documents", "doc_id", 16)
    replicate("events", "event_id", 16)
    for t in ["part", "orders", "customer", "nation", "region", "supplier", "embeddings"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )


def main() -> None:
    spark = get_spark("scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    specs = all_specs()
    spark.read.parquet(f"{OUT}/lineitem.parquet").count()  # warmup
    for label, d in [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1x10", OUT),
    ]:
        row = {}
        for q in QUERIES:
            best = None
            for _ in range(2):
                t0 = time.time()
                specs[q].fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            row[q] = round(best, 2)
        print(label, json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
