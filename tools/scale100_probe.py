"""Two-orders-of-magnitude probe behind SCALING.md's 100x section: build a
100x replica of sf0.1 (shifted keys, same generator trick as
scaling_bench.py's 10x) in /tmp/sf10 — 60M lineitem, 100M events, 5M
documents, 1M embeddings — and time representative queries at sf0.1 and
sf10' with the noop-sink methodology.

Single-run timings (a 100x pass is too heavy for median-of-3 in CI; the
point here is the growth EXPONENT, not the third significant digit).

Usage: python tools/scale100_probe.py [query ...]
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
OUT = "/tmp/sf10"
REP = 100
SHIFT = 10_000_000

QUERIES = [
    # linear-scan KPI path
    "genre_kpis_daily_onepass",
    "a3_hourly_distinct_counts",
    "sessionize_events",
    # exact-integer OLAP on the 60M-row fact
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    # dedup family: the replica corpus is the adversarial case the
    # exact-collapse-first design exists for (every doc has 100 copies)
    "dedup_exact",
    "dedup_minhash_lsh",
    # ANN over 1M vectors
    "similarity_topk_bruteforce",
    # round 7: the composed IVF-PQ path at 1M vectors (sample-capped
    # training + pruned scan) and delta-join IVM over the 100M-event fact
    "similarity_ivfpq_topk",
    "ivm_incremental_join_enrich",
]


DONE = f"{OUT}/_BUILD_DONE"


def build(spark) -> None:
    # completion marker written LAST: an interrupted build (or a stale
    # partial replica from an older revision) is rebuilt, never trusted
    if os.path.exists(DONE):
        return
    reps = spark.range(REP).select(F.col("id").alias("rep"))

    def replicate(table: str, key: str, parts: int) -> None:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        big = (
            df.crossJoin(reps)
            .withColumn(key, F.col(key) + F.col("rep") * SHIFT)
            .drop("rep")
        )
        big.repartition(parts).write.mode("overwrite").parquet(
            f"{OUT}/{table}.parquet"
        )

    replicate("lineitem", "l_orderkey", 64)
    replicate("documents", "doc_id", 32)
    replicate("events", "event_id", 64)
    replicate("embeddings", "vec_id", 16)
    for t in ["part", "orders", "customer", "nation", "region", "supplier"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
    open(DONE, "w").close()


def main() -> None:
    spark = get_spark("scale100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    specs = all_specs()
    queries = sys.argv[1:] or QUERIES
    spark.read.parquet(f"{OUT}/lineitem.parquet").count()  # warmup
    for label, d in [("sf0.1", SRC), ("sf10x100", OUT)]:
        row = {}
        for q in queries:
            t0 = time.time()
            specs[q].fn(spark, d).write.format("noop").mode("overwrite").save()
            row[q] = round(time.time() - t0, 2)
        print(label, json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
