"""Shuffle-byte A/B for the r16 hashed candidate-join keys
(dedup_containment_banded / dedup_minhash_lsh) on a 10× documents fixture.

The r15 verdict asked for proof that hashing the candidate keys cuts
SHUFFLE BYTES (the 100 TB cost), not just local wall — so this tool runs
the candidate-generation fragment of both pipelines in BOTH variants
(string keys = pre-r16 shape, xxhash64 keys = committed shape) inside one
session, and reads the per-run shuffle-write/read byte deltas from the
Spark REST status API.

Fixture: each sf0.1 document becomes 10 variants whose every token gets a
variant prefix ("v3_the v3_cat ..."), so texts and shingles are DISTINCT
across variants (no exact-dup collapse; candidate structure per variant
mirrors the original corpus) — 50k docs, ~10× distinct shingle volume.

Usage: python tools/candkey_shuffle_measure.py [--sf DIR] [--variants N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    banded_signatures,
    doc_shingles,
    minhash_signatures,
)


def shuffle_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages")
    )
    done = [s for s in stages if s["status"] == "COMPLETE"]
    return (
        sum(s["shuffleWriteBytes"] for s in done),
        sum(s["shuffleReadBytes"] for s in done),
    )


def containment_candidates(sh: DataFrame, hashed: bool) -> DataFrame:
    """The candidate-generation fragment of _containment_prefix_pairs —
    `hashed=False` reproduces the pre-r16 string-keyed shape verbatim."""
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    key = F.xxhash64("s").alias("k") if hashed else F.col("s").alias("k")
    shk = sh.select("doc_id", key)
    freq = shk.groupBy("k").agg(F.count("*").alias("s_freq"))
    ranked = (
        shk.join(freq, "k")
        .join(counts, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("s_freq", "k")),
        )
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.floor(
            (1 - CONTAINMENT_THRESHOLD) * F.col("n_sh") + F.lit(1e-9)
        ).cast("int")
        + 1
    ).select("doc_id", "k")
    return (
        prefix.select(F.col("doc_id").alias("pa"), "k")
        .join(shk.select(F.col("doc_id").alias("pb"), "k"), "k")
        .filter(F.col("pa") != F.col("pb"))
        .select(F.least("pa", "pb").alias("da"), F.greatest("pa", "pb").alias("db"))
        .distinct()
    )


def minhash_candidates(sh: DataFrame, hashed: bool) -> DataFrame:
    """lsh_candidate_pairs with the compress knob (md5 = pre-r16 layout)."""
    sigs = minhash_signatures(sh)
    bands = banded_signatures(sigs, compress=F.xxhash64 if hashed else None)
    a = bands.select(
        F.col("doc_id").alias("da"),
        "band",
        "bval",
        F.explode(F.array(F.col("g"), F.col("g") + 1)).alias("gk"),
    )
    b = bands.select(
        F.col("doc_id").alias("db"), "band", "bval", F.col("g").alias("gk")
    )
    return (
        a.join(b, ["band", "bval", "gk"])
        .filter(F.col("da") != F.col("db"))
        .select(F.least("da", "db").alias("da"), F.greatest("da", "db").alias("db"))
        .distinct()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--variants", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    # get_spark disables the UI; this tool needs the REST status API for
    # shuffle-byte metrics, so build the same session with the UI on.
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("candkey-shuffle-measure")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.concat(
                F.lit(f"v{k}_"),
                F.regexp_replace("text", " ", f" v{k}_"),
            ).alias("text"),
        )
        for k in range(args.variants)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(64).localCheckpoint(eager=True)  # fixture, untimed
    sh = doc_shingles(big).persist()
    n = sh.count()
    print(f"fixture: {big.count()} docs, {n} shingle rows")

    frags = {
        "containment_cand": containment_candidates,
        "minhash_cand": minhash_candidates,
    }
    for _ in range(args.rounds):
        for fname, fn in frags.items():
            for variant in ("string", "hashed"):
                df = fn(sh, hashed=(variant == "hashed"))
                w0, r0 = shuffle_totals(spark)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                w1, r1 = shuffle_totals(spark)
                print(
                    f"{fname:18s} {variant:7s} wall={wall:6.2f}s "
                    f"shuffle_write={(w1 - w0) / 1e6:9.1f}MB "
                    f"shuffle_read={(r1 - r0) / 1e6:9.1f}MB"
                )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
