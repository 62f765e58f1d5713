"""Realistic-growth scale rows for the four ops whose 10x REPLICA rows in
SCALING.md are superlinear (VERDICT r7 #6): curate_strip_shared_spans
(2.1x), dedup_source_overlap (1.7x), dedup_containment_banded (1.6x),
ivm_incremental_sessions (1.8x).

Replica scaling is adversarial for content ops: duplicating every document
10x turns each into a 10-way duplicate clique, so the measured growth mixes
genuine scaling cost with ~10x MORE ACTUAL OUTPUT WORK (every copy really
is a near-dup / really does lose its spans). Real corpus growth adds NEW
content. This tool measures that case, the same fresh-key methodology as
tools/triangle_scale_measure.py:

- documents: k disjoint copies; copy c offsets doc_id by c*OFFSET and
  suffixes EVERY TOKEN with "_c{c}", so each copy's shingle/window/token
  space is disjoint from every other copy's — corpus size scales by k
  while duplicate-pair density and per-doc span structure stay EXACTLY
  the base corpus's (each copy contains the same internal dup relations
  as sf0.1, and no cross-copy pair exists).
- events: k disjoint copies; copy c offsets user_id and event_id — new
  growth is new users, so per-user session structure is unchanged and
  the session_window shuffle simply carries k-fold rows.

Each fixture is materialized as parquet under /tmp so the REGISTERED query
functions run their real end-to-end path (scan included).

Usage: python tools/fresh_growth_measure.py [k ...]   (default 1 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OFFSET = 10_000_000
ROOT = "/tmp/spark_engine_fresh_growth"

DOC_QUERIES = [
    "dedup_containment_banded",
    "dedup_source_overlap",
    "curate_strip_shared_spans",
]
EVT_QUERIES = ["ivm_incremental_sessions"]


def build_fixture(spark, k: int) -> str:
    from pyspark.sql import functions as F

    d = f"{ROOT}/k{k}"
    if os.path.isdir(d) and os.path.exists(f"{d}/_DONE"):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    copies = spark.range(k).select(F.col("id").alias("_c"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # EVERY copy gets the per-copy token suffix — including copy 0, and
    # with a fixed-width copy tag — so the k=1 and k=10 fixtures carry
    # byte-identical per-doc text sizes and a k-fold fixture is EXACTLY
    # k-fold the bytes/tokens. (Previously copy 0 kept the unsuffixed base
    # text: 9 of 10 copies then ran ~1.4x the characters of the k=1
    # baseline, inflating every ratio the tool exists to measure.)
    # n_chars is recomputed to match the rewritten text.
    suffixed = F.concat_ws(
        " ",
        F.transform(
            F.split("text", " "),
            lambda w: F.concat(
                w, F.lit("_c"), F.lpad(F.col("_c").cast("string"), 3, "0")
            ),
        ),
    )
    scaled_docs = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_c") * OFFSET).alias("doc_id"),
        suffixed.alias("text"),
        "lang",
        "source",
        F.length(suffixed).cast("long").alias("n_chars"),
    )
    scaled_docs.repartition(max(k, 4)).write.parquet(f"{d}/documents.parquet")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    scaled_ev = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("_c") * OFFSET).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_c") * OFFSET).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled_ev.repartition(max(k, 4)).write.parquet(f"{d}/events.parquet")
    with open(f"{d}/_DONE", "w") as fh:
        fh.write("ok")
    return d


def main() -> None:
    ks = [int(x) for x in sys.argv[1:]] or [1, 10]
    spark = get_spark("fresh_growth")
    spark.sparkContext.setLogLevel("ERROR")
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    specs = all_specs()
    for k in ks:
        d = build_fixture(spark, k)
        for name in DOC_QUERIES + EVT_QUERIES:
            walls = []
            for _ in range(2):
                t0 = time.time()
                specs[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(time.time() - t0)
            print(
                f"k={k:>3} {name}: best-of-2 {min(walls):.2f} s "
                f"(runs: {', '.join(f'{w:.2f}' for w in walls)})",
                flush=True,
            )


if __name__ == "__main__":
    main()
