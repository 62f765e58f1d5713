"""Fresh-key 10x growth rows for the round-8 additions that still lack
SCALING.md entries (the continuation-session five + the earlier-r8 ops the
first campaign skipped).

Methodology = tools/fresh_growth_measure.py: k disjoint copies of the
sf0.1 base tables, every copy's keys offset into its own id space and
documents' tokens suffixed per copy, so duplicate/edge/entity structure
per copy is exactly the base corpus's and growth is NEW content, never
replica cliques. Per-table scaling:

- documents: per-copy token suffix + doc_id offset (disjoint vocab/ids)
- embeddings: vec_id offset per copy, vectors reused — fine for timing
  (dense scans cost bytes, not values) and for id-join universes
- orders/customer/lineitem: key columns offset per copy (o_orderkey,
  o_custkey / c_custkey / l_orderkey, l_partkey, l_suppkey) so joins and
  group keys stay internally consistent per copy and disjoint across

Each query runs its REAL registered path against the parquet fixture
(noop sink, best of 2 after warmup-by-first-run).

Usage: python tools/growth_measure_r8b.py [k ...]   (default 1 10)
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
ROOT = "/tmp/spark_engine_fresh_growth_r8b"

QUERIES = [
    "text_bm25_topk",
    "retrieval_rrf_hybrid",
    "warehouse_compact_small_files",
    "sink_orc_partitioned_roundtrip",
    "er_resolve_customers",
    "graph_kcore_parts",
    "similarity_ivf_persisted",
    "privacy_dp_lang_counts",
    "privacy_k_anonymity",
    # second wave of the continuation session
    "warehouse_zonemap_skipping",
    "warehouse_analyze_stats",
    "dq_join_skew_report",
    "text_chunk_overlap",
    "corpus_curriculum_phases",
    "ml_perceptron_quality_distill",
    "retrieval_bm25_cosine_rerank",
    "warehouse_change_feed",
    "ivm_from_change_feed",
    "warehouse_equidepth_histogram",
    "warehouse_schema_evolution",
    "warehouse_vacuum_report",
    "retrieval_maxsim_late_interaction",
    "warehouse_row_provenance",
]


def build_fixture(spark, k: int) -> str:
    from pyspark.sql import functions as F

    d = f"{ROOT}/k{k}"
    if os.path.isdir(d) and os.path.exists(f"{d}/_DONE"):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    copies = spark.range(k).select(F.col("id").alias("_c"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    suffixed = F.concat_ws(
        " ",
        F.transform(
            F.split("text", " "),
            lambda w: F.concat(
                w, F.lit("_c"), F.lpad(F.col("_c").cast("string"), 3, "0")
            ),
        ),
    )
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_c") * OFFSET).alias("doc_id"),
        suffixed.alias("text"),
        "lang",
        "source",
        F.length(suffixed).cast("long").alias("n_chars"),
    ).repartition(max(k, 4)).write.parquet(f"{d}/documents.parquet")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("_c") * OFFSET).alias("vec_id"),
        "embedding",
        "label",
    ).repartition(max(k, 4)).write.parquet(f"{d}/embeddings.parquet")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    okeys = {"o_orderkey", "o_custkey"}
    orders.crossJoin(copies).select(
        *[
            (F.col(c) + F.col("_c") * OFFSET).alias(c)
            if c in okeys
            else F.col(c)
            for c in orders.columns
        ]
    ).repartition(max(k, 4)).write.parquet(f"{d}/orders.parquet")

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    cust.crossJoin(copies).select(
        *[
            (F.col(c) + F.col("_c") * OFFSET).alias(c)
            if c == "c_custkey"
            else F.col(c)
            for c in cust.columns
        ]
    ).repartition(max(k, 4)).write.parquet(f"{d}/customer.parquet")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lkeys = {"l_orderkey", "l_partkey", "l_suppkey"}
    li.crossJoin(copies).select(
        *[
            (F.col(c) + F.col("_c") * OFFSET).alias(c)
            if c in lkeys
            else F.col(c)
            for c in li.columns
        ]
    ).repartition(max(k, 4)).write.parquet(f"{d}/lineitem.parquet")

    with open(f"{d}/_DONE", "w") as fh:
        fh.write("ok")
    return d


def main() -> None:
    ks = [int(x) for x in sys.argv[1:]] or [1, 10]
    only = os.environ.get("ONLY")
    queries = [q for q in QUERIES if not only or q in only.split(",")]
    spark = get_spark("fresh_growth_r8b")
    spark.sparkContext.setLogLevel("ERROR")
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    specs = all_specs()
    for k in ks:
        d = build_fixture(spark, k)
        for name in queries:
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
