"""Fresh-key 100x growth probes for the r8-r10 flagships (VERDICT r10
task 4): text_bm25_topk, pack_sequences_sharded, er_resolve_customers_capped,
streaming_bm25_index_topk — the repo's only 100x row predated all four —
plus the many-pre-existing-tails / small-batch replica for the r11
pack-index tail-maintenance fix (VERDICT r10 task 1 Done-criterion).

Methodology = tools/fresh_growth_measure.py (fresh keys, never replica
cliques): k disjoint copies of the sf0.1 base tables —

- documents: per-copy token suffix + doc_id offset, so each copy's
  vocabulary / shard space is disjoint and k-fold growth is NEW content
  (BM25 df tables grow, packing shards multiply, no cross-copy dups);
- customer: c_custkey offset per copy AND the 9-digit account suffix in
  c_name re-based per copy, so ER blocks/accounts stay internally
  consistent per copy and disjoint across copies (block sizes — the
  thing the cap bounds — stay exactly the base corpus's).

Each query runs its REAL registered path against a parquet fixture dir;
the timer wraps fn() + noop sink because the streaming queries do their
work eagerly inside fn(). Reported: best-of-2 after a warmup run.

The tail replica: seed a pack index with N one-doc shards (N = 2k / 50k),
then time applying a CONSTANT 12-doc batch. Per-batch wall must stay flat
in N (the r10 code read+broadcast every tail in each touched bucket —
O(N/buckets) per batch; the r11 prune makes it O(batch shards)).

Usage: python tools/scale100_r11.py [k ...]     (default 1 10 100)
       python tools/scale100_r11.py tails       (only the tail replica)
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
ROOT = "/tmp/spark_engine_scale100_r11"

QUERIES = [
    "text_bm25_topk",
    "pack_sequences_sharded",
    "er_resolve_customers_capped",
    "streaming_bm25_index_topk",
    # measured again after the r11 maxFilesPerTrigger fix (the option had
    # been on the writeStream, silently ignored — the "incremental" runs
    # were single-batch); streaming_pack_index joins so its r10 growth
    # row gets a corrected multi-batch number too
    "streaming_pack_index",
]

# filter: python tools/scale100_r11.py only=q1,q2 k...
def _apply_only(args: list[str]) -> list[str]:
    global QUERIES
    keep = [a for a in args if a.startswith("only=")]
    if keep:
        QUERIES = keep[0][len("only="):].split(",")
    return [a for a in args if not a.startswith("only=")]


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

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    # re-base the 9-digit account suffix per copy: accounts stay 9 digits
    # (base < 1e6, copy offset 1e6 each), blocks disjoint across copies
    rebased = F.concat(
        F.expr("substring(c_name, 1, length(c_name) - 9)"),
        F.lpad(
            (
                F.expr("CAST(right(c_name, 9) AS BIGINT)")
                + F.col("_c") * 1_000_000
            ).cast("string"),
            9,
            "0",
        ),
    )
    cust.crossJoin(copies).select(
        (F.col("c_custkey") + F.col("_c") * OFFSET).alias("c_custkey"),
        rebased.alias("c_name"),
        *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
    ).repartition(max(k, 4)).write.parquet(f"{d}/customer.parquet")
    with open(f"{d}/_DONE", "w") as fh:
        fh.write("ok")
    return d


def run_growth(spark, ks: list[int]) -> None:
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    specs = all_specs()
    for k in ks:
        d = build_fixture(spark, k)
        for name in QUERIES:
            walls = []
            for _ in range(3):
                t0 = time.time()
                specs[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(time.time() - t0)
            best = min(walls[1:])  # first run is warmup
            print(
                f"k={k:>3} {name}: best-of-2-after-warmup {best:.2f} s "
                f"(runs: {', '.join(f'{w:.2f}' for w in walls)})",
                flush=True,
            )


def run_tail_replica(spark) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        SHARD_SPAN,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_pack_index_applier,
        pack_index_buckets_for,
    )

    schema = "doc_id long, text string, source string"
    for n_shards in (2_000, 50_000):
        root = f"{ROOT}/tails_{n_shards}"
        shutil.rmtree(root, ignore_errors=True)
        packs_t = SnapshotTable(f"{root}/packs")
        tails_t = SnapshotTable(f"{root}/tails")
        nb = pack_index_buckets_for(n_shards * SHARD_SPAN)
        applier = make_pack_index_applier(
            packs_t, tails_t, n_buckets=nb, record_stats=True
        )
        seed = spark.createDataFrame(
            [(s * SHARD_SPAN, "w " * 30, "s0") for s in range(n_shards)],
            schema,
        )
        applier(seed, 0)
        # constant 12-doc batch continuing 12 existing shards
        batch = spark.createDataFrame(
            [(s * SHARD_SPAN + 1, "w " * 30, "s0") for s in range(12)],
            schema,
        )
        walls = []
        for i in range(3):
            t0 = time.time()
            applier(batch.withColumn("doc_id", batch.doc_id + i + 1), i + 1)
            walls.append(time.time() - t0)
        st = applier.last_stats
        print(
            f"tails={n_shards:>6} n_buckets={nb:>3}: per-batch "
            f"best {min(walls):.2f} s (runs "
            f"{', '.join(f'{w:.2f}' for w in walls)}), tail rows read "
            f"= {st['tails_read_rows']} of {n_shards} for "
            f"{st['batch_shards']} batch shards",
            flush=True,
        )


def main() -> None:
    args = _apply_only(sys.argv[1:])
    spark = get_spark("scale100_r11")
    spark.sparkContext.setLogLevel("ERROR")
    if args == ["tails"]:
        run_tail_replica(spark)
        return
    ks = [int(x) for x in args] or [1, 10, 100]
    run_growth(spark, ks)


if __name__ == "__main__":
    main()
