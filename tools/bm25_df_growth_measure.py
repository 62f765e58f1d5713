"""Vocabulary-growth replica for the streaming BM25 index's df table
(VERDICT r11 task 1): seed the index with a LARGE vocabulary (an id-heavy
corpus — every token unique, the 100 TB reality the r11 fixed-8 layout
ignored), then time a CONSTANT small batch under (a) the r12
vocabulary-sized bucket count and (b) the r11 fixed 8 — and count the df
rows each layout's merge rewrites. This is the pack-tails replica shape
on the term dimension: the steady-state ingestion case is a bounded
batch against an accumulated vocabulary, where fixed buckets make every
merge rewrite O(|vocab|/8) and sized buckets make it O(batch-terms x
bounded bucket population).

(The scale100 fresh-key fixture cannot show this: its per-copy token
suffixing yields a 3,100-term vocabulary at k=100 — df merges were never
its cost. Measured here instead, with the fixture that actually grows
the term space.)

Usage: python tools/bm25_df_growth_measure.py [seed_terms] (default 2M)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_bm25_df_growth"
DL = 20  # tokens per seed doc


def run(spark, seed_terms: int, n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_bm25_index_applier,
    )

    work = f"{ROOT}/nb{n_buckets}"
    shutil.rmtree(work, ignore_errors=True)
    postings_t = SnapshotTable(f"{work}/postings")
    df_t = SnapshotTable(f"{work}/df")
    apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=n_buckets)
    # batch 0 seeds the vocabulary: seed_terms/DL docs, every token unique
    n_docs = seed_terms // DL
    seed = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"u{j}_"), F.col("id")) for j in range(DL)]
        ).alias("text"),
    )
    apply_batch(seed, 0)
    vocab = df_t.read(spark).count()
    # the measured op: a CONSTANT 1-doc batch (5 reused + 5 new terms)
    walls, rewrites = [], []
    for i in (1, 2, 3):
        bm_pre = df_t._bucket_map(df_t.latest_version())
        batch = spark.createDataFrame(
            [
                (
                    10_000_000 + i,
                    f"u0_1 u1_1 u2_1 u3_1 u4_1 fresh{i}_a fresh{i}_b "
                    f"fresh{i}_c fresh{i}_d fresh{i}_e",
                )
            ],
            "doc_id long, text string",
        )
        t0 = time.time()
        apply_batch(batch, i)
        walls.append(time.time() - t0)
        bm_post = df_t._bucket_map(df_t.latest_version())
        changed = [
            b
            for b in set(bm_pre) | set(bm_post)
            if bm_pre.get(b) != bm_post.get(b)
        ]
        rewrites.append(
            spark.read.parquet(
                *[d for b in changed for d in bm_post[b]]
            ).count()
            if changed
            else 0
        )
    return {
        "n_buckets": n_buckets,
        "vocab": vocab,
        "batch_wall_s": round(min(walls), 2),
        "df_rows_rewritten": min(rewrites),
    }


def main() -> None:
    seed_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark()
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        BM25_IDX_BUCKETS,
        bm25_index_buckets_for,
    )

    sized = bm25_index_buckets_for(seed_terms)
    rows = [run(spark, seed_terms, nb) for nb in (BM25_IDX_BUCKETS, sized)]
    print(f"{'layout':>10} {'vocab':>9} {'1-doc batch wall':>16} {'df rows rewritten':>18}")
    for r in rows:
        tag = f"fixed {r['n_buckets']}" if r is rows[0] else f"sized {r['n_buckets']}"
        print(
            f"{tag:>10} {r['vocab']:>9} {r['batch_wall_s']:>16} "
            f"{r['df_rows_rewritten']:>18}"
        )
    a, b = rows
    print(
        f"# sized layout rewrites {a['df_rows_rewritten'] / max(b['df_rows_rewritten'], 1):.1f}x "
        f"fewer df rows per constant batch"
    )


if __name__ == "__main__":
    main()
