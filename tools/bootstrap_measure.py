"""Bulk-bootstrap vs chunked-replay seeding cost for the r15 bootstrap
family (BM25 / IVF / pack) — the measured counterpart of the semantic
index's 23h-vs-43s finding (SCALING.md r15).

For each index the SAME synthetic corpus is stood up twice:
- CHUNKED: the corpus replayed through the streaming applier in
  ``chunk``-doc batches — the honest replica of steady-state ingest and
  the WRONG bootstrap: per chunk it pays one-to-two Spark jobs plus a
  bucketed merge/append commit, so seeding wall is O(chunks) driver-side
  sequential jobs with per-chunk write amplification (BM25: the touched
  df buckets rewrite every chunk; pack: the tails buckets; IVF: appended
  list dirs + periodic LSM folds).
- BULK: the r15 ``bulk_seed_*`` one-batch build.

After both legs the two states are equality-checked (content counts +
keyed aggregates), so the timing compares IDENTICAL outcomes.

Synthetic fixtures (deterministic, no RNG):
- documents: doc_id + text of 40 words drawn as ``w<(id*40+k) % vocab>``
  — fixed 20k-term vocabulary, so the BM25 df table sees realistic
  repeated-term merges and pack docs have constant-ish token counts.
- embeddings: the semantic tool's sin((id+1)k) unit-spread vectors.

Usage: python tools/bootstrap_measure.py [n_docs] [chunk] [bm25|pack|ivf ...]
(defaults: n_docs=100000, chunk=2000, all three indexes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = f"/tmp/spark_engine_bootstrap_measure_{os.getpid()}"
VOCAB = 20_000
DIM = 64


def synth_docs(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, 39), "
            f"k -> concat('w', pmod(id * 40 + k, {VOCAB}))), ' ')"
        ).alias("text"),
        F.lit("s0").alias("source"),
    )


def synth_vecs(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), "
            f"k -> cast(sin((id + 1) * k) as float))"
        ).alias("embedding"),
    )


def _tables(tag: str, names: tuple[str, ...]):
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable

    d = os.path.join(ROOT, tag)
    shutil.rmtree(d, ignore_errors=True)
    return tuple(SnapshotTable(os.path.join(d, n)) for n in names)


def measure_bm25(spark, n_docs: int, chunk: int) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    nb = ing.bm25_index_buckets_for(VOCAB)
    cp, cd = _tables("bm25_chunked", ("postings", "df"))
    apply_batch = ing.make_bm25_index_applier(cp, cd, n_buckets=nb)
    t0 = time.time()
    n_chunks = 0
    for i, lo in enumerate(range(0, n_docs, chunk)):
        apply_batch(synth_docs(spark, lo, min(lo + chunk, n_docs)), i)
        n_chunks += 1
    chunked_s = time.time() - t0
    bp, bd = _tables("bm25_bulk", ("postings", "df"))
    t0 = time.time()
    ing.bulk_seed_bm25_index(
        spark, bp, bd, synth_docs(spark, 0, n_docs), nb, batch_id=n_chunks - 1
    )
    bulk_s = time.time() - t0

    def sig(p, d):
        post = p.read(spark).agg(
            F.count("*"), F.sum(F.col("tf") * F.col("doc_id"))
        ).first()
        dfs = d.read(spark).agg(F.count("*"), F.sum("df")).first()
        return (
            tuple(post),
            tuple(dfs),
            p.latest_manifest_field("n_docs"),
            p.latest_manifest_field("sum_dl"),
        )

    assert sig(cp, cd) == sig(bp, bd), "bm25 bulk != chunked"
    return {
        "index": "bm25",
        "n_docs": n_docs,
        "chunks": n_chunks,
        "df_buckets": nb,
        "chunked_s": round(chunked_s, 2),
        "bulk_s": round(bulk_s, 2),
        "speedup": round(chunked_s / bulk_s, 1),
    }


def measure_pack(spark, n_docs: int, chunk: int) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    nb = ing.pack_index_buckets_for(n_docs)
    cp, ct = _tables("pack_chunked", ("packs", "tails"))
    apply_batch = ing.make_pack_index_applier(cp, ct, n_buckets=nb)
    t0 = time.time()
    n_chunks = 0
    for i, lo in enumerate(range(0, n_docs, chunk)):
        apply_batch(synth_docs(spark, lo, min(lo + chunk, n_docs)), i)
        n_chunks += 1
    chunked_s = time.time() - t0
    bp, bt = _tables("pack_bulk", ("packs", "tails"))
    t0 = time.time()
    ing.bulk_seed_pack_index(
        spark, bp, bt, synth_docs(spark, 0, n_docs), nb, batch_id=n_chunks - 1
    )
    bulk_s = time.time() - t0

    def sig(p, t):
        packs = p.read(spark).agg(
            F.count("*"),
            F.sum(F.col("pack_id") * F.col("doc_id")),
            F.sum("pack_used"),
        ).first()
        tails = t.read(spark).agg(
            F.count("*"), F.sum("pack_id"), F.sum("used"), F.sum("last_doc_id")
        ).first()
        return (tuple(packs), tuple(tails))

    assert sig(cp, ct) == sig(bp, bt), "pack bulk != chunked"
    return {
        "index": "pack",
        "n_docs": n_docs,
        "chunks": n_chunks,
        "tails_buckets": nb,
        "chunked_s": round(chunked_s, 2),
        "bulk_s": round(bulk_s, 2),
        "speedup": round(chunked_s / bulk_s, 1),
    }


def measure_ivf(spark, n_vecs: int, chunk: int) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    centroid_rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in synth_vecs(spark, 0, sa.N_LIST).collect()
    ]
    (ct,) = _tables("ivf_chunked", ("index",))
    apply_batch = sa.make_ivf_index_applier(ct, centroid_rows)
    t0 = time.time()
    n_chunks = 0
    for i, lo in enumerate(range(0, n_vecs, chunk)):
        apply_batch(synth_vecs(spark, lo, min(lo + chunk, n_vecs)), i)
        n_chunks += 1
    chunked_s = time.time() - t0
    (bt,) = _tables("ivf_bulk", ("index",))
    t0 = time.time()
    sa.bulk_seed_ivf_index(
        spark,
        bt,
        centroid_rows,
        synth_vecs(spark, 0, n_vecs),
        batch_id=n_chunks - 1,
    )
    bulk_s = time.time() - t0

    def sig(t):
        return tuple(
            t.read(spark)
            .agg(F.count("*"), F.sum(F.col("cid") * F.col("vec_id")))
            .first()
        )

    assert sig(ct) == sig(bt), "ivf bulk != chunked"
    return {
        "index": "ivf",
        "n_vecs": n_vecs,
        "chunks": n_chunks,
        "n_lists": sa.N_LIST,
        "chunked_s": round(chunked_s, 2),
        "bulk_s": round(bulk_s, 2),
        "speedup": round(chunked_s / bulk_s, 1),
    }


def measure_minhash(spark, n_docs: int, chunk: int) -> dict:
    """The lexical-LSH leg (with_pairs=False on BOTH sides is not
    possible — the applier always discovers pairs — so the bulk side
    runs with_pairs=False + backfill_minhash_pairs to land on the SAME
    final state, which is exactly the deployment recipe the deferred
    bootstrap documents)."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    def synth_docs(spark_, lo, hi):
        # distinct texts (prime modulus ≫ corpus: no accidental exact
        # copies, sparse term overlap) — the signature/band path runs
        # for EVERY doc instead of collapsing onto a few canonicals
        return spark_.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(0, 39), "
                "k -> concat('w', pmod(id * 41 + k * 7, 100003))), ' ')"
            ).alias("text"),
        )

    nb = ing.minhash_index_buckets_for(n_docs)
    ct = _tables(
        "mh_chunked", ("pairs", "bands", "shingles", "groups", "members")
    )
    apply_batch = ing.make_minhash_index_applier(*ct, n_buckets=nb)
    t0 = time.time()
    n_chunks = 0
    for i, lo in enumerate(range(0, n_docs, chunk)):
        apply_batch(synth_docs(spark, lo, min(lo + chunk, n_docs)), i)
        n_chunks += 1
    chunked_s = time.time() - t0
    bt = _tables("mh_bulk", ("pairs", "bands", "shingles", "groups", "members"))
    t0 = time.time()
    ing.bulk_seed_minhash_index(
        spark,
        *bt,
        synth_docs(spark, 0, n_docs),
        nb,
        batch_id=n_chunks - 1,
        with_pairs=False,
    )
    bulk_s = time.time() - t0
    t0 = time.time()
    n_backfilled = ing.backfill_minhash_pairs(spark, bt[0], bt[1], bt[2])
    backfill_s = time.time() - t0

    def sig(ts):
        pairs = ts[0].read(spark).agg(
            F.count("*"), F.sum(F.col("da") + F.col("db"))
        ).first()
        bands = ts[1].read(spark).count()
        members = ts[4].read(spark).agg(
            F.count("*"), F.sum("doc_id")
        ).first()
        return (tuple(pairs), bands, tuple(members))

    assert sig(ct) == sig(bt), "minhash bulk+backfill != chunked"
    return {
        "index": "minhash",
        "n_docs": n_docs,
        "chunks": n_chunks,
        "buckets": nb,
        "chunked_s": round(chunked_s, 2),
        "bulk_s": round(bulk_s, 2),
        "backfill_s": round(backfill_s, 2),
        "pairs_backfilled": n_backfilled,
        "speedup": round(chunked_s / (bulk_s + backfill_s), 1),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    nums = [a for a in args if a.isdigit()]
    which = [a for a in args if not a.isdigit()] or ["bm25", "pack", "ivf"]
    n = int(nums[0]) if nums else 100_000
    chunk = int(nums[1]) if len(nums) > 1 else 2_000
    spark = get_spark()
    try:
        for w in which:
            fn = {
                "bm25": measure_bm25,
                "pack": measure_pack,
                "ivf": measure_ivf,
                "minhash": measure_minhash,
            }[w]
            print(json.dumps(fn(spark, n, chunk)), flush=True)
    finally:
        shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
