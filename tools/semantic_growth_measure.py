"""Steady-state growth replica for the streaming semantic near-dup index
(r12): seed the five-table state with N distinct vectors, then time a
CONSTANT 200-vector batch at 1x and 4x seed size. NOTE the honest
expectation: at the REGISTRY's LSH layout (16 bands x 4 bits, tuned to
tau=0.45 at the driver's scales) a 200-vector batch's codes cover all
256 bk values, so probe candidates grow O(batch x N / 2^r) — LINEAR in
the stored index. That is the layout's analytic property (the batch
operator pays the same O(n^2/2^r) per full recompute; the incremental
index still wins corpus/batch per batch), and the mitigation is a
production layout (8-12 bits with a higher tau) which prunes 2^r-way
through the SAME protocol. This replica measures the envelope so the
number is on record. The COPY-HEAVY batch (200 exact copies of one
stored vector) must stay O(batch) regardless: the collapse front makes
it member-append-only (no banding, no probe, no verify).

Synthetic fixture: deterministic unit-spread vectors (sin((id+1)k) per
dimension, 64 dims to match the LSH planes).

Usage: python tools/semantic_growth_measure.py [seed_n] [lsh_bits] [--single]
(defaults: seed_n=2000, the registry 4-bit layout; without --single the
tool runs two legs, seed_n and 4*seed_n, each seeded from scratch).

``--single`` runs ONE leg at exactly seed_n — added for the r15 10^6
leg, where seeding 10^6 vectors in the proven 2k chunks is ~500 applier
batches (hours of wall) and the 4x sibling would double an already
multi-hour run for a point past the ask. Seeding progress is printed
every 25 chunks with a wall-derived ETA so an infeasible run can be
detected and aborted early instead of silently eating the round.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

# per-invocation root: a shared constant once let one invocation's exit
# cleanup rmtree a CONCURRENT invocation's live state mid-seed (r15)
ROOT = f"/tmp/spark_engine_semantic_growth_{os.getpid()}"
DIM = 64
BATCH_N = 200


def synth(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), k -> cast(sin((id + 1) * k) as float))"
        ).alias("embedding"),
    )


def run(spark, seed_n: int, bits: int | None = None, bulk: bool = False) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        bulk_seed_semantic_index,
        make_semantic_index_applier,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        minhash_index_buckets_for,
    )

    work = f"{ROOT}/n{seed_n}_b{bits or 4}"
    shutil.rmtree(work, ignore_errors=True)
    names = ("pairs", "bands", "vecs", "groups", "members")
    p, b, v, g, m = (SnapshotTable(f"{work}/{n}") for n in names)
    bk = dict(
        band_buckets=minhash_index_buckets_for(seed_n * 16),
        vec_buckets=minhash_index_buckets_for(seed_n),
        group_buckets=minhash_index_buckets_for(seed_n),
        member_buckets=minhash_index_buckets_for(seed_n),
    )
    apply_batch = make_semantic_index_applier(
        p, b, v, g, m, record_stats=True, lsh_bits=bits, **bk
    )
    t_seed0 = time.monotonic()
    if bulk:
        # r15 bootstrap path: ONE batch build of the stored state
        # (with_pairs=False — the applier never reads PAIRS, so the
        # measured constant-batch walls are unaffected; verified by the
        # 250k incremental-vs-bulk cross-check in SCALING.md r15). The
        # chunked protocol's seeding wall is O(N^2/2^r) in total; this
        # is what makes the 10^6 leg reachable on one host.
        bulk_seed_semantic_index(
            spark, p, b, v, g, m, synth(spark, 0, seed_n),
            lsh_bits=bits, with_pairs=False, **bk,
        )
        bid = 1
        print(
            f"[bulk seed n={seed_n}] wall={time.monotonic() - t_seed0:.0f}s",
            flush=True,
        )
    else:
        # seed in 2k chunks — the incremental shape; feasible only to
        # ~10^5 on one host (per-chunk cost grows linearly with stored N
        # — the probe's O(chunk x N/2^r) term; measured ~23 h at 10^6)
        CHUNK = 2_000
        bid = 0
        n_chunks = (seed_n + CHUNK - 1) // CHUNK
        for lo in range(0, seed_n, CHUNK):
            apply_batch(synth(spark, lo, min(lo + CHUNK, seed_n)), bid)
            bid += 1
            if bid % 25 == 0 or bid == n_chunks:
                el = time.monotonic() - t_seed0
                eta = el / bid * (n_chunks - bid)
                print(
                    f"[seed n={seed_n}] chunk {bid}/{n_chunks} "
                    f"elapsed={el:.0f}s eta={eta:.0f}s",
                    flush=True,
                )
    assert m.read(spark).count() == seed_n

    # measured op 1: a CONSTANT fresh-vector batch
    walls = []
    for rep in range(3):
        lo = seed_n + rep * BATCH_N
        batch = synth(spark, lo, lo + BATCH_N).localCheckpoint(eager=True)
        t0 = time.monotonic()
        apply_batch(batch, bid + rep)
        walls.append(time.monotonic() - t0)
    fresh_wall = sorted(walls)[1]
    fresh_stats = dict(apply_batch.last_stats)

    # measured op 2: a copy-heavy batch (200 exact copies of stored vec 7)
    copies = (
        synth(spark, 7, 8)
        .crossJoin(spark.range(BATCH_N).select(F.col("id").alias("k")))
        .select(
            (F.lit(10_000_000) + F.col("k")).alias("vec_id"), "embedding"
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.monotonic()
    apply_batch(copies, bid + 10)
    copy_wall = time.monotonic() - t0
    copy_stats = dict(apply_batch.last_stats)
    return {
        "seed_n": seed_n,
        "lsh_bits": bits or 4,
        "fresh_batch_wall_s": round(fresh_wall, 2),
        "fresh_driver_rows": fresh_stats["driver_collected_rows"],
        "copy_batch_wall_s": round(copy_wall, 2),
        "copy_new_signatures": int(
            v.read(spark).where("vec_id >= 10000000").count()
        ),
        "copy_driver_rows": copy_stats["driver_collected_rows"],
    }


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    single = "--single" in sys.argv[1:]
    bulk = "--bulk" in sys.argv[1:]
    seed_n = int(argv[0]) if len(argv) > 0 else 2_000
    bits = int(argv[1]) if len(argv) > 1 else None
    spark = get_spark("semantic_growth")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (seed_n,) if single else (seed_n, seed_n * 4):
        out = run(spark, n, bits, bulk=bulk)
        out["seeding"] = "bulk" if bulk else "chunked"
        print(out, flush=True)
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
