"""Steady-state growth replica for the streaming IVF index (r12): seed
the inverted-list table with N vectors, then time a CONSTANT 1k-vector
ingest batch at 1x and 10x seed size — per-batch cost must track the
BATCH (one broadcast-assign pass + bucket-granular appends), never the
stored index. Also pins the erase bound: deleting one vector rewrites
only the dirs of its own list that actually hold it (one parallel
pushed-down probe over all dirs), every other list carrying over by
reference.

Synthetic fixture: deterministic pseudo-random unit-free vectors
(sin(id*k) per dimension) over a 64-list quantizer — larger than the
testdata's N_LIST=8 so the probe exercises realistic list fan-out.

Usage: python tools/ivf_growth_measure.py [seed_n] (default 20000)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_ivf_growth"
DIM = 16
N_LISTS = 64
BATCH_N = 1_000


def synth(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            # (id+1): id=0 would give the all-zero vector (cosine
            # undefined / ANSI divide-by-zero)
            f"transform(sequence(1, {DIM}), k -> cast(sin((id + 1) * k) as float))"
        ).alias("embedding"),
    )


def run(spark, seed_n: int) -> dict:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        make_ivf_index_applier,
    )

    work = f"{ROOT}/n{seed_n}"
    shutil.rmtree(work, ignore_errors=True)
    t = SnapshotTable(f"{work}/index")
    centroid_rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in synth(spark, 0, N_LISTS).collect()
    ]
    apply_batch = make_ivf_index_applier(t, centroid_rows, n_lists=N_LISTS)
    apply_batch(synth(spark, 0, seed_n), 0)
    assert t.read(spark).count() == seed_n

    # measured op: a CONSTANT fresh batch against the accumulated index
    walls = []
    for rep in range(3):
        lo = seed_n + rep * BATCH_N
        batch = synth(spark, lo, lo + BATCH_N).localCheckpoint(eager=True)
        t0 = time.monotonic()
        apply_batch(batch, rep + 1)
        walls.append(time.monotonic() - t0)
    ingest_wall = sorted(walls)[1]

    # erase probe: one seed vector; only its list's matching dirs rewrite
    ev = seed_n // 2
    bm_before = t._bucket_map(t.latest_version())
    t0 = time.monotonic()
    t.delete_where(spark, f"vec_id = {ev}")
    erase_wall = time.monotonic() - t0
    bm_after = t._bucket_map(t.latest_version())
    rewritten = sum(
        1 for b in bm_before if bm_after[b] != bm_before[b]
    )
    calm = sum(1 for b in bm_before if bm_after[b] == bm_before[b])
    return {
        "seed_n": seed_n,
        "ingest_wall_s": round(ingest_wall, 2),
        "erase_wall_s": round(erase_wall, 2),
        "lists_rewritten_by_erase": rewritten,
        "lists_carried_by_reference": calm,
    }


def main() -> int:
    seed_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("ivf_growth")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (seed_n, seed_n * 10):
        print(run(spark, n))
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
