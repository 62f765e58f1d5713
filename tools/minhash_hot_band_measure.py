"""Hot-band skew drill for the streaming minhash index probe (VERDICT r11
task 6): a boilerplate-heavy corpus (90% of docs sharing a shingle set,
distinct tails) piles its band rows onto a handful of hot bvals, so the
(band, bval, gk) equi-join concentrates that key's history rows on one
reducer. Measure a constant 1-doc probe batch against hot populations an
order of magnitude apart — the claim to verify is that probe cost is
OUTPUT-PROPORTIONAL (the collisions are real near-dup pairs at this
threshold, so candidates == answers), not quadratic, and that the r12
de-drivered candidate path keeps driver traffic flat while candidate
volume grows 4x.

What the hot key actually concentrates: fixed-width band rows (~50 B
each: doc_id, g, band, bval), never document bodies — 10^6 hot-band docs
put ~50 MB on one sort-merge partition, inside any executor budget, and
AQE's skew-join split (enabled in the engine session) re-splits an
oversized partition at runtime for the SMJ path. The expensive stage —
the shingle verify — is keyed by doc_id, which the hot band does NOT
skew.

Usage: python tools/minhash_hot_band_measure.py [hot_sizes ...]
       (default 2000 8000)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_mh_hotband"
BOILER = (
    "subscribe to our newsletter today for all the latest updates news "
    "offers and announcements from the team"
)


def run(spark, n_hot: int) -> dict:
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_minhash_index_applier,
        minhash_index_buckets_for,
    )

    work = f"{ROOT}/hot{n_hot}"
    shutil.rmtree(work, ignore_errors=True)
    tables = [
        SnapshotTable(f"{work}/{t}")
        for t in ("pairs", "bands", "shingles", "groups", "members")
    ]
    nb = minhash_index_buckets_for(n_hot * 4)
    apply_batch = make_minhash_index_applier(
        *tables, n_buckets=nb, record_stats=True
    )
    schema = "doc_id long, text string"
    # 90% boilerplate-sharing docs with unique tails + 10% disjoint filler
    hot = [(i, f"{BOILER} unique_tail_{i}") for i in range(n_hot)]
    filler = [
        (1_000_000 + i, " ".join(f"f{i}_{j}" for j in range(12)))
        for i in range(n_hot // 10)
    ]
    corpus = hot + filler
    third = len(corpus) // 3
    for b in range(3):
        rows = corpus[b * third : (b + 1) * third if b < 2 else len(corpus)]
        apply_batch(spark.createDataFrame(rows, schema), b)
    # the measured op: a constant 1-doc probe against the hot index
    probe = [(9_999_999, f"{BOILER} unique_tail_fresh")]
    t0 = time.time()
    apply_batch(spark.createDataFrame(probe, schema), 3)
    wall = time.time() - t0
    st = dict(apply_batch.last_stats)
    st.update({"n_hot": n_hot, "probe_wall_s": round(wall, 2)})
    return st


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000]
    spark = get_spark()
    rows = [run(spark, n) for n in sizes]
    print(
        f"{'n_hot':>8} {'probe_wall_s':>12} {'cand_hist':>10} "
        f"{'pairs':>8} {'driver_rows':>12}"
    )
    for r in rows:
        print(
            f"{r['n_hot']:>8} {r['probe_wall_s']:>12} "
            f"{r['cand_hist_docs']:>10} {r['pairs_appended']:>8} "
            f"{r['driver_collected_rows']:>12}"
        )
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        grow = b["n_hot"] / a["n_hot"]
        print(
            f"# {grow:.0f}x hot docs -> wall x"
            f"{b['probe_wall_s'] / max(a['probe_wall_s'], 1e-9):.2f}, "
            f"candidates x{b['cand_hist_docs'] / max(a['cand_hist_docs'], 1):.2f}, "
            f"driver rows {a['driver_collected_rows']} -> "
            f"{b['driver_collected_rows']} (flat = de-drivered)"
        )


if __name__ == "__main__":
    main()
