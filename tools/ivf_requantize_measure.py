"""Migration-bound replica for requantize_ivf_index (r13, VERDICT r12
ask 3): seed the streaming IVF index with N synthetic vectors through the
applier (drifted quantizer), then time

- the requantize migration itself (EXPECTED O(N): a migration reads every
  stored vector once by necessity — the claim is ONE bounded pass, not
  sublinearity; the honest number is the per-vector rate staying flat as N
  grows),
- a 1-vector erase BEFORE and AFTER the migration (the bound that must
  SURVIVE migration: delete_where rewrites only the erased vector's list,
  so the erase wall tracks list size, not index size or migration
  history),
- the list-skew audit before/after (the drifted quantizer is built to
  unbalance lists; the migration must rebalance them).

Synthetic fixture: deterministic unit-spread vectors (sin((id+1)k) per
dimension, 64 dims), same family as the other growth replicas.

Usage: python tools/ivf_requantize_measure.py [n1] [n2]
(defaults 20_000 and 80_000 — a 4x growth pair)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_ivf_requantize"
DIM = 64
N_LISTS = 64


def synth(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), k -> cast(sin((id + 1) * k) as float))"
        ).alias("embedding"),
    )


def centroids_of(spark, lo: int) -> list[tuple[int, list[float]]]:
    """N_LISTS centroids taken from vec_ids [lo, lo+N_LISTS), re-keyed to
    list ids 0..N_LISTS-1."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.functions import (
        vectors as V,
    )

    rows = (
        synth(spark, lo, lo + N_LISTS)
        .select("vec_id", V.to_double_array("embedding").alias("v"))
        .collect()
    )
    return [(i, list(r.v)) for i, r in enumerate(rows)]


def run(spark, n: int) -> dict:
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        ivf_list_skew_audit,
        make_ivf_index_applier,
        requantize_ivf_index,
    )

    work = f"{ROOT}/n{n}"
    shutil.rmtree(work, ignore_errors=True)
    t = SnapshotTable(f"{work}/index")
    # drifted quantizer: centroids drawn from the tail of the id range —
    # wrong geometry for the bulk of the corpus, unbalancing the lists
    apply_batch = make_ivf_index_applier(
        t, centroids_of(spark, n), n_lists=N_LISTS
    )
    CHUNK = 10_000
    bid = 0
    for lo in range(0, n, CHUNK):
        apply_batch(synth(spark, lo, min(lo + CHUNK, n)), bid)
        bid += 1

    def erase_wall(vec_id: int) -> float:
        t0 = time.monotonic()
        t.delete_where(spark, f"vec_id = {vec_id}")
        return round(time.monotonic() - t0, 2)

    pre_erase = erase_wall(n - 1)
    pre_skew = ivf_list_skew_audit(spark, t)
    t0 = time.monotonic()
    rep = requantize_ivf_index(spark, t, centroids_of(spark, 0))
    mig_wall = time.monotonic() - t0
    post_erase = erase_wall(n - 2)
    return {
        "n_vectors": n,
        "requantize_wall_s": round(mig_wall, 2),
        "requantize_us_per_vec": round(mig_wall / n * 1e6, 1),
        "skew_before": pre_skew["skew"],
        "skew_after": rep["after"]["skew"],
        "erase_wall_pre_migration_s": pre_erase,
        "erase_wall_post_migration_s": post_erase,
    }


def main() -> int:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 80_000
    spark = get_spark("ivf_requantize_measure")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (n1, n2):
        print(run(spark, n))
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0





# ---------------------------------------------------------------------------
# r14 (VERDICT r13 ask 5): the CLUSTERED skew drill. SCALING.md's own
# honesty note on the r13 run: the sin-vector corpus is near-uniform on
# the sphere, so even a deliberately drifted quantizer cannot unbalance
# the lists much (skew 1.27-1.44 before AND after) — the headline metric
# the migration exists for (rebalancing) was never demonstrated. This
# mode builds a mixture-of-Gaussians corpus (K = N_LISTS modes, equal
# weights, small within-mode noise), ingests under a quantizer whose
# centroids all sit in ONE mode's neighborhood (maximal drift: every
# other mode's vectors pile onto whichever of the near-identical
# centroids wins the tie), and requantizes to the TRUE mode centers —
# skew (max/mean over ALL lists) must collapse toward ~1.
# ---------------------------------------------------------------------------


def synth_clustered(spark, lo: int, hi: int, centers):
    """vec id -> mode (id % K) center + deterministic low-noise jitter;
    generated driver-side via numpy (bounded: hi-lo rows x 64 dims) and
    shipped through Arrow."""
    import numpy as np
    import pandas as pd

    k = len(centers)
    ids = np.arange(lo, hi)
    rng = np.random.RandomState(42 + lo)
    vecs = centers[ids % k] + 0.05 * rng.standard_normal((len(ids), DIM))
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [r.astype("float32") for r in vecs]}
    )
    return spark.createDataFrame(pdf)


def run_skew_drill(spark, n: int) -> dict:
    import numpy as np

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        ivf_list_skew_audit,
        make_ivf_index_applier,
        requantize_ivf_index,
    )

    rng = np.random.RandomState(7)
    # K well-separated unit mode centers
    centers = rng.standard_normal((N_LISTS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    work = f"{ROOT}/skew_n{n}"
    shutil.rmtree(work, ignore_errors=True)
    t = SnapshotTable(f"{work}/index")
    # drifted quantizer: all 64 centroids in mode 0's neighborhood
    drifted = [
        (i, [float(x) for x in centers[0] + 0.02 * rng.standard_normal(DIM)])
        for i in range(N_LISTS)
    ]
    true_q = [(i, [float(x) for x in centers[i]]) for i in range(N_LISTS)]
    apply_batch = make_ivf_index_applier(t, drifted, n_lists=N_LISTS)
    CHUNK = 10_000
    bid = 0
    for lo in range(0, n, CHUNK):
        apply_batch(synth_clustered(spark, lo, min(lo + CHUNK, n), centers), bid)
        bid += 1
    before = ivf_list_skew_audit(spark, t)
    rep = requantize_ivf_index(spark, t, true_q)
    return {
        "n_vectors": n,
        "skew_before": before["skew"],
        "nonempty_before": before["nonempty_lists"],
        "skew_after": rep["after"]["skew"],
        "nonempty_after": rep["after"]["nonempty_lists"],
    }


def main_skew() -> int:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    spark = get_spark("ivf_requantize_skew")
    spark.sparkContext.setLogLevel("ERROR")
    print(run_skew_drill(spark, n))
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        raise SystemExit(main_skew())
    raise SystemExit(main())
