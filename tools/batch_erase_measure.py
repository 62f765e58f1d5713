"""A/B measure for the r15 set-oriented batch GDPR erase (VERDICT r14
ask 1): erase the SAME >=100-id survivor-mass list from two identical
incremental indexes — (a) via the set-oriented batch entry point
(erase_docs_from_minhash_index / erase_docs_from_bm25_index), (b) via a
loop of single erases (exactly the r14 batch implementation's shape:
~3+ manifest commits and several driver-side Spark jobs per id).

Reports wall seconds and the number of manifest commits (version
deltas summed over the index's tables) for each side. The contrast is
the point: the set path is O(tables) commits regardless of N, the loop
is O(N) — at the compliance-sweep shape ("thousands of erasures arrive
as one list", streaming/ingest.py erase_docs_from_minhash_index) the
loop is tens of thousands of sequential driver jobs.

Fixture: 2*N_GROUPS docs, every text duplicated once (doc i and
i+N_GROUPS share text), erase ids 0..N_ERASE-1 — one member of each of
N_ERASE two-member groups, i.e. PURE survivor mass (the set path's
three-commit fast path; emptied groups stay on the serialized marker
path by design and are measured by the existing drills).

Usage: python tools/batch_erase_measure.py [n_erase] (default 120)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_batch_erase_measure"
N_GROUPS = 1500


def _mh_tables(work: str):
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )

    names = ("pairs", "bands", "shingles", "groups", "members")
    return tuple(SnapshotTable(f"{work}/{n}") for n in names)


def _docs(spark, n_groups: int):
    from pyspark.sql import functions as F

    base = spark.range(n_groups).select(
        F.col("id").alias("g"),
        F.concat(
            F.lit("document body with shared shingle stream number "),
            F.col("id"),
            F.lit(" and unique tail words alpha beta gamma delta "),
            F.col("id") * 7,
        ).alias("text"),
    )
    return (
        base.select(F.col("g").alias("doc_id"), "text")
        .unionAll(
            base.select((F.col("g") + n_groups).alias("doc_id"), "text")
        )
        .orderBy("doc_id")
    )


def measure_minhash(spark, n_erase: int) -> dict:
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest as ing,
    )

    nb = 16
    out = {}
    for mode in ("set", "loop"):
        work = f"{ROOT}/mh_{mode}"
        shutil.rmtree(work, ignore_errors=True)
        pairs_t, bands_t, shingles_t, groups_t, members_t = _mh_tables(work)
        apply_batch = ing.make_minhash_index_applier(
            pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
        )
        apply_batch(_docs(spark, N_GROUPS), 0)
        tables = (pairs_t, bands_t, shingles_t, groups_t, members_t)
        v0 = sum(t.latest_version() for t in tables)
        ids = list(range(n_erase))
        t0 = time.monotonic()
        if mode == "set":
            ing.erase_docs_from_minhash_index(
                spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
                nb, ids,
            )
        else:
            for i in ids:
                ing.erase_doc_from_minhash_index(
                    spark, pairs_t, bands_t, shingles_t, groups_t,
                    members_t, nb, i,
                )
        wall = time.monotonic() - t0
        out[mode] = {
            "wall_s": round(wall, 2),
            "commits": sum(t.latest_version() for t in tables) - v0,
        }
        assert members_t.read(spark).where(
            f"doc_id < {n_erase}"
        ).count() == 0
    return out


def measure_bm25(spark, n_erase: int) -> dict:
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest as ing,
    )

    out = {}
    for mode in ("set", "loop"):
        from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
            SnapshotTable,
        )

        work = f"{ROOT}/bm25_{mode}"
        shutil.rmtree(work, ignore_errors=True)
        postings_t = SnapshotTable(f"{work}/postings")
        df_t = SnapshotTable(f"{work}/df")
        apply_batch = ing.make_bm25_index_applier(
            postings_t, df_t, n_buckets=16
        )
        apply_batch(_docs(spark, N_GROUPS), 0)
        v0 = postings_t.latest_version() + df_t.latest_version()
        ids = list(range(n_erase))
        t0 = time.monotonic()
        if mode == "set":
            ing.erase_docs_from_bm25_index(spark, postings_t, df_t, ids, 16)
        else:
            for i in ids:
                ing.erase_doc_from_bm25_index(spark, postings_t, df_t, i, 16)
        wall = time.monotonic() - t0
        out[mode] = {
            "wall_s": round(wall, 2),
            "commits": postings_t.latest_version()
            + df_t.latest_version()
            - v0,
        }
        assert (
            postings_t.read(spark).where(f"doc_id < {n_erase}").count() == 0
        )
    return out


def main() -> int:
    n_erase = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    spark = get_spark("batch_erase_measure")
    spark.sparkContext.setLogLevel("ERROR")
    print({"n_erase": n_erase, "minhash": measure_minhash(spark, n_erase)})
    print({"n_erase": n_erase, "bm25": measure_bm25(spark, n_erase)})
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
