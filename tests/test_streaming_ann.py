"""Streaming incremental IVF index: applier contract (replay cursor,
bucket-granular appends, LSM fold), erase isolation, and the
maintained-equals-recomputed serve equivalence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.functions import vectors as V
from music_streaming_services_etl_pipeline_with_airflow_spark.operators.similarity import (
    N_LIST,
    N_PROBE,
    _corpus,
    _ivf_search,
    search_persisted_ivf,
)
from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
    build_streaming_ivf_index,
    make_ivf_index_applier,
)

SF = "/root/testdata/sf0.001"


def _centroid_rows(spark):
    return [
        (int(r.vec_id), list(r.v))
        for r in _corpus(spark, SF).filter(F.col("vec_id") < N_LIST).collect()
    ]


def _batch(spark, lo, hi):
    return (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    )


def test_ivf_applier_replay_is_noop_and_appends_are_bucket_granular(
    spark, tmp_path
):
    t = SnapshotTable(str(tmp_path / "idx"))
    apply_batch = make_ivf_index_applier(t, _centroid_rows(spark))

    apply_batch(_batch(spark, 0, 100), 0)
    v1 = t.latest_version()
    bm1 = t._bucket_map(v1)
    n1 = t.read(spark).count()
    assert n1 == 100 and t.latest_manifest_field("last_batch_id") == 0

    # at-least-once replay of the SAME batch id: cursor makes it a no-op
    apply_batch(_batch(spark, 0, 100), 0)
    assert t.latest_version() == v1

    # next batch EXTENDS dir lists (append), never rewrites batch 1's dirs
    apply_batch(_batch(spark, 100, 200), 1)
    v2 = t.latest_version()
    bm2 = t._bucket_map(v2)
    for b, dirs in bm1.items():
        assert bm2[b][: len(dirs)] == dirs, f"bucket {b} lost batch-1 dirs"
    assert t.read(spark).count() == 200
    assert t.latest_manifest_field("last_batch_id") == 1


def test_ivf_applier_compacts_crowded_lists(spark, tmp_path):
    """At max_dirs=2, six 10-vector batches keep every list's dir count
    bounded while content stays the full union and the cursor advances."""
    t = SnapshotTable(str(tmp_path / "idx"))
    apply_batch = make_ivf_index_applier(
        t, _centroid_rows(spark), max_dirs=2
    )
    for i in range(6):
        apply_batch(_batch(spark, 10 * i, 10 * (i + 1)), i)
    bm = t._bucket_map(t.latest_version())
    assert max(len(ds) for ds in bm.values()) <= 3  # fold leaves <= max+1
    assert t.read(spark).count() == 60
    assert t.latest_manifest_field("last_batch_id") == 5
    # the maintained relation equals a one-shot assignment of the same rows
    one = SnapshotTable(str(tmp_path / "one"))
    make_ivf_index_applier(one, _centroid_rows(spark))(
        _batch(spark, 0, 60), 0
    )
    got = {(r.vec_id, r.cid) for r in t.read(spark).collect()}
    want = {(r.vec_id, r.cid) for r in one.read(spark).collect()}
    assert got == want


def test_streaming_ivf_serve_equals_batch_multiprobe(spark):
    t = build_streaming_ivf_index(spark, SF, "pytest_stream_ivf")
    served = {
        (r.qid, r.neighbor_id, r.rank)
        for r in search_persisted_ivf(spark, SF, t, nprobe=N_PROBE).collect()
    }
    recomputed = {
        (r.qid, r.neighbor_id, r.rank)
        for r in _ivf_search(spark, SF, nprobe=N_PROBE).collect()
    }
    assert served == recomputed and served


def test_ivf_erase_rewrites_only_touched_buckets(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "idx"))
    apply_batch = make_ivf_index_applier(t, _centroid_rows(spark))
    apply_batch(_batch(spark, 0, 200), 0)
    apply_batch(_batch(spark, 200, 400), 1)
    ev = 399
    bm_before = t._bucket_map(t.latest_version())
    erased_bucket = str(
        t.read(spark).where(F.col("vec_id") == ev).first().cid
    )
    t.delete_where(spark, f"vec_id = {ev}")
    bm_after = t._bucket_map(t.latest_version())
    # every list whose dirs did NOT hold the erased vec carries over by
    # reference; only the erased vec's list rewrites (dir-level pruning
    # may keep even some of ITS dirs — assert the others are untouched)
    for b in bm_before:
        if b != erased_bucket:
            assert bm_after[b] == bm_before[b], f"calm bucket {b} rewrote"
    assert bm_after[erased_bucket] != bm_before[erased_bucket]
    survivors = t.read(spark)
    assert survivors.where(F.col("vec_id") == ev).count() == 0
    assert survivors.count() == 399


def test_streaming_ann_queries_registered_with_oracles():
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    specs = all_specs()
    for name in ("streaming_ivf_index_topk", "streaming_ivf_index_delete"):
        assert name in specs and specs[name].oracle is not None
