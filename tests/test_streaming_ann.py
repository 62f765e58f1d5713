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


# ---------------------------------------------------------------------------
# Streaming semantic (embedding-LSH) near-dup index
# ---------------------------------------------------------------------------


def _sem_tables(tmp_path, n_buckets=8):
    names = ("pairs", "bands", "vecs", "groups", "members")
    ts = tuple(SnapshotTable(str(tmp_path / n)) for n in names)
    return ts, dict(
        band_buckets=n_buckets,
        vec_buckets=n_buckets,
        group_buckets=n_buckets,
        member_buckets=n_buckets,
    )


def test_semantic_stream_equals_batch_operator(spark):
    """The maintained pair set equals the BATCH operator's output exactly
    — a stronger pin than the oracle (which analytically bounds LSH
    recall only at the driver's scales): both engines share planes,
    threshold and collapse, so their sets must be identical at EVERY
    scale."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        _build_semantic_index,
        serve_semantic_pairs,
    )

    specs = all_specs()
    batch = {
        (r.va, r.vb)
        for r in specs["dedup_embedding_lsh"].fn(spark, SF).collect()
    }
    pairs_t, _, _, groups_t, members_t, _ = _build_semantic_index(
        spark, SF, "pytest_sem_stream"
    )
    stream = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert stream == batch and stream


def test_semantic_applier_replay_and_copy_collapse(spark, tmp_path):
    """Replaying a batch id is a no-op on every table; exact copies cost
    one member row each (one stored signature per distinct vector) and
    pair at serve time through group membership."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 63
    rows = [
        (1, [1.0] + base),
        (2, [1.0] + base),  # exact copy of 1
        (3, [-1.0] + base),  # far from 1/2
    ]
    b1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    apply_batch(b1, 0)
    vs = [t.latest_version() for t in (pairs_t, bands_t, vecs_t, groups_t, members_t)]
    apply_batch(b1, 0)  # at-least-once replay
    assert [
        t.latest_version() for t in (pairs_t, bands_t, vecs_t, groups_t, members_t)
    ] == vs
    # one signature per distinct vector, three member rows
    assert vecs_t.read(spark).count() == 2
    assert members_t.read(spark).count() == 3
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == {(1, 2)}  # copies pair; the opposite vector does not
    # a later batch adds another copy of the same vector: member-only
    b2 = spark.createDataFrame(
        [(4, [1.0] + base)], "vec_id long, embedding array<float>"
    )
    apply_batch(b2, 1)
    assert vecs_t.read(spark).count() == 2  # no new signature
    served2 = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served2 == {(1, 2), (1, 4), (2, 4)}


def test_semantic_arrival_order_independent(spark, tmp_path):
    """Two different batch splits of the same vectors serve the same
    pair set (gid VALUES may differ; the expanded set may not)."""
    import os as _os

    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    emb = (
        spark.read.parquet(_os.path.join(SF, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 120)
    )

    def build(splits, root):
        (p, b, v, g, m), bk = _sem_tables(root)
        ab = make_semantic_index_applier(p, b, v, g, m, **bk)
        for i, (lo, hi) in enumerate(splits):
            ab(
                emb.where(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
                i,
            )
        return {
            (r.va, r.vb)
            for r in serve_semantic_pairs(spark, p, g, m).collect()
        }

    s1 = build([(0, 40), (40, 80), (80, 120)], tmp_path / "a")
    s2 = build([(0, 120)], tmp_path / "b")
    s3 = build([(0, 100), (100, 120)], tmp_path / "c")
    assert s1 == s2 == s3


def test_semantic_erase_copy_then_last_member(spark, tmp_path):
    """Collapse-aware erase: removing an exact copy only decrements the
    group (pairs/bands/vecs untouched — calm buckets carry over by
    reference); removing the LAST member clears the signature from every
    surface and its pairs become unreachable."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        erase_semantic_vec,
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 62
    rows = [
        (1, [1.0, 0.0] + base),
        (2, [1.0, 0.0] + base),  # copy of 1
        (3, [1.0, 0.1] + base),  # near-dup of 1/2 (cos ~ 0.995)
    ]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == {(1, 2), (1, 3), (2, 3)}
    # erase the COPY: group decrements, stored signature stays
    bands_v = bands_t.latest_version()
    vecs_v = vecs_t.latest_version()
    pairs_v = pairs_t.latest_version()
    erase_semantic_vec(
        spark, 2, pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    assert bands_t.latest_version() == bands_v  # untouched
    assert vecs_t.latest_version() == vecs_v
    assert pairs_t.latest_version() == pairs_v
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == {(1, 3)}
    # erase the LAST member of the group: signature leaves every surface
    erase_semantic_vec(
        spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    assert vecs_t.read(spark).where("vec_id = 1").count() == 0
    assert bands_t.read(spark).where("vec_id = 1").count() == 0
    assert pairs_t.read(spark).where("va = 1 OR vb = 1").count() == 0
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == set()


def test_semantic_queries_registered_with_oracles():
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    specs = all_specs()
    for name in (
        "streaming_semantic_index",
        "streaming_semantic_index_delete",
    ):
        assert name in specs and specs[name].oracle is not None


def test_semantic_zero_vector_never_pairs_and_does_not_crash(spark, tmp_path):
    """A degenerate all-zero vector must not crash the batch (ANSI
    divide) and its exact copies must NOT pair (the oracle's NaN dot),
    while it still counts as a group member."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    zeros = [0.0] * 64
    rows = [
        (1, zeros),
        (2, zeros),  # exact copy of the zero vector
        (3, [1.0] + [0.0] * 63),
        (4, [1.0] + [0.0] * 63),  # copy of 3
    ]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    assert members_t.read(spark).count() == 4
    assert vecs_t.read(spark).count() == 1  # only the non-zero canonical
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == {(3, 4)}  # zero-vector copies never pair


def test_semantic_erase_layout_read_from_manifest(spark, tmp_path):
    """An index built at a non-default layout (10 bits) erases correctly
    even when the caller omits the layout — the BANDS manifest records
    it, so the bk recompute can never run under the wrong planes."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        erase_semantic_vec,
        make_semantic_index_applier,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, lsh_bits=10, **bk
    )
    rows = [(1, [1.0] + [0.0] * 63), (2, [0.0, 1.0] + [0.0] * 62)]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    assert bands_t.latest_manifest_field("lsh_bits") == 10
    assert bands_t.read(spark).where("vec_id = 1").count() > 0
    # erase WITHOUT passing the layout: manifest wins
    erase_semantic_vec(
        spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    assert bands_t.read(spark).where("vec_id = 1").count() == 0
    assert vecs_t.read(spark).where("vec_id = 1").count() == 0


def test_semantic_fsck_repairs_torn_multi_member_erase(spark, tmp_path):
    """Simulate the one non-resumable erase window (crash between the
    MEMBERS and GROUPS commits of a multi-member erase): the counter
    stays high, a later last-member erase would leak the signature —
    audit_and_repair detects the drift, recounts, and a subsequent erase
    then clears everything. Also: an orphaned 0-member group (crash in a
    torn LAST-member erase just after the member row left) is completed
    by the fsck itself."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        audit_and_repair_semantic_index,
        erase_semantic_vec,
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    args = (
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 62
    rows = [
        (1, [1.0, 0.0] + base),
        (2, [1.0, 0.0] + base),  # copy of 1 -> group {1,2}
        (3, [1.0, 0.1] + base),  # near-dup neighbor
    ]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    # consistent index: audit reports nothing
    assert audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    ) == []
    # simulate the torn erase of vec 2: member row removed, counter NOT
    # decremented (the crash window)
    mem_bucket = SnapshotTable.bucket_of(
        F.col("vec_id"), bk["member_buckets"]
    )
    mb = (
        spark.createDataFrame([(2,)], "vec_id long")
        .select(mem_bucket.alias("_b"))
        .first()[0]
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import _SEM_MEMBERS_SCHEMA
    bucket_mem = members_t.read_buckets(
        spark, [mb], _SEM_MEMBERS_SCHEMA, n_buckets=bk["member_buckets"]
    ).localCheckpoint(eager=True)
    members_t.commit_buckets(
        bucket_mem.where(F.col("vec_id") != 2).withColumn("_bucket", mem_bucket),
        [mb],
        n_buckets=bk["member_buckets"],
    )
    # fsck: detects the drift and recounts
    rep = audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert len(rep) == 1 and rep[0]["action"] == "recounted"
    assert rep[0]["stored_n"] == 2 and rep[0]["live_n"] == 1
    # the repaired index now erases vec 1 (the true last member) fully
    erase_semantic_vec(
        spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert vecs_t.read(spark).where("vec_id = 1").count() == 0
    assert pairs_t.read(spark).where("va = 1 OR vb = 1").count() == 0
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == set()
    # orphan scenario: remove vec 3's member row without any erase at all
    mb3 = (
        spark.createDataFrame([(3,)], "vec_id long")
        .select(mem_bucket.alias("_b"))
        .first()[0]
    )
    bucket_mem3 = members_t.read_buckets(
        spark, [mb3], _SEM_MEMBERS_SCHEMA, n_buckets=bk["member_buckets"]
    ).localCheckpoint(eager=True)
    members_t.commit_buckets(
        bucket_mem3.where(F.col("vec_id") != 3).withColumn(
            "_bucket", mem_bucket
        ),
        [mb3],
        n_buckets=bk["member_buckets"],
    )
    rep2 = audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert len(rep2) == 1 and rep2[0]["action"] == "dropped"
    assert groups_t.read(spark).count() == 0
    assert vecs_t.read(spark).count() == 0


def test_semantic_index_random_interleaved_batches_and_erases(spark, tmp_path):
    """Seeded interleaving fuzz over the full lifecycle: clustered
    vectors (exact copies + tight near-dups per cluster, clusters far
    apart) stream in random batch splits with random erases in between;
    after every schedule the served pair set must equal the analytic
    expectation — all surviving same-cluster pairs, nothing else.
    Cluster geometry keeps every true pair's cosine ~0.99 (per-band
    collision ~0.83, any-of-16 ≈ 1), so LSH recall is not the variable
    under test; the applier/erase/serve machinery is."""
    import random

    import numpy as np

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        audit_and_repair_semantic_index,
        erase_semantic_vec,
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    rng = np.random.default_rng(7)
    pyrng = random.Random(7)
    n_clusters, per_cluster = 4, 5
    vecs = {}  # vec_id -> (cluster, list[float])
    vid = 0
    for c in range(n_clusters):
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        for k in range(per_cluster):
            if k % 2 == 1:
                v = base  # exact copy of the cluster base
            else:
                v = base + 0.05 * rng.standard_normal(64)
                v = v / np.linalg.norm(v)
            vecs[vid] = (c, [float(x) for x in v])
            vid += 1

    for trial in range(3):
        root = tmp_path / f"t{trial}"
        (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(root)
        args = (
            bk["band_buckets"], bk["vec_buckets"],
            bk["group_buckets"], bk["member_buckets"],
        )
        apply_batch = make_semantic_index_applier(
            pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
        )
        ids = list(vecs)
        pyrng.shuffle(ids)
        # random batch boundaries
        cuts = sorted(pyrng.sample(range(1, len(ids)), 3))
        batches = [
            ids[a:b] for a, b in zip([0] + cuts, cuts + [len(ids)])
        ]
        alive = set()
        erased = []
        bid = 0
        for batch_ids in batches:
            apply_batch(
                spark.createDataFrame(
                    [(i, vecs[i][1]) for i in batch_ids],
                    "vec_id long, embedding array<float>",
                ),
                bid,
            )
            bid += 1
            alive |= set(batch_ids)
            # erase a random already-ingested vector between batches
            if alive and pyrng.random() < 0.7:
                target = pyrng.choice(sorted(alive))
                erase_semantic_vec(
                    spark, target, pairs_t, bands_t, vecs_t,
                    groups_t, members_t, *args,
                )
                alive.discard(target)
                erased.append(target)
        served = {
            (r.va, r.vb)
            for r in serve_semantic_pairs(
                spark, pairs_t, groups_t, members_t
            ).collect()
        }
        expected = {
            (a, b)
            for a in alive
            for b in alive
            if a < b and vecs[a][0] == vecs[b][0]
        }
        assert served == expected, (
            f"trial {trial}: erased={erased} diff="
            f"{(served - expected, expected - served)}"
        )
        # the lifecycle left a consistent index: fsck reports nothing
        assert audit_and_repair_semantic_index(
            spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
        ) == []


def test_semantic_clear_crash_before_vecs_commit_retry_converges(
    spark, tmp_path
):
    """ADVICE r12 repro, inverted by the r13 fix: the clear's commit
    order is now derived-surface (BANDS) first, recompute source (VECS)
    last. A crash between the two leaves the stored vector in place —
    so a PLAIN RETRY recomputes the bk set and converges, where the old
    order (VECS first) leaked the band rows forever (retry found
    doc_bks empty and no-op'd, fsck saw a consistent index)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        audit_and_repair_semantic_index,
        erase_semantic_vec,
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    rows = [
        (1, [1.0, 0.0] + [0.0] * 62),
        (2, [0.0, 1.0] + [0.0] * 62),
    ]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    assert bands_t.read(spark).where("vec_id = 1").count() > 0
    args = (
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    # inject a crash exactly before the VECS commit (the LAST commit of
    # the clear) — the first vecs_t.commit_buckets call dies
    real_commit = vecs_t.commit_buckets
    state = {"calls": 0}

    def crashing(*a, **k):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("simulated crash before VECS commit")
        return real_commit(*a, **k)

    vecs_t.commit_buckets = crashing
    with pytest.raises(RuntimeError, match="simulated crash"):
        erase_semantic_vec(
            spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
        )
    # torn state: derived band rows already gone, VECS row (the
    # recompute source) retained, member/group rows still present
    assert bands_t.read(spark).where("vec_id = 1").count() == 0
    assert vecs_t.read(spark).where("vec_id = 1").count() == 1
    assert members_t.read(spark).where("vec_id = 1").count() == 1
    # plain retry converges: the stored vector recomputes the bk set,
    # the band delete no-ops, VECS/member/group rows leave
    erase_semantic_vec(
        spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert state["calls"] >= 2  # the retry reached the VECS commit
    assert vecs_t.read(spark).where("vec_id = 1").count() == 0
    assert bands_t.read(spark).where("vec_id = 1").count() == 0
    assert members_t.read(spark).where("vec_id = 1").count() == 0
    assert pairs_t.read(spark).where("va = 1 OR vb = 1").count() == 0
    # no derived data of the erased vector survives anywhere, and the
    # fsck agrees the index is consistent
    assert audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    ) == []
    served = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert served == set()


def _shifted_centroid_rows(spark, shift=8):
    """A deliberately WRONG ("drifted") quantizer: centroid i carries the
    vector of vec_id shift+i. Centroid ids stay 0..N_LIST-1 (lists are
    identity-bucketed by cid) but the geometry differs, so assignments
    under it diverge from the canonical quantizer's."""
    rows = _centroid_rows(spark)
    vecs = {
        int(r.vec_id): list(r.v)
        for r in _corpus(spark, SF)
        .filter((F.col("vec_id") >= shift) & (F.col("vec_id") < shift + N_LIST))
        .collect()
    }
    return [(i, vecs[shift + i]) for i in range(N_LIST)]


def test_ivf_requantize_mid_stream_matches_recompute(spark, tmp_path):
    """Quantizer lifecycle (r13, VERDICT ask 3): a stream ingests two
    batches under a drifted quantizer, migrates via requantize_ivf_index
    to the canonical quantizer (one bounded rewrite, cursor preserved),
    then ingests two more batches under a NEW applier built with the new
    quantizer — and the served index is EXACTLY what the whole-corpus
    recompute under the canonical quantizer produces: migration erases
    all assignment history."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        ivf_list_skew_audit,
        requantize_ivf_index,
    )

    t = SnapshotTable(str(tmp_path / "idx"))
    old_q = _shifted_centroid_rows(spark)
    apply_old = make_ivf_index_applier(t, old_q)
    apply_old(_batch(spark, 0, 120), 0)
    apply_old(_batch(spark, 120, 250), 1)
    assert t.latest_manifest_field("last_batch_id") == 1
    # migrate to the canonical quantizer mid-stream
    new_q = _centroid_rows(spark)
    rep = requantize_ivf_index(spark, t, new_q)
    assert rep["before"]["n_vectors"] == rep["after"]["n_vectors"] == 250
    assert rep["after"]["skew"] >= 1.0 and rep["after"]["max_list"] >= 1
    # cursor preserved: the stream resumes where it left off
    assert t.latest_manifest_field("last_batch_id") == 1
    # remaining batches under a NEW applier built with the new quantizer
    apply_new = make_ivf_index_applier(t, new_q)
    apply_new(_batch(spark, 250, 400), 2)
    apply_new(_batch(spark, 400, 500), 3)
    served = {
        (r.qid, r.neighbor_id, r.rank)
        for r in search_persisted_ivf(spark, SF, t, nprobe=N_PROBE).collect()
    }
    recomputed = {
        (r.qid, r.neighbor_id, r.rank)
        for r in _ivf_search(spark, SF, nprobe=N_PROBE).collect()
    }
    assert served == recomputed and served
    # erase bounds survive the migration: a delete still rewrites only
    # the erased vector's list, every calm list carries by reference
    ev = 499
    bm_before = t._bucket_map(t.latest_version())
    erased_bucket = str(t.read(spark).where(F.col("vec_id") == ev).first().cid)
    t.delete_where(spark, f"vec_id = {ev}")
    bm_after = t._bucket_map(t.latest_version())
    for b in bm_before:
        if b != erased_bucket:
            assert bm_after[b] == bm_before[b], f"calm bucket {b} rewrote"
    assert t.read(spark).where(F.col("vec_id") == ev).count() == 0
    # audit still runs post-erase
    assert ivf_list_skew_audit(spark, t)["n_vectors"] == 499


def test_ivf_requantize_rejects_out_of_range_centroid_ids(spark, tmp_path):
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        requantize_ivf_index,
    )

    t = SnapshotTable(str(tmp_path / "idx"))
    apply_batch = make_ivf_index_applier(t, _centroid_rows(spark))
    apply_batch(_batch(spark, 0, 50), 0)
    bad = [(N_LIST + 3, [0.0] * 64)]
    with pytest.raises(ValueError, match="identity-bucketed"):
        requantize_ivf_index(spark, t, bad, n_lists=N_LIST)


def test_ivf_erase_crash_leaves_pre_delete_version_and_retry_converges(
    spark, tmp_path
):
    """IVF erase resumability (r13, VERDICT ask 6): the erase is ONE
    copy-on-write delete_where commit, so a crash at any point before
    the manifest publish leaves the pre-delete version current (the
    vector still fully served — no torn intermediate), and a plain
    retry completes it. This is the single-table case the multi-table
    indexes contrast with."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable as _ST,
    )

    t = SnapshotTable(str(tmp_path / "idx"))
    apply_batch = make_ivf_index_applier(t, _centroid_rows(spark))
    apply_batch(_batch(spark, 0, 100), 0)
    v0 = t.latest_version()
    real_publish = _ST._write_manifest
    try:
        def crashing(self, manifest):
            raise RuntimeError("simulated crash before delete publish")

        _ST._write_manifest = crashing
        with pytest.raises(RuntimeError, match="simulated crash"):
            t.delete_where(spark, "vec_id = 99")
    finally:
        _ST._write_manifest = real_publish
    # pre-delete version is still current; the vector is still served
    assert t.latest_version() == v0
    assert t.read(spark).where("vec_id = 99").count() == 1
    # plain retry converges
    t.delete_where(spark, "vec_id = 99")
    assert t.read(spark).where("vec_id = 99").count() == 0
    assert t.read(spark).count() == 99


def test_semantic_fsck_purges_pre_r13_orphan_band_rows(spark, tmp_path):
    """The permanent-leak state a PRE-r13 clear could leave (VECS row
    deleted first, crash before the BANDS delete, then a retry that
    no-ops and drops member/group): band rows of an erased vector with
    no VECS row. The r13 fsck phase 2 detects them by anti-join and
    purges exactly their bk buckets."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        _SEM_VECS_SCHEMA,
        audit_and_repair_semantic_index,
        erase_semantic_vec,
        make_semantic_index_applier,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    rows = [(1, [1.0, 0.0] + [0.0] * 62), (2, [0.0, 1.0] + [0.0] * 62)]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    n_band_rows_1 = bands_t.read(spark).where("vec_id = 1").count()
    assert n_band_rows_1 > 0
    args = (
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    # manufacture the pre-r13 order: VECS row deleted FIRST, crash
    # before the bands delete
    id_bucket = SnapshotTable.bucket_of(F.col("vec_id"), bk["vec_buckets"])
    vb = (
        spark.createDataFrame([(1,)], "vec_id long")
        .select(id_bucket.alias("_b"))
        .first()[0]
    )
    bucket_v = vecs_t.read_buckets(
        spark, [vb], _SEM_VECS_SCHEMA, n_buckets=bk["vec_buckets"]
    ).localCheckpoint(eager=True)
    vecs_t.commit_buckets(
        bucket_v.where(F.col("vec_id") != 1).withColumn("_bucket", id_bucket),
        [vb],
        n_buckets=bk["vec_buckets"],
    )
    # the pre-r13 retry: clear finds no stored vector and no-ops on
    # bands; member/group rows drop — band rows now orphaned forever
    erase_semantic_vec(
        spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert bands_t.read(spark).where("vec_id = 1").count() == n_band_rows_1
    rep = audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert rep == [{"vec_id": 1, "action": "orphan_bands_purged"}]
    assert bands_t.read(spark).where("vec_id = 1").count() == 0
    # the surviving vector's state is untouched and the index is clean
    assert bands_t.read(spark).where("vec_id = 2").count() > 0
    assert audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    ) == []


def test_semantic_pending_clear_blocks_resurrection_until_resolved(
    spark, tmp_path
):
    """Semantic twin of the minhash pending-clear drill: a mid-clear
    crash leaves the marker; copies of the half-cleared vector are
    refused, a different group's last-member erase refuses to start, the
    retry completes and clears the marker, and the re-ingested copy
    forms a fresh group that re-pairs with its near-dup."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        audit_and_repair_semantic_index,
        erase_semantic_vec,
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    args = (
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 62
    va = [1.0, 0.0] + base
    vb = [1.0, 0.1] + base  # near-dup of va (cos ~ 0.995)
    apply_batch(
        spark.createDataFrame(
            [(1, va), (2, vb)], "vec_id long, embedding array<float>"
        ),
        0,
    )
    pre = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert pre == {(1, 2)}
    real_commit = bands_t.commit_buckets
    try:
        def crash(*a, **k):
            raise RuntimeError("mid-clear crash")

        bands_t.commit_buckets = crash
        with pytest.raises(RuntimeError, match="mid-clear"):
            erase_semantic_vec(
                spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t,
                *args,
            )
    finally:
        bands_t.commit_buckets = real_commit
    assert (groups_t.latest_manifest_field("pending_clear") or "").startswith("1@")
    # copies of the half-cleared vector are refused
    with pytest.raises(ValueError, match="INCOMPLETE last-member erase"):
        apply_batch(
            spark.createDataFrame(
                [(3, va)], "vec_id long, embedding array<float>"
            ),
            1,
        )
    # a different group's last-member erase refuses to start
    with pytest.raises(ValueError, match="pending for another group"):
        erase_semantic_vec(
            spark, 2, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
        )
    # retry completes and clears the marker; the copy then re-ingests
    erase_semantic_vec(
        spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert not groups_t.latest_manifest_field("pending_clear")
    apply_batch(
        spark.createDataFrame(
            [(3, va)], "vec_id long, embedding array<float>"
        ),
        1,
    )
    post = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert post == {(2, 3)}
    assert audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    ) == []


def test_semantic_fsck_completes_marked_erase(spark, tmp_path):
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        audit_and_repair_semantic_index,
        erase_semantic_vec,
        make_semantic_index_applier,
        serve_semantic_pairs,
    )

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    args = (
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    apply_batch = make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 62
    va = [1.0, 0.0] + base
    vb = [1.0, 0.1] + base
    apply_batch(
        spark.createDataFrame(
            [(1, va), (2, vb)], "vec_id long, embedding array<float>"
        ),
        0,
    )
    real_commit = bands_t.commit_buckets
    try:
        def crash(*a, **k):
            raise RuntimeError("mid-clear crash")

        bands_t.commit_buckets = crash
        with pytest.raises(RuntimeError, match="mid-clear"):
            erase_semantic_vec(
                spark, 1, pairs_t, bands_t, vecs_t, groups_t, members_t,
                *args,
            )
    finally:
        bands_t.commit_buckets = real_commit
    rep = audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    )
    assert any(r.get("action") == "pending_clear_completed" for r in rep)
    assert not groups_t.latest_manifest_field("pending_clear")
    assert members_t.read(spark).where("vec_id = 1").count() == 0
    assert vecs_t.read(spark).where("vec_id = 1").count() == 0
    assert bands_t.read(spark).where("vec_id = 1").count() == 0
    apply_batch(
        spark.createDataFrame(
            [(3, va)], "vec_id long, embedding array<float>"
        ),
        1,
    )
    post = {
        (r.va, r.vb)
        for r in serve_semantic_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert post == {(2, 3)}
    assert audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t, *args
    ) == []


def test_ivf_skew_audit_counts_empty_lists(spark, tmp_path):
    """r14 (ADVICE): the skew denominator is the ALL-lists mean
    (total / n_lists from the table's recorded bucket count), not the
    nonempty-lists mean — a drifted quantizer that EMPTIES lists is
    exactly the condition the audit exists to flag, and a groupBy over
    stored rows yields no row for an empty list."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ann import (
        ivf_list_skew_audit,
    )

    t = SnapshotTable(str(tmp_path / "idx"))
    # 8 declared lists; all 6 vectors crammed into lists 0 and 1 (4 + 2)
    rows = spark.createDataFrame(
        [(i, 0 if i < 4 else 1, [float(i)]) for i in range(6)],
        "vec_id long, cid long, v array<double>",
    )
    t.commit_buckets(
        rows.withColumn("_bucket", F.col("cid").cast("int")),
        list(range(8)),
        n_buckets=8,
    )
    rep = ivf_list_skew_audit(spark, t)
    assert rep["n_lists"] == 8 and rep["nonempty_lists"] == 2
    assert rep["max_list"] == 4 and rep["n_vectors"] == 6
    # all-lists mean = 6/8; nonempty mean = 3 — the honest skew is the
    # larger one
    assert rep["mean_list"] == 0.75 and rep["mean_nonempty"] == 3.0
    assert abs(rep["skew"] - 4 / 0.75) < 0.02
    assert abs(rep["skew_nonempty"] - 4 / 3.0) < 0.02
    assert rep["skew"] > rep["skew_nonempty"]


def test_semantic_bulk_seed_equals_incremental_build(spark, tmp_path):
    """r15: bulk_seed_semantic_index — the 100-TB bootstrap path (stand
    the index up over an existing corpus in one batch build, then let
    the stream take over). Pin: the bulk-seeded five-table state is
    CONTENT-IDENTICAL to the applier ingesting the same corpus in
    ascending-id chunks (pairs, bands incl. recorded layout, normalized
    canonicals, group counters/selfdup, members), the cursors are live,
    and a continuation batch applied to BOTH indexes leaves their
    served pair sets identical."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    base = [0.0] * 61
    rows = [
        (0, [0.0, 0.0, 0.0] + base),        # zero vector: member, no pair
        (1, [1.0, 0.0, 0.0] + base),
        (2, [1.0, 0.05, 0.0] + base),       # near-dup of 1
        (3, [1.0, 0.0, 0.0] + base),        # exact copy of 1
        (4, [0.0, 1.0, 0.0] + base),
        (5, [0.0, 1.0, 0.0] + base),        # exact copy of 4
        (6, [0.0, 0.0, 1.0] + base),
        (7, [0.0, 0.0, 0.0] + base),        # exact copy of the zero vec
        (8, [0.0, 0.96, 0.28] + base),      # near-dup of 4
    ]
    schema = "vec_id long, embedding array<float>"
    extra = [(20, [0.0, 1.0, 0.0] + base), (21, [0.0, 0.0, 1.0] + base)]

    (ip, ib, iv, ig, im), bk = _sem_tables(tmp_path / "incr")
    apply_incr = sa.make_semantic_index_applier(ip, ib, iv, ig, im, **bk)
    for i, chunk in enumerate((rows[:3], rows[3:6], rows[6:])):
        apply_incr(spark.createDataFrame(chunk, schema), i)

    (bp, bb, bv, bg, bm), _ = _sem_tables(tmp_path / "bulk")
    sa.bulk_seed_semantic_index(
        spark, bp, bb, bv, bg, bm, spark.createDataFrame(rows, schema),
        bk["band_buckets"], bk["vec_buckets"], bk["group_buckets"],
        bk["member_buckets"], batch_id=2,
    )

    def content(t, cols):
        return sorted(tuple(r) for r in t.read(spark).select(*cols).collect())

    assert content(bp, ["va", "vb"]) == content(ip, ["va", "vb"])
    assert content(bb, ["vec_id", "band", "code", "bk"]) == content(
        ib, ["vec_id", "band", "code", "bk"]
    )
    assert content(bv, ["vec_id", "v"]) == content(iv, ["vec_id", "v"])
    assert content(bg, ["vh", "gid", "selfdup", "n_members"]) == content(
        ig, ["vh", "gid", "selfdup", "n_members"]
    )
    assert content(bm, ["vec_id", "gid", "vh"]) == content(
        im, ["vec_id", "gid", "vh"]
    )
    assert bb.latest_manifest_field("lsh_bands") == ib.latest_manifest_field(
        "lsh_bands"
    )
    assert bb.latest_manifest_field("n_buckets") == ib.latest_manifest_field(
        "n_buckets"
    )
    # fresh-tables guard: bootstrap refuses a non-empty lineage
    import pytest as _pytest

    with _pytest.raises(ValueError, match="FRESH tables"):
        sa.bulk_seed_semantic_index(
            spark, bp, bb, bv, bg, bm, spark.createDataFrame(rows, schema),
            bk["band_buckets"], bk["vec_buckets"], bk["group_buckets"],
            bk["member_buckets"],
        )
    # the stream continues on the bootstrapped index: one more batch on
    # BOTH, served sets identical (copy of 4 collapses; 21 pairs with 6)
    apply_bulk = sa.make_semantic_index_applier(bp, bb, bv, bg, bm, **bk)
    batch = spark.createDataFrame(extra, schema)
    apply_bulk(batch, 3)
    apply_incr(batch, 3)
    serve = lambda p, g, m: sorted(  # noqa: E731
        (r.va, r.vb)
        for r in sa.serve_semantic_pairs(spark, p, g, m).collect()
    )
    got = serve(bp, bg, bm)
    assert got == serve(ip, ig, im)
    assert (4, 20) in got and (6, 21) in got and (1, 3) in got
    assert not any(0 in pr or 7 in pr for pr in got)  # zero vec never pairs


def test_semantic_batch_erase_survivor_mass_is_set_oriented_with_crash(
    spark, tmp_path
):
    """r15 (VERDICT r14 ask 1, semantic twin of the minhash drill): the
    non-last-member mass erases in THREE commits (MEMBERS IN-delete
    recording absolute surviving counts in pending_group_sync, GROUPS
    bucket-set rewrite, marker clear). Drill: the GROUPS rewrite
    crashes; the applier refuses copies of an affected group while the
    marker pends; re-running the SAME call converges; fsck clean."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = sa.make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 62
    vec_a = [1.0, 0.0] + base
    vec_b = [0.0, 1.0] + base
    rows = [(1, vec_a), (2, vec_a), (3, vec_a), (4, vec_b), (5, vec_b)]
    schema = "vec_id long, embedding array<float>"
    apply_batch(spark.createDataFrame(rows, schema), 0)
    v_members_before = members_t.latest_version()
    real = groups_t.commit_buckets
    def crash(*a, **k):
        raise RuntimeError("mid-sync crash")
    try:
        groups_t.commit_buckets = crash
        with _pytest.raises(RuntimeError, match="mid-sync crash"):
            sa.erase_semantic_vecs(
                spark, [1, 2], pairs_t, bands_t, vecs_t, groups_t,
                members_t, bk["band_buckets"], bk["vec_buckets"],
                bk["group_buckets"], bk["member_buckets"],
            )
    finally:
        groups_t.commit_buckets = real
    sync = members_t.latest_manifest_field("pending_group_sync")
    assert sync and ": 1" in sync  # absolute target is 3-2=1 survivor
    assert members_t.read(spark).where("vec_id in (1,2)").count() == 0
    with _pytest.raises(ValueError, match="pending_group_sync"):
        apply_batch(spark.createDataFrame([(9, vec_a)], schema), 1)
    sa.erase_semantic_vecs(
        spark, [1, 2], pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    assert not members_t.latest_manifest_field("pending_group_sync")
    counts = {
        r["n_members"]
        for r in groups_t.read(spark).select("n_members").collect()
    }
    assert counts == {1, 2}
    post = {
        (r.va, r.vb)
        for r in sa.serve_semantic_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert post == {(4, 5)}
    assert sa.audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    ) == []
    assert members_t.latest_version() <= v_members_before + 3


def test_semantic_batch_erase_serializes_last_member_clears_with_crash(
    spark, tmp_path
):
    """r14 (VERDICT r13 ask 4, semantic twin of the minhash drill): a
    3-last-member batch erase crashes MID-CLEAR on the second vector;
    re-running the SAME erase_semantic_vecs call converges — the torn
    clear resolves from its pending_clear marker, erased ids
    early-return — and serve matches the survivors-only recompute with
    a clean fsck."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    (pairs_t, bands_t, vecs_t, groups_t, members_t), bk = _sem_tables(tmp_path)
    apply_batch = sa.make_semantic_index_applier(
        pairs_t, bands_t, vecs_t, groups_t, members_t, **bk
    )
    base = [0.0] * 62
    rows = [
        (1, [1.0, 0.0] + base),
        (2, [1.0, 0.05] + base),   # near-dup of 1
        (3, [1.0, 0.1] + base),    # near-dup of 1/2
        (4, [0.0, 1.0] + base),
        (5, [0.0, 1.0] + base),    # exact copy of 4
    ]
    apply_batch(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"), 0
    )
    pre = {
        (r.va, r.vb)
        for r in sa.serve_semantic_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert {(1, 2), (1, 3), (2, 3), (4, 5)} <= pre
    real_clear = sa._clear_semantic_signature
    calls = {"n": 0}

    def flaky_clear(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("mid-batch crash")
        return real_clear(*a, **k)

    try:
        sa._clear_semantic_signature = flaky_clear
        with _pytest.raises(RuntimeError, match="mid-batch crash"):
            sa.erase_semantic_vecs(
                spark, [1, 2, 3], pairs_t, bands_t, vecs_t, groups_t,
                members_t, bk["band_buckets"], bk["vec_buckets"],
                bk["group_buckets"], bk["member_buckets"],
            )
    finally:
        sa._clear_semantic_signature = real_clear
    assert (groups_t.latest_manifest_field("pending_clear") or "").startswith(
        "2@"
    )
    sa.erase_semantic_vecs(
        spark, [1, 2, 3], pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    assert not groups_t.latest_manifest_field("pending_clear")
    post = {
        (r.va, r.vb)
        for r in sa.serve_semantic_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert post == {(4, 5)}
    assert vecs_t.read(spark).where("vec_id in (1,2,3)").count() == 0
    assert bands_t.read(spark).where("vec_id in (1,2,3)").count() == 0
    assert members_t.read(spark).where("vec_id in (1,2,3)").count() == 0
    assert sa.audit_and_repair_semantic_index(
        spark, pairs_t, bands_t, vecs_t, groups_t, members_t,
        bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    ) == []


def test_ivf_bulk_seed_equals_incremental_build(spark, tmp_path):
    """r15: bulk_seed_ivf_index — ONE broadcast assignment pass + ONE
    commit_buckets stands the inverted lists up over an existing corpus;
    assignment depends only on the vector and the FIXED quantizer, so
    the bulk-seeded table is CONTENT-IDENTICAL to chunked ingest (rows,
    identity bucket layout, bucket_scheme marker), the cursor is live,
    and a continuation batch lands identically on both."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    base = [0.0] * 62
    centroid_rows = [
        (0, [1.0, 0.0] + [0.0] * 62),
        (1, [0.0, 1.0] + [0.0] * 62),
    ]
    rows = [
        (10, [0.9, 0.1] + base),
        (11, [0.1, 0.9] + base),
        (12, [0.8, 0.3] + base),
        (13, [0.2, 0.7] + base),
        (14, [0.99, 0.0] + base),
    ]
    schema = "vec_id long, embedding array<float>"

    it = SnapshotTable(str(tmp_path / "incr"))
    apply_incr = sa.make_ivf_index_applier(it, centroid_rows, n_lists=2)
    for i, chunk in enumerate((rows[:2], rows[2:4], rows[4:])):
        apply_incr(spark.createDataFrame(chunk, schema), i)

    bt = SnapshotTable(str(tmp_path / "bulk"))
    sa.bulk_seed_ivf_index(
        spark,
        bt,
        centroid_rows,
        spark.createDataFrame(rows, schema),
        n_lists=2,
        batch_id=2,
    )

    def content(t):
        return sorted(
            (r.vec_id, r.cid, tuple(r.v)) for r in t.read(spark).collect()
        )

    assert content(bt) == content(it)
    for key in ("last_batch_id", "n_buckets", "bucket_scheme"):
        assert bt.latest_manifest_field(key) == it.latest_manifest_field(key)
    # identity bucketing: each list readable by its own id alone
    for cid in (0, 1):
        got = {
            r.vec_id
            for r in bt.read_buckets(
                spark, [cid], sa._IVF_INDEX_SCHEMA, n_buckets=2
            ).collect()
        }
        want = {
            r.vec_id
            for r in it.read_buckets(
                spark, [cid], sa._IVF_INDEX_SCHEMA, n_buckets=2
            ).collect()
        }
        assert got == want
    # fresh-tables guard
    with _pytest.raises(ValueError, match="FRESH tables"):
        sa.bulk_seed_ivf_index(
            spark, bt, centroid_rows, spark.createDataFrame(rows, schema),
            n_lists=2,
        )
    # the stream continues on the bootstrapped index
    batch = spark.createDataFrame([(20, [0.0, 1.0] + base)], schema)
    sa.make_ivf_index_applier(bt, centroid_rows, n_lists=2)(batch, 3)
    apply_incr(batch, 3)
    assert content(bt) == content(it)


def test_semantic_pairs_backfill_completes_deferred_bootstrap(
    spark, tmp_path
):
    """r15: backfill_semantic_pairs — the cluster-scale batch run a
    with_pairs=False bootstrap defers. Pin: bootstrap(with_pairs=False)
    + streaming continuation + backfill serves EXACTLY what
    bootstrap(with_pairs=True) + the same continuation serves (the
    anti-join leaves the stream's own post-bootstrap pairs untouched),
    and the backfill is idempotent — a second run appends 0 pairs and
    publishes no new version."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    base = [0.0] * 61
    rows = [
        (1, [1.0, 0.0, 0.0] + base),
        (2, [1.0, 0.05, 0.0] + base),   # near-dup of 1
        (3, [1.0, 0.0, 0.0] + base),    # exact copy of 1
        (4, [0.0, 1.0, 0.0] + base),
        (5, [0.0, 0.96, 0.28] + base),  # near-dup of 4
        (6, [0.0, 0.0, 1.0] + base),
    ]
    schema = "vec_id long, embedding array<float>"
    extra = [(20, [0.0, 1.0, 0.0] + base), (21, [0.0, 0.0, 1.0] + base)]

    def build(sub, with_pairs):
        ts, bk = _sem_tables(tmp_path / sub)
        sa.bulk_seed_semantic_index(
            spark, *ts, spark.createDataFrame(rows, schema),
            bk["band_buckets"], bk["vec_buckets"], bk["group_buckets"],
            bk["member_buckets"], batch_id=0, with_pairs=with_pairs,
        )
        sa.make_semantic_index_applier(*ts, **bk)(
            spark.createDataFrame(extra, schema), 1
        )
        return ts

    full = build("full", True)
    lazy = build("lazy", False)
    serve = lambda ts: sorted(  # noqa: E731
        (r.va, r.vb)
        for r in sa.serve_semantic_pairs(spark, ts[0], ts[3], ts[4]).collect()
    )
    want = serve(full)
    # deferred: only the stream's own pairs are visible pre-backfill
    assert set(serve(lazy)) < set(want)
    n = sa.backfill_semantic_pairs(spark, lazy[0], lazy[1], lazy[2])
    assert n > 0
    assert serve(lazy) == want
    assert (1, 2) in want and (4, 5) in want and (4, 20) in want
    # cursor untouched, second run is a committed no-op
    assert lazy[0].latest_manifest_field("last_batch_id") == 1
    v = lazy[0].latest_version()
    assert sa.backfill_semantic_pairs(spark, lazy[0], lazy[1], lazy[2]) == 0
    assert lazy[0].latest_version() == v


def test_bootstrapped_semantic_index_supports_erase_and_fsck(
    spark, tmp_path
):
    """r15 integration seam, semantic twin: batch GDPR erase + fsck on a
    BULK-SEEDED index (the erase reads the LSH layout and bucket counts
    from manifest fields the bootstrap writes; the last-member clear
    recomputes band keys from bootstrap-written VECS rows)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ann as sa

    base = [0.0] * 62
    vec_a = [1.0, 0.0] + base
    vec_b = [0.0, 1.0] + base
    rows = [(1, vec_a), (2, vec_a), (3, [1.0, 0.05] + base), (4, vec_b),
            (5, [0.0, 0.96] + [0.28] + base[:-1])]
    ts, bk = _sem_tables(tmp_path)
    sa.bulk_seed_semantic_index(
        spark, *ts, spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        bk["band_buckets"], bk["vec_buckets"], bk["group_buckets"],
        bk["member_buckets"], batch_id=0,
    )
    # whole-group erase of (1,2): last-member signature clear included
    sa.erase_semantic_vecs(
        spark, [1, 2], *ts, bk["band_buckets"], bk["vec_buckets"],
        bk["group_buckets"], bk["member_buckets"],
    )
    served = {
        (r.va, r.vb)
        for r in sa.serve_semantic_pairs(spark, ts[0], ts[3], ts[4]).collect()
    }
    assert served == {(4, 5)}
    for t in (ts[1], ts[2], ts[4]):
        assert t.read(spark).where("vec_id in (1,2)").count() == 0
    assert (
        sa.audit_and_repair_semantic_index(
            spark, *ts, bk["band_buckets"], bk["vec_buckets"],
            bk["group_buckets"], bk["member_buckets"],
        )
        == []
    )
