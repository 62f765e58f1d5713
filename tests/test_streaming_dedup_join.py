"""Streaming dedup (exactly-once) + stream-stream interval join vs batch."""

from __future__ import annotations

import datetime

from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.dedup_join import (
    dedup_stream,
    interval_join_streams,
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_streaming_dedup_drops_replays(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        (1, _ts(10, 0), "a"),
        (2, _ts(10, 5), "b"),
        (1, _ts(10, 0), "a"),  # replay of event 1 (at-least-once source)
        (3, _ts(10, 10), "c"),
        (2, _ts(10, 5), "b"),  # replay
    ]
    spark.createDataFrame(rows, "event_id long, ts timestamp, payload string").coalesce(
        1
    ).write.parquet(src)
    out = dedup_stream(spark, src, "event_id long, ts timestamp, payload string")
    got = sorted((r.event_id, r.payload) for r in out.collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    limp, rclk = str(tmp_path / "imp"), str(tmp_path / "clk")
    imps = [
        (100, 1, _ts(9, 0)),
        (101, 1, _ts(11, 0)),
        (102, 2, _ts(9, 30)),
    ]
    clks = [
        (200, 1, _ts(9, 10)),   # joins imp 100 (within 30 min)
        (201, 1, _ts(11, 45)),  # outside 30 min of imp 101 → no join
        (202, 2, _ts(9, 31)),   # joins imp 102
        (203, 3, _ts(9, 0)),    # no impression for user 3
    ]
    spark.createDataFrame(imps, "imp_id long, imp_user long, imp_ts timestamp").coalesce(1).write.parquet(limp)
    spark.createDataFrame(clks, "clk_id long, clk_user long, clk_ts timestamp").coalesce(1).write.parquet(rclk)
    out = interval_join_streams(
        spark,
        limp,
        rclk,
        "imp_id long, imp_user long, imp_ts timestamp",
        "clk_id long, clk_user long, clk_ts timestamp",
    )
    got = sorted((r.imp_id, r.clk_id) for r in out.collect())
    assert got == [(100, 200), (102, 202)]


def test_streaming_incremental_merge_into_warehouse(spark, tmp_path):
    """Production loop glued end-to-end: stream → windowed agg → foreachBatch
    merge_upsert into the partitioned warehouse; a second batch updates an
    existing hour's row (key-level MERGE) instead of duplicating it."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark import sinks

    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    ck = str(tmp_path / "ck")

    def feed(rows):
        spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(src)
        hourly = (
            stream.groupBy(
                F.to_date("ts").alias("date"), F.hour("ts").alias("hour")
            ).agg(F.count("*").alias("n_events"))
        )

        def upsert(batch_df, batch_id):
            if not batch_df.isEmpty():
                sinks.merge_upsert(spark, wh, batch_df, keys=("date", "hour"))

        q = (
            hourly.writeStream.foreachBatch(upsert)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed([(1, _ts(10, 0)), (2, _ts(10, 30)), (3, _ts(11, 0))])
    run()
    first = {(str(r.date), r.hour): r.n_events for r in spark.read.parquet(wh).collect()}
    assert first == {("2024-01-01", 10): 2, ("2024-01-01", 11): 1}

    feed([(4, _ts(10, 45)), (5, _ts(12, 0))])
    run()
    second = {(str(r.date), r.hour): r.n_events for r in spark.read.parquet(wh).collect()}
    assert second == {
        ("2024-01-01", 10): 3,  # updated in place, not duplicated
        ("2024-01-01", 11): 1,
        ("2024-01-01", 12): 1,  # inserted
    }


def test_registered_streaming_dedup_equals_batch_distinct(spark):
    """The registry entry replays events twice; output must equal the
    batch-distinct set of event_ids exactly."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.dedup_join import (
        q_streaming_dedup,
    )

    SF = "/root/testdata/sf0.001"
    got = {r.event_id for r in q_streaming_dedup(spark, SF).collect()}
    want = {r.event_id for r in load_table(spark, SF, "events").collect()}
    assert got == want


def test_registered_streaming_interval_join_equals_batch(spark):
    """Stream-stream interval join must emit exactly the batch inequality
    join's pairs (availableNow processes everything, watermarks only bound
    state)."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.dedup_join import (
        q_streaming_interval_join,
    )

    SF = "/root/testdata/sf0.001"
    got = {(r.imp_id, r.clk_id) for r in q_streaming_interval_join(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    e = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("eid"), F.col("ts").alias("ets")
    )
    want = {
        (r.pid, r.eid)
        for r in p.join(e, "u")
        .filter("ets >= pts AND ets <= pts + interval 30 minutes")
        .collect()
    }
    assert got == want


def test_registered_streaming_interval_join_outer_equals_batch(spark):
    """LEFT OUTER stream-stream interval join must emit every purchase
    exactly once per match plus a null-padded row for unmatched purchases —
    including the TRAILING ones, which only flush because the staged folder's
    far-future sentinel advances the final watermark past their
    `ts + 30min` eviction bound."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.dedup_join import (
        q_streaming_interval_join_outer,
    )

    SF = "/root/testdata/sf0.001"
    got = sorted(
        ((r.imp_id, r.clk_id) for r in q_streaming_interval_join_outer(spark, SF).collect()),
        key=str,
    )
    ev = load_table(spark, SF, "events")
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    e = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("eid"), F.col("ts").alias("ets")
    )
    want = sorted(
        (
            (r.pid, r.eid)
            for r in p.join(
                e,
                (p.u == e.u)
                & (e.ets >= p.pts)
                & (e.ets <= p.pts + F.expr("interval 30 minutes")),
                "left",
            ).collect()
        ),
        key=str,
    )
    assert got == want
    # the sentinel itself must never leak into the output
    assert all(i >= 0 for i, _ in got)
    # and at least one null-padded (unmatched) row must exist — otherwise
    # this degenerates to the inner-join test
    assert any(c is None for _, c in got)


def test_registered_streaming_interval_join_full_equals_batch(spark):
    """FULL OUTER twin: matched pairs, abandoned purchases AND orphan
    errors must all emit — both directions of watermark-driven
    null-padding, flushed by the sentinel."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.dedup_join import (
        q_streaming_interval_join_full,
    )

    SF = "/root/testdata/sf0.001"
    got = sorted(
        (
            (r.imp_id, r.clk_id)
            for r in q_streaming_interval_join_full(spark, SF).collect()
        ),
        key=str,
    )
    ev = load_table(spark, SF, "events")
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    e = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("eu"), F.col("event_id").alias("eid"), F.col("ts").alias("ets")
    )
    want = sorted(
        (
            (r.pid, r.eid)
            for r in p.join(
                e,
                (p.pu == e.eu)
                & (e.ets >= p.pts)
                & (e.ets <= p.pts + F.expr("interval 30 minutes")),
                "full",
            ).collect()
        ),
        key=str,
    )
    assert got == want
    # both outer directions genuinely exercised
    assert any(c is None for _, c in got)  # abandoned purchase
    assert any(i is None for i, _ in got)  # orphan error


def test_bm25_index_applier_replay_and_incremental(spark, tmp_path):
    """The r9 BM25 index applier: (1) batches accumulate — postings
    append, df sums, counters add; (2) an at-least-once REPLAY of an
    already-applied batch_id is a no-op for BOTH tables (each guards on
    its own last_batch_id cursor — counters and df are non-idempotent
    sums, so a naive replay would double them); (3) a partial failure is
    healed: if only the postings table advanced, replaying the batch
    applies ONLY the df half."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_bm25_index_applier,
    )

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=4)

    b1 = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame([(3, "a d")], "doc_id long, text string")
    apply_batch(b1, 0)
    apply_batch(b2, 1)

    def state():
        n = postings_t.latest_manifest_field("n_docs")
        s = postings_t.latest_manifest_field("sum_dl")
        dfm = {r.term: r.df for r in df_t.read(spark).collect()}
        np = postings_t.read(spark).count()
        return (n, s, dfm, np)

    want = (3, 7, {"a": 2, "b": 2, "c": 1, "d": 1}, 6)
    assert state() == want
    # (2) replay of batch 1 is a no-op on both tables
    apply_batch(b2, 1)
    assert state() == want
    # (3) partial failure: postings at batch 2, df still at batch 1 —
    # replay applies only the df half
    b3 = spark.createDataFrame([(4, "d d")], "doc_id long, text string")
    toks = b3.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    tf3 = toks.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    postings_t.commit(
        tf3,
        mode="append",
        extra={"last_batch_id": 2, "n_docs": 4, "sum_dl": 9},
    )
    apply_batch(b3, 2)  # postings already has batch 2; df catches up
    assert state() == (4, 9, {"a": 2, "b": 2, "c": 1, "d": 2}, 7)


def test_pack_index_applier_replay_and_torn_commit(spark, tmp_path):
    """Replay + torn-commit drills for the incremental packing index
    (r10): (a) a replayed batch_id is a no-op on both tables (the packs
    append is non-idempotent, guarded by per-table cursors); (b) a crash
    between the packs append and the tails merge heals on replay — only
    the table that is behind applies the batch, and the healed state
    equals the crash-free run; (c) cross-batch tail seeding: a shard
    split across batches packs exactly as one pass would."""
    import pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        SHARD_SPAN,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_pack_index_applier,
    )

    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    apply_batch = make_pack_index_applier(packs_t, tails_t, n_buckets=4)
    schema = "doc_id long, text string, source string"

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in range(lo, hi)], schema
        )

    # batch 0 fills half of shard 0; batch 1 continues it (same shard)
    apply_batch(docs(0, SHARD_SPAN // 2), 0)
    apply_batch(docs(SHARD_SPAN // 2, SHARD_SPAN), 1)
    one_pass = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    # (c) equals one batch pass over the concatenated rows
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        pack_documents_sharded,
    )

    want = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in pack_documents_sharded(docs(0, SHARD_SPAN)).collect()
    }
    assert one_pass == want

    # (a) replaying batch 1 changes nothing
    vp, vt = packs_t.latest_version(), tails_t.latest_version()
    apply_batch(docs(SHARD_SPAN // 2, SHARD_SPAN), 1)
    assert (packs_t.latest_version(), tails_t.latest_version()) == (vp, vt)

    # (b) torn between the packs append and the tails merge on batch 2:
    # fail the SECOND manifest publish (the tails merge's commit)
    b2 = docs(SHARD_SPAN, SHARD_SPAN + 10)
    real_publish = SnapshotTable._write_manifest
    calls = {"n": 0}
    try:
        def torn(self, manifest):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated crash before tails commit")
            return real_publish(self, manifest)

        SnapshotTable._write_manifest = torn
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(b2, 2)
    finally:
        SnapshotTable._write_manifest = real_publish
    assert packs_t.latest_manifest_field("last_batch_id") == 2
    assert tails_t.latest_manifest_field("last_batch_id") == 1  # behind
    # restart replays batch 2: packs skip, tails catch up
    apply_batch(b2, 2)
    assert tails_t.latest_manifest_field("last_batch_id") == 2
    healed = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    want_all = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in pack_documents_sharded(docs(0, SHARD_SPAN + 10)).collect()
    }
    assert healed == want_all
    # and batch 3 continues from the healed tails
    apply_batch(docs(SHARD_SPAN + 10, SHARD_SPAN + 20), 3)
    final = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    want_final = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in pack_documents_sharded(docs(0, SHARD_SPAN + 20)).collect()
    }
    assert final == want_final


def test_pack_index_out_of_order_batch_fails_fast(spark, tmp_path):
    """The incremental packer's ordering contract (doc_id-monotone
    arrival per (source, shard)) is ENFORCED, not just documented: a
    batch delivering a doc_id <= a shard's last packed doc_id raises
    BEFORE any commit — previously such a batch silently produced a
    packing that no longer equals the whole-corpus recompute (the exact
    failure class the CDC applier defends against). A replayed batch_id
    must NOT trip the guard (its doc_ids are already packed)."""
    import pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_pack_index_applier,
    )

    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    apply_batch = make_pack_index_applier(packs_t, tails_t, n_buckets=4)
    schema = "doc_id long, text string, source string"

    def docs(ids):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in ids], schema
        )

    apply_batch(docs(range(0, 10)), 0)
    vp, vt = packs_t.latest_version(), tails_t.latest_version()
    # doc 5 already packed in shard 0 -> loud failure, no commit
    with pytest.raises(ValueError, match="ordering contract"):
        apply_batch(docs([5, 11]), 1)
    assert (packs_t.latest_version(), tails_t.latest_version()) == (vp, vt)
    # equal doc_id (replay of one doc inside a NEW batch id) also fails:
    # monotone means strictly increasing
    with pytest.raises(ValueError, match="ordering contract"):
        apply_batch(docs([9]), 1)
    # but a full replay of an applied batch id is a cursor-guarded no-op,
    # not a contract violation
    apply_batch(docs(range(0, 10)), 0)
    assert (packs_t.latest_version(), tails_t.latest_version()) == (vp, vt)
    # and the stream continues normally after the rejected batch
    apply_batch(docs(range(10, 20)), 1)
    assert packs_t.read(spark).count() == 20


def test_pack_index_tail_read_bounded_by_batch_shards(spark, tmp_path):
    """Per-batch tail maintenance must track the BATCH's shards, not the
    bucket population: with 200 pre-existing shard tails in 4 buckets, a
    batch touching 2 shards must read exactly its 2 tails (In(pk)
    pushdown at the parquet scan), not the ~50 tails of each touched
    bucket — the difference between O(batch shards) and O(|tails|/
    n_buckets) per batch, the r10 100x scale-killer."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        SHARD_SPAN,
        pack_documents_sharded,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest,
    )

    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    apply_batch = ingest.make_pack_index_applier(
        packs_t, tails_t, n_buckets=4, record_stats=True
    )
    schema = "doc_id long, text string, source string"

    def docs(ids):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in ids], schema
        )

    # batch 0: one doc in each of 200 shards -> 200 tails across 4 buckets
    seed_ids = [s * SHARD_SPAN for s in range(200)]
    apply_batch(docs(seed_ids), 0)
    assert tails_t.read(spark).count() == 200
    # batch 1: 2 shards, continuing both
    prev_capture = ingest.PLAN_CAPTURE
    ingest.PLAN_CAPTURE = {}
    try:
        apply_batch(docs([3 * SHARD_SPAN + 1, 7 * SHARD_SPAN + 1]), 1)
        plan = ingest.PLAN_CAPTURE["streaming_pack_index.tails_pruned_read"]
    finally:
        ingest.PLAN_CAPTURE = prev_capture
    stats = apply_batch.last_stats
    assert stats["batch_id"] == 1
    assert stats["batch_shards"] == 2
    # THE pin: 2 tails read, though each touched bucket holds ~50
    assert stats["tails_read_rows"] == 2
    # and the prune reached the parquet scan as a pushed In filter
    assert "PushedFilters" in plan and "In(pk" in plan
    # continuation stays correct: equals one pass over the union
    got = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    want = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in pack_documents_sharded(
            docs(sorted(seed_ids + [3 * SHARD_SPAN + 1, 7 * SHARD_SPAN + 1]))
        ).collect()
    }
    assert got == want


def test_pack_index_buckets_for_scales_with_corpus():
    """n_buckets doubles from the floor until each bucket holds at most
    PACK_IDX_SHARDS_PER_BUCKET expected shards — bounded merge rewrites
    at any corpus size, power-of-two so re-derivation is stable."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        SHARD_SPAN,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        PACK_IDX_BUCKETS,
        PACK_IDX_SHARDS_PER_BUCKET,
        pack_index_buckets_for,
    )

    assert pack_index_buckets_for(0) == PACK_IDX_BUCKETS
    assert pack_index_buckets_for(10_000) == PACK_IDX_BUCKETS
    for docs in (10**8, 10**10, 10**12):
        n = pack_index_buckets_for(docs)
        shards = docs // SHARD_SPAN
        assert n * PACK_IDX_SHARDS_PER_BUCKET >= shards
        # and not overshooting by more than one doubling
        assert n == PACK_IDX_BUCKETS or (
            (n // 2) * PACK_IDX_SHARDS_PER_BUCKET < shards
        )
        assert (n & (n - 1)) == 0


def test_index_appliers_semi_join_fallback(spark, tmp_path, monkeypatch):
    """Past _PACK_PK_ISIN_CAP distinct keys, the pruned index reads switch
    from an In-list pushdown to a broadcast semi-join (a multi-10k In
    bloats the plan). Force the cap to 0 so every read takes the fallback
    branch, and assert both appliers still produce exactly the recompute:
    the pack index vs pack_documents_sharded, the near-dup index vs the
    whole-corpus pair set."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _pair_jaccard,
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        SHARD_SPAN,
        pack_documents_sharded,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest,
    )
    from pyspark.sql import functions as F

    monkeypatch.setattr(ingest, "_PACK_PK_ISIN_CAP", 0)

    # pack index under the fallback
    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    pk_apply = ingest.make_pack_index_applier(packs_t, tails_t, n_buckets=4)
    pschema = "doc_id long, text string, source string"

    def pdocs(lo, hi):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in range(lo, hi)], pschema
        )

    pk_apply(pdocs(0, SHARD_SPAN // 2), 0)
    pk_apply(pdocs(SHARD_SPAN // 2, SHARD_SPAN), 1)
    got = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    want = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in pack_documents_sharded(pdocs(0, SHARD_SPAN)).collect()
    }
    assert got == want

    # near-dup index under the fallback (all three pruned reads: groups,
    # bands, shingles)
    pairs_t = SnapshotTable(str(tmp_path / "mh_pairs"))
    bands_t = SnapshotTable(str(tmp_path / "mh_bands"))
    shingles_t = SnapshotTable(str(tmp_path / "mh_shingles"))
    groups_t = SnapshotTable(str(tmp_path / "mh_groups"))
    members_t = SnapshotTable(str(tmp_path / "mh_members"))
    mh_apply = ingest.make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=4
    )
    mschema = "doc_id long, text string"
    fam = "the quick brown fox jumps over the lazy dog again and again "
    corpus = [
        (1, fam + "alpha beta"),
        (2, "totally unrelated q w e r t y u i o p"),
        (11, fam + "alpha gamma"),
        (12, "totally unrelated q w e r t y u i o z"),
    ]
    mh_apply(spark.createDataFrame(corpus[:2], mschema), 0)
    mh_apply(spark.createDataFrame(corpus[2:], mschema), 1)
    stored = {
        (r.da, r.db, round(r.jaccard, 9))
        for r in ingest.serve_minhash_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    df = spark.createDataFrame(corpus, mschema)
    sh = doc_shingles(df)
    want_pairs = {
        (r.da, r.db, round(r.jaccard, 9))
        for r in _pair_jaccard(sh, lsh_candidate_pairs(minhash_signatures(sh)))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .collect()
    }
    assert stored == want_pairs and any(p[:2] == (1, 11) for p in stored)


def test_bm25_df_buckets_sized_and_merge_bounded(spark, tmp_path):
    """r12: the BM25 df table's bucket count is sized from the expected
    VOCABULARY (the r11 pack-tails lesson on the term dimension) — the
    sizing helper doubles until each bucket holds a bounded term
    population, the Heaps-fit estimator extrapolates id-heavy corpora
    near-linearly and prose sublinearly, and a small batch's merge
    rewrites only its own terms' buckets with bounded bytes, never
    O(vocabulary)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest,
    )
    from pyspark.sql import functions as F

    # sizing helper: floor below the target, doubling above, power of 2
    assert ingest.bm25_index_buckets_for(0) == ingest.BM25_IDX_BUCKETS
    assert ingest.bm25_index_buckets_for(10_000) == ingest.BM25_IDX_BUCKETS
    for terms in (10**6, 10**7, 10**9):
        n = ingest.bm25_index_buckets_for(terms)
        assert n * ingest.BM25_IDX_TERMS_PER_BUCKET >= terms
        assert n == ingest.BM25_IDX_BUCKETS or (
            (n // 2) * ingest.BM25_IDX_TERMS_PER_BUCKET < terms
        )
        assert (n & (n - 1)) == 0

    # Heaps-fit estimator: id-heavy corpus (every token unique) must
    # extrapolate ~linearly; a closed vocabulary must stay ~flat
    ids = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"u{j}_"), F.col("id")) for j in range(10)]
        ).alias("text"),
    )
    est_ids = ingest.estimate_vocabulary(ids, 200_000)
    assert est_ids >= 1_000_000  # ~10 new terms per doc at 200k docs
    prose = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same ten words repeated in every document body x").alias(
            "text"
        ),
    )
    est_prose = ingest.estimate_vocabulary(prose, 200_000)
    assert est_prose <= 1_000  # sqrt-clamped, nowhere near linear

    # merge-rewrite pin: with vocabulary-sized buckets, a 5-term batch
    # touches <= 5 buckets and rewrites ~vocab/n_buckets term rows, not
    # the vocabulary
    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    nb = 64
    apply_batch = ingest.make_bm25_index_applier(postings_t, df_t, n_buckets=nb)
    schema = "doc_id long, text string"
    big = [
        (i, " ".join(f"t{i}_{j}" for j in range(20))) for i in range(100)
    ]  # 2000 distinct terms
    apply_batch(spark.createDataFrame(big, schema), 0)
    bm_pre = df_t._bucket_map(df_t.latest_version())
    apply_batch(
        spark.createDataFrame([(1000, "t0_0 t0_1 alpha beta gamma")], schema), 1
    )
    bm_post = df_t._bucket_map(df_t.latest_version())
    changed = [
        b for b in set(bm_pre) | set(bm_post) if bm_pre.get(b) != bm_post.get(b)
    ]
    assert 1 <= len(changed) <= 5
    vocab = df_t.read(spark).count()
    assert vocab >= 2000
    rewritten = spark.read.parquet(
        *[d for b in changed for d in bm_post[b]]
    ).count()
    # each rewritten bucket holds ~vocab/nb terms; 5 buckets' worth is a
    # small constant fraction — a fixed-8 layout would rewrite ~5/8 of
    # the whole vocabulary instead
    assert rewritten <= 5 * (vocab // nb + 1) + 5


def test_bm25_postings_chain_folds(spark, tmp_path, monkeypatch):
    """r12: the flat postings append chain LSM-folds once past the dir
    threshold — 12 one-doc batches must not leave 12 data dirs — while
    the manifest counters (n_docs, sum_dl) and cursor ride through the
    fold untouched."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest,
    )

    monkeypatch.setattr(ingest, "BM25_IDX_MAX_DIRS", 3)
    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = ingest.make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    schema = "doc_id long, text string"
    for i in range(12):
        apply_batch(
            spark.createDataFrame(
                [(i, " ".join(f"w{i}_{j}" for j in range(5)))], schema
            ),
            i,
        )
    dirs = len(postings_t._manifest(postings_t.latest_version())["dirs"])
    assert dirs <= 3 + 1, f"postings: {dirs} dirs"
    assert postings_t.latest_manifest_field("n_docs") == 12
    assert postings_t.latest_manifest_field("sum_dl") == 60
    assert postings_t.latest_manifest_field("last_batch_id") == 11
    assert postings_t.read(spark).count() == 12 * 5


def test_bm25_erase_torn_window_retry_converges(spark, tmp_path):
    """r13: the BM25 erase is retry-convergent — the marker-guarded df
    decrement commits FIRST, the postings delete (with atomically-shrunk
    counters) LAST. A crash between the two leaves the postings (the
    recompute source) intact; a plain retry skips the already-applied df
    half (marker match — no double decrement) and completes the delete."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        audit_and_repair_bm25_index,
        erase_doc_from_bm25_index,
        make_bm25_index_applier,
    )

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    apply_batch(
        spark.createDataFrame(
            [(1, "a b a"), (2, "b c")], "doc_id long, text string"
        ),
        0,
    )
    assert audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []

    # crash exactly before the postings delete (the LAST commit)
    real_delete = postings_t.delete_where
    state = {"calls": 0}

    def crashing(*a, **k):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("simulated crash before postings delete")
        return real_delete(*a, **k)

    postings_t.delete_where = crashing
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    # torn state: df already decremented (doc 1 = {a, b}), postings intact
    dfm = {r.term: r.df for r in df_t.read(spark).collect()}
    assert dfm == {"a": 0, "b": 1, "c": 1}
    assert postings_t.read(spark).filter("doc_id = 1").count() == 2
    assert postings_t.latest_manifest_field("n_docs") == 2  # not yet shrunk
    # plain retry converges WITHOUT double-subtracting df
    erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    dfm = {r.term: r.df for r in df_t.read(spark).collect()}
    assert dfm == {"a": 0, "b": 1, "c": 1}  # unchanged: marker skipped it
    assert postings_t.read(spark).filter("doc_id = 1").count() == 0
    assert postings_t.latest_manifest_field("n_docs") == 1
    assert postings_t.latest_manifest_field("sum_dl") == 2
    # a third call (erase already complete) is a no-op
    v_p, v_d = postings_t.latest_version(), df_t.latest_version()
    erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    assert (postings_t.latest_version(), df_t.latest_version()) == (v_p, v_d)
    # the fsck agrees every surface is consistent
    assert audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []


def test_bm25_fsck_repairs_pre_r13_torn_erase_and_counter_drift(
    spark, tmp_path
):
    """audit_and_repair_bm25_index recomputes ground truth from the
    postings: (a) a pre-r13 torn erase (postings deleted, df never
    decremented — permanently-inflated IDF) is detected and the drifted
    terms' buckets rewritten with true counts; (b) drifted corpus
    counters are republished in a metadata-only step; (c) a consistent
    index reports []."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        audit_and_repair_bm25_index,
        make_bm25_index_applier,
    )

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    apply_batch(
        spark.createDataFrame(
            [(1, "a b a"), (2, "b c")], "doc_id long, text string"
        ),
        0,
    )
    # (a) simulate the pre-r13 torn erase of doc 1: postings + counters
    # shrink, df is left inflated
    postings_t.delete_where(
        spark, "doc_id = 1", extra={"n_docs": 1, "sum_dl": 2}
    )
    rep = audit_and_repair_bm25_index(spark, postings_t, df_t, 4)
    kinds = {r["kind"] for r in rep}
    assert kinds == {"df_drift"}
    drifted = {r["term"]: (r["stored_df"], r["true_df"]) for r in rep}
    assert drifted == {"a": (1, 0), "b": (2, 1)}
    dfm = {r.term: r.df for r in df_t.read(spark).collect()}
    assert dfm == {"a": 0, "b": 1, "c": 1}
    assert audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []
    # (b) counter drift: republish corrected counters metadata-only
    postings_t.delete_where(
        spark, "doc_id IS NULL", extra={"n_docs": 99, "sum_dl": 99}
    )
    rep2 = audit_and_repair_bm25_index(spark, postings_t, df_t, 4)
    assert [r["kind"] for r in rep2] == ["counter_drift"]
    assert postings_t.latest_manifest_field("n_docs") == 1
    assert postings_t.latest_manifest_field("sum_dl") == 2
    assert audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []


def test_pack_index_erase_tombstones_without_disturbing_survivors(
    spark, tmp_path
):
    """Pack-index GDPR erase (r13): tombstone semantics — the erased
    doc's row leaves; every surviving row is BYTE-IDENTICAL; the tails
    are untouched so a post-erase batch packs exactly as it would have
    without the erase; a repeat erase no-ops; and the erase is one
    atomic commit (crash before publish leaves the pre-erase version)."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
        SHARD_SPAN,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        erase_doc_from_pack_index,
        make_pack_index_applier,
    )

    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    apply_batch = make_pack_index_applier(packs_t, tails_t, n_buckets=4)
    schema = "doc_id long, text string, source string"

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in range(lo, hi)], schema
        )

    apply_batch(docs(0, 40), 0)
    before = {
        r.doc_id: (r.shard, r.n_tokens, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    tails_v = tails_t.latest_version()
    # crash drill: publish dies -> pre-erase version stays current
    real_publish = SnapshotTable._write_manifest
    try:
        def crashing(self, manifest):
            raise RuntimeError("simulated crash before erase publish")

        SnapshotTable._write_manifest = crashing
        with _pytest.raises(RuntimeError, match="simulated crash"):
            erase_doc_from_pack_index(spark, packs_t, 7)
    finally:
        SnapshotTable._write_manifest = real_publish
    assert packs_t.read(spark).where("doc_id = 7").count() == 1
    # the real erase: doc 7 gone, survivors byte-identical, tails calm
    erase_doc_from_pack_index(spark, packs_t, 7)
    after = {
        r.doc_id: (r.shard, r.n_tokens, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    }
    assert 7 not in after
    assert after == {k: v for k, v in before.items() if k != 7}
    assert tails_t.latest_version() == tails_v
    # repeat erase converges: content identical (delete_where always
    # publishes a lineage step — that carry-forward is what the BM25
    # fsck's metadata-only republish rides — but no dir rewrites: every
    # dir carries over by reference when the probe finds no matches)
    dirs_before = packs_t._manifest(packs_t.latest_version())["dirs"]
    erase_doc_from_pack_index(spark, packs_t, 7)
    assert packs_t._manifest(packs_t.latest_version())["dirs"] == dirs_before
    assert {
        r.doc_id: (r.shard, r.n_tokens, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).collect()
    } == after
    # continuation is unchanged: the next batch packs exactly as a
    # never-erased index would (same shard tail state)
    apply_batch(docs(40, 60), 1)
    cont = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs_t.read(spark).where("doc_id >= 40").collect()
    }
    packs2 = SnapshotTable(str(tmp_path / "packs2"))
    tails2 = SnapshotTable(str(tmp_path / "tails2"))
    apply2 = make_pack_index_applier(packs2, tails2, n_buckets=4)
    apply2(docs(0, 40), 0)
    apply2(docs(40, 60), 1)
    want = {
        r.doc_id: (r.shard, r.pack_id, r.pack_used)
        for r in packs2.read(spark).where("doc_id >= 40").collect()
    }
    assert cont == want


def test_bm25_erase_ambiguity_guards_fail_loud_and_fsck_resolves(
    spark, tmp_path
):
    """The two marker-ambiguity states the r13 erase refuses to guess on
    (each would silently double-subtract df): (A) an ingest batch commits
    between a torn erase's df half and the retry — the retry's marker no
    longer matches, the guard raises, and the fsck restores df ground
    truth + clears the marker so a fresh erase applies cleanly; (B) a
    SECOND doc's erase starts while the first is torn — the guard raises
    until the pending erase is retried to completion."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        audit_and_repair_bm25_index,
        erase_doc_from_bm25_index,
        make_bm25_index_applier,
    )

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    apply_batch(
        spark.createDataFrame(
            [(1, "a b a"), (2, "b c")], "doc_id long, text string"
        ),
        0,
    )

    def tear_erase(doc):
        real = postings_t.delete_where
        try:
            def crash(*a, **k):
                raise RuntimeError("torn")

            postings_t.delete_where = crash
            with _pytest.raises(RuntimeError, match="torn"):
                erase_doc_from_bm25_index(spark, postings_t, df_t, doc, 4)
        finally:
            postings_t.delete_where = real

    # (B) second erase while the first is torn
    tear_erase(1)
    with _pytest.raises(ValueError, match="incomplete"):
        erase_doc_from_bm25_index(spark, postings_t, df_t, 2, 4)
    # retrying the pending erase completes it; doc 2's erase then runs
    erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    erase_doc_from_bm25_index(spark, postings_t, df_t, 2, 4)
    assert postings_t.read(spark).count() == 0
    assert {r.term: r.df for r in df_t.read(spark).collect()} == {
        "a": 0, "b": 0, "c": 0,
    }

    # (A) ingest between the torn df half and the retry
    apply_batch(
        spark.createDataFrame([(3, "d e")], "doc_id long, text string"), 1
    )
    tear_erase(3)
    apply_batch(
        spark.createDataFrame([(4, "d f")], "doc_id long, text string"), 2
    )
    with _pytest.raises(ValueError, match="ambiguous"):
        erase_doc_from_bm25_index(spark, postings_t, df_t, 3, 4)
    rep = audit_and_repair_bm25_index(spark, postings_t, df_t, 4)
    kinds = [r["kind"] for r in rep]
    # df restored UP for doc 3's terms (its decrement is neutralized
    # while its postings survive) and the stale marker cleared
    assert "df_drift" in kinds and "erase_marker_cleared" in kinds
    # the fresh erase now applies from scratch and converges
    erase_doc_from_bm25_index(spark, postings_t, df_t, 3, 4)
    assert postings_t.read(spark).filter("doc_id = 3").count() == 0
    dfm = {r.term: r.df for r in df_t.read(spark).collect() if r.df > 0}
    assert dfm == {"d": 1, "f": 1}  # doc 4 alone
    assert postings_t.latest_manifest_field("n_docs") == 1
    assert audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []


def test_bm25_index_random_interleaved_batches_and_erases(spark, tmp_path):
    """Seeded lifecycle fuzz for the BM25 index (r13, the retrieval twin
    of the semantic index's r12 fuzz): a small corpus streams in random
    batch splits with erases interleaved — some erases TORN mid-way
    (crash before the postings delete) and resolved by plain retry or by
    the fsck, per the seeded coin. After every schedule the maintained
    index must serve EXACTLY what a one-shot rebuild over the surviving
    docs serves (same top-k, same scores, same drafted queries — the
    incremental-view-maintenance contract), and the fsck must report the
    index consistent."""
    import random

    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        _serve_bm25_from_index,
        audit_and_repair_bm25_index,
        erase_doc_from_bm25_index,
        make_bm25_index_applier,
    )

    words = ["alpha", "beta", "gamma", "delta", "kappa", "omega", "sigma"]
    pyrng = random.Random(13)
    docs = {
        i: " ".join(pyrng.choices(words, k=pyrng.randint(4, 12)))
        for i in range(24)
    }

    def rebuild_and_serve(survivors: dict[int, str], root) -> set:
        p2 = SnapshotTable(str(root / "p2"))
        d2 = SnapshotTable(str(root / "d2"))
        apply2 = make_bm25_index_applier(p2, d2, n_buckets=4)
        apply2(
            spark.createDataFrame(
                list(survivors.items()), "doc_id long, text string"
            ),
            0,
        )
        return {
            tuple(r)
            for r in _serve_bm25_from_index(spark, p2, d2).collect()
        }

    for trial in range(3):
        root = tmp_path / f"t{trial}"
        postings_t = SnapshotTable(str(root / "postings"))
        df_t = SnapshotTable(str(root / "df"))
        apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=4)
        ids = list(docs)
        pyrng.shuffle(ids)
        cuts = sorted(pyrng.sample(range(1, len(ids)), 2))
        batches = [ids[a:b] for a, b in zip([0] + cuts, cuts + [len(ids)])]
        alive: dict[int, str] = {}
        bid = 0
        for batch_ids in batches:
            apply_batch(
                spark.createDataFrame(
                    [(i, docs[i]) for i in batch_ids],
                    "doc_id long, text string",
                ),
                bid,
            )
            bid += 1
            alive.update({i: docs[i] for i in batch_ids})
            if len(alive) > 2 and pyrng.random() < 0.8:
                victim = pyrng.choice(sorted(alive))
                if pyrng.random() < 0.5:
                    # torn erase: crash before the postings delete
                    real = postings_t.delete_where
                    try:
                        def crash(*a, **k):
                            raise RuntimeError("torn")

                        postings_t.delete_where = crash
                        try:
                            erase_doc_from_bm25_index(
                                spark, postings_t, df_t, victim, 4
                            )
                        except RuntimeError:
                            pass
                    finally:
                        postings_t.delete_where = real
                    if pyrng.random() < 0.5:
                        # resolve by plain retry
                        erase_doc_from_bm25_index(
                            spark, postings_t, df_t, victim, 4
                        )
                    else:
                        # resolve by fsck (restores df, clears marker)
                        # then a fresh erase
                        audit_and_repair_bm25_index(
                            spark, postings_t, df_t, 4
                        )
                        erase_doc_from_bm25_index(
                            spark, postings_t, df_t, victim, 4
                        )
                else:
                    erase_doc_from_bm25_index(
                        spark, postings_t, df_t, victim, 4
                    )
                del alive[victim]
            # maintained == rebuilt after every schedule step
            served = {
                tuple(r)
                for r in _serve_bm25_from_index(
                    spark, postings_t, df_t
                ).collect()
            }
            want = rebuild_and_serve(alive, root / f"rb{bid}")
            assert served == want, (
                f"trial {trial} step {bid}: diff "
                f"{(served - want, want - served)}"
            )
        rep = audit_and_repair_bm25_index(spark, postings_t, df_t, 4)
        # only marker hygiene may remain; no data drift
        assert all(r["kind"] == "erase_marker_cleared" for r in rep)


def test_bm25_erase_clears_marker_and_reingest_has_no_lockout(
    spark, tmp_path
):
    """r14 (ADVICE): a COMPLETED erase must clear its own marker. Before
    the fix the marker doubled as a completed-erase receipt forever; if
    the erased doc_id was later legitimately re-ingested, the next erase
    of ANY other doc saw "marker's doc has postings again", classified
    the completed erase as torn, and failed loudly until an operator ran
    the fsck — an avoidable operational lockout."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        _serve_bm25_from_index,
        erase_doc_from_bm25_index,
        make_bm25_index_applier,
    )

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    apply_batch(
        spark.createDataFrame(
            [(1, "a b a"), (2, "b c")], "doc_id long, text string"
        ),
        0,
    )
    erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    # the completed erase left no receipt behind
    assert not df_t.latest_manifest_field("last_erase_marker")
    # doc_id 1 comes back (legitimate re-ingest of a recycled id)
    apply_batch(
        spark.createDataFrame([(1, "a b a")], "doc_id long, text string"), 1
    )
    # erasing doc 2 must NOT raise "incomplete" on the ghost of erase(1)
    erase_doc_from_bm25_index(spark, postings_t, df_t, 2, 4)
    assert not df_t.latest_manifest_field("last_erase_marker")
    assert postings_t.read(spark).select("doc_id").distinct().count() == 1
    assert _serve_bm25_from_index(spark, postings_t, df_t).count() > 0


def test_bm25_fsck_collect_cap_and_aggregate_census(
    spark, tmp_path, monkeypatch
):
    """r14 (VERDICT r13 ask 6): the fsck's driver-side drift collect is
    structurally capped — damage past FSCK_REPORT_CAP fails loudly and
    points at aggregate_only=True, whose census reports per-bucket drift
    COUNTS without collecting a single term and performs no repair."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = ing.make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    apply_batch(
        spark.createDataFrame(
            [(1, "a b c"), (2, "c d")], "doc_id long, text string"
        ),
        0,
    )
    # torn erase of doc 1: df decrements for 3 terms, postings survive
    real = postings_t.delete_where
    try:
        def crash(*a, **k):
            raise RuntimeError("torn")

        postings_t.delete_where = crash
        with _pytest.raises(RuntimeError, match="torn"):
            ing.erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    finally:
        postings_t.delete_where = real
    # 3 drifted terms > cap of 2 -> fail-loud overflow naming the escape
    monkeypatch.setattr(ing, "FSCK_REPORT_CAP", 2)
    with _pytest.raises(RuntimeError, match="aggregate_only"):
        ing.audit_and_repair_bm25_index(spark, postings_t, df_t, 4)
    # the census mode: counts per vocabulary bucket, nothing repaired
    rep = ing.audit_and_repair_bm25_index(
        spark, postings_t, df_t, 4, aggregate_only=True
    )
    census = [r for r in rep if r["kind"] == "df_drift_census"]
    assert sum(r["n_drifted"] for r in census) == 3
    assert all(0 <= r["bucket"] < 4 for r in census)
    # report-only: the drift is still there afterwards
    rep2 = ing.audit_and_repair_bm25_index(
        spark, postings_t, df_t, 4, aggregate_only=True
    )
    assert [r for r in rep2 if r["kind"] == "df_drift_census"] == census
    # restore the cap; the real fsck repairs and converges
    monkeypatch.setattr(ing, "FSCK_REPORT_CAP", 100_000)
    rep3 = ing.audit_and_repair_bm25_index(spark, postings_t, df_t, 4)
    assert any(r["kind"] == "df_drift" for r in rep3)
    assert ing.audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []


def test_pack_fill_audit_reports_holes_and_vanished_packs(spark, tmp_path):
    """r14 (VERDICT r13 ask 8): tombstone erases leave permanent holes by
    design; pack_fill_audit is the offline metric that says when a pack
    rebuild pays for itself. Exact-count checks on a hand-built corpus:
    fill_rate/holey/max_hole after partial erases, vanished_packs when a
    pack's every row is tombstoned (pack ids are dense per shard, so the
    id gap counts them without their rows)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        erase_doc_from_pack_index,
        make_pack_index_applier,
        pack_fill_audit,
    )

    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    apply_batch = make_pack_index_applier(packs_t, tails_t, n_buckets=4)
    # PACK_BUDGET=128 tokens: docs of 60 tokens -> ~2 per pack. 6 docs,
    # one source, one shard -> packs 0,1,2 with 2 docs each (60+60=120).
    word = lambda i: " ".join(["w"] * 60)  # noqa: E731
    apply_batch(
        spark.createDataFrame(
            [(i, word(i), "web") for i in range(6)],
            "doc_id long, text string, source string",
        ),
        0,
    )
    base = pack_fill_audit(spark, packs_t, tails_t)
    assert base["n_packs"] == 3 and base["vanished_packs"] == 0
    assert base["fill_rate"] == 1.0 and base["holey_packs"] == 0
    # partial erase: one 60-token doc out of pack 1
    erase_doc_from_pack_index(spark, packs_t, 2)
    rep = pack_fill_audit(spark, packs_t, tails_t)
    assert rep["n_packs"] == 3 and rep["holey_packs"] == 1
    assert rep["max_hole_tokens"] == 60
    assert rep["live_tokens"] == 300 and rep["watermark_tokens"] == 360
    assert abs(rep["fill_rate"] - 300 / 360) < 1e-3
    # full erase of pack 0 (docs 0 and 1): it vanishes from PACKS but
    # TAILS knows the shard's true pack count
    erase_doc_from_pack_index(spark, packs_t, 0)
    erase_doc_from_pack_index(spark, packs_t, 1)
    rep2 = pack_fill_audit(spark, packs_t, tails_t)
    assert rep2["n_packs"] == 2 and rep2["vanished_packs"] == 1
    # docs 3,4,5 survive (doc 2 left in the earlier partial erase)
    assert rep2["live_tokens"] == 180
    # r15 (VERDICT r14 ask 4): tombstone the shard's HIGHEST pack (2,
    # docs 4+5) — its loss shrinks max(pack_id), so the PACKS-only gap
    # count misses it (lower bound 1), while the TAILS-based census
    # counts it exactly (2 of the 3 historical packs vanished)
    erase_doc_from_pack_index(spark, packs_t, 4)
    erase_doc_from_pack_index(spark, packs_t, 5)
    rep3 = pack_fill_audit(spark, packs_t, tails_t)
    assert rep3["n_packs"] == 1 and rep3["vanished_packs"] == 2
    assert rep3["live_tokens"] == 60  # doc 3 alone
    fallback = pack_fill_audit(spark, packs_t)  # PACKS-only lower bound
    assert fallback["vanished_packs"] == 1


def test_pack_index_tails_rebucket_mid_stream(spark, tmp_path):
    """r14 (VERDICT r13 ask 2, pack twin of the minhash rebucket query):
    the TAILS table's bucket count is fixed at creation from an
    expected-docs estimate; rebucket migrates it mid-stream — cursors
    carried, a new applier built on the new count continues the
    recurrence — and the accumulated packs must equal the one-shot
    packing of the full corpus."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_pack_index_applier,
    )

    docs = [
        (i, " ".join(["w"] * (20 + 7 * (i % 9))), "web") for i in range(40)
    ]
    schema = "doc_id long, text string, source string"

    def serve(pt):
        return {
            tuple(r)
            for r in pt.read(spark)
            .select("source", "shard", "doc_id", "n_tokens",
                    "pack_id", "pack_used")
            .collect()
        }

    # maintained: first half under 2 tails buckets, rebucket to 8, rest
    packs_t = SnapshotTable(str(tmp_path / "packs"))
    tails_t = SnapshotTable(str(tmp_path / "tails"))
    apply_a = make_pack_index_applier(packs_t, tails_t, n_buckets=2)
    apply_a(spark.createDataFrame(docs[:20], schema), 0)
    assert tails_t.latest_manifest_field("n_buckets") == 2
    tails_t.rebucket(spark, "pk", 8)
    assert tails_t.latest_manifest_field("n_buckets") == 8
    assert tails_t.latest_manifest_field("last_batch_id") == 0  # cursor
    apply_b = make_pack_index_applier(packs_t, tails_t, n_buckets=8)
    apply_b(spark.createDataFrame(docs[20:], schema), 1)
    # recomputed: one-shot build over the whole corpus
    p2 = SnapshotTable(str(tmp_path / "p2"))
    t2 = SnapshotTable(str(tmp_path / "t2"))
    make_pack_index_applier(p2, t2, n_buckets=8)(
        spark.createDataFrame(docs, schema), 0
    )
    assert serve(packs_t) == serve(p2)


def test_bm25_batch_erase_does_not_erase_unrequested_ambiguous_doc(
    spark, tmp_path
):
    """r15 (ADVICE r14, medium): a stale SINGLE-erase marker whose
    postings version no longer matches (an ingest committed between the
    torn erase's df half and this batch — same ambiguity as a recycled
    re-ingested id) resolves through the fsck, which leaves the index
    CONSISTENT WITH THE DOC PRESENT. The batch must then erase that doc
    ONLY if the caller asked: before the fix it unconditionally
    re-erased it — silent data loss in GDPR tooling."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = ing.make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    apply_batch(
        spark.createDataFrame(
            [(1, "a b"), (2, "b c")], "doc_id long, text string"
        ),
        0,
    )
    # tear a single erase of doc 1 (df half committed, postings survive)
    real = postings_t.delete_where
    try:
        def crash(*a, **k):
            raise RuntimeError("torn")
        postings_t.delete_where = crash
        with _pytest.raises(RuntimeError, match="torn"):
            ing.erase_doc_from_bm25_index(spark, postings_t, df_t, 1, 4)
    finally:
        postings_t.delete_where = real
    # an ingest commits mid-erase -> the marker's version is ambiguous
    apply_batch(
        spark.createDataFrame([(3, "c d")], "doc_id long, text string"), 1
    )
    assert (df_t.latest_manifest_field("last_erase_marker") or "").startswith(
        "1@"
    )
    # batch-erase doc 2 ONLY: entry resolution must fsck the ambiguity
    # and leave doc 1 PRESENT (it was never requested here)
    ing.erase_docs_from_bm25_index(spark, postings_t, df_t, [2], 4)
    assert postings_t.read(spark).filter("doc_id = 1").count() > 0
    assert postings_t.read(spark).filter("doc_id = 2").count() == 0
    assert not df_t.latest_manifest_field("last_erase_marker")
    # df is ground-truth consistent: docs 1 and 3 remain
    dfm = {r.term: r.df for r in df_t.read(spark).collect() if r.df > 0}
    assert dfm == {"a": 1, "b": 1, "c": 1, "d": 1}
    assert ing.audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []
    # and when the ambiguous doc IS in ids, it erases cleanly
    ing.erase_docs_from_bm25_index(spark, postings_t, df_t, [1], 4)
    assert postings_t.read(spark).filter("doc_id = 1").count() == 0
    assert ing.audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []


def test_bm25_batch_erase_resolves_torn_state_with_crash(spark, tmp_path):
    """r15 (VERDICT r14 ask 1, BM25 member of the set-oriented
    batch-erase family): the 3-doc batch erase crashes in its ONE torn
    window — the one-shot df decrement committed (batch marker riding
    the same manifest), the bulk postings delete dies. Re-running the
    SAME call resolves at entry (the batch marker routes through the
    fsck, which restores df from the postings ground truth and clears
    the marker) and re-applies from scratch — the served top-k equals a
    rebuild over the survivors and the fsck is clean. Single erases
    refuse loudly on the batch marker instead of guessing."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    postings_t = SnapshotTable(str(tmp_path / "postings"))
    df_t = SnapshotTable(str(tmp_path / "df"))
    apply_batch = ing.make_bm25_index_applier(postings_t, df_t, n_buckets=4)
    docs = [
        (1, "alpha beta gamma"),
        (2, "beta gamma delta"),
        (3, "gamma delta kappa"),
        (4, "delta kappa omega"),
        (5, "kappa omega alpha"),
    ]
    apply_batch(
        spark.createDataFrame(docs, "doc_id long, text string"), 0
    )
    # crash in the torn window: df decrement committed, postings delete
    # (the batch's FIRST postings_t.delete_where) dies
    real = postings_t.delete_where
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("mid-batch crash")
        return real(*a, **k)

    try:
        postings_t.delete_where = flaky
        with _pytest.raises(RuntimeError, match="mid-batch crash"):
            ing.erase_docs_from_bm25_index(
                spark, postings_t, df_t, [1, 2, 3], 4
            )
    finally:
        postings_t.delete_where = real
    # torn: batch marker set, every posting still present, df decremented
    assert (
        df_t.latest_manifest_field("last_erase_marker") or ""
    ).startswith("batch@")
    assert postings_t.read(spark).filter("doc_id in (1,2,3)").count() > 0
    # a single erase cannot adjudicate a torn batch: fail loud
    with _pytest.raises(ValueError, match="batch erase is incomplete"):
        ing.erase_doc_from_bm25_index(spark, postings_t, df_t, 4, 4)
    # re-running the SAME call converges end-to-end
    ing.erase_docs_from_bm25_index(spark, postings_t, df_t, [1, 2, 3], 4)
    assert not df_t.latest_manifest_field("last_erase_marker")
    assert postings_t.read(spark).filter("doc_id in (1,2,3)").count() == 0
    served = {
        tuple(r)
        for r in ing._serve_bm25_from_index(spark, postings_t, df_t).collect()
    }
    p2 = SnapshotTable(str(tmp_path / "p2"))
    d2 = SnapshotTable(str(tmp_path / "d2"))
    ing.make_bm25_index_applier(p2, d2, n_buckets=4)(
        spark.createDataFrame(docs[3:], "doc_id long, text string"), 0
    )
    want = {
        tuple(r) for r in ing._serve_bm25_from_index(spark, p2, d2).collect()
    }
    assert served == want
    assert ing.audit_and_repair_bm25_index(spark, postings_t, df_t, 4) == []


def test_bm25_bulk_seed_equals_incremental_build(spark, tmp_path):
    """r15: bulk_seed_bm25_index — the 100-TB bootstrap path (stand the
    retrieval index up over an existing corpus in one batch build, then
    let the stream take over). Pin: the bulk-seeded two-table state is
    CONTENT-IDENTICAL to the applier ingesting the same corpus in
    chunks (postings rows, per-term df totals, n_docs/sum_dl counters),
    the cursors are live, and a continuation batch applied to BOTH
    indexes leaves their served states identical."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    docs = [
        (1, "a b a"),
        (2, "b c"),
        (3, "a d"),
        (4, "d d e"),
        (5, "c e a b"),
        (6, "f"),
    ]
    schema = "doc_id long, text string"

    ip = SnapshotTable(str(tmp_path / "incr_postings"))
    idf = SnapshotTable(str(tmp_path / "incr_df"))
    apply_incr = ing.make_bm25_index_applier(ip, idf, n_buckets=4)
    for i, chunk in enumerate((docs[:2], docs[2:4], docs[4:])):
        apply_incr(spark.createDataFrame(chunk, schema), i)

    bp = SnapshotTable(str(tmp_path / "bulk_postings"))
    bdf = SnapshotTable(str(tmp_path / "bulk_df"))
    ing.bulk_seed_bm25_index(
        spark, bp, bdf, spark.createDataFrame(docs, schema), 4, batch_id=2
    )

    def content(t, cols):
        return sorted(tuple(r) for r in t.read(spark).select(*cols).collect())

    assert content(bp, ["doc_id", "dl", "term", "tf"]) == content(
        ip, ["doc_id", "dl", "term", "tf"]
    )
    assert content(bdf, ["term", "df"]) == content(idf, ["term", "df"])
    for key in ("n_docs", "sum_dl", "last_batch_id"):
        assert bp.latest_manifest_field(key) == ip.latest_manifest_field(key)
    assert bdf.latest_manifest_field("last_batch_id") == idf.latest_manifest_field(
        "last_batch_id"
    )
    assert bdf.latest_manifest_field("n_buckets") == idf.latest_manifest_field(
        "n_buckets"
    )
    # fresh-tables guard: bootstrap refuses a non-empty lineage
    with _pytest.raises(ValueError, match="FRESH tables"):
        ing.bulk_seed_bm25_index(
            spark, bp, bdf, spark.createDataFrame(docs, schema), 4
        )
    # the stream continues on the bootstrapped index
    batch = spark.createDataFrame([(7, "a f g")], schema)
    ing.make_bm25_index_applier(bp, bdf, n_buckets=4)(batch, 3)
    apply_incr(batch, 3)
    serve = lambda p, d: sorted(  # noqa: E731
        tuple(r) for r in ing._serve_bm25_from_index(spark, p, d).collect()
    )
    assert serve(bp, bdf) == serve(ip, idf)
    assert content(bdf, ["term", "df"]) == content(idf, ["term", "df"])


def test_pack_bulk_seed_equals_incremental_build(spark, tmp_path):
    """r15: bulk_seed_pack_index — one greedy-pack pass over the
    doc_id-ordered corpus produces EXACTLY the state chunked ingest
    reaches (packs, open-pack tails incl. last_doc_id watermarks,
    cursors), the ordering guard stays armed across the
    bootstrap/stream boundary, and a continuation batch CONTINUES the
    bootstrapped open packs identically on both indexes."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    schema = "doc_id long, text string, source string"

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in range(lo, hi)], schema
        )

    ipk = SnapshotTable(str(tmp_path / "incr_packs"))
    itl = SnapshotTable(str(tmp_path / "incr_tails"))
    apply_incr = ing.make_pack_index_applier(ipk, itl, n_buckets=4)
    for i, (lo, hi) in enumerate(((0, 60), (60, 200), (200, 300))):
        apply_incr(docs(lo, hi), i)

    bpk = SnapshotTable(str(tmp_path / "bulk_packs"))
    btl = SnapshotTable(str(tmp_path / "bulk_tails"))
    ing.bulk_seed_pack_index(spark, bpk, btl, docs(0, 300), 4, batch_id=2)

    def content(t, cols):
        return sorted(tuple(r) for r in t.read(spark).select(*cols).collect())

    pack_cols = ["source", "shard", "doc_id", "n_tokens", "pack_id", "pack_used"]
    tail_cols = ["pk", "source", "shard", "pack_id", "used", "last_doc_id"]
    assert content(bpk, pack_cols) == content(ipk, pack_cols)
    assert content(btl, tail_cols) == content(itl, tail_cols)
    assert bpk.latest_manifest_field("last_batch_id") == ipk.latest_manifest_field(
        "last_batch_id"
    )
    assert btl.latest_manifest_field("n_buckets") == itl.latest_manifest_field(
        "n_buckets"
    )
    # fresh-tables guard
    with _pytest.raises(ValueError, match="FRESH tables"):
        ing.bulk_seed_pack_index(spark, bpk, btl, docs(0, 10), 4)
    # ordering guard armed by the bootstrapped last_doc_id watermarks
    apply_bulk = ing.make_pack_index_applier(bpk, btl, n_buckets=4)
    with _pytest.raises(ValueError, match="ordering contract"):
        apply_bulk(docs(250, 260), 3)
    # continuation CONTINUES the open packs (doc 300 extends shard 2's
    # bootstrapped tail, not a fresh pack 0 fill)
    batch = docs(300, 340)
    apply_bulk(batch, 3)
    apply_incr(batch, 3)
    assert content(bpk, pack_cols) == content(ipk, pack_cols)
    assert content(btl, tail_cols) == content(itl, tail_cols)


def test_pack_bulk_seed_split_invariance_drill(spark, tmp_path):
    """r15: the pack bootstrap's contract is split-point invariance of
    the greedy recurrence — drill the bulk build against chunked ingest
    under three adversarial chunkings: boundaries aligned EXACTLY on
    shard edges (doc_id 128/256: the tail of the previous shard stays
    open, the new chunk opens a fresh shard), boundaries mid-shard
    (open-pack continuation), and single-doc trickle over a pack
    boundary. All three must land on the bulk-seeded state exactly."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    schema = "doc_id long, text string, source string"
    n = 300

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, "w " * (20 + i % 30), "s0") for i in range(lo, hi)], schema
        )

    bpk = SnapshotTable(str(tmp_path / "bulk_packs"))
    btl = SnapshotTable(str(tmp_path / "bulk_tails"))
    ing.bulk_seed_pack_index(spark, bpk, btl, docs(0, n), 4, batch_id=0)

    def content(t, cols):
        return sorted(tuple(r) for r in t.read(spark).select(*cols).collect())

    pack_cols = ["source", "shard", "doc_id", "n_tokens", "pack_id", "pack_used"]
    tail_cols = ["pk", "source", "shard", "pack_id", "used", "last_doc_id"]
    want_p, want_t = content(bpk, pack_cols), content(btl, tail_cols)

    splits = [
        (0, 128, 256, n),          # shard-edge aligned
        (0, 50, 129, 255, n),      # mid-shard boundaries
        (0, 140, 141, 142, n),     # single-doc trickle inside shard 1
    ]
    for si, bounds in enumerate(splits):
        ipk = SnapshotTable(str(tmp_path / f"incr{si}_packs"))
        itl = SnapshotTable(str(tmp_path / f"incr{si}_tails"))
        apply_batch = ing.make_pack_index_applier(ipk, itl, n_buckets=4)
        for b, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            apply_batch(docs(lo, hi), b)
        assert content(ipk, pack_cols) == want_p, f"split {bounds}"
        assert content(itl, tail_cols) == want_t, f"split {bounds}"
