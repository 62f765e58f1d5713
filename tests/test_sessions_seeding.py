"""Sessionization (batch vs streaming stateful), seeding path, foreachBatch
upsert sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch_closed_sessions(spark):
    """The stateful streaming operator must emit exactly the batch sessions
    minus the trailing (still-open) session of each user."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.sessions import (
        sessionize,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.sessions import (
        sessionize_stream,
    )

    batch = sessionize(load_table(spark, SF, "events"))
    batch_rows = {
        (r.user_id, r.session_start, r.session_end_ts, r.n_events)
        for r in batch.collect()
    }
    last_per_user = {
        (r.user_id, r.session_start, r.session_end_ts, r.n_events)
        for r in batch.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.desc("session_start"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    stream_rows = {
        (r.user_id, r.session_start, r.session_end_ts, r.n_events)
        for r in sessionize_stream(spark, SF).collect()
    }
    assert stream_rows == batch_rows - last_per_user
    assert stream_rows, "stream must emit closed sessions"


def test_seeding_path(spark, tmp_path):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.seeding import (
        prepare_seed,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.schemas import USERS

    d = str(tmp_path / "users_csv")
    os.makedirs(d)
    with open(f"{d}/users.csv", "w") as f:
        f.write("user_id,user_name,user_age,user_country,created_at\n")
        f.write("1,alice,30,DE,2023-01-01\n")
        f.write("2,,25,,2023-02-01\n")  # nulls in string cols
    res = prepare_seed(spark, d, USERS)
    assert res.n_rows == 2
    assert res.null_counts["user_name"] == 1 and res.null_counts["user_country"] == 1
    row2 = {r.user_id: r for r in res.cleaned.collect()}[2]
    assert row2.user_name == "Unknown" and row2.user_country == "Unknown"
    assert row2.user_age == 25  # numerics untouched (§8.7 fix)


def test_foreachbatch_upsert_sink(spark, tmp_path):
    """Drive the foreachBatch callback through a real streaming query
    (rate-limited static source) and re-deliver the same data: row counts
    must not grow (idempotent partition overwrite)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.upsert_sink import (
        partition_overwrite_each_batch,
    )

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [("2024-01-01", "a", 1), ("2024-01-02", "b", 2)], "date string, k string, v int"
    ).withColumn("date", F.to_date("date"))
    df.write.parquet(src_dir)

    def run_once():
        stream = spark.readStream.schema("date date, k string, v int").parquet(src_dir)
        q = (
            stream.writeStream.foreachBatch(partition_overwrite_each_batch(out_dir))
            .option("checkpointLocation", str(tmp_path / f"ck_{os.listdir(str(tmp_path)).__len__()}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    run_once()  # fresh checkpoint → full re-delivery of the same batch
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2 == 2


def test_session_gap_exact_boundary_merges(spark):
    """Events exactly GAP apart stay in ONE session (session_window's
    boundary is inclusive; the oracle's `> INTERVAL` matches — pinned here
    so neither side drifts)."""
    import datetime

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.sessions import (
        sessionize,
    )

    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 0, 0), "a", 100),
        (1, datetime.datetime(2024, 1, 1, 10, 30, 0), "b", 101),
        (1, datetime.datetime(2024, 1, 1, 11, 0, 0), "c", 102),
        (1, datetime.datetime(2024, 1, 1, 11, 30, 0, 1), "d", 103),  # 30min+1µs → NEW
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = sorted((str(r.session_start), r.n_events) for r in sessionize(ev).collect())
    assert got == [("2024-01-01 10:00:00", 3), ("2024-01-01 11:30:00.000001", 1)]


def test_streaming_sessions_state_survives_micro_batches(spark, tmp_path):
    """Cross-batch state continuity of the stateful sessionizer: events for
    one session split across two micro-batches (maxFilesPerTrigger=1) must
    merge into ONE session, and a gap that straddles the batch boundary
    must close the earlier session exactly once."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.sessions import (
        sessionize_stream,
    )

    t0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
    MIN = 60_000_000

    def write(path, rows, mtime_s):
        ts = pa.array([t0 + m * MIN for (_, m) in rows], pa.timestamp("us", tz="UTC"))
        table = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": ts,
                "user_id": pa.array([u for (u, _) in rows], pa.int64()),
                "event_type": pa.array(["play"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(table, path)
        os.utime(path, (mtime_s, mtime_s))

    d = tmp_path / "split_events"
    d.mkdir()
    # file0 (older mtime -> batch 1): u1 opens a session; u2 opens a session
    write(str(d / "f0.parquet"), [(1, 0), (1, 5), (2, 0)], 1_000_000)
    # file1 (batch 2): u1 returns after a 55-min gap (closes session 1);
    # u2 continues the SAME session (+10 min) then gaps (closes it) and
    # leaves a trailing open session
    write(str(d / "f1.parquet"), [(1, 60), (2, 10), (2, 70)], 1_000_100)

    out = sessionize_stream(
        spark, "unused", source_dir=str(d), max_files_per_trigger=1
    )
    got = {
        (r.user_id, r.session_start.minute + r.session_start.hour * 60,
         r.session_end_ts.minute + r.session_end_ts.hour * 60, r.n_events)
        for r in out.collect()
    }
    # u1: (t0, t0+5m, 2 events) closed by the cross-batch gap.
    # u2: (t0, t0+10m, 2 events) -- the +10m event arrived in batch 2 and
    # must have MERGED into the batch-1 session, not started a new one.
    assert got == {(1, 0, 5, 2), (2, 0, 10, 2)}


def test_streaming_sessions_event_time_timeout_fires(spark, tmp_path):
    """EventTimeTimeout sessionizer: an idle session must emit via the
    timeout callback once the watermark (driven by OTHER users' events)
    passes last + gap — and a session still inside the horizon must stay
    in state."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.streaming.state import GroupStateTimeout
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.runner import (
        EVENTS_SCHEMA,
        run_stream_to_df,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.sessions import (
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        _WATERMARK_DELAY_MINUTES,
        _sessionize_group_timeout,
    )

    t0 = 1_704_067_200_000_000
    MIN = 60_000_000
    rows = [(1, 0), (1, 5), (2, 300), (2, 301)]
    d = tmp_path / "timeout_events"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + m * MIN for (_, m) in rows], pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array([u for (u, _) in rows], pa.int64()),
                "event_type": pa.array(["play"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "f0.parquet"),
    )
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(str(d))
        .select("user_id", "ts", "event_id")
        .withWatermark("ts", f"{_WATERMARK_DELAY_MINUTES} minutes")
    )
    out = run_stream_to_df(
        src.groupBy("user_id").applyInPandasWithState(
            _sessionize_group_timeout,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    ).collect()
    got = {(r.user_id, r.n_events) for r in out}
    # u1's session (ended min 5; timeout min 35) is far behind the final
    # watermark (min 291) -> emitted via timeout. u2's session (timeout
    # min 331) is inside the horizon -> still open, not emitted.
    assert got == {(1, 2)}


def test_tws_sessionizer_equals_timeout_twin_when_runtime_present():
    """Conditional twin-equality pin for the transformWithStateInPandas
    sessionizer: whenever the protobuf runtime imports (it is broken in
    this container, so the test normally SKIPs), the typed-state API must
    produce exactly the EventTimeTimeout sessionizer's rows — they share
    semantics, registration oracle, and this assertion."""
    import pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.sessions import (
        _has_tws_runtime,
    )

    if not _has_tws_runtime():
        pytest.skip("google.protobuf runtime unavailable — tws variant gated off")

    from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.sessions import (
        sessionize_stream_timeout,
        sessionize_stream_tws,
    )

    spark = get_spark()
    key = lambda r: (r.user_id, r.session_start, r.session_end_ts, r.n_events)  # noqa: E731
    tws = sorted(map(key, sessionize_stream_tws(spark, SF).collect()))
    timeout = sorted(map(key, sessionize_stream_timeout(spark, SF).collect()))
    assert tws == timeout


def test_incremental_sessions_boundary_merge(spark):
    """combine(state, delta) == recompute for sessionization, on a
    constructed boundary: user 1's last base session is within the gap of
    their first delta session (must merge, n_events and the distinct
    type SET combine), user 2's is outside it (must not merge), user 3
    exists only in the delta. The distinct-type union across the boundary
    is the part a count-based state could not produce."""
    import datetime as dt

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.sessions import (
        merge_session_states,
        sessionize,
        sessionize_state,
    )
    from pyspark.sql import functions as F

    def _ev(eid, h, m, u, typ):
        return (eid, dt.datetime(2024, 1, 21, h, m), u, typ, 0.0, None)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    base_rows = [
        _ev(1, 9, 0, 1, "view"),
        _ev(2, 9, 10, 1, "click"),  # user 1 base session ends 9:10
        _ev(3, 8, 0, 2, "view"),    # user 2 base session ends 8:00
        _ev(4, 6, 0, 1, "view"),    # earlier user-1 session (must pass through)
    ]
    delta_rows = [
        _ev(5, 9, 30, 1, "purchase"),  # 20 min after 9:10 -> merges
        _ev(6, 11, 0, 2, "view"),      # 3 h after 8:00 -> no merge
        _ev(7, 9, 0, 3, "view"),       # delta-only user
    ]
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    got = (
        merge_session_states(sessionize_state(base), sessionize_state(delta))
        .select(
            "user_id",
            "session_start",
            "session_end_ts",
            "n_events",
            F.size("types").alias("n_event_types"),
        )
    )
    want = sessionize(base.unionAll(delta))
    key = lambda r: (r.user_id, str(r.session_start))
    got_rows = sorted(
        ((r.user_id, str(r.session_start), str(r.session_end_ts), r.n_events, r.n_event_types) for r in got.collect())
    )
    want_rows = sorted(
        ((r.user_id, str(r.session_start), str(r.session_end_ts), r.n_events, r.n_event_types) for r in want.collect())
    )
    assert got_rows == want_rows
    # the merged session really is one 3-event, 3-type session
    m = [r for r in got_rows if r[0] == 1 and r[1].endswith("09:00:00")]
    assert m == [(1, "2024-01-21 09:00:00", "2024-01-21 09:30:00", 3, 3)]
    # user 2 kept two separate sessions
    assert len([r for r in got_rows if r[0] == 2]) == 2


def test_foreachbatch_upsert_crash_between_effect_and_checkpoint(spark, tmp_path):
    """Torn-commit drill for the foreachBatch upsert sink (r10): the
    warehouse write (the side effect) lands, then the driver dies BEFORE
    the streaming checkpoint records the batch — the classic
    foreachBatch at-least-once window. On restart from the SAME
    checkpoint Spark re-delivers the batch; dynamic partition overwrite
    must converge (rewrite the same partitions) instead of duplicating,
    and a further restart must deliver nothing."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.upsert_sink import (
        partition_overwrite_each_batch,
    )

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("2024-01-01", "a", 1), ("2024-01-01", "b", 2), ("2024-01-02", "c", 3)],
        "date string, k string, v int",
    ).withColumn("date", F.to_date("date")).write.parquet(src_dir)

    inner = partition_overwrite_each_batch(out_dir)
    delivered: list[tuple[int, int]] = []

    def crash_after_effect(batch_df, batch_id):
        inner(batch_df, batch_id)  # warehouse bytes are on disk...
        raise RuntimeError("simulated crash before checkpoint commit")

    def run(cb):
        q = (
            spark.readStream.schema("date date, k string, v int")
            .parquet(src_dir)
            .writeStream.foreachBatch(cb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException, match="simulated crash"):
        run(crash_after_effect)
    # the effect landed, the offset did not
    assert spark.read.parquet(out_dir).count() == 3

    def tracking(batch_df, batch_id):
        delivered.append((batch_id, batch_df.count()))
        inner(batch_df, batch_id)

    run(tracking)  # restart: Spark re-delivers the uncommitted batch
    assert sum(n for _, n in delivered) == 3, "expected a full re-delivery"
    got = {
        (str(r.date), r.k, r.v) for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        ("2024-01-01", "a", 1),
        ("2024-01-01", "b", 2),
        ("2024-01-02", "c", 3),
    }  # exactly once despite the double delivery

    delivered.clear()
    run(tracking)  # third run: checkpoint is committed, nothing replays
    assert sum(n for _, n in delivered) == 0
    assert spark.read.parquet(out_dir).count() == 3
