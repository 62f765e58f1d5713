"""Streaming sessionization — per-user gap sessions as a *custom stateful
operator* via ``applyInPandasWithState`` (the escape hatch for semantics the
built-in streaming windows can't express; here it mirrors the batch
``session_window`` so the two are cross-checked in tests).

State per user: (session_start, last_ts, n_events, distinct event types).
A new micro-batch's events merge into open state; sessions whose gap has
passed are emitted and dropped. With ``availableNow`` over a static folder
this produces the final closed sessions — asserted equal to the batch
operator in tests (modulo the final still-open session per user, which the
batch form closes by construction).

Scale: state is hash-partitioned by user_id across executors; the watermark
(event-time timeout) bounds state size — the standard production shape for
billions of keys.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .runner import EVENTS_SCHEMA, run_stream_to_df, stage_events
from ..operators.sessions import GAP_MINUTES

_GAP_US = GAP_MINUTES * 60 * 1_000_000

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end_ts timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    out = []
    for ts in rows["ts"]:
        ts_us = int(ts.value // 1000) if hasattr(ts, "value") else int(ts)
        if last is not None and ts_us - last >= _GAP_US:
            out.append((user_id, start, last, n))
            start, n = ts_us, 0
        if start is None:
            start = ts_us
        last = ts_us
        n += 1
    state.update((start, last, n))
    if state.hasTimedOut:  # pragma: no cover — availableNow closes via flush
        out.append((user_id, start, last, n))
        state.remove()
    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                "session_end_ts": [pd.Timestamp(r[2], unit="us") for r in out],
                "n_events": [r[3] for r in out],
            }
        )


_WATERMARK_DELAY_MINUTES = 10


def _sessionize_group_timeout(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """EventTimeTimeout twin of ``_sessionize_group``: same gap merge, but
    the open session also EXPIRES — its timeout is ``last + gap`` in event
    time, so once the watermark passes that point Spark calls back with
    ``hasTimedOut`` (and no data) and the session is emitted and dropped.
    This is the production shape: state for idle users is reclaimed by the
    watermark instead of living forever."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end_ts": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    out = []
    for ts in rows["ts"]:
        ts_us = int(ts.value // 1000) if hasattr(ts, "value") else int(ts)
        if last is not None and ts_us - last >= _GAP_US:
            out.append((user_id, start, last, n))
            start, n = ts_us, 0
        if start is None:
            start = ts_us
        last = ts_us
        n += 1
    state.update((start, last, n))
    # Ceil last (µs) to ms: flooring could fire the timeout up to 1 ms
    # before the oracle's µs-exact horizon (session_end + gap <= max(ts) -
    # delay), emitting a session the oracle does not have.
    state.setTimeoutTimestamp((last + 999) // 1000 + GAP_MINUTES * 60 * 1000)
    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                "session_end_ts": [pd.Timestamp(r[2], unit="us") for r in out],
                "n_events": [r[3] for r in out],
            }
        )


def sessionize_stream_timeout(
    spark: SparkSession, sf_dir: str, scratch: str | None = None
) -> DataFrame:
    """availableNow run of the EventTimeTimeout sessionizer: gap-closed
    sessions emit as data arrives; open sessions whose ``last + gap`` falls
    behind the final watermark (``max(ts) - delay``) emit via the timeout
    callback in the settling batch. Only users active within the last
    ``delay + gap`` of event time keep state."""
    stream_dir = stage_events(sf_dir, "events")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
        .select("user_id", "ts", "event_id")
        .withWatermark("ts", f"{_WATERMARK_DELAY_MINUTES} minutes")
    )
    sessions = src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group_timeout,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_stream_to_df(sessions, scratch=scratch)


def sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    scratch: str | None = None,
) -> DataFrame:
    """Run the stateful streaming sessionizer to completion over the events
    drop-folder; returns the *closed* sessions (the trailing open session
    per user stays in state, as it would in production).

    ``source_dir`` overrides the default staged folder; setting
    ``max_files_per_trigger`` forces multiple micro-batches so tests can
    exercise cross-batch state continuity (files are picked up oldest
    mtime first)."""
    stream_dir = source_dir or stage_events(sf_dir, "events")

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(stream_dir).select("user_id", "ts", "event_id")
    sessions = src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_stream_to_df(sessions, scratch=scratch)


from ..plans.registry import register  # noqa: E402


@register(
    "streaming_sessionize",
    # Real oracle: with availableNow over a single staged file everything
    # arrives in one micro-batch, so the stateful operator's output is
    # exactly "gap-≥30min sessions minus the trailing (still-open) session
    # per user" — expressible as a lag/sum session assignment that drops
    # each user's last session id.
    f"""
    WITH x AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL '{GAP_MINUTES} minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM x
    ),
    g AS (
        SELECT user_id, sid,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY 1, 2
    ),
    m AS (SELECT user_id, MAX(sid) AS last_sid FROM g GROUP BY 1)
    SELECT g.user_id, g.session_start, g.session_end_ts, g.n_events
    FROM g JOIN m ON m.user_id = g.user_id AND g.sid < m.last_sid
    """,
    doc="Custom stateful streaming operator: per-user gap sessionization via "
    "applyInPandasWithState (hash-partitioned state, append output). "
    "Cross-checked against the batch session_window operator in tests.",
)
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_stream(spark, sf_dir, scratch="streaming_sessionize")


# Oracle shared by the two EventTime-expiry variants (GroupState timeout
# and transformWithStateInPandas timers) — identical semantics: emitted =
# gap-closed sessions PLUS any trailing session whose (end + gap) the
# final watermark (max(ts) - delay) has passed.
_TIMEOUT_ORACLE = f"""
    WITH x AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL '{GAP_MINUTES} minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM x
    ),
    g AS (
        SELECT user_id, sid,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY 1, 2
    ),
    m AS (SELECT user_id, MAX(sid) AS last_sid FROM g GROUP BY 1),
    mx AS (SELECT MAX(ts) AS mx FROM events)
    SELECT g.user_id, g.session_start, g.session_end_ts, g.n_events
    FROM g JOIN m ON m.user_id = g.user_id CROSS JOIN mx
    WHERE g.sid < m.last_sid
       OR g.session_end_ts + INTERVAL '{GAP_MINUTES} minutes'
          <= mx.mx - INTERVAL '{_WATERMARK_DELAY_MINUTES} minutes'
    """


@register(
    "streaming_sessionize_timeout",
    _TIMEOUT_ORACLE,
    doc="EventTimeTimeout sessionization — the production-complete shape: "
    "gap-closed sessions emit with the data, and idle sessions expire via "
    "the event-time timeout (last + gap) once the watermark passes, so "
    "per-user state is RECLAIMED instead of growing forever (the "
    "NoTimeout variant keeps one open session per user in state "
    "indefinitely). availableNow settles timeouts against the final "
    "watermark; only users active inside the last delay+gap horizon keep "
    "state.",
)
def q_streaming_sessions_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_stream_timeout(spark, sf_dir, scratch="streaming_sessionize_timeout")


# ---------------------------------------------------------------------------
# The same operator on the MODERN stateful API (Spark 4.x
# transformWithStateInPandas): typed ValueState + event-time timers replace
# the single-tuple GroupState — the forward path Spark documents for new
# stateful pipelines.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

_GAP_MS = GAP_MINUTES * 60 * 1000


class _SessionProcessor(StatefulProcessor):
    """Gap sessionizer as a StatefulProcessor: ValueState holds the open
    session; an event-time timer at ``last + gap`` emits and clears it when
    the watermark passes. A stale timer (the session was extended after the
    timer was registered) is detected by comparing the expiry against the
    CURRENT deadline and ignored — the standard timer-freshness pattern."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("session", _STATE_SCHEMA)
        self._handle = handle

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        (user_id,) = key
        batch = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        if self._state.exists():
            start, last, n = self._state.get()
        else:
            start = last = None
            n = 0
        out = []
        for ts in batch["ts"]:
            ts_us = int(ts.value // 1000) if hasattr(ts, "value") else int(ts)
            if last is not None and ts_us - last >= _GAP_US:
                out.append((user_id, start, last, n))
                start, n = ts_us, 0
            if start is None:
                start = ts_us
            last = ts_us
            n += 1
        # re-arm: drop any stale deadline, register the current one
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._state.update((start, last, n))
        self._handle.registerTimer(last // 1000 + _GAP_MS)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                    "session_end_ts": [pd.Timestamp(r[2], unit="us") for r in out],
                    "n_events": [r[3] for r in out],
                }
            )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        (user_id,) = key
        if not self._state.exists():
            return
        start, last, n = self._state.get()
        if expiredTimerInfo.getExpiryTimeInMs() < last // 1000 + _GAP_MS:
            return  # stale timer — session was extended since it was set
        self._state.clear()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end_ts": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def sessionize_stream_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas run of the sessionizer — semantically
    identical to ``sessionize_stream_timeout`` (same gap merge, same
    event-time expiry), on the modern typed-state API."""
    stream_dir = stage_events(sf_dir, "events")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
        .select("user_id", "ts", "event_id")
        .withWatermark("ts", f"{_WATERMARK_DELAY_MINUTES} minutes")
    )
    sessions = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
    return run_stream_to_df(sessions, scratch="streaming_sessionize_tws")


def _has_tws_runtime() -> bool:
    """transformWithStateInPandas speaks protobuf to its state server; this
    container ships a broken google.protobuf, so the variant is import-gated
    exactly like the PIL pixel-decode path — the implementation above is
    real and the registration appears wherever the runtime does."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _has_tws_runtime():  # pragma: no cover — protobuf absent in this container
    register(
        "streaming_sessionize_tws",
        # Same semantics as streaming_sessionize_timeout ⇒ same oracle.
        _TIMEOUT_ORACLE,
        doc="The EventTimeTimeout sessionizer re-expressed on Spark 4.x "
        "transformWithStateInPandas: typed ValueState for the open session, "
        "an event-time timer at last+gap for expiry (stale timers detected "
        "against the current deadline and ignored), Append mode. Oracle-equal "
        "to streaming_sessionize_timeout — the two APIs must agree exactly.",
    )(lambda spark, sf_dir: sessionize_stream_tws(spark, sf_dir))
