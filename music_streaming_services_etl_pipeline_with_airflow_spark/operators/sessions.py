"""Sessionization — gap-based event sessions (30-minute timeout) over the
events stream.

Not in the reference (its only session notion is the daily batch bound),
but a core streaming-analytics operator and the canonical stateful-op test:
the batch form uses Spark's native ``session_window`` (merge events whose
gaps < timeout); the streaming form (streaming.sessions) keeps per-user
state. The DuckDB oracle reproduces the semantics with the classic
lag-gap + cumulative-sum construction, proving the two formulations agree.

Scale: ``session_window`` groupBy shuffles once on (user_id) and merges
windows inside the aggregate — state is bounded by the watermark in the
streaming variant. No Python in the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table

GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Per-user gap sessions: (user_id, session_start, session_end_ts,
    n_events, n_event_types). session_end_ts is the last *event* timestamp
    (not window end = last event + gap), so the oracle math is gap-free."""
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.max("ts").alias("session_end_ts"),
            F.min("ts").alias("session_start"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end_ts",
            "n_events",
            "n_event_types",
        )
    )


_SESSIONIZE_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, ts, event_type, event_id,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL {GAP_MINUTES} MINUTE
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
    FROM ordered
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end_ts,
       COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_event_types
FROM numbered GROUP BY user_id, session_no
"""


@register(
    "sessionize_events",
    _SESSIONIZE_ORACLE,
    doc=f"Gap-based sessionization ({GAP_MINUTES}-minute timeout) via native "
    "session_window — single shuffle on user_id, windows merged in the "
    "aggregate. Oracle uses the lag-gap + cumulative-sum construction; "
    "equality proves the semantics.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Incremental sessionization — IVM for session windows
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "2024-01-21 00:00:00"


def sessionize_state(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Sessionize into a MERGEABLE state: like ``sessionize`` but carrying
    the distinct event-type SET (``collect_set``) instead of its size —
    countDistinct is not combinable from two counts, so the incremental
    state stores the partial the merge actually needs. The IVM lesson in
    one column."""
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.collect_set("event_type").alias("types"),
            F.max("ts").alias("session_end_ts"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "session_end_ts", "n_events", "types")
    )


def merge_session_states(
    base: DataFrame, delta: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """Merge a stored session state with the state of a strictly-later
    delta batch (every delta event after every base event — the
    late-partition ingest shape). Per user at most ONE boundary pair can
    merge: the base's last session with the delta's first, iff the gap is
    within the timeout — internal gaps on both sides already exceed it, so
    no chaining is possible.

    r15 perf: executed as ONE lag-gap pass over the UNION of the two
    state relations — the same session-merge rule the event-level
    sessionizer applies, run on session rows instead of events. Because
    internal gaps on both sides exceed the timeout and every delta
    session starts after every base session ends (strictly-later batch),
    the only pair this pass can merge is exactly the (base-last,
    delta-first) boundary pair the join formulation merged: identical
    output. Cost: one user-keyed window + one hash aggregate over
    state-sized input, replacing two windows + three user-keyed joins
    (the previous shape re-derived each state subtree twice and ran
    14 scans / 4 sort-merge joins in the executed plan).

    ``types`` comes back SORTED (r16): collect_list's row order after a
    groupBy is not guaranteed, so a merged pair's distinct-union order was
    nondeterministic — harmless to the registered query (it reads only
    the size) but flaky for any future consumer. array_sort pins it at
    negligible cost (the array is per-session distinct event types,
    bounded by the event-type vocabulary)."""
    from pyspark.sql import Window

    cols = ["user_id", "session_start", "session_end_ts", "n_events", "types"]
    states = base.select(*cols).unionAll(delta.select(*cols))
    w = Window.partitionBy("user_id").orderBy("session_start")
    flagged = states.withColumn(
        "_new",
        (
            F.col("session_start")
            > F.lag("session_end_ts").over(w)
            + F.expr(f"interval {gap_minutes} minutes")
        )
        .cast("int"),
    ).withColumn(
        "_sid",
        F.sum(F.coalesce(F.col("_new"), F.lit(1))).over(
            Window.partitionBy("user_id")
            .orderBy("session_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("user_id", "_sid")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end_ts").alias("session_end_ts"),
            F.sum("n_events").alias("n_events"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("types")))
            ).alias("types"),
        )
        .select(*cols)
    )


@register(
    "ivm_incremental_sessions",
    # the IVM contract is equality against the sessionize_events recompute
    # — same oracle string by construction, so the two can never drift
    _SESSIONIZE_ORACLE,
    doc="Incremental sessionization (IVM for session windows): events are "
    f"split at TIMESTAMP '{_IVM_CUTOFF}' into a stored base state and a "
    "strictly-later delta batch, each sessionized independently into "
    "MERGEABLE states (collect_set of event types, not countDistinct — "
    "the non-combinable aggregate is exactly what the state must carry), "
    "then combined: per user the single boundary pair (base-last, "
    "delta-first) merges iff its gap is within the timeout; chaining is "
    "impossible because internal gaps already exceed it. The oracle is "
    "the FULL lag-gap recompute over all events — hash equality proves "
    "combine(state, delta) == recompute, the IVM contract. At scale the "
    "delta is a day's partition and the base is never re-scanned: cost "
    "tracks the increment plus two bounded boundary-row exchanges.",
)
def q_ivm_incremental_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("ts") < F.lit(_IVM_CUTOFF).cast("timestamp"))
    delta = events.filter(F.col("ts") >= F.lit(_IVM_CUTOFF).cast("timestamp"))
    combined = merge_session_states(sessionize_state(base), sessionize_state(delta))
    return combined.select(
        "user_id",
        "session_start",
        "session_end_ts",
        "n_events",
        F.size("types").alias("n_event_types"),
    )
