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


@register(
    "sessionize_events",
    f"""
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
""",
    doc=f"Gap-based sessionization ({GAP_MINUTES}-minute timeout) via native "
    "session_window — single shuffle on user_id, windows merged in the "
    "aggregate. Oracle uses the lag-gap + cumulative-sum construction; "
    "equality proves the semantics.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))
