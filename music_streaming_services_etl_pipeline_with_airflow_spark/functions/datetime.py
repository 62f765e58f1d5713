"""Date/time column expressions (P3-P6).

The reference does: astype(str) → pd.to_datetime(errors="coerce") →
.dt.date / .dt.hour (reference dags/music_streaming_services_dag.py:155-163),
with the NaT→"NaT"-string round-trip quirk (SURVEY §8.4). In Spark a single
``to_timestamp`` gets the same end state: malformed → null (ANSI off), then
native date/hour extraction. All JVM-side Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lenient_timestamp(col: Column | str) -> Column:
    """P4 — parse string → timestamp, malformed → null (errors='coerce').

    ``try_to_timestamp`` rather than ``to_timestamp``: Spark 4 runs ANSI
    mode by default, where a plain parse *throws* on malformed input."""
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col)


def event_date(ts: Column | str) -> Column:
    """P5 — calendar date of the event."""
    return F.to_date(F.col(ts) if isinstance(ts, str) else ts)


def event_hour(ts: Column | str) -> Column:
    """P6 — hour-of-day 0..23 as INT (the reference leaks float/VARCHAR
    via pandas NaN promotion — SURVEY §8.4; we emit a clean int)."""
    return F.hour(F.col(ts) if isinstance(ts, str) else ts).cast("int")
