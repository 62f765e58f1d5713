"""Grouped Pandas-UDF operators (``applyInPandas``) — the escape hatch for
per-group logic Spark's built-ins can't express, demonstrated with a
deterministic feature-scaling kernel.

Design rule for oracle-checkable Pandas ops: only order-independent math
(min/max/element-wise) — a numpy *sum* uses pairwise summation and would
diverge from any SQL engine's sequential fold. Sums belong in JVM
aggregates; Python gets the shapes JVM can't do.

Scale: applyInPandas shuffles once on the group key and streams each group
through Arrow batches — groups must fit in executor memory (here: per
event_type), which is exactly the documented constraint of the operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import register
from ..sources import load_table

_OUT_SCHEMA = "event_id long, event_type string, value double, scaled double"


def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["value"].min(), pdf["value"].max()
    span = hi - lo
    scaled = (pdf["value"] - lo) / span if span > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value": pdf["value"],
            "scaled": scaled,
        }
    )


def minmax_scale_per_group(events: DataFrame, key: str = "event_type") -> DataFrame:
    return events.select("event_id", "event_type", "value").groupBy(key).applyInPandas(
        _minmax_scale, schema=_OUT_SCHEMA
    )


@register(
    "pandas_group_minmax_scale",
    """SELECT event_id, event_type, value,
       CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN value * 0.0
            ELSE (value - MIN(value) OVER w)
                 / (MAX(value) OVER w - MIN(value) OVER w) END AS scaled
       FROM events
       WINDOW w AS (PARTITION BY event_type)""",
    doc="Grouped applyInPandas: per-group min-max feature scaling in an "
    "Arrow-batched pandas kernel. Min/max + element-wise ops only "
    "(order-independent → bit-identical to the SQL window oracle).",
)
def q_pandas_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minmax_scale_per_group(load_table(spark, sf_dir, "events"))
