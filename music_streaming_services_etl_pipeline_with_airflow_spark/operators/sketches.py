"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB pattern for incremental uniques: materialize one compact sketch
per partition (day), then answer any coarser rollup — weekly, monthly,
all-time — by UNIONING the stored sketches instead of rescanning the raw
facts. exact countDistinct cannot do this: distincts don't add across
partitions. The sketch relation is a few KB per day regardless of fact
volume.

Estimates are deterministic for a given input set (HLL register updates are
order-independent and the union is commutative), so the rows-only driver
check is stable; accuracy vs exact is pinned by
tests/test_extensions.py::test_hll_daily_rollup_accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table


def daily_user_sketches(ev: DataFrame) -> DataFrame:
    """One HLL sketch of user_id per day — the stored incremental aggregate."""
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )


def rollup_uniques(daily: DataFrame) -> DataFrame:
    """Per-day estimates plus the all-time rollup, computed purely from the
    stored sketches (no rescan of the fact table)."""
    per_day = daily.select(
        F.col("day").cast("string").alias("day"),
        F.hll_sketch_estimate("sk").cast("long").alias("est_uniques"),
    )
    overall = daily.agg(
        F.lit("ALL").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_uniques"),
    )
    return per_day.unionByName(overall)


@register(
    "sketch_daily_uniques_rollup",
    None,  # DataSketches HLL has no DuckDB twin; accuracy pinned by pytest
    doc="Mergeable HLL sketches: per-day user_id sketches materialized once, "
    "then per-day estimates AND the all-time rollup answered by sketch "
    "union — the incremental-uniques pattern that replaces full rescans at "
    "100 TB. Deterministic for a given input (order-independent register "
    "updates); accuracy vs exact countDistinct pinned by pytest.",
)
def q_sketch_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return rollup_uniques(daily_user_sketches(ev))
