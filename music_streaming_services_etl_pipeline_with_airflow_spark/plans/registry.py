"""Query registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each entry couples a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB-runnable ANSI-SQL oracle (or ``None`` for ops that are not
SQL-expressible — streaming, iterative — which the driver checks rows-only).

Determinism contract (what makes the order-insensitive value-hash match):
- every computed column is aliased identically on both sides;
- averages/sums aggregate *integer-valued* inputs so double summation is
  exact and therefore partial-aggregation-order independent;
- any unavoidable float aggregate is wrapped in ROUND(..., k) on both sides;
- every top-k / argmax has a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's per-round CORRECTNESS budget covers roughly the first 50
# registry entries in iteration order, so the dict below is emitted
# priority-first: entries that are new or changed this round lead (they have
# no green row for their current behavior), then a rotation slice of
# oracle-green queries whose most recent driver row is two-plus rounds old.
# Every name below exists in _REGISTRY and every entry carries an oracle --
# all_specs() asserts both so a phantom or oracle-less name fails loudly
# instead of silently burning a driver slot.
_PRIORITY: tuple[str, ...] = (
    # -- new oracles or behavior changed in round 5: need fresh driver rows --
    "dedup_containment_banded",
    "streaming_hourly_window",
    "streaming_foreachbatch_upsert",
    "genre_kpis_daily",
    "genre_kpis_daily_strparse",
    "genre_kpis_daily_onepass",
    "dedup_minhash_lsh",
    "dedup_containment",
    "streaming_dedup_watermark",
    "streaming_interval_join",
    "streaming_sessionize",
    "streaming_sessionize_timeout",
    "dedup_chunks_cross_doc",
    "streaming_sliding_window",
    # -- rotation: oracle-green queries whose last driver row is r1/r2
    #    (79 such after rounds 3-4 re-checked the head; first 43 here,
    #    the rest next round) --
    "hourly_kpis_fast",
    "s1_input_presence_probe",
    "s2_multifile_csv_union",
    "p1_p2_p3_project_rename_cast",
    "p4_lenient_timestamp_parse",
    "p5_p6_date_hour_extract",
    "p7_derived_ratio",
    "p9_null_profile",
    "p10_rows_with_any_null",
    "p11_null_imputation",
    "p12_row_count",
    "p8_required_columns_check",
    "j1_broadcast_left_join",
    "a1_group_multi_agg",
    "a2_argmax_per_group",
    "a3_hourly_distinct_counts",
    "a4_plays_per_artist_hour",
    "o1_multikey_sort",
    "o2_top1_per_group",
    "j4_multiway_dim_rollup",
    "a5_rollup_hierarchy",
    "a6_pivot_event_matrix",
    "u1_union_all",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "u2_intersect_distinct",
    "u3_except_distinct",
    "j5_semi_anti_join",
    "w1_user_event_lag_gaps",
    "w2_moving_average_7d",
    "text_top_bigrams",
    "p13_string_functions",
    "p14_json_extraction",
    "j6_asof_join_latest_order",
    "embedding_dim_stats",
    "j7_range_join_value_bands",
    "a8_hypertable_rollup",
    "p15_array_collect_transform",
    "s3_scalar_subquery_having",
    "s4_correlated_not_exists",
    "a9_exact_correlation",
)


def all_specs() -> dict[str, QuerySpec]:
    # Import registrants lazily to avoid import cycles.
    from . import analogs, breadth, curation, product_analytics, sql_surface, warehouse  # noqa: F401
    from ..operators import (  # noqa: F401
        components,
        dedup,
        expectations,
        clustering,
        multimodal,
        packing,
        pandas_ops,
        python_udfs,
        sampling,
        sessions,
        similarity,
        sketches,
        text,
    )
    from ..streaming import dedup_join as streaming_dedup_join  # noqa: F401
    from ..streaming import hourly_stream  # noqa: F401
    from ..streaming import sessions as streaming_sessions  # noqa: F401
    from ..streaming import sliding as streaming_sliding  # noqa: F401
    from ..streaming import upsert_sink as streaming_upsert_sink  # noqa: F401

    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        # Loud, not lenient: a name that isn't registered (phantom) or has
        # no oracle would burn one of the driver's ~50 correctness slots on
        # nothing — exactly how a round-4 phantom entry went unnoticed.
        if name not in _REGISTRY:
            raise KeyError(f"_PRIORITY lists unregistered query {name!r}")
        if _REGISTRY[name].oracle is None:
            raise ValueError(f"_PRIORITY entry {name!r} has no oracle")
        ordered[name] = _REGISTRY[name]
    # remaining oracle-bearing queries keep insertion order
    for name, spec in _REGISTRY.items():
        if name not in ordered and spec.oracle is not None:
            ordered[name] = spec
    # rows-only entries last
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def QUERIES() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v.fn for k, v in all_specs().items()}


def ORACLES() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}
