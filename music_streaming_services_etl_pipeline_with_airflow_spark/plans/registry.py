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
# priority-first. Round-3 rotation (VERDICT r2 task 1): rounds 1-2 left 33
# oracle-bearing queries without a driver row; they take the head so
# cumulative driver coverage reaches 126/126. The remaining ~17 slots
# re-check queries that CHANGED this round (LSH orientation fix, typed
# flagship, containment-banded, streaming oracles, WAV decode) — twice-green
# unchanged flagships and oracle-less entries (which burn a slot on a
# forever-`no_oracle` row) are evicted from the head.
_PRIORITY: tuple[str, ...] = (
    # -- the 33 never-driver-checked oracle queries (r1+r2 gap) --
    "genre_kpis_daily_twopass",
    "a10_cube_returnflag_status",
    "a11_median_mode",
    "a12_pivot_multi_agg",
    "a14_filtered_agg",
    "a15_zscore_outliers",
    "a16_value_histogram",
    "w3_gapfill_daily_by_type",
    "w4_ntile_rank_quartiles",
    "w5_first_last_per_user",
    "w6_percent_rank_cume_dist",
    "w7_ewma_per_user",
    "w8_range_interval_frame",
    "w9_running_distinct",
    "o3_global_topk",
    "j7_range_join_binned",
    "j10_basket_part_pairs",
    "j11_lateral_topn",
    "j12_salted_skew_join",
    "j13_nullsafe_join",
    "u4_bag_set_ops",
    "p17_map_pivot_lookup",
    "p18_array_set_ops",
    "p19_ansi_safe_arith",
    "s5_recursive_cte_ancestors",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "ivm_incremental_daily_kpis",
    "pandas_group_minmax_scale",
    "text_lang_confusion",
    "corpus_source_mix",
    # -- new or behavior-changed this round: need fresh driver rows --
    "dedup_containment_banded",  # new scale twin of dedup_containment
    "dedup_minhash_lsh",  # LSH size-block orientation fix
    "curate_training_corpus",  # consumes lsh_candidate_pairs
    "genre_kpis_daily",  # flagship (typed-parse headline work)
    "genre_kpis_daily_onepass",
    "multimodal_decode_metadata",  # WAV decode added
    "streaming_hourly_window",  # oracle added (availableNow determinism)
    "streaming_foreachbatch_upsert",  # oracle added
    # -- high-value re-checks to round out the budget --
    "hourly_kpis",
    "q4_most_popular_track_per_day_genre",
    "q6_top_artist_per_hour",
    "dedup_exact",
    "dedup_simhash_banded",
    "merge_upsert_relational",
    "scd2_priority_history",
    "sessionize_events",
    "dedup_components",
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
        if name in _REGISTRY:
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
