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
# priority-first: the flagship reference pipelines, the Q1-Q7 SQL-validation
# surface, and the LLM-data-pipeline families (curation, dedup, similarity,
# MERGE/SCD2, text, packing) — all oracle-bearing — occupy the head;
# remaining oracle-bearing breadth queries follow; rows-only entries
# (sketches, streaming, RNG sampling) go last so they never displace an
# oracle-checked query from the budget.
_PRIORITY: tuple[str, ...] = (
    # reference flagship pipelines (dags/music_streaming_services_dag.py:166-250 analogs)
    "genre_kpis_daily",
    "hourly_kpis",
    "genre_kpis_daily_onepass",
    "hourly_kpis_fast",
    # Q1-Q7 Redshift validation SQL surface
    "q1_total_listens_per_genre",
    "q2_avg_duration_per_genre",
    "q3_avg_popularity_per_genre",
    "q4_most_popular_track_per_day_genre",
    "q5_unique_listeners_per_hour",
    "q6_top_artist_per_hour",
    "q7_avg_diversity_per_hour",
    # flagship composed LLM-corpus pipeline + dedup family
    "curate_training_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_banded",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_components",
    # ANN similarity family
    "similarity_topk_bruteforce",
    "similarity_ivf_topk",
    "similarity_ivf_multiprobe",
    # warehouse maintenance
    "merge_upsert_relational",
    "scd2_priority_history",
    # text-analysis family
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "text_tfidf_top_terms",
    "text_chunk_fixed",
    "text_fingerprint",
    "text_top_bigrams",
    # curation filters
    "decontam_ngram_overlap",
    "gopher_repetition",
    "entity_mask",
    # sessionization + corpus assembly
    "sessionize_events",
    "pack_sequences_greedy",
    "pack_sequences_hierarchical",
    "corpus_mixture_sample",
    "build_vocab",
    # deterministic sampling/splits
    "sample_hash_bucket",
    "sample_train_val_test_split",
    "sample_class_balanced",
    # multimodal plumbing
    "multimodal_decode_metadata",
    "multimodal_frame_sample",
    # data-quality expectations
    "dq_expectations_lineitem",
    "dq_referential_integrity",
    # product analytics
    "funnel_signup_click_purchase",
    "retention_weekly_cohorts",
    "evt_transition_matrix",
    # UDTF/UDAF surface
    "udtf_text_chunks",
    "udaf_geometric_mean",
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
