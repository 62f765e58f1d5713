"""Write EXPLAINS.md — formatted physical plans of the headline queries, so
plan quality (broadcasts, pushdown, shuffle counts, codegen spans) is
reviewable without running Spark.

Usage: python tools/dump_explains.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

QUERIES = [
    "genre_kpis_daily_onepass",
    "genre_kpis_daily",
    "hourly_kpis",
    "j4_multiway_dim_rollup",
    "f1_pushdown_filtered_scan",
    "dedup_minhash_lsh",
    "dedup_containment_banded",
    "dedup_chunks_cross_doc",
    "similarity_topk_bruteforce",
    "similarity_pq_topk",
    "sessionize_events",
    "text_tfidf_top_terms",
    "text_pii_redact",
    "privacy_k_anonymity",
    "a5_rollup_hierarchy",
    "a8_hypertable_rollup",
    "funnel_signup_click_purchase",
    "pack_sequences_greedy",
    "curate_training_corpus",
    "j8_bloom_prefilter_join",
    "o3_global_topk",
    "j10_basket_part_pairs",
    "w3_gapfill_daily_by_type",
    "dedup_embedding_lsh",
    "merge_upsert_relational",
    "scd2_priority_history",
    "decontam_ngram_overlap",
    "j7_range_join_binned",
    "w7_ewma_per_user",
    "corpus_mixture_sample",
    "build_vocab",
    "j12_salted_skew_join",
    "w9_running_distinct",
    "dedup_simhash_banded",
    "dedup_containment",
    "ivm_incremental_daily_kpis",
    "dedup_winnowed_shingles",
    "similarity_ivf_kmeans",
    "dedup_shared_spans",
    "curate_strip_shared_spans",
    "text_unigram_logprob",
    "bpe_tokenize_corpus",
    # late round 6
    "similarity_int8_topk",
    "dedup_normalized_exact",
    "a17_grouping_sets",
    "w10_mad_outliers",
    "j14_asof_tolerance_join",
    "multimodal_resize_thumbnail",
    "gopher_repetition_full",
    "text_bigram_logprob",
    "corpus_trigram_novelty",
    "corpus_temperature_mixture",
    "dedup_source_overlap",
    "curate_quality_verdicts",
    # late round 6, second wave
    "sample_reservoir_topk",
    "warehouse_zorder_locality",
    "warehouse_snapshot_delete",
    "ivm_incremental_sessions",
    "w11_ohlc_resample",
    "decontam_semantic",
    "graph_triangle_counts",
    "multimodal_phash_dedup",
    "similarity_ts_topk_subsequence",
    "multimodal_audio_energy",
    "similarity_hard_negatives",
    "curate_source_cap",
    "multimodal_scene_cuts",
    # round 7
    "similarity_ivfpq_topk",
    "ivm_incremental_join_enrich",
    "sink_jsonl_sharded_roundtrip",
    "graph_bfs_hops",
    "multimodal_png_pixel_roundtrip",
    "multimodal_jpeg_entropy_roundtrip",
    # (streaming_matview_join_enrich runs through foreachBatch — its
    # per-batch plan is the broadcast-enrich + partial-agg + merge_bucketed
    # shape shown by ivm_incremental_join_enrich above; writeStream plans
    # are not .explain()-able as a DataFrame. streaming_pii_scrub likewise:
    # its per-batch frame is exactly text_pii_redact's plan above.)
    # round 8
    "er_resolve_customers",
    "er_resolve_customers_capped",
    "graph_kcore_parts",
    "similarity_ivf_persisted",
    "similarity_ivf_persisted_delete",
    "privacy_dp_lang_counts",
    # round 8 continuation
    "text_bm25_topk",
    "retrieval_rrf_hybrid",
    "warehouse_compact_small_files",
    "sink_orc_partitioned_roundtrip",
    "ml_perceptron_quality_distill",
    "warehouse_zonemap_skipping",
    "warehouse_analyze_stats",
    "dq_join_skew_report",
    "text_chunk_overlap",
    "corpus_curriculum_phases",
    "retrieval_bm25_cosine_rerank",
    "retrieval_maxsim_late_interaction",
    "warehouse_change_feed",
    "ivm_from_change_feed",
    "warehouse_equidepth_histogram",
    "warehouse_schema_evolution",
    "warehouse_vacuum_report",
    "warehouse_row_provenance",
    # (streaming_model_scoring: foreachBatch-free writeStream — its
    # per-batch frame is exactly ml_perceptron_quality_distill's scoring
    # projection above; writeStream plans are not .explain()-able)
    # round 9
    "retrieval_maxsim_two_stage",
    "w4_quartiles_scale_safe",
    "w6_relative_ranks_scale_safe",
    # round 10: the VERDICT-named plan gaps (>1 s headline queries with no
    # section) + the two new scale twins
    "genre_kpis_daily_strparse",
    "a2_argmax_per_group",
    "pack_sequences_sharded",
    "corpus_mixture_sample_scale_safe",
    "corpus_temperature_mixture_scale_safe",
    "graph_pagerank_parts",
    "a1_group_multi_agg",
    "q1_total_listens_per_genre",
    "q7_avg_diversity_per_hour",
    "a3_hourly_distinct_counts",
    "j1_broadcast_left_join",
    # TPC-H family
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customers",
]


def _normalize(text: str) -> str:
    """Make plan dumps regeneration-stable: expression ids (#123) and
    plan_ids are session-global counters that differ on every run even
    when the PLAN is identical, so an untouched query used to rewrite its
    whole section on each regen (~4,700-line diffs). Renumber both in
    order of first appearance within the query's dump, and collapse
    scratch-dir paths — a regen on unchanged code now produces an empty
    diff, so EXPLAINS.md diffs show only real plan changes."""
    import re

    emap: dict[str, str] = {}

    def exprid(m: re.Match) -> str:
        k = m.group(0)
        if k not in emap:
            emap[k] = f"#{len(emap) + 1}"
        return emap[k]

    text = re.sub(r"#\d+", exprid, text)

    pmap: dict[str, str] = {}

    def planid(m: re.Match) -> str:
        k = m.group(1)
        if k not in pmap:
            pmap[k] = str(len(pmap) + 1)
        return f"plan_id={pmap[k]}"

    text = re.sub(r"plan_id=(\d+)", planid, text)
    text = re.sub(r"/tmp/spark_engine_[^\s,\]\)]+", "<scratch>", text)
    text = re.sub(r"stream_mem_\d+_\d+", "stream_mem_<n>", text)
    # RDD lineage numbers (MapPartitionsRDD[242]) are session-global
    # counters too — same churn, same fix
    text = re.sub(r"RDD\[\d+\]", "RDD[<n>]", text)
    return text


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explains")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out = [
        "# EXPLAINS — physical plans of the headline queries",
        "",
        f"Generated by tools/dump_explains.py on {sf_dir} "
        "(plan shape is sf-independent; AQE finalizes at runtime). "
        "Expression/plan ids are renumbered per query and scratch paths "
        "collapsed so regeneration on unchanged code is diff-empty.",
        "",
    ]
    for name in QUERIES:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = _normalize(buf.getvalue().rstrip())
        out += [f"## {name}", "", specs[name].doc, "", "```", plan, "```", ""]

    # Streaming foreachBatch paths (r9): a writeStream query is not
    # .explain()-able from outside, so the appliers capture their
    # per-batch frames' plans on the first batch via ingest.PLAN_CAPTURE.
    # Running the registered fn drives each stream to completion at
    # sf0.001 and fills the dict.
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as _ingest

    _ingest.PLAN_CAPTURE = {}
    for name in (
        "streaming_matview_join_enrich",
        "streaming_cdc_apply",
        "streaming_dedup_ingest",
        "streaming_foreachbatch_upsert",
        "streaming_bm25_index_topk",
        "streaming_pack_index",
        "streaming_minhash_index",
        # round 12: the streaming IVF pair (batch_assign + pruned_search
        # frames; the delete twin's search plan is identical) and the
        # streaming semantic near-dup index (groups/bands/vecs pruned
        # frames)
        "streaming_ivf_index_topk",
        "streaming_semantic_index",
        # round 13: the post-migration pruned search (the plan must be
        # the same bucket-pruned shape as the un-migrated index's)
        "streaming_ivf_requantize",
        # round 15: the post-bootstrap pruned search (bulk-seeded lists
        # must serve through the same bucket-pruned plan as chunked ones)
        "streaming_ivf_index_bulk_bootstrap",
    ):
        specs[name].fn(spark, sf_dir).collect()
    for key in sorted(_ingest.PLAN_CAPTURE):
        qname = key.split(".", 1)[0]
        out += [
            f"## {key} (per-batch frame inside foreachBatch)",
            "",
            specs[qname].doc,
            "",
            "```",
            _normalize(_ingest.PLAN_CAPTURE[key]),
            "```",
            "",
        ]
    _ingest.PLAN_CAPTURE = None

    with open("/root/repo/EXPLAINS.md", "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print("wrote EXPLAINS.md")


if __name__ == "__main__":
    main()
