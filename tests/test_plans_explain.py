"""Physical-plan assertions — the scale contract, checked mechanically:
broadcast joins where a dimension is small, predicate pushdown reaching the
parquet scan, column pruning, and shuffle counts for the one-pass agg."""

from __future__ import annotations

import contextlib
import io


def _explain(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


SF = "/root/testdata/sf0.001"


def test_j1_is_broadcast_join(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        enriched_genre,
    )

    plan = _explain(enriched_genre(spark, SF))
    assert "BroadcastHashJoin" in plan  # dim side never shuffles the fact table
    assert "SortMergeJoin" not in plan


def test_pushdown_reaches_parquet_scan(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_f1_pushdown,
    )

    plan = _explain(q_f1_pushdown(spark, SF))
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]
    # column pruning: scan reads only the 4 referenced columns
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema and "l_quantity" in read_schema


def test_onepass_genre_kpis_single_shuffle(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_genre_kpis_onepass,
        q_genre_kpis,
    )

    one = _explain(q_genre_kpis_onepass(spark, SF), mode="simple")
    # exactly one shuffle (the groupBy) — broadcast exchange excluded
    assert one.count("Exchange hashpartitioning") == 1
    # r15: the argmax tie-break is pre-encoded as _pop_rank on the songs
    # DIM (a broadcast-sized single-partition window over part), so the
    # fact-side aggregate is a pure numeric HashAggregate — no
    # SortAggregate, and no window over the fact table (the only Window
    # nodes sit on the dim subtree, which scans part, never lineitem)
    assert "SortAggregate" not in one
    assert one.count("Window") == one.count("row_number")
    # since round 2 the flagship genre_kpis query runs the same folded
    # single-aggregate plan (the two-pass shape was 2x slower even cached)
    flagship = _explain(q_genre_kpis(spark, SF), mode="simple")
    assert flagship.count("Exchange hashpartitioning") == 1
    assert "SortAggregate" not in flagship


def test_onepass_equals_window_form(spark):
    """The reference-shaped two-pass formulation (agg + window argmax + join)
    is retained as an independent implementation and must stay row-identical
    to the folded min_by plan."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.kpis import (
        genre_kpis_window_form,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        enriched_genre,
        q_genre_kpis,
    )

    a = sorted(map(tuple, q_genre_kpis(spark, SF).collect()))
    b = sorted(map(tuple, genre_kpis_window_form(enriched_genre(spark, SF)).collect()))
    assert a == b
    # and the window form keeps the reference's literal plan shape
    multi = _explain(genre_kpis_window_form(enriched_genre(spark, SF)), mode="simple")
    assert multi.count("Exchange hashpartitioning") > 1
    assert "Window" in multi


def test_whole_stage_codegen_covers_agg(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_a1,
    )

    plan = _explain(q_a1(spark, SF), mode="codegen")
    assert "WholeStageCodegen" in plan  # JVM-side, no Python in the hot path


def test_gopher_repetition_is_shuffle_free(spark):
    """The repetition signals are pure map-side array expressions — the
    physical plan must contain NO Exchange at all."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.text import (
        q_gopher_repetition,
    )

    plan = _explain(q_gopher_repetition(spark, SF))
    assert "Exchange" not in plan


def test_entity_mask_is_shuffle_free(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.text import (
        q_entity_mask,
    )

    plan = _explain(q_entity_mask(spark, SF))
    assert "Exchange" not in plan


def test_decontam_probe_is_broadcast(spark):
    """The eval-shingle probe side must broadcast — the training shards
    never shuffle for the overlap check."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.text import (
        q_decontam,
    )

    plan = _explain(q_decontam(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_range_join_binned_is_hash_join(spark):
    """Binning must rescue the interval join from BroadcastNestedLoop."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.breadth import (
        q_j7_range_binned,
    )

    plan = _explain(q_j7_range_binned(spark, SF))
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan


def test_scd2_single_exchange(spark):
    """Both SCD2 windows and the version rollup must reuse ONE custkey
    exchange."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.warehouse import (
        q_scd2_history,
    )

    plan = _explain(q_scd2_history(spark, SF))
    assert plan.count("+- Exchange") + plan.count(":- Exchange") == 1


def test_containment_banded_no_cartesian(spark):
    """The prefix-filtered containment plan must stay equi-join shaped:
    no cartesian product, no nested-loop pair enumeration."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
        q_dedup_containment_banded,
    )

    plan = _explain(q_dedup_containment_banded(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_new_text_ops_no_pair_expansion(spark):
    """The round-6 text additions must stay join-safe: no cartesian or
    nested-loop join anywhere (the only cross join allowed is the bounded
    1-row broadcast of the corpus total in the bigram scorer), and the
    n-gram aggregates must carry map-side partial aggregation."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.text import (
        q_bigram_logprob,
        q_corpus_trigram_novelty,
        q_gopher_repetition_full,
    )

    for fn in (q_gopher_repetition_full, q_corpus_trigram_novelty):
        plan = _explain(fn(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "HashAggregate" in plan

    import re

    plan = _explain(q_bigram_logprob(spark, SF))
    assert "CartesianProduct" not in plan
    # the corpus-total cross join must be the broadcast (1-row) form, and
    # every vocab lookup a hash join — never a nested loop over tokens
    # (formatted mode prints each node twice: tree line + numbered detail,
    # so count the numbered detail headers)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_no_cartesian_product_anywhere(spark):
    """Repo-wide plan-hygiene gate: NO registered batch query may plan a
    CartesianProduct — the one join strategy that cannot survive a scale-up
    (every cross join in the repo is a bounded-row broadcast, which plans
    as BroadcastNestedLoopJoin instead). Streaming queries are skipped
    because building their DataFrame executes the stream."""
    import contextlib
    import io

    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    offenders = []
    for name, spec in all_specs().items():
        if name.startswith("streaming_"):
            continue
        df = spec.fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        if "CartesianProduct" in buf.getvalue():
            offenders.append(name)
    assert offenders == []


def test_tpch_family_plan_shape(spark):
    """The TPC-H family's scale contract: every dimension side broadcasts
    (lineitem is never shuffled on a join key), Q6's date filter reaches the
    parquet scan, and Q1/Q6 are single-scan aggregates with no join at all."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans import tpch

    # multi-join queries: all joins broadcast, no sort-merge on the fact
    for fn in (
        tpch.q_tpch3,
        tpch.q_tpch5,
        tpch.q_tpch7,
        tpch.q_tpch8,
        tpch.q_tpch10,
        tpch.q_tpch14,
    ):
        plan = _explain(fn(spark, SF))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
    # Q18: the big rollup runs on lineitem alone before any join
    plan18 = _explain(tpch.q_tpch18(spark, SF), mode="simple")
    assert "BroadcastHashJoin" in plan18
    # Q6: filter pushdown + pruned read (3 of 11 lineitem columns)
    plan6 = _explain(tpch.q_tpch6(spark, SF))
    assert "PushedFilters:" in plan6
    assert "l_shipdate" in plan6.split("PushedFilters:")[1].split("\n")[0]
    read_schema = plan6.split("ReadSchema:")[1].split("\n")[0]
    assert "l_returnflag" not in read_schema and "l_discount" in read_schema
    # Q1: one scan, one aggregate exchange, zero joins
    plan1 = _explain(tpch.q_tpch1(spark, SF), mode="simple")
    assert "Join" not in plan1
    assert plan1.count("Exchange hashpartitioning") == 1


def test_reservoir_topk_no_global_sort(spark):
    """Exact-k hash-rank sample must plan as TakeOrderedAndProject
    (per-partition heaps + driver merge), never a full Sort + shuffle."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.sampling import (
        q_reservoir_topk,
    )

    plan = _explain(q_reservoir_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort shuffle


def test_zorder_locality_buckets_are_rectangles(spark):
    """The z-order claim itself: with 3 high bits fixed per dimension, every
    64-bucket cell spans at most 2^13 of the 2^16 grid units per key — i.e.
    each bucket covers a bounded rectangle of the key space, which is what
    makes min/max footer stats prune range predicates on EITHER column."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.warehouse import (
        q_zorder_locality,
    )

    rows = q_zorder_locality(spark, SF).collect()
    assert len(rows) > 8  # curve actually split across many buckets
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    # grid→key scale: one grid unit is span/65535 keys; 2^13 grid units
    # plus one unit of quantization slack
    a_cap = max(b[1] - b[0], 1) * 8192 / 65535 + max(b[1] - b[0], 1) / 65535 + 1
    b_cap = max(b[3] - b[2], 1) * 8192 / 65535 + max(b[3] - b[2], 1) / 65535 + 1
    for r in rows:
        assert r.pk_max - r.pk_min <= a_cap, r
        assert r.sk_max - r.sk_min <= b_cap, r


def test_orc_partitioned_read_prunes_partitions(spark):
    """The <> 'P' filter on the Hive-partitioned ORC layout must be
    classified as a PartitionFilter (pruned at file listing — the excluded
    status= directory is never opened), not a per-row DataFilter. Guards
    the regression where an explicit user schema demotes the partition
    column to a data column and silently disables pruning."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_sink_orc_partitioned,
    )

    df = q_sink_orc_partitioned(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan orc" in ln]
    assert scan, "expected an ORC scan in the plan"
    pf = scan[0].split("PartitionFilters: [")[1].split("]")[0]
    assert "o_orderstatus" in pf and "P" in pf


def test_bloom_point_skipping_actually_skips(spark):
    """The skipping guarantee the warehouse_bloom_point_skipping query no
    longer hashes (r10 — bloom skipping is probabilistic, so it belongs
    in pytest, not in the driver's value-hash gate): a point lookup on
    the 4-batch modulo-keyed orders table must open FEWER dirs than the
    manifest lists, with the filter sized from the batch key count
    (~10 bits/key keeps the per-dir false-positive odds ~3%)."""
    import pyspark.sql.functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.warehouse import (
        q_bloom_point_skipping,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.workdirs import (
        fresh_work_dir,
    )

    rows = q_bloom_point_skipping(spark, SF).collect()
    assert rows and all(r.found_in_scan and r.dirs_total == 4 for r in rows)
    # rebuild the same table shape and assert the scanned-dir count
    # directly (the query intentionally does not emit it)
    t = SnapshotTable(fresh_work_dir("bloom_skip_pytest") + "/orders_hashed")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    n_keys = orders.count() // 4 + 1
    bits = 1 << max(17, (n_keys * 10 - 1).bit_length())
    batch = F.pmod("o_orderkey", F.lit(4))
    t.commit(orders.filter(batch == 0), bloom_cols=["o_orderkey"], bloom_bits=bits)
    for b in (1, 2, 3):
        t.commit(
            orders.filter(batch == b),
            mode="append",
            bloom_cols=["o_orderkey"],
            bloom_bits=bits,
        )
    key = orders.agg(F.max("o_orderkey")).first()[0]
    pruned, n_scanned, n_total = t.read_point(spark, "o_orderkey", key)
    assert n_total == 4 and n_scanned < n_total
    assert pruned.filter(F.col("o_orderkey") == key).count() >= 1


def _executed_nodes(spark, df) -> dict[str, int]:
    """Unique physical node counts from the df's OWN QueryExecution after
    an action — ReusedExchange / AQEShuffleRead only exist in the AQE-final
    plan (a noop write plans a separate command execution, so collect)."""
    import re

    df.collect()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    nodes: dict[str, set[str]] = {}
    for m in re.finditer(r"^\((\d+)\) (\w+)", plan, re.M):
        nodes.setdefault(m.group(2), set()).add(m.group(1))
    return {k: len(v) for k, v in nodes.items()}


def _static_nodes(spark, df) -> dict[str, int]:
    import re

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    nodes: dict[str, set[str]] = {}
    for m in re.finditer(r"^\((\d+)\) (\w+)", plan, re.M):
        nodes.setdefault(m.group(2), set()).add(m.group(1))
    return {k: len(v) for k, v in nodes.items()}


def test_bm25_family_reuses_corpus_tokenize(spark):
    """r15's no-op `tf >= 1` filter keeps the term-frequency count in the
    df subtree so Catalyst cannot prune it into a distinct — all tokenize
    exchanges canonicalize equal and AQE runs ONE corpus tokenize pass.
    Pinned because a Spark upgrade that folds the filter via constraint
    inference would silently restore the duplicate corpus scans with no
    other test failing (the perf win otherwise lives only in plans/r15)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    specs = all_specs()
    floors = {
        "text_bm25_topk": (2, 3),  # (min ReusedExchange, max unique scans)
        "text_bigram_logprob": (1, 4),
        "text_tfidf_top_terms": (1, 2),
        "retrieval_rrf_hybrid": (1, 5),
        "retrieval_bm25_cosine_rerank": (1, 5),
    }
    for name, (min_reuse, max_scans) in floors.items():
        c = _executed_nodes(spark, specs[name].fn(spark, SF))
        assert c.get("ReusedExchange", 0) >= min_reuse, (name, c)
        assert c.get("Scan", 99) <= max_scans, (name, c)


def test_ivm_session_merge_two_exchanges(spark):
    """r15's union lag-gap rewrite of merge_session_states: the whole
    incremental-sessions query plans exactly TWO exchanges (base+delta
    session builds) and no join at all."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    c = _static_nodes(spark, all_specs()["ivm_incremental_sessions"].fn(spark, SF))
    assert c.get("Exchange", 0) == 2, c
    assert c.get("SortMergeJoin", 0) == 0 and c.get("BroadcastHashJoin", 0) == 0, c


def test_gopher_full_single_doc_exchange(spark):
    """r15: the doc_id pre-partition satisfies both gram aggregates'
    ClusteredDistribution, so the ONLY exchange shuffles raw text by
    doc_id — never the exploded gram relations."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    c = _static_nodes(spark, all_specs()["gopher_repetition_full"].fn(spark, SF))
    assert c.get("Exchange", 0) == 1, c


def test_winnowed_selection_stays_in_arrays(spark):
    """r16: winnowing selection is per-doc array work — no Window over the
    exploded window-hash relation, and at most 3 exchanges (narrow-input
    spread + the two phases of the final distinct aggregate), all carrying
    either raw docs or selected fingerprints."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    c = _static_nodes(spark, all_specs()["dedup_winnowed_shingles"].fn(spark, SF))
    assert c.get("Window", 0) == 0, c
    assert c.get("Exchange", 0) <= 3, c


def test_trigram_novelty_two_exchanges_no_corpus_broadcast(spark):
    """r16: per-doc trigram dedup moved into array_distinct and the
    doc-count became a per-g window — two exchanges, and no broadcast of
    the corpus-wide distinct trigram relation."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    c = _static_nodes(spark, all_specs()["corpus_trigram_novelty"].fn(spark, SF))
    assert c.get("Exchange", 0) == 2, c
    assert c.get("BroadcastExchange", 0) == 0, c


def test_triangle_counts_single_tri_evaluation(spark):
    """r16: per-vertex credit is explode(array(u,x,y)) off ONE evaluation
    of the wedge-closure join — the 3-way unionAll shape re-executed the
    most expensive join per branch (static plan: 66 scans/13 unions; now
    22/4 with the explode Generate)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    c = _static_nodes(spark, all_specs()["graph_triangle_counts"].fn(spark, SF))
    assert c.get("Generate", 0) >= 1, c
    assert c.get("Scan", 99) <= 30, c
    assert c.get("Union", 99) <= 6, c


def test_constant_rank_caps_push_map_side(spark):
    """A `row_number() <= CONSTANT` per-group filter must plan a PARTIAL
    WindowGroupLimit BEFORE the exchange (Spark's rank-limit pushdown):
    each map partition keeps only the cap's worth of rows per source, so
    a hot source never funnels its whole document set through the window
    task. This is why the constant-cap query needs no two-phase twin
    while the data-dependent-quota mixtures do — pinned here so a
    refactor that breaks the pushdown (e.g. filtering on a joined column)
    shows up as a test failure, not a silent scale regression."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )

    for name in ("curate_source_cap", "sample_class_balanced"):
        df = all_specs()[name].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, name
        head, _, tail = plan.partition("Exchange")
        assert "WindowGroupLimit" in tail and "Partial" in tail, (name, plan)
