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
    assert "Window" not in one
    multi = _explain(q_genre_kpis(spark, SF), mode="simple")
    assert multi.count("Exchange hashpartitioning") > 1  # what we optimized away


def test_onepass_equals_window_form(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_genre_kpis_onepass,
        q_genre_kpis,
    )

    a = sorted(map(tuple, q_genre_kpis_onepass(spark, SF).collect()))
    b = sorted(map(tuple, q_genre_kpis(spark, SF).collect()))
    assert a == b


def test_whole_stage_codegen_covers_agg(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_a1,
    )

    plan = _explain(q_a1(spark, SF), mode="codegen")
    assert "WholeStageCodegen" in plan  # JVM-side, no Python in the hot path
