"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the package
``music_streaming_services_etl_pipeline_with_airflow_spark``; this module is
a thin adapter over its query registry (plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_services_etl_pipeline_with_airflow_spark.plans import registry
from music_streaming_services_etl_pipeline_with_airflow_spark.session import tune_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full genre-KPI pipeline analog: broadcast left join (J1) +
    multi-aggregate (A1) + window argmax (A2) + composite join (J2).
    """
    tune_existing(spark)
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.analogs import (
        q_genre_kpis_onepass,
    )

    return q_genre_kpis_onepass(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    raw = registry.QUERIES()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in raw.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.ORACLES()
