"""The daily ETL as a single schedulable job — what any orchestrator
(Airflow, cron, Dagster) invokes.

Replaces the reference's 9 PythonOperator tasks + /tmp-CSV + XCom handoffs
(dags/music_streaming_services_dag.py:378-455) with ONE Spark job: sources →
validate → transform → idempotent partition-overwrite load. Retries and
scheduling (reference :361-375 — retries=1, 5-min delay, daily) belong to
the orchestrator config, not the engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.pipeline import PipelineResult, run_pipeline
from ..schemas import SONGS, STREAMS_RAW
from ..sources import read_csv_dir


def run_daily(
    spark: SparkSession,
    streams_path: str,
    songs_path: str,
    warehouse_dir: str,
) -> PipelineResult:
    """One dated run: read the day's stream drops + the songs dimension,
    compute both KPI tables, upsert the touched date partitions."""
    streams = read_csv_dir(spark, streams_path, STREAMS_RAW)
    songs = read_csv_dir(spark, songs_path, SONGS)
    return run_pipeline(spark, streams, songs, warehouse_dir=warehouse_dir)
