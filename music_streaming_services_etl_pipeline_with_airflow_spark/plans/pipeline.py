"""The end-to-end ETL pipeline — the reference DAG
(dags/music_streaming_services_dag.py:378-455) as driver control flow.

Airflow task boundaries (9 subprocess hops with /tmp-CSV + XCom handoffs,
SURVEY §3.1) collapse into ONE lazy Spark job graph: the only materialization
points are the two warehouse writes; everything between is pipelined through
Catalyst with exactly two shuffles (the A1 and A3 aggregations — J1 is a
broadcast join).

Control flow preserved (C1-C3): empty-input short-circuit, required-column
validation branch. Retries/schedule (C6) belong to the orchestrator, not
the engine; any scheduler (Airflow SparkSubmitOperator, cron) can call
``run_pipeline``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .. import sinks
from ..operators import kpis, validate
from ..schemas import REQUIRED_COLUMNS


@dataclass
class PipelineResult:
    status: str  # "ok" | "no_input" | "invalid_columns"
    missing: dict[str, set[str]] = field(default_factory=dict)
    genre_kpis: DataFrame | None = None
    hourly_kpis: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    streams: DataFrame,
    songs: DataFrame,
    users: DataFrame | None = None,
    warehouse_dir: str | None = None,
) -> PipelineResult:
    """validate → transform → (optionally) persist, mirroring the DAG:

    1. C1 input-presence probe (reference :15-23) — empty streams ends the run
    2. C2 required-column validation (:92-137) — missing columns end the run
    3. transform_and_compute_kpis (:140-244) — the two KPI tables
    4. idempotent partition-overwrite persistence (fixes SURVEY §8.6)
    """
    # C1 — existence probe. isEmpty() is a limit-1 scan, not a full count.
    if streams.isEmpty():
        return PipelineResult(status="no_input")

    # C2 — schema contracts
    contracts = {"streams": REQUIRED_COLUMNS["streams"], "songs": REQUIRED_COLUMNS["songs"]}
    dfs = {"streams": streams, "songs": songs}
    if users is not None:
        contracts["users"] = REQUIRED_COLUMNS["users"]
        dfs["users"] = users
    missing = validate.validate_required_columns(dfs, contracts)
    if missing:
        return PipelineResult(status="invalid_columns", missing=missing)

    genre, hourly = kpis.compute_kpis(streams, songs)

    if warehouse_dir:
        sinks.write_warehouse(genre, f"{warehouse_dir}/genre_kpis", ("date",))
        sinks.write_warehouse(hourly, f"{warehouse_dir}/hourly_kpis", ("date",))

    return PipelineResult(status="ok", genre_kpis=genre, hourly_kpis=hourly)
