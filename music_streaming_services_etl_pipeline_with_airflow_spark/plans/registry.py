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

    return dict(_REGISTRY)


def QUERIES() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v.fn for k, v in all_specs().items()}


def ORACLES() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}
