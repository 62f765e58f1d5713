"""Schema/data validation operators (P8-P12, C2).

Reference: required-column subset checks at
dags/music_streaming_services_dag.py:106-137 (branching, not raising) and
the seeding-time null profile / fillna at songs_to_rds.py:21-33.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_columns(df: DataFrame, required: set[str]) -> set[str]:
    """P8 — required ⊆ columns check; returns the missing set (empty = ok)."""
    return set(required) - set(df.columns)


def validate_required_columns(dfs: dict[str, DataFrame], contracts: dict[str, set[str]]) -> dict[str, set[str]]:
    """C2 — validate every table; {table: missing_cols} for failing tables.

    The caller branches (short-circuits the pipeline) on a non-empty result,
    mirroring the reference's BranchPythonOperator route to
    end_dag_if_columns_missing (dags/music_streaming_services_dag.py:399-409).
    """
    out = {}
    for name, req in contracts.items():
        if name in dfs:
            miss = missing_columns(dfs[name], req)
            if miss:
                out[name] = miss
    return out


def null_profile(df: DataFrame) -> DataFrame:
    """P9 — per-column null counts, one output row (songs_to_rds.py:21,33)."""
    return df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in df.columns]
    )


def rows_with_any_null(df: DataFrame) -> DataFrame:
    """P10 — rows containing ≥1 null (songs_to_rds.py:25-29), as a
    distributed filter instead of the reference's iterrows loop."""
    pred = reduce(or_, [F.col(c).isNull() for c in df.columns])
    return df.filter(pred)


def fill_nulls(df: DataFrame, string_value: str = "Unknown", numeric_value=None) -> DataFrame:
    """P11 — typed per-column fill. The reference fillna("Unkown") (sic,
    songs_to_rds.py:31) hits all columns and would corrupt numeric ones;
    we fill strings with the (typo-fixed) sentinel and numerics separately."""
    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    out = df.na.fill(string_value, subset=str_cols) if str_cols else df
    if numeric_value is not None:
        num_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("int", "bigint", "double", "float", "smallint")
        ]
        if num_cols:
            out = out.na.fill(numeric_value, subset=num_cols)
    return out
