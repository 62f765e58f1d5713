"""Seeding-path equivalent (SURVEY §3.2): the reference's one-time scripts
``users_to_rds.py`` / ``songs_to_rds.py`` (CSV → null profile → fillna →
CREATE TABLE → chunked executemany) as one lazy Spark flow:

    read_csv_dir(schema) → null profile (log) → typed fill → JDBC batch write

The reference's fillna("Unkown") (sic) hits every column and would corrupt
numerics (SURVEY §8.7); we fill strings with the corrected sentinel and
numerics separately. The chunked executemany (5000/1000 rows per commit,
songs_to_rds.py:87-91, users_to_rds.py:55-59) becomes the JDBC writer's
``batchsize`` with per-partition parallel inserts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .. import sinks
from ..operators import validate
from ..sources import read_csv_dir


@dataclass
class SeedResult:
    cleaned: DataFrame
    null_counts: dict[str, int]
    n_rows: int


def prepare_seed(
    spark: SparkSession,
    csv_path: str,
    schema: StructType,
    string_fill: str = "Unknown",
    numeric_fill=None,
) -> SeedResult:
    """Read + profile + clean; persistence is the caller's jdbc_writer/
    warehouse call (no database reachable in tests)."""
    df = read_csv_dir(spark, csv_path, schema)
    profile = validate.null_profile(df).collect()[0].asDict()
    cleaned = validate.fill_nulls(df, string_fill, numeric_value=numeric_fill)
    return SeedResult(cleaned=cleaned, null_counts=profile, n_rows=cleaned.count())


def seed_to_jdbc(result: SeedResult, url: str, table: str, batchsize: int) -> None:
    """K5 — parallel batched insert (call where a DB is reachable)."""
    sinks.jdbc_writer(result.cleaned, url, table, batchsize=batchsize).save()
