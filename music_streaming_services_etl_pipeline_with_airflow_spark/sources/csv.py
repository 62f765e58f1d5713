"""Multi-file CSV source (S2/S4, U1).

The reference concatenates raw S3 object *texts* with "\\n"
(reference dags/music_streaming_services_dag.py:26-41), which injects every
file-after-the-first's header line as a data row (SURVEY §8.1). Spark's
multi-path CSV reader unions per-file partitions natively and strips each
file's header — the correct semantics, and fully parallel: at 100 TB the
listing is distributed and each file becomes ≥1 input split; there is no
driver-side concat step at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_dir(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    header: bool = True,
) -> DataFrame:
    """Read one or many CSV files/dirs/globs as a single relation.

    Explicit schema (no inference pass — inference would cost a full extra
    scan of 100 TB). Malformed rows follow PERMISSIVE mode: unparseable
    fields become null, mirroring the reference's errors="coerce" end state.
    """
    return (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )
