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


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV read with bad-record quarantine: returns (good, bad).

    Rows that fail the schema land in ``bad`` with their raw text preserved
    (`_corrupt_record`) for a dead-letter sink, instead of silently nulling
    — the operational upgrade over the reference's blind pd.read_csv. The
    split is one scan: the corrupt column is populated by the parser, and
    both filters run off the same cached source.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    schema_q = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType(), True)]
    )
    df = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema_q)
        .csv(path)
    ).cache()  # one scan feeds both branches; corrupt-record filters require it
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad
