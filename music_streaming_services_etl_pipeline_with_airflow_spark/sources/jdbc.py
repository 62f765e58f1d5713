"""JDBC table source (S3 in SURVEY §2.1 — the reference's PostgreSQL/MySQL
scans, dags/music_streaming_services_dag.py:53-81).

The reference does cursor ``SELECT * FROM users`` fetchall → DataFrame —
single connection, whole table through one socket. The Spark version
partitions the scan: ``partitionColumn/lowerBound/upperBound/numPartitions``
splits the table into parallel range queries, and Catalyst pushes projected
columns and filters into the generated SQL.

Execution is exercised end-to-end against embedded Derby (bundled with
Spark's jars) in tests/test_jdbc_roundtrip.py — write, then a 4-way
partitioned parallel scan back. Networked engines (Postgres/MySQL/Redshift)
swap in via url/driver options; none is reachable in this container.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
):
    """Configured DataFrameReader for a JDBC table scan.

    With ``partition_column`` (a numeric/date key, e.g. the users table's
    SERIAL PK) the scan runs as ``num_partitions`` concurrent range reads —
    the distributed replacement for the reference's single-cursor fetchall.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC scan needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader
