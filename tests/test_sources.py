from __future__ import annotations

import os

from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.schemas import STREAMS_RAW
from music_streaming_services_etl_pipeline_with_airflow_spark.sources import (
    load_table,
    read_csv_dir,
)

SF = "/root/testdata/sf0.001"


def test_events_ts_normalized(spark):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0


def test_multifile_csv_strips_headers(spark, tmp_path):
    # two CSV files, each with a header → exactly 3 data rows, no
    # header-pollution rows (the reference's concat bug, SURVEY §8.1)
    d = str(tmp_path / "csvs")
    os.makedirs(d)
    with open(f"{d}/a.csv", "w") as f:
        f.write("user_id,track_id,listen_time\n1,t1,2024-01-01 00:00:00\n")
    with open(f"{d}/b.csv", "w") as f:
        f.write(
            "user_id,track_id,listen_time\n2,t2,2024-01-01 01:00:00\n3,t3,bad\n"
        )
    df = read_csv_dir(spark, d, STREAMS_RAW)
    rows = df.collect()
    assert len(rows) == 3
    assert {r["track_id"] for r in rows} == {"t1", "t2", "t3"}


def test_jdbc_reader_builder(spark):
    from music_streaming_services_etl_pipeline_with_airflow_spark.sources.jdbc import (
        jdbc_reader,
    )

    r = jdbc_reader(
        spark,
        "jdbc:postgresql://host/db",
        "users",
        partition_column="user_id",
        lower_bound=1,
        upper_bound=100000,
        num_partitions=16,
    )
    assert r is not None
    import pytest

    with pytest.raises(ValueError):
        jdbc_reader(spark, "jdbc:postgresql://host/db", "users", partition_column="user_id")
