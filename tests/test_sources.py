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


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from music_streaming_services_etl_pipeline_with_airflow_spark.sources.csv import (
        read_csv_with_quarantine,
    )

    d = str(tmp_path / "q")
    os.makedirs(d)
    with open(f"{d}/data.csv", "w") as f:
        f.write("id,age\n1,30\n2,notanumber\n3,41\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("age", IntegerType())]
    )
    good, bad = read_csv_with_quarantine(spark, d, schema)
    assert {r.id for r in good.collect()} == {1, 3}
    bad_rows = [r._corrupt_record for r in bad.collect()]
    assert bad_rows == ["2,notanumber"]


def test_observe_metrics_without_extra_scan(spark):
    """df.observe: pipeline emits row-count/null-count metrics as a side
    effect of the normal action — no second scan for data-quality counters."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("null_users"),
    )
    n = observed.count()
    assert obs.get["n_rows"] == n and obs.get["null_users"] == 0


def test_stage_events_normalizes_legacy_nanos(tmp_path):
    """stage_events must normalize BOTH physical ts forms to
    timestamp[us, UTC] — including the legacy int64-nanoseconds layout that
    current testdata no longer exercises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.runner import (
        stage_events,
    )

    us = 1704067207179575  # 2024-01-01T00:00:07.179575Z
    legacy = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([us * 1000], pa.int64()),  # nanoseconds
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["play"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    src_dir = tmp_path / "legacy_sf"
    src_dir.mkdir()
    pq.write_table(legacy, src_dir / "events.parquet")

    staged = stage_events(str(src_dir), "events_legacy_test")
    out = pq.read_table(f"{staged}/copy0.v2.parquet")
    t = out.schema.field("ts").type
    assert pa.types.is_timestamp(t) and t.unit == "us" and t.tz == "UTC"
    assert out.column("ts")[0].value == us
