"""Live JDBC round-trip through embedded Derby (ships with Spark's jars):
jdbc_writer batches rows into a real database table, jdbc_reader scans it
back as 4 parallel range queries. This exercises the actual JDBC execution
path the reference uses against RDS (songs_to_rds.py:77-92,
dags/music_streaming_services_dag.py:53-81) — production drivers
(Postgres/MySQL/Redshift) swap in via the url/driver options only."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.sinks import jdbc_writer
from music_streaming_services_etl_pipeline_with_airflow_spark.sources.jdbc import jdbc_reader

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_write_then_partitioned_read(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/rt_db;create=true"
    df = spark.range(0, 100).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("user_"), F.col("id")).alias("name"),
    )

    jdbc_writer(df, url, "users", batchsize=50, mode="overwrite").option(
        "driver", DERBY_DRIVER
    ).save()

    back = jdbc_reader(
        spark,
        url,
        "users",
        partition_column="user_id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        properties={"driver": DERBY_DRIVER},
    ).load()

    # the partitioned scan really runs as 4 parallel range queries
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_append_accumulates(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/append_db;create=true"
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    w = jdbc_writer(df, url, "t", mode="overwrite").option("driver", DERBY_DRIVER)
    w.save()
    jdbc_writer(df, url, "t", mode="append").option("driver", DERBY_DRIVER).save()
    back = jdbc_reader(spark, url, "t", properties={"driver": DERBY_DRIVER}).load()
    # the reference's COPY-append duplication behavior, reproduced on purpose
    assert back.count() == 20
