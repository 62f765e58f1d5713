from __future__ import annotations

from music_streaming_services_etl_pipeline_with_airflow_spark.operators import validate
from music_streaming_services_etl_pipeline_with_airflow_spark.schemas import REQUIRED_COLUMNS


def test_missing_columns(spark):
    df = spark.createDataFrame([(1, "t")], "user_id long, track_id string")
    assert validate.missing_columns(df, REQUIRED_COLUMNS["streams"]) == {"listen_time"}
    ok = spark.createDataFrame([(1, "t", "x")], "user_id long, track_id string, listen_time string")
    assert validate.missing_columns(ok, REQUIRED_COLUMNS["streams"]) == set()


def test_validate_required_columns_branches(spark):
    good = spark.createDataFrame([(1, "t", "x")], "user_id long, track_id string, listen_time string")
    bad = spark.createDataFrame([(1,)], "user_id long")
    res = validate.validate_required_columns(
        {"streams": bad, "users": good}, {"streams": REQUIRED_COLUMNS["streams"], "users": {"user_id"}}
    )
    assert set(res) == {"streams"}  # C2: pipeline would branch to end


def test_null_profile_and_fill(spark):
    df = spark.createDataFrame(
        [("a", None, 1), (None, None, None)], "s1 string, s2 string, n int"
    )
    prof = {c: v for c, v in zip(df.columns, validate.null_profile(df).collect()[0])}
    assert prof == {"s1": 1, "s2": 2, "n": 1}
    assert validate.rows_with_any_null(df).count() == 2
    filled = validate.fill_nulls(df, "Unknown", numeric_value=0).collect()
    assert filled[1]["s1"] == "Unknown" and filled[1]["n"] == 0
    # string fill must NOT clobber numeric columns with a string (§8.7 fix)
    assert isinstance(filled[1]["n"], int)
