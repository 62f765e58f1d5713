"""Explicit StructTypes for every table the engine touches.

The reference re-infers types on every CSV read (pd.read_csv with no dtype
args — reference dags/music_streaming_services_dag.py:101-103,150-152); we pin
schemas for determinism and to skip the inference pass entirely (one less
full scan per CSV source at scale).

Reference-domain schemas follow the DDLs:
- users:  users_to_rds.py:34-41
- songs:  songs_to_rds.py:49-72
- streams: required-column contract dags/music_streaming_services_dag.py:106
- genre_kpis / hourly_kpis: dags/music_streaming_services_dag.py:253-274
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(fields: list[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------- reference
# streams arrive as CSV with listen_time as a *string*; the lenient parse
# (P4) happens in the transform, mirroring the reference's
# to_datetime(errors="coerce") at dags/music_streaming_services_dag.py:156.
STREAMS_RAW = _st(
    [("user_id", LongType()), ("track_id", StringType()), ("listen_time", StringType())]
)

USERS = _st(
    [
        ("user_id", LongType()),
        ("user_name", StringType()),
        ("user_age", IntegerType()),
        ("user_country", StringType()),
        ("created_at", DateType()),
    ]
)

SONGS = _st(
    [
        ("id", LongType()),
        ("track_id", StringType()),
        ("artists", StringType()),
        ("album_name", StringType()),
        ("track_name", StringType()),
        ("popularity", IntegerType()),
        ("duration_ms", LongType()),
        ("explicit", BooleanType()),
        ("danceability", DoubleType()),
        ("energy", DoubleType()),
        ("song_key", IntegerType()),
        ("loudness", DoubleType()),
        ("mode", IntegerType()),
        ("speechiness", DoubleType()),
        ("acousticness", DoubleType()),
        ("instrumentalness", DoubleType()),
        ("liveness", DoubleType()),
        ("valence", DoubleType()),
        ("tempo", DoubleType()),
        ("time_signature", IntegerType()),
        ("track_genre", StringType()),
    ]
)

GENRE_KPIS = _st(
    [
        ("date", DateType()),
        ("track_genre", StringType()),
        ("listen_count", LongType()),
        ("avg_duration_ms", DoubleType()),
        ("popularity_index", DoubleType()),
        ("most_popular_track", StringType()),
        ("most_popular_track_popularity", DoubleType()),
    ]
)

HOURLY_KPIS = _st(
    [
        ("date", DateType()),
        ("hour", IntegerType()),  # reference emits float/VARCHAR; we fix to INT (SURVEY §8.4)
        ("unique_listeners", LongType()),
        ("top_artist", StringType()),
        ("track_diversity_index", DoubleType()),
    ]
)

# Required-column contracts (P8) — dags/music_streaming_services_dag.py:106-112
REQUIRED_COLUMNS = {
    "streams": {"user_id", "track_id", "listen_time"},
    "users": {"user_id", "user_name", "user_age", "user_country", "created_at"},
    "songs": {f.name for f in SONGS.fields},
}

# ---------------------------------------------------------------- testdata
# Driver-generated TPC-H-ish tables (TESTDATA.md). events.ts arrives as
# nanosecond int64 (read via nanosAsLong) and is normalized to timestamp in
# sources.tables.load_table.
EVENTS = _st(
    [
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ]
)

DOCUMENTS = _st(
    [
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ]
)

EMBEDDINGS = _st(
    [
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
