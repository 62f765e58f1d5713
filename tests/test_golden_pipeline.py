"""Reference-domain golden test: the full KPI pipeline from multi-file CSVs
(with every SURVEY §8 edge case) checked against an independent DuckDB
computation over the same files — the correctness harness the reference
never had (SURVEY §5.2)."""

from __future__ import annotations

import os

import duckdb
import pytest

from music_streaming_services_etl_pipeline_with_airflow_spark.operators import kpis
from music_streaming_services_etl_pipeline_with_airflow_spark.schemas import SONGS, STREAMS_RAW
from music_streaming_services_etl_pipeline_with_airflow_spark.sources import read_csv_dir

SONG_COLS = (
    "id,track_id,artists,album_name,track_name,popularity,duration_ms,explicit,"
    "danceability,energy,song_key,loudness,mode,speechiness,acousticness,"
    "instrumentalness,liveness,valence,tempo,time_signature,track_genre"
)


def _song(id_, tid, artist, name, pop, dur, genre):
    return (
        f"{id_},{tid},{artist},Album,{name},{pop},{dur},false,"
        "0.5,0.5,1,-5.0,1,0.1,0.1,0.0,0.2,0.5,120.0,4," + genre
    )


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    streams = str(d / "streams")
    os.makedirs(streams)
    # three files, each with its own header (per-file strip, §8.1)
    batches = [
        [
            "user_id,track_id,listen_time",
            "1,t1,2024-03-01 10:05:00",
            "2,t1,2024-03-01 10:20:00",
            "2,t2,2024-03-01 11:00:00",
            "3,tX,2024-03-01 10:30:00",  # no songs match (§8.2)
            "4,t2,not-a-date",  # malformed (§8.2)
        ],
        [
            "user_id,track_id,listen_time",
            "5,t3,2024-03-01 10:40:00",
            "5,t3,2024-03-01 10:45:00",
            "6,t4,2024-03-01 10:50:00",
            "1,t2,2024-03-02 09:10:00",
            "2,t3,2024-03-02 09:20:00",
        ],
        [
            "user_id,track_id,listen_time",
            "7,t4,2024-03-02 09:30:00",
            "8,t1,2024-03-02 23:59:59",
        ],
    ]
    for i, rows in enumerate(batches):
        with open(f"{streams}/batch_{i}.csv", "w") as f:
            f.write("\n".join(rows) + "\n")
    songs = str(d / "songs")
    os.makedirs(songs)
    rows = [
        SONG_COLS,
        _song(1, "t1", "ArtA", "Song1", 50, 200000, "rock"),
        _song(2, "t1", "ArtA", "Song1", 50, 200000, "pop"),  # fan-out (§8.5)
        _song(3, "t2", "ArtB", "Song2", 50, 100000, "rock"),  # pop tie w/ Song1
        _song(4, "t3", "ArtC", "Song3", 70, 300000, "jazz"),
        _song(5, "t4", "ArtD", "Song4", 30, 150000, "jazz"),
    ]
    with open(f"{songs}/songs.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    return {"streams": streams, "songs": songs}


def _duck(fixture_dir):
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW streams AS
        SELECT user_id, track_id, listen_time
        FROM read_csv('{fixture_dir["streams"]}/*.csv', header=true,
                      columns={{'user_id':'BIGINT','track_id':'VARCHAR','listen_time':'VARCHAR'}})"""
    )
    con.execute(
        f"""CREATE VIEW songs AS
        SELECT * FROM read_csv('{fixture_dir["songs"]}/*.csv', header=true)"""
    )
    con.execute(
        """CREATE VIEW enriched AS
        SELECT CAST(TRY_CAST(s.listen_time AS TIMESTAMP) AS DATE) AS date,
               EXTRACT(HOUR FROM TRY_CAST(s.listen_time AS TIMESTAMP)) AS hour,
               s.user_id, s.track_id,
               g.track_name, g.artists, g.track_genre,
               g.duration_ms, g.popularity
        FROM streams s LEFT JOIN songs g ON s.track_id = g.track_id"""
    )
    return con


def test_genre_kpis_match_duckdb(spark, fixture_dir):
    streams = read_csv_dir(spark, fixture_dir["streams"], STREAMS_RAW)
    songs = read_csv_dir(spark, fixture_dir["songs"], SONGS)
    genre, _ = kpis.compute_kpis(streams, songs)
    got = {
        (str(r.date), r.track_genre): (
            r.listen_count,
            r.avg_duration_ms,
            r.popularity_index,
            r.most_popular_track,
            r.most_popular_track_popularity,
        )
        for r in genre.collect()
    }
    con = _duck(fixture_dir)
    expected_rows = con.execute(
        """
        WITH base AS (SELECT * FROM enriched
                      WHERE date IS NOT NULL AND track_genre IS NOT NULL),
        agg AS (
            SELECT date, track_genre, COUNT(track_id) AS lc,
                   AVG(duration_ms) AS ad, AVG(popularity) AS pi
            FROM base GROUP BY date, track_genre),
        top AS (
            SELECT date, track_genre, track_name, popularity FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY date, track_genre
                    ORDER BY popularity DESC, track_name ASC, track_id ASC) rn
                FROM base) WHERE rn = 1)
        SELECT a.date, a.track_genre, lc, ad, pi, t.track_name, t.popularity
        FROM agg a JOIN top t USING (date, track_genre)
        """
    ).fetchall()
    expected = {
        (str(r[0]), r[1]): (r[2], r[3], r[4], r[5], float(r[6]))
        for r in expected_rows
    }
    assert got == expected
    # §8 invariants: header/malformed rows gone; fan-out counted per genre
    assert ("2024-03-01", "rock") in got
    assert got[("2024-03-01", "rock")][3] == "Song1"  # tie → name asc


def test_hourly_kpis_match_duckdb(spark, fixture_dir):
    streams = read_csv_dir(spark, fixture_dir["streams"], STREAMS_RAW)
    songs = read_csv_dir(spark, fixture_dir["songs"], SONGS)
    _, hourly = kpis.compute_kpis(streams, songs)
    got = {
        (str(r.date), r.hour): (r.unique_listeners, r.top_artist, r.track_diversity_index)
        for r in hourly.collect()
    }
    con = _duck(fixture_dir)
    expected_rows = con.execute(
        """
        WITH base AS (SELECT * FROM enriched WHERE date IS NOT NULL),
        h AS (SELECT date, hour, COUNT(DISTINCT user_id) ul,
                     COUNT(track_id) tp, COUNT(DISTINCT track_id) ut
              FROM base GROUP BY date, hour),
        plays AS (SELECT date, hour, artists, COUNT(track_id) pc FROM base
                  WHERE artists IS NOT NULL GROUP BY date, hour, artists),
        top AS (SELECT date, hour, artists FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY date, hour
                    ORDER BY pc DESC, artists ASC) rn FROM plays) WHERE rn=1)
        SELECT h.date, h.hour, ul, t.artists, CAST(ut AS DOUBLE)/tp
        FROM h LEFT JOIN top t USING (date, hour)
        """
    ).fetchall()
    expected = {(str(r[0]), int(r[1])): (r[2], r[3], r[4]) for r in expected_rows}
    assert got == expected
