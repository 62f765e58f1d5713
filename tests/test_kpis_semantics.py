"""Golden-semantics tests for the KPI pipeline on tiny literal fixtures —
the SURVEY §8 gotchas the reference encodes implicitly:

- §8.1 header pollution → malformed listen_time rows drop from genre KPIs
- §8.2 null group keys: join-misses excluded from genre KPIs / A4 but
  included in hourly totals
- §8.3 deterministic tie-breaks for argmax and top-artist
- §8.4 hour is a clean INT
- §8.5 join fan-out when a track_id repeats across genres
"""

from __future__ import annotations

import datetime

from music_streaming_services_etl_pipeline_with_airflow_spark.operators import kpis
from music_streaming_services_etl_pipeline_with_airflow_spark.schemas import SONGS, STREAMS_RAW


def _streams(spark):
    rows = [
        # 2 valid plays of t1 (fans out to 2 genres), one of t2, one unmatched,
        # one malformed timestamp, one stray-header artifact row.
        (1, "t1", "2024-03-01 10:05:00"),
        (2, "t1", "2024-03-01 10:20:00"),
        (2, "t2", "2024-03-01 11:00:00"),
        (3, "tX", "2024-03-01 10:30:00"),  # no songs match
        (4, "t2", "not-a-date"),
        (None, "track_id", "listen_time"),  # header-pollution artifact (§8.1)
    ]
    return spark.createDataFrame(rows, STREAMS_RAW)


def _songs(spark):
    base = {
        "album_name": "A", "explicit": False, "danceability": 0.5, "energy": 0.5,
        "song_key": 1, "loudness": -5.0, "mode": 1, "speechiness": 0.1,
        "acousticness": 0.1, "instrumentalness": 0.0, "liveness": 0.2,
        "valence": 0.5, "tempo": 120.0, "time_signature": 4,
    }
    rows = [
        dict(base, id=1, track_id="t1", artists="ArtA", track_name="Song1",
             popularity=50, duration_ms=200000, track_genre="rock"),
        dict(base, id=2, track_id="t1", artists="ArtA", track_name="Song1",
             popularity=50, duration_ms=200000, track_genre="pop"),  # fan-out (§8.5)
        dict(base, id=3, track_id="t2", artists="ArtB", track_name="Song2",
             popularity=50, duration_ms=100000, track_genre="rock"),  # tie w/ Song1
    ]
    return spark.createDataFrame([tuple(r[f.name] for f in SONGS.fields) for r in rows], SONGS)


def test_genre_kpis_semantics(spark):
    genre, hourly = kpis.compute_kpis(_streams(spark), _songs(spark))
    g = {(r["date"], r["track_genre"]): r.asDict() for r in genre.collect()}
    d = datetime.date(2024, 3, 1)

    # fan-out: t1 played twice → rock AND pop each count 2 plays of t1
    assert g[(d, "rock")]["listen_count"] == 3  # 2×t1 + 1×t2
    assert g[(d, "pop")]["listen_count"] == 2
    # join-miss (tX) and malformed/header rows appear in no genre group (§8.1/8.2)
    assert sum(r["listen_count"] for r in g.values()) == 5
    # argmax tie (Song1 pop=50 vs Song2 pop=50) → track_name asc wins (§8.3)
    assert g[(d, "rock")]["most_popular_track"] == "Song1"
    assert g[(d, "rock")]["most_popular_track_popularity"] == 50.0
    assert g[(d, "rock")]["avg_duration_ms"] == (200000 * 2 + 100000) / 3


def test_hourly_kpis_semantics(spark):
    genre, hourly = kpis.compute_kpis(_streams(spark), _songs(spark))
    h = {(r["date"], r["hour"]): r.asDict() for r in hourly.collect()}
    d = datetime.date(2024, 3, 1)

    # hour 10: plays = t1(u1), t1(u2) [×2 genres each after fan-out] + tX(u3)
    # fan-out affects counts: t1 rows duplicate per genre ⇒ 2 plays × 2 + 1 = 5
    row10 = h[(d, 10)]
    assert isinstance(row10["hour"], int)  # §8.4 clean INT not float/VARCHAR
    assert row10["unique_listeners"] == 3  # u1, u2, u3 — unmatched play counts (§8.2)
    # distinct tracks = {t1, tX}; total plays = 5
    assert abs(row10["track_diversity_index"] - 2 / 5) < 1e-12
    assert row10["top_artist"] == "ArtA"  # tX's null artist excluded from A4

    row11 = h[(d, 11)]
    assert row11["unique_listeners"] == 1
    assert row11["top_artist"] == "ArtB"
    # malformed timestamp rows form no (date, hour) group
    assert len([k for k in h if k[0] is None]) == 0


def test_top_artist_tiebreak(spark):
    # two artists with equal play_count in the same hour → asc(artists) wins
    streams = spark.createDataFrame(
        [(1, "a1", "2024-03-01 09:00:00"), (2, "b1", "2024-03-01 09:30:00")],
        STREAMS_RAW,
    )
    songs = _songs(spark).sparkSession.createDataFrame(
        [
            (1, "a1", "Zed", "A", "S1", 10, 1000, False, 0.1, 0.1, 1, -5.0, 1,
             0.1, 0.1, 0.0, 0.1, 0.1, 100.0, 4, "rock"),
            (2, "b1", "Alpha", "A", "S2", 10, 1000, False, 0.1, 0.1, 1, -5.0, 1,
             0.1, 0.1, 0.0, 0.1, 0.1, 100.0, 4, "rock"),
        ],
        SONGS,
    )
    _, hourly = kpis.compute_kpis(streams, songs)
    assert hourly.collect()[0]["top_artist"] == "Alpha"
