"""The analytical core: the reference's two KPI tables, Spark-first.

Reference: `transform_and_compute_kpis`,
dags/music_streaming_services_dag.py:140-244. Semantics preserved per
SURVEY §8 (null group keys, join fan-out, tie-breaks), implementation
re-designed for Spark:

- J1 streams⋈songs is a **broadcast hash join** (songs is a dimension,
  ~114k rows in the reference) — no shuffle of the 100 TB fact side.
- A2/O2 "most popular per group" use window ``row_number`` with an explicit
  deterministic tie-break instead of the reference's sort-whole-table +
  head(1) (reference :218-220) — avoids a global sort and makes results
  partition-order independent.
- A1/A3/A4 are single-pass hash aggregates with map-side partials;
  ``countDistinct`` is the exact two-phase expansion (the 100-TB variant
  ``approx_unique_listeners`` is provided alongside).

All functions are pure DataFrame→DataFrame and lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.datetime import event_date, event_hour, lenient_timestamp

# Columns of the songs dimension actually consumed downstream. The reference
# carries all 21 through the join (dags/music_streaming_services_dag.py:159);
# Catalyst prunes automatically, but selecting early keeps the broadcast
# build side small by construction.
_SONG_COLS = ("track_id", "track_name", "artists", "track_genre", "duration_ms", "popularity")


def _ranked_dim(songs: DataFrame) -> DataFrame:
    """The pruned songs dimension + ``_pop_rank``: the genre-KPI argmax
    tie-break (popularity DESC nulls-last, track_name ASC, track_id ASC)
    pre-encoded as ONE dense integer over the dim rows. r15 perf: with the
    tie-break a numeric column, the fact-side argmax becomes min(_pop_rank)
    — a plain HASH aggregate with map-side partials — instead of
    min_by(track_name, struct(...)), whose string-bearing buffer forces
    Spark into SortAggregate (sort per task). The single-partition window
    is safe by construction: songs is the broadcast dimension (the join
    below ships it to every executor whole). Rank ties (rows identical on
    all three keys) are harmless: tied rows carry the same track_name, so
    whichever rank the argmax lands on resolves to the same output."""
    dim = songs.select(*[c for c in _SONG_COLS if c in songs.columns])
    if not {"popularity", "track_name", "track_id"} <= set(dim.columns):
        return dim  # degenerate schemas keep the legacy path
    w = Window.orderBy(
        F.desc_nulls_last("popularity"), F.asc("track_name"), F.asc("track_id")
    )
    return dim.withColumn("_pop_rank", F.row_number().over(w))


def song_rank_lookup(songs: DataFrame) -> DataFrame | None:
    """(_pop_rank, most_popular_track): the broadcast join-back relation
    that turns the aggregated min(_pop_rank) into the argmax track name.
    MUST be built from the same songs frame as ``enrich_streams`` so both
    sides assign identical ranks (the window order is total up to rows
    that agree on every key, which resolve to the same name).

    Returns ``None`` for degenerate dim schemas (missing popularity/
    track_name/track_id — _ranked_dim can't rank them): callers'
    ``rank_lookup is not None`` guard then falls back to the min_by
    path, instead of this select raising at plan time (r15 advice)."""
    ranked = _ranked_dim(songs)
    if "_pop_rank" not in ranked.columns:
        return None
    return ranked.select(
        "_pop_rank", F.col("track_name").alias("most_popular_track")
    )


def enrich_streams(streams_raw: DataFrame, songs: DataFrame) -> DataFrame:
    """P3/P4 parse + J1 left broadcast join + P5/P6 date/hour derivation.

    Reference: dags/music_streaming_services_dag.py:155-163 (parse/derive),
    :159 (merge how='left' on track_id). Songs may repeat track_id across
    genres — the fan-out is load-bearing (SURVEY §8.5): do NOT dedup songs.
    The joined dim additionally carries ``_pop_rank`` (see _ranked_dim);
    consumers that don't use it prune it at zero cost.
    """
    # schema-aware parse: only string inputs need the lenient coerce path —
    # a typed timestamp column (e.g. from parquet) skips the round-trip,
    # which is ~25% of the whole plan's time at sf0.1.
    if dict(streams_raw.dtypes).get("listen_time") == "string":
        parsed = streams_raw.withColumn("listen_time", lenient_timestamp("listen_time"))
    else:
        parsed = streams_raw
    dim = _ranked_dim(songs)
    return (
        parsed.join(F.broadcast(dim), "track_id", "left")
        .withColumn("date", event_date("listen_time"))
        .withColumn("hour", event_hour("listen_time"))
    )


def genre_kpis(enriched: DataFrame, rank_lookup: DataFrame | None = None) -> DataFrame:
    """Daily genre KPIs (A1 + A2 + J2 + P2).

    Reference: dags/music_streaming_services_dag.py:166-190 computes this as
    groupby-agg + per-group idxmax + merge (two passes over the joined fact
    plus a join). Since round 2 the registered query executes the
    single-aggregate plan (``genre_kpis_onepass``): the argmax folds into the
    same hash aggregate via ``min_by``, so the fact side is scanned and
    shuffled exactly once — the two-pass formulation was measured at ~2x the
    single-pass even with the shared relation cached, because the window
    branch re-shuffles every fact row while ``min_by`` ships only map-side
    partials. The literal two-pass shape is retained as
    ``genre_kpis_window_form`` and pinned row-identical in tests.
    """
    return genre_kpis_onepass(enriched, rank_lookup)


def genre_kpis_window_form(enriched: DataFrame) -> DataFrame:
    """The reference-shaped two-pass formulation (agg + window argmax + join),
    kept as an independent implementation that cross-checks
    ``genre_kpis_onepass`` in tests.

    Plan note: the agg branch and the window branch both consume the filtered
    join output, and per-branch column pruning makes their exchange subtrees
    non-identical (so exchange reuse can't dedup them). Caching the shared
    relation computes the scan + broadcast join once; both branches read the
    cached blocks. StorageLevel MEMORY_AND_DISK spills instead of OOMing on
    executors at scale, and the columns cached are pre-pruned to the six the
    two branches need.
    """
    from pyspark import StorageLevel

    base = (
        enriched.filter(F.col("date").isNotNull() & F.col("track_genre").isNotNull())
        .select(
            "date", "track_genre", "track_id", "track_name", "duration_ms", "popularity"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    agg = base.groupBy("date", "track_genre").agg(
        F.count("track_id").alias("listen_count"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.avg("popularity").alias("popularity_index"),
    )

    # A2 — argmax(popularity) per (date, genre). Reference idxmax takes the
    # first row in input order (nondeterministic under parallel input);
    # we pin the tie-break: higher popularity, then track_name asc,
    # then track_id asc.
    w = Window.partitionBy("date", "track_genre").orderBy(
        F.desc_nulls_last("popularity"), F.asc("track_name"), F.asc("track_id")
    )
    top = (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "date",
            "track_genre",
            F.col("track_name").alias("most_popular_track"),
            F.col("popularity").cast("double").alias("most_popular_track_popularity"),
        )
    )

    return agg.join(top, ["date", "track_genre"], "left").select(
        "date",
        "track_genre",
        "listen_count",
        "avg_duration_ms",
        "popularity_index",
        "most_popular_track",
        "most_popular_track_popularity",
    )


def genre_kpis_onepass(
    enriched: DataFrame, rank_lookup: DataFrame | None = None
) -> DataFrame:
    """Single-aggregation formulation of genre_kpis — the plan you want at
    100 TB.

    The window+join formulation (``genre_kpis``) scans the joined fact table
    twice and shuffles three times (agg, window, join). Folding the argmax
    into the same aggregate keeps it to one scan and ONE fact shuffle.

    r15 perf: when ``rank_lookup`` (see ``song_rank_lookup``) is supplied
    and the enriched frame carries ``_pop_rank``, the argmax runs as
    ``min(_pop_rank)`` — every aggregation buffer column is numeric, so the
    plan is a true HashAggregate with map-side partials — and the track
    name comes back via a broadcast join against the rank lookup. The
    previous ``min_by(track_name, struct(...))`` fold is kept as the
    fallback for callers without the dim at hand: its string-bearing
    buffer forces SortAggregate (a per-task sort), measured ~2x slower at
    sf0.1 (1.7s -> 0.8s). Both reproduce the exact window tie-break
    (popularity desc nulls-last, track_name, track_id): same rows, same
    oracle.
    """
    base = enriched.filter(F.col("date").isNotNull() & F.col("track_genre").isNotNull())
    if rank_lookup is not None and "_pop_rank" in enriched.columns:
        agg = base.groupBy("date", "track_genre").agg(
            F.count("track_id").alias("listen_count"),
            F.avg("duration_ms").alias("avg_duration_ms"),
            F.avg("popularity").alias("popularity_index"),
            F.min("_pop_rank").alias("_pop_rank"),
            F.max("popularity").cast("double").alias("most_popular_track_popularity"),
        )
        return agg.join(F.broadcast(rank_lookup), "_pop_rank").select(
            "date",
            "track_genre",
            "listen_count",
            "avg_duration_ms",
            "popularity_index",
            "most_popular_track",
            "most_popular_track_popularity",
        )
    # NULL popularity must sort LAST (the window form orders desc_nulls_last);
    # a bare -popularity would put the NULL struct field first in ascending
    # struct comparison and silently flip the argmax on null-bearing data —
    # coalesce to a +inf-like sentinel so both formulations agree.
    order = F.struct(
        F.coalesce(-F.col("popularity"), F.lit(9.0e18)).alias("neg_pop"),
        F.col("track_name"),
        F.col("track_id"),
    )
    return base.groupBy("date", "track_genre").agg(
        F.count("track_id").alias("listen_count"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.avg("popularity").alias("popularity_index"),
        F.min_by("track_name", order).alias("most_popular_track"),
        F.max("popularity").cast("double").alias("most_popular_track_popularity"),
    )


def hourly_kpis(enriched: DataFrame, approx: bool = False) -> DataFrame:
    """Hourly KPIs (A3 + P7 + A4 + O2-as-window + J3 + P1).

    Reference: dags/music_streaming_services_dag.py:204-233. Unmatched
    streams (null artists) stay in the totals but are excluded from the
    per-artist counts (SURVEY §8.2). ``approx=True`` swaps exact
    countDistinct for HLL ``approx_count_distinct`` — the 100 TB variant
    where exact distinct's two-phase expansion dominates the stage.
    """
    base = enriched.filter(F.col("date").isNotNull())
    d_users = (
        F.approx_count_distinct("user_id") if approx else F.countDistinct("user_id")
    )
    d_tracks = (
        F.approx_count_distinct("track_id") if approx else F.countDistinct("track_id")
    )

    hourly = base.groupBy("date", "hour").agg(
        d_users.alias("unique_listeners"),
        F.count("track_id").alias("total_plays"),
        d_tracks.alias("unique_tracks"),
    ).withColumn(
        "track_diversity_index",
        (F.col("unique_tracks") / F.col("total_plays")).cast("double"),
    )

    # A4 + O1/O2 — top artist per (date, hour): count plays per artist,
    # take the top-1 by play_count desc with the reference's effective
    # tie-break (artists asc — pandas stable sort over groupby-sorted keys,
    # SURVEY §8.3).
    plays = (
        base.filter(F.col("artists").isNotNull())
        .groupBy("date", "hour", "artists")
        .agg(F.count("track_id").alias("play_count"))
    )
    w = Window.partitionBy("date", "hour").orderBy(F.desc("play_count"), F.asc("artists"))
    top_artists = (
        plays.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("date", "hour", F.col("artists").alias("top_artist"))
    )

    return hourly.join(top_artists, ["date", "hour"], "left").select(
        "date", "hour", "unique_listeners", "top_artist", "track_diversity_index"
    )


def hourly_kpis_fast(enriched: DataFrame, approx: bool = False) -> DataFrame:
    """hourly_kpis with the top-artist window replaced by a second-level
    ``min_by`` aggregate: the (date, hour, artists) play counts fold into
    (date, hour) with the argmax inside the aggregate — no per-partition
    sort, and the second shuffle carries only one row per artist-hour.
    Same rows, same oracle."""
    base = enriched.filter(F.col("date").isNotNull())
    d_users = (
        F.approx_count_distinct("user_id") if approx else F.countDistinct("user_id")
    )
    d_tracks = (
        F.approx_count_distinct("track_id") if approx else F.countDistinct("track_id")
    )
    hourly = base.groupBy("date", "hour").agg(
        d_users.alias("unique_listeners"),
        F.count("track_id").alias("total_plays"),
        d_tracks.alias("unique_tracks"),
    ).withColumn(
        "track_diversity_index",
        (F.col("unique_tracks") / F.col("total_plays")).cast("double"),
    )
    top_artists = (
        base.filter(F.col("artists").isNotNull())
        .groupBy("date", "hour", "artists")
        .agg(F.count("track_id").alias("play_count"))
        .groupBy("date", "hour")
        .agg(
            F.min_by(
                "artists",
                F.struct((-F.col("play_count")).alias("neg_plays"), F.col("artists")),
            ).alias("top_artist")
        )
    )
    return hourly.join(top_artists, ["date", "hour"], "left").select(
        "date", "hour", "unique_listeners", "top_artist", "track_diversity_index"
    )


def compute_kpis(streams_raw: DataFrame, songs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full transform parity: (genre_kpis, hourly_kpis) from raw inputs."""
    enriched = enrich_streams(streams_raw, songs)
    return genre_kpis(enriched, song_rank_lookup(songs)), hourly_kpis(enriched)
