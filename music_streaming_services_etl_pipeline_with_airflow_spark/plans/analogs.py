"""Reference-operator queries on the driver testdata, each with a DuckDB
oracle.

The reference domain (streams/users/songs — SURVEY §1.2) maps onto the
driver's TPC-H-ish tables (FIXTURES.md §mapping):

Genre-KPI domain (fact ⋈ dimension):
    streams := lineitem  (user_id := l_suppkey, track_id := l_partkey,
                          listen_time := l_shipdate)
    songs   := part      (track_name := p_name, artists := p_brand,
                          track_genre := p_type,
                          duration_ms := p_size*1000  [integer → exact sums],
                          popularity  := floor(p_retailprice) [integer])

Hourly-KPI domain (event stream ⋈ user dimension):
    streams := events    (listen_time := ts, track_id := event_type)
    artists := customer.c_mktsegment via user_id = c_custkey

Integer-valued measures are chosen deliberately: double sums over integers
are exact, so Spark's partial aggregation order cannot diverge from DuckDB's
sequential sum — the order-insensitive value hash matches bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import kpis, validate
from ..sources import load_table, read_csv_dir
from .registry import register

# --------------------------------------------------------------------------
# Shared frame builders (Spark side)
# --------------------------------------------------------------------------


def streams_songs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """lineitem/part reshaped into the reference's streams/songs schemas."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    streams = li.select(
        F.col("l_suppkey").alias("user_id"),
        F.col("l_partkey").cast("string").alias("track_id"),
        F.col("l_shipdate").cast("string").alias("listen_time"),  # P3: arrives as string
    )
    songs = part.select(
        F.col("p_partkey").cast("string").alias("track_id"),
        F.col("p_name").alias("track_name"),
        F.col("p_brand").alias("artists"),
        F.col("p_type").alias("track_genre"),
        (F.col("p_size") * 1000).cast("long").alias("duration_ms"),
        F.floor("p_retailprice").cast("long").alias("popularity"),
    )
    return streams, songs


def enriched_genre(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams, songs = streams_songs(spark, sf_dir)
    return kpis.enrich_streams(streams, songs)


def enriched_genre_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same relation as enriched_genre but keeps l_shipdate as a native
    timestamp (no string round-trip) — the typed-source fast path the
    one-pass flagship uses; values are identical."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    streams = li.select(
        F.col("l_suppkey").alias("user_id"),
        F.col("l_partkey").cast("string").alias("track_id"),
        F.col("l_shipdate").alias("listen_time"),
    )
    songs = part.select(
        F.col("p_partkey").cast("string").alias("track_id"),
        F.col("p_name").alias("track_name"),
        F.col("p_brand").alias("artists"),
        F.col("p_type").alias("track_genre"),
        (F.col("p_size") * 1000).cast("long").alias("duration_ms"),
        F.floor("p_retailprice").cast("long").alias("popularity"),
    )
    return kpis.enrich_streams(streams, songs)


def enriched_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer with the hourly-KPI column contract."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("artists"))
    return (
        ev.select("user_id", F.col("event_type").alias("track_id"), F.col("ts").alias("listen_time"))
        .join(F.broadcast(dim), "user_id", "left")
        .withColumn("date", F.to_date("listen_time"))
        .withColumn("hour", F.hour("listen_time").cast("long"))
    )


# --------------------------------------------------------------------------
# Shared CTEs (DuckDB side) — mirror the builders above expression-for-
# expression so both engines compute the same values.
# --------------------------------------------------------------------------

ENRICHED_GENRE_CTE = """
enriched AS (
    SELECT CAST(l_shipdate AS DATE)         AS date,
           l_suppkey                        AS user_id,
           CAST(l_partkey AS VARCHAR)       AS track_id,
           p_name                           AS track_name,
           p_brand                          AS artists,
           p_type                           AS track_genre,
           CAST(p_size * 1000 AS BIGINT)    AS duration_ms,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS popularity
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
)"""

ENRICHED_HOURLY_CTE = """
enriched AS (
    SELECT e.user_id                        AS user_id,
           e.event_type                     AS track_id,
           c.c_mktsegment                   AS artists,
           CAST(e.ts AS DATE)               AS date,
           CAST(EXTRACT(HOUR FROM e.ts) AS BIGINT) AS hour
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
)"""

GENRE_KPIS_SQL = f"""
WITH {ENRICHED_GENRE_CTE},
base AS (SELECT * FROM enriched WHERE date IS NOT NULL AND track_genre IS NOT NULL),
agg AS (
    SELECT date, track_genre,
           COUNT(track_id)  AS listen_count,
           AVG(duration_ms) AS avg_duration_ms,
           AVG(popularity)  AS popularity_index
    FROM base GROUP BY date, track_genre
),
ranked AS (
    SELECT date, track_genre, track_name, popularity,
           ROW_NUMBER() OVER (PARTITION BY date, track_genre
                              ORDER BY popularity DESC, track_name ASC, track_id ASC) AS rn
    FROM base
),
top AS (
    SELECT date, track_genre,
           track_name AS most_popular_track,
           CAST(popularity AS DOUBLE) AS most_popular_track_popularity
    FROM ranked WHERE rn = 1
)
SELECT agg.date, agg.track_genre, listen_count, avg_duration_ms, popularity_index,
       most_popular_track, most_popular_track_popularity
FROM agg LEFT JOIN top ON agg.date = top.date AND agg.track_genre = top.track_genre
"""

HOURLY_KPIS_SQL = f"""
WITH {ENRICHED_HOURLY_CTE},
base AS (SELECT * FROM enriched WHERE date IS NOT NULL),
hourly AS (
    SELECT date, hour,
           COUNT(DISTINCT user_id)  AS unique_listeners,
           COUNT(track_id)          AS total_plays,
           COUNT(DISTINCT track_id) AS unique_tracks
    FROM base GROUP BY date, hour
),
plays AS (
    SELECT date, hour, artists, COUNT(track_id) AS play_count
    FROM base WHERE artists IS NOT NULL GROUP BY date, hour, artists
),
top AS (
    SELECT date, hour, artists AS top_artist
    FROM (SELECT date, hour, artists,
                 ROW_NUMBER() OVER (PARTITION BY date, hour
                                    ORDER BY play_count DESC, artists ASC) AS rn
          FROM plays) WHERE rn = 1
)
SELECT h.date, h.hour, h.unique_listeners, t.top_artist,
       CAST(h.unique_tracks AS DOUBLE) / h.total_plays AS track_diversity_index
FROM hourly h LEFT JOIN top t ON h.date = t.date AND h.hour = t.hour
"""


# --------------------------------------------------------------------------
# Full-pipeline queries (the flagship + its hourly sibling)
# --------------------------------------------------------------------------


@register(
    "genre_kpis_daily",
    GENRE_KPIS_SQL,
    doc="Full genre-KPI pipeline analog: J1 broadcast join + A1 multi-agg "
    "+ A2 argmax (reference dags/music_streaming_services_dag.py:159-190). "
    "Since round 2 the argmax executes inside the hash aggregate (min_by) "
    "— single shuffle; since round 5 the flagship reads the TYPED source "
    "directly (parquet timestamps need no parse — the string→"
    "try_to_timestamp round-trip was ~25% of plan time and belongs only "
    "where the input is actually strings). The P4 lenient-parse path stays "
    "registered and oracle-checked as genre_kpis_daily_strparse; the "
    "reference's literal two-pass agg+window+join shape lives on as "
    "kpis.genre_kpis_window_form, pinned row-identical in tests.",
)
def q_genre_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, songs = streams_songs(spark, sf_dir)
    return kpis.genre_kpis(
        enriched_genre_direct(spark, sf_dir), kpis.song_rank_lookup(songs)
    )


@register(
    "genre_kpis_daily_strparse",
    GENRE_KPIS_SQL,  # identical semantics — same oracle
    doc="The P4 parity variant of the flagship: listen_time arrives as a "
    "STRING (the reference's CSV reality, SURVEY §2.8 P3/P4) and goes "
    "through the lenient try_to_timestamp coerce before the identical "
    "min_by plan. Kept as its own oracle-checked entry so the parse "
    "semantics stay pinned while the flagship quotes the typed-source "
    "plan.",
)
def q_genre_kpis_strparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, songs = streams_songs(spark, sf_dir)
    return kpis.genre_kpis(enriched_genre(spark, sf_dir), kpis.song_rank_lookup(songs))


@register(
    "hourly_kpis",
    HOURLY_KPIS_SQL,
    doc="Full hourly-KPI pipeline analog: A3 distinct counts + P7 ratio + "
    "A4 + O1/O2 top-artist window + J3 composite join + P1 projection "
    "(reference dags/music_streaming_services_dag.py:204-233).",
)
def q_hourly_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kpis.hourly_kpis(enriched_hourly(spark, sf_dir))


@register(
    "genre_kpis_daily_onepass",
    GENRE_KPIS_SQL,  # identical semantics — same oracle as the window form
    doc="Single-shuffle formulation of the genre KPIs: argmax folded into "
    "the hash aggregate via min_by over an ordering struct — one scan, one "
    "shuffle, no window, no self-join. The 100 TB plan; oracle-equal to "
    "the window+join formulation.",
)
def q_genre_kpis_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, songs = streams_songs(spark, sf_dir)
    return kpis.genre_kpis_onepass(
        enriched_genre_direct(spark, sf_dir), kpis.song_rank_lookup(songs)
    )


@register(
    "genre_kpis_daily_twopass",
    GENRE_KPIS_SQL,  # identical semantics — same oracle as the folded form
    doc="The reference's literal two-pass plan shape (groupby-agg + window "
    "argmax + join, dags/music_streaming_services_dag.py:166-190) kept "
    "registered and oracle-checked for plan-parity evidence; the flagship "
    "genre_kpis_daily runs the folded single-aggregate plan, which is ~2x "
    "faster (the window branch re-shuffles every fact row).",
)
def q_genre_kpis_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kpis.genre_kpis_window_form(enriched_genre(spark, sf_dir))


@register(
    "f1_pushdown_filtered_scan",
    """SELECT l_orderkey, l_partkey, CAST(l_shipdate AS DATE) AS ship_date,
              CAST(l_quantity AS BIGINT) AS qty
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         AND l_quantity > 45""",
    doc="Filtered projection whose predicates reach the parquet reader "
    "(PushedFilters on l_shipdate range + l_quantity, ReadSchema pruned to "
    "4 columns) — the pattern that makes a 100 TB scan read only what it "
    "must. Verified via .explain in tests.",
)
def q_f1_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_quantity") > 45)
    ).select(
        "l_orderkey",
        "l_partkey",
        F.to_date("l_shipdate").alias("ship_date"),
        F.col("l_quantity").cast("long").alias("qty"),
    )


@register(
    "hourly_kpis_fast",
    HOURLY_KPIS_SQL,  # identical semantics — same oracle
    doc="hourly_kpis with the top-artist window folded into a second-level "
    "min_by aggregate (no per-partition sort; smaller second shuffle). "
    "Oracle-equal to the window formulation.",
)
def q_hourly_kpis_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kpis.hourly_kpis_fast(enriched_hourly(spark, sf_dir))


@register(
    "a3_hourly_distinct_approx",
    # Error-band oracle (the sketch_topk_monthly_rollup play): the HLL
    # estimate itself is engine-specific, so the checked output carries the
    # EXACT distincts (recomputable in SQL) plus within-band booleans the
    # oracle asserts as literal TRUE. A drifting estimator or a broken band
    # flips a boolean and diverges the hash.
    f"""
    WITH {ENRICHED_HOURLY_CTE},
    base AS (SELECT * FROM enriched WHERE date IS NOT NULL)
    SELECT date, hour,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)  AS exact_listeners,
           CAST(COUNT(DISTINCT track_id) AS BIGINT) AS exact_tracks,
           TRUE AS listeners_within_band,
           TRUE AS tracks_within_band
    FROM base GROUP BY date, hour
    """,
    doc="100-TB variant of A3 as a BAND AUDIT: approx_count_distinct (HLL, "
    "rsd 0.05) and exact countDistinct computed in ONE aggregate over the "
    "enriched hourly relation; the output carries the exact counts plus "
    "|approx-exact| <= max(5, 20% of exact) booleans, which the oracle "
    "recomputes/asserts — converting the formerly rows-only HLL query "
    "into a hash-checked one without hashing estimator internals. The "
    "band is 4x the rsd (measured worst case across sf0.001-0.1: 20% "
    "rel on a 5-distinct group, 10.8% on a 139-distinct one) — per-hour "
    "groups are SMALL-cardinality, where HLL's relative guarantee is at "
    "its weakest and the absolute floor does the work.",
)
def q_hourly_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = enriched_hourly(spark, sf_dir).filter(F.col("date").isNotNull())
    agg = base.groupBy("date", "hour").agg(
        F.countDistinct("user_id").alias("exact_listeners"),
        F.countDistinct("track_id").alias("exact_tracks"),
        F.approx_count_distinct("user_id").alias("_al"),
        F.approx_count_distinct("track_id").alias("_at"),
    )

    def band(est, exact):
        return F.abs(F.col(est).cast("double") - F.col(exact)) <= F.greatest(
            F.lit(5.0), F.col(exact) * 0.20
        )

    return agg.select(
        "date",
        "hour",
        "exact_listeners",
        "exact_tracks",
        band("_al", "exact_listeners").alias("listeners_within_band"),
        band("_at", "exact_tracks").alias("tracks_within_band"),
    )


# --------------------------------------------------------------------------
# Operator micro-queries: scans / control flow
# --------------------------------------------------------------------------


@register(
    "s1_input_presence_probe",
    "SELECT COUNT(*) > 0 AS has_data, COUNT(*) AS n_objects FROM events",
    doc="S1/C1 — existence probe that gates the pipeline (reference "
    "dags/music_streaming_services_dag.py:15-23): empty input short-circuits.",
)
def q_s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    return spark.createDataFrame([(n > 0, n)], "has_data boolean, n_objects long")


def _fixture_fresh(marker: str, sf_dir: str, table: str) -> bool:
    """Staleness guard for /tmp-cached sink fixtures (the _STAGED pattern
    from streaming.runner.stage_events): the cached sink is served ONLY
    when its completion marker is at least as new as the source table —
    regenerating the driver testdata in place invalidates the cache
    instead of silently serving stale shards and diverging the oracle."""
    src = f"{sf_dir.rstrip('/')}/{table}.parquet"
    return os.path.exists(marker) and os.path.getmtime(marker) >= os.path.getmtime(
        src
    )


@register(
    "s2_multifile_csv_union",
    "SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids, "
    "CAST(SUM(event_id) AS BIGINT) AS id_sum FROM events GROUP BY event_type",
    doc="S2/S4/U1 — multi-file CSV ingest: events is written as several CSV "
    "part files, read back as one relation via the multi-path CSV source "
    "(per-file header strip — fixes the reference's header-pollution bug, "
    "SURVEY §8.1), then aggregated to prove lossless union.",
)
def q_s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    tag = os.path.basename(os.path.normpath(sf_dir))
    tmp = f"/tmp/spark_engine_csv/{tag}/events"
    marker = os.path.join(tmp, "_SUCCESS")
    if not _fixture_fresh(marker, sf_dir, "events"):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", F.col("event_type")
        )
        ev.repartition(4).write.mode("overwrite").option("header", True).csv(tmp)
    schema = StructType(
        [StructField("event_id", LongType()), StructField("event_type", StringType())]
    )
    df = read_csv_dir(spark, tmp, schema)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum("event_id").alias("id_sum"),
    )


@register(
    "sink_jsonl_sharded_roundtrip",
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
    "CAST(SUM(event_id) AS BIGINT) AS id_sum FROM events GROUP BY event_type",
    doc="Round-trip through the TRAINING-DELIVERY sink specifically "
    "(src_json_roundtrip covers the plain JSONL source; this covers the "
    "production delivery path): events goes out via "
    "sinks.write_jsonl_sharded (deterministic key-hash shard=NNN/ "
    "partition dirs + atomic _manifest.json) and comes back through "
    "Spark's JSON source with an explicit schema (no inference pass), "
    "reading THROUGH the shard partition layout — aggregates must match "
    "the original relation exactly, proving the delivery is lossless and "
    "complete across shards. pathGlobFilter pins the read to data files; "
    "the underscore-prefixed manifest is invisible to the FileIndex by "
    "convention. At 100 TB this is the dataloader-facing contract: "
    "shards land hash-stable so loaders resume reproducibly.",
)
def q_sink_jsonl_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import sinks

    tag = os.path.basename(os.path.normpath(sf_dir))
    tmp = f"/tmp/spark_engine_jsonl/{tag}/events"
    marker = os.path.join(tmp, "_manifest.json")
    if not _fixture_fresh(marker, sf_dir, "events"):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id"
        )
        sinks.write_jsonl_sharded(ev, tmp, shard_key="event_id", n_shards=8)
    df = (
        spark.read.schema("event_id long, event_type string, user_id long")
        .option("pathGlobFilter", "part-*")
        .json(tmp)
    )
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("event_id").alias("id_sum"),
    )


@register(
    "sink_orc_partitioned_roundtrip",
    "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs, "
    "CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders "
    "WHERE o_orderstatus <> 'P' GROUP BY o_orderstatus",
    doc="ORC format breadth: orders goes out through Spark's native ORC "
    "sink PARTITIONED BY o_orderstatus (Hive-style status=X/ dirs) and "
    "comes back through the ORC source with an explicit schema; the read "
    "filters one partition OUT (<> 'P'), which at plan level is partition "
    "PRUNING — the excluded directory is never opened — and the per-status "
    "aggregates must match the base relation exactly, proving the "
    "columnar roundtrip is lossless including the partition-column "
    "reconstruction (partition values live in dir names, not data files). "
    "Same staleness-guarded /tmp fixture protocol as the CSV/JSONL "
    "roundtrips.",
)
def q_sink_orc_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = os.path.basename(os.path.normpath(sf_dir))
    # NOT src_orc_roundtrip's flat fixture: the layout (Hive-style
    # partition dirs vs flat files) is part of what this query tests, and
    # an mtime-fresh fixture with the WRONG SHAPE would silently satisfy
    # the aggregate — shape gets its own path
    tmp = f"/tmp/spark_engine_orc/{tag}/orders_by_status"
    marker = os.path.join(tmp, "_SUCCESS")
    if not _fixture_fresh(marker, sf_dir, "orders"):
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        )
        orders.write.mode("overwrite").partitionBy("o_orderstatus").orc(tmp)
    # no user schema: partition DISCOVERY types o_orderstatus from the dir
    # names, which is what lets Catalyst classify the <> 'P' filter as a
    # PartitionFilter (pruned at file listing) instead of a row filter —
    # plan-pinned by tests/test_plans_explain.py
    df = spark.read.orc(tmp)
    return (
        df.filter(F.col("o_orderstatus") != "P")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


# --------------------------------------------------------------------------
# Projections / filters / scalar ops (P1-P12)
# --------------------------------------------------------------------------


@register(
    "p1_p2_p3_project_rename_cast",
    "SELECT CAST(p_partkey AS VARCHAR) AS track_id, p_name AS track_name, "
    "p_brand AS artist, CAST(p_size AS BIGINT) AS size_big FROM part",
    doc="P1 projection + P2 rename + P3 cast (reference "
    "dags/music_streaming_services_dag.py:175,187-190,155).",
)
def q_p123(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("track_id"),
        F.col("p_name").alias("track_name"),
        F.col("p_brand").alias("artist"),
        F.col("p_size").cast("long").alias("size_big"),
    )


@register(
    "p4_lenient_timestamp_parse",
    "SELECT event_id, TRY_CAST(props AS TIMESTAMP) AS bad_parse, "
    "CAST(TRY_CAST(CAST(ts AS VARCHAR) AS TIMESTAMP) AS DATE) AS good_parse_date "
    "FROM events",
    doc="P4 — errors='coerce' semantics (reference "
    "dags/music_streaming_services_dag.py:156): malformed strings parse to "
    "null, valid ones round-trip.",
)
def q_p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_to_timestamp("props").alias("bad_parse"),
        F.to_date(F.try_to_timestamp(F.col("ts").cast("string"))).alias("good_parse_date"),
    )


@register(
    "p5_p6_date_hour_extract",
    "SELECT event_id, CAST(ts AS DATE) AS date, "
    "CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour FROM events",
    doc="P5/P6 — date and hour-of-day derivation (reference "
    "dags/music_streaming_services_dag.py:162-163); hour is a clean INT "
    "(fixes SURVEY §8.4 float leak).",
)
def q_p56(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date("ts").alias("date"),
        F.hour("ts").cast("long").alias("hour"),
    )


@register(
    "p7_derived_ratio",
    "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS DOUBLE) / COUNT(*) AS "
    "user_density FROM events GROUP BY event_type",
    doc="P7 — arithmetic derived column (diversity-style ratio, reference "
    "dags/music_streaming_services_dag.py:211).",
)
def q_p7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.countDistinct("user_id").cast("double") / F.count("*")).alias("user_density")
    )


def _part_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part with synthetic nulls (the testdata has none) to exercise the
    null operators; NULLIF is deterministic and SQL-mirrorable."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.nullif(F.col("p_brand"), F.lit("Brand#13")).alias("p_brand"),
        F.nullif(F.col("p_type"), F.lit("SMALL PLATED COPPER")).alias("p_type"),
        "p_size",
    )


_NULLED_PART_CTE = """
nulled AS (
    SELECT p_partkey,
           NULLIF(p_brand, 'Brand#13') AS p_brand,
           NULLIF(p_type, 'SMALL PLATED COPPER') AS p_type,
           p_size
    FROM part
)"""


@register(
    "p9_null_profile",
    f"WITH {_NULLED_PART_CTE} SELECT "
    "COUNT(CASE WHEN p_partkey IS NULL THEN 1 END) AS p_partkey, "
    "COUNT(CASE WHEN p_brand IS NULL THEN 1 END) AS p_brand, "
    "COUNT(CASE WHEN p_type IS NULL THEN 1 END) AS p_type, "
    "COUNT(CASE WHEN p_size IS NULL THEN 1 END) AS p_size FROM nulled",
    doc="P9 — per-column null-count profile (songs_to_rds.py:21,33) as a "
    "single-pass aggregate, not an iterrows loop.",
)
def q_p9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate.null_profile(_part_with_nulls(spark, sf_dir))


@register(
    "p10_rows_with_any_null",
    f"WITH {_NULLED_PART_CTE} SELECT * FROM nulled "
    "WHERE p_partkey IS NULL OR p_brand IS NULL OR p_type IS NULL OR p_size IS NULL",
    doc="P10 — row-wise any-null filter (songs_to_rds.py:25-29) as a "
    "distributed predicate.",
)
def q_p10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate.rows_with_any_null(_part_with_nulls(spark, sf_dir))


@register(
    "p11_null_imputation",
    f"WITH {_NULLED_PART_CTE} SELECT p_partkey, "
    "COALESCE(p_brand, 'Unknown') AS p_brand, "
    "COALESCE(p_type, 'Unknown') AS p_type, p_size FROM nulled",
    doc="P11 — typed constant imputation (songs_to_rds.py:31 fillna; typo "
    "'Unkown' fixed, string columns only — SURVEY §8.7).",
)
def q_p11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate.fill_nulls(_part_with_nulls(spark, sf_dir))


@register(
    "p12_row_count",
    "SELECT COUNT(*) AS n_rows FROM lineitem",
    doc="P12 — row count (dags/music_streaming_services_dag.py:134-136).",
)
def q_p12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count("*").alias("n_rows"))


@register(
    "p8_required_columns_check",
    "SELECT 'lineitem' AS table_name, TRUE AS valid, 0 AS n_missing",
    doc="P8/C2 — required-column contract check (reference "
    "dags/music_streaming_services_dag.py:106-137). Runs the validator on "
    "the real table against its contract and reports the verdict.",
)
def q_p8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    required = {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"}
    miss = validate.missing_columns(li, required)
    return spark.createDataFrame(
        [("lineitem", len(miss) == 0, len(miss))],
        "table_name string, valid boolean, n_missing long",
    )


# --------------------------------------------------------------------------
# Joins (J1) — row-level proof; J2/J3 are inside the pipeline queries
# --------------------------------------------------------------------------


@register(
    "j1_broadcast_left_join",
    f"WITH {ENRICHED_GENRE_CTE} SELECT date, user_id, track_id, track_name, "
    "artists, track_genre, duration_ms, popularity FROM enriched",
    doc="J1 — streams⋈songs left equi-join, broadcast-hash (reference "
    "dags/music_streaming_services_dag.py:159). Row-level output proves the "
    "join itself, not just downstream aggregates.",
)
def q_j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enriched_genre_direct(spark, sf_dir).select(
        "date", "user_id", "track_id", "track_name", "artists",
        "track_genre", "duration_ms", "popularity",
    )


# --------------------------------------------------------------------------
# Aggregations (A1-A4) standalone
# --------------------------------------------------------------------------


@register(
    "a1_group_multi_agg",
    f"""WITH {ENRICHED_GENRE_CTE}
    SELECT date, track_genre, COUNT(track_id) AS listen_count,
           AVG(duration_ms) AS avg_duration_ms, AVG(popularity) AS popularity_index
    FROM enriched WHERE date IS NOT NULL AND track_genre IS NOT NULL
    GROUP BY date, track_genre""",
    doc="A1 — hash group-by with multiple aggregates (reference "
    "dags/music_streaming_services_dag.py:166-170); single-pass, map-side partials.",
)
def q_a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = enriched_genre_direct(spark, sf_dir).filter(
        F.col("date").isNotNull() & F.col("track_genre").isNotNull()
    )
    return base.groupBy("date", "track_genre").agg(
        F.count("track_id").alias("listen_count"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.avg("popularity").alias("popularity_index"),
    )


@register(
    "a2_argmax_per_group",
    f"""WITH {ENRICHED_GENRE_CTE}
    SELECT date, track_genre, track_name AS most_popular_track,
           CAST(popularity AS DOUBLE) AS most_popular_track_popularity
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY date, track_genre
            ORDER BY popularity DESC, track_name ASC, track_id ASC) AS rn
          FROM enriched WHERE date IS NOT NULL AND track_genre IS NOT NULL)
    WHERE rn = 1""",
    doc="A2 — per-group argmax via window row_number with pinned tie-break "
    "(reference idxmax, dags/music_streaming_services_dag.py:172-176; "
    "SURVEY §8.3).",
)
def q_a2(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = enriched_genre_direct(spark, sf_dir).filter(
        F.col("date").isNotNull() & F.col("track_genre").isNotNull()
    )
    w = Window.partitionBy("date", "track_genre").orderBy(
        F.desc("popularity"), F.asc("track_name"), F.asc("track_id")
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "date",
            "track_genre",
            F.col("track_name").alias("most_popular_track"),
            F.col("popularity").cast("double").alias("most_popular_track_popularity"),
        )
    )


@register(
    "a3_hourly_distinct_counts",
    f"""WITH {ENRICHED_HOURLY_CTE}
    SELECT date, hour, COUNT(DISTINCT user_id) AS unique_listeners,
           COUNT(track_id) AS total_plays, COUNT(DISTINCT track_id) AS unique_tracks
    FROM enriched WHERE date IS NOT NULL GROUP BY date, hour""",
    doc="A3 — group-by with exact distinct counts (reference "
    "dags/music_streaming_services_dag.py:204-208); two-phase expansion in "
    "Spark, approx variant provided separately for 100 TB.",
)
def q_a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = enriched_hourly(spark, sf_dir).filter(F.col("date").isNotNull())
    return base.groupBy("date", "hour").agg(
        F.countDistinct("user_id").alias("unique_listeners"),
        F.count("track_id").alias("total_plays"),
        F.countDistinct("track_id").alias("unique_tracks"),
    )


@register(
    "a4_plays_per_artist_hour",
    f"""WITH {ENRICHED_HOURLY_CTE}
    SELECT date, hour, artists, COUNT(track_id) AS play_count
    FROM enriched WHERE date IS NOT NULL AND artists IS NOT NULL
    GROUP BY date, hour, artists""",
    doc="A4 — count per (date, hour, artist) (reference "
    "dags/music_streaming_services_dag.py:214-217); null artists excluded "
    "(SURVEY §8.2).",
)
def q_a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = enriched_hourly(spark, sf_dir).filter(
        F.col("date").isNotNull() & F.col("artists").isNotNull()
    )
    return base.groupBy("date", "hour", "artists").agg(
        F.count("track_id").alias("play_count")
    )


# --------------------------------------------------------------------------
# Sorts / top-k (O1, O2)
# --------------------------------------------------------------------------


@register(
    "o1_multikey_sort",
    f"""WITH {ENRICHED_HOURLY_CTE}
    SELECT date, hour, artists, COUNT(track_id) AS play_count
    FROM enriched WHERE date IS NOT NULL AND artists IS NOT NULL
    GROUP BY date, hour, artists
    ORDER BY date ASC, hour ASC, play_count DESC, artists ASC""",
    doc="O1 — multi-key mixed-direction sort (reference "
    "dags/music_streaming_services_dag.py:218) with a total-order tie-break.",
)
def q_o1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_a4(spark, sf_dir).orderBy(
        F.asc("date"), F.asc("hour"), F.desc("play_count"), F.asc("artists")
    )


@register(
    "o2_top1_per_group",
    f"""WITH {ENRICHED_HOURLY_CTE},
    plays AS (
        SELECT date, hour, artists, COUNT(track_id) AS play_count
        FROM enriched WHERE date IS NOT NULL AND artists IS NOT NULL
        GROUP BY date, hour, artists)
    SELECT date, hour, artists AS top_artist, play_count AS top_artist_plays
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY date, hour
            ORDER BY play_count DESC, artists ASC) AS rn FROM plays)
    WHERE rn = 1""",
    doc="O2 — top-1 per group as a window instead of the reference's global "
    "sort + head(1) (dags/music_streaming_services_dag.py:218-220): no "
    "global sort, partition-local top-k, deterministic ties (SURVEY §8.3).",
)
def q_o2(spark: SparkSession, sf_dir: str) -> DataFrame:
    plays = q_a4(spark, sf_dir)
    w = Window.partitionBy("date", "hour").orderBy(F.desc("play_count"), F.asc("artists"))
    return (
        plays.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "date",
            "hour",
            F.col("artists").alias("top_artist"),
            F.col("play_count").alias("top_artist_plays"),
        )
    )


@register(
    "j4_multiway_dim_rollup",
    """SELECT r_name, n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
              COUNT(*) AS n_items,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name, order_year""",
    doc="Multi-way star join: fact ⋈ orders ⋈ 3 broadcast dims → rollup. "
    "Exercises Catalyst join planning — every dimension side broadcasts, "
    "the fact table shuffles once (orders join) then aggregates.",
)
def q_j4_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name", "n_name", F.year("o_orderdate").cast("long").alias("order_year")
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )


@register(
    "a5_rollup_hierarchy",
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
              CAST(SUM(CAST(FLOOR(c_acctbal) AS BIGINT)) AS BIGINT) AS bal_floor_sum
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
    doc="ROLLUP hierarchy totals (region → nation → grand total) — the OLAP "
    "subtotal shape; one pass, grouping-set expansion inside the aggregate.",
)
def q_a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.floor("c_acctbal").cast("long")).alias("bal_floor_sum"),
        )
    )


@register(
    "a6_pivot_event_matrix",
    """SELECT CAST(ts AS DATE) AS date,
              COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
              COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
              COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
              COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
              COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
       FROM events GROUP BY CAST(ts AS DATE)""",
    doc="Pivot: event-type count matrix per day (wide KPI table). Spark "
    "pivot with an explicit value list = single-pass conditional "
    "aggregation, no second job to discover pivot values.",
)
def q_a6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("date"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# --------------------------------------------------------------------------
# Set ops (U1)
# --------------------------------------------------------------------------


@register(
    "u1_union_all",
    """SELECT event_type, COUNT(*) AS n FROM (
        SELECT event_type FROM events WHERE event_type IN ('click', 'view')
        UNION ALL
        SELECT event_type FROM events WHERE event_type NOT IN ('click', 'view')
    ) GROUP BY event_type""",
    doc="U1 — UNION ALL of homogeneous relations (the reference's multi-file "
    "concat, dags/music_streaming_services_dag.py:31-39) via unionByName.",
)
def q_u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type").isin("click", "view")).select("event_type")
    b = ev.filter(~F.col("event_type").isin("click", "view")).select("event_type")
    return a.unionByName(b).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "src_json_roundtrip",
    "SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum, "
    "MIN(ts) AS ts_min, MAX(ts) AS ts_max, "
    "CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS val_milli_sum "
    "FROM events GROUP BY event_type",
    doc="JSON-lines source fidelity: events written as JSONL (explicit "
    "microsecond timestampFormat — the default truncates to millis) and "
    "read back with an explicit schema (no inference pass), then aggregated; "
    "the oracle aggregates the original parquet, so any loss in the text "
    "round-trip (timestamp precision, double shortest-repr, nulls) breaks "
    "the hash.",
)
def q_src_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    tag = os.path.basename(os.path.normpath(sf_dir))
    tmp = f"/tmp/spark_engine_json/{tag}/events"
    marker = os.path.join(tmp, "_SUCCESS")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        )
        ev.repartition(4).write.mode("overwrite").option(
            "timestampFormat", ts_fmt
        ).json(tmp)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.read.schema(schema).option("timestampFormat", ts_fmt).json(tmp)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("event_id").alias("id_sum"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("val_milli_sum"),
    )


@register(
    "src_orc_roundtrip",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS price_floor_sum, "
    "MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order "
    "FROM orders GROUP BY o_orderpriority",
    doc="ORC source fidelity: orders written to ORC (native vectorized "
    "reader/writer) and read back, then aggregated; the oracle aggregates "
    "the original parquet, proving the columnar round-trip is lossless "
    "across formats.",
)
def q_src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = os.path.basename(os.path.normpath(sf_dir))
    tmp = f"/tmp/spark_engine_orc/{tag}/orders"
    marker = os.path.join(tmp, "_SUCCESS")
    # staleness-guarded like the CSV/JSONL fixtures (ADVICE r7): a bare
    # exists() check would serve stale shards after a testdata regen
    if not _fixture_fresh(marker, sf_dir, "orders"):
        load_table(spark, sf_dir, "orders").repartition(4).write.mode(
            "overwrite"
        ).orc(tmp)
    df = spark.read.orc(tmp)
    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.floor("o_totalprice").cast("long")).alias("price_floor_sum"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )
