"""The analyst SQL surface — the reference's 7 Redshift validation queries
(Documentation.pdf §"SQL Queries for Validating KPIs in Redshift";
SURVEY §2.9), exposed through ``spark.sql`` over temp views — i.e. the
engine's SQL entry point is Spark SQL itself (Catalyst parse → analyze →
optimize → codegen), mirroring how the analyst hits Redshift.

Determinism note: Q2/Q3/Q7 average *double* columns. A float sum's value
depends on addition order, which differs between Spark partial aggregation
and DuckDB sequential scan. The KPI inputs themselves are bit-identical
(integer-derived), so we make the outer mean order-independent by averaging
``FLOOR(x * 1000)`` (exact integer sums, 3 decimal digits preserved) and
dividing once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .analogs import (
    GENRE_KPIS_SQL,
    HOURLY_KPIS_SQL,
    q_genre_kpis_onepass,
    q_hourly_kpis,
)
from .registry import register

# Spark-SQL text (runs over temp views created from the engine's KPI
# DataFrames) and DuckDB oracle text (inlines the KPI computation as a CTE)
# share the query body.

_Q_BODIES = {
    "q1_total_listens_per_genre": (
        # CAST: DuckDB SUM(BIGINT) is HUGEINT; pin both engines to BIGINT.
        "SELECT track_genre, CAST(SUM(listen_count) AS BIGINT) AS total_listen_count "
        "FROM genre_kpis GROUP BY track_genre "
        "ORDER BY total_listen_count DESC, track_genre ASC",
        "genre",
    ),
    "q2_avg_duration_per_genre": (
        "SELECT track_genre, "
        "AVG(FLOOR(avg_duration_ms * 1000)) / 1000.0 AS avg_track_duration_ms "
        "FROM genre_kpis GROUP BY track_genre "
        "ORDER BY avg_track_duration_ms DESC, track_genre ASC",
        "genre",
    ),
    "q3_avg_popularity_per_genre": (
        "SELECT track_genre, "
        "AVG(FLOOR(popularity_index * 1000)) / 1000.0 AS avg_popularity_index "
        "FROM genre_kpis GROUP BY track_genre "
        "ORDER BY avg_popularity_index DESC, track_genre ASC",
        "genre",
    ),
    "q4_most_popular_track_per_day_genre": (
        "SELECT date, track_genre, most_popular_track, most_popular_track_popularity "
        "FROM genre_kpis ORDER BY date, track_genre",
        "genre",
    ),
    "q5_unique_listeners_per_hour": (
        "SELECT date, hour, CAST(SUM(unique_listeners) AS BIGINT) AS total_unique_listeners "
        "FROM hourly_kpis GROUP BY date, hour ORDER BY date, hour",
        "hourly",
    ),
    "q6_top_artist_per_hour": (
        "SELECT date, hour, top_artist FROM hourly_kpis ORDER BY date, hour",
        "hourly",
    ),
    "q7_avg_diversity_per_hour": (
        "SELECT date, hour, "
        "AVG(FLOOR(track_diversity_index * 1000)) / 1000.0 AS avg_track_diversity_index "
        "FROM hourly_kpis GROUP BY date, hour ORDER BY date, hour",
        "hourly",
    ),
}


def _make_query(name: str, body: str, which: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        if which == "genre":
            # one-pass formulation: identical rows, one shuffle (see analogs)
            q_genre_kpis_onepass(spark, sf_dir).createOrReplaceTempView("genre_kpis")
        else:
            q_hourly_kpis(spark, sf_dir).createOrReplaceTempView("hourly_kpis")
        return spark.sql(body)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = (
        f"Redshift validation query (SURVEY §2.9) via spark.sql: {body}"
    )
    return fn


for _name, (_body, _which) in _Q_BODIES.items():
    _cte = GENRE_KPIS_SQL if _which == "genre" else HOURLY_KPIS_SQL
    _view = "genre_kpis" if _which == "genre" else "hourly_kpis"
    _oracle = f"WITH {_view} AS ({_cte}) {_body}"
    register(
        _name,
        _oracle,
        doc=f"SQL surface (spark.sql over temp view {_view}): {_body}",
    )(_make_query(_name, _body, _which))
