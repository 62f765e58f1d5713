"""Product-analytics query shapes over the event stream — funnels and
retention cohorts, the two workhorse analyses of any event warehouse.
Both are single-scan aggregations (conditional min-timestamps / distinct
date sets per user, then a small regroup) — no self-joins over the fact
table, which is what makes them viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "funnel_signup_click_purchase",
    """WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS stage1_signup,
           COUNT(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                      THEN 1 END) AS stage2_click_after_signup,
           COUNT(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                      AND t_purchase > t_click THEN 1 END) AS stage3_purchase_after_click
    FROM per_user""",
    doc="Ordered funnel (signup → click → purchase): per-user conditional "
    "min-timestamps in one scan, then ordered-stage counts — no event-to-"
    "event self-join, so cost is one shuffle on user_id regardless of "
    "funnel depth.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(s1, 1)).alias("stage1_signup"),
        F.count(F.when(s2, 1)).alias("stage2_click_after_signup"),
        F.count(F.when(s3, 1)).alias("stage3_purchase_after_click"),
    )


@register(
    "retention_weekly_cohorts",
    """WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day FROM events e
    )
    SELECT CAST(date_trunc('week', f.first_day) AS DATE) AS cohort_week,
           CAST((a.day - f.first_day) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY cohort_week, week_offset""",
    doc="Weekly retention cohorts: first-seen week × week-offset active-user "
    "counts. distinct-day activity + broadcast first-seen join; the "
    "triangle every growth dashboard draws.",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            F.to_date(F.date_trunc("week", "first_day")).alias("cohort_week"),
            F.floor(F.datediff("day", "first_day") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "evt_transition_matrix",
    """WITH seq AS (
        SELECT user_id, event_type AS curr,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    c AS (SELECT prev, curr, COUNT(*) AS cnt FROM seq
          WHERE prev IS NOT NULL GROUP BY prev, curr)
    SELECT prev, curr, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt AS DOUBLE)
           / CAST(SUM(cnt) OVER (PARTITION BY prev) AS DOUBLE) AS p
    FROM c""",
    doc="First-order Markov transition matrix over per-user event sequences: "
    "lag within (user, time) order, then a tiny (k x k event types) count "
    "regroup with row-normalized probabilities. One shuffle on user_id + "
    "one on the k^2 pairs; p is a single int/int IEEE division, so it is "
    "engine-exact.",
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("curr"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy("prev", "curr").agg(F.count("*").alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy("prev"))
    return c.select(
        "prev",
        "curr",
        F.col("cnt").cast("long").alias("cnt"),
        (F.col("cnt").cast("double") / total.cast("double")).alias("p"),
    )
