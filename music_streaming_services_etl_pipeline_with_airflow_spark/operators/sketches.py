"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB pattern for incremental uniques: materialize one compact sketch
per partition (day), then answer any coarser rollup — weekly, monthly,
all-time — by UNIONING the stored sketches instead of rescanning the raw
facts. exact countDistinct cannot do this: distincts don't add across
partitions. The sketch relation is a few KB per day regardless of fact
volume.

Estimates are deterministic for a given input set (HLL register updates are
order-independent and the union is commutative), so the rows-only driver
check is stable; accuracy vs exact is pinned by
tests/test_extensions.py::test_hll_daily_rollup_accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table


def daily_user_sketches(ev: DataFrame) -> DataFrame:
    """One HLL sketch of user_id per day — the stored incremental aggregate."""
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )


def rollup_uniques(daily: DataFrame) -> DataFrame:
    """Per-day estimates plus the all-time rollup, computed purely from the
    stored sketches (no rescan of the fact table)."""
    per_day = daily.select(
        F.col("day").cast("string").alias("day"),
        F.hll_sketch_estimate("sk").cast("long").alias("est_uniques"),
    )
    overall = daily.agg(
        F.lit("ALL").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_uniques"),
    )
    return per_day.unionByName(overall)


@register(
    "sketch_daily_uniques_rollup",
    # Error-band oracle: the DataSketches HLL estimate has no DuckDB twin,
    # so the checked output carries the EXACT distincts plus a within-band
    # boolean (|est-exact| <= max(2, 5% of exact); lgConfigK=12 bounds
    # ~2.3%) the oracle asserts as literal TRUE.
    """
    WITH d AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id
               FROM events)
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_uniques,
           TRUE AS within_band
    FROM d GROUP BY day
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM d
    """,
    doc="Mergeable HLL sketches as a BAND AUDIT: per-day user_id sketches "
    "materialized once, then per-day estimates AND the all-time rollup "
    "answered by sketch union — the incremental-uniques pattern that "
    "replaces full rescans at 100 TB. The checked output joins each "
    "estimate to the exact countDistinct and asserts |est-exact| <= "
    "max(2, 5% of exact) — hash-checked without hashing estimator "
    "internals; raw estimates stay available via rollup_uniques (also "
    "pinned by pytest).",
)
def q_sketch_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    est = rollup_uniques(daily_user_sketches(ev))
    per_day = ev.groupBy(F.to_date("ts").cast("string").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_uniques")
    )
    overall = ev.agg(
        F.lit("ALL").alias("day"),
        F.countDistinct("user_id").alias("exact_uniques"),
    )
    exact = per_day.unionByName(overall)
    return est.join(exact, "day").select(
        "day",
        "exact_uniques",
        (
            F.abs(F.col("est_uniques").cast("double") - F.col("exact_uniques"))
            <= F.greatest(F.lit(2.0), F.col("exact_uniques") * 0.05)
        ).alias("within_band"),
    )


KLL_K = 200  # sketch size parameter: ~1.7% max rank error


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw KLL estimate relation (day, p50/p90/p99_milli) — consumed by
    the registered band audit below and the pytest rank-error pin."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    daily = ev.groupBy("day").agg(
        F.expr(f"kll_sketch_agg_bigint(v_milli, {KLL_K})").alias("sk"),
        F.count("*").alias("n_events"),
    )
    probe = [
        F.expr(f"kll_sketch_get_quantile_bigint(sk, {q})").alias(name)
        for q, name in [(0.5, "p50_milli"), (0.9, "p90_milli"), (0.99, "p99_milli")]
    ]
    per_day = daily.select(F.col("day").cast("string").alias("day"), *probe)
    # kll_sketch_merge_bigint is a binary two-sketch merge (not an agg):
    # union the stored sketches by folding it over the collected list —
    # associative, so any merge tree gives the same sketch
    overall = (
        daily.agg(F.collect_list("sk").alias("sks"))
        .select(
            F.lit("ALL").alias("day"),
            F.expr(
                "aggregate(slice(sks, 2, size(sks) - 1), sks[0],"
                " (acc, x) -> kll_sketch_merge_bigint(acc, x))"
            ).alias("sk"),
        )
        .select("day", *probe)
    )
    return per_day.unionByName(overall)


# KLL at k=200 bounds normalized rank error by ~1.65%; the audit band asks
# each estimate to lie between the exact interpolated quantiles at rank
# q ± 0.035 (2x the bound, absorbing interpolation-vs-data-value edge
# effects at small per-day group sizes).
_KLL_BAND = 0.035


@register(
    "sketch_daily_quantiles_rollup",
    # Error-band oracle: the DataSketches KLL estimate has no DuckDB twin,
    # so the checked output carries the EXACT interpolated quantiles plus
    # booleans asserting each KLL probe lies between the exact quantiles
    # at rank q ± 0.035 — the oracle emits literal TRUE.
    """
    WITH d AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                      CAST(FLOOR(value * 1000) AS BIGINT) AS v_milli
               FROM events)
    SELECT day,
           quantile_cont(v_milli, 0.5)  AS p50_exact_milli,
           quantile_cont(v_milli, 0.9)  AS p90_exact_milli,
           quantile_cont(v_milli, 0.99) AS p99_exact_milli,
           TRUE AS p50_within_band,
           TRUE AS p90_within_band,
           TRUE AS p99_within_band
    FROM d GROUP BY day
    UNION ALL
    SELECT 'ALL',
           quantile_cont(v_milli, 0.5),
           quantile_cont(v_milli, 0.9),
           quantile_cont(v_milli, 0.99),
           TRUE, TRUE, TRUE
    FROM d
    """,
    doc="Mergeable KLL quantile sketches (kll_sketch_agg_bigint / "
    "kll_sketch_merge_bigint / kll_sketch_get_quantile_bigint) as a BAND "
    "AUDIT: one sketch of value-millis per day, per-day p50/p90/p99 AND "
    "the all-time quantiles answered by MERGING the stored sketches (a "
    "p99 of p99s is meaningless — KLL merges losslessly within its "
    "~1.7% k=200 rank bound). The checked output joins each probe to the "
    "exact interpolated quantiles and asserts it lies between the exact "
    "quantiles at rank q ± 0.035 — hash-checked without hashing "
    "estimator internals; raw estimates stay available via "
    "q_kll_quantiles (rank error also pinned by pytest).",
)
def q_kll_quantiles_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = q_kll_quantiles(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    qs = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]

    def exact_aggs():
        out = []
        for q, name in qs:
            lo, hi = max(0.0, q - _KLL_BAND), min(1.0, q + _KLL_BAND)
            out += [
                F.percentile("v_milli", q).alias(f"{name}_exact_milli"),
                F.percentile("v_milli", lo).alias(f"_{name}_lo"),
                F.percentile("v_milli", hi).alias(f"_{name}_hi"),
            ]
        return out

    per_day = ev.groupBy("day").agg(*exact_aggs())
    overall = ev.agg(F.lit("ALL").alias("day"), *exact_aggs())
    exact = per_day.unionByName(overall)
    joined = est.join(exact, "day")
    bands = [
        (
            (F.col(f"{n}_milli").cast("double") >= F.col(f"_{n}_lo"))
            & (F.col(f"{n}_milli").cast("double") <= F.col(f"_{n}_hi"))
        ).alias(f"{n}_within_band")
        for _, n in qs
    ]
    return joined.select(
        "day", *[f"{n}_exact_milli" for _, n in qs], *bands
    )


TOPK_SKETCH_K = 20


def topk_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw frequent-items estimates (l_partkey, est_cnt) — consumed by
    the registered guarantee audit below and the pytest containment pin."""
    li = load_table(spark, sf_dir, "lineitem")
    sk = li.agg(F.expr(f"approx_top_k(l_partkey, {TOPK_SKETCH_K}, 4096)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("l_partkey"),
        F.col("e.count").alias("est_cnt"),
    )


@register(
    "sketch_heavy_hitters_topk",
    # Guarantee audit: WHICH keys come back is data-dependent (on
    # near-uniform data above the 4096-entry map the sketch correctly
    # returns NOTHING — there are no heavy hitters; at the tie-heavy toy
    # scales the 20-of-many-tied cut is implementation-defined), so the
    # checked output is the sketch's UNCONDITIONAL contract — at most k
    # items, every estimate bounded by [exact - max(1, N/1000), exact] —
    # asserted as literal TRUE by the oracle at every scale.
    """SELECT TRUE AS returned_at_most_k,
              TRUE AS never_over_counts,
              TRUE AS under_count_bounded""",
    doc="Heavy hitters via approx_top_k (DataSketches frequent-items) as "
    "a GUARANTEE AUDIT: top-20 l_partkey of lineitem from one mergeable "
    "sketch pass, checked against the sketch's unconditional contract — "
    "at most k items return; every estimated count is <= the exact count "
    "(frequent-items over-subtracts, never over-counts) and >= exact - "
    "max(1, N/1000). On near-uniform data above the map capacity the "
    "sketch honestly returns an EMPTY set (no key clears the error "
    "floor, i.e. there are no heavy hitters) — the audit is vacuously "
    "green there, and the stronger exact-top-5 containment is pinned in "
    "pytest at the fixture scale where heavies exist. Raw estimates stay "
    "available via topk_sketch_estimates. The 100 TB pattern for 'most "
    "frequent' over high-cardinality keys: sketch partials merge "
    "associatively, shuffle is a few KB.",
)
def q_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = topk_sketch_estimates(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_partkey").agg(F.count("*").alias("exact_cnt"))
    # N = sum of the per-key exact counts — no third lineitem scan
    n_total = exact.agg(F.sum("exact_cnt")).first()[0] or 0
    floor = max(1, n_total // 1000)
    joined = est.join(exact, "l_partkey", "left")
    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.min(F.col("est_cnt") <= F.col("exact_cnt")), F.lit(True)
        ).alias("no_over"),
        F.coalesce(
            F.min(F.col("est_cnt") >= F.col("exact_cnt") - F.lit(floor)),
            F.lit(True),
        ).alias("bounded"),
    ).first()
    return spark.createDataFrame(
        [
            (
                int(row["n"]) <= TOPK_SKETCH_K,
                bool(row["no_over"]),
                bool(row["bounded"]),
            )
        ],
        "returned_at_most_k boolean, never_over_counts boolean,"
        " under_count_bounded boolean",
    )


@register(
    "sketch_theta_user_overlap",
    # EXACT-UNDER-CAPACITY oracle (the sketch_topk_monthly_rollup play):
    # theta's default nominal 4096 entries exceeds the click/purchase
    # user cardinality at every test scale (15 / 150 / 1500 at
    # sf0.001/0.01/0.1), so the sketch retains every hash and each
    # estimate equals the exact set-op count — SQL-recomputable.
    """
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS est_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS est_purchase,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p))
                AS BIGINT) AS est_both,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
                AS BIGINT) AS est_either,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p))
                AS BIGINT) AS est_click_only
    """,
    doc="Theta sketches with SET OPERATIONS: distinct-user sketches per "
    "event_type, then |click ∩ purchase|, |click ∪ purchase| and "
    "|click \\ purchase| estimated purely from the sketches — the "
    "audience-overlap computation that exact countDistinct cannot answer "
    "from per-segment aggregates (distincts don't intersect). "
    "ORACLE-CHECKED since r7: below theta's 4096-entry nominal capacity "
    "the sketch is lossless, so every estimate equals the exact set-op "
    "count the oracle recomputes (accuracy at any scale additionally "
    "pinned by tests/test_extensions.py::test_theta_overlap_accuracy). "
    "At 100 TB: one sketch per segment, KBs each; any boolean audience "
    "combination answered without rescanning facts.",
)
def q_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sks = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    wide = sks.groupBy().pivot("event_type", ["click", "purchase"]).agg(
        F.first("sk")
    )
    return wide.select(
        F.expr("theta_sketch_estimate(click)").cast("long").alias("est_click"),
        F.expr("theta_sketch_estimate(purchase)").cast("long").alias("est_purchase"),
        F.expr("theta_sketch_estimate(theta_intersection(click, purchase))")
        .cast("long")
        .alias("est_both"),
        F.expr("theta_sketch_estimate(theta_union(click, purchase))")
        .cast("long")
        .alias("est_either"),
        F.expr("theta_sketch_estimate(theta_difference(click, purchase))")
        .cast("long")
        .alias("est_click_only"),
    )


@register(
    "sketch_topk_monthly_rollup",
    # Exact-under-capacity (4096 ≥ customer cardinality at these scales), so
    # the sketch counts equal true counts and the deterministic (count DESC,
    # key ASC) cut makes the rollup SQL-provable. The estimate width (256)
    # comfortably exceeds the boundary tie cohort (≤19 items share the 10th
    # count across sf0.001–sf0.1), so every tie candidate is in the ranked
    # relation before the cut.
    """SELECT o_custkey, CAST(cnt AS BIGINT) AS est_cnt
FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey)
ORDER BY cnt DESC, o_custkey
LIMIT 10""",
    doc="Incremental top-k: per-month approx_top_k_accumulate partial "
    "states over orders' customers, then approx_top_k_combine merges the "
    "stored states and approx_top_k_estimate answers the all-time top-10 "
    "— WITHOUT rescanning the raw orders. Completes the mergeable-sketch "
    "trio (HLL uniques, KLL quantiles, frequent-items top-k). Capacity "
    "(4096) exceeds the customer cardinality here, so the states are "
    "exact and the rollup provably equals the exact top-k — the final cut "
    "ranks a 256-wide exact estimate by (count DESC, custkey ASC), a total "
    "order, which is what lets a plain SQL top-10 serve as the oracle "
    "(also pinned by tests/test_extensions.py::test_topk_monthly_rollup_"
    "exact); at true 100 TB cardinalities the same plan degrades "
    "gracefully to the guaranteed-heavy-hitter subset.",
)
def q_topk_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.expr("approx_top_k_accumulate(o_custkey, 4096)").alias("st"))
    combined = monthly.agg(
        F.expr("approx_top_k_combine(st, 4096)").alias("cst")
    ).select(F.explode(F.expr("approx_top_k_estimate(cst, 256)")).alias("e"))
    ranked = combined.select(
        F.col("e.item").alias("o_custkey"),
        F.col("e.count").alias("est_cnt"),
    )
    # Deterministic cut: estimates are exact under capacity, so ranking by
    # (count DESC, key ASC) — a total order — yields the same 10 rows as
    # the exact SQL top-10 regardless of the sketch's internal tie order.
    w = Window.orderBy(F.desc("est_cnt"), F.asc("o_custkey"))
    return (
        ranked.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 10)
        .select("o_custkey", "est_cnt")
    )
