"""Declarative data-quality expectations — the dbt-test / Great-Expectations
shape as a single-pass Spark aggregate.

An expectation is (name, violation predicate); the checker evaluates ALL of
them in ONE scan via conditional counts (no per-check jobs, no collect) and
returns a tidy (check_name, n_violations, passed) relation — the gate a 100 TB
ingest runs before publishing a partition, upgrading the reference's
membership-only column check (dags/music_streaming_services_dag.py:106-137)
to value-level contracts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table


def check_expectations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """checks: name → *violation* predicate (true = bad row). One scan."""
    agg = df.agg(
        *[
            F.count(F.when(pred, 1)).alias(name) for name, pred in checks.items()
        ]
    )
    # unpivot to the tidy (check_name, n_violations, passed) shape
    names = list(checks)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return agg.selectExpr(
        f"stack({len(names)}, {stack}) as (check_name, n_violations)"
    ).select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


@register(
    "dq_expectations_lineitem",
    """SELECT check_name, n_violations, n_violations = 0 AS passed FROM (
        SELECT 'quantity_in_range' AS check_name,
               COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'orderkey_not_null',
               COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) FROM lineitem
        UNION ALL
        SELECT 'discount_unit_interval',
               COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) FROM lineitem
        UNION ALL
        SELECT 'shipdate_in_era',
               COUNT(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01 00:00:00'
                          OR l_shipdate >= TIMESTAMP '2030-01-01 00:00:00' THEN 1 END)
        FROM lineitem
        UNION ALL
        SELECT 'returnflag_domain',
               COUNT(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END)
        FROM lineitem)""",
    doc="Declarative value-level data-quality gate: 5 expectations (range, "
    "non-null, unit interval, date era, categorical domain) evaluated in "
    "ONE scan via conditional counts — the pre-publish contract check.",
)
def q_dq_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return check_expectations(
        li,
        {
            "quantity_in_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "orderkey_not_null": F.col("l_orderkey").isNull(),
            "discount_unit_interval": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 1),
            "shipdate_in_era": (F.col("l_shipdate") < "1990-01-01")
            | (F.col("l_shipdate") >= "2030-01-01"),
            "returnflag_domain": ~F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


@register(
    "dq_referential_integrity",
    """SELECT fk, n_orphans, n_orphans = 0 AS passed FROM (
        SELECT 'lineitem.partkey->part' AS fk,
               CAST(COUNT(*) AS BIGINT) AS n_orphans
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        UNION ALL
        SELECT 'lineitem.suppkey->supplier',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        UNION ALL
        SELECT 'orders.custkey->customer',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'events.user_id->customer',
               CAST(COUNT(*) AS BIGINT)
        FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))""",
    doc="Cross-table referential-integrity gate: orphan foreign keys counted "
    "via left-anti joins against broadcast dimension key sets — the "
    "fact-to-dim contract a warehouse checks before publishing. Anti joins "
    "never materialize dim columns; each check is one scan of its fact.",
)
def q_dq_refint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ev = load_table(spark, sf_dir, "events")

    def orphans(fk: str, fact: DataFrame, key: str, dim: DataFrame, dim_key: str):
        n = fact.join(
            F.broadcast(dim), fact[key] == dim[dim_key], "left_anti"
        ).agg(F.count("*").cast("long").alias("n_orphans"))
        return n.select(F.lit(fk).alias("fk"), "n_orphans")

    out = (
        orphans("lineitem.partkey->part", li, "l_partkey", part, "p_partkey")
        .unionByName(
            orphans("lineitem.suppkey->supplier", li, "l_suppkey", supp, "s_suppkey")
        )
        .unionByName(
            orphans("orders.custkey->customer", orders, "o_custkey", cust, "c_custkey")
        )
        .unionByName(
            orphans("events.user_id->customer", ev, "user_id", cust, "c_custkey")
        )
    )
    return out.select("fk", "n_orphans", (F.col("n_orphans") == 0).alias("passed"))


SKEW_TOPN = 10
SKEW_PERMILLE = 5  # a key carrying >= 5 per-mille of the fact rows is hot


@register(
    "dq_join_skew_report",
    f"""WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem),
k AS (SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey)
SELECT key, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 1000 // n.n_rows AS BIGINT) AS share_permille,
       cnt * 1000 >= {SKEW_PERMILLE} * n.n_rows AS is_hot,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rank
      FROM k) CROSS JOIN n
WHERE rank <= {SKEW_TOPN}""",
    doc=f"Join-skew PRE-FLIGHT report: the top-{SKEW_TOPN} heaviest join "
    "keys of the fact table with row counts, per-mille share and a "
    f"hot-key flag (>= {SKEW_PERMILLE} per-mille) — the diagnostic that "
    "decides between a plain shuffle join, AQE skew splitting, and "
    "explicit salting (functions/skew.salted_join) BEFORE the join runs. "
    "Plan: one map-side-combined count per key, then a global top-k "
    "(TakeOrderedAndProject — per-partition heaps, no full sort); share "
    "arithmetic is integer per-mille, engine-exact. At 100 TB the "
    "per-key counts are exactly the aggregate the join's shuffle would "
    "build anyway — this surfaces the histogram for pennies first.",
)
def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    n_rows = li.count()
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    top = k.orderBy(F.desc("cnt"), F.asc("key")).limit(SKEW_TOPN)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "key",
        F.col("cnt").cast("long"),
        F.expr(f"cnt * 1000 div {n_rows}").cast("long").alias("share_permille"),
        (F.col("cnt") * 1000 >= F.lit(SKEW_PERMILLE * n_rows)).alias("is_hot"),
        F.col("rank").cast("long"),
    )
