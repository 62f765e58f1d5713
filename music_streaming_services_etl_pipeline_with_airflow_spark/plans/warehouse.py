"""Warehouse-maintenance operators — MERGE INTO (upsert) and SCD Type-2
dimension history, as oracle-checked *relational* queries.

The reference's warehouse load is append-only Redshift COPY
(dags/music_streaming_services_dag.py:317-353), which duplicates rows on
re-run (SURVEY §8.6). A maintained dimension needs two missing shapes:

- **MERGE**: `WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT / keep the
  rest`. Spark SQL's MERGE INTO statement needs a v2 table format
  (Delta/Iceberg); over raw parquet the same semantics are a full-outer
  join on the key — which is also exactly the physical plan a format-native
  MERGE runs. The sink-level twin (``sinks.merge_upsert``) does the
  partition-pruned rewrite; this query is the verified semantics.
- **SCD Type-2**: attribute-change history with ``valid_from`` /
  ``valid_to`` / ``is_current`` — the standard dimension-versioning
  pattern, built from a change stream with lag + running change-count
  (no self-join; one window shuffle per step, both windows share the
  same partitioning key so Catalyst runs them in one exchange).

At 100 TB: both shapes shuffle on the dimension key once; MERGE's
full-outer join broadcasts nothing (both sides are large) but AQE handles
skewed keys; SCD2's windows co-partition on custkey so the sort is local
after a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "merge_upsert_relational",
    """WITH delta AS (
         SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS order_cnt
         FROM orders GROUP BY o_custkey
         UNION ALL
         SELECT o_custkey + 100000 AS k, CAST(COUNT(*) AS BIGINT) AS order_cnt
         FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
       )
       SELECT COALESCE(c.c_custkey, d.k) AS c_custkey,
              COALESCE(c.c_name, 'NEW#' || CAST(d.k AS VARCHAR)) AS c_name,
              COALESCE(c.c_nationkey, -1) AS c_nationkey,
              CASE WHEN c.c_custkey IS NULL THEN 0.0 ELSE c.c_acctbal END AS c_acctbal,
              CASE WHEN c.c_custkey IS NULL THEN 'NEW'
                   WHEN d.k IS NULL THEN c.c_mktsegment
                   ELSE 'ACTIVE' END AS c_mktsegment,
              COALESCE(d.order_cnt, CAST(0 AS BIGINT)) AS order_cnt
       FROM customer c FULL JOIN delta d ON c.c_custkey = d.k""",
    doc="MERGE INTO semantics over parquet: customer dim upserted from an "
    "order-activity delta. The delta's shifted keys (custkey+100000 for "
    "open orders) exercise the NOT-MATCHED-INSERT branch; matched keys "
    "UPDATE (segment->ACTIVE, order_cnt); untouched target rows pass "
    "through. Full-outer join on the key == the physical plan of a "
    "format-native MERGE; sinks.merge_upsert is the partition-pruned "
    "physical twin.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    matched = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("order_cnt")
    )
    inserts = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy((F.col("o_custkey") + 100000).alias("k"))
        .agg(F.count("*").alias("order_cnt"))
    )
    delta = matched.unionByName(inserts)
    j = cust.join(delta, cust.c_custkey == delta.k, "full_outer")
    return j.select(
        F.coalesce(cust.c_custkey, delta.k).alias("c_custkey"),
        F.coalesce(
            cust.c_name, F.concat(F.lit("NEW#"), delta.k.cast("string"))
        ).alias("c_name"),
        F.coalesce(cust.c_nationkey, F.lit(-1)).alias("c_nationkey"),
        F.when(cust.c_custkey.isNull(), F.lit(0.0))
        .otherwise(cust.c_acctbal)
        .alias("c_acctbal"),
        F.when(cust.c_custkey.isNull(), F.lit("NEW"))
        .when(delta.k.isNull(), cust.c_mktsegment)
        .otherwise(F.lit("ACTIVE"))
        .alias("c_mktsegment"),
        F.coalesce(delta.order_cnt, F.lit(0).cast("long")).alias("order_cnt"),
    )


@register(
    "scd2_priority_history",
    """WITH ordered AS (
         SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                LAG(o_orderpriority) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                  AS prev_p
         FROM orders
       ),
       versioned AS (
         SELECT *,
                CAST(SUM(CASE WHEN prev_p IS NULL OR prev_p <> o_orderpriority
                              THEN 1 ELSE 0 END) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
         FROM ordered
       ),
       v AS (
         SELECT o_custkey AS custkey, version,
                o_orderpriority AS priority,
                MIN(o_orderdate) AS valid_from,
                CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM versioned GROUP BY o_custkey, version, o_orderpriority
       )
       SELECT custkey, version, priority, valid_from,
              LEAD(valid_from) OVER
                (PARTITION BY custkey ORDER BY version) AS valid_to,
              CASE WHEN LEAD(valid_from) OVER
                     (PARTITION BY custkey ORDER BY version) IS NULL
                   THEN 1 ELSE 0 END AS is_current,
              n_orders
       FROM v""",
    doc="SCD Type-2 dimension history: per-customer order-priority "
    "versions with valid_from/valid_to/is_current. Change detection via "
    "LAG over (o_orderdate, o_orderkey) total order, version id via "
    "running SUM of change flags, interval close via LEAD — no self-join. "
    "Both window steps partition on custkey, so the whole history builds "
    "in one shuffle.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = orders.withColumn("prev_p", F.lag("o_orderpriority").over(w))
    chg = (
        F.when(
            F.col("prev_p").isNull()
            | (F.col("prev_p") != F.col("o_orderpriority")),
            1,
        )
        .otherwise(0)
    )
    versioned = ordered.withColumn(
        "version",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    v = versioned.groupBy(
        F.col("o_custkey").alias("custkey"),
        "version",
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    wv = Window.partitionBy("custkey").orderBy("version")
    return v.select(
        "custkey",
        "version",
        "priority",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.when(F.lead("valid_from").over(wv).isNull(), 1)
        .otherwise(0)
        .alias("is_current"),
        "n_orders",
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance — exact-aggregate partial/combine contract
# ---------------------------------------------------------------------------


@register(
    "ivm_incremental_daily_kpis",
    """SELECT CAST(ts AS DATE) AS date, event_type,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                AS value_cents
       FROM events GROUP BY 1, 2""",
    doc="Incremental view maintenance for exact aggregates: the daily KPI "
    "view is maintained as mergeable partials (count, integer cent sum) — "
    "the fact stream is split into a base batch and a delta batch (even/odd "
    "event_id, so every group receives rows from both), each aggregated "
    "independently, then COMBINED by summing partials. The oracle is the "
    "full recompute over the union, proving combine(partial(base), "
    "partial(delta)) == recompute — the algebraic property that lets a "
    "100 TB rollup absorb a daily delta without rescanning history. The "
    "exact-aggregate sibling of the sketch accumulate/combine rollups "
    "(operators/sketches.py); avg-style measures derive from the partials "
    "(sum/count) at read time, never stored.",
)
def q_ivm_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.to_date("ts").alias("date"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )

    base = partial(ev.filter(F.col("event_id") % 2 == 0))
    delta = partial(ev.filter(F.col("event_id") % 2 == 1))
    return (
        base.unionByName(delta)
        .groupBy("date", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )


@register(
    "ivm_incremental_join_enrich",
    """SELECT CAST(e.ts AS DATE) AS date,
              COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
                AS value_cents
       FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2""",
    doc="Incremental view maintenance for a JOIN view (SPJ+agg): the "
    "maintained view is events ⋈ customer rolled up to (date, segment). "
    "Under INSERT deltas with a static dimension, such views are "
    "SELF-MAINTAINABLE: only the DELTA joins the dim — history is never "
    "rescanned OR re-joined — and the delta's partials combine into the "
    "stored state by summation, exactly like the join-free IVM sibling "
    "(ivm_incremental_daily_kpis). The fact stream splits into base/delta "
    "batches (even/odd event_id so every group gets rows from both), each "
    "enriched and partially aggregated independently, then combined; the "
    "oracle recomputes the view from the full join, proving "
    "combine(partial(base ⋈ dim), partial(delta ⋈ dim)) == recompute. "
    "The dim side broadcasts (it is the small side by construction); at "
    "100 TB the per-batch cost is O(|delta|), the property that makes a "
    "materialized join view maintainable at all.",
)
def q_ivm_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(dim), "user_id", "left")
            .groupBy(
                F.to_date("ts").alias("date"),
                F.coalesce("segment", F.lit("UNKNOWN")).alias("segment"),
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                    "value_cents"
                ),
            )
        )

    base = partial(ev.filter(F.col("event_id") % 2 == 0))
    delta = partial(ev.filter(F.col("event_id") % 2 == 1))
    return (
        base.unionByName(delta)
        .groupBy("date", "segment")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )


@register(
    "warehouse_snapshot_time_travel",
    """WITH delta AS (
         SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM orders GROUP BY o_custkey
         UNION ALL
         SELECT o_custkey + 100000 AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
       )
       SELECT COALESCE(c.c_custkey, d.k) AS c_custkey,
              CASE WHEN c.c_custkey IS NULL THEN 'insert' ELSE 'update' END
                AS change,
              c.c_mktsegment AS segment_old,
              CASE WHEN c.c_custkey IS NULL THEN 'NEW' ELSE 'ACTIVE' END
                AS segment_new,
              d.cnt AS order_cnt
       FROM customer c FULL JOIN delta d ON c.c_custkey = d.k
       WHERE d.k IS NOT NULL""",
    doc="Snapshot-versioned table format (snapshots.SnapshotTable: atomic "
    "manifest commits over raw parquet, Delta/Iceberg-style) driven end to "
    "end: commit the customer dim as v1, MERGE an order-activity delta "
    "into v2, then diff the two TIME-TRAVEL READS version-over-version. "
    "The oracle recomputes the expected diff from the base tables alone — "
    "if the v1 read leaked v2 data (broken isolation) or the merge "
    "mangled a branch, the diff diverges and the hash catches it. The "
    "physical merge is the same single full-outer key join as "
    "merge_upsert_relational; the format adds version history at "
    "O(commits) manifest cost.",
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..sources import load_table
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("snapshot_time_travel") + "/customer_dim")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumn("order_cnt", F.lit(0).cast("bigint"))
    v1 = t.commit(cust, mode="overwrite")

    orders = load_table(spark, sf_dir, "orders")
    delta = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("d_cnt"))
        .unionByName(
            orders.filter(F.col("o_orderstatus") == "O")
            .groupBy((F.col("o_custkey") + 100000).alias("c_custkey"))
            .agg(F.count("*").alias("d_cnt"))
        )
    )
    v2 = t.merge(
        spark,
        delta,
        on="c_custkey",
        update={"c_mktsegment": "'ACTIVE'", "order_cnt": "d_cnt"},
        insert_defaults={"c_mktsegment": "'NEW'", "order_cnt": "d_cnt"},
    )

    old = t.read(spark, v1).select(
        F.col("c_custkey"),
        F.col("c_mktsegment").alias("segment_old"),
        F.col("order_cnt").alias("cnt_old"),
    )
    new = t.read(spark, v2)
    return (
        new.join(old, "c_custkey", "left")
        .filter(
            old.cnt_old.isNull()
            | (F.col("order_cnt") != F.col("cnt_old"))
            | (F.col("c_mktsegment") != F.col("segment_old"))
        )
        .select(
            "c_custkey",
            F.when(F.col("cnt_old").isNull(), "insert")
            .otherwise("update")
            .alias("change"),
            "segment_old",
            F.col("c_mktsegment").alias("segment_new"),
            F.col("order_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout locality — the registered face of functions/zorder.py
# ---------------------------------------------------------------------------

def _interleave_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of functions.zorder.interleave_bits: bit i of `a` at
    position 2i, bit i of `b` at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZORDER_ORACLE = f"""
WITH bounds AS (
    SELECT MIN(l_partkey) AS amin, MAX(l_partkey) AS amax,
           MIN(l_suppkey) AS bmin, MAX(l_suppkey) AS bmax
    FROM lineitem
), g AS (
    SELECT l_partkey, l_suppkey,
           CAST(FLOOR((l_partkey - amin) * 65535.0
                      / GREATEST(amax - amin, 1)) AS BIGINT) AS ga,
           CAST(FLOOR((l_suppkey - bmin) * 65535.0
                      / GREATEST(bmax - bmin, 1)) AS BIGINT) AS gb
    FROM lineitem, bounds
), z AS (
    SELECT l_partkey, l_suppkey,
           ({_interleave_sql('ga', 'gb')}) AS zv
    FROM g
)
SELECT (zv >> 26) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
FROM z
GROUP BY 1
"""


@register(
    "warehouse_zorder_locality",
    _ZORDER_ORACLE,
    doc="Z-order (Morton) layout audit: interleave 16-bit grid coordinates "
    "of (l_partkey, l_suppkey), split the curve into 64 buckets (top 6 "
    "code bits), and report each bucket's key-space rectangle. The bounded "
    "per-bucket min/max ranges on BOTH keys are exactly why a z-ordered "
    "file layout prunes range predicates on either column from parquet "
    "footer stats (`sinks.write_zordered` writes this order physically; "
    "`test_zorder_layout_prunes_both_dimensions` measures the skipping). "
    "All integer shift/or arithmetic — whole-stage codegen, one hash "
    "aggregate, no shuffle beyond the 64-group agg; the min/max "
    "normalization bounds are one tiny pre-pass inlined as literals.",
)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.zorder import Z_BITS, with_zorder

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = with_zorder(li, "l_partkey", "l_suppkey")
    bucket = F.shiftright(F.col("_z"), 2 * Z_BITS - 6)
    return z.groupBy(bucket.alias("z_bucket")).agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("pk_min"),
        F.max("l_partkey").alias("pk_max"),
        F.min("l_suppkey").alias("sk_min"),
        F.max("l_suppkey").alias("sk_max"),
    )


_DELETE_PRED = "o_orderstatus = 'F' AND o_custkey % 10 < 3"


@register(
    "warehouse_snapshot_delete",
    f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS rows_before,
           CAST(SUM(CASE WHEN NOT ({_DELETE_PRED}) THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_after,
           CAST(SUM(CASE WHEN {_DELETE_PRED} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_deleted
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Copy-on-write DELETE in the snapshot format (GDPR-erasure shape): "
    "orders committed as two append batches split by status, then "
    "`SnapshotTable.delete_where` removes a keyed slice of the 'F' rows. "
    "Dir-level pruning — ONE parallel pushed-down probe over all manifest "
    "dirs finds the match-bearing ones (r12; a per-dir LIMIT-1 loop is "
    "O(commits) serial driver jobs) and only those are rewritten, so the "
    "delete rewrites the one batch it touches and carries the other by "
    "reference (pinned in test_snapshots). The audit diffs the pre- and "
    "post-delete TIME-TRAVEL READS per status; the oracle recomputes it "
    "from the base table — a leak of deleted rows into the new version, "
    "or of the delete into the old one, diverges the hash.",
)
def q_snapshot_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("snapshot_delete") + "/orders_fact")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    t.commit(orders.filter("o_orderstatus <> 'F'"), mode="overwrite")
    v_pre = t.commit(orders.filter("o_orderstatus = 'F'"), mode="append")
    v_post = t.delete_where(spark, _DELETE_PRED)

    before = (
        t.read(spark, v_pre)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("rows_before"))
    )
    after = (
        t.read(spark, v_post)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("rows_after"))
    )
    return (
        before.join(after, "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            "rows_before",
            F.coalesce("rows_after", F.lit(0)).alias("rows_after"),
            (F.col("rows_before") - F.coalesce("rows_after", F.lit(0))).alias(
                "n_deleted"
            ),
        )
    )


@register(
    "warehouse_compact_small_files",
    """SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents_sum,
              CAST(4 AS BIGINT) AS dirs_before,
              CAST(2 AS BIGINT) AS dirs_after,
              TRUE AS large_carried_by_ref
       FROM orders GROUP BY o_orderstatus""",
    doc="INCREMENTAL small-file compaction (snapshots.compact_small — the "
    "OPTIMIZE shape): one large ingest batch (7/8 of orders) plus three "
    "small append batches fragment the table to 4 dirs; compaction with "
    "the threshold set at the large dir's size folds ONLY the three small "
    "dirs into one and carries the large dir into the new manifest BY "
    "REFERENCE (asserted: same path, never rewritten) — cost proportional "
    "to the small-file mass, never the table, which is what makes nightly "
    "OPTIMIZE affordable at 100 TB. The oracle recomputes the per-status "
    "rowcount/key-sum/cent-sum from the base table, so a row lost or "
    "duplicated by the fold diverges the hash, and pins the dir counts "
    "(4 -> 2) plus the by-reference carry as contract columns.",
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("compact_small") + "/orders_ingest")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t.commit(orders.filter(F.col("o_orderkey") % 8 != 0), mode="overwrite")
    for m in range(3):
        t.commit(
            orders.filter(
                (F.col("o_orderkey") % 8 == 0) & (F.col("o_orderkey") % 3 == m)
            ),
            mode="append",
        )
    pm_before = t._manifest(t.latest_version())
    large_dir = pm_before["dirs"][0]  # the overwrite batch leads the lineage

    def dir_bytes(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    v = t.compact_small(spark, small_bytes=dir_bytes(large_dir))
    pm_after = t._manifest(v)
    return t.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents_sum"),
        F.lit(len(pm_before["dirs"])).cast("long").alias("dirs_before"),
        F.lit(len(pm_after["dirs"])).cast("long").alias("dirs_after"),
        F.lit(large_dir in pm_after["dirs"]).alias("large_carried_by_ref"),
    )


@register(
    "warehouse_zonemap_skipping",
    """WITH q AS (SELECT MAX(o_orderkey) // 4 AS q FROM orders)
       SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              CAST(1 AS BIGINT) AS dirs_scanned,
              CAST(4 AS BIGINT) AS dirs_total
       FROM orders CROSS JOIN q
       WHERE o_orderkey BETWEEN 2 * q.q AND 3 * q.q - 1
       GROUP BY o_orderstatus""",
    doc="DATA SKIPPING via manifest zone maps (snapshots.read_pruned — the "
    "Delta/Iceberg min-max file-skipping play at dir granularity): orders "
    "lands in 4 RANGE-CLUSTERED ingest batches (o_orderkey quartile "
    "bands), each commit recording its dir's [min, max] key in the "
    "manifest (parquet-footer-cheap, O(manifest) bytes); a range query "
    "strictly inside band 2 then opens EXACTLY ONE of the 4 dirs — the "
    "other three are skipped from the manifest alone, no file I/O. The "
    "oracle recomputes the aggregate from the base table under the same "
    "range predicate and pins dirs_scanned=1 / dirs_total=4 as contract "
    "columns. Zone maps stay valid under delete/compact because data dirs "
    "are immutable (carried per-dir, dropped with the dir). At 100 TB "
    "with time-ordered ingest this is the difference between scanning a "
    "day and scanning the table.",
)
def q_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("zonemap_skip") + "/orders_ranged")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    qsize = orders.agg(F.expr("MAX(o_orderkey) div 4")).first()[0]
    band = F.least(F.expr(f"o_orderkey div {qsize}"), F.lit(3))
    t.commit(
        orders.filter(band == 0), mode="overwrite", stats_cols=["o_orderkey"]
    )
    for b in (1, 2, 3):
        t.commit(
            orders.filter(band == b), mode="append", stats_cols=["o_orderkey"]
        )
    lo, hi = 2 * qsize, 3 * qsize - 1
    pruned, n_scanned, n_total = t.read_pruned(spark, "o_orderkey", lo, hi)
    return (
        pruned.filter(F.col("o_orderkey").between(lo, hi))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.lit(n_scanned).cast("long").alias("dirs_scanned"),
            F.lit(n_total).cast("long").alias("dirs_total"),
        )
    )


_STATS_COLS = [
    # (name, min/max expression both engines evaluate identically)
    ("l_orderkey", "CAST({c} AS VARCHAR)"),
    ("l_partkey", "CAST({c} AS VARCHAR)"),
    ("l_returnflag", "{c}"),
    ("l_shipdate", "CAST(CAST({c} AS DATE) AS VARCHAR)"),
]


def _analyze_oracle() -> str:
    parts = []
    for c, fmt in _STATS_COLS:
        lo, hi = fmt.format(c=f"MIN({c})"), fmt.format(c=f"MAX({c})")
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv, "
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
            f"{lo} AS min_val, {hi} AS max_val FROM lineitem"
        )
    return " UNION ALL ".join(parts)


@register(
    "warehouse_analyze_stats",
    _analyze_oracle(),
    doc="ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS — the "
    "optimizer-stats collection job every warehouse schedules: one pass "
    "over the fact table computing rowcount, exact NDV, null count and "
    "min/max per tracked column (the inputs to CBO join reordering, "
    "broadcast decisions and zone-map construction). Plan: a SINGLE scan "
    "with all per-column aggregates fused in one hash-agg (count-distincts "
    "expand per column, map-side partials throughout); min/max of the "
    "timestamp column is released as its DATE string so the cross-engine "
    "formatting is bit-identical. At 100 TB this runs as one pass, not "
    "one pass per column; approximate twins (HLL ndv) live in the sketch "
    "family for when exactness stops paying.",
)
def q_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("_n")]
    for c, _ in _STATS_COLS:
        aggs += [
            F.countDistinct(c).alias(f"_ndv_{c}"),
            F.count(c).alias(f"_nn_{c}"),
            F.min(c).alias(f"_lo_{c}"),
            F.max(c).alias(f"_hi_{c}"),
        ]
    row = li.agg(*aggs)

    def fmt(prefix: str, c: str, fmt_s: str):
        col = F.col(f"{prefix}{c}")
        if "DATE" in fmt_s:
            return col.cast("date").cast("string")
        return col.cast("string")

    stacks = []
    for c, fmt_s in _STATS_COLS:
        stacks.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_ndv_{c}").cast("long").alias("ndv"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
                fmt("_lo_", c, fmt_s).alias("min_val"),
                fmt("_hi_", c, fmt_s).alias("max_val"),
            )
        )
    return row.select(
        F.explode(F.array(*stacks)).alias("s")
    ).select("s.col_name", "s.n_rows", "s.ndv", "s.n_nulls", "s.min_val", "s.max_val")


@register(
    "warehouse_change_feed",
    """SELECT 'append' AS step, 'insert' AS change_type, o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       FROM orders WHERE o_orderkey % 4 = 0 GROUP BY o_orderstatus
       UNION ALL
       SELECT 'delete' AS step, 'delete' AS change_type, o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       FROM orders WHERE o_orderkey % 4 = 0 AND o_orderstatus = 'F'
       GROUP BY o_orderstatus""",
    doc="CHANGE DATA FEED (snapshots.changes — the Delta CDF contract for "
    "a format storing rows, not row ids): the feed between an append pair "
    "takes the FORMAT-AWARE FAST PATH — v2's file set is a superset of "
    "v1's, so the inserts are the new dirs read directly, O(|delta|), "
    "with the shared immutable dirs never opened (plan-pinned in pytest "
    "via inputFiles) — while the feed across a DELETE falls back to the "
    "bag diff (EXCEPT ALL both ways), the honest cost of row-level change "
    "extraction without stored ids. The oracle recomputes both legs from "
    "the base table: the appended partition as inserts, the deleted "
    "match-set as deletes; a lost or phantom change row diverges the "
    "hash.",
)
def q_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("change_feed") + "/orders_cdf")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    v1 = t.commit(orders.filter(F.col("o_orderkey") % 4 != 0))
    v2 = t.commit(orders.filter(F.col("o_orderkey") % 4 == 0), mode="append")
    v3 = t.delete_where(
        spark, "o_orderstatus = 'F' AND o_orderkey % 4 = 0"
    )

    def leg(step: str, feed: DataFrame) -> DataFrame:
        return feed.groupBy("_change_type", "o_orderstatus").agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        ).select(
            F.lit(step).alias("step"),
            F.col("_change_type").alias("change_type"),
            "o_orderstatus",
            "n_rows",
            "key_sum",
        )

    return leg("append", t.changes(spark, v1, v2)).unionByName(
        leg("delete", t.changes(spark, v2, v3))
    )


@register(
    "ivm_from_change_feed",
    """WITH final AS (
         SELECT o_orderkey, o_orderstatus FROM orders
         WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 4 = 0)
       )
       SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              TRUE AS matches_recompute
       FROM final GROUP BY o_orderstatus""",
    doc="IVM DRIVEN BY THE CHANGE FEED (the Delta-CDF/Materialize "
    "pattern): a per-status count/sum view materializes from v1, then TWO "
    "table mutations land (an append, then a partial delete) and the view "
    "is maintained purely by folding snapshots.changes(v1, v3) into the "
    "stored partials — inserts add, deletes subtract, the base table is "
    "NEVER rescanned. The oracle recomputes the view from the final "
    "state, proving fold(stored, signed-changes) == recompute — the "
    "algebraic property that lets a 100 TB view absorb any mix of "
    "appends and deletes at O(|changes|); the matches_recompute contract "
    "column additionally asserts the Spark-side recompute agrees row for "
    "row.",
)
def q_ivm_from_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("ivm_cdf") + "/orders_cdf_ivm")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    v1 = t.commit(orders.filter(F.col("o_orderkey") % 4 != 0))

    def view_of(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )

    stored = view_of(t.read(spark, v1))
    t.commit(orders.filter(F.col("o_orderkey") % 4 == 0), mode="append")
    v3 = t.delete_where(spark, "o_orderstatus = 'F' AND o_orderkey % 4 = 0")

    # fold the signed feed into the stored partials — O(|changes|), the
    # base is never rescanned
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = (
        t.changes(spark, v1, v3)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(sign).cast("long").alias("n_rows"),
            F.sum(sign * F.col("o_orderkey")).cast("long").alias("key_sum"),
        )
    )
    maintained = (
        stored.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("key_sum").cast("long").alias("key_sum"),
        )
        .filter(F.col("n_rows") > 0)
        # persisted: the agree action below and the returned rows both
        # consume it — without this the whole fold pipeline runs twice
        .persist()
    )
    try:
        # contract: the maintained view equals a fresh recompute, row for
        # row
        recomputed = view_of(t.read(spark, v3))
        agree = (
            maintained.join(recomputed, "o_orderstatus", "full_outer")
            .select(
                F.every(
                    maintained["n_rows"].eqNullSafe(recomputed["n_rows"])
                    & maintained["key_sum"].eqNullSafe(recomputed["key_sum"])
                ).alias("ok")
            )
            .first()["ok"]
        )
        # the maintained view is O(distinct statuses) rows — collect it so
        # the cache can be released before returning (a returned frame
        # that still depends on the cached plan would pin it for the
        # session lifetime)
        rows = maintained.collect()
        schema = maintained.schema
    finally:
        maintained.unpersist()
    return spark.createDataFrame(rows, schema).select(
        "o_orderstatus",
        "n_rows",
        "key_sum",
        F.lit(bool(agree)).alias("matches_recompute"),
    )


N_HIST_BUCKETS = 8


def _histogram_oracle() -> str:
    qs = ", ".join(
        f"CAST(FLOOR(1000 * quantile_cont(CAST(c AS DOUBLE), {i}/{N_HIST_BUCKETS}.0)) AS BIGINT) AS b{i}"
        for i in range(1, N_HIST_BUCKETS + 1)
    )
    legs = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS bucket, b.b{i} AS hi_milli, "
        f"CAST((SELECT COUNT(*) FROM v WHERE c * 1000 <= b.b{i}) AS BIGINT) "
        f"AS cum_rows FROM b"
        for i in range(1, N_HIST_BUCKETS + 1)
    )
    return f"""
WITH v AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c
           FROM lineitem),
b AS (SELECT {qs} FROM v),
legs AS ({legs})
SELECT bucket, hi_milli, cum_rows,
       cum_rows - COALESCE(LAG(cum_rows) OVER (ORDER BY bucket), 0)
           AS bucket_rows
FROM legs"""


@register(
    "warehouse_equidepth_histogram",
    _histogram_oracle(),
    doc=f"Equi-depth {N_HIST_BUCKETS}-bucket histogram of the fact "
    "table's price column — the optimizer statistic behind selectivity "
    "estimation (ANALYZE ... COMPUTE STATISTICS histograms): boundaries "
    "are exact interpolated octile percentiles of the integer-cent "
    "values, milli-floored so the cross-engine interpolation cannot "
    "diverge, and per-bucket counts derive from CUMULATIVE "
    "value-threshold counts (deterministic under ties, unlike a "
    "row-number split). Plan: one percentile aggregate + one conditional "
    "count aggregate over a single scan — the boundary octuple rides as "
    "a 1-row broadcast, nothing corpus-sized shuffles.",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    probs = ", ".join(
        str(i / N_HIST_BUCKETS) for i in range(1, N_HIST_BUCKETS + 1)
    )
    b = li.agg(
        F.expr(f"percentile(CAST(c AS DOUBLE), array({probs}))").alias("_q")
    ).select(
        *[
            F.floor(1000 * F.col("_q")[i - 1]).cast("long").alias(f"b{i}")
            for i in range(1, N_HIST_BUCKETS + 1)
        ]
    )
    counted = li.crossJoin(F.broadcast(b)).agg(
        *[
            F.sum(
                F.when(F.col("c") * 1000 <= F.col(f"b{i}"), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"cum{i}")
            for i in range(1, N_HIST_BUCKETS + 1)
        ],
        *[F.first(f"b{i}").alias(f"b{i}") for i in range(1, N_HIST_BUCKETS + 1)],
    )
    legs = counted.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("bucket"),
                        F.col(f"b{i}").alias("hi_milli"),
                        F.col(f"cum{i}").alias("cum_rows"),
                    )
                    for i in range(1, N_HIST_BUCKETS + 1)
                ]
            )
        ).alias("s")
    ).select("s.bucket", "s.hi_milli", "s.cum_rows")
    w = Window.orderBy("bucket")
    return legs.select(
        "bucket",
        "hi_milli",
        "cum_rows",
        (F.col("cum_rows") - F.coalesce(F.lag("cum_rows").over(w), F.lit(0)))
        .cast("long")
        .alias("bucket_rows"),
    )


@register(
    "warehouse_schema_evolution",
    """SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                            THEN o_orderkey END) AS BIGINT) AS tagged_key_sum,
              CAST(COUNT(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS BIGINT)
                  AS n_tagged
       FROM orders GROUP BY o_orderstatus""",
    doc="ADD COLUMN schema evolution as a driver-checked query (was "
    "pytest-only): the odd-key half of orders commits WITHOUT the "
    "`priority_tag` column, the even-key half appends WITH it, and the "
    "evolved read surfaces the union schema — pre-evolution rows read "
    "the added column as NULL (Delta/Iceberg ADD COLUMN semantics), "
    "which the aggregate proves: tagged_key_sum/n_tagged must equal "
    "exactly the even-key subset's contribution, i.e. every NULL landed "
    "on a pre-evolution row and nowhere else. Readers merge parquet "
    "footers only when the manifest's mixed_schemas flag says the "
    "lineage spans a change.",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("schema_evo") + "/orders_evolved")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    t.commit(orders.filter(F.col("o_orderkey") % 2 != 0))
    t.commit(
        orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
            "priority_tag", F.col("o_orderkey")
        ),
        mode="append",
    )
    evolved = t.read(spark)
    return evolved.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum("priority_tag").cast("long").alias("tagged_key_sum"),
        F.count("priority_tag").cast("long").alias("n_tagged"),
    )


@register(
    "warehouse_vacuum_report",
    """SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              CAST(1 AS BIGINT) AS n_expire_versions,
              CAST(1 AS BIGINT) AS n_removable_dirs,
              CAST(1 AS BIGINT) AS n_orphan_dirs,
              TRUE AS dry_run_touched_nothing
       FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_orderstatus""",
    doc="VACUUM DRY RUN (snapshots.vacuum_report — the retention "
    "pre-flight): a two-version overwrite lineage plus one planted "
    "crashed-attempt orphan dir; the report must identify EXACTLY the "
    "v1 manifest as expirable, v1's dir as removable (refcounted against "
    "the survivor), and the orphan — while touching NOTHING: the "
    "contract column asserts both versions still read and every dir "
    "still exists afterwards, and the oracle recomputes the surviving "
    "version's content to prove the reported state corresponds to the "
    "real table. O(commits) manifest metadata, no data I/O — what every "
    "retention job should print before destroying history.",
)
def q_vacuum_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("vacuum_report") + "/orders_vac")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    v1 = t.commit(orders.filter(F.col("o_orderkey") % 3 == 1))
    v2 = t.commit(orders.filter(F.col("o_orderkey") % 3 == 0))
    # plant a crashed-attempt orphan: data written, no manifest
    orphan = f"{t.path}/data/v000099"
    orders.limit(1).write.mode("error").parquet(orphan)

    rep = t.vacuum_report(keep_last=1, orphan_ttl_s=0)
    v1_dirs = t._manifest(v1)["dirs"]
    report_exact = (
        rep["expire_versions"] == [v1]
        and rep["keep_versions"] == [v2]
        and rep["removable_dirs"] == v1_dirs
        and rep["orphan_dirs"] == [orphan]
    )
    untouched = (
        all(os.path.isdir(d) for d in v1_dirs + [orphan])
        and t.versions() == [v1, v2]
        and t.read(spark, v1).count() > 0
    )
    return t.read(spark, v2).groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.lit(len(rep["expire_versions"])).cast("long").alias("n_expire_versions"),
        F.lit(len(rep["removable_dirs"])).cast("long").alias("n_removable_dirs"),
        F.lit(len(rep["orphan_dirs"])).cast("long").alias("n_orphan_dirs"),
        F.lit(bool(report_exact and untouched)).alias("dry_run_touched_nothing"),
    )


@register(
    "warehouse_row_provenance",
    """WITH tagged AS (
         SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 4 = 0 THEN 'v000001'
                     WHEN o_orderkey % 4 = 1 THEN 'v000002'
                     WHEN o_orderkey % 4 = 2 THEN 'v000003'
                     ELSE 'v000004' END AS ingest_version
         FROM orders
       )
       SELECT ingest_version, o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       FROM tagged GROUP BY ingest_version, o_orderstatus""",
    doc="ROW-LEVEL PROVENANCE: every row of the snapshot table is traced "
    "back to the ingest commit that wrote it via input_file_name() mapped "
    "through the manifest's dir->version relation — the lineage audit "
    "('which load produced this row?') that incident forensics and "
    "selective reprocessing need, WITHOUT any provenance column stored in "
    "the data. Four ingest batches land as four versions (keys split by "
    "o_orderkey % 4); the oracle derives each row's expected version from "
    "its key alone, so a row attributed to the wrong commit diverges the "
    "hash. Plan: one scan + the file-name expression (metadata Spark "
    "already carries per split) + a broadcast dir->version map — "
    "provenance costs one projected column, not a table rewrite.",
)
def q_row_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("row_provenance") + "/orders_prov")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    t.commit(orders.filter(F.col("o_orderkey") % 4 == 0))
    for m in (1, 2, 3):
        t.commit(orders.filter(F.col("o_orderkey") % 4 == m), mode="append")
    # dir -> version label, from the manifest lineage (dir paths embed the
    # version they were written under; derive from the manifest so renames
    # or -rN retry suffixes cannot mislabel)
    dir_version = []
    for v in t.versions():
        mv = t._manifest(v)
        parent_dirs = (
            set(t._manifest(mv["parent"])["dirs"]) if mv["parent"] else set()
        )
        for d in mv["dirs"]:
            if d not in parent_dirs:
                dir_version.append((d, f"v{v:06d}"))
    # join on the dir's trailing "data/vNNNNNN[-rN]" component, not the
    # absolute path: input_file_name() returns a URI-ENCODED string, so a
    # work root containing a space/non-ASCII char would never equal the
    # literal manifest path and silently NULL every row's provenance
    import os as _os

    vmap = spark.createDataFrame(
        [("data/" + _os.path.basename(d), v) for d, v in dir_version],
        "dirkey string, ingest_version string",
    )
    rows = t.read(spark).withColumn(
        "_file", F.input_file_name()
    ).withColumn(
        "_dirkey",
        F.regexp_extract(F.col("_file"), r"(data/v[0-9]+(?:-r[0-9]+)?)/", 1),
    )
    joined = rows.join(
        F.broadcast(vmap), rows["_dirkey"] == vmap["dirkey"], "left"
    )
    return joined.groupBy("ingest_version", "o_orderstatus").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


@register(
    "warehouse_bloom_point_skipping",
    """WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders)
       SELECT o.o_orderkey, o.o_orderstatus,
              CAST(4 AS BIGINT) AS dirs_total,
              TRUE AS found_in_scan
       FROM orders o CROSS JOIN k
       WHERE o.o_orderkey = k.k""",
    doc="POINT-LOOKUP data skipping via the per-dir BLOOM index "
    "(snapshots.read_point, r9 — the complement to zone maps, which are "
    "useless here BY CONSTRUCTION: orders lands in 4 batches keyed "
    "o_orderkey % 4, so every dir spans the full key range and every "
    "[min,max] intersects every lookup). Each commit records, per "
    "indexed column, the sorted distinct bit positions its values set "
    "under seeded xxhash64 (functions/bloom.py's scheme; O(set bits) "
    "manifest bytes, never O(rows)); a point lookup probes the stored "
    "bits and opens only dirs that COULD contain the key. The probe "
    "literal is cast to the table's recorded column type — xxhash64 is "
    "type-sensitive and an INT-vs-LONG mismatch would silently produce "
    "the one failure a bloom index must never have, a false negative "
    "(regression-pinned in pytest). CHECKED OUTPUT: the looked-up key's "
    "exact rows (hash), dirs_total, and found_in_scan (no false "
    "negative — guaranteed). SKIPPING is asserted in pytest "
    "(test_snapshots.py), NOT in the hashed output: bloom skipping is "
    "probabilistic (a false positive opens an extra dir without "
    "changing results), so a hashed skipped-at-least-one flag would "
    "make the correctness gate flaky by design — and the filters here "
    "are sized from the batch's actual key count (~10 bits/key, r10) "
    "precisely so saturation at higher SFs degrades lookups gracefully "
    "instead of failing an oracle. At 100 TB this is the manifest-only "
    "primary-key lookup path: open one ingest batch, not the table.",
)
def q_bloom_point_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    t = SnapshotTable(fresh_work_dir("bloom_skip") + "/orders_hashed")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    # size the filter from the data, not a constant: ~10 bits per distinct
    # key (k=2 seeds -> ~3% fp per dir), rounded up to a power of two. A
    # fixed bit count saturates as SF grows (at sf1 each batch carries
    # ~375k keys -> 2^17 bits would be ~94% ones and every probe would
    # "hit"), silently turning the index into a no-op.
    n_keys = orders.count() // 4 + 1
    bits = 1 << max(17, (n_keys * 10 - 1).bit_length())
    batch = F.pmod("o_orderkey", F.lit(4))
    t.commit(
        orders.filter(batch == 0),
        mode="overwrite",
        bloom_cols=["o_orderkey"],
        bloom_bits=bits,
    )
    for b in (1, 2, 3):
        t.commit(
            orders.filter(batch == b),
            mode="append",
            bloom_cols=["o_orderkey"],
            bloom_bits=bits,
        )
    key = orders.agg(F.max("o_orderkey")).first()[0]
    pruned, n_scanned, n_total = t.read_point(spark, "o_orderkey", key)
    return (
        pruned.filter(F.col("o_orderkey") == key)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.lit(n_total).cast("long").alias("dirs_total"),
            F.lit(True).alias("found_in_scan"),
        )
    )
