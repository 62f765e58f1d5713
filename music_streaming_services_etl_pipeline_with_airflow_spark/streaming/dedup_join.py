"""Streaming dedup + stream-stream joins — the remaining Structured
Streaming operator families.

- ``streaming_dedup``: exactly-once event delivery from an at-least-once
  source via ``dropDuplicatesWithinWatermark`` — state holds only ids seen
  within the watermark horizon (bounded, unlike a naive dropDuplicates).
- ``stream_stream_interval_join``: correlate two event streams on key with
  an event-time interval condition; watermarks on both sides bound the
  join state. The canonical impression⋈click shape.

Both run with availableNow over staged folders and are pytest-verified
against their batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .runner import (
    EVENTS_SCHEMA,
    run_stream_to_df,
    stage_events,
    stage_events_with_watermark_sentinel,
)


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    watermark: str = "1 hour",
    scratch: str | None = None,
) -> DataFrame:
    """At-least-once → exactly-once: drop replayed event_ids within the
    watermark horizon."""
    src = spark.readStream.schema(schema).parquet(source_dir)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return run_stream_to_df(deduped, scratch=scratch)


def interval_join_streams(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    schema_left: str,
    schema_right: str,
    max_gap_minutes: int = 30,
    scratch: str | None = None,
) -> DataFrame:
    """impressions ⋈ clicks: same user, click within [impression_ts,
    impression_ts + gap]."""
    imp = (
        spark.readStream.schema(schema_left)
        .parquet(left_dir)
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        spark.readStream.schema(schema_right)
        .parquet(right_dir)
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            f"""imp_user = clk_user AND
                clk_ts >= imp_ts AND
                clk_ts <= imp_ts + interval {max_gap_minutes} minutes"""
        ),
    ).select("imp_user", "imp_id", "clk_id", "imp_ts", "clk_ts")
    return run_stream_to_df(joined, scratch=scratch)


# ---------------------------------------------------------------------------
# Registry entries — stage driver testdata as streaming drop-folders
# ---------------------------------------------------------------------------

from ..plans.registry import register  # noqa: E402

_stage = stage_events


@register(
    "streaming_dedup_watermark",
    # Real oracle: the two staged copies are identical, so every replayed
    # event_id lands inside the watermark horizon of its first delivery and
    # the surviving rows are exactly the distinct events (event_id is
    # unique in the source table).
    """
    SELECT event_id, user_id, event_type FROM events
    """,
    doc="Exactly-once from at-least-once: the events feed staged TWICE "
    "(simulated redelivery) through dropDuplicatesWithinWatermark on "
    "event_id — output cardinality equals the batch-distinct count, and "
    "state holds only ids inside the 1h watermark horizon (bounded, "
    "unlike naive dropDuplicates whose state grows forever). "
    "availableNow trigger.",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage(sf_dir, "events_replayed", n_copies=2)
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    deduped = (
        src.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_stream_to_df(deduped, scratch="streaming_dedup")


@register(
    "streaming_interval_join",
    # Real oracle: with availableNow over one bounded staged folder, every
    # qualifying pair is co-resident in join state before the final
    # watermark advances, so the emitted set equals the batch interval
    # join (the same equivalence test_registered_streaming_interval_join
    # _equals_batch pins against the DataFrame batch form).
    """
    SELECT p.user_id AS imp_user,
           p.event_id AS imp_id,
           e.event_id AS clk_id
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts
     AND e.ts <= p.ts + INTERVAL '30 minutes'
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    """,
    doc="Stream-stream interval join: purchase stream x error stream of "
    "the same user with error_ts in [purchase_ts, purchase_ts + 30min]. "
    "Watermarks on both sides let Spark expire join state older than the "
    "interval bound — without them, stream-stream join state grows "
    "unboundedly. The one-sided streaming twin of the batch "
    "j7_range_join_binned.",
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage(sf_dir, "events_join")
    base = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    imp = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("imp_user"),
            F.col("event_id").alias("imp_id"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        base.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("clk_user"),
            F.col("event_id").alias("clk_id"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            """imp_user = clk_user AND
               clk_ts >= imp_ts AND
               clk_ts <= imp_ts + interval 30 minutes"""
        ),
    ).select("imp_user", "imp_id", "clk_id")
    return run_stream_to_df(joined, scratch="streaming_interval_join")


@register(
    "streaming_interval_join_outer",
    # Real oracle: the left-outer batch interval join. The staged folder
    # carries a far-future watermark sentinel (see
    # stage_events_with_watermark_sentinel) so the final watermark passes
    # every real impression's `ts + 30min` bound and all null-padded rows
    # flush before the availableNow run ends; the sentinel pair itself is
    # user_id -1 and is filtered back out post-join.
    """
    SELECT p.user_id AS imp_user,
           p.event_id AS imp_id,
           e.event_id AS clk_id
    FROM events p
    LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.event_type = 'error'
     AND e.ts >= p.ts
     AND e.ts <= p.ts + INTERVAL '30 minutes'
    WHERE p.event_type = 'purchase'
    """,
    doc="LEFT OUTER stream-stream interval join: every purchase emits, "
    "null-padded when no same-user error lands within 30 minutes. Outer "
    "emission is watermark-driven (a row can only be declared unmatched "
    "once no earlier-timestamped right row can still arrive), which is "
    "exactly the state-eviction semantics inner joins get for free — and "
    "why the staged folder carries a control-event sentinel to advance the "
    "final watermark past the trailing rows. The attribution shape "
    "(impressions with AND without conversions) that an inner join "
    "silently drops.",
)
def q_streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stage_events_with_watermark_sentinel(sf_dir, "events_join_outer")
    base = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    imp = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("imp_user"),
            F.col("event_id").alias("imp_id"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        base.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("clk_user"),
            F.col("event_id").alias("clk_id"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            """imp_user = clk_user AND
               clk_ts >= imp_ts AND
               clk_ts <= imp_ts + interval 30 minutes"""
        ),
        "leftOuter",
    )
    # The sentinel strip runs on the BATCH result, never inside the
    # streaming plan: a pre-sink `imp_user >= 0` filter would be pushed
    # below the join by Catalyst (and inferred onto clk_user through the
    # equi-join key), dropping the sentinel rows before the watermark
    # nodes ever see them — which silently un-advances the final watermark
    # and strands the trailing outer rows in state.
    return run_stream_to_df(
        joined.select("imp_user", "imp_id", "clk_id"),
        scratch="streaming_interval_join_outer",
    ).filter(
        F.col("imp_user") >= 0
    )


@register(
    "streaming_interval_join_full",
    # Real oracle: the batch FULL OUTER interval join. Same watermark
    # sentinel as the left-outer twin, now flushing BOTH directions:
    # unmatched purchases null-pad on the click side, unmatched errors on
    # the purchase side. Sentinels stripped on the batch result (either
    # side may carry the -1 user after an outer emission).
    """
    SELECT p.user_id AS imp_user,
           p.event_id AS imp_id,
           e.user_id AS clk_user,
           e.event_id AS clk_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts
     AND e.ts <= p.ts + INTERVAL '30 minutes'
    """,
    doc="FULL OUTER stream-stream interval join: conversions, abandoned "
    "impressions AND orphan clicks in one pass — both sides null-pad "
    "when the watermark proves no counterpart can still arrive. The "
    "right side's eviction bound derives from the reversed inequality "
    "(a click can only match an EARLIER purchase, so it closes once the "
    "watermark passes its own timestamp); the left side's from the "
    "+30min upper bound. Same control-event sentinel as the left-outer "
    "twin, stripped post-stream.",
)
def q_streaming_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stage_events_with_watermark_sentinel(sf_dir, "events_join_full")
    base = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    imp = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("imp_user"),
            F.col("event_id").alias("imp_id"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        base.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("clk_user"),
            F.col("event_id").alias("clk_id"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            """imp_user = clk_user AND
               clk_ts >= imp_ts AND
               clk_ts <= imp_ts + interval 30 minutes"""
        ),
        "fullOuter",
    )
    out = run_stream_to_df(
        joined.select("imp_user", "imp_id", "clk_user", "clk_id"),
        scratch="streaming_interval_join_full",
    )
    # sentinel strip on the BATCH result — see the left-outer twin for why
    # this must not run inside the streaming plan
    return out.filter(
        (F.col("imp_user").isNull() | (F.col("imp_user") >= 0))
        & (F.col("clk_user").isNull() | (F.col("clk_user") >= 0))
    )


@register(
    "streaming_static_enrich",
    # Real oracle: stream-static joins are stateless (each micro-batch
    # joins the static snapshot), so with availableNow over a bounded
    # folder the complete-mode aggregate equals the batch join+group.
    """
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 1000) AS BIGINT)) AS BIGINT)
               AS value_milli
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Stream-static enrichment join — the ingest-time dimension lookup "
    "every production stream runs: the event stream joins a BROADCAST "
    "static dimension (no state, no watermark needed — each micro-batch "
    "joins the dim snapshot), then aggregates per segment in complete "
    "mode. At scale the dim broadcast is the same plan as batch J1; the "
    "stream side never shuffles for the join.",
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    d = _stage(sf_dir, "events_enrich")
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    enriched = src.join(dim, src.user_id == dim.c_custkey)
    # countDistinct is unsupported on streams — exact integer sums are
    # the mergeable per-batch partials complete mode can maintain
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
    )
    return run_stream_to_df(agg, output_mode="complete")
