"""Greedy sequence packing — the LLM-training batch-prep operator: fill
fixed token-budget packs with consecutive documents so training sequences
waste minimal padding.

Semantics (deterministic): within each ``source`` partition, walk documents
in doc_id order; add each doc to the current pack unless it would overflow
the budget, else start a new pack. An oversized doc gets its own pack.
Sequential-scan-with-reset state is not expressible in closed-form window
algebra, so this is a legitimate ``applyInPandas`` kernel (per-group,
Arrow-batched, no driver involvement); the DuckDB oracle replays the exact
recurrence as a recursive CTE, proving the Python kernel's semantics.

Scale: groups partition the corpus, so packing runs embarrassingly
parallel per group; each group streams through one pandas kernel. The
per-group sequential dependency is inherent to greedy packing — sharding
IS the parallelization strategy (as in production packers). BUT the
per-source packers below are CORRECTNESS BASELINES: a group is ONE
source, so a web-scale source (1e9+ docs behind one key) materializes in
a single pandas frame. At scale use the r10 sharded twins
(:func:`pack_documents_sharded` / :func:`pack_hierarchical_sharded`,
query ``pack_sequences_sharded``), whose groups are bounded by constants
regardless of source skew.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table

PACK_BUDGET = 128

_OUT_SCHEMA = "source string, doc_id long, n_tokens long, pack_id long, pack_used long"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pack_id, used = 0, 0
    ids, useds = [], []
    for n in pdf["n_tokens"]:
        n = int(n)
        if used > 0 and used + n > PACK_BUDGET:
            pack_id += 1
            used = 0
        used += n
        ids.append(pack_id)
        useds.append(used)
    return pd.DataFrame(
        {
            "source": pdf["source"],
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"],
            "pack_id": ids,
            "pack_used": useds,
        }
    )


def pack_documents(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    sized = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return sized.groupBy("source").applyInPandas(_pack_group, schema=_OUT_SCHEMA)


@register(
    "pack_sequences_greedy",
    f"""
WITH RECURSIVE sized AS (
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
),
packed AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_used
    FROM sized WHERE rn = 1
    UNION ALL
    SELECT d.source, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN p.pack_id + 1 ELSE p.pack_id END,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN d.n_tokens ELSE p.pack_used + d.n_tokens END
    FROM packed p JOIN sized d ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, pack_id, pack_used FROM packed""",
    doc=f"Greedy sequence packing into {PACK_BUDGET}-token packs per source "
    "shard (applyInPandas sequential kernel, parallel across shards). "
    "Oracle replays the recurrence as a recursive CTE — the Python kernel's "
    "semantics are SQL-proved. CORRECTNESS BASELINE: one group = one whole "
    "source; use pack_sequences_sharded at scale (bounded groups).",
)
def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_documents(load_table(spark, sf_dir, "documents"))


SUPER_BUDGET = 512

_SUPER_SCHEMA = (
    "source string, pack_id long, pack_tokens long, superpack_id long, super_used long"
)


def _pack_superpacks(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["source", "pack_id"]).reset_index(drop=True)
    sid, used = 0, 0
    ids, useds = [], []
    for n in pdf["pack_tokens"]:
        n = int(n)
        if used > 0 and used + n > SUPER_BUDGET:
            sid += 1
            used = 0
        used += n
        ids.append(sid)
        useds.append(used)
    return pd.DataFrame(
        {
            "source": pdf["source"],
            "pack_id": pdf["pack_id"],
            "pack_tokens": pdf["pack_tokens"],
            "superpack_id": ids,
            "super_used": useds,
        }
    )


def pack_hierarchical(docs: DataFrame) -> DataFrame:
    """Two-level global packing: per-shard greedy packs (parallel, level 1),
    then the pack *summaries* — a relation ~budget x smaller than the corpus
    — greedily packed into global superpacks in (source, pack_id) order
    (level 2). The sequential level-2 pass is the reduce side of the
    hierarchy: its input has already been shrunk by level 1, the same way a
    global sort merges pre-sorted runs."""
    packs = (
        pack_documents(docs)
        .groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").cast("long").alias("pack_tokens"))
    )
    return (
        packs.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: _pack_superpacks(pdf.drop(columns=["_g"])), schema=_SUPER_SCHEMA
        )
    )


@register(
    "pack_sequences_hierarchical",
    f"""
WITH RECURSIVE sized AS (
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
),
packed AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_used
    FROM sized WHERE rn = 1
    UNION ALL
    SELECT d.source, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN p.pack_id + 1 ELSE p.pack_id END,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN d.n_tokens ELSE p.pack_used + d.n_tokens END
    FROM packed p JOIN sized d ON d.source = p.source AND d.rn = p.rn + 1
),
packs AS MATERIALIZED (
    -- MATERIALIZED: the super recursion below references packs once per
    -- iteration; inlining would replay the level-1 recursion each time
    -- (measured 51s -> 0.4s at sf0.01)
    SELECT source, pack_id, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           ROW_NUMBER() OVER (ORDER BY source, pack_id) AS srn
    FROM packed GROUP BY source, pack_id
),
super AS (
    SELECT source, pack_id, pack_tokens, srn,
           CAST(0 AS BIGINT) AS superpack_id, pack_tokens AS super_used
    FROM packs WHERE srn = 1
    UNION ALL
    SELECT p.source, p.pack_id, p.pack_tokens, p.srn,
           CASE WHEN s.super_used + p.pack_tokens > {SUPER_BUDGET}
                THEN s.superpack_id + 1 ELSE s.superpack_id END,
           CASE WHEN s.super_used + p.pack_tokens > {SUPER_BUDGET}
                THEN p.pack_tokens ELSE s.super_used + p.pack_tokens END
    FROM super s JOIN packs p ON p.srn = s.srn + 1
)
SELECT source, pack_id, pack_tokens, superpack_id, super_used FROM super""",
    doc=f"Hierarchical (two-level) global packing: level 1 packs documents "
    f"per shard in parallel ({PACK_BUDGET}-token packs); level 2 packs the "
    f"pack summaries — a relation ~budget x smaller — into global "
    f"{SUPER_BUDGET}-token superpacks. Both greedy recurrences are replayed "
    "by recursive CTEs, so the distributed two-phase algorithm is SQL-proved "
    "end-to-end. CORRECTNESS BASELINE: level 2 packs ALL summaries in one "
    "group; use pack_sequences_sharded at scale (bounded groups both levels).",
)
def q_pack_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_hierarchical(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Scale-safe sharded packing (r10) — bounds EVERY in-memory group by a
# constant, with NO per-group Python-call overhead.
#
# The plain per-source packer above is the CORRECTNESS BASELINE: it packs
# each source as ONE applyInPandas group, so a web-scale source (1e9+ docs
# behind one source key) would materialize in a single pandas frame and OOM
# one executor; pack_hierarchical's level 2 then funnels ALL pack summaries
# through one group. The sharded twin packs per (source, doc_id//SHARD_SPAN)
# shard at level 1 — <= SHARD_SPAN docs of state per group no matter how
# skewed the source mix — and packs the pack summaries per
# (source, shard//SUPER_FANIN) super-shard at level 2.
#
# EXECUTION SHAPE (r10, measured): the obvious groupBy().applyInPandas()
# spelling pays one Python UDF invocation PER GROUP; with corpus/span
# groups that overhead dominates (38.6s for 200k docs on the hot-source
# replica — worse than the baseline it replaces). Instead each level is
# ONE repartition on the group key + sortWithinPartitions + a streaming
# mapInPandas kernel that walks the partition's Arrow batches in order and
# RESETS the greedy state whenever the group key changes — thousands of
# bounded groups flow through one Python worker call per partition-batch,
# state stays O(1), and a group can never straddle partitions because the
# repartition hashes on exactly the group key. (Same reason Spark's own
# window functions sort-and-scan rather than materialize per-group.)
#
# Greedy packing only needs a deterministic order, so the oracle replays
# the identical bucketed recurrence (recursive CTEs partitioned by the
# same keys) and stays EXACT. The trade vs the baseline: pack boundaries
# reset at shard edges (<= one partially-filled pack per shard of waste),
# which is how production packers shard too.
# ---------------------------------------------------------------------------

SHARD_SPAN = 128  # max docs per level-1 packing group
SUPER_FANIN = 2  # level-1 shards folded per level-2 group

_SHARD_SCHEMA = (
    "source string, shard long, doc_id long, n_tokens long, "
    "pack_id long, pack_used long"
)

_SUPER_SHARD_SCHEMA = (
    "source string, shard long, pack_id long, pack_tokens long, "
    "super_shard long, superpack_id long, super_used long"
)


def _greedy_stream_kernel(key_cols: list[str], size_col: str, budget: int,
                          id_name: str, used_name: str):
    """mapInPandas kernel factory: rows arrive sorted by (key_cols, order
    cols); walk them once, resetting (pack_id, used) whenever the group
    key changes — the carry across Arrow batch boundaries is the whole
    point (a group may straddle batches, never partitions)."""

    def fn(batches):
        cur_key = None
        pack_id, used = 0, 0
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            ids = [0] * n_rows
            useds = [0] * n_rows
            # plain lists: per-row .iloc in the hot loop costs ~1 µs/row
            # of pandas indexing machinery — at 1e6-row batches that is
            # seconds of pure overhead for zero semantics
            keys = list(zip(*[pdf[c].tolist() for c in key_cols]))
            sizes = pdf[size_col].tolist()
            for i in range(n_rows):
                k = keys[i]
                if k != cur_key:
                    cur_key = k
                    pack_id, used = 0, 0
                n = int(sizes[i])
                if used > 0 and used + n > budget:
                    pack_id += 1
                    used = 0
                used += n
                ids[i] = pack_id
                useds[i] = used
            out = pdf.copy()
            out[id_name] = ids
            out[used_name] = useds
            yield out

    return fn


def pack_documents_sharded(docs: DataFrame, span: int = SHARD_SPAN) -> DataFrame:
    """Level 1, bounded: greedy packing per (source, doc_id//span) shard.
    One shuffle on the shard key, one ordered streaming pass — no group
    ever holds more than ``span`` docs of packing state, so a source
    holding the whole corpus parallelizes across corpus/span shards
    instead of OOMing one executor."""
    sized = docs.select(
        "source",
        # `div` (exact integral division) — NOT `/` + cast, whose double
        # intermediate loses precision above 2^53 doc ids. Oracle parity:
        # DuckDB's `//` is FLOOR division, Spark `div` truncates toward
        # zero — identical for the non-negative doc_ids this engine
        # assigns, divergent below 0 (use floor(doc_id / span) if
        # negative ids must ever match)
        F.expr(f"doc_id div {span}").alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    kernel = _greedy_stream_kernel(
        ["source", "shard"], "n_tokens", PACK_BUDGET, "pack_id", "pack_used"
    )
    return (
        sized.repartition("source", "shard")
        .sortWithinPartitions("source", "shard", "doc_id")
        .mapInPandas(kernel, schema=_SHARD_SCHEMA)
    )


def pack_hierarchical_sharded(
    docs: DataFrame, span: int = SHARD_SPAN, fanin: int = SUPER_FANIN
) -> DataFrame:
    """Two-level sharded packing: level-1 packs per (source, shard); level
    2 packs the pack SUMMARIES per (source, shard//fanin) super-shard —
    <= fanin * span summaries of state per group, still a constant. The
    input to level 2 is already ~budget x smaller than the corpus, so the
    super-shard count stays large enough to parallelize while every group
    stays bounded; a deeper corpus just adds more super-shards, never
    bigger groups."""
    packs = (
        pack_documents_sharded(docs, span)
        .groupBy("source", "shard", "pack_id")
        .agg(F.sum("n_tokens").cast("long").alias("pack_tokens"))
        .withColumn("super_shard", F.expr(f"shard div {fanin}"))
        .select("source", "shard", "pack_id", "pack_tokens", "super_shard")
    )
    kernel = _greedy_stream_kernel(
        ["source", "super_shard"],
        "pack_tokens",
        SUPER_BUDGET,
        "superpack_id",
        "super_used",
    )
    return (
        packs.repartition("source", "super_shard")
        .sortWithinPartitions("source", "super_shard", "shard", "pack_id")
        .mapInPandas(kernel, schema=_SUPER_SHARD_SCHEMA)
    )


@register(
    "pack_sequences_sharded",
    f"""
WITH RECURSIVE sized AS (
    SELECT source, CAST(doc_id // {SHARD_SPAN} AS BIGINT) AS shard, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ROW_NUMBER() OVER (
               PARTITION BY source, doc_id // {SHARD_SPAN} ORDER BY doc_id
           ) AS rn
    FROM documents
),
packed AS (
    SELECT source, shard, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_used
    FROM sized WHERE rn = 1
    UNION ALL
    SELECT d.source, d.shard, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN p.pack_id + 1 ELSE p.pack_id END,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN d.n_tokens ELSE p.pack_used + d.n_tokens END
    FROM packed p
    JOIN sized d ON d.source = p.source AND d.shard = p.shard
                AND d.rn = p.rn + 1
),
packs AS MATERIALIZED (
    SELECT source, shard, pack_id,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(shard // {SUPER_FANIN} AS BIGINT) AS super_shard,
           ROW_NUMBER() OVER (
               PARTITION BY source, shard // {SUPER_FANIN}
               ORDER BY shard, pack_id
           ) AS srn
    FROM packed GROUP BY source, shard, pack_id
),
super AS (
    SELECT source, shard, pack_id, pack_tokens, super_shard, srn,
           CAST(0 AS BIGINT) AS superpack_id, pack_tokens AS super_used
    FROM packs WHERE srn = 1
    UNION ALL
    SELECT p.source, p.shard, p.pack_id, p.pack_tokens, p.super_shard, p.srn,
           CASE WHEN s.super_used + p.pack_tokens > {SUPER_BUDGET}
                THEN s.superpack_id + 1 ELSE s.superpack_id END,
           CASE WHEN s.super_used + p.pack_tokens > {SUPER_BUDGET}
                THEN p.pack_tokens ELSE s.super_used + p.pack_tokens END
    FROM super s
    JOIN packs p ON p.source = s.source AND p.super_shard = s.super_shard
                AND p.srn = s.srn + 1
)
SELECT source, shard, pack_id, pack_tokens, super_shard, superpack_id,
       super_used
FROM super""",
    doc=f"SCALE-SAFE sharded two-level packing (r10 twin of "
    f"pack_sequences_hierarchical, whose per-source level-1 groups and "
    f"single level-2 group are the repo's correctness baselines): level 1 "
    f"packs per (source, doc_id//{SHARD_SPAN}) shard — <= {SHARD_SPAN} "
    f"docs of packing state NO MATTER how skewed the source mix is — and "
    f"level 2 packs the pack summaries per (source, shard//{SUPER_FANIN}) "
    f"super-shard (<= {SUPER_FANIN}*{SHARD_SPAN} summaries of state). "
    "Each level is ONE repartition on its group key + an ordered "
    "streaming mapInPandas kernel that resets the greedy state at group "
    "boundaries — thousands of bounded groups per Python call, none of "
    "applyInPandas's per-group invocation overhead (which measured WORSE "
    "than the unsharded baseline on the hot-source replica). Greedy "
    "packing needs only a deterministic order, so the oracle replays the "
    "identical bucketed recurrence with recursive CTEs partitioned by "
    "the same shard keys — EXACT hash equality, not an approximation "
    "band. The baseline's pack boundaries differ only at shard edges "
    "(bounded padding waste), the trade production packers make to "
    "shard at all.",
)
def q_pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_hierarchical_sharded(load_table(spark, sf_dir, "documents"))


def greedy_stream_kernel_seeded(
    key_cols: list[str],
    size_col: str,
    budget: int,
    out_cols: list[str],
    init_id_col: str = "_init_pack_id",
    init_used_col: str = "_init_used",
):
    """Seeded variant of the streaming kernel for INCREMENTAL packing
    (streaming/ingest.make_pack_index_applier): when the group key
    changes, the greedy state initializes from the row's carried
    ``(_init_pack_id, _init_used)`` columns — the stored tail state of
    that (source, shard) from previous micro-batches — instead of (0, 0),
    so packing a shard across many batches produces exactly the sequence
    one batch pass over the concatenated rows would. NULL inits (a shard
    seen for the first time) start fresh. Same cross-Arrow-batch state
    carry as :func:`_greedy_stream_kernel`."""

    def fn(batches):
        cur_key = None
        pack_id, used = 0, 0
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            ids = [0] * n_rows
            useds = [0] * n_rows
            keys = list(zip(*[pdf[c].tolist() for c in key_cols]))
            sizes = pdf[size_col].tolist()
            init_p = pdf[init_id_col].tolist()
            init_u = pdf[init_used_col].tolist()
            for i in range(n_rows):
                k = keys[i]
                if k != cur_key:
                    cur_key = k
                    p0 = init_p[i]
                    # pd.isna is scalar-safe across None/NaN/pd.NA —
                    # nullable extension dtypes surface pd.NA, which a
                    # manual None/NaN check would miss
                    fresh = pd.isna(p0)
                    pack_id = 0 if fresh else int(p0)
                    used = 0 if fresh else int(init_u[i])
                n = int(sizes[i])
                if used > 0 and used + n > budget:
                    pack_id += 1
                    used = 0
                used += n
                ids[i] = pack_id
                useds[i] = used
            out = pdf[out_cols[:-2]].copy()
            out[out_cols[-2]] = ids
            out[out_cols[-1]] = useds
            yield out

    return fn
