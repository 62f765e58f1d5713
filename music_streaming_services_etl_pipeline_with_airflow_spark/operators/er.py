"""Entity resolution over ``customer`` — the record-linkage family:
deterministic mention generation -> blocking -> pairwise match scoring ->
transitive closure -> canonicalization, end-to-end with an EXACT oracle.

The fixture has no dirty mentions, so (the PII-injection play from
operators/text.py) each customer record is first expanded into FOUR
deterministic mention variants, with edits confined to the "Customer"
prefix so the 9-digit account suffix survives as the extractable
normalized key:

  m0  the exact record                          (mention_id = 4*ck)
  m1  one prefix char DROPPED at ck % 8         (4*ck + 1, lev 1 from m0)
  m2  one prefix char DUPLICATED at (3*ck) % 8  (4*ck + 2, lev 1 from m0)
  m3  prefix misspelled 'Custmoer'              (4*ck + 3, lev 2 from m0)

m1/m2/m3 are pairwise up to lev 3 apart — ABOVE the match threshold — so
the closure step is load-bearing: the cluster only assembles transitively
through the m0 hub, exactly the chain real ER resolves.

Pipeline semantics (all SQL-replayable):
  - BLOCKING: account-number div 10 — a coarse equi-join key (~40
    mentions/block), the scale mechanism: candidate pairs are generated
    per block, never all-pairs.
  - MATCH RULE: same extracted account number AND levenshtein <= 2 —
    blocking recalls candidates, the rule decides.
  - CLOSURE: connected components over match edges (min-label
    propagation, one shuffle per round; oracle = recursive CTE).
  - CANONICALIZATION: earliest mention (min mention_id) donates the
    surviving name.

Scale shape: mention generation is a projection; the block join shuffles
on the block key (salt hot blocks via functions/skew at 100 TB); closure
rounds are one shuffle each over EDGES (match pairs, not mentions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table

ER_LEV_MAX = 2

# one SQL fragment per variant, shared verbatim by both engines (substr /
# || / % behave identically on these inputs in Spark SQL and DuckDB)
_MENTION_FRAGMENTS = [
    ("CAST(c_custkey * 4 AS BIGINT)", "c_name"),
    (
        "CAST(c_custkey * 4 + 1 AS BIGINT)",
        "substr(c_name, 1, CAST(c_custkey % 8 AS INTEGER)) || "
        "substr(c_name, CAST(c_custkey % 8 AS INTEGER) + 2)",
    ),
    (
        "CAST(c_custkey * 4 + 2 AS BIGINT)",
        "substr(c_name, 1, CAST((c_custkey * 3) % 8 AS INTEGER) + 1) || "
        "substr(c_name, CAST((c_custkey * 3) % 8 AS INTEGER) + 1, 1) || "
        "substr(c_name, CAST((c_custkey * 3) % 8 AS INTEGER) + 2)",
    ),
    ("CAST(c_custkey * 4 + 3 AS BIGINT)", "'Custmoer' || substr(c_name, 9)"),
]

_MENTIONS_SQL = " UNION ALL ".join(
    f"SELECT {mid} AS mention_id, {name} AS name FROM customer"
    for mid, name in _MENTION_FRAGMENTS
)


def _er_oracle() -> str:
    return f"""
WITH RECURSIVE mentions AS ({_MENTIONS_SQL}),
keyed AS (
    SELECT mention_id, name,
           CAST(right(name, 9) AS BIGINT) AS acct,
           CAST(right(name, 9) AS BIGINT) // 10 AS blk
    FROM mentions
),
pairs AS (
    SELECT a.mention_id AS ma, b.mention_id AS mb
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.mention_id < b.mention_id
    WHERE a.acct = b.acct AND levenshtein(a.name, b.name) <= {ER_LEV_MAX}
),
edges AS (SELECT ma AS src, mb AS dst FROM pairs
          UNION ALL SELECT mb, ma FROM pairs),
reach AS (
    SELECT mention_id AS node, mention_id AS lab FROM keyed
    UNION
    SELECT e.src AS node, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
comp AS (SELECT node, MIN(lab) AS entity_id FROM reach GROUP BY node)
SELECT k.mention_id, k.name, CAST(c.entity_id AS BIGINT) AS entity_id,
       canon.name AS canonical_name,
       CAST(cnt.n AS BIGINT) AS n_mentions
FROM keyed k
JOIN comp c ON c.node = k.mention_id
JOIN keyed canon ON canon.mention_id = c.entity_id
JOIN (SELECT entity_id, COUNT(*) AS n FROM comp GROUP BY entity_id) cnt
  ON cnt.entity_id = c.entity_id"""


@register(
    "er_resolve_customers",
    _er_oracle(),
    doc=f"Entity resolution end-to-end: 4 deterministic mention variants "
    "per customer (edits in the name prefix; the 9-digit account suffix "
    "is the extractable normalized key) -> block on account div 10 "
    "(equi-join, ~40 mentions/block) -> match on same account + "
    f"levenshtein <= {ER_LEV_MAX} -> transitive closure via min-label "
    "propagation (variants sit up to lev 3 apart, so clusters only "
    "assemble through the exact-record hub) -> earliest mention donates "
    "the canonical name. EXACT oracle: the same pipeline with a "
    "recursive-CTE closure.",
)
def q_er_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .components import connected_components

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    mentions = None
    for mid, name in _MENTION_FRAGMENTS:
        part = cust.selectExpr(f"{mid} AS mention_id", f"{name} AS name")
        mentions = part if mentions is None else mentions.unionByName(part)
    keyed = mentions.selectExpr(
        "mention_id",
        "name",
        "CAST(right(name, 9) AS BIGINT) AS acct",
        "CAST(right(name, 9) AS BIGINT) div 10 AS blk",
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.mention_id") < F.col("b.mention_id")),
        )
        .filter(
            (F.col("a.acct") == F.col("b.acct"))
            & (F.levenshtein(F.col("a.name"), F.col("b.name")) <= ER_LEV_MAX)
        )
        .select(
            F.col("a.mention_id").alias("ma"), F.col("b.mention_id").alias("mb")
        )
    )
    comp = connected_components(pairs, "ma", "mb").withColumnRenamed(
        "component_id", "entity_id"
    )
    # closure only labels mentions that HAVE an edge; isolated mentions
    # resolve to themselves
    labeled = (
        keyed.join(comp, keyed.mention_id == comp.node, "left")
        .select(
            "mention_id",
            "name",
            F.coalesce("entity_id", "mention_id").alias("entity_id"),
        )
    )
    canon = labeled.join(
        keyed.select(
            F.col("mention_id").alias("entity_id"),
            F.col("name").alias("canonical_name"),
        ),
        "entity_id",
    )
    sizes = labeled.groupBy("entity_id").agg(F.count("*").alias("n_mentions"))
    # no broadcast hint: `sizes` is entity-sized (~one row per customer),
    # so pinning it to the driver contradicts the scale contract — a plain
    # key join lets Catalyst pick (and AQE re-pick) the strategy at any |R|
    return canon.join(sizes, "entity_id").select(
        "mention_id", "name", "entity_id", "canonical_name", "n_mentions"
    )


# ---------------------------------------------------------------------------
# Block-size-capped ER (r10) — the at-scale blocking discipline the r9
# Zipf row documented but did not ship: a blocking key whose groups grow
# unboundedly (one account behind millions of mentions) makes the
# within-block pair join emit O(B^2) candidates. The capped variant
# generates a REPRESENTATIVE STAR instead of the clique: the ER_CAP
# earliest mentions of each (block, account) group pair with every later
# mention of the group, so candidates are O(ER_CAP * B) per group — linear
# in the hot key, never quadratic. Transitivity is restored by the same
# closure step (two mentions that both match a representative merge
# through it). The cap is a RECALL trade by construction (a mention
# matching no representative stays unresolved — the standard
# canopy/representative-blocking behavior); the oracle replays the
# identical capped recurrence, so the registered result is EXACT, and the
# trade itself is pinned by the shared closure semantics, not hidden.
#
# Representatives are computed with two map-side-combined MIN aggregates
# (min id, then min id above it), NOT a per-group window or collect_list —
# ranking inside a (block, account) group would funnel the hot group
# through one task, the very shape the cap exists to avoid.
# ---------------------------------------------------------------------------

ER_CAP = 2  # representatives per (block, account) group


def _er_capped_oracle() -> str:
    return f"""
WITH RECURSIVE mentions AS ({_MENTIONS_SQL}),
keyed AS (
    SELECT mention_id, name,
           CAST(right(name, 9) AS BIGINT) AS acct,
           CAST(right(name, 9) AS BIGINT) // 10 AS blk
    FROM mentions
),
reps AS (
    SELECT mention_id, name, acct, blk FROM (
        SELECT mention_id, name, acct, blk,
               ROW_NUMBER() OVER (PARTITION BY blk, acct
                                  ORDER BY mention_id) AS rn
        FROM keyed
    ) WHERE rn <= {ER_CAP}
),
pairs AS (
    SELECT r.mention_id AS ma, m.mention_id AS mb
    FROM reps r JOIN keyed m
      ON r.blk = m.blk AND r.acct = m.acct
     AND r.mention_id < m.mention_id
    WHERE levenshtein(r.name, m.name) <= {ER_LEV_MAX}
),
edges AS (SELECT ma AS src, mb AS dst FROM pairs
          UNION ALL SELECT mb, ma FROM pairs),
reach AS (
    SELECT mention_id AS node, mention_id AS lab FROM keyed
    UNION
    SELECT e.src AS node, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
comp AS (SELECT node, MIN(lab) AS entity_id FROM reach GROUP BY node)
SELECT k.mention_id, k.name, CAST(c.entity_id AS BIGINT) AS entity_id,
       canon.name AS canonical_name,
       CAST(cnt.n AS BIGINT) AS n_mentions
FROM keyed k
JOIN comp c ON c.node = k.mention_id
JOIN keyed canon ON canon.mention_id = c.entity_id
JOIN (SELECT entity_id, COUNT(*) AS n FROM comp GROUP BY entity_id) cnt
  ON cnt.entity_id = c.entity_id"""


def _keyed_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    mentions = None
    for mid, name in _MENTION_FRAGMENTS:
        part = cust.selectExpr(f"{mid} AS mention_id", f"{name} AS name")
        mentions = part if mentions is None else mentions.unionByName(part)
    return mentions.selectExpr(
        "mention_id",
        "name",
        "CAST(right(name, 9) AS BIGINT) AS acct",
        "CAST(right(name, 9) AS BIGINT) div 10 AS blk",
    )


@register(
    "er_resolve_customers_capped",
    _er_capped_oracle(),
    doc=f"BLOCK-SIZE-CAPPED entity resolution (r10 scale twin of "
    f"er_resolve_customers): candidate pairs come from a representative "
    f"STAR — the {ER_CAP} earliest mentions of each (block, account) "
    f"group pair with every later group member — so a hot key emits "
    f"O({ER_CAP} x B) candidates instead of the clique's O(B^2), the "
    "at-scale discipline the uncapped variant's SCALING row documents. "
    "Representatives are found with two map-side MIN aggregates (no "
    "per-group window, no collect_list — nothing group-sized crosses one "
    "task); the same min-label closure restores transitive clusters "
    "through the representatives. EXACT oracle: the identical capped "
    "recurrence (ROW_NUMBER-capped reps + star join + recursive-CTE "
    "closure). On this fixture the clusters equal the uncapped variant's "
    "(every variant matches the exact-record representative); in general "
    "the cap trades recall for boundedness — the declared production "
    "trade.",
)
def q_er_resolve_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .components import connected_components

    keyed = _keyed_mentions(spark, sf_dir)
    # two bounded aggregates pick the ER_CAP smallest mention_ids per
    # (blk, acct): min, then min-above-previous — each a map-side-combined
    # hash agg, output one row per group per round
    rep_ids = keyed.groupBy("blk", "acct").agg(
        F.min("mention_id").alias("rep_id")
    )
    picked = rep_ids
    for _ in range(ER_CAP - 1):
        nxt = (
            keyed.join(
                picked.groupBy("blk", "acct").agg(
                    F.max("rep_id").alias("_prev")
                ),
                ["blk", "acct"],
            )
            .filter(F.col("mention_id") > F.col("_prev"))
            .groupBy("blk", "acct")
            .agg(F.min("mention_id").alias("rep_id"))
        )
        picked = picked.unionByName(nxt)
    reps = picked.join(
        keyed.select(
            F.col("mention_id").alias("rep_id"), "blk", "acct",
            F.col("name").alias("rep_name"),
        ),
        ["blk", "acct", "rep_id"],
    )
    pairs = (
        reps.join(keyed, ["blk", "acct"])
        .filter(
            (F.col("rep_id") < F.col("mention_id"))
            & (F.levenshtein(F.col("rep_name"), F.col("name")) <= ER_LEV_MAX)
        )
        .select(F.col("rep_id").alias("ma"), F.col("mention_id").alias("mb"))
    )
    comp = connected_components(pairs, "ma", "mb").withColumnRenamed(
        "component_id", "entity_id"
    )
    labeled = keyed.join(comp, keyed.mention_id == comp.node, "left").select(
        "mention_id",
        "name",
        F.coalesce("entity_id", "mention_id").alias("entity_id"),
    )
    canon = labeled.join(
        keyed.select(
            F.col("mention_id").alias("entity_id"),
            F.col("name").alias("canonical_name"),
        ),
        "entity_id",
    )
    sizes = labeled.groupBy("entity_id").agg(F.count("*").alias("n_mentions"))
    return canon.join(sizes, "entity_id").select(
        "mention_id", "name", "entity_id", "canonical_name", "n_mentions"
    )
