"""Near-duplicate clustering: connected components over the verified
MinHash-LSH pair graph, by iterative min-label propagation — the
GraphX/Pregel pattern expressed in plain DataFrame ops.

Dedup pipelines need *clusters*, not pairs (A~B, B~C ⇒ {A,B,C} keeps one
survivor). Label propagation converges to the unique fixpoint
label(x) = min(doc_id of x's component), so the result is deterministic
regardless of iteration or partition order — which is what makes a
recursive-CTE oracle possible.

Scale: each iteration is one shuffle (edges ⋈ labels, groupBy min);
``localCheckpoint`` truncates lineage per round (the standard iterative-
algorithm hygiene — without it the plan doubles every iteration). Rounds
needed = graph diameter, logarithmic with doubling variants; near-dup
graphs are shallow (tiny cliques), so a handful of rounds suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .dedup import _minhash_ctes, q_dedup_minhash

MAX_ITERATIONS = 15


def connected_components(pairs: DataFrame, a: str = "da", b: str = "db") -> DataFrame:
    """(node, component_id) for every node in the pair graph;
    component_id = min node id in the component."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(MAX_ITERATIONS):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # min-label propagation strictly decreases the label sum until the
        # fixpoint — one scalar per round instead of a full diff join
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("component_id"))


def _components_sql() -> str:
    # reuse the minhash pipeline CTEs; DuckDB lets WITH RECURSIVE cover a
    # mixed recursive/non-recursive CTE list. reach = transitive closure of
    # (node, reachable-label); MIN per node = the component id.
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT da AS src, db AS dst FROM minhash_pairs
          UNION ALL SELECT db, da FROM minhash_pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT e.src AS node, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node, CAST(MIN(lab) AS BIGINT) AS component_id
FROM reach GROUP BY node
"""


@register(
    "dedup_components",
    _components_sql(),
    doc="Connected components over the verified MinHash near-dup pairs via "
    "iterative min-label propagation (one shuffle/round, localCheckpoint "
    "lineage truncation) — clusters near-dups so one survivor per group "
    "remains. Oracle: recursive-CTE transitive closure.",
)
def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_dedup_minhash(spark, sf_dir)
    return connected_components(pairs)
