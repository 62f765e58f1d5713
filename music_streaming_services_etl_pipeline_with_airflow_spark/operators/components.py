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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list — the canonical iterative
    fixpoint in pure DataFrame ops: per round, every node's rank is
    redistributed along its out-edges, damped, and summed at the sink.

    Scale mechanics: the (src, dst) edge relation and the out-degree
    relation stay partitioned on src across every round, so each
    iteration is ONE shuffle (the sink-side sum); ``localCheckpoint``
    every few rounds cuts the growing lineage that would otherwise make
    round N replan rounds 1..N-1 (same discipline as
    connected_components above). Dangling nodes keep the base rank."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


@register(
    "graph_pagerank_parts",
    None,  # iterative float fixpoint — rows-only; invariants pinned by
    # tests/test_extensions.py::test_pagerank_invariants
    doc="PageRank (10 rounds, d=0.85) over the part co-occurrence graph "
    "(parts sharing an order, both directions — the j10 basket relation "
    "as edges): 'central' catalog parts by recursive importance, the "
    "iterative-fixpoint operator family done Spark-right — one shuffle "
    "per round on a co-partitioned edge relation, localCheckpoint every "
    "3 rounds to cut lineage. Returns top-50 by rank with a total-order "
    "tie-break.",
)
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lines.alias("a")
    b = lines.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    ranks = pagerank(pairs, iterations=10)
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Triangle counting — the classic distributed graph-analytics kernel
# ---------------------------------------------------------------------------

_TRI_EDGES = """
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


@register(
    "graph_triangle_counts",
    f"""
WITH e AS ({_TRI_EDGES}),
tri AS (
    SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
    FROM e e1
    JOIN e e2 ON e2.pa = e1.pb
    JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
v AS (
    SELECT a AS part FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT part AS l_partkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM v GROUP BY part
""",
    doc="Per-vertex triangle counting (the MapReduce graph-analytics "
    "classic, the clustering-coefficient numerator) over the part "
    "co-purchase graph: edges = distinct part pairs sharing an order, "
    "oriented a<b so each triangle is enumerated exactly once as "
    "a<b<c — wedges (e1.b=e2.a) closed by a hash semi-probe into the "
    "edge set (e3). All equi-joins: wedge generation shuffles on the "
    "shared vertex, closure on the (a, c) pair — never a cartesian. At "
    "scale the standard refinements slot in unchanged: orient edges "
    "low-degree->high-degree to cap wedge fan-out at O(m^1.5) and "
    "broadcast the top-degree adjacency; the oriented enumeration here "
    "is already the 6x-dedup half of that design.",
)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    v = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    return v.groupBy(F.col("part").alias("l_partkey")).agg(
        F.count("*").alias("n_triangles")
    )
