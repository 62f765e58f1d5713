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

from pyspark.sql import DataFrame, SparkSession, Window
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
) -> tuple[DataFrame, DataFrame]:
    """PageRank over a directed edge list — the canonical iterative
    fixpoint in pure DataFrame ops: per round, every node's rank is
    redistributed along its out-edges, damped, and summed at the sink.

    Scale mechanics: the (src, dst) edge relation and the out-degree
    relation stay partitioned on src across every round, so each
    iteration is ONE shuffle (the sink-side sum); ``localCheckpoint``
    every few rounds cuts the growing lineage that would otherwise make
    round N replan rounds 1..N-1 (same discipline as
    connected_components above). Dangling nodes keep the base rank.

    Returns ``(ranks, prev_ranks)`` — the final vector plus the one the
    last update step read from, which is what lets the contract oracle
    re-verify the final round's update equation independently."""
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
    prev = ranks
    for i in range(iterations):
        if i == iterations - 1:
            # pin the vector the final update reads from (one extra
            # materialization total — the per-round cadence is unchanged)
            ranks = ranks.localCheckpoint(eager=True)
        prev = ranks
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
    return ranks, prev


def _part_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lines.alias("a")
    b = lines.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )


@register(
    "graph_pagerank_parts",
    # r8 contract-oracle conversion: rank values are a float fixpoint
    # (shuffle-order-dependent sums → not hashable), so the CHECKED OUTPUT
    # is the audit that holds for any correct PageRank: the row set is the
    # SQL-recomputable node set (every part with a co-order partner —
    # catches dropped/duplicated nodes), and the booleans assert per node
    # that the final rank satisfies the round's update equation
    # rank = (1-d) + d*Σ prev_rank/outdeg over in-edges (recomputed
    # independently from the previous round's vector, 1e-9 band) and the
    # damped floor rank >= 1-d.
    """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         nodes AS (SELECT DISTINCT a.l_partkey AS node
                   FROM lp a JOIN lp b
                   ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey <> b.l_partkey)
       SELECT CAST(node AS BIGINT) AS node,
              TRUE AS update_eq_ok,
              TRUE AS rank_floor_ok
       FROM nodes""",
    doc="PageRank (10 rounds, d=0.85) over the part co-occurrence graph "
    "(parts sharing an order, both directions — the j10 basket relation "
    "as edges): 'central' catalog parts by recursive importance, the "
    "iterative-fixpoint operator family done Spark-right — one shuffle "
    "per round on a co-partitioned edge relation, localCheckpoint every "
    "3 rounds to cut lineage. CHECKED OUTPUT (r8 conversion): per-node "
    "final-round update-equation and damped-floor audits on exactly the "
    "SQL-derived node set; the ranked top-50 product stays available as "
    "q_pagerank_parts for the pytest invariants.",
)
def q_pagerank_parts_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the heavy distinct-lineitem self-join ONCE: pagerank's
    # internal checkpoint re-reads these cached blocks, and the audit's
    # deg/inflow subtrees below reuse them instead of re-running the join
    pairs = _part_cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    ranks, prev = pagerank(pairs, iterations=10)
    e = pairs.select("src", "dst")
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    inflow = (
        e.join(prev.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("inflow"))
    )
    expected = F.lit(0.15) + F.lit(0.85) * F.coalesce(
        F.col("inflow"), F.lit(0.0)
    )
    return (
        ranks.join(inflow, "node", "left")
        .select(
            "node",
            (F.abs(F.col("rank") - expected) < 1e-9).alias("update_eq_ok"),
            (F.col("rank") >= 0.15 - 1e-12).alias("rank_floor_ok"),
        )
    )


def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranked product (top-50 parts by rank, total-order tie-break) —
    kept un-registered since rank floats can't hash-match."""
    ranks, _ = pagerank(_part_cooccurrence_edges(spark, sf_dir), iterations=10)
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Triangle counting — the classic distributed graph-analytics kernel
# ---------------------------------------------------------------------------

_TRI_SUPPORT = 2  # an edge is a REPEATED co-purchase, not a chance collision

_TRI_EDGES = f"""
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_SUPPORT}
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
    f"co-purchase graph. Two scale levers compose: (1) edges require "
    f"SUPPORT >= {_TRI_SUPPORT} co-occurrences — a repeated co-purchase, "
    "not a chance basket collision — which is both the market-basket "
    "convention and the graph sparsifier (1.2M chance edges -> 3.6k "
    "support-2 edges at sf0.1); (2) DEGREE-ORDERED orientation: each "
    "edge points from its lower-(degree, id) endpoint to the higher, so "
    "every triangle has exactly one pivot with two out-edges and is "
    "enumerated exactly once, with out-degrees O(sqrt(m)) amortized — "
    "wedge fan-out capped at O(m^1.5) instead of sum(deg^2) on skewed "
    "graphs. All equi-joins: wedge generation shuffles on the pivot "
    "vertex, closure is a hash semi-probe into the undirected edge set. "
    "The oracle counts the same triangles via plain a<b<c id ordering — "
    "orientation changes the enumeration schedule, never the counts.",
)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return triangle_counts_from_baskets(li)


def triangle_counts_from_baskets(li: DataFrame) -> DataFrame:
    """The full support-threshold + degree-orientation pipeline over any
    (l_orderkey, l_partkey) basket relation — factored out so
    tools/triangle_scale_measure.py can drive it with realistic-growth
    synthetic baskets (fresh keys, constant pair density) as well as the
    registered lineitem query."""
    edges = support_edges_from_baskets(li)
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("v").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("pb"), F.col("d").alias("db"))
    # orient lower-(degree, id) -> higher; ties broken by id, so the
    # ordering is total and each triangle has exactly one pivot
    with_deg = edges.join(da, "pa").join(db, "pb")
    fwd = F.struct("da", "pa") < F.struct("db", "pb")
    directed = with_deg.select(
        F.when(fwd, F.col("pa")).otherwise(F.col("pb")).alias("u"),
        F.when(fwd, F.col("pb")).otherwise(F.col("pa")).alias("w"),
    )
    d1 = directed.alias("d1")
    d2 = directed.alias("d2")
    # wedges at the pivot: two out-neighbors, id-ordered so the closure
    # probe matches the canonical undirected key exactly once
    wedges = (
        d1.join(d2, F.col("d1.u") == F.col("d2.u"))
        .filter(F.col("d1.w") < F.col("d2.w"))
        .select(
            F.col("d1.u").alias("u"),
            F.col("d1.w").alias("x"),
            F.col("d2.w").alias("y"),
        )
    )
    closer = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    tri = wedges.join(closer, ["x", "y"])
    # r16 (guide §2.4): each triangle credits its three vertices via ONE
    # explode instead of a 3-way unionAll of the tri subtree — a UNION
    # re-executes the closure JOIN per branch (AQE reuses exchanges, not
    # join operators), so the old shape paid the wedge-closure probe three
    # times. Row-identical by construction (u, x, y emitted once each).
    v = tri.select(F.explode(F.array("u", "x", "y")).alias("part"))
    return v.groupBy(F.col("part").alias("l_partkey")).agg(
        F.count("*").alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance — the landmark-distance graph kernel
# ---------------------------------------------------------------------------

BFS_MAX_HOPS = 4
BFS_N_SEEDS = 3


@register(
    "graph_bfs_hops",
    f"""
WITH RECURSIVE e AS ({_TRI_EDGES}),
sym AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e),
seeds AS (SELECT DISTINCT src AS node FROM sym
          ORDER BY node LIMIT {BFS_N_SEEDS}),
walk AS (
    SELECT node, 0 AS d FROM seeds
    UNION ALL
    SELECT s.dst AS node, walk.d + 1 AS d
    FROM walk JOIN sym s ON s.src = walk.node
    WHERE walk.d < {BFS_MAX_HOPS}
)
SELECT node AS l_partkey, CAST(MIN(d) AS BIGINT) AS hops
FROM walk GROUP BY node
""",
    doc=f"Multi-source BFS over the support-thresholded co-purchase graph: "
    f"hop distance from the {BFS_N_SEEDS} lowest-id vertices (landmark "
    f"distances, the building block of sketch-based shortest-path "
    f"systems), capped at {BFS_MAX_HOPS} hops. Executed as frontier "
    "expansion — one equi-join + distinct + anti-join per hop, the "
    "Pregel superstep shape: the frontier (not the graph) drives "
    "per-round cost, visited-set anti-joins keep each vertex expanded "
    "once, and localCheckpoint truncates the iterative lineage. "
    "First-visit depth IS the minimum hop count (BFS invariant), which "
    "is exactly what the recursive-CTE oracle computes as MIN(d) over "
    "all bounded walks — hash-checked end to end, rare for an iterative "
    "graph operator.",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = support_edges_from_baskets(li)
    sym = edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    seeds = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(BFS_N_SEEDS)
    )
    visited = seeds.withColumn("hops", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for d in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("hops", F.lit(d))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select(F.col("node").alias("l_partkey"), F.col("hops").cast("long"))


# ---------------------------------------------------------------------------
# k-core decomposition — graph-based quality filtering (coreness per node)
# ---------------------------------------------------------------------------

KCORE_MAX_ROUNDS = 50


def _neighbor_core_hindex(sym: DataFrame, core: DataFrame) -> DataFrame:
    """(node, h) where h = H-index of each node's multiset of neighbor
    cores — the COUNTING form: H = max over present core values c of
    min(c, N(>=c)), with N(>=c) a per-node descending cumulative count.

    Deliberately NOT collect_list: on a power-law graph the max-degree
    vertex's neighbor-core array is O(degree) in ONE row (10^8 elements
    at web scale -> executor OOM). Here no row ever exceeds O(1) state:
    the (node, core) count is a map-side-combined hash aggregate, the
    cumulative sum is a sort window whose per-node partition holds
    O(distinct neighbor-core VALUES) rows (bounded by max coreness, not
    degree — a 10^8-degree hub with cores in [1, 200] contributes <= 200
    rows), and the final max is another hash aggregate.

    Correctness of the value formula: for any present c, min(c, N(>=c))
    <= H (if c <= H trivially; if c > H then N(>=c) <= N(>=H+1) < H+1);
    and the smallest present value c* >= H attains it (N(>=c*) = N(>=H)
    >= H). Both checked by the hypothesis fuzz + independent peeling
    pins in tests/test_extensions.py."""
    w = (
        Window.partitionBy("src")
        .orderBy(F.desc("core"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sym.join(core, sym.dst == core.node)
        .groupBy("src", "core")
        .agg(F.count("*").alias("_n"))
        .withColumn("_n_ge", F.sum("_n").over(w))
        .groupBy("src")
        .agg(
            F.max(F.least(F.col("core"), F.col("_n_ge")))
            .cast("long")
            .alias("h")
        )
    )


def kcore(edges: DataFrame, a: str = "pa", b: str = "pb") -> DataFrame:
    """(node, core) for an undirected canonical edge list — coreness via
    the H-index fixpoint (Lu et al. 2016): init core = degree, iterate
    core(v) = H({core(u) : u ~ v}). Iterates are integer, monotone
    non-increasing, and bounded below by the true coreness, so the loop
    terminates AT the coreness; the scalar core-sum detects the fixpoint
    (one number per round, same trick as connected_components).

    Scale: each round is one join + two hash aggregates + one
    short-partition sort window over EDGES (see
    :func:`_neighbor_core_hindex` — no per-node state is ever
    O(degree), so a power-law hub cannot OOM an executor); lineage cut
    per round with localCheckpoint."""
    fwd = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    sym = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    core = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("core"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(KCORE_MAX_ROUNDS):
        h = _neighbor_core_hindex(sym, core)
        core = (
            core.join(h, core.node == h.src)
            .select("node", F.least("core", "h").alias("core"))
            .localCheckpoint(eager=True)
        )
        cur_sum = core.agg(F.sum("core")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # H-index iteration needs O(graph diameter) rounds; falling off
        # the cap returns UPPER BOUNDS, not coreness — fail loudly rather
        # than hand non-converged values to the pytest pins and scale
        # tools that bypass the registered fixpoint audit
        raise RuntimeError(
            f"kcore: no fixpoint after {KCORE_MAX_ROUNDS} rounds "
            "(graph diameter exceeds the cap; raise KCORE_MAX_ROUNDS)"
        )
    return core


@register(
    "graph_kcore_parts",
    # Contract oracle (coreness is deterministic but not expressible in a
    # recursive CTE): the row set is the SQL-derived node set of the
    # support-thresholded co-purchase graph, and the booleans assert the
    # defining fixpoint per node — core(v) equals the H-index of its
    # neighbors' cores (the unique fixpoint reached from degree init IS
    # the coreness, Lu et al. 2016) and core(v) <= degree(v). Exact
    # coreness is separately pinned in pytest against an independent
    # pure-Python min-degree peeling.
    f"""WITH e AS ({_TRI_EDGES}),
    nodes AS (SELECT pa AS node FROM e UNION SELECT pb AS node FROM e)
    SELECT CAST(node AS BIGINT) AS node,
           TRUE AS hindex_fixpoint_ok,
           TRUE AS core_le_degree_ok
    FROM nodes""",
    doc=f"k-core decomposition (coreness per part) over the support-"
    f"{_TRI_SUPPORT} co-purchase graph — graph-based quality filtering: "
    "high-core nodes sit in densely interconnected regions, the signal "
    "spam/fringe filtering uses. H-index fixpoint iteration in the "
    "COUNTING form (r9): per round one join, a map-side-combined "
    "(node, core) count, a per-node cumulative window over O(distinct "
    "core values) rows, and a hash max — no row ever holds O(degree) "
    "state, so power-law hubs cannot OOM an executor (the r8 "
    "collect_list form could). CHECKED OUTPUT: per-node fixpoint + "
    "core<=degree audits on the SQL-derived node set; exact coreness "
    "pinned in pytest vs independent peeling.",
)
def q_kcore_parts_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin the heavy distinct+self-join edge relation: it feeds kcore()'s
    # rounds AND the audit's deg/h branches (same play as the pagerank
    # audit's localCheckpoint'ed `pairs`)
    edges = _support_edges(spark, sf_dir).localCheckpoint(eager=True)
    core = kcore(edges)
    fwd = edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    sym = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    # one more H application must be the identity at the fixpoint
    h = _neighbor_core_hindex(sym, core).withColumnRenamed("src", "node")
    return (
        core.join(h, "node")
        .join(deg, "node")
        .select(
            "node",
            (F.col("core") == F.col("h")).alias("hindex_fixpoint_ok"),
            (F.col("core") <= F.col("deg")).alias("core_le_degree_ok"),
        )
    )


def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw (node, core) coreness relation — the product; un-registered
    (coreness is not recursive-CTE-expressible), exact values pinned in
    pytest vs independent peeling."""
    return kcore(_support_edges(spark, sf_dir))


def _support_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (pa < pb) support-thresholded co-purchase edges — the
    same relation _TRI_EDGES derives in SQL."""
    from ..sources import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return support_edges_from_baskets(li)


def support_edges_from_baskets(li: DataFrame) -> DataFrame:
    """THE support-thresholded co-purchase edge relation (canonical
    pa < pb, support >= _TRI_SUPPORT) from any (l_orderkey, l_partkey)
    basket relation — the single builder behind the triangle pipeline,
    the oriented-triangle query and the k-core family, so the support
    rule can never drift between them (was three inline copies)."""
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("_support"))
        .filter(F.col("_support") >= _TRI_SUPPORT)
        .select("pa", "pb")
    )
