"""Distributed k-means (Lloyd's algorithm) over the embeddings table —
the iterative-ML pattern in pure DataFrame ops (no MLlib dependency, no
RDDs): assignment = broadcast-centroids cross join + argmin window;
update = per-dimension mean via posexplode + rebuild.

Determinism: init = first k vectors by vec_id, ties in assignment break by
centroid id. Float means make exact cross-engine oracles impossible
(addition order), so the registry entry is rows-only; convergence is
pytest-pinned instead: inertia must decrease monotonically per iteration —
the property that defines Lloyd's.

Scale: per iteration, one broadcast (k×d centroids — tiny), one shuffle
(dim-wise mean). Lineage is cut per iteration with localCheckpoint, the
same hygiene as the connected-components loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..plans.registry import register
from ..sources import load_table

K = 8
ITERATIONS = 4


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v, cluster, sq_dist) — nearest centroid, ties by cid.

    Argmin as a map-side ``min_by`` hash aggregate over (d2, cid) — a
    row_number window over N single-vector partitions is a full
    sort-shuffle of the corpus, and this runs INSIDE the Lloyd loop, so
    the window cost multiplied by the iteration count (same fix as the
    IVF family, round 7)."""
    scored = points.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cid", _sq_dist(F.col("v"), F.col("cv")).alias("d2")
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),  # constant within the group
            F.min_by(
                F.struct(
                    F.col("cid").alias("cluster"), F.col("d2").alias("sq_dist")
                ),
                F.struct("d2", "cid"),
            ).alias("_b"),
        )
        .select("vec_id", "v", F.col("_b.cluster"), F.col("_b.sq_dist"))
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids = per-dimension means, rebuilt into arrays."""
    dims = assigned.select(
        "cluster", F.posexplode("v").alias("dim", "x")
    ).groupBy("cluster", "dim").agg(F.avg("x").alias("m"))
    return (
        dims.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        .select(F.col("cluster").alias("cid"), "cv")
    )


def kmeans(
    points: DataFrame, k: int = K, iterations: int = ITERATIONS
) -> tuple[DataFrame, list[float], DataFrame]:
    """Returns (assignment DataFrame, inertia per iteration, the (cid, cv)
    centroids the FINAL assignment was computed against — what the
    argmin-audit oracle needs)."""
    # init = the k lowest vec_ids (robust to non-contiguous ids, e.g. when
    # the caller collapsed exact-duplicate vectors first; identical to the
    # original vec_id < k rule on contiguous inputs). k rows — the window
    # runs on a k-row relation, not the full input.
    w_init = Window.orderBy("vec_id")
    centroids = (
        points.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).cast("int").alias("cid"),
            F.col("v").alias("cv"),
        )
    )
    inertias: list[float] = []
    assigned = None
    last_assign_centroids = centroids
    for i in range(iterations):
        if i == iterations - 1:
            # pin ONLY the final round's centroid frame (what the argmin
            # audit re-scores against) — same one-extra-materialization
            # pattern as pagerank's prev vector; earlier rounds keep
            # consuming centroids lazily inside the assign job
            centroids = centroids.localCheckpoint(eager=True)
        last_assign_centroids = centroids
        assigned = _assign(points, centroids).localCheckpoint(eager=True)
        inertias.append(assigned.agg(F.sum("sq_dist")).first()[0])
        centroids = _update(assigned)
    return (
        assigned.select("vec_id", "cluster", "sq_dist"),
        inertias,
        last_assign_centroids,
    )


@register(
    "kmeans_embeddings",
    # r8 contract-oracle conversion: the trained assignment itself is a
    # float-mean fixpoint (addition-order dependent → not hashable), so
    # the CHECKED OUTPUT is the audit that holds for any correct Lloyd
    # run — the row set is exactly the embeddings ids (catches dropped /
    # duplicated vectors), and the booleans assert, per vector, that the
    # assignment is the true (d2, cid)-argmin against the final
    # assignment round's centroid set with sq_dist the achieved minimum,
    # plus the corpus-level Lloyd contract (non-increasing inertia).
    """SELECT CAST(vec_id AS BIGINT) AS vec_id,
              TRUE AS argmin_ok,
              TRUE AS inertia_monotone_ok
       FROM embeddings""",
    doc=f"Distributed k-means (k={K}, {ITERATIONS} Lloyd iterations) on the "
    "embedding vectors: broadcast-centroid assignment + posexplode dim-mean "
    "update, localCheckpoint per round. CHECKED OUTPUT (r8 conversion): "
    "per-vector argmin validity against the final centroids + monotone "
    "inertia, on exactly the embeddings row set; the raw assignment stays "
    "available as q_kmeans for the pytest pins.",
)
def q_kmeans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    points = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("v")
    )
    assignment, inertias, centroids = kmeans(points)
    monotone = all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))
    # re-score every vector against every final-assignment centroid and
    # assert the recorded (cluster, sq_dist) is the strict (d2, cid)-min —
    # an independent argmin recomputation (min over a struct comparison),
    # not a replay of the min_by aggregate that produced it
    rescored = (
        points.join(assignment, "vec_id")
        .crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "cluster",
            "sq_dist",
            "cid",
            _sq_dist(F.col("v"), F.col("cv")).alias("d2"),
        )
    )
    per_vec = rescored.groupBy("vec_id").agg(
        # the assigned centroid achieves exactly the recorded distance...
        F.max(
            (F.col("cid") == F.col("cluster"))
            & (F.col("d2") == F.col("sq_dist"))
        ).alias("_achieved"),
        # ...and no centroid beats it under the (d2, cid) total order
        F.min(
            F.struct("d2", "cid")
            >= F.struct(
                F.col("sq_dist").alias("d2"), F.col("cluster").alias("cid")
            )
        ).alias("_unbeaten"),
    )
    return per_vec.select(
        "vec_id",
        (F.col("_achieved") & F.col("_unbeaten")).alias("argmin_ok"),
        F.lit(monotone).alias("inertia_monotone_ok"),
    )


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw trained assignment (vec_id, cluster, sq_dist) — the product
    relation; kept un-registered since float means can't hash-match."""
    points = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("v")
    )
    assignment, _, _ = kmeans(points)
    return assignment
