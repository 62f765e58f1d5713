"""Similarity search over the ``embeddings`` table (array<float> column).

- ``similarity_topk_bruteforce`` — exact top-k cosine neighbors for a query
  set: broadcast the queries, scan the corpus once, window-rank. The
  correctness baseline and the right plan when the query set is small: at
  100 TB the corpus scan parallelizes perfectly and nothing shuffles except
  the tiny per-query top-k heaps.
- ``similarity_ivf_topk`` — IVF-style approximate search: deterministic
  "centroids" (a fixed, shareable choice: the first n_list vectors), assign
  every corpus vector to its nearest centroid (one broadcast pass), then
  search only the query's probe cluster. The scale path: turns a full scan
  into a 1/n_list partition-pruned scan, the classic recall/latency trade.

All cosine math is the double-exact sequential fold from functions.vectors
(bit-identical to the DuckDB oracle — see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..plans.registry import register
from ..sources import load_table

N_QUERIES = 20  # query set: vec_id < 20
TOP_K = 5
N_LIST = 8  # IVF clusters: centroids = vec_id < 8


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("v")
    )


@register(
    "similarity_topk_bruteforce",
    f"""
WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
queries AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.qid, c.vec_id AS neighbor_id,
           {V.cosine_sql('q.qv', 'c.embedding')} AS cos
    FROM queries q JOIN corpus c ON c.vec_id <> q.qid
)
SELECT qid, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
) WHERE rank <= {TOP_K}""",
    doc=f"Exact brute-force cosine top-{TOP_K} for {N_QUERIES} query vectors: "
    "broadcast queries × one corpus scan + per-query window top-k "
    "(no global sort).",
)
def q_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


_IVF_ASSIGN_CTE = f"""
centroids AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {N_LIST}),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.cosine_sql('e.embedding', 'c.cv')} DESC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN centroids c
    ) WHERE rn = 1
)"""


@register(
    "similarity_ivf_topk",
    f"""
WITH {_IVF_ASSIGN_CTE},
queries AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
qassign AS (SELECT a.vec_id AS qid, a.cid FROM assign a WHERE a.vec_id < {N_QUERIES}),
scored AS (
    SELECT q.qid, e.vec_id AS neighbor_id,
           {V.cosine_sql('q.qv', 'e.embedding')} AS cos
    FROM queries q
    JOIN qassign qa ON qa.qid = q.qid
    JOIN assign a ON a.cid = qa.cid AND a.vec_id <> q.qid
    JOIN embeddings e ON e.vec_id = a.vec_id
)
SELECT qid, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
) WHERE rank <= {TOP_K}""",
    doc=f"IVF-style ANN: {N_LIST} deterministic centroids, nearest-centroid "
    "assignment (broadcast pass), search restricted to the query's cluster "
    f"→ top-{TOP_K}. Approximate by construction; the partition-pruned "
    "scale path for corpus-sized query loads.",
)
def q_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_search(spark, sf_dir, nprobe=1)


N_PROBE = 2


@register(
    "similarity_ivf_multiprobe",
    f"""
WITH {_IVF_ASSIGN_CTE},
queries AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
qprobe AS (
    SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY {V.cosine_sql('q.qv', 'c.cv')} DESC, c.cid ASC) AS rn
        FROM queries q CROSS JOIN centroids c
    ) WHERE rn <= {N_PROBE}
),
scored AS (
    SELECT DISTINCT q.qid, a.vec_id AS neighbor_id,
           {V.cosine_sql('q.qv', 'e.embedding')} AS cos
    FROM queries q
    JOIN qprobe p ON p.qid = q.qid
    JOIN assign a ON a.cid = p.cid AND a.vec_id <> q.qid
    JOIN embeddings e ON e.vec_id = a.vec_id
)
SELECT qid, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
) WHERE rank <= {TOP_K}""",
    doc=f"Multi-probe IVF: search the query's {N_PROBE} nearest clusters "
    f"instead of 1 — the standard recall lever (recall→1 as nprobe→n_list "
    "while cost stays nprobe/n_list of a full scan).",
)
def q_topk_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_search(spark, sf_dir, nprobe=N_PROBE)


def _ivf_search(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    centroids = corpus.filter(F.col("vec_id") < N_LIST).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # nearest-centroid assignment: corpus × broadcast(centroids) → argmax
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    ranked = (
        corpus.crossJoin(F.broadcast(centroids))
        .select("vec_id", "v", "cid", V.cosine(F.col("v"), F.col("cv")).alias("cos_c"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "v", "cid")
    # probe set: the query's nprobe nearest centroids (same ordering)
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("rn") <= nprobe))
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cid")
    )
    scored = (
        assign.join(
            F.broadcast(probes),
            (assign.cid == probes.cid) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation — the
# billion-vector ANN memory-compression path, expressed relationally
# ---------------------------------------------------------------------------

M_SUB = 8  # subspaces
SUB_DIM = 8  # 64-dim vectors → 8 × 8-dim subvectors
K_PQ = 32  # codewords per subspace (Lloyd-trained, seeded from first K_PQ)
PQ_TRAIN_ITERS = 3  # Lloyd iterations per subspace (trained jointly)
RERANK_FACTOR = 20  # exact-rerank shortlist = RERANK_FACTOR × TOP_K


def _train_pq_codebook(subs: DataFrame, iterations: int = PQ_TRAIN_ITERS) -> DataFrame:
    """(sub, code, cw) — per-subspace K_PQ-codeword codebook, Lloyd-trained.

    All M_SUB subspaces train JOINTLY in one relation: the subspace id is
    simply part of the grouping key, so each iteration is one broadcast
    join (the codebook is M_SUB x K_PQ x SUB_DIM — tiny at any corpus
    scale) plus one dim-mean shuffle over (vec_id, sub) rows — not a
    per-subspace driver loop. Seeded deterministically from the first K_PQ
    corpus vectors (the old untrained codebook = iteration 0); empty
    clusters keep their previous codeword. Lineage cut per round with
    localCheckpoint, same hygiene as operators/clustering.kmeans.
    """
    sq_d = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    codebook = subs.filter(F.col("vec_id") < K_PQ).select(
        "sub", F.col("vec_id").cast("int").alias("code"), F.col("sv").alias("cw")
    )
    for _ in range(iterations):
        assigned = (
            subs.join(F.broadcast(codebook), "sub")
            .select("vec_id", "sub", "code", "sv", sq_d.alias("d2"))
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by("code", F.struct("d2", "code")).alias("code"),
                F.first("sv").alias("sv"),
            )
        )
        means = (
            assigned.select("sub", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("new_cw")
            )
        )
        codebook = (
            codebook.join(means, ["sub", "code"], "left")
            .select(
                "sub", "code", F.coalesce("new_cw", "cw").alias("cw")
            )
            .localCheckpoint(eager=True)
        )
    return codebook


@register(
    "similarity_pq_topk",
    None,  # approximate by construction — rows-only; recall pinned in pytest
    doc=f"PQ-ADC top-{TOP_K}: vectors compress to {M_SUB} codebook ids "
    f"({M_SUB}x{K_PQ} codewords = 40 bits/vector vs 64x8 bytes raw - the "
    "memory lever "
    "that fits billions of vectors in RAM). The codebook is Lloyd-trained "
    f"per subspace ({PQ_TRAIN_ITERS} joint iterations — subspace id is just "
    "a grouping key, so training is one broadcast join + one dim-mean "
    "shuffle per round, not a per-subspace loop). Encoding is a "
    "per-subspace argmin (min_by over a broadcast codebook join); query "
    "scoring is "
    "ASYMMETRIC distance: a tiny (qid, subspace, code) partial-IP lookup "
    "table broadcasts, joins the code relation, and one hash aggregate "
    "sums the approximate cosine — no per-pair vector math anywhere. An "
    f"exact-cosine rerank of the top {RERANK_FACTOR}×{TOP_K} shortlist "
    "restores ordering quality. Everything is joins + hash aggregates: "
    "the plan Catalyst already knows how to scale.",
)
def q_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    nv = corpus.select(
        "vec_id",
        F.transform("v", lambda x: x / V.norm(F.col("v"))).alias("v"),
    )
    # (vec_id, sub, sv): 8-dim subvector per subspace — slice is 1-indexed
    subs = nv.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("sub"),
                        F.slice("v", m * SUB_DIM + 1, SUB_DIM).alias("sv"),
                    )
                    for m in range(M_SUB)
                ]
            )
        ).alias("p"),
    ).select("vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))
    codebook = _train_pq_codebook(subs)
    sq_dist = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # encode: nearest codeword per (vector, subspace) — ties to lowest code
    enc = (
        subs.join(F.broadcast(codebook), "sub")
        .select("vec_id", "sub", "code", sq_dist.alias("d2"))
        .groupBy("vec_id", "sub")
        .agg(F.min_by("code", F.struct("d2", "code")).alias("code"))
    )
    # ADC lookup table: partial inner product of each query subvector with
    # each codeword — N_QUERIES × M_SUB × K_PQ rows, trivially broadcastable
    table = (
        subs.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(codebook), "sub")
        .select(
            F.col("vec_id").alias("qid"),
            "sub",
            "code",
            V.dot(F.col("sv"), F.col("cw")).alias("part_ip"),
        )
    )
    approx = (
        enc.join(F.broadcast(table), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("part_ip").alias("approx_cos"))
    )
    w_approx = Window.partitionBy("qid").orderBy(
        F.desc("approx_cos"), F.asc("vec_id")
    )
    shortlist = (
        approx.withColumn("rn", F.row_number().over(w_approx))
        .filter(F.col("rn") <= RERANK_FACTOR * TOP_K)
        .select("qid", "vec_id")
    )
    # exact rerank of the shortlist only
    qv = nv.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qvec")
    )
    cv = nv.select("vec_id", F.col("v").alias("nvec"))
    w_exact = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        shortlist.join(cv, "vec_id")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            V.dot(F.col("qvec"), F.col("nvec")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w_exact))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )
