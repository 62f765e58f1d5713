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
PQ_TRAIN_SAMPLE = 65_536  # max vectors collected for quantizer training


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("v")
    )


_BRUTE_SQL = f"""
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
) WHERE rank <= {TOP_K}"""


@register(
    "similarity_topk_bruteforce",
    _BRUTE_SQL,
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


def _ivf_search(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int,
    centroids: DataFrame | None = None,
) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    if centroids is None:
        centroids = corpus.filter(F.col("vec_id") < N_LIST).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
    # nearest-centroid assignment: corpus × broadcast(centroids) → argmax
    # as a HASH AGGREGATE (max_by over (cos, -cid)) — a row_number window
    # over N single-vector partitions is a full sort-shuffle of the
    # corpus; the aggregate folds map-side (same row_number==1 semantics:
    # highest cos, lowest cid on ties)
    scored_c = corpus.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cid", V.cosine(F.col("v"), F.col("cv")).alias("cos_c")
    )
    assign = (
        scored_c.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),  # constant within the group
            F.max_by("cid", F.struct(F.col("cos_c"), -F.col("cid"))).alias("cid"),
        )
        .select("vec_id", "v", "cid")
    )
    # probe set: the query's nprobe nearest centroids (window is fine on
    # the N_QUERIES x N_LIST query slice)
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        scored_c.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
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
# Persisted IVF index — the "vector database" shape: the inverted lists live
# in the snapshot-table format, maintained incrementally, probed by reading
# ONLY the probed lists' bucket dirs (storage-level pruning, not a filter)
# ---------------------------------------------------------------------------

_IVF_INDEX_SCHEMA = "vec_id long, cid long, v array<double>"


# EXACT oracle — identical to similarity_ivf_multiprobe's: a persisted
# index (however it was built or maintained — base+delta commits here,
# the streaming applier in streaming/ann.py) must hold exactly the
# nearest-centroid assignment relation, and bucket-pruned probing must
# return exactly what assignment-filtered probing returns. Shared with
# streaming_ivf_index_topk so the two lifecycles cannot drift.
IVF_PERSISTED_SQL = f"""
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
) WHERE rank <= {TOP_K}"""


@register(
    "similarity_ivf_persisted",
    IVF_PERSISTED_SQL,
    doc=f"PERSISTED multi-probe IVF — the vector-database shape: the "
    f"{N_LIST} inverted lists are stored in the snapshot-table format, one "
    "bucket per list (identity bucket function on the list id), built in "
    "two commits — the base corpus, then an incremental ADD of the held-out "
    "delta (vec_id % 10 == 0) that rewrites ONLY the delta's touched "
    "buckets, every other list carrying over by manifest reference. "
    f"Search reads ONLY the probed lists' bucket dirs (read_buckets — "
    "storage-level pruning: at 100 TB a probe scans nprobe/n_list of the "
    "index bytes, and an ingest batch rewrites only the lists it touches). "
    "Result is EXACTLY similarity_ivf_multiprobe's, value-hash-checked; "
    "incremental-rewrite isolation is pinned in "
    "tests/test_extensions.py::test_persisted_ivf_incremental_add_is_bucket_pruned.",
)
def q_topk_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = build_persisted_ivf_index(spark, sf_dir)
    return search_persisted_ivf(spark, sf_dir, t, nprobe=N_PROBE)


def build_persisted_ivf_index(
    spark: SparkSession, sf_dir: str, work_name: str = "similarity_ivf_persisted"
):
    """Build the inverted-list snapshot table in two commits (base corpus,
    then the incremental delta add) and return the SnapshotTable."""
    import os

    from ..snapshots import SnapshotTable
    from ..workdirs import fresh_work_dir

    corpus = _corpus(spark, sf_dir)
    centroids = corpus.filter(F.col("vec_id") < N_LIST).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    scored_c = corpus.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cid", V.cosine(F.col("v"), F.col("cv")).alias("cos_c")
    )
    assign = (
        scored_c.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            F.max_by("cid", F.struct(F.col("cos_c"), -F.col("cid"))).alias("cid"),
        )
        .select("vec_id", "cid", "v")
    )
    t = SnapshotTable(os.path.join(fresh_work_dir(work_name), "index"))

    def commit_rows(rows: DataFrame, union_state: bool) -> None:
        # touched lists: a bounded ≤ N_LIST driver list, same play as the
        # CDC applier's touched-bucket discovery
        touched = sorted(
            r.cid for r in rows.select("cid").distinct().collect()
        )
        if union_state:
            state = t.read_buckets(
                spark, touched, _IVF_INDEX_SCHEMA, n_buckets=N_LIST
            )
            rows = state.unionByName(rows)
        t.commit_buckets(
            rows.withColumn("_bucket", F.col("cid").cast("int")),
            [int(b) for b in touched],
            n_buckets=N_LIST,
        )

    commit_rows(assign.filter(F.col("vec_id") % 10 != 0), union_state=False)
    commit_rows(assign.filter(F.col("vec_id") % 10 == 0), union_state=True)
    return t


def search_persisted_ivf(
    spark: SparkSession, sf_dir: str, t, nprobe: int
) -> DataFrame:
    """Multi-probe search against the persisted index: probe-list discovery
    on the tiny query×centroid slice, then read ONLY those lists' buckets."""
    corpus = _corpus(spark, sf_dir)
    centroids = corpus.filter(F.col("vec_id") < N_LIST).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("qid").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select("qid", "qv", "cid", V.cosine(F.col("qv"), F.col("cv")).alias("cos_c"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "qv", "cid")
    )
    probed_lists = sorted(r.cid for r in probes.select("cid").distinct().collect())
    index_rows = t.read_buckets(
        spark, [int(b) for b in probed_lists], _IVF_INDEX_SCHEMA, n_buckets=N_LIST
    )
    scored = (
        index_rows.join(
            F.broadcast(probes),
            (index_rows.cid == probes.cid) & (F.col("vec_id") != F.col("qid")),
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


IVF_TRAIN_ITERS = 4


def _train_coarse_centroids(
    spark: SparkSession, corpus: DataFrame, k: int = N_LIST
) -> DataFrame:
    """(cid, cv) — spherical k-means coarse quantizer trained on a bounded
    sample, the honest replacement for the deterministic first-k "centroids".

    Same 100 TB split as the PQ codebook: the sample (first PQ_TRAIN_SAMPLE
    vec_ids via TakeOrdered) is collected once and solved locally with
    vectorized Lloyd on the unit sphere — assignment by max dot, update =
    member mean re-normalized, empty clusters keep their previous centroid,
    ties take the lowest cid (numpy argmax first-occurrence). Unit-norm
    centroids make the distributed assignment's max-cosine criterion
    EXACTLY the training criterion (cos(v, c) ranks like v·c when every
    ||c|| = 1), so train and search agree on the metric.
    """
    import numpy as np

    # Arrow-batched toPandas: the sample is ~33 MB of doubles at the cap,
    # where row-based collect() pays seconds of py4j/Row conversion that
    # the Arrow path doesn't
    pdf = corpus.orderBy("vec_id").limit(PQ_TRAIN_SAMPLE).select("v").toPandas()
    x = np.array(list(pdf["v"]), dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    # k-means++ init with a FIXED seed (deterministic across runs): next
    # seed drawn with probability ∝ spherical D² = 2(1 - maxsim). Mass-
    # weighted sampling covers every populated mode without chasing lone
    # outliers the way pure farthest-point traversal does. A first-k init
    # can drop every seed into one mode of a clustered corpus and Lloyd
    # never escapes the local minimum (one inverted list then absorbs
    # whole foreign clusters — the exact skew this operator exists to
    # prevent).
    rng = np.random.default_rng(42)
    chosen = [0]
    maxsim = x @ x[0]
    while len(chosen) < min(k, len(x)):
        d2 = np.maximum(1.0 - maxsim, 0.0)
        tot = d2.sum()
        if tot <= 0:  # all points coincide with a chosen seed
            nxt = int(rng.integers(0, len(x)))
        else:
            nxt = int(rng.choice(len(x), p=d2 / tot))
        chosen.append(nxt)
        maxsim = np.maximum(maxsim, x @ x[nxt])
    c = x[chosen].copy()
    if len(c) < k:  # degenerate tiny corpus: pad by repeating
        c = np.tile(c, (-(-k // len(c)), 1))[:k]
    for _ in range(IVF_TRAIN_ITERS):
        assign = (x @ c.T).argmax(1)  # ties -> lowest cid
        for j in range(k):
            mask = assign == j
            if mask.any():
                m = x[mask].mean(0)
                c[j] = m / max(np.linalg.norm(m), 1e-300)
    out = [(j, [float(v) for v in c[j]]) for j in range(k)]
    return spark.createDataFrame(out, "cid int, cv array<double>")


def _recall_audit(exact: DataFrame, ann: DataFrame, floor: float) -> DataFrame:
    """Contract-oracle wrapper for trained-quantizer ANN (the r7 sketch
    error-band play applied to similarity): the CHECKED output is the
    EXACT brute-force top-k — fully SQL-recomputable, so the driver
    value-hashes it — plus a ``recall_ok`` boolean on every row stating
    that the ANN's global recall@k against that exact top-k clears
    ``floor``; the oracle emits literal TRUE. Trained codebooks/centroids
    never need hashing: what gets proven is the property that matters
    (the approximate index finds the true neighbors at the configured
    rate) at full hash strength. The flag is GLOBAL (one boolean over all
    queries) because per-query recall legitimately varies with how many
    inverted lists hold a query's true neighbors; the floors carry the
    margin measured across sf0.001/0.01/0.1."""
    ex_pairs = exact.select("qid", "neighbor_id")
    ann_pairs = ann.select("qid", "neighbor_id").withColumn("_hit", F.lit(1))
    flag = (
        ex_pairs.join(ann_pairs, ["qid", "neighbor_id"], "left")
        .agg(
            (
                F.coalesce(F.sum("_hit"), F.lit(0))
                >= F.lit(floor) * F.count(F.lit(1))
            ).alias("recall_ok")
        )
    )
    return exact.crossJoin(F.broadcast(flag))


# shared audit oracle: the exact brute-force top-k plus the asserted
# recall flag (one string — all three ANN audits check the same contract)
_AUDIT_ORACLE_SQL = (
    f"SELECT qid, neighbor_id, cos, rank, TRUE AS recall_ok "
    f"FROM ({_BRUTE_SQL})"
)


# Global recall@5 floors, each well under the deterministic measured value
# (fixed-seed trainers → recall is a pure function of the dataset):
# PQ measured 0.80-0.95; the 8-list/2-probe IVF variants measured 0.57-0.64.
PQ_RECALL_FLOOR = 0.6
IVF_RECALL_FLOOR = 0.35


@register(
    "similarity_ivf_kmeans",
    _AUDIT_ORACLE_SQL,
    doc=f"IVF ANN with a TRAINED coarse quantizer: {N_LIST} spherical-k-means "
    f"centroids ({IVF_TRAIN_ITERS} Lloyd iterations on a "
    f"{PQ_TRAIN_SAMPLE}-vector-capped sample, solved locally — the "
    "FAISS-style train-on-sample/search-distributed split), then the same "
    f"multiprobe search as similarity_ivf_multiprobe (nprobe={N_PROBE}). "
    "Upgrades the deterministic first-k quantizer the oracle-checked IVF "
    "variants use. The measured story is honest: on this near-uniform "
    "synthetic testdata both quantizers balance equally (max/mean list "
    "size ~1.15 vs 1.12) and recall@5 is comparable (0.57 vs 0.64 at "
    "sf0.01 — at k=8/nprobe=2 recall is set by how many lists you probe, "
    "not by seed quality) — but on a "
    "CLUSTERED corpus the first-k quantizer degenerates (all k seeds can "
    "land in one mode, so one inverted list absorbs entire foreign "
    "clusters: unbounded probe cost and partition skew at 100 TB) while "
    "trained centroids track the modes; that failure case is pinned by "
    "tests/test_extensions.py::test_ivf_trained_quantizer_balances_"
    "clustered_corpus. Unit-norm centroids keep the search-side "
    "max-cosine assignment identical to the training criterion. "
    "CHECKED OUTPUT (r8 contract-oracle conversion): the exact "
    "brute-force top-k (hash-verifiable in SQL) + recall_ok asserting "
    f"the ANN's global recall@{TOP_K} >= {IVF_RECALL_FLOOR}; the raw ANN "
    "relation stays available as q_topk_ivf_kmeans (structure + floor "
    "also pinned in tests/test_extensions.py::test_ivf_kmeans_recall_"
    "floor).",
)
def q_ivf_kmeans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_audit(
        q_topk_brute(spark, sf_dir),
        q_topk_ivf_kmeans(spark, sf_dir),
        IVF_RECALL_FLOOR,
    )


def q_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    centroids = _train_coarse_centroids(spark, corpus)
    return _ivf_search(spark, sf_dir, nprobe=N_PROBE, centroids=centroids)


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation — the
# billion-vector ANN memory-compression path, expressed relationally
# ---------------------------------------------------------------------------

M_SUB = 8  # subspaces
SUB_DIM = 8  # 64-dim vectors → 8 × 8-dim subvectors
K_PQ = 32  # codewords per subspace (Lloyd-trained, seeded from first K_PQ)
PQ_TRAIN_ITERS = 3  # Lloyd iterations per subspace (trained jointly)
RERANK_FACTOR = 20  # exact-rerank shortlist = RERANK_FACTOR × TOP_K


def _train_pq_codebook(
    spark: SparkSession, nv: DataFrame, iterations: int = PQ_TRAIN_ITERS
) -> tuple[DataFrame, "object"]:
    """((sub, code, cw) DataFrame, local (M_SUB, K_PQ, SUB_DIM) ndarray) —
    per-subspace K_PQ-codeword codebook, Lloyd-trained on a BOUNDED sample
    with one vectorized local solver; the ndarray twin feeds the Arrow
    encoder without a collect round-trip.

    The 100 TB shape: PQ codebooks are always trained on a size-capped
    sample (FAISS/ScaNN practice — quantizer quality saturates long before
    the corpus does), so training cost is O(sample), independent of corpus
    size. The sample is the first PQ_TRAIN_SAMPLE vec_ids (TakeOrdered —
    per-partition top-k merge, no global sort materialization), collected
    once (≤ 32 MB at dim 64) and solved with numpy Lloyd — a former
    3-iteration distributed loop whose per-round shuffle + eager-checkpoint
    overhead dominated the whole query's wall time (~4.8 of 6.8 s at
    sf0.1) on work that is milliseconds locally. Encoding and ADC scoring
    remain fully distributed; only the M_SUB×K_PQ×SUB_DIM codebook (16 KB)
    travels back, as a broadcast relation.

    Determinism: sample order is vec_id-sorted, init is the first K_PQ
    sample vectors' subvectors, ties take the lowest code (numpy argmin),
    empty clusters keep their previous codeword — same contract as the
    distributed formulation it replaces.
    """
    import numpy as np

    # Arrow-batched toPandas (same rationale as _train_coarse_centroids)
    pdf = nv.orderBy("vec_id").limit(PQ_TRAIN_SAMPLE).select("v").toPandas()
    x = np.array(list(pdf["v"]), dtype=np.float64)  # (n, dim)
    n = len(x)
    xs = x.reshape(n, M_SUB, SUB_DIM)  # (n, sub, subdim)
    cb = xs[: min(K_PQ, n)].copy()  # (K, sub, subdim) init: first K vectors
    if len(cb) < K_PQ:  # degenerate tiny corpus: pad by repeating
        reps = -(-K_PQ // len(cb))
        cb = np.tile(cb, (reps, 1, 1))[:K_PQ]
    cb = cb.transpose(1, 0, 2).copy()  # (sub, K, subdim)
    for _ in range(iterations):
        for m in range(M_SUB):
            xm, cm = xs[:, m, :], cb[m]  # (n, d), (K, d)
            d2 = (
                (xm * xm).sum(1, keepdims=True)
                - 2.0 * xm @ cm.T
                + (cm * cm).sum(1)
            )  # (n, K)
            code = d2.argmin(1)  # ties -> lowest code
            for k in range(K_PQ):
                mask = code == k
                if mask.any():
                    cb[m, k] = xs[mask, m, :].mean(0)
    out = [
        (m, k, [float(v) for v in cb[m, k]])
        for m in range(M_SUB)
        for k in range(K_PQ)
    ]
    return spark.createDataFrame(out, "sub int, code int, cw array<double>"), cb


@register(
    "similarity_pq_topk",
    _AUDIT_ORACLE_SQL,
    doc=f"PQ-ADC top-{TOP_K}: vectors compress to {M_SUB} codebook ids "
    f"({M_SUB}x{K_PQ} codewords = 40 bits/vector vs 64x8 bytes raw - the "
    "memory lever "
    "that fits billions of vectors in RAM). The codebook is Lloyd-trained "
    f"({PQ_TRAIN_ITERS} iterations) on a {PQ_TRAIN_SAMPLE}-vector-capped "
    "sample with a local vectorized solver — the FAISS-style split where "
    "training is O(sample) regardless of corpus size while encoding stays "
    "distributed. Encoding is one Arrow kernel (numpy argmin per batch "
    "against the broadcast 16 KB codebook) emitting one codes-array row "
    "per vector — corpus vectors never explode relationally; "
    "query scoring is ASYMMETRIC distance: each query's (subspace, code) "
    "partial-IP table packs into one broadcast array row and the "
    "approximate cosine is a map-side element_at fold — no shuffle, no "
    "per-pair vector math. An "
    f"exact-cosine rerank of the top {RERANK_FACTOR}×{TOP_K} shortlist "
    "restores ordering quality. Everything is broadcast joins, one "
    "bounded-sample collect, and per-query top-k windows: the plan shape "
    "that survives a 1000-executor corpus scan. CHECKED OUTPUT (r8 "
    "contract-oracle conversion): the exact brute-force top-k + "
    f"recall_ok asserting global recall@{TOP_K} >= {PQ_RECALL_FLOOR}; "
    "raw ANN relation = q_topk_pq (exact-rerank scores + 0.8 recall "
    "floor also pinned in tests/test_extensions.py::"
    "test_pq_topk_recall_and_exactness).",
)
def q_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_audit(
        q_topk_brute(spark, sf_dir),
        q_topk_pq(spark, sf_dir),
        PQ_RECALL_FLOOR,
    )


def q_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    corpus = _corpus(spark, sf_dir)
    nv = corpus.select(
        "vec_id",
        F.transform("v", lambda x: x / V.norm(F.col("v"))).alias("v"),
    )
    # (vec_id, sub, sv) for the QUERY vectors only — feeds the ADC table;
    # corpus vectors never explode (the Arrow encoder below slices in numpy)
    subs = (
        nv.filter(F.col("vec_id") < N_QUERIES)
        .select(
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
        )
        .select("vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))
    )
    codebook, cb_np = _train_pq_codebook(spark, nv)
    # encode: nearest codeword per (vector, subspace) as one Arrow kernel —
    # a numpy argmin per batch against the broadcast 16 KB codebook, emitting
    # one codes-array row per vector. The former relational formulation
    # (explode to N×M_SUB subvectors, broadcast-join K_PQ codewords, two
    # shuffled aggregates) moved N×M_SUB×K_PQ intermediate rows — 12.8M at
    # the 10× scale point — for what is one matmul per Arrow batch here.
    bc_cb = spark.sparkContext.broadcast(cb_np)

    def _encode(batches):
        cb = bc_cb.value  # (M_SUB, K_PQ, SUB_DIM)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).reshape(-1, M_SUB, SUB_DIM)
            codes = np.empty((len(mat), M_SUB), dtype=np.int32)
            for m in range(M_SUB):
                xm, cm = mat[:, m, :], cb[m]
                d2 = (
                    (xm * xm).sum(1, keepdims=True)
                    - 2.0 * xm @ cm.T
                    + (cm * cm).sum(1)
                )
                codes[:, m] = d2.argmin(1)  # ties -> lowest code
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "codes": list(codes)})

    codes = nv.mapInPandas(_encode, "vec_id long, codes array<integer>")
    # ADC lookup table, packed per query: tbl[sub][code] = partial inner
    # product of the query subvector with that codeword — N_QUERIES rows of
    # M_SUB×K_PQ doubles (2 KB each), broadcast to every task. Scoring is
    # then a pure map-side fold (one element_at per subspace), replacing the
    # former (sub, code) equi-join that exploded N×M_SUB×N_QUERIES rows
    # through a shuffle hash-aggregate — the heaviest exchange in the repo.
    table = (
        subs.join(F.broadcast(codebook), "sub")
        .select(
            F.col("vec_id").alias("qid"),
            "sub",
            "code",
            V.dot(F.col("sv"), F.col("cw")).alias("part_ip"),
        )
    )
    qtbl = (
        table.groupBy("qid", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "part_ip"))),
                lambda s: s["part_ip"],
            ).alias("row")
        )
        .groupBy("qid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "row"))),
                lambda s: s["row"],
            ).alias("tbl")
        )
    )
    approx = (
        codes.join(F.broadcast(qtbl), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "codes",
                    "tbl",
                    lambda c, t: F.element_at(t, c + F.lit(1)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_cos"),
        )
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


# ---------------------------------------------------------------------------
# IVF-PQ: trained coarse quantizer + residual product quantization — the
# composed production ANN architecture (FAISS IVFPQ / ScaNN shape)
# ---------------------------------------------------------------------------


@register(
    "similarity_ivfpq_topk",
    _AUDIT_ORACLE_SQL,
    doc=f"IVF-PQ ANN — the composed billion-vector architecture: a trained "
    f"spherical-k-means coarse quantizer ({N_LIST} lists) prunes the scan "
    f"to each query's nprobe={N_PROBE} inverted lists, and RESIDUAL "
    f"product quantization (v = centroid + residual; the residual "
    f"compresses to {M_SUB}×{K_PQ}-codeword codes) scores candidates "
    "asymmetrically: approx q·v = q·centroid (exact, one number per "
    "probed list) + the map-side ADC fold over the query's residual "
    "lookup table — residual PQ concentrates codeword mass around the "
    "list centroid, the classic reason IVFPQ beats flat PQ at equal "
    "bits. Both quantizers train on bounded samples with local solvers "
    "(training O(sample), independent of corpus size); assignment, "
    "residual computation, Arrow residual encoding, ADC scoring and the "
    f"exact-cosine rerank of the top {RERANK_FACTOR}×{TOP_K} shortlist "
    "are all distributed with nothing but broadcasts and per-query "
    "top-k windows — scan 1/4 of the corpus at 40 bits/vector, then "
    "touch full vectors only for the shortlist. CHECKED OUTPUT (r8 "
    "contract-oracle conversion): the exact brute-force top-k + "
    f"recall_ok asserting global recall@{TOP_K} >= {IVF_RECALL_FLOOR} "
    "(the 8-list/2-probe coarse pruning, not PQ, bounds recall here); "
    "raw ANN relation = q_topk_ivfpq (rerank-exactness + floor also "
    "pinned in tests/test_extensions.py::test_ivfpq_recall_and_probes).",
)
def q_ivfpq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_audit(
        q_topk_brute(spark, sf_dir),
        q_topk_ivfpq(spark, sf_dir),
        IVF_RECALL_FLOOR,
    )


def q_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    corpus = _corpus(spark, sf_dir)
    nv = corpus.select(
        "vec_id",
        F.transform("v", lambda x: x / V.norm(F.col("v"))).alias("v"),
    )
    centroids = _train_coarse_centroids(spark, nv)
    # nearest-centroid assignment (unit vectors x unit centroids: cosine
    # IS the dot product, so search assignment == training criterion).
    # Argmax as a HASH AGGREGATE (max_by over (cos, -cid)), not a window:
    # a row_number window over N single-vector partitions is a full
    # sort-shuffle of the corpus — the aggregate folds map-side and was
    # measured 2x faster at the 1M-vector 100x point.
    scored = nv.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cid", "cv",
        V.cosine(F.col("v"), F.col("cv")).alias("cos_c"),
    )
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),  # constant within the group
            F.max_by(
                F.struct("cid", "cv"), F.struct(F.col("cos_c"), -F.col("cid"))
            ).alias("_bc"),
        )
        .select("vec_id", "v", F.col("_bc.cid").alias("cid"), F.col("_bc.cv").alias("cv"))
    )
    # residual r = v - assigned centroid, computed from full precision:
    # q·v = q·c + q·r EXACTLY; quantization error lives only in r's codes
    resid = assign.select(
        "vec_id",
        "cid",
        F.zip_with("v", "cv", lambda a, b: a - b).alias("v"),
    )
    codebook, cb_np = _train_pq_codebook(spark, resid)
    bc_cb = spark.sparkContext.broadcast(cb_np)

    def _encode(batches):
        cb = bc_cb.value  # (M_SUB, K_PQ, SUB_DIM)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).reshape(-1, M_SUB, SUB_DIM)
            codes = np.empty((len(mat), M_SUB), dtype=np.int32)
            for m in range(M_SUB):
                xm, cm = mat[:, m, :], cb[m]
                d2 = (
                    (xm * xm).sum(1, keepdims=True)
                    - 2.0 * xm @ cm.T
                    + (cm * cm).sum(1)
                )
                codes[:, m] = d2.argmin(1)  # ties -> lowest code
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cid": pdf["cid"], "codes": list(codes)}
            )

    codes = resid.mapInPandas(_encode, "vec_id long, cid int, codes array<integer>")

    # query probes: nprobe nearest centroids, carrying the EXACT q·c term
    # (a window is fine HERE — N_QUERIES x N_LIST rows, not the corpus)
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= N_PROBE)
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
            "cid", F.col("cos_c").alias("q_dot_c"),
        )
    )
    # per-query residual ADC table: tbl[sub][code] = q_sub · codeword_sub
    qsubs = (
        nv.filter(F.col("vec_id") < N_QUERIES)
        .select(
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
        )
        .select("vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))
    )
    qtbl = (
        qsubs.join(F.broadcast(codebook), "sub")
        .select(
            F.col("vec_id").alias("qid"),
            "sub",
            "code",
            V.dot(F.col("sv"), F.col("cw")).alias("part_ip"),
        )
        .groupBy("qid", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "part_ip"))),
                lambda s: s["part_ip"],
            ).alias("row")
        )
        .groupBy("qid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "row"))),
                lambda s: s["row"],
            ).alias("tbl")
        )
    )
    probe_tbl = probes.join(qtbl, "qid").select("qid", "cid", "q_dot_c", "tbl")
    # candidates: probed lists only; approx q·v = q·c + ADC fold on codes
    approx = (
        codes.join(
            F.broadcast(probe_tbl),
            (codes.cid == probe_tbl.cid) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            "vec_id",
            (
                F.col("q_dot_c")
                + F.aggregate(
                    F.zip_with(
                        "codes",
                        "tbl",
                        lambda c, t: F.element_at(t, c + F.lit(1)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("approx_cos"),
        )
    )
    w_approx = Window.partitionBy("qid").orderBy(
        F.desc("approx_cos"), F.asc("vec_id")
    )
    shortlist = (
        approx.withColumn("srn", F.row_number().over(w_approx))
        .filter(F.col("srn") <= RERANK_FACTOR * TOP_K)
        .select("qid", "vec_id")
    )
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


# ---------------------------------------------------------------------------
# int8 scalar quantization + exact rerank
# ---------------------------------------------------------------------------

INT8_RERANK = 20  # quantized-score shortlist size per query (then exact top-5)

# Quantization, candidate scoring and rerank are all engine-exact, so unlike
# the PQ path this approximate index carries a REAL value-hash oracle:
# - scale = max |element| over the corpus (exact double max);
# - q8(x) = floor(x * 127.0 / scale + 0.5) — identical IEEE op order on both
#   engines, floor exact → identical int8 codes;
# - candidate score = int dot of codes over sqrt(int self-dots): integer
#   arithmetic exact, the two sqrt/divide ops run in the same order;
# - final rerank = functions.vectors cosine (bit-identical by construction).


def _q8_sql(col: str) -> str:
    # the scale relation is cross-joined in (DuckDB lambdas cannot contain
    # subqueries, but they can capture columns of the joined row)
    return (
        f"list_transform({col}, x -> CAST(floor("
        f"CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5) AS BIGINT))"
    )


_INT8_IDOT = (
    "CAST(list_aggregate(list_transform(list_zip({a}, {b}), "
    "p -> p[1] * p[2]), 'sum') AS DOUBLE)"
)


def _int8_qcos_sql(a: str, b: str, na: str, nb: str) -> str:
    return (
        f"({_INT8_IDOT.format(a=a, b=b)} / "
        f"(sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE))))"
    )


@register(
    "similarity_int8_topk",
    f"""
WITH scale AS (
    SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))))
      AS s FROM embeddings
),
q8 AS (
    SELECT e.vec_id, e.embedding, {_q8_sql('e.embedding')} AS c8
    FROM embeddings e, scale sc
),
q8n AS (
    SELECT vec_id, embedding, c8,
           CAST(list_aggregate(list_transform(c8, x -> x * x), 'sum') AS BIGINT)
             AS n8
    FROM q8
),
queries AS (SELECT vec_id AS qid, embedding AS qv, c8 AS qc8, n8 AS qn8
            FROM q8n WHERE vec_id < {N_QUERIES}),
approx AS (
    SELECT q.qid, c.vec_id,
           {_int8_qcos_sql('q.qc8', 'c.c8', 'q.qn8', 'c.n8')} AS qcos
    FROM queries q JOIN q8n c ON c.vec_id <> q.qid
),
shortlist AS (
    SELECT qid, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY qcos DESC, vec_id ASC) AS rn
        FROM approx
    ) WHERE rn <= {INT8_RERANK}
)
SELECT qid, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM (
    SELECT s.qid, s.vec_id AS neighbor_id,
           {V.cosine_sql('q.qv', 'c.embedding')} AS cos,
           ROW_NUMBER() OVER (PARTITION BY s.qid
               ORDER BY {V.cosine_sql('q.qv', 'c.embedding')} DESC,
                        s.vec_id ASC) AS rank
    FROM shortlist s
    JOIN queries q ON q.qid = s.qid
    JOIN embeddings c ON c.vec_id = s.vec_id
) WHERE rank <= {TOP_K}""",
    doc=f"Scalar-quantized ANN: int8 codes (one global max-abs scale), "
    f"integer-dot candidate scoring, exact-cosine rerank of the top-"
    f"{INT8_RERANK} shortlist → top-{TOP_K}. The storage-bandwidth scale "
    "play: at 100 TB the quantized index is 4× smaller than float32 (scan "
    "and shuffle bytes drop with it) and the integer dot products stay in "
    "codegen; only the tiny shortlist touches full-precision vectors. "
    "Deterministic quantization makes this approximate index value-hash "
    "oracle-checkable (unlike PQ, whose trained codebook is Spark-side "
    "state); recall vs similarity_topk_bruteforce is pinned in pytest.",
)
def q_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    scale = corpus.agg(
        F.max(F.array_max(F.transform("v", lambda x: F.abs(x)))).alias("s")
    )
    c8 = (
        corpus.join(F.broadcast(scale))
        .select(
            "vec_id",
            "v",
            F.transform(
                "v", lambda x: F.floor(x * F.lit(127.0) / F.col("s") + F.lit(0.5))
            ).alias("c8"),
        )
        .select(
            "vec_id",
            "v",
            "c8",
            F.aggregate(
                F.transform("c8", lambda x: x * x), F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("n8"),
        )
    )
    queries = c8.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("c8").alias("qc8"),
        F.col("n8").alias("qn8"),
    )
    idot = F.aggregate(
        F.zip_with("qc8", "c8", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    approx = c8.select("vec_id", "c8", "n8").join(
        F.broadcast(queries), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        (idot / (F.sqrt(F.col("qn8").cast("double")) * F.sqrt(F.col("n8").cast("double"))))
        .alias("qcos"),
    )
    w_q = Window.partitionBy("qid").orderBy(F.desc("qcos"), F.asc("vec_id"))
    shortlist = (
        approx.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= INT8_RERANK)
        .select("qid", "vec_id")
    )
    w_exact = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        shortlist.join(corpus, "vec_id")
        .join(
            F.broadcast(queries.select("qid", "qv")), "qid"
        )
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w_exact))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Time-series subsequence similarity search (EDBT'19 / REPOSE-style shape)
# ---------------------------------------------------------------------------

_TS_L = 24  # subsequence length: one day of hourly points
_TS_K = 3  # top-k windows per series


@register(
    "similarity_ts_topk_subsequence",
    f"""
WITH milli AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS sv
    FROM events GROUP BY 1, 2
),
seq AS (
    SELECT event_type, sv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS pos
    FROM milli
),
q AS (
    SELECT pos - {_TS_L} AS i, sv AS qv FROM seq
    WHERE event_type = 'purchase' AND pos BETWEEN {_TS_L} AND {2 * _TS_L - 1}
),
expanded AS (
    SELECT s.event_type, s.pos, s.sv, g.i
    FROM seq s, (SELECT unnest(generate_series(0, {_TS_L - 1})) AS i) g
    WHERE s.pos >= g.i
),
scored AS (
    SELECT e.event_type, e.pos - e.i AS start,
           CAST(SUM((e.sv - q.qv) * (e.sv - q.qv)) AS BIGINT) AS dist2,
           COUNT(*) AS n
    FROM expanded e JOIN q ON q.i = e.i
    GROUP BY 1, 2 HAVING COUNT(*) = {_TS_L}
)
SELECT event_type, start, dist2 FROM (
    SELECT event_type, start, dist2,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY dist2, start) AS rn
    FROM scored
) WHERE rn <= {_TS_K}
""",
    doc=f"Distributed top-k time-series subsequence search (the "
    "EDBT'19/REPOSE problem shape): per event type, the hourly "
    "milli-integer value series is scanned for the 24-point windows "
    "closest (squared Euclidean) to a query pattern (day 2 of the "
    "'purchase' series — self-referential, so no literal vector to "
    "drift). The scale design is aggregate-THEN-search: raw events "
    "reduce to one point per (type, hour) in a single map-side-combined "
    "aggregate, so the expansion join (explode over window offsets + "
    "equi-join on offset, never a cartesian) touches series-sized data — "
    "at 100 TB the series is still only hours x types. All distances "
    "are exact BIGINT sums of squared integer diffs; top-k has a total "
    "(dist2, start) order.",
)
def q_ts_topk_subsequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    milli = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.floor(
                F.sum(F.floor(F.col("value") * 1000).cast("bigint")).cast("double")
                / F.count("*")
            )
            .cast("bigint")
            .alias("sv")
        )
    )
    seq = milli.select(
        "event_type",
        "sv",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("bucket")
            )
            - 1
        ).alias("pos"),
    )
    q = (
        seq.filter(
            (F.col("event_type") == "purchase")
            & F.col("pos").between(_TS_L, 2 * _TS_L - 1)
        )
        .select((F.col("pos") - _TS_L).alias("i"), F.col("sv").alias("qv"))
    )
    expanded = (
        seq.select(
            "event_type",
            "pos",
            "sv",
            F.explode(F.sequence(F.lit(0), F.lit(_TS_L - 1))).alias("i"),
        )
        .filter(F.col("pos") >= F.col("i"))
    )
    scored = (
        expanded.join(F.broadcast(q), "i")
        .groupBy("event_type", (F.col("pos") - F.col("i")).alias("start"))
        .agg(
            F.sum(
                (F.col("sv") - F.col("qv")) * (F.col("sv") - F.col("qv"))
            ).alias("dist2"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") == _TS_L)
    )
    w = Window.partitionBy("event_type").orderBy("dist2", "start")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TS_K)
        .select("event_type", "start", "dist2")
    )


# -- GDPR delete on the persisted index --------------------------------------

IVF_DELETE_PRED = "vec_id % 7 = 3"


@register(
    "similarity_ivf_persisted_delete",
    # EXACT oracle: after a copy-on-write DELETE, bucket-pruned search must
    # return exactly the multiprobe result over the SURVIVING corpus —
    # same CTE shape as similarity_ivf_multiprobe with the deletion
    # predicate applied to the indexed side (queries and centroids stay
    # full-table: a probe vector need not live in the index, and the
    # coarse quantizer is a search-side constant).
    f"""
WITH centroids AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {N_LIST}),
live AS (SELECT vec_id, embedding FROM embeddings WHERE NOT ({IVF_DELETE_PRED})),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.cosine_sql('e.embedding', 'c.cv')} DESC, c.cid ASC) AS rn
        FROM live e CROSS JOIN centroids c
    ) WHERE rn = 1
),
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
    JOIN live e ON e.vec_id = a.vec_id
)
SELECT qid, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
) WHERE rank <= {TOP_K}""",
    doc="GDPR erasure on the persisted IVF index: build (base + "
    f"incremental add), then delete_where('{IVF_DELETE_PRED}') — the "
    "bucketed copy-on-write path probes each list dir and rewrites only "
    "dirs containing matches, preserving the bucket map — then the SAME "
    "bucket-pruned search. Result must EXACTLY equal multiprobe over the "
    "surviving corpus (value-hash-checked): erased vectors are "
    "unreachable through every probe path. Completes the vector-database "
    "lifecycle: build, incremental add, erase, serve.",
)
def q_topk_ivf_persisted_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = build_persisted_ivf_index(
        spark, sf_dir, work_name="similarity_ivf_persisted_delete"
    )
    t.delete_where(spark, IVF_DELETE_PRED)
    return search_persisted_ivf(spark, sf_dir, t, nprobe=N_PROBE)
