"""Streaming incremental IVF (ANN) index — vector ingestion at scale.

The remaining member of the incremental-index family (exact dedup r5,
BM25 r9, sequence packing r10, MinHash near-dup r11): embeddings stream
in micro-batches and the inverted-list table the search side serves from
is maintained INCREMENTALLY — each batch is assigned to its nearest
coarse-quantizer centroid and APPENDED to exactly the lists it touches,
never by recomputing assignments over the corpus.

Why this is the right 100 TB shape:
- The coarse quantizer is FIXED state trained offline (here: the
  deterministic first-``N_LIST``-vectors choice every IVF query in
  ``operators/similarity.py`` shares). Assignment of a vector depends
  only on that vector and the quantizer, so the maintained relation is
  arrival-order independent by construction — any batch split yields the
  same inverted lists, which is what lets the oracle be the WHOLE-CORPUS
  ``similarity_ivf_persisted`` SQL verbatim.
- Per batch: one broadcast pass over the BATCH (batch × centroids →
  map-side ``max_by`` argmax, no shuffle of stored state), one bounded
  ≤ ``n_lists`` collect for touched-list discovery, one bucket-granular
  APPEND (``commit_buckets(append=True)`` — write bytes O(batch), every
  calm list carries over by manifest reference). Crowded lists LSM-fold
  via ``compact_appended``, so manifests and per-probe file counts stay
  bounded as batches accumulate.
- Search reads ONLY the probed lists' bucket dirs (``read_buckets`` —
  storage-level pruning: nprobe/n_lists of the index bytes), shared with
  the batch-built index via ``search_persisted_ivf``.
- GDPR erase is the bucketed copy-on-write ``delete_where``: only the
  bucket dirs holding the erased vector rewrite; the searched index then
  provably excludes it through every probe path (exact oracle over the
  surviving corpus).

The reference pipeline (``dags/music_streaming_services_dag.py``) has no vector path at
all — this module is part of the LLM-training-data extension surface,
not reference parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..operators.similarity import (
    IVF_PERSISTED_SQL,
    N_LIST,
    N_PROBE,
    N_QUERIES,
    TOP_K,
    _IVF_INDEX_SCHEMA,
    _corpus,
    search_persisted_ivf,
)
from ..plans.registry import register
from ..snapshots import SnapshotTable
from ..workdirs import fresh_work_dir
from .ingest import _capture_plan, stage_table

# streaming-source schema for the staged embeddings drop folder (the
# parquet's physical types; ``label`` is not read)
EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>"
# fold an append-mode list back to one dir once it carries this many
# appended dirs — same LSM threshold family as the other index appliers
IVF_IDX_MAX_DIRS = 16


def make_ivf_index_applier(
    index_t: SnapshotTable,
    centroid_rows: list[tuple[int, list[float]]],
    n_lists: int = N_LIST,
    max_dirs: int = IVF_IDX_MAX_DIRS,
):
    """foreachBatch callback maintaining the persisted inverted-list
    table. The trained quantizer ships WITH the applier as plain rows
    (``(cid, centroid_vector)`` — bounded by the quantizer size, the same
    way PQ codebooks broadcast) and is rebuilt per batch from those rows,
    so a restarted stream needs no live DataFrame in the closure.

    foreachBatch is at-least-once and the append is non-idempotent, so
    the table carries a ``last_batch_id`` manifest cursor and replays
    skip; ``compact_appended`` is content-neutral and cursor-preserving,
    so a crash between the append and the fold replays safely."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark_ = batch.sparkSession
        last = index_t.latest_manifest_field("last_batch_id")
        if last is not None and batch_id <= last:
            return
        centroids = spark_.createDataFrame(
            centroid_rows, "cid long, cv array<double>"
        )
        vecs = batch.select(
            "vec_id", V.to_double_array("embedding").alias("v")
        )
        scored = vecs.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "v", "cid", V.cosine(F.col("v"), F.col("cv")).alias("cos_c")
        )
        # argmax as a hash aggregate (max_by over (cos, -cid)) — folds
        # map-side; a row_number window would sort-shuffle the batch
        assign_frame = (
            scored.groupBy("vec_id")
            .agg(
                F.first("v").alias("v"),
                F.max_by(
                    "cid", F.struct(F.col("cos_c"), -F.col("cid"))
                ).alias("cid"),
            )
            .select("vec_id", "cid", "v")
        )
        # capture the real broadcast-argmax plan, then pin one evaluation
        # to feed touched-list discovery AND the commit
        _capture_plan("streaming_ivf_index_topk.batch_assign", assign_frame)
        assign = assign_frame.localCheckpoint(eager=True)
        touched = sorted(
            int(r.cid) for r in assign.select("cid").distinct().collect()
        )
        index_t.commit_buckets(
            assign.withColumn("_bucket", F.col("cid").cast("int")),
            touched,
            n_buckets=n_lists,
            append=True,
            extra={"last_batch_id": batch_id},
        )
        index_t.compact_appended(
            spark_,
            _IVF_INDEX_SCHEMA,
            "cid",
            n_lists,
            max_dirs,
            # the lists are IDENTITY-bucketed (bucket == list id), not
            # hash-bucketed — the fold must preserve that rule
            bucket_expr=F.col("cid").cast("int"),
        )

    return apply_batch


def stage_embeddings(sf_dir: str, name: str) -> str:
    return stage_table(
        sf_dir,
        name,
        "embeddings.parquet",
        "vec_id",
        columns=("vec_id", "embedding"),
    )


def build_streaming_ivf_index(
    spark: SparkSession, sf_dir: str, name: str
) -> SnapshotTable:
    """Run the 4-batch embeddings stream through the index applier into a
    fresh inverted-list snapshot table."""
    d = stage_embeddings(sf_dir, "ivf_index")
    work = fresh_work_dir(name)
    t = SnapshotTable(os.path.join(work, "index"))
    # the offline-trained quantizer: the deterministic first-N_LIST
    # vectors (shared with every batch IVF query); ≤ n_lists rows
    centroid_rows = [
        (int(r.vec_id), list(r.v))
        for r in _corpus(spark, sf_dir)
        .filter(F.col("vec_id") < N_LIST)
        .collect()
    ]
    src = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        src.writeStream.foreachBatch(
            make_ivf_index_applier(t, centroid_rows)
        )
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return t


def _search_with_captured_plan(
    spark: SparkSession, sf_dir: str, t: SnapshotTable, capture: str
) -> DataFrame:
    out = search_persisted_ivf(spark, sf_dir, t, nprobe=N_PROBE)
    _capture_plan(capture, out)
    return out


@register(
    "streaming_ivf_index_topk",
    IVF_PERSISTED_SQL,
    doc="STREAMING INCREMENTAL IVF (ANN) INDEX (r12) — vector ingestion "
    "at scale, completing the incremental-index family (exact dedup r5, "
    "BM25 r9, packing r10, minhash near-dup r11): embeddings stream in 4 "
    "micro-batches; each batch assigns to its nearest coarse-quantizer "
    "centroid map-side (batch x broadcast quantizer -> max_by argmax, no "
    "shuffle of stored state) and APPENDS to exactly the inverted lists "
    "it touches (commit_buckets(append=True) — write bytes O(batch), "
    "calm lists carry over by manifest reference; crowded lists LSM-fold "
    "via compact_appended). Assignment depends only on the vector and "
    "the FIXED quantizer, so the maintained lists are arrival-order "
    "independent by construction, and the oracle is the whole-corpus "
    "similarity_ivf_persisted SQL VERBATIM — the value hash proves "
    "maintained == recomputed. Search is the shared "
    "search_persisted_ivf: probe-list discovery on the query x centroid "
    "slice, then read ONLY the probed lists' bucket dirs. Replays are "
    "guarded by a last_batch_id manifest cursor.",
)
def q_streaming_ivf_index_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = build_streaming_ivf_index(spark, sf_dir, "streaming_ivf_index_topk")
    return _search_with_captured_plan(
        spark, sf_dir, t, "streaming_ivf_index_topk.pruned_search"
    )


# EXACT oracle over the surviving corpus: the erased vector (the max
# vec_id — always >= N_QUERIES in the testdata, so the query set and the
# quantizer are untouched) must be unreachable through assignment AND
# scoring; everything else is the shared persisted-IVF search.
_IVF_DELETE_SQL = f"""
WITH erased AS (SELECT MAX(vec_id) AS ev FROM embeddings),
corpus AS (SELECT e.vec_id, e.embedding FROM embeddings e, erased x
           WHERE e.vec_id <> x.ev),
centroids AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {N_LIST}),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.cosine_sql('e.embedding', 'c.cv')} DESC, c.cid ASC) AS rn
        FROM corpus e CROSS JOIN centroids c
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
    JOIN corpus e ON e.vec_id = a.vec_id
)
SELECT qid, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
) WHERE rank <= {TOP_K}"""


@register(
    "streaming_ivf_index_delete",
    _IVF_DELETE_SQL,
    doc="GDPR ERASE-AND-SERVE on the streaming IVF index (r12): after "
    "the 4-batch build, one vector (the max vec_id) is erased END-TO-END "
    "with the bucketed copy-on-write delete_where — ONLY the bucket dirs "
    "holding that vector rewrite (one parallel pushed-down probe over "
    "all dirs finds them; every calm list carries over by reference, "
    "pytest-pinned), then the same "
    "bucket-pruned search serves from the surviving index. The oracle "
    "recomputes the whole persisted-IVF answer over embeddings MINUS the "
    "erased vector, so the value hash proves the vector is unreachable "
    "through every probe path (assignment, scoring, ranking).",
)
def q_streaming_ivf_index_delete(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # fail fast BEFORE the 4-batch build: the guard costs one aggregate
    ev = int(_corpus(spark, sf_dir).agg(F.max("vec_id")).first()[0])
    if ev < N_QUERIES:
        raise ValueError(
            f"erase target vec_id={ev} falls inside the query set "
            f"(< {N_QUERIES}) — the delete oracle assumes the corpus "
            "extends past the query/quantizer prefix"
        )
    t = build_streaming_ivf_index(
        spark, sf_dir, "streaming_ivf_index_delete"
    )
    t.delete_where(spark, f"vec_id = {ev}")
    return _search_with_captured_plan(
        spark, sf_dir, t, "streaming_ivf_index_delete.pruned_search"
    )
