"""Streaming corpus ingestion with exact dedup against a growing content
index — the continuous-ingestion production pattern: every micro-batch of
documents is deduplicated (a) within itself and (b) against everything
already accepted, and only the survivors are appended to the index.

This is the streaming twin of ``dedup_incremental_batch``
(operators/dedup.py): same 32-byte md5 content keys, same
cost-scales-with-the-batch property (each batch anti-joins the index on
hash keys; document bodies never re-shuffle), driven here through a real
``foreachBatch`` loop so the index grows batch-over-batch under one
checkpointed query.

Determinism: drop-folder files are staged in ascending doc_id ranges with
strictly increasing mtimes, and Spark's file stream source processes files
oldest-first, so arrival order == doc_id order and "first arrival wins"
coincides with the global ``min(doc_id)`` per hash — which is exactly the
SQL oracle. (A production deployment has no such oracle, but carries the
same first-arrival semantics.) The batch-order assumption is pinned by
``test_streaming_dedup_ingest_equals_batch_dedup``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register

DOCS_SCHEMA = "doc_id long, text string"

_N_STAGE_FILES = 4


def stage_documents(sf_dir: str, name: str, n_files: int = _N_STAGE_FILES) -> str:
    """Split the documents table into ``n_files`` drop-folder parquet files
    by ascending doc_id range, mtimes strictly increasing so the file
    stream source replays them in doc_id order."""
    import hashlib

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    d = os.path.join(
        tempfile.gettempdir(),
        f"spark_engine_stage_docs_{name}_{key}_{os.path.getmtime(src):.0f}",
    )
    done = os.path.join(d, "_STAGED")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    table = pq.read_table(src, columns=["doc_id", "text"])
    table = table.sort_by("doc_id")
    n = table.num_rows
    base = os.path.getmtime(src)
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        part = table.slice(lo, hi - lo)
        path = os.path.join(d, f"part-{i:03d}.parquet")
        pq.write_table(part, path)
        # strictly increasing mtimes, 10 s apart: the file source's
        # oldest-first ordering then equals doc_id-range order
        os.utime(path, (base + 10 * i, base + 10 * i))
    with open(done, "w") as fh:
        fh.write("ok")
    return d


def dedup_ingest_each_batch(index_path: str):
    """foreachBatch callback: batch → within-batch dedup (min doc_id per
    content hash) → anti-join the stored index → append survivors."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = (
            batch_df.select("doc_id", F.md5("text").alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        if os.path.exists(os.path.join(index_path, "_SUCCESS")) or any(
            f.endswith(".parquet") for f in os.listdir(index_path)
        ):
            index = spark.read.parquet(index_path).select("text_hash")
            batch = batch.join(index, "text_hash", "left_anti")
        batch.select("doc_id", "text_hash").write.mode("append").parquet(index_path)

    return _ingest


@register(
    "streaming_dedup_ingest",
    # Arrival order == doc_id order by staging construction, so the accepted
    # set is exactly the global min-doc_id representative per content hash.
    """SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
              md5(text) AS text_hash
       FROM documents GROUP BY md5(text)""",
    doc="Streaming corpus ingestion with exact dedup: a documents file "
    "stream (4 staged drop-files, maxFilesPerTrigger=1 ⇒ 4 micro-batches) "
    "runs through foreachBatch; each batch dedups within itself, "
    "anti-joins the stored content index on 32-byte md5 keys, and appends "
    "only first-seen content. The streaming twin of "
    "dedup_incremental_batch: per-batch cost tracks the batch and the "
    "index join key width, never the corpus text. availableNow trigger; "
    "the returned DataFrame is the final index read back lazily.",
)
def q_streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stage_documents(sf_dir, "dedup_ingest")
    index = tempfile.mkdtemp(prefix="spark_engine_ingest_idx_") + "/content_index"
    os.makedirs(index, exist_ok=True)
    ckpt = tempfile.mkdtemp(prefix="spark_engine_ingest_ck_")
    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        src.writeStream.foreachBatch(dedup_ingest_each_batch(index))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(index).select("doc_id", "text_hash")
