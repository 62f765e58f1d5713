"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs via
``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake derived from the payload bytes; real codec path raises
NotImplementedError behind an import-try) — but the Spark plumbing is real
and oracle-checked end to end: binary encoding, schema contract, Arrow
batch shapes, per-partition iteration. Swapping ``_decode_stub`` for a real
``PIL.Image.open`` is a one-function change; the distributed plan
(columnar scan → mapInPandas → typed struct output) is exactly what a 100 TB
image pipeline runs, with ``spark.sql.files.maxPartitionBytes`` sizing the
Arrow batches and no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, channels long, format string"
)

try:  # real codec path — not available in this container by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake 'image decode': header fields derived from the
    payload bytes (first/last byte, length mod). Replace with a real codec
    (PIL / libvips) where available."""
    if not payload:
        return (0, 0, 0, "empty")
    width = payload[0]
    height = payload[-1]
    channels = (len(payload) % 3) + 1
    return (width, height, channels, "fake/v1")


def decode_image_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload: binary) → decoded metadata.

    Arrow hands us column batches; we stay vectorized per batch and never
    materialize more than one batch per partition at a time.
    """
    for pdf in frames:
        payloads = pdf["payload"]
        meta = [
            _decode_real(p) if _HAS_PIL else _decode_stub(bytes(p)) for p in payloads
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(bytes(p)) for p in payloads],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "channels": [m[2] for m in meta],
                "format": [m[3] for m in meta],
            }
        )


def _decode_real(payload: bytes):  # pragma: no cover — no codecs in container
    raise NotImplementedError(
        "real image decode requires PIL/libvips; this container ships none — "
        "the deterministic _decode_stub exercises the full Spark plumbing"
    )


def binarize_documents(docs: DataFrame) -> DataFrame:
    """documents.text → opaque binary payload column (stand-in for image
    bytes; utf-8 so the oracle can reproduce byte values via ascii())."""
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


@register(
    "multimodal_decode_metadata",
    # Oracle reproduces the stub's byte arithmetic from the text column:
    # ascii(first char), ascii(last char), (octet_length % 3) + 1.
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS width,
       CAST(ascii(substr(text, length(text), 1)) AS BIGINT) AS height,
       CAST(octet_length(encode(text)) % 3 + 1 AS BIGINT) AS channels,
       'fake/v1' AS format
       FROM documents""",
    doc="Multimodal plumbing end-to-end: text→binary payload column → "
    "Arrow-batched mapInPandas 'decode' (stubbed codec, deterministic fake "
    "header) → typed metadata struct. Oracle re-derives the byte math, "
    "proving schema, batch shape, and UDF signature.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binary = binarize_documents(docs)
    return binary.mapInPandas(decode_image_batch, schema=DECODED_SCHEMA)


@register(
    "multimodal_frame_sample",
    # frame sampling analog: each 'video' (doc) yields every k-th token
    # index as a 'frame' — deterministic positions, SQL-reproducible.
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, CAST(unnest(generate_series(1, len(toks), 8)) AS BIGINT) AS frame_idx
FROM t""",
    doc="Frame-sampling plumbing: one row per sampled frame index (stride 8) "
    "per document — the explode shape a video pipeline uses (doc → frames), "
    "partition-parallel, no driver loop.",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # Spark sequence(1, size, 8) mirrors DuckDB generate_series(1, len, 8)
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(8))).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
