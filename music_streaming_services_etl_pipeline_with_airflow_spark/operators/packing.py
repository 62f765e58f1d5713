"""Greedy sequence packing — the LLM-training batch-prep operator: fill
fixed token-budget packs with consecutive documents so training sequences
waste minimal padding.

Semantics (deterministic): within each ``source`` partition, walk documents
in doc_id order; add each doc to the current pack unless it would overflow
the budget, else start a new pack. An oversized doc gets its own pack.
Sequential-scan-with-reset state is not expressible in closed-form window
algebra, so this is a legitimate ``applyInPandas`` kernel (per-group,
Arrow-batched, no driver involvement); the DuckDB oracle replays the exact
recurrence as a recursive CTE, proving the Python kernel's semantics.

Scale: groups (sources/shards) partition the corpus, so packing runs
embarrassingly parallel per shard; each group streams through one pandas
kernel. The per-group sequential dependency is inherent to greedy packing —
sharding IS the parallelization strategy (as in production packers).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table

PACK_BUDGET = 128

_OUT_SCHEMA = "source string, doc_id long, n_tokens long, pack_id long, pack_used long"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pack_id, used = 0, 0
    ids, useds = [], []
    for n in pdf["n_tokens"]:
        n = int(n)
        if used > 0 and used + n > PACK_BUDGET:
            pack_id += 1
            used = 0
        used += n
        ids.append(pack_id)
        useds.append(used)
    return pd.DataFrame(
        {
            "source": pdf["source"],
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"],
            "pack_id": ids,
            "pack_used": useds,
        }
    )


def pack_documents(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    sized = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return sized.groupBy("source").applyInPandas(_pack_group, schema=_OUT_SCHEMA)


@register(
    "pack_sequences_greedy",
    f"""
WITH RECURSIVE sized AS (
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
),
packed AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_used
    FROM sized WHERE rn = 1
    UNION ALL
    SELECT d.source, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN p.pack_id + 1 ELSE p.pack_id END,
           CASE WHEN p.pack_used + d.n_tokens > {PACK_BUDGET}
                THEN d.n_tokens ELSE p.pack_used + d.n_tokens END
    FROM packed p JOIN sized d ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, pack_id, pack_used FROM packed""",
    doc=f"Greedy sequence packing into {PACK_BUDGET}-token packs per source "
    "shard (applyInPandas sequential kernel, parallel across shards). "
    "Oracle replays the recurrence as a recursive CTE — the Python kernel's "
    "semantics are SQL-proved.",
)
def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_documents(load_table(spark, sf_dir, "documents"))
