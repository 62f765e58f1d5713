"""Python UDTF and grouped-aggregate Pandas-UDF surface (SURVEY §2.11).

The reference needs zero UDFs; these two exist to make the engine's
user-extension points first-class, each verified:

- the UDTF is the Python-generator spelling of the relational chunker
  (operators/text.text_chunk_fixed) and is checked against the SAME DuckDB
  oracle — proving the table-function path produces bit-identical rows to
  the built-in explode pipeline;
- the grouped-agg Pandas UDF computes a geometric mean (no closed-form JVM
  aggregate) with the float fold rounded on both sides, per the registry's
  determinism contract.

Scale notes: a UDTF runs row-by-row in Python (Arrow-batched transport, but
per-row generator calls) — it is the SLOW path, ~10-100x behind the
equivalent explode, and exists for semantics built-ins can't express. The
grouped-agg pandas UDF shuffles once on the group key and reduces each
group in one vectorized call.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..plans.registry import register
from ..sources import load_table
from .text import CHUNK_TOKENS


class ChunkWords:
    """Yield fixed-size token chunks of one document (same recurrence as
    text_chunk_fixed; reference semantics in operators/text.py)."""

    def eval(self, text: str):
        toks = (text or "").split(" ")
        for i in range(0, max(len(toks), 1), CHUNK_TOKENS):
            part = toks[i : i + CHUNK_TOKENS]
            yield i // CHUNK_TOKENS, len(part), " ".join(part)


def _chunk_words_udtf():
    # decorator applied lazily: udtf()/pandas_udf() need an active session,
    # and the registry must stay importable without one
    return udtf(ChunkWords, returnType="chunk_idx bigint, n_tokens bigint, chunk_text string")


@register(
    "udtf_text_chunks",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(LEAST({CHUNK_TOKENS}, len(toks) - chunk_idx * {CHUNK_TOKENS})
            AS BIGINT) AS n_tokens,
       array_to_string(toks[chunk_idx * {CHUNK_TOKENS} + 1 :
                            chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' ')
           AS chunk_text
FROM t, unnest(generate_series(0, (len(toks) - 1) // {CHUNK_TOKENS})) AS u(chunk_idx)""",
    doc="Python UDTF (table function) surface: a generator class registered "
    "with spark.udtf and invoked via LATERAL, emitting fixed-size token "
    "chunks per document. Checked against the SAME oracle as the relational "
    "text_chunk_fixed — the UDTF path must be bit-identical to the explode "
    "pipeline. UDTFs are the slow (per-row Python) path; use them only for "
    "semantics built-ins can't express.",
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("chunk_words", _chunk_words_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
           FROM documents_v d, LATERAL chunk_words(d.text) c"""
    )


def _gmean_cents_udf():
    @pandas_udf("double")
    def _gmean_cents(v: pd.Series) -> float:
        # geometric mean over positive integer cents; the log-sum float fold
        # is rounded at the registry contract's precision on both engines
        import numpy as np

        return float(math.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return _gmean_cents


@register(
    "udaf_geometric_mean",
    """SELECT event_type,
              ROUND(EXP(AVG(LN(value_cents))), 6) AS gmean_cents
       FROM (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) + 1 AS value_cents
             FROM events)
       GROUP BY event_type""",
    doc="Grouped-aggregate Pandas UDF (UDAF surface): per-type geometric "
    "mean of integer cents — no closed-form JVM aggregate exists, so the "
    "group reduces in one vectorized Arrow batch. ROUND(...,6) on both "
    "sides absorbs the order-dependent log-sum float fold (registry "
    "determinism contract).",
)
def q_udaf_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.floor(F.col("value") * 100).cast("long") + 1).alias("value_cents"),
    )
    return ev.groupBy("event_type").agg(
        F.round(_gmean_cents_udf()("value_cents"), 6).alias("gmean_cents")
    )
