"""Retrieval operators — BM25 lexical ranking and hybrid rank fusion.

The reference pipeline has no retrieval surface (its text handling stops at
KPI aggregation); these extend the engine toward the training-data /
RAG-preparation workload: score a corpus against query term sets with BM25
(the Robertson/Spärck-Jones ranking function as implemented by Lucene and
every open search engine), and fuse lexical + dense rankings with
Reciprocal Rank Fusion (Cormack et al., SIGIR'09).

Determinism contract (same conventions as operators/text.py's tf-idf and
logprob family): every per-term partial score is floored to integer
milli-units BEFORE summation so cross-engine ln()/division ulp differences
cannot flip a rank, sums are exact BIGINT arithmetic, and every ranking has
the total order (score DESC, doc_id ASC).

Scale notes (100 TB): the corpus tokenize→tf aggregate is one hash shuffle
with map-side partials; the query-term set is derived via a global top-k
(TakeOrderedAndProject — per-partition heaps, no global sort) and joined
back as a broadcast, so the corpus-side candidate filter is map-side; the
per-query top-k runs as a SALTED two-level sort-window (rank within
(query, salt) first, then rank the ≤ salts×k survivors) so no single
reducer sorts a whole query's candidate list — sort-based windows spill;
collect_list buffers would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

# BM25 constants (the Lucene defaults). 0.75 and the derived 0.25 are
# exact binary doubles; 1.2 rounds to the same IEEE double from the same
# literal in both engines.
BM25_K1 = 1.2
BM25_B = 0.75
N_QUERY_TERMS = 6  # top-df terms drafted into queries
N_QUERIES = 3  # 2 terms each: query q gets df-ranks {q, q+3}
TOPK = 10
_SALTS = 32


def _bm25_oracle() -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl,
           unnest(string_split(text, ' ')) AS term
    FROM documents
),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, dl, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM documents),
qterms AS (
    SELECT term, df, rn, ((rn - 1) % {N_QUERIES}) + 1 AS query_id
    FROM (SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rn
          FROM df)
    WHERE rn <= {N_QUERY_TERMS}
),
qnames AS (
    SELECT query_id,
           MAX(CASE WHEN rn <= {N_QUERIES} THEN term END) || ' ' ||
           MAX(CASE WHEN rn > {N_QUERIES} THEN term END) AS q_terms
    FROM qterms GROUP BY query_id
),
parts AS (
    SELECT q.query_id, tf.doc_id,
           CAST(FLOOR(1000.0 * ln(1.0 + (n.n_docs - q.df + 0.5) / (q.df + 0.5))
                * (tf.tf * {BM25_K1 + 1.0}) /
                  (tf.tf + {BM25_K1} * (0.25 + {BM25_B} * tf.dl / n.avgdl)))
                AS BIGINT) AS part_milli
    FROM tf JOIN qterms q ON tf.term = q.term CROSS JOIN n
),
scored AS (
    SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
           CAST(SUM(part_milli) AS BIGINT) AS score_milli
    FROM parts GROUP BY query_id, doc_id
)
SELECT CAST(s.query_id AS BIGINT) AS query_id, qn.q_terms, s.doc_id,
       s.n_terms_hit, s.score_milli, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score_milli DESC, doc_id ASC) AS rank
      FROM scored) s
JOIN qnames qn ON s.query_id = qn.query_id
WHERE rank <= {TOPK}"""


@register(
    "text_bm25_topk",
    _bm25_oracle(),
    doc=f"BM25 retrieval: score every document against {N_QUERIES} "
    f"two-term queries (terms drafted deterministically from the corpus's "
    f"top-{N_QUERY_TERMS} document-frequency terms, rank r pairing with "
    f"r+{N_QUERIES}) with the Lucene-default k1={BM25_K1}, b={BM25_B} "
    f"formula, and return each query's top-{TOPK} (score DESC, doc_id "
    "ASC). Per-term partials are milli-floored before the BIGINT sum — "
    "the tf-idf determinism convention — so the ln()/division ulp gap "
    "between engines cannot flip a rank. Plan: one tokenize→tf hash "
    "aggregate (dl rides the grouping key, so doc length needs NO second "
    "pass or join), a vocab-sized df aggregate reduced to the query draft "
    "via global top-k (TakeOrderedAndProject), query terms broadcast back "
    "so the candidate filter is map-side, then a salted two-level "
    "sort-window top-k — no reducer ever sorts a full query candidate "
    "list, nothing corpus-sized concentrates.",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs, avgdl_num = docs.select(
        F.count("*"), F.sum(F.size(F.split(F.col("text"), " ")))
    ).first()
    avgdl = float(avgdl_num) / n_docs  # exact-int division, both engines

    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("dl"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))

    # Global top-6 df terms: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps); the 6-row result then gets ranks via a window
    # that only ever sees 6 rows.
    draft = df.orderBy(F.desc("df"), F.asc("term")).limit(N_QUERY_TERMS)
    w6 = Window.orderBy(F.desc("df"), F.asc("term"))
    qterms = draft.withColumn("rn", F.row_number().over(w6)).select(
        "term",
        "df",
        "rn",
        (((F.col("rn") - 1) % N_QUERIES) + 1).alias("query_id"),
    )
    qnames = qterms.groupBy("query_id").agg(
        F.concat_ws(
            " ",
            F.max(F.when(F.col("rn") <= N_QUERIES, F.col("term"))),
            F.max(F.when(F.col("rn") > N_QUERIES, F.col("term"))),
        ).alias("q_terms")
    )

    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf") + BM25_K1 * (0.25 + BM25_B * F.col("dl") / F.lit(avgdl))
    )
    parts = tf.join(F.broadcast(qterms), "term").select(
        "query_id",
        "doc_id",
        F.floor(1000.0 * idf * tf_norm).cast("long").alias("part_milli"),
    )
    scored = parts.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_terms_hit"),
        F.sum("part_milli").cast("long").alias("score_milli"),
    )

    # Salted two-level top-k: rank inside (query, salt) shards first so the
    # sort-window never concentrates a whole query on one reducer, then
    # rank the <= _SALTS*TOPK survivors per query.
    salted = scored.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(_SALTS))
    )
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= TOPK)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    topk = (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOPK)
    )
    return topk.join(F.broadcast(qnames), "query_id").select(
        F.col("query_id").cast("long"),
        "q_terms",
        "doc_id",
        "n_terms_hit",
        "score_milli",
        F.col("rank").cast("long"),
    )
