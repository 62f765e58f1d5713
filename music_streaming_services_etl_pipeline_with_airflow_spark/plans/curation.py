"""The LLM training-corpus curation pipeline — the extension-operator
families composed end-to-end into one artifact:

    quality gate → exact dedup → MinHash-LSH near-dup clustering →
    survivor selection → stable train/val/test split

One Spark job, one DuckDB oracle (the same stages as CTEs), fully
deterministic. This is the "would a data engineer actually run this at
100 TB" showcase: every stage is the scale-path variant (hash-key dedup,
banded LSH, hash-bucket split), no all-pairs scans anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import (
    JACCARD_THRESHOLD,
    _minhash_ctes,
    _pair_jaccard,
    doc_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
)
from ..operators.sampling import hash_bucket
from ..sources import load_table
from .registry import register

MIN_TOKENS = 10
MIN_DISTINCT_RATIO = 0.3


def curate_corpus(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, split, n_tokens) for the curated survivors."""
    from pyspark import StorageLevel

    toks = F.split(F.col("text"), " ")
    quality = docs.filter(
        (F.size(toks) >= MIN_TOKENS)
        & (F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= MIN_DISTINCT_RATIO)
    )
    # exact dedup: survivor = min doc_id per md5(text). Spelled as a
    # hash-groupBy over (h, doc_id) pairs + a doc_id semi-join (r10) —
    # NOT a min-over-Window.partitionBy(h): a window funnels every row of
    # a hot content hash (boilerplate duplicated 1e8 times at web scale)
    # through ONE task, while the groupBy's map-side partial mins collapse
    # the hot hash per partition and the body-bearing join key (doc_id,
    # unique) spreads perfectly. Same play as operators/dedup.dedup_exact.
    survivor_ids = (
        quality.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact = (
        quality.select("doc_id", "text")
        .join(survivor_ids, "doc_id", "semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # near-dup clustering on the exact-deduped corpus
    sh = doc_shingles(exact).persist(StorageLevel.MEMORY_AND_DISK)
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    pairs = _pair_jaccard(sh, cand).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    comps = connected_components(pairs)
    # survivors: docs not in any near-dup pair, plus each cluster's min id
    survivors = exact.join(comps, exact.doc_id == comps.node, "left").filter(
        F.col("component_id").isNull() | (F.col("component_id") == F.col("doc_id"))
    )
    return survivors.select(
        "doc_id",
        F.when(hash_bucket(F.col("doc_id")) < 80, "train")
        .when(hash_bucket(F.col("doc_id")) < 90, "val")
        .otherwise("test")
        .alias("split"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )


def _curation_sql() -> str:
    from ..operators.sampling import _bucket_sql

    return f"""
WITH RECURSIVE quality AS (
    SELECT doc_id, text FROM documents
    WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
      AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          / len(string_split(text, ' ')) >= {MIN_DISTINCT_RATIO}
),
exact AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM quality
    ) WHERE doc_id = keep_id
),
{_minhash_ctes(src='exact')},
edges AS (SELECT da AS src, db AS dst FROM minhash_pairs
          UNION ALL SELECT db, da FROM minhash_pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT e.src AS node, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
comps AS (SELECT node, MIN(lab) AS component_id FROM reach GROUP BY node)
SELECT e.doc_id,
       CASE WHEN {_bucket_sql('e.doc_id')} < 80 THEN 'train'
            WHEN {_bucket_sql('e.doc_id')} < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(len(string_split(e.text, ' ')) AS BIGINT) AS n_tokens
FROM exact e LEFT JOIN comps c ON c.node = e.doc_id
WHERE c.component_id IS NULL OR c.component_id = e.doc_id
"""


@register(
    "curate_training_corpus",
    _curation_sql(),
    doc="End-to-end corpus curation: quality gate → exact dedup (md5 keys) → "
    "MinHash-LSH near-dup clustering (banded, verified, connected-"
    "components survivor pick) → stable hash-bucket train/val/test split. "
    "The extension families composed into the one pipeline a training-data "
    "team actually runs; every stage is the scale-path variant.",
)
def q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Corpus mixture sampling + vocabulary build
# ---------------------------------------------------------------------------

# per-source sampling weights (sums < 1 leave headroom; unlisted sources
# fall back to DEFAULT_MIX) — the "data recipe" of a training run
MIX_WEIGHTS = {"src0": 1.0, "src1": 0.6, "src2": 0.6, "src3": 0.2}
DEFAULT_MIX = 0.4


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"CASE {whens} ELSE {DEFAULT_MIX} END"


@register(
    "corpus_mixture_sample",
    f"""WITH quota AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(floor(COUNT(*) * ({_mix_case_sql()})) AS BIGINT) AS take
         FROM documents GROUP BY source
       ),
       ranked AS (
         SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                            doc_id) AS rk
         FROM documents
       )
       SELECT r.doc_id, r.source FROM ranked r
       JOIN quota q ON r.source = q.source
       WHERE r.rk <= q.take""",
    doc="Weighted corpus mixture ('data recipe'): per-source sampling "
    "quotas = floor(weight x source size), filled deterministically by "
    "md5(doc_id) hash order — a seedless, engine-independent shuffle, so "
    "the drawn subset is reproducible anywhere and refreshing the corpus "
    "only shifts the hash frontier. One window shuffle on source + a "
    "broadcast quota join; no RNG state at 100 TB. CORRECTNESS BASELINE "
    "for skewed source mixes: the per-source window funnels a hot source "
    "through ONE task — corpus_mixture_sample_scale_safe (r10) computes "
    "the same ranks two-phase and is the path to run at scale.",
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w_expr = F.lit(DEFAULT_MIX)
    for s, w in sorted(MIX_WEIGHTS.items()):
        w_expr = F.when(F.col("source") == s, F.lit(w)).otherwise(w_expr)
    quota = docs.groupBy("source").agg(
        F.floor(F.count("*") * F.first(w_expr)).alias("take")
    )
    wnd = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(wnd).alias("rk")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("take"))
        .select("doc_id", "source")
    )


@register(
    "corpus_mixture_sample_scale_safe",
    f"""WITH quota AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(floor(COUNT(*) * ({_mix_case_sql()})) AS BIGINT) AS take
         FROM documents GROUP BY source
       ),
       ranked AS (
         SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                            doc_id) AS rk
         FROM documents
       )
       SELECT r.doc_id, r.source FROM ranked r
       JOIN quota q ON r.source = q.source
       WHERE r.rk <= q.take""",
    doc="SCALE-SAFE twin of corpus_mixture_sample (r10): identical data "
    "recipe and identical oracle, but the per-source hash-order rank comes "
    "from functions/ranking.two_phase_grouped_row_number — range-"
    "repartition on (source, md5, doc_id), rank within partitions, "
    "broadcast per-(partition, source) offsets — instead of a "
    "Window.partitionBy(source), which funnels a hot source's ENTIRE "
    "document set through one task (the hot-source replica holds 97% of "
    "docs behind one key; the baseline's window cannot parallelize that). "
    "Driver traffic is O(partitions x sources) offset rows; no "
    "group-sized single-task stage anywhere.",
)
def q_corpus_mixture_scale_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import two_phase_grouped_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w_expr = F.lit(DEFAULT_MIX)
    for s, w in sorted(MIX_WEIGHTS.items()):
        w_expr = F.when(F.col("source") == s, F.lit(w)).otherwise(w_expr)
    quota = docs.groupBy("source").agg(
        F.floor(F.count("*") * F.first(w_expr)).alias("take")
    )
    ranked = two_phase_grouped_row_number(
        docs.withColumn("_h", F.md5(F.col("doc_id").cast("string"))),
        ["source"],
        [F.asc("_h"), F.asc("doc_id")],
        id_col="rk",
        total_col="_n_src",
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("take"))
        .select("doc_id", "source")
    )


VOCAB_MIN_COUNT = 3


@register(
    "build_vocab",
    f"""WITH words AS (
         SELECT unnest(string_split(text, ' ')) AS token FROM documents
       ),
       counts AS (
         SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
         FROM words GROUP BY token
         HAVING COUNT(*) >= {VOCAB_MIN_COUNT}
       )
       SELECT token, freq,
              CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT)
                AS token_id
       FROM counts""",
    doc=f"Vocabulary build (tokenizer prep): corpus-wide token frequencies "
    f"with a min-count floor ({VOCAB_MIN_COUNT}), ids assigned by (freq "
    "DESC, token) total order — the id table a BPE/WordPiece trainer "
    "starts from. Explode + two-level hash agg (partial map-side combine "
    "first, so the shuffle carries one row per distinct token per "
    "partition, not per occurrence). Dense ids are assigned TWO-PHASE "
    "(r9, the zipWithIndex spelling): range-repartition on the sort key, "
    "rank per partition in parallel, collect only the P per-partition "
    "COUNTS to the driver, and add the cumulative offsets back via a "
    "broadcast — the plan carries no vocab-sized SinglePartition "
    "exchange, so a web-scale vocabulary (1e8+ distinct tokens) is never "
    "sorted by one task.",
)
def q_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import two_phase_row_number

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= VOCAB_MIN_COUNT)
    )
    # (freq DESC, token) is a STRICT total order — token is the group-by
    # key — as two_phase_row_number requires
    ranked, _ = two_phase_row_number(
        counts, [F.desc("freq"), F.asc("token")], id_col="token_id"
    )
    return ranked.select("token", "freq", "token_id")


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (multilingual-LM alpha-sampling recipe)
# ---------------------------------------------------------------------------

MIX_ALPHA_BUDGET_FRAC = 2  # draw total // 2 documents across sources

# shared verbatim by corpus_temperature_mixture and its r10 scale twin —
# the twin changes only HOW the per-source hash-order ranks are computed,
# never what the recipe draws
_TEMPERATURE_ORACLE = f"""WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT)
               AS sq_milli
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
           CAST(SUM(sq_milli) AS BIGINT) AS ssum
    FROM counts
),
quota AS (
    SELECT c.source, c.n_docs,
           LEAST((tot.total // {MIX_ALPHA_BUDGET_FRAC}) * c.sq_milli
                     // tot.ssum,
                 c.n_docs) AS take
    FROM counts c CROSS JOIN tot
),
ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS rk
    FROM documents
)
SELECT r.doc_id, r.source FROM ranked r
JOIN quota q ON r.source = q.source
WHERE r.rk <= q.take"""


@register(
    "corpus_temperature_mixture",
    _TEMPERATURE_ORACLE,
    doc="Temperature-scaled source mixing — the multilingual-LM "
    "alpha-sampling recipe (alpha = 0.5): each source's draw probability "
    "is proportional to N_s^alpha, flattening the head sources and "
    "up-weighting the tail relative to natural sampling. Determinism "
    "under floats: each sqrt is floored to integer milli-units FIRST, "
    "then everything downstream (sum of weights, budget x weight / "
    "total-weight, the quota floor) is pure int64 arithmetic — no "
    "order-dependent double summation anywhere, so the quota is "
    "bit-identical on any engine and any partitioning. (Bound: budget x "
    "sq_milli stays under 2^63 up to ~1e10 docs per source.) Quotas "
    "fill deterministically by md5(doc_id) hash order, the same "
    "seedless reproducible shuffle as corpus_mixture_sample; one "
    "bounded per-source aggregate + one window shuffle at 100 TB. "
    "CORRECTNESS BASELINE for skewed source mixes: the take is "
    "data-dependent, so Spark's WindowGroupLimit cannot push the rank "
    "filter map-side (unlike curate_source_cap's constant cap) and the "
    "per-source window funnels a hot source through one task — "
    "corpus_temperature_mixture_scale_safe (r10) is the path at scale.",
)
def q_corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
    ).select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
        .cast("long")
        .alias("sq_milli"),
    )
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.sum("sq_milli").alias("ssum")
    )
    quota = counts.join(F.broadcast(tot)).select(
        "source",
        F.least(
            F.expr(
                f"(total div {MIX_ALPHA_BUDGET_FRAC}) * sq_milli div ssum"
            ),
            F.col("n_docs"),
        ).alias("take"),
    )
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("take"))
        .select("doc_id", "source")
    )


@register(
    "corpus_temperature_mixture_scale_safe",
    _TEMPERATURE_ORACLE,
    doc="SCALE-SAFE twin of corpus_temperature_mixture (r10): identical "
    "alpha-sampling recipe, identical oracle, but the per-source "
    "hash-order ranks come from functions/ranking."
    "two_phase_grouped_row_number instead of a per-source window. The "
    "quota here is DATA-DEPENDENT (budget x N_s^alpha / sum weights), so "
    "Spark's WindowGroupLimit cannot push the rank filter map-side the "
    "way it does for curate_source_cap's constant cap — the baseline's "
    "window genuinely ranks a hot source's whole partition in one task, "
    "while the two-phase form ranks range-partitioned slices in "
    "parallel with O(partitions x sources) driver traffic.",
)
def q_corpus_temperature_mixture_scale_safe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.ranking import two_phase_grouped_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
    ).select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
        .cast("long")
        .alias("sq_milli"),
    )
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.sum("sq_milli").alias("ssum")
    )
    quota = counts.join(F.broadcast(tot)).select(
        "source",
        F.least(
            F.expr(
                f"(total div {MIX_ALPHA_BUDGET_FRAC}) * sq_milli div ssum"
            ),
            F.col("n_docs"),
        ).alias("take"),
    )
    ranked = two_phase_grouped_row_number(
        docs.withColumn("_h", F.md5(F.col("doc_id").cast("string"))),
        ["source"],
        [F.asc("_h"), F.asc("doc_id")],
        id_col="rk",
        total_col="_n_src",
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("take"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# Semantic decontamination — embedding-space eval-set overlap
# ---------------------------------------------------------------------------

_SEM_TAU = 0.35
_SEM_PROBE_MOD = 29  # vec_id % 29 == 0 -> the held-out "eval set" probe




def _nv_ctes() -> str:
    """Shared oracle CTE prefix: vectors normalized once (nrm -> nv) —
    the single definition behind decontam_semantic and
    similarity_hard_negatives, so the normalization can never drift
    between the probe-family oracles."""
    from ..functions import vectors as V

    return f"""
WITH nrm AS (
    SELECT vec_id, embedding, {V.norm_sql('embedding')} AS n FROM embeddings
),
nv AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / n) AS v
    FROM nrm
)"""


def _normalized_probe_split(spark: SparkSession, sf_dir: str):
    """Shared Spark side of the broadcast-probe family: normalized vectors
    split into (probe, train) on the vec_id % _SEM_PROBE_MOD rule. Returns
    (probe aliased (anchor vec_id 'eval_id'/'anchor_id' is applied by the
    caller), train)."""
    from ..functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("dv")
    )
    nv = emb.withColumn("nrm", V.norm(F.col("dv"))).select(
        "vec_id", F.transform("dv", lambda x: x / F.col("nrm")).alias("v")
    )
    probe = nv.filter(F.col("vec_id") % _SEM_PROBE_MOD == 0)
    train = nv.filter(F.col("vec_id") % _SEM_PROBE_MOD != 0)
    return probe, train


def _sem_oracle() -> str:
    from ..functions import vectors as V

    return f"""
{_nv_ctes()}
SELECT t.vec_id AS train_id, p.vec_id AS eval_id,
       {V.dot_sql('t.v', 'p.v')} AS cos
FROM nv t JOIN nv p
  ON p.vec_id % {_SEM_PROBE_MOD} = 0 AND t.vec_id % {_SEM_PROBE_MOD} <> 0
WHERE {V.dot_sql('t.v', 'p.v')} >= {_SEM_TAU}
"""


@register(
    "decontam_semantic",
    _sem_oracle(),
    doc=f"Semantic decontamination: flag training vectors whose cosine vs "
    f"ANY held-out eval vector reaches {_SEM_TAU} — the embedding-space "
    "complement of decontam_ngram_overlap (n-gram overlap misses "
    "paraphrased leakage; embedding similarity catches it). Same scale "
    "shape as the n-gram probe: the eval set is tiny and BROADCAST, the "
    "training side streams through one scan with a per-row dot-product "
    "fold against the in-memory probes (BroadcastNestedLoopJoin — bounded "
    "by |eval|, never a shuffle of the corpus), vectors normalized once "
    "per side. Cosines are bit-exact cross-engine (same fold order as "
    "dedup_embedding_cosine), so the pair set value-hash matches.",
)
def q_decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    probe, train = _normalized_probe_split(spark, sf_dir)
    probe = probe.select(F.col("vec_id").alias("eval_id"), F.col("v").alias("pv"))
    return (
        train.crossJoin(F.broadcast(probe))
        .withColumn("cos", V.dot(F.col("v"), F.col("pv")))
        .filter(F.col("cos") >= _SEM_TAU)
        .select(F.col("vec_id").alias("train_id"), "eval_id", "cos")
    )


_HN_LO, _HN_HI = 0.10, 0.45  # hard-negative band: similar, but not a dup
_HN_K = 3


def _hn_oracle() -> str:
    from ..functions import vectors as V

    return f"""
{_nv_ctes()},
scored AS (
    SELECT p.vec_id AS anchor_id, t.vec_id AS negative_id,
           {V.dot_sql('t.v', 'p.v')} AS cos
    FROM nv t JOIN nv p
      ON p.vec_id % {_SEM_PROBE_MOD} = 0 AND t.vec_id % {_SEM_PROBE_MOD} <> 0
    WHERE {V.dot_sql('t.v', 'p.v')} >= {_HN_LO}
      AND {V.dot_sql('t.v', 'p.v')} < {_HN_HI}
)
SELECT anchor_id, negative_id, cos FROM (
    SELECT anchor_id, negative_id, cos,
           ROW_NUMBER() OVER (PARTITION BY anchor_id
                              ORDER BY cos DESC, negative_id) AS rn
    FROM scored
) WHERE rn <= {_HN_K}
"""


@register(
    "similarity_hard_negatives",
    _hn_oracle(),
    doc=f"Hard-negative mining for contrastive training: for every anchor "
    f"(the held-out probe set), the top-{_HN_K} corpus vectors inside the "
    f"[{_HN_LO}, {_HN_HI}) cosine band — similar enough to be "
    "informative negatives, below the near-dup bar so they are not "
    "false negatives. The third face of the broadcast-probe scan family "
    "(decontam_semantic finds the too-similar, this finds the "
    "usefully-similar): one corpus scan, per-row dot fold against the "
    "broadcast anchors, then a bounded per-anchor top-k window. "
    "Total-order tie-break on (cos DESC, negative_id); cosines bit-exact "
    "cross-engine.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    probe, train = _normalized_probe_split(spark, sf_dir)
    probe = probe.select(F.col("vec_id").alias("anchor_id"), F.col("v").alias("pv"))
    scored = (
        train.crossJoin(F.broadcast(probe))
        .withColumn("cos", V.dot(F.col("v"), F.col("pv")))
        .filter((F.col("cos") >= _HN_LO) & (F.col("cos") < _HN_HI))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HN_K)
        .select(
            "anchor_id", F.col("vec_id").alias("negative_id"), "cos"
        )
    )


_SOURCE_CAP = 15


@register(
    "curate_source_cap",
    f"""
    SELECT source, doc_id, pick_rank FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS pick_rank
        FROM documents
    ) WHERE pick_rank <= {_SOURCE_CAP}
    """,
    doc=f"Per-source document cap (the domain-cap curation policy: no "
    f"single site/domain may dominate the corpus): keep at most "
    f"{_SOURCE_CAP} docs per source, chosen by md5-hash order — a stable "
    "pseudo-random sample without RNG, reproducible across runs, engines "
    "and cluster sizes. The output IS the kept set (doc_id + pick rank "
    "per source), so the hash-order selection property is value-hash "
    "verified, not just claimed. One window shuffle on the source key; "
    "the cap binds at every gate scale (25 docs/source vs cap "
    f"{_SOURCE_CAP}), so the drop branch is always exercised. At scale "
    "this is the same rank-and-cap plan as sample_class_balanced, and "
    "heavily-skewed sources cost only their own partitions.",
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= _SOURCE_CAP)
        .select("source", "doc_id", "pick_rank")
    )
