"""Text-analysis operators over ``documents`` — the LLM-training-data
extension family: token statistics, quality scoring, language-ID heuristic,
and document fingerprinting. All Catalyst built-ins (split / regexp /
array ops); integer-ratio math keeps every oracle bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# language marker sets for the n-gram/stopword heuristic (deterministic,
# vocabulary-based — an honest lang-ID over opaque text, scored per doc)
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "de", "et", "un"),
    "es": ("el", "los", "de", "y", "una"),
    "de": ("der", "die", "und", "ein", "ist"),
}


@register(
    "text_token_stats",
    """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
       FROM documents""",
    doc="Token counting: whitespace tokens, distinct tokens, regex word "
    "tokens (BPE-ish pre-tokenization), chars-per-token — single projection "
    "pass, no shuffle.",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").alias(
            "n_word_tokens"
        ),
        (F.length("text").cast("double") / F.size(toks)).alias("chars_per_token"),
    )


_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "text_quality_scores",
    f"""WITH t AS (
    SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
   CAST(len(toks) AS BIGINT) AS n_tokens,
   CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) AS DOUBLE)
       / len(toks) AS stopword_ratio,
   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
   CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
   (len(toks) >= 10 AND
    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3) AS quality_pass
FROM t""",
    doc="Quality scoring: stopword ratio, lexical diversity (distinct/total), "
    "whitespace count, and a boolean quality gate — the pre-training filter "
    "shape (length + repetition heuristics), all integer-ratio exact.",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_tok = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
        ((n_tok >= 10) & (distinct_ratio >= 0.3)).alias("quality_pass"),
    )


def _langid_parts() -> tuple[str, str]:
    """(CTE chain, argmax CASE expression) — shared by the per-doc lang-id
    oracle and the confusion-matrix oracle."""
    scores = ", ".join(
        "CAST(len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        + f"], x))) AS BIGINT) AS score_{lang}"
        for lang in LANG_MARKERS
    )
    langs = list(LANG_MARKERS)
    # argmax with tie-break by fixed lang order; all-zero → 'und'
    best = "CASE "
    for lang in langs:
        others = " AND ".join(
            f"score_{lang} >= score_{o}" for o in langs if o != lang
        )
        best += f"WHEN score_{lang} > 0 AND {others} THEN '{lang}' "
    best += "ELSE 'und' END"
    ctes = f"""t AS (
    SELECT doc_id, lang AS labeled_lang, string_split(text, ' ') AS toks FROM documents
), s AS (SELECT doc_id, labeled_lang, {scores} FROM t)"""
    return ctes, best


def _langid_sql() -> str:
    ctes, best = _langid_parts()
    return f"""WITH {ctes}
SELECT doc_id, labeled_lang, score_en, score_fr, score_es, score_de,
       {best} AS predicted_lang FROM s"""


@register(
    "text_lang_id",
    _langid_sql(),
    doc="Language-ID heuristic: marker-word (stopword n-gram) hit counts per "
    "candidate language, argmax with fixed-order tie-break, 'und' when no "
    "evidence. Deterministic vocabulary method — emits scores alongside the "
    "dataset's label for evaluation.",
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def score_col(lang: str):
        arr = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return (
            F.expr(
                f"size(filter(split(text, ' '), x -> array_contains(array({arr}), x)))"
            )
            .cast("long")
            .alias(f"score_{lang}")
        )

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[score_col(lang) for lang in LANG_MARKERS],
    )
    langs = list(LANG_MARKERS)
    # reversed loop builds the same first-match-wins CASE as the SQL twin
    first_match = F.lit("und")
    for lang in reversed(langs):
        cond = (F.col(f"score_{lang}") > 0)
        for o in langs:
            if o != lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{o}"))
        first_match = F.when(cond, F.lit(lang)).otherwise(first_match)
    return scored.select(
        "doc_id", "labeled_lang", "score_en", "score_fr", "score_es", "score_de",
        first_match.alias("predicted_lang"),
    )


TOP_TERMS = 3


@register(
    "text_tfidf_top_terms",
    f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(FLOOR(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000)
                AS BIGINT) AS tfidf_milli
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf_milli, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        ORDER BY tfidf_milli DESC, term ASC) AS rank
    FROM scored
) WHERE rank <= {TOP_TERMS}""",
    doc=f"TF-IDF: term frequency × ln(N/df), top-{TOP_TERMS} terms per doc. "
    "Corpus stats via two hash aggregates + a broadcast of the tiny df/N "
    "side; tfidf floored to milli-units so the cross-engine ln() ulp "
    "cannot flip ranks (ranking happens on the floored integer).",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # r16 (guide §2.4, the bm25 pattern): df derived FROM tf — a term's
    # doc frequency is the number of its (doc_id, term) groups — instead
    # of a second countDistinct aggregate over a second tokenize+explode
    # pass. The no-op filter (count(*) >= 1 always) keeps tf's count in
    # this subtree so Catalyst can't prune it into a distinct; both
    # branches then hash-partition the IDENTICAL partial-count subtree
    # and AQE exchange reuse fires: ONE tokenize pass feeds tf and df.
    df = tf.filter(F.col("tf") >= 1).groupBy("term").agg(
        F.count("*").alias("df")
    )
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.floor(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * 1000
        )
        .cast("long")
        .alias("tfidf_milli"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_milli"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "tfidf_milli", F.col("rank").cast("long").alias("rank"))
    )


CHUNK_TOKENS = 32


@register(
    "text_chunk_fixed",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(LEAST({CHUNK_TOKENS}, len(toks) - chunk_idx * {CHUNK_TOKENS})
            AS BIGINT) AS n_tokens,
       array_to_string(toks[chunk_idx * {CHUNK_TOKENS} + 1 :
                            chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' ')
           AS chunk_text
FROM t, unnest(generate_series(0, (len(toks) - 1) // {CHUNK_TOKENS})) AS u(chunk_idx)""",
    doc=f"Context chunking for LLM training: split each document's token "
    f"stream into fixed {CHUNK_TOKENS}-token chunks (doc_id, chunk_idx, "
    "chunk_text) — the explode shape that turns a corpus into training "
    "sequences; pure array arithmetic, partition-parallel.",
)
def q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = ((F.size(toks) - 1) / CHUNK_TOKENS).cast("long")  # floor for >=0
    exploded = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_TOKENS
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(CHUNK_TOKENS), F.size("toks") - start)
        .cast("long")
        .alias("n_tokens"),
        F.array_join(F.slice("toks", start + 1, CHUNK_TOKENS), " ").alias("chunk_text"),
    )


@register(
    "text_fingerprint",
    """WITH fp AS (
    SELECT doc_id,
           md5(list_aggr(list_sort(list_distinct(string_split(text, ' '))),
                         'string_agg', ' ')) AS fingerprint
    FROM documents
)
SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       COUNT(*) AS n_docs
FROM fp GROUP BY fingerprint""",
    doc="Document fingerprinting: md5 over the sorted distinct token set "
    "(bag-of-words canonical form) — collapses token-order permutations; "
    "grouped like exact dedup (shuffle 32-byte keys only).",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    return (
        docs.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Curation filters: decontamination, repetition, entity masking
# --------------------------------------------------------------------------

N_DECONTAM = 5  # word n-gram order for exact-match decontamination


from ..functions.hashing import shingles_sql as _shingles_sql


@register(
    "decontam_ngram_overlap",
    f"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
shingles AS (
    SELECT doc_id, unnest({_shingles_sql(N_DECONTAM, 't')}) AS s FROM toks
),
eval_sh AS (SELECT DISTINCT s FROM shingles WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, s FROM shingles WHERE doc_id % 97 <> 0),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM train GROUP BY doc_id),
hits AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         FROM train t JOIN eval_sh e USING (s) GROUP BY t.doc_id)
SELECT t.doc_id, t.n_sh,
       COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_sh AS overlap_ratio,
       CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id""",
    doc=f"Benchmark decontamination: flag training docs sharing any exact "
    f"{N_DECONTAM}-gram with the held-out eval set (doc_id % 97 == 0 — "
    "the standard eval-overlap filter, cf. GPT-3/PaLM appendix method). "
    "The eval shingle set is tiny vs the corpus, so it BROADCASTS: the "
    "overlap probe is map-side against every training shard, and the only "
    "shuffle is the per-doc rollup. Exact-match n-grams, no false "
    "positives.",
)
def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import hashing as H

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", H.tokens("text").alias("toks")
    ).select("doc_id", F.explode(H.word_shingles("toks", N_DECONTAM)).alias("s"))
    eval_sh = sh.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    train = sh.filter(F.col("doc_id") % 97 != 0)
    tot = train.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hits = (
        train.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_sh",
        F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
        (
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_sh")
        ).alias("overlap_ratio"),
        F.when(F.coalesce(F.col("n_hit"), F.lit(0)) > 0, 1)
        .otherwise(0)
        .alias("contaminated"),
    )


@register(
    "gopher_repetition",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_words,
       CAST(list_max(list_transform(list_distinct(t),
                     w -> len(list_filter(t, x -> x = w)))) AS BIGINT)
         AS max_word_count,
       CAST(list_max(list_transform(list_distinct(t),
                     w -> len(list_filter(t, x -> x = w)))) AS DOUBLE)
         / len(t) AS top_word_ratio,
       CAST(len(t) - 1 AS BIGINT) AS n_bigrams,
       CAST(len(t) - 1
            - len(list_distinct(list_transform(
                  generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])))
            AS DOUBLE) / (len(t) - 1) AS dup_bigram_ratio
FROM toks WHERE len(t) >= 2""",
    doc="Gopher-style repetition signals per doc: top-word frequency ratio "
    "and duplicate-bigram fraction (Rae et al. 2021 quality filters). "
    "Entirely map-side array expressions — ZERO shuffles; the per-row "
    "mode computation is O(distinct x words), the right trade below ~10k "
    "words/doc (explode+groupBy is the variant for book-length docs).",
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    d = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 2)
    max_c = F.array_max(
        F.transform(
            F.array_distinct(F.col("t")),
            lambda w: F.size(F.filter(F.col("t"), lambda x: x == w)),
        )
    )
    bigrams = F.expr(
        "array_distinct(transform(sequence(0, size(t) - 2),"
        " i -> concat_ws(' ', t[i], t[i+1])))"
    )
    n_bg = F.size("t") - 1
    return d.select(
        "doc_id",
        F.size("t").cast("long").alias("n_words"),
        max_c.cast("long").alias("max_word_count"),
        (max_c.cast("double") / F.size("t")).alias("top_word_ratio"),
        n_bg.cast("long").alias("n_bigrams"),
        ((n_bg - F.size(bigrams)).cast("double") / n_bg).alias(
            "dup_bigram_ratio"
        ),
    )


@register(
    "entity_mask",
    r"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\bcustomer\b')) AS BIGINT)
         AS n_masked,
       md5(regexp_replace(text, '\bcustomer\b', '<ENT>', 'g')) AS masked_md5
FROM documents""",
    doc="Entity masking (PII-scrub shape): global regexp_replace of an "
    "entity pattern with a mask token plus per-doc replacement count — "
    "pure map-side regex, no shuffle; the masked text is hashed so the "
    "oracle checks the FULL redacted body, not just counts. Swap the "
    "pattern for email/phone/SSN regexes in a real PII pass.",
)
def q_entity_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pat = r"\bcustomer\b"
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(pat)).cast("long").alias("n_masked"),
        F.md5(F.regexp_replace("text", pat, "<ENT>")).alias("masked_md5"),
    )


# --------------------------------------------------------------------------
# Corpus composition reporting (round 2)
# --------------------------------------------------------------------------


def _confusion_sql() -> str:
    ctes, best = _langid_parts()
    return f"""WITH {ctes},
pred AS (SELECT doc_id, labeled_lang, {best} AS predicted_lang FROM s)
SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2"""


@register(
    "text_lang_confusion",
    _confusion_sql(),
    doc="Language-ID evaluation: confusion matrix of the dataset's declared "
    "lang label vs the marker-word heuristic's prediction — the per-class "
    "quality report a corpus pipeline publishes before trusting a filter. "
    "Composes the text_lang_id relation with one hash aggregate; at scale "
    "the matrix is |langs|² rows regardless of corpus size.",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_langid(spark, sf_dir)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "corpus_source_mix",
    """SELECT source, lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
                AS n_tokens,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY 1, 2""",
    doc="Corpus composition report: documents and whitespace-token / char "
    "volumes per (source, lang) — the data-recipe table a training run is "
    "audited against (cf. the mixture weights corpus_mixture_sample "
    "consumes). One scan, one hash aggregate with map-side partials; "
    "output is |sources|x|langs| rows regardless of corpus size.",
)
def q_corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "dedup_chunks_cross_doc",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
chunks AS (
    SELECT doc_id,
           chunk_idx,
           array_to_string(toks[chunk_idx * {CHUNK_TOKENS} + 1 :
                                chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' ')
               AS chunk_text
    FROM t, unnest(generate_series(0, (len(toks) - 1) // {CHUNK_TOKENS})) AS u(chunk_idx)
)
SELECT md5(chunk_text) AS chunk_hash,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id * 1000000 + chunk_idx) // 1000000 AS BIGINT) AS keep_doc_id,
       CAST(MIN(doc_id * 1000000 + chunk_idx) % 1000000 AS BIGINT) AS keep_chunk_idx
FROM chunks
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2""",
    doc=f"Chunk-level exact dedup ACROSS documents (the Lee-et-al-style "
    f"exact-substring dedup at {CHUNK_TOKENS}-token chunk granularity): "
    "chunk every document on the shared fixed grid, hash each chunk, and "
    "report chunks that recur in ≥2 distinct documents with a "
    "deterministic canonical occurrence. The shuffle carries 32-byte "
    "chunk hashes, never chunk text — at 100 TB this is a plain hash "
    "aggregate over the chunk relation, the same shape as dedup_exact one "
    "level down. The canonical occurrence is min(doc_id, chunk_idx) in "
    "lexicographic order, carried portably as the packed surrogate "
    "doc_id*1e6+chunk_idx (chunk_idx is bounded far below 1e6 here; at "
    "scale use min_by over a struct, which DuckDB's min_by cannot "
    "express).",
)
def q_dedup_chunks_cross_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = q_chunk_fixed(spark, sf_dir)
    packed = F.col("doc_id") * 1_000_000 + F.col("chunk_idx")
    return (
        chunks.select("doc_id", "chunk_idx", F.md5("chunk_text").alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(packed).alias("_packed_min"),
        )
        .filter(F.col("n_docs") >= 2)
        # Integral `div` on longs, not float `/`: packed values above 2^53
        # (doc_id > ~9e9) would lose precision in double division, while the
        # DuckDB oracle's `//` is exact integer arithmetic.
        .select(
            "chunk_hash",
            "n_occurrences",
            "n_docs",
            F.expr("_packed_min div 1000000").alias("keep_doc_id"),
            (F.col("_packed_min") % 1_000_000).alias("keep_chunk_idx"),
        )
    )


# --------------------------------------------------------------------------
# Winnowed fingerprint dedup (round 6) — any-alignment shared-run detection
# --------------------------------------------------------------------------

WIN_W = 16  # tokens per window (the shingle the fingerprint hashes)
WIN_K = 8  # winnowing window: one fingerprint selected per K consecutive


def _window_hash_arrays(docs: "DataFrame") -> "DataFrame":
    """(doc_id, hashes) — hashes[i] is the md5 of the WIN_W-token window
    at position i, ONE array row per qualifying document. This is the
    single definition of the window fingerprint on purpose: the span
    family's composition ("winnowing detects, shared-spans delimit,
    strip removes") holds only because all three operators fingerprint
    the identical window relation; a drift in WIN_W handling or the hash
    expression at one site would silently desynchronize them."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= WIN_W
    )
    # the sequence upper bound is clamped to >= 0 so the expression is
    # TOTAL: the optimizer may reorder it before the size filter (e.g.
    # into a merged Filter predicate), and sequence(0, negative) would
    # DESCEND into i = -1 -> slice(start=0) runtime errors on short docs.
    # Rows with size < WIN_W still carry no window (the filter drops
    # them); the clamp only changes what a dropped row would have built.
    return toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("toks") - WIN_W, F.lit(0))),
            lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i + 1, WIN_W))),
        ).alias("hashes"),
    )


def _window_hashes(docs: "DataFrame") -> "DataFrame":
    """(doc_id, pos, h) — the exploded form of _window_hash_arrays."""
    return _window_hash_arrays(docs).select(
        "doc_id", F.posexplode("hashes").alias("pos", "h")
    )


def _pos_islands(sel: "DataFrame") -> "DataFrame":
    """Gaps-and-islands over (doc_id, pos): adds an ``island`` id that
    increments whenever consecutive positions break — the shared span-merge
    kernel of dedup_shared_spans and curate_strip_shared_spans."""
    from pyspark.sql import Window

    wo = Window.partitionBy("doc_id").orderBy("pos")
    return sel.withColumn(
        "new_island",
        F.when(F.col("pos") - F.lag("pos").over(wo) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "island",
        F.sum("new_island").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )



@register(
    "dedup_winnowed_shingles",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
    SELECT doc_id, pos,
           md5(array_to_string(toks[pos + 1 : pos + {WIN_W}], ' ')) AS h
    FROM t, unnest(generate_series(0, len(toks) - {WIN_W})) AS u(pos)
    WHERE len(toks) >= {WIN_W}
),
k AS (
    SELECT doc_id,
           MIN(h || '#' || lpad(CAST(999999999 - pos AS VARCHAR), 9, '0'))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {WIN_K - 1} FOLLOWING)
               AS minkey
    FROM w
),
sel AS (
    SELECT DISTINCT doc_id,
           substr(minkey, 1, 32) AS h,
           999999999 - CAST(substr(minkey, 34, 9) AS INTEGER) AS pos
    FROM k
)
SELECT h AS win_hash,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id * 1000000 + pos) // 1000000 AS BIGINT) AS keep_doc_id,
       CAST(MIN(doc_id * 1000000 + pos) % 1000000 AS BIGINT) AS keep_pos
FROM sel
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2""",
    doc=f"Any-alignment cross-document duplicate-run detection via WINNOWING "
    f"(Schleimer-Wilkerson-Aiken MOSS fingerprinting): hash every "
    f"{WIN_W}-token window, then keep only each {WIN_K}-window's minimal "
    "hash (rightmost on ties, encoded in the sortable key), and report "
    "fingerprints recurring in ≥2 distinct documents. Guarantee: any run "
    f"of ≥ {WIN_W + WIN_K - 1} shared tokens at ANY offset yields ≥1 shared "
    "selected fingerprint — the shifted-boilerplate case the fixed chunk "
    "grid (dedup_chunks_cross_doc) provably misses — while expected "
    f"fingerprint density is only 2/(K+1) ≈ {2/(WIN_K+1):.2f} of positions. "
    "At 100 TB: the per-doc window/select phase is map-side (one window "
    "function partitioned by doc_id — partition-local, no cross-doc "
    "shuffle), and the only exchange is the final hash aggregate over "
    "32-byte selected fingerprints, the same shape as dedup_exact. "
    "Canonical occurrence carried as the packed min(doc_id, pos) surrogate "
    "with integral-div unpack (exact above 2^53).",
)
def q_dedup_winnowed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import spread_narrow

    # r16 (guide §2.4): the whole winnowing selection happens INSIDE the
    # per-doc hash array — every window hash of a doc lives in one row, so
    # the min-of-next-K selection is an array slice, not a Window over the
    # exploded relation, and the per-doc de-dup is array_distinct, not a
    # DISTINCT. That deletes the two widest exchanges (the full window-hash
    # relation shuffled for Window.partitionBy(doc_id), then shuffled again
    # for the DISTINCT); the only remaining shuffle carries the selected
    # fingerprints (expected density 2/(K+1) of positions, deduped). The
    # md5 map work is CPU-bound, so spread_narrow unsplits toy scans first
    # (no-op at real scale).
    docs = spread_narrow(load_table(spark, sf_dir, "documents"))
    wins = _window_hash_arrays(docs)
    # sortable key: hash, then complemented position so MIN picks the
    # RIGHTMOST position among equal hashes (classic winnowing tie rule)
    keys = F.transform(
        F.col("hashes"),
        lambda h, i: F.concat(
            h,
            F.lit("#"),
            F.lpad((F.lit(999_999_999) - i).cast("string"), 9, "0"),
        ),
    )
    # minkeys[i] = min key over positions i..i+K-1 (slice clamps at the
    # array end exactly like ROWS BETWEEN CURRENT AND K-1 FOLLOWING)
    minkeys = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_keys"))),
        lambda i: F.array_min(F.slice(F.col("_keys"), i, WIN_K)),
    )
    sel = (
        wins.select("doc_id", keys.alias("_keys"))
        .select("doc_id", F.explode(F.array_distinct(minkeys)).alias("minkey"))
        .select(
            "doc_id",
            F.substring("minkey", 1, 32).alias("h"),
            (F.lit(999_999_999) - F.substring("minkey", 34, 9).cast("int")).alias(
                "pos"
            ),
        )
    )
    packed = F.col("doc_id") * 1_000_000 + F.col("pos")
    return (
        sel.groupBy(F.col("h").alias("win_hash"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(packed).alias("_packed_min"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "win_hash",
            "n_occurrences",
            "n_docs",
            F.expr("_packed_min div 1000000").alias("keep_doc_id"),
            (F.col("_packed_min") % 1_000_000).alias("keep_pos"),
        )
    )


@register(
    "dedup_shared_spans",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
    SELECT doc_id, pos,
           md5(array_to_string(toks[pos + 1 : pos + {WIN_W}], ' ')) AS h
    FROM t, unnest(generate_series(0, len(toks) - {WIN_W})) AS u(pos)
    WHERE len(toks) >= {WIN_W}
),
shared AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
sel AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM shared)),
flagged AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
                THEN 0 ELSE 1 END AS new_island
    FROM sel
),
grp AS (
    SELECT doc_id, pos,
           SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {WIN_W} - 1 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM grp
GROUP BY doc_id, island""",
    doc=f"EXACT cross-document duplicated-span extraction — the surgical "
    "output a dedup pipeline actually strips: for every document, the "
    "inclusive token ranges whose content also appears verbatim in at "
    f"least one OTHER document (window size {WIN_W}; inside a shared run "
    "every window hash is globally duplicated, so consecutive shared "
    "positions merge into maximal spans by the gaps-and-islands pattern "
    "and the recovered span equals the shared run exactly). Complements "
    "dedup_winnowed_shingles: winnowed fingerprints DETECT offending "
    "docs cheaply at scale; this operator runs at full window density to "
    "delimit the spans to remove. 100 TB shape: one 32-byte-hash "
    "aggregate (same as dedup_exact) + a semi join back + per-doc window "
    "functions — no cross-doc pair explosion anywhere (within-doc-only "
    "repetition is deliberately excluded by the distinct-doc bar).",
)
def q_dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = _window_hashes(docs)
    shared = (
        w.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    sel = w.join(shared, "h", "left_semi").select("doc_id", "pos")
    grp = _pos_islands(sel)
    return (
        grp.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + WIN_W - 1).cast("long").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


# Shared by curate_strip_shared_spans and its corpus-level rollup
_STRIP_SQL = f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
    SELECT doc_id, pos,
           md5(array_to_string(toks[pos + 1 : pos + {WIN_W}], ' ')) AS h
    FROM t, unnest(generate_series(0, len(toks) - {WIN_W})) AS u(pos)
    WHERE len(toks) >= {WIN_W}
),
own AS (
    SELECT h, MIN(doc_id) AS keep_doc, COUNT(DISTINCT doc_id) AS nd
    FROM w GROUP BY h
),
rem AS (
    SELECT w.doc_id, w.pos FROM w JOIN own ON own.h = w.h
    WHERE own.nd >= 2 AND w.doc_id <> own.keep_doc
),
flagged AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
                THEN 0 ELSE 1 END AS new_island
    FROM rem
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + {WIN_W} - 1 AS e
    FROM (SELECT doc_id, pos,
                 SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
          FROM flagged)
    GROUP BY doc_id, island
),
tok AS (
    SELECT doc_id, i, toks[i + 1] AS tok
    FROM t, unnest(generate_series(0, len(toks) - 1)) AS u(i)
),
kept AS (
    SELECT tk.doc_id, tk.i, tk.tok FROM tok tk
    WHERE NOT EXISTS (SELECT 1 FROM spans sp
                      WHERE sp.doc_id = tk.doc_id
                        AND tk.i BETWEEN sp.s AND sp.e)
),
agg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           md5(string_agg(tok, ' ' ORDER BY i)) AS clean_md5
    FROM kept GROUP BY doc_id
)
SELECT t2.doc_id,
       CAST(len(t2.toks) AS BIGINT) AS n_tokens,
       CAST(len(t2.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.clean_md5, md5('')) AS clean_md5
FROM t t2 LEFT JOIN agg a ON a.doc_id = t2.doc_id"""


@register(
    "curate_strip_shared_spans",
    _STRIP_SQL,
    doc=f"End-to-end surgical dedup: remove every duplicated span from "
    "every NON-CANONICAL document while the canonical owner (min doc_id "
    "per shared {WIN_W}-token window hash) keeps its text intact — the "
    "detect→locate→strip pipeline composed into one relational plan "
    "(shared-hash ownership aggregate → removed-position islands → "
    "token-level anti-range-join → order-preserving reassembly). Emits "
    "(doc_id, n_tokens, n_removed, md5(clean_text)) for EVERY document so "
    "the oracle verifies both the strip decisions and the exact "
    "reassembled bytes. 100 TB shape: the ownership exchange carries "
    "32-byte hashes; spans are per-doc bounded so the anti join fans out "
    "tokens x few-spans within each doc partition; no cross-doc pair "
    "explosion.",
)
def q_curate_strip_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    w = _window_hashes(docs)
    own = w.groupBy("h").agg(
        F.min("doc_id").alias("keep_doc"),
        F.countDistinct("doc_id").alias("nd"),
    )
    rem = (
        w.join(own, "h")
        .filter((F.col("nd") >= 2) & (F.col("doc_id") != F.col("keep_doc")))
        .select("doc_id", "pos")
    )
    spans = (
        _pos_islands(rem)
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + WIN_W - 1).alias("e"))
        .select("doc_id", "s", "e")
    )
    tok = t.select(
        "doc_id", F.posexplode("toks").alias("i", "tok")
    )
    kept = tok.alias("tk").join(
        spans.alias("sp"),
        (F.col("tk.doc_id") == F.col("sp.doc_id"))
        & F.col("tk.i").between(F.col("sp.s"), F.col("sp.e")),
        "left_anti",
    )
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ),
            )
        ).alias("clean_md5"),
    )
    empty_md5 = F.md5(F.lit(""))
    return (
        t.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.coalesce("n_kept", F.lit(0))).cast("long").alias(
                "n_removed"
            ),
            F.coalesce("clean_md5", empty_md5).alias("clean_md5"),
        )
    )


@register(
    "text_unigram_logprob",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT COUNT(*) AS n FROM tok),
scored AS (
    SELECT t.doc_id,
           CAST(FLOOR(-log2(CAST(f.cnt AS DOUBLE) / tot.n) * 1000) AS BIGINT)
               AS bits_milli
    FROM tok t JOIN freq f USING (tok) CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(bits_milli) // COUNT(*) AS BIGINT) AS bits_per_token_milli
FROM scored GROUP BY doc_id""",
    doc="Statistical quality scoring (the CCNet-style LM-proxy signal): "
    "corpus unigram frequencies give each token a surprisal of "
    "-log2(count/total) bits; a document's mean bits-per-token is the "
    "perplexity proxy quality pipelines bucket on (low = repetitive/"
    "boilerplate-heavy, high = rare-token noise; the middle is the "
    "keep-band). Determinism: surprisal is floored to integer milli-bits "
    "PER TOKEN and summed as BIGINT — exact, addition-order independent — "
    "then integer-divided by the token count, the same convention as "
    "tf-idf's milli-floor. 100 TB shape: one vocab aggregate plus a "
    "token↔vocab shuffle join (broadcast the vocab when it is bounded); "
    "per-doc reduction is an ordinary hash aggregate.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = tok.agg(F.count("*").alias("n"))
    scored = (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.floor(
                -F.log2(F.col("cnt").cast("double") / F.col("n")) * 1000
            )
            .cast("long")
            .alias("bits_milli"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("bits_milli").alias("_bits_total"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("_bits_total div n_tokens").alias("bits_per_token_milli"),
        )
    )


@register(
    "corpus_dup_stats",
    f"""WITH strip AS ({_STRIP_SQL})
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_affected,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(n_removed) AS BIGINT) AS tokens_removed,
       CAST(SUM(n_removed) * 1000 // SUM(n_tokens) AS BIGINT)
           AS removed_per_mille
FROM strip""",
    doc="Corpus-level dedup report — the one-row summary a curation run "
    "logs and alerts on: documents affected by cross-doc duplication, "
    "tokens that surgical stripping would remove, and the per-mille "
    "removal ratio (integer arithmetic end-to-end). Composes the "
    "curate_strip_shared_spans relation with one global aggregate; at "
    "100 TB the rollup input is one row per document, so the report adds "
    "a single reduce over already-computed results.",
)
def q_corpus_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    strip = q_curate_strip_shared_spans(spark, sf_dir)
    return strip.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_affected"),
        F.sum("n_tokens").alias("tokens_total"),
        F.sum("n_removed").alias("tokens_removed"),
    ).select(
        "n_docs",
        "docs_affected",
        "tokens_total",
        "tokens_removed",
        F.expr("tokens_removed * 1000 div tokens_total").alias("removed_per_mille"),
    )


@register(
    "gopher_repetition_full",
    """WITH d AS (
    SELECT doc_id, length(text) AS n_chars_c, string_split(text, ' ') AS t
    FROM documents WHERE len(string_split(text, ' ')) >= 3
),
ng AS (
    SELECT doc_id, n_chars_c, len(t) AS n_words, 2 AS n,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1])) AS g
    FROM d
    UNION ALL
    SELECT doc_id, n_chars_c, len(t), 3,
           unnest(list_transform(generate_series(1, len(t) - 2),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
    FROM d
),
cnt AS (
    SELECT doc_id, n_chars_c, n_words, n, g, COUNT(*) AS c
    FROM ng GROUP BY doc_id, n_chars_c, n_words, n, g
),
cov AS (
    SELECT doc_id, n_chars_c, n_words, n, c, c * length(g) AS cov FROM cnt
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(MAX(CASE WHEN n = 2 THEN cov END) * 1000 // n_chars_c AS BIGINT)
           AS top2_char_permille,
       CAST(COALESCE(SUM(CASE WHEN n = 2 AND c > 1 THEN cov END), 0) * 1000
            // n_chars_c AS BIGINT) AS dup2_char_permille,
       CAST(MAX(CASE WHEN n = 3 THEN cov END) * 1000 // n_chars_c AS BIGINT)
           AS top3_char_permille,
       CAST(COALESCE(SUM(CASE WHEN n = 3 AND c > 1 THEN cov END), 0) * 1000
            // n_chars_c AS BIGINT) AS dup3_char_permille
FROM cov GROUP BY doc_id, n_chars_c, n_words""",
    doc="The rest of the Gopher repetition suite (Rae et al. 2021 §A1.1): "
    "per-document fraction of characters covered by the MOST FREQUENT "
    "{2,3}-gram and by ALL duplicated {2,3}-grams, as exact integer "
    "per-mille (char coverage = count x gram length, so the top-gram "
    "scalar is MAX(c*len) — no argmax tie-break needed). Complements "
    "gopher_repetition's top-word/dup-bigram ratios with the char-mass "
    "view the paper thresholds on. Where the sibling uses zero-shuffle "
    "map-side array counting (right below ~10k words/doc), this one is "
    "the book-length-doc variant its docstring promises: one explode of "
    "tagged (n, gram) structs -> hash-aggregate counts -> per-doc "
    "conditional rollup. Both aggregates are partial-aggregation "
    "friendly (map-side combine on (doc_id, n, g)), the carried "
    "grouping keys n_chars_c/n_words are functionally dependent on "
    "doc_id so no join-back is needed, and nothing in the plan holds a "
    "whole document's distinct-gram set in one row, so a 500-page book "
    "streams through the same plan as a tweet.",
)
def q_gopher_repetition_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    d = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_c"),
        t.alias("t"),
    ).filter(F.size("t") >= 3)
    # r15 perf: partition by doc_id BEFORE the gram explode. Every
    # aggregate below groups by a superset of doc_id, and hash
    # partitioning on a subset of the grouping keys satisfies
    # ClusteredDistribution — so this ONE doc-sized shuffle (raw token
    # arrays) replaces BOTH gram-sized exchanges the planner otherwise
    # inserts (the (doc, n, gram) count and the per-doc rollup), each of
    # which carried one row per distinct gram, 2-3x the text bytes.
    # sf0.1 noop: 1.35s -> 0.85s, identical rows.
    d = d.repartition("doc_id")
    grams = F.expr(
        "concat("
        " transform(sequence(0, size(t) - 2),"
        "           i -> struct(2 AS n, concat_ws(' ', t[i], t[i+1]) AS g)),"
        " transform(sequence(0, size(t) - 3),"
        "           i -> struct(3 AS n,"
        "                       concat_ws(' ', t[i], t[i+1], t[i+2]) AS g)))"
    )
    ex = d.select(
        "doc_id",
        "n_chars_c",
        F.size("t").cast("long").alias("n_words"),
        F.explode(grams).alias("ng"),
    ).select(
        "doc_id",
        "n_chars_c",
        "n_words",
        F.col("ng.n").alias("n"),
        F.col("ng.g").alias("g"),
    )
    cov = ex.groupBy("doc_id", "n_chars_c", "n_words", "n", "g").agg(
        F.count("*").alias("c")
    ).select(
        "doc_id",
        "n_chars_c",
        "n_words",
        "n",
        "c",
        (F.col("c") * F.length("g")).alias("cov"),
    )
    per = cov.groupBy("doc_id", "n_chars_c", "n_words").agg(
        F.max(F.when(F.col("n") == 2, F.col("cov"))).alias("top2_cov"),
        F.coalesce(
            F.sum(F.when((F.col("n") == 2) & (F.col("c") > 1), F.col("cov"))),
            F.lit(0),
        ).alias("dup2_cov"),
        F.max(F.when(F.col("n") == 3, F.col("cov"))).alias("top3_cov"),
        F.coalesce(
            F.sum(F.when((F.col("n") == 3) & (F.col("c") > 1), F.col("cov"))),
            F.lit(0),
        ).alias("dup3_cov"),
    )
    return per.select(
        "doc_id",
        "n_words",
        F.expr("top2_cov * 1000 div n_chars_c").alias("top2_char_permille"),
        F.expr("dup2_cov * 1000 div n_chars_c").alias("dup2_char_permille"),
        F.expr("top3_cov * 1000 div n_chars_c").alias("top3_char_permille"),
        F.expr("dup3_cov * 1000 div n_chars_c").alias("dup3_char_permille"),
    )


@register(
    "text_bigram_logprob",
    """WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS t
    FROM documents WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
    SELECT doc_id, b.w1, b.w2
    FROM (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(t) - 1),
                        i -> {'w1': t[i], 'w2': t[i+1]})) AS b
          FROM d)
),
tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
uni AS (SELECT tok, COUNT(*) AS cu FROM tok GROUP BY tok),
tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uni),
bf AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
cx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS ctx FROM bf GROUP BY w1),
scored AS (
    SELECT g.doc_id,
           CAST(FLOOR(-LOG2(0.5 * CAST(bf.cb AS DOUBLE) / CAST(cx.ctx AS DOUBLE)
                            + 0.5 * CAST(uni.cu AS DOUBLE) / CAST(tot.n AS DOUBLE))
                      * 1000) AS BIGINT) AS bits_milli
    FROM bg g
    JOIN bf USING (w1, w2)
    JOIN cx USING (w1)
    JOIN uni ON uni.tok = g.w2
    CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits_milli) // COUNT(*) AS BIGINT) AS bits_per_bigram_milli
FROM scored GROUP BY doc_id""",
    doc="Context-sensitive LM-proxy quality score: a Jelinek-Mercer "
    "interpolated bigram model (lambda=0.5 between the corpus bigram "
    "MLE cb/ctx and the unigram fallback cu/N) scores each adjacent "
    "token pair with -log2(p) surprisal; a doc's mean bits-per-bigram "
    "separates fluent text from shuffled-word soup that the unigram "
    "scorer (text_unigram_logprob) cannot tell apart, since unigram "
    "scores are permutation-invariant. Same determinism convention as "
    "the unigram op: per-token milli-bit floors summed as BIGINT then "
    "integer-divided — addition-order independent, identical float "
    "expression shape on both engines. 100 TB shape: bigram/context/"
    "unigram vocab aggregates (map-side combinable), then vocab "
    "lookup joins that broadcast when bounded; no per-doc state.",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    d = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 2)
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS w1, t[i+1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    tok = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    uni = tok.groupBy("tok").agg(F.count("*").alias("cu"))
    # ctx and N are derivable from the vocab-sized aggregates (sum of bigram
    # counts per w1 == tokens-with-a-successor count; sum of unigram counts
    # == corpus token count) — two fewer full corpus explodes than the
    # direct formulation, and both identities are exact.
    # r15 perf, two plan moves measured on the executed plan (5 corpus
    # explodes -> 3):
    #  - ctx rides INSIDE the bf broadcast as a vocab-sized window
    #    (sum(cb) over w1) instead of a separate cx aggregate whose
    #    broadcast build re-ran the whole corpus bigram explode; one fewer
    #    broadcast join on the probe, too. The window input is the bigram
    #    VOCABULARY (bounded), never the corpus.
    #  - tot consumes uni with a no-op cu >= 1 filter so Catalyst cannot
    #    prune cu out of its subtree; the token-keyed exchange then
    #    canonicalizes identically to uni's and is reused instead of
    #    re-exploding every token for the 1-row total.
    tot = uni.filter(F.col("cu") >= 1).agg(F.sum("cu").alias("n"))
    bf = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    bfx = bf.withColumn("ctx", F.sum("cb").over(Window.partitionBy("w1")))
    scored = (
        bg.join(bfx, ["w1", "w2"])
        .join(uni, bg["w2"] == uni["tok"])
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                "CAST(FLOOR(-LOG2(0.5 * CAST(cb AS DOUBLE) / CAST(ctx AS DOUBLE)"
                " + 0.5 * CAST(cu AS DOUBLE) / CAST(n AS DOUBLE)) * 1000)"
                " AS BIGINT)"
            ).alias("bits_milli"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("bits_milli").alias("_bits_total"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("_bits_total div n_bigrams").alias("bits_per_bigram_milli"),
        )
    )


@register(
    "corpus_trigram_novelty",
    """WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS t
    FROM documents WHERE len(string_split(text, ' ')) >= 3
),
tri AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
    FROM d
),
df AS (SELECT g, COUNT(*) AS n_docs_with FROM tri GROUP BY g)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams_distinct,
       CAST(SUM(CASE WHEN f.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_trigrams_shared,
       CAST((COUNT(*) - SUM(CASE WHEN f.n_docs_with > 1 THEN 1 ELSE 0 END))
            * 1000 // COUNT(*) AS BIGINT) AS novelty_permille
FROM tri t JOIN df f USING (g)
GROUP BY t.doc_id""",
    doc="Cross-document novelty score: the per-mille of a document's "
    "distinct 3-grams that appear in NO other document. The cheap "
    "aggregate-only complement to pairwise containment — duplication "
    "PRESSURE per doc without materializing any doc pair, which is what "
    "a memorization-risk audit ranks on before paying for span-level "
    "dedup. (A doc's repeats of its own trigram don't count against "
    "it: document frequency is over DISTINCT (doc, gram).) 100 TB "
    "shape: per-doc distinct then one gram-keyed doc-frequency hash "
    "aggregate and a gram-keyed join back — two shuffles on the gram "
    "key, no pair expansion anywhere; skewed ubiquitous grams cap at "
    "one row per (gram, doc) before the df aggregate.",
)
def q_corpus_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    d = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 3)
    # r16 (guide §2.3/§2.4): per-doc trigram dedup happens MAP-SIDE via
    # array_distinct (a doc's trigrams sit in one row before the explode),
    # killing the corpus-wide (doc_id, g) distinct shuffle; the per-g doc
    # count is a window over ONE g-keyed exchange instead of a groupBy +
    # join-back, whose tri subtree twins can't share a stage in the same
    # AQE round (r15 finding) and whose build side broadcast the whole
    # distinct trigram relation — corpus-sized, a non-starter at 100 TB.
    # One tokenize pass, one corpus-wide exchange (g), one bounded final
    # aggregate (doc_id).
    tri = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(t) - 3),"
                " i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
            )
        ).alias("g"),
    )
    from pyspark.sql import Window

    counted = tri.withColumn(
        "n_docs_with", F.count("*").over(Window.partitionBy("g"))
    )
    return (
        counted
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams_distinct"),
            F.sum((F.col("n_docs_with") > 1).cast("long")).alias(
                "n_trigrams_shared"
            ),
        )
        .select(
            "doc_id",
            "n_trigrams_distinct",
            "n_trigrams_shared",
            F.expr(
                "(n_trigrams_distinct - n_trigrams_shared) * 1000"
                " div n_trigrams_distinct"
            ).alias("novelty_permille"),
        )
    )


# quality-gate thresholds (integer units so every comparison is exact);
# the LM band is in milli-bits per token, the ratios in per-mille
QV_MIN_TOKENS = 20
QV_TOP_WORD_PERMILLE = 150
QV_DUP_BIGRAM_PERMILLE = 200
QV_LM_LOW_MILLI = 2000
QV_LM_HIGH_MILLI = 5200

_QV_VERDICT_SQL = f"""CASE
    WHEN n_tokens < {QV_MIN_TOKENS} THEN 'too_short'
    WHEN top_word_permille >= {QV_TOP_WORD_PERMILLE} THEN 'repetitive_word'
    WHEN dup_bigram_permille >= {QV_DUP_BIGRAM_PERMILLE} THEN 'repetitive_bigram'
    WHEN bits_per_token_milli < {QV_LM_LOW_MILLI} THEN 'lm_too_predictable'
    WHEN bits_per_token_milli > {QV_LM_HIGH_MILLI} THEN 'lm_too_noisy'
    ELSE 'keep' END"""


@register(
    "curate_quality_verdicts",
    f"""WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sig AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN len(t) >= 1 THEN
                CAST(list_max(list_transform(list_distinct(t),
                     w -> len(list_filter(t, x -> x = w)))) AS BIGINT)
                * 1000 // len(t) ELSE 0 END AS BIGINT) AS top_word_permille,
           CAST(CASE WHEN len(t) >= 2 THEN
                (len(t) - 1
                 - len(list_distinct(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1]))))
                * 1000 // (len(t) - 1) ELSE 0 END AS BIGINT)
               AS dup_bigram_permille
    FROM t
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT COUNT(*) AS n FROM tok),
scored AS (
    SELECT t.doc_id,
           CAST(FLOOR(-log2(CAST(f.cnt AS DOUBLE) / tot.n) * 1000) AS BIGINT)
               AS bits_milli
    FROM tok t JOIN freq f USING (tok) CROSS JOIN tot
),
lm AS (
    SELECT doc_id, CAST(SUM(bits_milli) // COUNT(*) AS BIGINT)
               AS bits_per_token_milli
    FROM scored GROUP BY doc_id
),
joined AS (
    SELECT s.doc_id, s.n_tokens, s.top_word_permille, s.dup_bigram_permille,
           l.bits_per_token_milli
    FROM sig s JOIN lm l USING (doc_id)
)
SELECT doc_id, n_tokens, top_word_permille, dup_bigram_permille,
       bits_per_token_milli, {_QV_VERDICT_SQL} AS verdict
FROM joined""",
    doc="The full filter decision table — every quality signal the corpus "
    "computes (length, Gopher top-word and dup-bigram repetition as "
    "integer per-mille, and the unigram LM surprisal band), joined per "
    "document with an explicit precedence-ordered verdict "
    "(too_short > repetitive_word > repetitive_bigram > LM band > keep). "
    "This is the auditable artifact a CCNet/RefinedWeb-style gate "
    "actually ships: not a boolean, but WHICH rule fired, so threshold "
    "changes can be diffed against the table before a re-run. All "
    "comparisons are on exact integers; the LM signal reuses the "
    "text_unigram_logprob relation (one vocab aggregate + one lookup "
    "join at 100 TB), the repetition signals are map-side array math.",
)
def q_curate_quality_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    max_c = F.array_max(
        F.transform(
            F.array_distinct(F.col("t")),
            lambda w: F.size(F.filter(F.col("t"), lambda x: x == w)),
        )
    )
    dup_bg = F.expr(
        "size(t) - 1 - size(array_distinct(transform(sequence(0, size(t) - 2),"
        " i -> concat_ws(' ', t[i], t[i+1]))))"
    )
    sig = docs.select("doc_id", t.alias("t")).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.when(F.size("t") >= 1, (max_c.cast("long") * 1000).cast("long"))
        .otherwise(F.lit(0))
        .alias("_twc"),
        F.when(F.size("t") >= 2, (dup_bg.cast("long") * 1000).cast("long"))
        .otherwise(F.lit(0))
        .alias("_dbc"),
    ).select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") >= 1, F.expr("_twc div n_tokens")
        ).otherwise(F.lit(0)).cast("long").alias("top_word_permille"),
        F.when(
            F.col("n_tokens") >= 2, F.expr("_dbc div (n_tokens - 1)")
        ).otherwise(F.lit(0)).cast("long").alias("dup_bigram_permille"),
    )
    lm = q_unigram_logprob(spark, sf_dir).select(
        "doc_id", "bits_per_token_milli"
    )
    joined = sig.join(lm, "doc_id")
    verdict = (
        F.when(F.col("n_tokens") < QV_MIN_TOKENS, F.lit("too_short"))
        .when(
            F.col("top_word_permille") >= QV_TOP_WORD_PERMILLE,
            F.lit("repetitive_word"),
        )
        .when(
            F.col("dup_bigram_permille") >= QV_DUP_BIGRAM_PERMILLE,
            F.lit("repetitive_bigram"),
        )
        .when(
            F.col("bits_per_token_milli") < QV_LM_LOW_MILLI,
            F.lit("lm_too_predictable"),
        )
        .when(
            F.col("bits_per_token_milli") > QV_LM_HIGH_MILLI,
            F.lit("lm_too_noisy"),
        )
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "top_word_permille",
        "dup_bigram_permille",
        "bits_per_token_milli",
        verdict.alias("verdict"),
    )


# -- PII redaction ------------------------------------------------------------
#
# The curation step every training-data pipeline runs before text leaves the
# trust boundary: find-and-mask emails / phone numbers / IPv4 addresses.
# The synthetic documents fixture is PII-free word soup, so the operator
# first INJECTS deterministic PII derived from doc_id (arithmetic only —
# SQL-recomputable), then redacts it; the oracle replays both halves, so
# the hash row genuinely checks the regex semantics on both the match and
# the no-PII branch (every third doc stays clean). Patterns use the common
# Java-regex/RE2 subset so Spark (Java) and DuckDB (RE2) agree byte-for-byte.
#
# Scale shape: ONE projection pass, zero shuffles, whole-stage codegen —
# regexp_replace/regexp_count are JVM built-ins, so at 100 TB this is a
# pure map over the scan with pushed column pruning (doc_id, text only).

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_PII_RAW_SQL = """CASE WHEN doc_id % 3 = 0 THEN text
    ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
        || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.org call '
        || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') || '-'
        || lpad(CAST((doc_id * 13) % 1000 AS VARCHAR), 3, '0') || '-'
        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        || CASE WHEN doc_id % 2 = 0
                THEN ' alt ' || lpad(CAST((doc_id * 11) % 1000 AS VARCHAR), 3, '0')
                     || '.' || lpad(CAST((doc_id * 17) % 1000 AS VARCHAR), 3, '0')
                     || '.' || lpad(CAST((doc_id * 19) % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || ' from ' || CAST(doc_id % 256 AS VARCHAR)
        || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
        || '.' || CAST((doc_id * 5) % 256 AS VARCHAR)
        || '.' || CAST(1 + doc_id % 254 AS VARCHAR)
    END"""

# shared by the batch query and its streaming twin (streaming/ingest.py):
# a stateless map has ONE correct answer regardless of micro-batching, so
# both registrations carry the identical oracle string
PII_REDACT_ORACLE = f"""WITH r AS (
        SELECT doc_id, {_PII_RAW_SQL} AS raw FROM documents
    ), red AS (
        SELECT doc_id,
            CAST(len(regexp_extract_all(raw, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(raw, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
            CAST(len(regexp_extract_all(raw, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
            regexp_replace(regexp_replace(regexp_replace(raw,
                '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                '{PII_IP_RE}', '[IP]', 'g'),
                '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted
        FROM r
    )
    SELECT doc_id, n_emails, n_phones, n_ips, redacted,
        (len(regexp_extract_all(redacted, '{PII_EMAIL_RE}')) = 0
         AND len(regexp_extract_all(redacted, '{PII_PHONE_RE}')) = 0
         AND len(regexp_extract_all(redacted, '{PII_IP_RE}')) = 0) AS pii_clean
    FROM red"""


@register(
    "text_pii_redact",
    PII_REDACT_ORACLE,
    doc="PII redaction: mask emails / phones (dashed + dotted) / IPv4 with "
    "typed placeholders and count each class pre-redaction; pii_clean "
    "proves the masked text carries no residual match. Deterministic "
    "arithmetic injection makes the oracle a genuine cross-engine regex "
    "check (Java regex vs RE2) on both the PII and clean branches.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pii_redact_frame(docs)


def pii_redact_frame(docs: DataFrame) -> DataFrame:
    """The redaction map over any (doc_id, text) relation — a stateless
    narrow projection, so the SAME function serves the batch query above
    and the streaming twin (streaming/ingest.py: streaming_pii_scrub)
    with one shared oracle."""
    did = F.col("doc_id")

    def s(col):  # arithmetic term -> string, the CAST both engines share
        return col.cast("string")

    def z(col, n):  # zero-padded fixed-width digit group
        return F.lpad(s(col), n, "0")

    email = F.concat(
        F.lit("user"), s(did), F.lit("@mail"), s(did % 5), F.lit(".org")
    )
    phone_dashed = F.concat(
        z((did * 7) % 1000, 3), F.lit("-"),
        z((did * 13) % 1000, 3), F.lit("-"),
        z(did % 10000, 4),
    )
    phone_dotted = F.concat(
        z((did * 11) % 1000, 3), F.lit("."),
        z((did * 17) % 1000, 3), F.lit("."),
        z((did * 19) % 10000, 4),
    )
    ip = F.concat(
        s(did % 256), F.lit("."), s((did * 3) % 256), F.lit("."),
        s((did * 5) % 256), F.lit("."), s(1 + did % 254),
    )
    raw = F.when(did % 3 == 0, F.col("text")).otherwise(
        F.concat(
            F.col("text"),
            F.lit(" contact "), email,
            F.lit(" call "), phone_dashed,
            F.when(
                did % 2 == 0, F.concat(F.lit(" alt "), phone_dotted)
            ).otherwise(F.lit("")),
            F.lit(" from "), ip,
        )
    )

    def n_hits(col, pat):
        return F.regexp_count(col, F.lit(pat)).cast("long")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), PII_EMAIL_RE, "[EMAIL]"),
            PII_IP_RE, "[IP]",
        ),
        PII_PHONE_RE, "[PHONE]",
    )
    return (
        docs.select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            n_hits(F.col("raw"), PII_EMAIL_RE).alias("n_emails"),
            n_hits(F.col("raw"), PII_PHONE_RE).alias("n_phones"),
            n_hits(F.col("raw"), PII_IP_RE).alias("n_ips"),
            redacted.alias("redacted"),
        )
        .withColumn(
            "pii_clean",
            (F.regexp_count(F.col("redacted"), F.lit(PII_EMAIL_RE)) == 0)
            & (F.regexp_count(F.col("redacted"), F.lit(PII_PHONE_RE)) == 0)
            & (F.regexp_count(F.col("redacted"), F.lit(PII_IP_RE)) == 0),
        )
    )


CHUNK_WIN = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "text_chunk_overlap",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(LEAST({CHUNK_WIN}, len(toks) - chunk_idx * {CHUNK_STRIDE})
            AS BIGINT) AS n_tokens,
       array_to_string(toks[chunk_idx * {CHUNK_STRIDE} + 1 :
                            chunk_idx * {CHUNK_STRIDE} + {CHUNK_WIN}], ' ')
           AS chunk_text
FROM t, unnest(generate_series(0, (len(toks) - 1) // {CHUNK_STRIDE})) AS u(chunk_idx)""",
    doc=f"RAG-style OVERLAPPING context chunking: {CHUNK_WIN}-token windows "
    f"every {CHUNK_STRIDE} tokens ({CHUNK_WIN - CHUNK_STRIDE}-token overlap "
    "between consecutive chunks, so no retrieval-relevant span is ever "
    "split across a boundary without appearing whole in a neighbor — the "
    "standard retrieval-index preparation the fixed-grid chunker cannot "
    "express). Same explode shape as text_chunk_fixed: pure array "
    "arithmetic, partition-parallel, no shuffle.",
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = ((F.size(toks) - 1) / CHUNK_STRIDE).cast("long")
    exploded = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(CHUNK_WIN), F.size("toks") - start)
        .cast("long")
        .alias("n_tokens"),
        F.array_join(F.slice("toks", start + 1, CHUNK_WIN), " ").alias(
            "chunk_text"
        ),
    )


CURRICULUM_PHASES = 4


@register(
    "corpus_curriculum_phases",
    f"""WITH s AS (
    SELECT doc_id,
           CAST(len(list_distinct(string_split(text, ' '))) * 1000 //
                len(string_split(text, ' ')) AS BIGINT) AS diversity_permille
    FROM documents
),
b AS (
    SELECT CAST(FLOOR(1000 * quantile_cont(CAST(diversity_permille AS DOUBLE),
                                           0.25)) AS BIGINT) AS p25,
           CAST(FLOOR(1000 * quantile_cont(CAST(diversity_permille AS DOUBLE),
                                           0.50)) AS BIGINT) AS p50,
           CAST(FLOOR(1000 * quantile_cont(CAST(diversity_permille AS DOUBLE),
                                           0.75)) AS BIGINT) AS p75
    FROM s
)
SELECT doc_id, diversity_permille,
       CAST(CASE WHEN diversity_permille * 1000 <= b.p25 THEN 1
                 WHEN diversity_permille * 1000 <= b.p50 THEN 2
                 WHEN diversity_permille * 1000 <= b.p75 THEN 3
                 ELSE 4 END AS BIGINT) AS phase
FROM s CROSS JOIN b""",
    doc=f"Curriculum construction: split the corpus into "
    f"{CURRICULUM_PHASES} training phases by exact quartiles of a quality "
    "signal (lexical-diversity per-mille — integer, so the quantile "
    "interpolation is deterministic and the milli-floored boundaries are "
    "engine-exact). VALUE-threshold bucketing, not NTILE: a global "
    "row-number would total-sort the corpus on one reducer, while the "
    "boundary trio is one aggregate broadcast back into a map-side CASE — "
    "the shape that survives 100 TB. Ties share a phase by design (equal "
    "quality must not straddle a curriculum boundary).",
)
def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000 div "
            "size(split(text, ' '))"
        )
        .cast("long")
        .alias("diversity_permille"),
    )
    b = s.agg(
        *[
            F.floor(
                1000
                * F.expr(
                    f"percentile(CAST(diversity_permille AS DOUBLE), {q})"
                )
            )
            .cast("long")
            .alias(n)
            for n, q in (("p25", 0.25), ("p50", 0.50), ("p75", 0.75))
        ]
    )
    s = s.crossJoin(F.broadcast(b))
    d1000 = F.col("diversity_permille") * 1000
    return s.select(
        "doc_id",
        "diversity_permille",
        F.when(d1000 <= F.col("p25"), F.lit(1))
        .when(d1000 <= F.col("p50"), F.lit(2))
        .when(d1000 <= F.col("p75"), F.lit(3))
        .otherwise(F.lit(4))
        .cast("long")
        .alias("phase"),
    )
