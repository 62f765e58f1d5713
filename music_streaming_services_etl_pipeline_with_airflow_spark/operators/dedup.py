"""Deduplication operators over the ``documents`` table — the
training-data-pipeline extension family (BASELINE.json north star; no
reference-repo counterpart, so semantics follow the standard literature:
Broder resemblance / MinHash-LSH banding, Charikar SimHash).

Six method families, oracle-checked unless noted:

- exact          — hash-groupBy on md5(text) (shuffle md5 keys, not 100 KB
                   texts — the 100 TB version of ``dropDuplicates``)
- minhash_lsh    — shingle → 8 seeded-md5 minhashes → 4 bands × 2 rows →
                   bucket self-join → exact-Jaccard verify ≥ 0.5
- ngram_jaccard  — exact all-pair Jaccard via shingle-key equi-join
                   (candidate pairs share ≥1 shingle; the exact baseline
                   LSH approximates)
- containment    — doc-in-doc C(A,B) ≥ 0.8: exact equi-join baseline plus
                   the prefix-filtered (PPJoin-style) scale twin
                   ``dedup_containment_banded`` (lossless, same oracle)
- simhash        — 32-bit Charikar fingerprint + Hamming-≤6 pairs
- embedding near-dup — cosine ≥ threshold pairs on the embeddings table
                   (exact baseline oracle-checked; hyperplane-LSH variant
                   rows-only with pytest recall pin)

Scale design: every method is shuffle-on-small-keys. MinHash-LSH is the
canonical 100 TB near-dup path: cost is O(docs × shingles) map-side +
a band-bucket shuffle whose fan-in AQE handles; the exact verify touches
only candidate pairs. The brute-force pair scans (ngram_jaccard without
banding, simhash all-pairs, embedding all-pairs) are correctness baselines;
their scale path is the banded/bucketed variant.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import vectors as V
from ..plans.registry import register
from ..sources import load_table

N_SHINGLE = 3
N_HASHES = 8
N_BANDS = 4  # r = 2 rows/band → LSH threshold ≈ (1/4)^(1/2) = 0.5
JACCARD_THRESHOLD = 0.5
HAMMING_MAX = 6
COSINE_DUP_THRESHOLD = 0.45


# --------------------------------------------------------------------------
# Shared shingle-set builders
# --------------------------------------------------------------------------


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct n-word shingles per document."""
    toks = docs.select("doc_id", H.tokens("text").alias("toks"))
    return toks.select(
        "doc_id", F.explode(H.word_shingles("toks", N_SHINGLE)).alias("s")
    )


def _shingles_cte(src: str = "documents") -> str:
    return f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM {src}),
shingles AS (
    SELECT doc_id, unnest({H.shingles_sql(N_SHINGLE, 't')}) AS s FROM toks
),
scounts AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id)
"""


_SHINGLES_CTE = _shingles_cte()


def _pair_jaccard(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (da, db) pairs from their shingle sets."""
    counts = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = shingles.select(F.col("doc_id").alias("da"), "s")
    sb = shingles.select(F.col("doc_id").alias("db"), "s")
    inter = (
        pairs.join(sa, "da")
        .join(sb, ["db", "s"])
        .groupBy("da", "db")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(counts.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na")), "da")
        .join(counts.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb")), "db")
        .select(
            "da",
            "db",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# 1. Exact dedup
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    """SELECT md5(text) AS text_hash,
              CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
              COUNT(*) AS n_copies
       FROM documents GROUP BY md5(text)""",
    doc="Exact dedup as hash-groupBy on md5(text): at 100 TB the shuffle "
    "carries 32-byte keys instead of document bodies; min(doc_id) is the "
    "deterministic survivor.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# --------------------------------------------------------------------------
# 2. MinHash + LSH banding
# --------------------------------------------------------------------------


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, h0..h{k-1}, n_sh) — k seeded-md5 lexicographic-min signatures
    plus the shingle count (the size-blocking key for the band join)."""
    aggs = [
        F.min(H.seeded_md5(j, F.col("s"))).alias(f"h{j}") for j in range(N_HASHES)
    ] + [F.count("*").alias("n_sh")]
    return shingles.groupBy("doc_id").agg(*aggs)


def banded_signatures(sigs: DataFrame, compress=None) -> DataFrame:
    """(doc_id, g, band, bval) — the LSH band relation every banded plan
    joins on: band value = compressed concat of r minhashes so the shuffle
    key is fixed-width; ``g = floor(log2(n_sh))`` is the size bucket the
    ±1 blocking guarantee quantifies over. ONE definition on purpose: the
    two-sided self-join (lsh_candidate_pairs) and the one-sided
    stored-index probe (q_dedup_minhash_incremental) inherit their
    lossless-collision guarantees from this exact layout.

    ``compress`` is the band-value compression function (default
    ``F.md5`` → 32-char hex string, the layout the STORED minhash index
    persists — streaming/ingest snapshots and the incremental probe must
    keep it). Transient self-join plans pass ``F.xxhash64`` (8-byte
    bigint, r16 guide §2.3): band equality still holds iff the r-vector
    concat is equal modulo hash collisions, and a collision can only ADD
    a candidate pair, which the exact string-shingle verify discards —
    same losslessness argument as md5, ~5× fewer key bytes per band row
    in the candidate-join shuffle."""
    fcomp = compress if compress is not None else F.md5
    r = N_HASHES // N_BANDS
    g = F.floor(F.log2("n_sh")).cast("int")
    return sigs.select(
        "doc_id",
        g.alias("g"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        fcomp(
                            F.concat(*[F.col(f"h{b * r + i}") for i in range(r)])
                        ).alias("bval"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bv"),
    ).select(
        "doc_id", "g", F.col("bv.band").alias("band"), F.col("bv.bval").alias("bval")
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Docs sharing ≥1 band bucket. Band value = concat of r minhashes,
    xxhash64-compressed to an 8-byte bigint (r16): this relation is
    transient (never stored), so the self-join key doesn't need the md5
    stored-index layout — a bigint shuffles ~5× fewer key bytes per band
    row, and a 64-bit collision only ADDS a candidate pair that the exact
    string-shingle verify removes.

    Size blocking (LOSSLESS at this threshold): Jaccard ≥ 0.5 forces
    min(|A|,|B|)/max(|A|,|B|) ≥ 0.5 (intersection ≤ min, union ≥ max), so a
    qualifying pair's ``floor(log2(n_sh))`` buckets differ by at most 1.
    The probe side therefore emits each band row under its own bucket and
    the next one, the build side under its own — every survivable pair still
    collides, but band buckets fragment by document size, pruning
    cross-size false candidates before the pair-dedup shuffle.
    """
    bands = banded_signatures(sigs, compress=F.xxhash64)
    a = bands.select(
        F.col("doc_id").alias("da"),
        "band",
        "bval",
        F.explode(F.array(F.col("g"), F.col("g") + 1)).alias("gk"),
    )
    b = bands.select(F.col("doc_id").alias("db"), "band", "bval", F.col("g").alias("gk"))
    # Orientation-normalize BEFORE filtering: the asymmetric explode means a
    # cross-bucket pair collides only with the SMALLER doc on the probe (a)
    # side, so `da < db` would drop it whenever the smaller doc has the larger
    # doc_id. least/greatest makes survival independent of orientation.
    return (
        a.join(b, ["band", "bval", "gk"])
        .filter(F.col("da") != F.col("db"))
        .select(F.least("da", "db").alias("da"), F.greatest("da", "db").alias("db"))
        .distinct()
    )


def _minhash_ctes(src: str = "documents") -> str:
    """The full MinHash-LSH pipeline as a CTE list (no leading WITH), ending
    with `minhash_pairs` = verified near-dup pairs — composable by other
    oracles (connected components, corpus curation) over any doc relation."""
    r = N_HASHES // N_BANDS
    minhash_aggs = ", ".join(
        f"MIN({H.seeded_md5_sql(j, 's')}) AS h{j}" for j in range(N_HASHES)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || ".join(f"h{b * r + i}" for i in range(r))
        + ") AS bval FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""{_shingles_cte(src)},
sigs AS (SELECT doc_id, {minhash_aggs} FROM shingles GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval
    WHERE a.doc_id < b.doc_id
),
inter AS (
    SELECT c.da, c.db, COUNT(*) AS n_inter
    FROM cand c
    JOIN shingles sa ON sa.doc_id = c.da
    JOIN shingles sb ON sb.doc_id = c.db AND sb.s = sa.s
    GROUP BY c.da, c.db
),
minhash_pairs AS (
    SELECT i.da, i.db,
           CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
    FROM inter i
    JOIN scounts ca ON ca.doc_id = i.da
    JOIN scounts cb ON cb.doc_id = i.db
    WHERE CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter)
          >= {JACCARD_THRESHOLD}
)"""


def _minhash_sql() -> str:
    return f"WITH {_minhash_ctes()} SELECT da, db, jaccard FROM minhash_pairs"


@register(
    "dedup_minhash_lsh",
    _minhash_sql(),
    doc=f"MinHash({N_HASHES} seeded-md5 lex-min hashes) + LSH banding "
    f"({N_BANDS} bands × {N_HASHES // N_BANDS}) → size-blocked candidate "
    f"buckets → exact-Jaccard verify ≥ {JACCARD_THRESHOLD}. Exact duplicates "
    "are collapsed to one representative per distinct text BEFORE the "
    "near-dup machinery (the standard production composition), so shingling, "
    "banding and verification cost scale with distinct content, not corpus "
    "size; member pairs are expanded back afterwards, provably identical "
    "output (identical texts have identical shingle sets).",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # Stage 1 — exact-dup collapse: one representative doc per distinct text.
    # A replicated corpus (the common 100 TB reality) pays near-dup cost on
    # distinct texts only; 32-byte hashes shuffle, never bodies.
    hashed = docs.select("doc_id", F.md5("text").alias("th"))
    groups = hashed.groupBy("th").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_members")
    )
    members = hashed.join(groups, "th").persist(StorageLevel.MEMORY_AND_DISK)
    rep_docs = docs.join(
        members.filter(F.col("doc_id") == F.col("rep")).select("doc_id"), "doc_id"
    )
    # Stage 2 — MinHash-LSH over representatives. The shingle relation feeds
    # the signature, candidate and verify branches — persist it once instead
    # of re-scanning and re-shingling per branch.
    sh = doc_shingles(rep_docs).persist(StorageLevel.MEMORY_AND_DISK)
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    rep_pairs = _pair_jaccard(sh, cand).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    # Stage 3 — expand back to member pairs (output-proportional joins).
    # Cross-group: every member pair of two near-dup groups shares the
    # representatives' jaccard (identical texts ⇒ identical shingle sets).
    ma = members.select(F.col("rep").alias("da"), F.col("doc_id").alias("xa"))
    mb = members.select(F.col("rep").alias("db"), F.col("doc_id").alias("xb"))
    cross = (
        rep_pairs.join(ma, "da")
        .join(mb, "db")
        .select(
            F.least("xa", "xb").alias("da"),
            F.greatest("xa", "xb").alias("db"),
            "jaccard",
        )
    )
    # Within-group: identical texts are jaccard-1.0 pairs — but only for docs
    # that shingle at all (<N_SHINGLE-token docs have no signatures and are
    # never emitted by the direct pipeline either).
    shingled_reps = sh.select(F.col("doc_id").alias("rep")).distinct()
    wm = members.join(shingled_reps, "rep").filter(F.col("n_members") >= 2)
    within = (
        wm.select("th", F.col("doc_id").alias("da"))
        .join(wm.select("th", F.col("doc_id").alias("db")), "th")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


# --------------------------------------------------------------------------
# 3. Exact n-gram Jaccard (the baseline LSH approximates)
# --------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    f"""
WITH {_SHINGLES_CTE},
inter AS (
    SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
    FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.da, i.db,
       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN scounts ca ON ca.doc_id = i.da
JOIN scounts cb ON cb.doc_id = i.db
WHERE CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) >= {JACCARD_THRESHOLD}
""",
    doc="[CORRECTNESS BASELINE — quadratic on colliding keys; use "
    "dedup_minhash_lsh at scale] Exact n-gram Jaccard ≥ 0.5 over all pairs "
    "sharing ≥1 shingle — "
    "the exhaustive baseline; the shingle equi-join prunes the quadratic "
    "pair space to colliding keys.",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("n_inter"))
        .select("da", "db")
    )
    return _pair_jaccard(sh, pairs).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


CONTAINMENT_THRESHOLD = 0.8

_CONTAINMENT_ORACLE = f"""
WITH {_SHINGLES_CTE},
inter AS (
    SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
    FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.da, i.db,
       CAST(i.n_inter AS DOUBLE) / ca.n_sh AS cont_a_in_b,
       CAST(i.n_inter AS DOUBLE) / cb.n_sh AS cont_b_in_a
FROM inter i
JOIN scounts ca ON ca.doc_id = i.da
JOIN scounts cb ON cb.doc_id = i.db
WHERE GREATEST(CAST(i.n_inter AS DOUBLE) / ca.n_sh,
               CAST(i.n_inter AS DOUBLE) / cb.n_sh) >= {CONTAINMENT_THRESHOLD}
"""


@register(
    "dedup_containment",
    _CONTAINMENT_ORACLE,
    doc=f"Containment dedup (doc-in-doc): C(A,B) = |A∩B|/|A| over shingle "
    f"sets, flagging pairs where either direction ≥ {CONTAINMENT_THRESHOLD} "
    "— catches a short document copied inside a long one, which "
    "Jaccard-based near-dup misses (a 100-shingle doc inside a 10k-shingle "
    "doc has J≈0.01 but containment 1.0). Shingle equi-join prunes pairs "
    "to colliding keys; the scale path replaces the exact intersection "
    "with minhash-of-the-smaller-set (containment sketch), same shape as "
    "dedup_minhash_lsh.",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    return (
        inter.join(ca, "da")
        .join(cb, "db")
        .select(
            "da",
            "db",
            (F.col("n_inter").cast("double") / F.col("na")).alias("cont_a_in_b"),
            (F.col("n_inter").cast("double") / F.col("nb")).alias("cont_b_in_a"),
        )
        .filter(
            F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a"))
            >= CONTAINMENT_THRESHOLD
        )
    )


def _containment_prefix_pairs(sh: DataFrame) -> DataFrame:
    """Verified max-containment ≥ τ pairs over a shingle relation, via the
    lossless rarest-prefix probe — the shared kernel of both adaptive
    branches of ``dedup_containment_banded``."""
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # r16 (guide §2.3/§3): candidate GENERATION runs on xxhash64(s) — the
    # frequency aggregate, the rarest-first ranking window and the
    # prefix-probe join all shuffle 8-byte bigints instead of shingle
    # text. Lossless twice over: (a) the prefix lemma holds for ANY
    # ⌊(1-τ)·n⌋+1 of a doc's distinct shingles (at most (1-τ)·n of them
    # can miss a ≥τ partner, whatever order picked the prefix), so
    # ranking by hashed identity instead of raw text only changes WHICH
    # lossless prefix is probed; (b) a 64-bit collision can only ADD a
    # candidate pair, which the exact string-keyed verify below discards.
    # (freq, hs) is a total order over distinct hashes, so prefixes stay
    # deterministic; colliding duplicates (if any ever occur) are
    # absorbed by the candidate .distinct().
    shh = sh.select("doc_id", F.xxhash64("s").alias("hs"))
    freq = shh.groupBy("hs").agg(F.count("*").alias("s_freq"))
    ranked = (
        shh.join(freq, "hs")
        .join(counts, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("s_freq", "hs")
            ),
        )
    )
    # Integer-safe prefix bound: (1 - 0.8) evaluates to 0.19999999999999996
    # in binary float, so floor(0.1999... * n_sh) is one short whenever
    # (1-τ)·n_sh is a whole number (e.g. n_sh=5 → 0 instead of 1), silently
    # dropping pairs at containment exactly τ. The epsilon only ever rounds
    # UP to the true integer value — a longer prefix adds candidates, never
    # loses them, so losslessness is preserved.
    prefix = ranked.filter(
        F.col("rk")
        <= F.floor((1 - CONTAINMENT_THRESHOLD) * F.col("n_sh") + F.lit(1e-9)).cast(
            "int"
        )
        + 1
    ).select("doc_id", "hs")
    # Probe (prefix) × index (full): any pair with max-containment ≥ τ
    # collides on ≥1 prefix shingle of its smaller member.
    cand = (
        prefix.select(F.col("doc_id").alias("pa"), "hs")
        .join(shh.select(F.col("doc_id").alias("pb"), "hs"), "hs")
        .filter(F.col("pa") != F.col("pb"))
        .select(F.least("pa", "pb").alias("da"), F.greatest("pa", "pb").alias("db"))
        .distinct()
    )
    # Exact verify on candidates only.
    sa = sh.select(F.col("doc_id").alias("da"), "s")
    sb = sh.select(F.col("doc_id").alias("db"), "s")
    inter = (
        cand.join(sa, "da")
        .join(sb, ["db", "s"])
        .groupBy("da", "db")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    return (
        inter.join(ca, "da")
        .join(cb, "db")
        .select(
            "da",
            "db",
            (F.col("n_inter").cast("double") / F.col("na")).alias("cont_a_in_b"),
            (F.col("n_inter").cast("double") / F.col("nb")).alias("cont_b_in_a"),
        )
        .filter(
            F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a"))
            >= CONTAINMENT_THRESHOLD
        )
    )


@register(
    "dedup_containment_banded",
    # LOSSLESS candidate pruning ⇒ output identical to dedup_containment ⇒
    # the exact-intersection SQL is a valid oracle for the banded plan too.
    _CONTAINMENT_ORACLE,
    doc=f"Containment dedup, scale path: prefix-filtered set-similarity "
    f"join (PPJoin-family). Each doc probes the inverted shingle index "
    f"with only its ⌊(1-τ)·n⌋+1 RAREST shingles (global-frequency order): "
    f"if max-containment ≥ τ={CONTAINMENT_THRESHOLD}, the smaller set is "
    "missing at most (1-τ)·n shingles from the larger, so at least one "
    "prefix shingle must collide — lossless. Rare-first ordering makes "
    "prefix keys low-fan-out, collapsing the quadratic hot-shingle blowup "
    "of the exact equi-join; exact containment is then verified on "
    "candidate pairs only. Output provably equals dedup_containment.",
)
def q_dedup_containment_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("doc_id", F.md5("text").alias("th"))
    # Adaptive composition, mirroring dedup_embedding_lsh: the exact-dup
    # collapse (+ member-pair expansion) only pays off when the corpus
    # repeats texts. Identical texts have identical shingle sets, so both
    # branches emit the same pairs; one bounded-row aggregate picks the
    # cheaper plan.
    stats = hashed.agg(
        F.approx_count_distinct("th", rsd=0.01).alias("nd"),
        F.count("*").alias("n"),
    ).first()
    collapse = stats["n"] > 0 and stats["nd"] < 0.95 * stats["n"]
    if not collapse:
        sh = doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
        return _containment_prefix_pairs(sh)
    # Stage 0 — exact-dup collapse (same composition as dedup_minhash_lsh):
    # prefix-filtering runs on one representative per distinct text. On a
    # replicated corpus this keeps the inverted-index fan-out proportional
    # to distinct content (a 10x nested-copy corpus multiplies every
    # shingle frequency by 10 and the probe x index fan-out by 100
    # without it).
    groups = hashed.groupBy("th").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_members")
    )
    members = hashed.join(groups, "th").persist(StorageLevel.MEMORY_AND_DISK)
    rep_docs = docs.join(
        members.filter(F.col("doc_id") == F.col("rep")).select("doc_id"), "doc_id"
    )
    sh = doc_shingles(rep_docs).persist(StorageLevel.MEMORY_AND_DISK)
    rep_pairs = _containment_prefix_pairs(sh)
    # Stage 3 — expand back to member pairs (output-proportional joins).
    # Containment is DIRECTIONAL: when least/greatest flips the pair's
    # orientation relative to its representatives, the two containment
    # columns must swap with it.
    ma = members.select(F.col("rep").alias("da"), F.col("doc_id").alias("xa"))
    mb = members.select(F.col("rep").alias("db"), F.col("doc_id").alias("xb"))
    flip = F.col("xa") > F.col("xb")
    cross = (
        rep_pairs.join(ma, "da")
        .join(mb, "db")
        .select(
            F.least("xa", "xb").alias("da"),
            F.greatest("xa", "xb").alias("db"),
            F.when(flip, F.col("cont_b_in_a"))
            .otherwise(F.col("cont_a_in_b"))
            .alias("cont_a_in_b"),
            F.when(flip, F.col("cont_a_in_b"))
            .otherwise(F.col("cont_b_in_a"))
            .alias("cont_b_in_a"),
        )
    )
    # Within-group: identical texts are 1.0/1.0 containment pairs — but
    # only for docs that shingle at all (<N_SHINGLE-token docs never enter
    # the exact pipeline's shingle relation either).
    shingled_reps = sh.select(F.col("doc_id").alias("rep")).distinct()
    wm = members.join(shingled_reps, "rep").filter(F.col("n_members") >= 2)
    within = (
        wm.select("th", F.col("doc_id").alias("da"))
        .join(wm.select("th", F.col("doc_id").alias("db")), "th")
        .filter(F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.lit(1.0).alias("cont_a_in_b"),
            F.lit(1.0).alias("cont_b_in_a"),
        )
    )
    return cross.unionByName(within)


# --------------------------------------------------------------------------
# 4. SimHash
# --------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — Charikar fingerprint over distinct tokens.

    Token hash = first 8 md5 hex chars as int; bit b of the fingerprint is
    the sign of Σ_tokens (±1 by token-hash bit b). All integer math — no
    float order sensitivity.
    """
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(H.tokens("text"))).alias("tok")
    )
    th = toks.select("doc_id", H.hex8_to_long(F.md5(F.col("tok"))).alias("th"))
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"pmod(shiftright(th, {b}), 2)") == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = th.groupBy("doc_id").agg(*bit_aggs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else (fp + term)
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def _simhash_cte(bits: int = 32) -> str:
    th = H.hex8_to_long_sql("md5(tok)")
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (th >> {b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
dtoks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
          FROM documents),
thash AS (SELECT doc_id, {th} AS th FROM dtoks),
bitsums AS (SELECT doc_id, {bit_sums} FROM thash GROUP BY doc_id),
simhashes AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bitsums)
"""


@register(
    "dedup_simhash",
    f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM simhashes",
    doc="32-bit SimHash fingerprint per document (Charikar): integer-only "
    "math from md5 token hashes, reproducible across engines.",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    f"""WITH {_simhash_cte()}
SELECT a.doc_id AS da, b.doc_id AS db,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM simhashes a JOIN simhashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}""",
    doc="[CORRECTNESS BASELINE — all-pairs O(n²); use dedup_simhash_banded "
    f"at scale] SimHash near-dup pairs: Hamming distance ≤ {HAMMING_MAX} over the "
    "32-bit fingerprints. All-pairs here (correctness baseline); the scale "
    "path buckets on fingerprint prefixes like LSH bands.",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = simhash(load_table(spark, sf_dir, "documents"))
    a = fps.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = fps.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


N_SIMHASH_BANDS = 8  # 32 bits / 8 bands = 4-bit bands; any pair with
# Hamming ≤ 7 shares ≥1 untouched band (pigeonhole), so banding is EXACT
# for our ≤6 threshold — same output as all-pairs, scalable plan.


@register(
    "dedup_simhash_banded",
    # identical result to the all-pairs query (banding is lossless at this
    # threshold) — the oracle stays the simple quadratic formulation.
    f"""WITH {_simhash_cte()}
SELECT a.doc_id AS da, b.doc_id AS db,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM simhashes a JOIN simhashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}""",
    doc=f"SimHash near-dup pairs via {N_SIMHASH_BANDS}-band bucketing "
    "(4-bit bands): candidates share ≥1 band bucket, then Hamming-verify. "
    f"Pigeonhole guarantees every Hamming-≤{HAMMING_MAX} pair collides in "
    "some band, so the result equals the all-pairs scan at a fraction of "
    "the cost — the 100 TB simhash plan.",
)
def q_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    # one row per doc — persist so the a/b join branches don't each re-run
    # the explode+md5+32-bitsum fingerprint pipeline
    fps = simhash(load_table(spark, sf_dir, "documents")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"pmod(shiftright(simhash, {4 * b}), 16)").alias("bval"),
                    )
                    for b in range(N_SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.bval")
    a = bands.select(
        F.col("doc_id").alias("da"), F.col("simhash").alias("ha"), "band", "bval"
    )
    # r16 (guide §2.6): the fingerprint aggregate collapses to a handful of
    # partitions at small inputs (AQE coalesces the tiny exchange), so the
    # candidate probe — O(sum bucket²) bit_count evaluations, the query's
    # real work — would run near-serial. Spread the PROBE side only (the
    # build side is broadcast anyway); no-op when the cached relation is
    # already wide, so real-scale plans pay nothing.
    par = bands.sparkSession.sparkContext.defaultParallelism
    b_src = bands if bands.rdd.getNumPartitions() >= par else bands.repartition(par)
    b = b_src.select(
        F.col("doc_id").alias("db"), F.col("simhash").alias("hb"), "band", "bval"
    )
    # Hamming-verify BEFORE the distinct: the band join emits O(sum bucket^2)
    # candidate rows, but the xor/bit_count filter is a cheap map-side int op
    # — applying it first means the dedup exchange carries only the few
    # surviving pairs instead of millions of (pair, fp, fp) rows
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )


# --------------------------------------------------------------------------
# 5. Embedding-cosine near-dup
# --------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    # normalize once per vector, then cosine = one dot per pair (3× fewer
    # folds than dot/(norm·norm) per pair). Same sequential double ops on
    # both engines → still bit-exact.
    f"""WITH nrm AS (
    SELECT vec_id, embedding, {V.norm_sql('embedding')} AS n FROM embeddings
),
nv AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE) / n) AS v
    FROM nrm
)
SELECT a.vec_id AS va, b.vec_id AS vb, {V.dot_sql('a.v', 'b.v')} AS cos
FROM nv a JOIN nv b ON a.vec_id < b.vec_id
WHERE {V.dot_sql('a.v', 'b.v')} >= {COSINE_DUP_THRESHOLD}""",
    doc=f"[CORRECTNESS BASELINE — all-pairs O(n²); use dedup_embedding_lsh "
    f"at scale] Embedding near-dup: cosine ≥ {COSINE_DUP_THRESHOLD} pairs over "
    "pre-normalized vectors (normalize O(n), one dot per pair — the right "
    "all-pairs kernel); scale path = IVF/LSH bucketing in "
    "operators.similarity.",
)
def q_embedding_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("dv")
    )
    # stage the norm as a concrete column so the lambda reads an attribute
    # (computed once per row), not a re-evaluated subexpression per element
    nv = emb.withColumn("nrm", V.norm(F.col("dv"))).select(
        "vec_id",
        F.transform("dv", lambda x: x / F.col("nrm")).alias("v"),
    )
    a = nv.select(F.col("vec_id").alias("va"), F.col("v").alias("veca"))
    b = nv.select(F.col("vec_id").alias("vb"), F.col("v").alias("vecb"))
    return (
        a.join(b, F.col("va") < F.col("vb"))
        .select("va", "vb", V.dot(F.col("veca"), F.col("vecb")).alias("cos"))
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH for embedding near-dup — the scale path for
# dedup_embedding_cosine's all-pairs baseline
#
# Recall math (sign-bit agreement p(s) = 1 - arccos(s)/pi for cosine s;
# band of r bits matches with p^r; any of L bands: 1-(1-p^r)^L):
#   tau=0.45 (this registry's threshold): p=.649 -> r=4,L=16 gives .956
#   tau=0.80 (realistic corpus dedup):    p=.795 -> r=8,L=12 gives .985
# r/L are tuned to the registry threshold; the low tau forces short bands
# (16 buckets/band), so pruning here is modest — at production thresholds
# the same operator prunes ~2^r-way per band. Candidate verification is
# exact cosine, so precision is always 1.0 and only recall is probabilistic.
# ---------------------------------------------------------------------------

LSH_BANDS = 16
LSH_BITS_PER_BAND = 4
_EMB_DIM = 64


def _hyperplanes(
    bands: int = LSH_BANDS,
    bits: int = LSH_BITS_PER_BAND,
    dim: int = _EMB_DIM,
) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded), bands*bits of them —
    part of the operator definition, not data-dependent. The defaults are
    the registry layout (16x4, tuned to tau=0.45 at the driver's
    scales); production deployments raise ``bits`` (8-12 with a higher
    tau) to prune candidates 2^bits-way through the same kernels."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((bands * bits, dim)).tolist()


def _make_lsh_udfs(
    bands: int = LSH_BANDS,
    bits: int = LSH_BITS_PER_BAND,
    dim: int = _EMB_DIM,
):
    """Arrow-vectorized kernels for the LSH hot path. The pure-Catalyst
    formulation (64 aggregate-fold dots per row for signatures, one fold per
    candidate pair for verification) evaluates higher-order-function lambdas
    interpreted, ~10x slower at the candidate volumes this threshold
    produces; one numpy matmul per Arrow batch replaces ~100M lambda steps.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(_hyperplanes(bands, bits, dim))  # captured in closures

    @pandas_udf("array<integer>")
    def band_codes(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # batch x dim
        signs = (mat @ planes.T) >= 0  # batch x bands*bits sign bits
        codes = np.zeros((len(mat), bands), dtype=np.int32)
        for b in range(bands):
            for j in range(bits):
                codes[:, b] |= signs[:, b * bits + j].astype(
                    np.int32
                ) << j
        return pd.Series(list(codes))

    @pandas_udf("double")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return band_codes, pair_dot


_BC_VERIFY_MAX = 50_000  # rows; ≈25 MB of float64 at dim 64 — broadcast-safe


def _lsh_rep_pairs(
    spark: SparkSession, nv: DataFrame, band_codes, pair_dot, n_hint: int
) -> DataFrame:
    """Hyperplane-LSH candidate pairs + exact-cosine verify over normalized
    vectors ``nv`` (vec_id, v). The band join always shuffles ids only.

    Verification is cost-adaptive, mirroring Spark's own broadcast-join
    threshold logic: when the distinct-vector count fits comfortably on
    every executor (≤ _BC_VERIFY_MAX), the normalized matrix is broadcast
    and each candidate partition computes its dots with one numpy gather +
    einsum — the Arrow exchange then carries 16-byte id pairs instead of
    two 512-byte vectors per pair (~60× less). Beyond the bound, vectors
    are re-joined by id (the shuffle-scalable path).
    """
    import numpy as np

    # single-file local inputs arrive as 1 partition — spread the Arrow UDF
    # signature work across the cluster before the per-row kernels run.
    # r15 perf: the spread is sized from the VECTOR COUNT, not blindly to
    # defaultParallelism — at ~256 rows per task the numpy batch is still
    # large enough to amortize a Python worker spin, and a 2k-vector input
    # stops paying 32 Arrow worker startups per stage (sf0.1 A/B: 1.9s ->
    # 1.6s, 3/3 rounds, identical pairs). At production counts the target
    # saturates at defaultParallelism — behavior there is unchanged.
    par = spark.sparkContext.defaultParallelism
    target = max(1, min(par, (max(n_hint, 1) + 255) // 256))
    if nv.rdd.getNumPartitions() < target:
        nv = nv.repartition(target)
    sig = nv.select("vec_id", F.posexplode(band_codes("v")).alias("band", "code"))
    a = sig.select("band", "code", F.col("vec_id").alias("va"))
    b_ = sig.select("band", "code", F.col("vec_id").alias("vb"))
    cand = (
        a.join(b_, ["band", "code"])
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .dropDuplicates(["va", "vb"])
    )
    if n_hint <= _BC_VERIFY_MAX:
        rows = nv.collect()  # bounded by _BC_VERIFY_MAX — broadcast metadata
        mat = np.array([r["v"] for r in rows], dtype=np.float64)
        index = {r["vec_id"]: i for i, r in enumerate(rows)}
        bc = spark.sparkContext.broadcast((index, mat))

        def _verify(batches):
            idx, m = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                ia = pdf["va"].map(idx).to_numpy()
                ib = pdf["vb"].map(idx).to_numpy()
                cos = np.einsum("ij,ij->i", m[ia], m[ib])
                out = pdf.assign(cos=cos)
                out = out[out["cos"] >= COSINE_DUP_THRESHOLD]
                if len(out):
                    yield out

        return cand.mapInPandas(_verify, "va long, vb long, cos double")
    va_vec = nv.select(F.col("vec_id").alias("va"), F.col("v").alias("veca"))
    vb_vec = nv.select(F.col("vec_id").alias("vb"), F.col("v").alias("vecb"))
    return (
        cand.join(va_vec, "va")
        .join(vb_vec, "vb")
        .select("va", "vb", pair_dot(F.col("veca"), F.col("vecb")).alias("cos"))
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
    )


# Pair-SET oracle (no float column): candidates are verified by exact
# cosine so precision is 1.0, and with the seeded hyperplanes the pair
# set equals the threshold pairs of dedup_embedding_cosine at the
# driver's scales (empirical recall 1.0; analytic miss probability
# ~8e-5/pair at the duplicate cosines present, and the nearest pair
# cosine sits 1.6e-3 from τ — far beyond einsum-vs-fold float noise).
# The cos value itself is NOT emitted: the Arrow verify kernel sums in
# einsum order, which differs from the oracle's sequential fold in the
# last ulp. Shared with streaming_semantic_index (streaming/ann.py) so
# the online index's maintained pair set is checked against the SAME
# whole-corpus recompute.
EMB_LSH_SQL = f"""WITH nrm AS (
    SELECT vec_id, embedding, {V.norm_sql('embedding')} AS n FROM embeddings
),
nv AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE) / n) AS v
    FROM nrm
)
SELECT a.vec_id AS va, b.vec_id AS vb
FROM nv a JOIN nv b ON a.vec_id < b.vec_id
WHERE {V.dot_sql('a.v', 'b.v')} >= {COSINE_DUP_THRESHOLD}"""


@register(
    "dedup_embedding_lsh",
    EMB_LSH_SQL,
    doc=f"Embedding near-dup via random-hyperplane LSH: {LSH_BANDS} bands x "
    f"{LSH_BITS_PER_BAND} sign bits (seeded hyperplanes), candidates = pairs "
    "sharing any band code (equi-join on (band, code)), then exact-cosine "
    "verification, so precision is 1.0 and only recall is probabilistic "
    f"(analytic recall at tau={COSINE_DUP_THRESHOLD}: 0.956/pair). Replaces "
    "the all-pairs O(n^2) kernel with O(sum bucket^2): the 100 TB dedup "
    "path. The exploded signature relation carries only (vec_id, band, "
    "code) — vectors are re-joined by id AFTER candidate-pair dedup, so the "
    "band shuffle moves ids, not 64-dim arrays. Signature and verify "
    "kernels are Arrow-vectorized pandas UDFs (one numpy matmul per batch) "
    "— the pure-Catalyst fold formulation evaluates higher-order lambdas "
    "interpreted and was ~4x slower at this threshold's candidate volume.",
)
def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    band_codes, pair_dot = _make_lsh_udfs()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("dv")
    )
    # Adaptive plan choice: the exact-vector collapse (+ the member-pair
    # expansion it forces) only pays off when the corpus actually repeats
    # vectors — on an ~all-distinct corpus it is a full window shuffle plus
    # two expansion joins for nothing. Identical vectors band identically
    # and verify at cos 1.0, so the direct plan emits the SAME pairs; which
    # plan runs is purely a cost decision. One cheap aggregate probes the
    # distinct ratio (single bounded row to the driver; rsd tightened so a
    # sketch low-estimate can't misread all-distinct as replicated).
    stats = emb.agg(
        F.approx_count_distinct(F.xxhash64("dv"), rsd=0.01).alias("nd"),
        F.count("*").alias("n"),
    ).first()
    collapse = stats["n"] > 0 and stats["nd"] < 0.95 * stats["n"]
    if not collapse:
        nv = emb.withColumn("nrm", V.norm(F.col("dv"))).select(
            "vec_id",
            F.transform("dv", lambda x: x / F.col("nrm")).alias("v"),
        )
        return _lsh_rep_pairs(spark, nv, band_codes, pair_dot, stats["n"]).select(
            "va", "vb"
        )
    # Stage 1 — exact-vector collapse (mirrors dedup_minhash_lsh's exact-dup
    # collapse): identical vectors band identically and verify identically,
    # so LSH only needs one representative per distinct vector. A replicated
    # corpus pays banding/verify on distinct content; 8-byte hashes shuffle,
    # never 64-dim arrays.
    wg = Window.partitionBy("vh")
    members = (
        emb.withColumn("vh", F.xxhash64("dv"))
        .select(
            "vec_id",
            "dv",
            "vh",
            F.min("vec_id").over(wg).alias("rep"),
            F.count("*").over(wg).alias("n_members"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rep_vecs = members.filter(F.col("vec_id") == F.col("rep")).select("vec_id", "dv")
    # narrow recompute over the cached members relation — deliberately NOT
    # persisted: a cache boundary here hides size statistics from the
    # planner and the verify joins degrade to sort-merge (measured 4-8x)
    nv = rep_vecs.withColumn("nrm", V.norm(F.col("dv"))).select(
        "vec_id",
        F.transform("dv", lambda x: x / F.col("nrm")).alias("v"),
    )
    # Stage 2 — hyperplane LSH over representatives. (vec_id, band, code)
    # only: ids shuffle through the band join, the 64-dim vectors do not;
    # verification is the shared cost-adaptive kernel.
    rep_pairs = _lsh_rep_pairs(spark, nv, band_codes, pair_dot, stats["nd"])
    # Stage 3 — expand to member pairs (output-proportional). Identical
    # vectors share the representatives' cosine exactly.
    ma = members.select(F.col("rep").alias("va"), F.col("vec_id").alias("xa"))
    mb = members.select(F.col("rep").alias("vb"), F.col("vec_id").alias("xb"))
    cross = (
        rep_pairs.join(ma, "va")
        .join(mb, "vb")
        .select(
            F.least("xa", "xb").alias("va"),
            F.greatest("xa", "xb").alias("vb"),
            "cos",
        )
    )
    # within-group: duplicate vectors pair at their self-cosine (≈1.0;
    # computed, not assumed, so degenerate zero vectors stay out)
    self_cos = nv.select(
        F.col("vec_id").alias("rep"), pair_dot(F.col("v"), F.col("v")).alias("cos")
    ).filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
    wm = members.filter(F.col("n_members") >= 2)
    within = (
        wm.select("vh", "rep", F.col("vec_id").alias("va"))
        .join(wm.select("vh", F.col("vec_id").alias("vb")), "vh")
        .filter(F.col("va") < F.col("vb"))
        .join(self_cos, "rep")
        .select("va", "vb", "cos")
    )
    # Emit the pair set only — the cos column is verify-internal (einsum
    # summation order ≠ the oracle's sequential fold in the last ulp).
    return cross.unionByName(within).select("va", "vb")


# --------------------------------------------------------------------------
# Incremental ingestion dedup (round 6) — new batch vs stored index
# --------------------------------------------------------------------------


@register(
    "dedup_incremental_batch",
    """WITH h AS (SELECT doc_id, md5(text) AS th FROM documents),
history AS (SELECT th, MIN(doc_id) AS hist_keep FROM h
            WHERE doc_id % 5 <> 0 GROUP BY th),
batch AS (SELECT doc_id, th FROM h WHERE doc_id % 5 = 0),
batch_first AS (SELECT th, MIN(doc_id) AS batch_keep FROM batch GROUP BY th)
SELECT b.doc_id,
       CASE WHEN hi.th IS NOT NULL THEN 'dup_of_history'
            WHEN b.doc_id > bf.batch_keep THEN 'dup_in_batch'
            ELSE 'unique' END AS verdict,
       CAST(CASE WHEN hi.th IS NOT NULL THEN hi.hist_keep
                 ELSE bf.batch_keep END AS BIGINT) AS keep_doc_id
FROM batch b
LEFT JOIN history hi ON hi.th = b.th
JOIN batch_first bf ON bf.th = b.th""",
    doc="Incremental ingestion dedup — the production mode: a NEW batch "
    "(doc_id % 5 = 0 simulates the arriving shard) checks against the "
    "STORED content index built from history (everything else), never "
    "rescanning historical text. Each batch doc gets a verdict: "
    "dup_of_history (content already ingested — keep_doc_id points at the "
    "earliest historical holder), dup_in_batch (first seen inside this "
    "batch — points at the batch's canonical copy), or unique. At 100 TB "
    "the stored index IS the (hash, keep_doc) relation — ingestion joins "
    "touch 32-byte keys only, cost scales with the BATCH, not the corpus, "
    "and the same composition extends to the minhash/winnowed fingerprint "
    "indexes for near-dup-vs-history.",
)
def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", F.md5("text").alias("th"))
    history = (
        h.filter(F.col("doc_id") % 5 != 0)
        .groupBy("th")
        .agg(F.min("doc_id").alias("hist_keep"))
    )
    batch = h.filter(F.col("doc_id") % 5 == 0)
    batch_first = batch.groupBy("th").agg(F.min("doc_id").alias("batch_keep"))
    return (
        batch.join(history, "th", "left")
        .join(batch_first, "th")
        .select(
            "doc_id",
            F.when(F.col("hist_keep").isNotNull(), F.lit("dup_of_history"))
            .when(F.col("doc_id") > F.col("batch_keep"), F.lit("dup_in_batch"))
            .otherwise(F.lit("unique"))
            .alias("verdict"),
            F.coalesce("hist_keep", "batch_keep").cast("long").alias("keep_doc_id"),
        )
    )


@register(
    "dedup_minhash_incremental",
    # Oracle: exact cross-split Jaccard (batch vs history). Valid for the
    # banded plan because the banding is lossless here — same empirical
    # basis as dedup_minhash_lsh's own exact-Jaccard oracle (hash-green),
    # plus the one-sided ±1 size-bucket probe proven in the pytest pin.
    f"""WITH {_shingles_cte()},
hist AS (SELECT doc_id, s FROM shingles WHERE doc_id % 5 <> 0),
bat AS (SELECT doc_id, s FROM shingles WHERE doc_id % 5 = 0),
hc AS (SELECT doc_id, COUNT(*) AS n_sh FROM hist GROUP BY doc_id),
bcnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM bat GROUP BY doc_id),
inter AS (
    SELECT b.doc_id AS batch_doc, h.doc_id AS hist_doc, COUNT(*) AS n_inter
    FROM bat b JOIN hist h ON h.s = b.s
    GROUP BY 1, 2
)
SELECT i.batch_doc, i.hist_doc,
       CAST(i.n_inter AS DOUBLE) / (cb.n_sh + ch.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN bcnt cb ON cb.doc_id = i.batch_doc
JOIN hc ch ON ch.doc_id = i.hist_doc
WHERE CAST(i.n_inter AS DOUBLE) / (cb.n_sh + ch.n_sh - i.n_inter)
      >= {JACCARD_THRESHOLD}""",
    doc=f"Incremental NEAR-dup: the arriving batch (doc_id % 5 = 0) probes "
    "the STORED MinHash band index built from history — the production "
    "ingestion mode where near-dup cost scales with the batch, and "
    "history is touched only through its compact (band, bucket) "
    "signature relation, never its text. One-sided probing explodes the "
    "batch side into size buckets {g-1, g, g+1} (the two-sided plan's "
    "±1-bucket guarantee folded onto the probe, still lossless at "
    f"τ={JACCARD_THRESHOLD}); candidates verify by exact Jaccard. "
    "Complements dedup_incremental_batch's exact-hash level with the "
    "fuzzy level of the same stored-index pattern.",
)
def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(sh)
    bands = banded_signatures(sigs)
    probe = bands.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("batch_doc"),
        "band",
        "bval",
        F.explode(
            F.array(F.col("g") - 1, F.col("g"), F.col("g") + 1)
        ).alias("gk"),
    )
    index = bands.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("hist_doc"), "band", "bval", F.col("g").alias("gk")
    )
    cand = (
        probe.join(index, ["band", "bval", "gk"])
        .select(F.col("batch_doc").alias("da"), F.col("hist_doc").alias("db"))
        .distinct()
    )
    return (
        _pair_jaccard(sh, cand)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(
            F.col("da").alias("batch_doc"),
            F.col("db").alias("hist_doc"),
            "jaccard",
        )
    )


# --------------------------------------------------------------------------
# 10. Normalization-insensitive exact dedup
# --------------------------------------------------------------------------

# Canonical text form: lowercase, map whitespace (tab/newline/CR) to
# space FIRST (so "a\nb" canonicalizes to "a b", not "ab"), strip
# everything but [a-z0-9 ], collapse space runs, trim. All three regexes
# use constructs with identical semantics in Java regex (Spark) and RE2
# (DuckDB) — plain character classes and '+', no lookaround/backrefs.
_NORM_WS = "[\\t\\n\\r]"
_NORM_STRIP = "[^a-z0-9 ]"
_NORM_SPACES = " +"


def normalize_text(col):
    """Case/punctuation/whitespace-insensitive canonical form of a text
    column — the first dedup level most web-corpus pipelines run, catching
    trivially-reformatted copies that byte-exact md5 (dedup_exact) misses."""
    spaced = F.regexp_replace(F.lower(col), _NORM_WS, " ")
    stripped = F.regexp_replace(spaced, _NORM_STRIP, "")
    return F.trim(F.regexp_replace(stripped, _NORM_SPACES, " "))


def _normalize_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(regexp_replace(lower({col}), "
        f"'{_NORM_WS}', ' ', 'g'), "
        f"'{_NORM_STRIP}', '', 'g'), '{_NORM_SPACES}', ' ', 'g'))"
    )


@register(
    "dedup_normalized_exact",
    f"""SELECT md5({_normalize_sql('text')}) AS norm_hash,
               CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants
        FROM documents GROUP BY md5({_normalize_sql('text')})""",
    doc="Exact dedup after text canonicalization (lowercase, punctuation "
    "strip, whitespace collapse): groups byte-different but semantically "
    "identical copies that dedup_exact's raw md5 keeps apart — "
    "n_raw_variants > 1 marks groups only this level catches. Same "
    "100 TB shape as dedup_exact: the normalization runs scan-side inside "
    "codegen and only the 32-byte md5 of the canonical form shuffles, "
    "never document bodies.",
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5(normalize_text(F.col("text"))).alias("norm_hash"),
            "doc_id",
            F.md5("text").alias("raw_hash"),
        )
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
            F.count_distinct(F.col("raw_hash")).alias("n_raw_variants"),
        )
    )


# --------------------------------------------------------------------------
# Source-overlap forensics over the near-dup pair relation
# --------------------------------------------------------------------------


@register(
    "dedup_source_overlap",
    f"""WITH pairs AS ({_CONTAINMENT_ORACLE}),
labeled AS (
    SELECT LEAST(sa.source, sb.source) AS source_lo,
           GREATEST(sa.source, sb.source) AS source_hi
    FROM pairs p
    JOIN documents sa ON sa.doc_id = p.da
    JOIN documents sb ON sb.doc_id = p.db
)
SELECT source_lo, source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM labeled GROUP BY source_lo, source_hi""",
    doc="Corpus forensics: which sources contain each other's content. "
    "Aggregates the verified containment pair relation (the banded, "
    "lossless scale path — provably identical to the exact equi-join, so "
    "the exact-intersection SQL composes as this oracle's CTE) up to the "
    "unordered (source, source) level — the matrix a curation team reads "
    "to find mirror sites, cross-source boilerplate, and wholesale "
    "re-hosting before deciding per-source policy. Cost beyond the pair "
    "relation itself: two broadcast-able doc_id->source lookups and one "
    "tiny hash aggregate (sources x sources is bounded).",
)
def q_dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = q_dedup_containment_banded(spark, sf_dir)
    sa = docs.select(F.col("doc_id").alias("da"), F.col("source").alias("src_a"))
    sb = docs.select(F.col("doc_id").alias("db"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "da")
        .join(sb, "db")
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count("*").alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# 9. SemDeDup — semantic dedup via k-means cluster-local cosine pruning
#    (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
#    semantic deduplication", 2023 — public arXiv method)
# --------------------------------------------------------------------------

SEMANTIC_PRUNE_TAU = 0.45  # same operating point as the exact-cosine baseline


@register(
    "dedup_semantic_prune",
    # Contract oracle (r8 conversion; VERDICT r7 #3). The kmeans assignment
    # rests on float dim-means (addition-order dependent), so the prune
    # verdicts themselves can vary run-to-run — the CHECKED output is
    # therefore the assignment-INDEPENDENT audit: per vec_id, the exact
    # duplicate-group rep and the exact count of >= tau cosine neighbors
    # (both SQL-recomputable, hash-checked at full strength) plus two
    # booleans the oracle asserts as literal TRUE — verdict_ok (every
    # prune is justified by a smaller-id partner at exact cosine >= tau;
    # every keep carries no partner) and isolated_kept_ok (a vector with
    # ZERO >= tau neighbors is never pruned, for ANY clustering). The
    # booleans hold for every valid SemDeDup run, so the output is
    # deterministic even though the underlying clustering is not. The raw
    # verdict relation stays available as q_dedup_semantic_prune, pinned
    # by tests/test_extensions.py::test_semantic_prune_invariants.
    f"""WITH nrm AS (
    SELECT vec_id, embedding, {V.norm_sql('embedding')} AS n FROM embeddings
),
nv AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE) / n) AS v
    FROM nrm
),
nbrs AS (
    SELECT a.vec_id,
           COUNT(*) FILTER (WHERE b.vec_id IS NOT NULL) AS n_exact_nbrs
    FROM nv a LEFT JOIN nv b
      ON a.vec_id <> b.vec_id AND {V.dot_sql('a.v', 'b.v')} >= {SEMANTIC_PRUNE_TAU}
    GROUP BY a.vec_id
),
grp AS (
    SELECT vec_id, MIN(vec_id) OVER (PARTITION BY embedding) AS exact_rep
    FROM embeddings
)
SELECT g.vec_id,
       CAST(g.exact_rep AS BIGINT) AS exact_rep,
       (g.vec_id <> g.exact_rep) AS is_exact_dup,
       CAST(n.n_exact_nbrs AS BIGINT) AS n_exact_nbrs,
       TRUE AS verdict_ok,
       TRUE AS isolated_kept_ok
FROM grp g JOIN nbrs n ON n.vec_id = g.vec_id""",
    doc="SemDeDup: collapse exact-duplicate vectors to min-id reps, "
    "k-means-cluster the reps (operators.clustering Lloyd kernel, "
    "k~sqrt(n_distinct)), then prune WITHIN each cluster only — a rep is "
    "pruned iff some smaller-id rep in the same cluster has exact cosine "
    ">= tau with it (keep_partner = that smallest neighbor); non-rep "
    "duplicates expand as pruned against their rep (cos 1.0, same "
    "cluster). The cluster key bounds the pair join: candidate generation "
    "is sum(|cluster|^2) over DISTINCT vectors, never n^2 (the paper runs "
    "k=11k for 100M points). Exact-cosine verify per candidate keeps "
    "precision at 1.0 — clustering only costs recall for cross-cluster "
    "near-dups, the documented SemDeDup trade. Measured flat at 10x "
    "replica data (SCALING.md). CHECKED OUTPUT: the assignment-"
    "independent audit (exact dup groups + exact >= tau neighbor counts, "
    "hash-checked) with verdict_ok / isolated_kept_ok booleans the "
    "oracle asserts TRUE — see the oracle comment.",
)
def q_dedup_semantic_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    verdicts = q_dedup_semantic_prune(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("dv")
    )
    nv = emb.withColumn("nrm", V.norm(F.col("dv"))).select(
        "vec_id", F.transform("dv", lambda x: x / F.col("nrm")).alias("v")
    )
    # exact >= tau neighbor counts — the same normalize-once/one-dot
    # kernel as dedup_embedding_cosine, so the doubles (and therefore the
    # threshold comparisons) are bit-identical to the oracle's
    a = nv.select(F.col("vec_id").alias("va"), F.col("v").alias("veca"))
    b = nv.select(F.col("vec_id").alias("vb"), F.col("v").alias("vecb"))
    nbrs = (
        a.join(
            b,
            (F.col("va") != F.col("vb"))
            & (V.dot(F.col("veca"), F.col("vecb")) >= SEMANTIC_PRUNE_TAU),
            "left",
        )
        .groupBy(F.col("va").alias("vec_id"))
        .agg(F.count("vb").alias("n_exact_nbrs"))
    )
    # exact duplicate groups (clustering-independent). The key is a hash
    # of the rendered array so only 32 bytes shuffle — but the oracle
    # groups by VALUE equality (PARTITION BY embedding), under which IEEE
    # -0.0 == +0.0 while their to_json renderings differ; normalize signed
    # zeros (x + 0.0 maps -0.0 -> +0.0, identity elsewhere) so byte
    # equality coincides with value equality
    grp = emb.withColumn(
        "ck",
        F.md5(F.to_json(F.transform(F.col("dv"), lambda x: x + F.lit(0.0)))),
    ).select("vec_id", "ck")
    grp = grp.join(
        grp.groupBy("ck").agg(F.min("vec_id").alias("exact_rep")), "ck"
    ).select("vec_id", "exact_rep")
    # recompute the prune-justification from raw embeddings: partner
    # present iff pruned, partner id smaller, exact cosine >= tau
    partner = nv.select(
        F.col("vec_id").alias("keep_partner"), F.col("v").alias("pv")
    )
    audited = (
        verdicts.join(nv, "vec_id")
        .join(partner, "keep_partner", "left")
        .select(
            "vec_id",
            "pruned",
            (
                F.when(
                    F.col("pruned"),
                    F.col("keep_partner").isNotNull()
                    & (F.col("keep_partner") < F.col("vec_id"))
                    & (V.dot(F.col("v"), F.col("pv")) >= SEMANTIC_PRUNE_TAU),
                ).otherwise(F.col("keep_partner").isNull())
            ).alias("verdict_ok"),
        )
    )
    return (
        grp.join(nbrs, "vec_id")
        .join(audited, "vec_id")
        .select(
            "vec_id",
            F.col("exact_rep").cast("long").alias("exact_rep"),
            (F.col("vec_id") != F.col("exact_rep")).alias("is_exact_dup"),
            F.col("n_exact_nbrs").cast("long").alias("n_exact_nbrs"),
            "verdict_ok",
            # zero >= tau neighbors -> no valid partner can exist -> kept
            (
                F.when(F.col("n_exact_nbrs") == 0, ~F.col("pruned")).otherwise(
                    F.lit(True)
                )
            ).alias("isolated_kept_ok"),
        )
    )


def q_dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from .clustering import kmeans

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("dv")
    )
    # 1. exact-duplicate collapse FIRST (the same composition that makes
    #    dedup_minhash_lsh and dedup_containment replication-proof):
    #    identical vectors cluster identically and have cosine 1.0, so the
    #    rep-level verdict expands losslessly — cluster/prune cost scales
    #    with DISTINCT vectors, not corpus size (measured: without this,
    #    the 10x replica ran 8.5x slower; with it, flat).
    keyed = emb.withColumn("ck", F.md5(F.to_json(F.col("dv"))))
    members = keyed.select("vec_id", "ck").join(
        keyed.groupBy("ck").agg(F.min("vec_id").alias("rep")), "ck"
    )
    reps = (
        members.filter(F.col("vec_id") == F.col("rep"))
        .select("vec_id")
        .join(emb, "vec_id")
    )

    # 2. adaptive k ~ sqrt(n_distinct) (SemDeDup scales k with corpus size;
    #    fixed k would let cluster sizes — and the quadratic in-cluster
    #    pair count — grow linearly with n)
    n_reps = reps.count()
    k = max(8, min(64, math.isqrt(n_reps)))
    pts = reps.select("vec_id", F.col("dv").alias("v"))
    assignment, _, _ = kmeans(pts, k=k)  # (vec_id, cluster, sq_dist)

    # 3. normalize once; cosine = one dot per in-cluster candidate pair
    nv = (
        reps.withColumn("nrm", V.norm(F.col("dv")))
        .select("vec_id", F.transform("dv", lambda x: x / F.col("nrm")).alias("v"))
        .join(assignment.select("vec_id", "cluster"), "vec_id")
    )
    a = nv.select(
        F.col("vec_id").alias("va"), F.col("v").alias("veca"), "cluster"
    )
    b = nv.select(
        F.col("vec_id").alias("vb"), F.col("v").alias("vecb"), "cluster"
    )
    dup_pairs = (
        a.join(b, "cluster")
        .filter(F.col("va") < F.col("vb"))
        .select(
            "cluster", "va", "vb", V.dot(F.col("veca"), F.col("vecb")).alias("cos")
        )
        .filter(F.col("cos") >= SEMANTIC_PRUNE_TAU)
    )
    # prune the larger rep of every dup pair; partner = smallest such va
    rep_pruned = dup_pairs.groupBy(F.col("vb").alias("vec_id")).agg(
        F.min("va").alias("keep_partner")
    )
    rep_verdicts = (
        nv.select("vec_id", "cluster")
        .join(rep_pruned, "vec_id", "left")
        .select(
            F.col("vec_id").alias("rep"),
            F.col("cluster").cast("int").alias("cluster"),
            F.col("keep_partner").alias("rep_partner"),
        )
    )

    # 4. expand to members: a non-rep duplicate is pruned against its rep
    #    (cosine exactly 1.0, same cluster, rep = group-min id < member);
    #    a rep carries its rep-level verdict.
    return (
        members.join(rep_verdicts, "rep")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("vec_id") != F.col("rep"), F.lit(True))
            .otherwise(F.col("rep_partner").isNotNull())
            .alias("pruned"),
            F.when(F.col("vec_id") != F.col("rep"), F.col("rep"))
            .otherwise(F.col("rep_partner"))
            .alias("keep_partner"),
        )
    )
