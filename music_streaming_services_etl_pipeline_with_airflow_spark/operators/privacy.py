"""Privacy-risk auditing over ``documents`` — the release-gate companions
to the PII redaction pass (operators/text.py): k-anonymity and l-diversity
over quasi-identifier classes.

Semantics (Sweeney k-anonymity / Machanavajjhala l-diversity): treat
(lang, 100-char length bucket) as the quasi-identifier an attacker can
link on, and ``source`` as the sensitive attribute. A doc is k-anonymous
when its QI equivalence class holds >= K rows, and its class is l-diverse
when the class spans >= L distinct sensitive values — the two checks a
training-data release runs before publishing per-document metadata.

Scale shape: ONE hash aggregate over the QI (class table is tiny — QI
cardinality, not corpus size) broadcast-joined back to the scan; no
window over the corpus, no corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hex8_to_long_sql
from ..plans.registry import register
from ..sources import load_table

K_ANON = 5
L_DIV = 3


@register(
    "privacy_k_anonymity",
    f"""WITH q AS (
        SELECT doc_id, lang, source, n_chars // 100 AS chars_bucket
        FROM documents
    ), c AS (
        SELECT lang, chars_bucket,
               CAST(COUNT(*) AS BIGINT) AS class_size,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS l_diversity
        FROM q GROUP BY lang, chars_bucket
    )
    SELECT q.doc_id, q.lang, q.chars_bucket, c.class_size, c.l_diversity,
           c.class_size >= {K_ANON} AS k_anon_ok,
           c.l_diversity >= {L_DIV} AS l_div_ok
    FROM q JOIN c USING (lang, chars_bucket)""",
    doc=f"k-anonymity (K={K_ANON}) + l-diversity (L={L_DIV}) audit: QI = "
    "(lang, 100-char length bucket), sensitive = source. Per doc: its QI "
    "class size, the class's distinct sensitive values, and both release "
    "verdicts. One tiny-class-table hash aggregate broadcast back to the "
    "scan — no corpus shuffle.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.expr("n_chars div 100").alias("chars_bucket")
    )
    classes = docs.groupBy("lang", "chars_bucket").agg(
        F.count("*").alias("class_size"),
        F.countDistinct("source").alias("l_diversity"),
    )
    return docs.join(F.broadcast(classes), ["lang", "chars_bucket"]).select(
        "doc_id",
        "lang",
        "chars_bucket",
        "class_size",
        "l_diversity",
        (F.col("class_size") >= K_ANON).alias("k_anon_ok"),
        (F.col("l_diversity") >= L_DIV).alias("l_div_ok"),
    )


# -- differentially-private release counts -----------------------------------
#
# The third release gate: publish per-language document counts with
# Laplace(1/eps) noise (the classic eps-DP counting query; sensitivity 1).
# The noise draw uses a DETERMINISTIC md5-derived uniform — the repo-wide
# reproducibility convention (same trade as seeded RNG in any replayable
# pipeline; swap the hash for a CSPRNG draw in a real release, the rest of
# the mechanism is unchanged). Determinism is what makes the oracle EXACT:
# DuckDB replays the identical draw, and the milli-floor absorbs the
# cross-engine ln() ulp (the tf-idf play).

DP_EPSILON_MILLI = 1000  # eps = 1.0, noise scale b = 1/eps = 1

# u in (0,1): (m + 0.5) / 1e6 with m a 6-digit md5-derived integer — never
# exactly 0, 1, or 0.5 (2m+1 is odd, 1e6 even), so ln(1-2|u-0.5|) is finite
_DP_U_SQL = (
    "((CAST(" + hex8_to_long_sql("md5('dp1:' || lang)")
    + " % 1000000 AS DOUBLE) + 0.5) / 1000000.0)"
)


@register(
    "privacy_dp_lang_counts",
    f"""WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), u AS (
        SELECT lang, n, {_DP_U_SQL} AS u FROM c
    )
    SELECT lang,
           CAST({DP_EPSILON_MILLI} AS BIGINT) AS epsilon_milli,
           CAST(FLOOR(
               (n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                    * ln(1.0 - 2.0 * abs(u - 0.5))) * 1000
           ) AS BIGINT) AS noisy_count_milli
    FROM u""",
    doc="eps-differentially-private per-language counts (eps=1, Laplace "
    "via inverse CDF of a deterministic md5-derived uniform — the "
    "reproducible-pipeline surrogate for the secret draw; mechanism "
    "otherwise standard, sensitivity 1). One hash aggregate over the "
    "scan; EXACT oracle — DuckDB replays the identical draw, milli-floor "
    "absorbs ln() ulp.",
)
def q_dp_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import hashing as H

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    u = (
        (
            H.hex8_to_long(F.md5(F.concat(F.lit("dp1:"), F.col("lang"))))
            % 1_000_000
        ).cast("double")
        + 0.5
    ) / 1_000_000.0
    sgn = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    laplace = sgn * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    return c.select(
        "lang",
        F.lit(DP_EPSILON_MILLI).cast("long").alias("epsilon_milli"),
        F.floor((F.col("n") + laplace) * 1000).cast("long").alias(
            "noisy_count_milli"
        ),
    )
