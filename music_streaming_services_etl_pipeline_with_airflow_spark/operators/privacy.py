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
