"""Deterministic sampling / splitting operators — the training-data-prep
family.

Everything here uses **content-hash bucketing** (md5 → integer → modulo),
not RNG: the same row lands in the same bucket on every run, every engine,
every cluster size — reproducible experiment splits, no seed plumbing, and
fully oracle-checkable (seeded-RNG sampling like ``df.sample`` is
engine-specific by construction; a rows-only ``sample_bernoulli_rng`` entry
covers that API surface).

Scale: hash-bucket predicates push down as cheap scans (no shuffle at all
for the filter forms); the class-balanced cap is one window shuffle on the
class key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..plans.registry import register
from ..sources import load_table


def hash_bucket(col, n_buckets: int = 100):
    """Stable bucket 0..n-1 from the md5 of a key column."""
    return F.pmod(H.hex8_to_long(F.md5(col.cast("string"))), F.lit(n_buckets))


def _bucket_sql(col: str, n: int = 100) -> str:
    return f"({H.hex8_to_long_sql(f'md5(CAST({col} AS VARCHAR))')} % {n})"


@register(
    "sample_hash_bucket",
    f"""SELECT doc_id, lang FROM documents
        WHERE {_bucket_sql('doc_id')} < 10""",
    doc="Deterministic ~10% sample: md5-hash bucket of the key < 10/100. "
    "Reproducible across runs/engines/cluster sizes (vs RNG sampling); the "
    "predicate is a pure scan filter — no shuffle.",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(hash_bucket(F.col("doc_id")) < 10).select("doc_id", "lang")


@register(
    "sample_train_val_test_split",
    f"""SELECT CASE WHEN {_bucket_sql('doc_id')} < 80 THEN 'train'
                    WHEN {_bucket_sql('doc_id')} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1""",
    doc="Stable 80/10/10 train/val/test split by hash bucket — the "
    "reproducible-experiment split; counts per split prove assignment.",
)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return docs.groupBy(split).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "sample_class_balanced",
    f"""SELECT label, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM (
            SELECT label,
                   ROW_NUMBER() OVER (PARTITION BY label
                       ORDER BY {_bucket_sql('vec_id', 1000000)}, vec_id) AS rn
            FROM embeddings
        ) WHERE rn <= 30 GROUP BY label""",
    doc="Class-balanced downsampling: keep ≤30 rows per label, chosen by "
    "hash order (stable pseudo-random without RNG) — the imbalance-fix "
    "operator; one window shuffle on the class key.",
)
def q_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        hash_bucket(F.col("vec_id"), 1000000), F.col("vec_id")
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .groupBy("label")
        .agg(F.count("*").alias("n_kept"))
    )


@register(
    "sample_reservoir_topk",
    """
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT 500
    )
    """,
    doc="Exact-k uniform sample (reservoir-sampling equivalent): rank every "
    "row by md5(key) and keep the k smallest. Same marginal distribution as "
    "a k-reservoir but deterministic and engine-independent — and the plan "
    "is TakeOrderedAndProject: per-partition size-k heaps merged on the "
    "driver, so no global sort and no shuffle of the full table. At 100 TB "
    "the cost is one scan + k*n_partitions rows of driver merge, vs a "
    "sequential pass for classic reservoir sampling.",
)
def q_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("_hk"),
        )
        .orderBy("_hk", "doc_id")
        .limit(500)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "sample_bernoulli_rng",
    # r8 contract-oracle conversion: WHICH rows Spark's seeded Bernoulli
    # sampler draws is engine-internal RNG (not hashable), but every draw
    # must satisfy two engine-independent contracts — the sample is a
    # subset of the source relation (anti-join empty) and the sampled
    # fraction sits inside a wide binomial band around p=0.1
    # (±6σ ≈ ±0.08 at n=500: robust to partitioning-dependent draws while
    # still catching a broken fraction or a corrupted subset). The checked
    # output is those facts; the drawn rows stay available as q_bernoulli.
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
              TRUE AS subset_ok,
              TRUE AS fraction_in_band
       FROM documents""",
    doc="df.sample(fraction=0.1, seed=7): Spark's seeded Bernoulli sampler — "
    "kept for API parity. CHECKED OUTPUT (r8 conversion): source row count "
    "+ subset/binomial-band contract booleans; the raw draw stays "
    "available as q_bernoulli.",
)
def q_bernoulli_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    sample = q_bernoulli(spark, sf_dir)
    n_source = docs.count()
    n_sampled = sample.count()
    # every sampled row must exist verbatim in the source
    strays = sample.join(docs, ["doc_id", "lang"], "left_anti").count()
    p, sigma = 0.1, (0.1 * 0.9 / max(n_source, 1)) ** 0.5
    in_band = abs(n_sampled / max(n_source, 1) - p) <= 6 * sigma
    return spark.createDataFrame(
        [(n_source, strays == 0, in_band)],
        "n_source long, subset_ok boolean, fraction_in_band boolean",
    )


def q_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw seeded draw — the product relation; un-registered since the
    chosen rows are engine-internal RNG."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.sample(fraction=0.1, seed=7).select("doc_id", "lang")
