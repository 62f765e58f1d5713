"""Distributed model training — the quality-classifier distillation shape.

LLM data pipelines train small linear classifiers over the corpus
(fastText-style quality filters): label a sample by an expensive rule or
teacher, train a cheap linear model on simple features, score everything
with the model. This module implements that loop so it is EXACTLY
value-hash checkable end to end — a batch POCKET PERCEPTRON over integer
features with an integer rule label: margins, misclassification masks,
update sums, per-epoch error counts and weights are all BIGINT arithmetic,
so the DuckDB oracle replays the ENTIRE training run epoch-by-epoch as
chained CTEs (including the pocket argmin pick) and every final weight,
per-document margin and prediction must match bit-for-bit. (The float
siblings — logistic GD, Lloyd's k-means — are only contract-auditable
because float-sum order varies; the integer perceptron is the one
distributed-training loop a SQL oracle can replay EXACTLY.)

The learning target is the honest one for this corpus: DISTILL the
rule-based quality gate (length floor + lexical-diversity floor — the
curate_quality_verdicts family of signals) into a linear model over cheap
integer stats. The gate is an AND of two linear conditions, so a linear
model can approximate but not exactly express it — the pocket pick keeps
the best epoch, and the pytest pin asserts the distilled model beats the
majority-class baseline.

Scale shape (100 TB): each epoch is ONE corpus scan + a map-side partial
aggregate of ~6 integers (update sums + error count); the weight vector
lives on the driver (bytes) and rides back into the scan as literals — the
canonical data-parallel training loop, no shuffle of anything corpus-sized,
epochs compose linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

EPOCHS = 8
# bias + the RULE-ALIGNED margin features: token floor margin, token
# ceiling margin, diversity margin (integer per-mille minus the floor) —
# feature engineering is what makes the AND-of-thresholds gate nearly
# linear; raw counts left the pocket stuck at the majority class
_FEATS = ["x0", "x1", "x2", "x3"]
# the teacher rule being distilled: a length floor/band + a lexical
# diversity floor, integer arithmetic only
RULE_SQL = (
    "CASE WHEN n_tokens BETWEEN 25 AND 120 "
    "AND n_distinct * 1000 / n_tokens >= 400 THEN 1 ELSE -1 END"
)


def _features(docs: DataFrame) -> DataFrame:
    """Integer margin features + the integer teacher label y (+1 = keep)."""
    toks = F.split(F.col("text"), " ")
    stats = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    return stats.select(
        "doc_id",
        F.when(
            F.col("n_tokens").between(25, 120)
            & (F.col("n_distinct") * 1000 / F.col("n_tokens") >= 400),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        F.lit(1).cast("long").alias("x0"),
        (F.col("n_tokens") - 25).alias("x1"),
        (F.lit(120) - F.col("n_tokens")).alias("x2"),
        (F.expr("n_distinct * 1000 div n_tokens") - 400).alias("x3"),
    )


_FEATURE_CTES = """t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
    FROM t
),
f AS (
    SELECT doc_id,
           CAST({rule} AS BIGINT) AS y,
           CAST(1 AS BIGINT) AS x0,
           n_tokens - 25 AS x1,
           120 - n_tokens AS x2,
           n_distinct * 1000 // n_tokens - 400 AS x3
    FROM s
)""".format(rule=RULE_SQL)


PERCEPTRON_ORACLE: str  # assigned below, shared verbatim by the streaming twin


def _perceptron_oracle() -> str:
    """Replay the full pocket-perceptron run in SQL: w^0 = 0; each epoch e
    sums y*x over rows misclassified under w^(e-1) (margin <= 0) into the
    weights, and counts that epoch's training errors; the POCKET pick is
    the (errors, epoch)-argmin over epochs 1..EPOCHS. All-integer, so the
    replay — including the argmin — is exact."""
    nf = len(_FEATS)
    dot = lambda w: " + ".join(f"{w}.w{j} * f.{c}" for j, c in enumerate(_FEATS))  # noqa: E731
    ctes = [
        _FEATURE_CTES,
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(nf))
        + ")",
    ]
    for e in range(1, EPOCHS + 1):
        p = f"w{e - 1}"
        upd = ", ".join(
            f"CAST(COALESCE(SUM(CASE WHEN f.y * ({dot(p)}) <= 0 "
            f"THEN f.y * f.{c} END), 0) AS BIGINT) AS u{j}"
            for j, c in enumerate(_FEATS)
        )
        ctes.append(f"u{e} AS (SELECT {upd} FROM f CROSS JOIN {p})")
        ctes.append(
            f"w{e} AS (SELECT "
            + ", ".join(f"{p}.w{j} + u{e}.u{j} AS w{j}" for j in range(nf))
            + f" FROM {p} CROSS JOIN u{e})"
        )
        # training errors of THIS epoch's weights
        ctes.append(
            f"e{e} AS (SELECT CAST(COUNT(*) FILTER ("
            f"f.y * ({dot(f'w{e}')}) <= 0) AS BIGINT) AS err "
            f"FROM f CROSS JOIN w{e})"
        )
    cand = " UNION ALL ".join(
        f"SELECT CAST({e} AS BIGINT) AS epoch, e{e}.err, "
        + ", ".join(f"w{e}.w{j}" for j in range(nf))
        + f" FROM w{e} CROSS JOIN e{e}"
        for e in range(1, EPOCHS + 1)
    )
    ctes.append(f"cand AS ({cand})")
    ctes.append(
        "best AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
        "(ORDER BY err ASC, epoch ASC) AS _rk FROM cand) WHERE _rk = 1)"
    )
    bdot = " + ".join(f"best.w{j} * f.{c}" for j, c in enumerate(_FEATS))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.doc_id, f.y,
       CAST(f.y * ({bdot}) AS BIGINT) AS margin,
       CAST(CASE WHEN ({bdot}) > 0 THEN 1 ELSE -1 END AS BIGINT)
           AS predicted,
       (f.y * ({bdot})) > 0 AS correct,
       best.epoch AS best_epoch, best.err AS train_errors,
       """
        + ", ".join(f"best.w{j} AS w{j}" for j in range(nf))
        + "\nFROM f CROSS JOIN best"
    )


@register(
    "ml_perceptron_quality_distill",
    _perceptron_oracle(),
    doc=f"Distributed classifier TRAINING, exactly hash-checkable: a "
    f"pocket perceptron ({EPOCHS} epochs) distills the rule-based quality "
    "gate (length band + lexical-diversity floor) into a linear model "
    "over rule-aligned integer margin features — the fastText-quality-"
    "filter shape. Every epoch is one corpus scan producing a map-side-"
    "combined integer update-sum + error-count aggregate the driver folds "
    "into the broadcast weights; the pocket pick keeps the (errors, "
    "epoch)-argmin epoch. Because margins, masks, updates, error counts "
    "and weights are ALL BIGINT, the oracle replays the complete training "
    "run as chained SQL CTEs — including the pocket argmin — and the "
    "final weights + per-document margins/predictions must match "
    "bit-for-bit: a full value-hash check of distributed ML training, not "
    "just a contract audit. Learned accuracy beats the majority baseline "
    "(pytest-pinned); the gate is an AND of two linear conditions, so "
    "exact agreement is not expected, approximation is.",
)
def q_perceptron_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    w, epoch, err = train_perceptron(spark, sf_dir)
    return score_frame(
        _features(load_table(spark, sf_dir, "documents")), w, epoch, err
    )


def train_perceptron(spark: SparkSession, sf_dir: str):
    """The distributed training loop: EPOCHS x (one corpus scan -> one
    map-side integer aggregate folded into driver-held weights), pocket
    pick by (errors, epoch). Returns (weights, best_epoch, train_errors)
    — bytes of driver state, broadcast back into scoring as literals."""
    nf = len(_FEATS)
    feats = _features(load_table(spark, sf_dir, "documents")).persist()
    try:
        w = [0] * nf
        cand: list[tuple[int, int, list[int]]] = []
        for e in range(1, EPOCHS + 1):
            wx = sum(F.lit(w[j]) * F.col(c) for j, c in enumerate(_FEATS))
            mis = F.col("y") * wx <= 0
            sums = feats.agg(
                *[
                    F.coalesce(
                        F.sum(F.when(mis, F.col("y") * F.col(c))), F.lit(0)
                    ).alias(c)
                    for c in _FEATS
                ]
            ).first()
            w = [w[j] + sums[j] for j in range(nf)]
            wx = sum(F.lit(w[j]) * F.col(c) for j, c in enumerate(_FEATS))
            err = feats.filter(F.col("y") * wx <= 0).count()
            cand.append((err, e, list(w)))
        return min(cand)[2], min(cand)[1], min(cand)[0]
    finally:
        feats.unpersist()


def score_frame(
    feats: DataFrame, w: list[int], epoch: int, err: int
) -> DataFrame:
    """Score a feature frame (batch OR streaming — a stateless narrow
    projection) with frozen weights. The train-offline / score-online
    split: the model rides along as literals, so the same expression
    serves a 100 TB batch scan and a micro-batched stream identically."""
    nf = len(_FEATS)
    wx = sum(F.lit(w[j]) * F.col(c) for j, c in enumerate(_FEATS))
    return feats.select(
        "doc_id",
        "y",
        (F.col("y") * wx).cast("long").alias("margin"),
        F.when(wx > 0, F.lit(1)).otherwise(F.lit(-1))
        .cast("long")
        .alias("predicted"),
        (F.col("y") * wx > 0).alias("correct"),
        F.lit(epoch).cast("long").alias("best_epoch"),
        F.lit(err).cast("long").alias("train_errors"),
        *[F.lit(w[j]).cast("long").alias(f"w{j}") for j in range(nf)],
    )


PERCEPTRON_ORACLE = _perceptron_oracle()
