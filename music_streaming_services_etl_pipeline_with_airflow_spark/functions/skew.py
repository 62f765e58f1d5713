"""Skew mitigation: salted equi-join.

AQE's skew-join splitting handles most skew at runtime (enabled in
session.py); manual salting remains the tool when one key dominates so hard
that even split partitions bottleneck, or when AQE is unavailable (e.g.
inside a streaming foreachBatch).

Mechanics: the skewed (large) side gets a deterministic salt in [0, n);
the small side is exploded n× with every salt value; the join key becomes
(key, salt), spreading one hot key over n reducers. Deterministic salt
(hash of stable columns, not rand()) keeps retries/speculative tasks
consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_narrow(df: DataFrame, bytes_per_task: int = 16384) -> DataFrame:
    """Round-robin repartition an UNDER-partitioned frame so a CPU-heavy
    map stage (hashing, codecs, per-row array kernels) is not serialized
    on a handful of scan splits. No-op whenever the input already has
    enough partitions — a real-scale scan does, so no 100 TB plan pays
    the extra shuffle; only toy/summary-sized inputs get spread.

    The target is sized from the input (Catalyst's driver-side byte
    estimate, ~``bytes_per_task`` per task) and capped at
    defaultParallelism, mirroring multimodal._spread / the dedup-LSH
    spread rule: tiny frames stay near-unsplit instead of paying a full
    complement of task launches."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = 0
    target = par if est <= 0 else max(1, min(par, (est + bytes_per_task - 1) // bytes_per_task))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with the hot-key load spread over ``n_salts``
    reducers. ``salt_from`` names a stable column on the large side used to
    derive the salt (defaults to the join key's row-level hash companion —
    any column with per-row variety works)."""
    salt_col = F.pmod(F.xxhash64(F.col(salt_from or key), F.lit(42)), F.lit(n_salts))
    lg = large.withColumn("_salt", salt_col)
    sm = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lg.join(sm, [key, "_salt"], how)
    return out.drop("_salt")
