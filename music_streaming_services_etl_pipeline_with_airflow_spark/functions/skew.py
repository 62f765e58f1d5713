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
