"""Z-order (Morton) data layout — multi-dimensional file skipping for
parquet tables without a table format.

A single-column sort gives perfect min/max pruning on that column and NONE
on any other; interleaving the bits of two normalized keys gives useful
pruning on BOTH. Each written file then covers a small rectangle of the
(a, b) key space, so a range predicate on either column overlaps only
~sqrt-proportionally many files. Parquet row-group stats (written by every
writer) are the skipping index — Spark's reader prunes row groups whose
min/max exclude the pushed-down predicate, and at 100 TB that is the
difference between scanning a table and scanning a stripe.

All JVM-side expressions: min/max normalize to 16-bit grid coordinates,
then a 32-term shift-or interleave. `sinks.write_zordered` applies it as
`repartitionByRange(z) + sortWithinPartitions(z)` — a total order on the
Morton curve, split into equal-frequency files.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension grid resolution


def normalize_to_grid(c: Column, cmin: Column, cmax: Column) -> Column:
    """Scale a numeric column onto [0, 2^Z_BITS - 1] integer grid
    coordinates (integer arithmetic — no float rounding drift)."""
    span = F.greatest(cmax - cmin, F.lit(1))
    return ((c - cmin) * ((1 << Z_BITS) - 1) / span).cast("long")


def interleave_bits(a: Column, b: Column) -> Column:
    """Morton code: bit i of `a` lands at position 2i, bit i of `b` at
    2i+1 — a 32-term shift/or tree, whole-stage-codegen friendly."""
    terms = []
    for i in range(Z_BITS):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def with_zorder(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Append a `_z` Morton-code column over (col_a, col_b). The min/max
    normalization bounds are computed in one tiny pre-pass and inlined as
    literals (they are layout parameters, not per-row state)."""
    bounds = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    ).collect()[0]
    ga = normalize_to_grid(
        F.col(col_a), F.lit(bounds.amin), F.lit(bounds.amax)
    )
    gb = normalize_to_grid(
        F.col(col_b), F.lit(bounds.bmin), F.lit(bounds.bmax)
    )
    return df.withColumn("_z", interleave_bits(ga, gb))
