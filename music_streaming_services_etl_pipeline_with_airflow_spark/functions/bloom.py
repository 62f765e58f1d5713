"""Bloom-filter semi-join reduction (runtime-filter pattern).

Catalyst injects runtime bloom filters only for large shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.*``) and its aggregate
(``BloomFilterAggregate``) is not exposed to SQL or Python. This module
builds the same reduction from public primitives:

- build side: k seeded ``xxhash64`` positions modulo ``num_bits``,
  deduplicated distributedly, collected as a bounded bit-position set
  (size <= num_bits — the *summary* is collected, never the data, exactly
  like broadcasting a runtime filter);
- probe side: a conjunction of ``isin`` membership tests (compiled by
  Catalyst to hash-set ``InSet`` lookups inside whole-stage codegen), so
  probe rows that cannot join are dropped *before* the shuffle.

False positives pass through and are eliminated by the actual join, so any
query using this prefilter returns bit-identical results to the plain join
— which is what makes it oracle-checkable.

At 100 TB: the probe side is the multi-TB fact table; the reduction happens
map-side at the scan, so the shuffle moves only rows whose keys (probably)
exist on the build side. Size ``num_bits`` ~ 10x build-side distinct keys
for a ~1-2% false-positive rate with k=2. When the build side is small
enough to broadcast its exact key set, prefer a broadcast semi-join; the
bloom wins when distinct keys are too many to ship exactly but the bitset
still fits.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEEDS = (0x9E37, 0x85EB)


def _positions(key: Column, num_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    # xxhash64 has a fixed internal seed; k independent hash functions come
    # from hashing (key, salt_i) pairs.
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits)).cast("int") for s in seeds
    ]


def bloom_bit_positions(
    build_df: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> list[int]:
    """Distinct bit positions set by the build side's keys (sorted)."""
    pos = _positions(F.col(key), num_bits, seeds)
    rows = build_df.select(F.explode(F.array(*pos)).alias("b")).distinct().collect()
    return sorted(r.b for r in rows)


def bloom_prefilter(
    probe_df: DataFrame,
    key: str,
    bits: list[int],
    num_bits: int = 1 << 16,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Keep only probe rows whose key might exist on the build side."""
    pos = _positions(F.col(key), num_bits, seeds)
    return probe_df.filter(reduce(and_, [p.isin(bits) for p in pos]))
