"""Realistic-growth scale row for graph_triangle_counts.

The round-6 SCALING row scaled the basket corpus by REPLICATING rows with
the SAME keys — an adversarial density artifact: every co-purchase pair's
support multiplies, the support filter saturates, and the graph comes out
~300x denser than real growth would make it (2.97 s -> 30.3 s). Real data
growth adds NEW baskets over a growing catalog, holding pair density
roughly constant. This tool measures that case: k disjoint fresh-key
copies of the sf0.1 basket relation (orderkeys AND partkeys offset per
copy), so baskets, vertices, and edges all scale by k while per-vertex
degree distribution — and hence wedge density — is UNCHANGED.

Usage: python tools/triangle_scale_measure.py [k ...]   (default 1 10)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.operators.components import (
    triangle_counts_from_baskets,
)

SF_DIR = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # > any sf0.1 key; keeps copies disjoint


def main() -> None:
    ks = [int(x) for x in sys.argv[1:]] or [1, 10]
    spark = get_spark("triangle_scale")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    base.write.format("noop").mode("overwrite").save()  # warm the scan

    for k in ks:
        li = base.crossJoin(spark.range(k).select(F.col("id").alias("_c"))).select(
            (F.col("l_orderkey") + F.col("_c") * OFFSET).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_c") * OFFSET).alias("l_partkey"),
        )
        walls = []
        for _ in range(2):
            t0 = time.time()
            triangle_counts_from_baskets(li).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        n_rows = base.count() * k
        print(
            f"k={k:>3}: baskets~{n_rows/1e6:.1f}M rows, "
            f"wall best-of-2 {min(walls):.2f} s (runs: "
            + ", ".join(f"{w:.2f}" for w in walls)
            + ")"
        )
    spark.stop()


if __name__ == "__main__":
    main()
