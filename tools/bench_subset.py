"""Time a subset of registered queries with bench.py's exact methodology
(untimed warmup pass, then median of N noop-sink runs, EAGER_FN queries
timed fn()+sink) — the iteration loop for optimization work.

Usage: python tools/bench_subset.py NAME [NAME...] [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

# keep in sync with bench.py
EAGER_FN = {
    "retrieval_maxsim_two_stage",
    "w4_quartiles_scale_safe",
    "w6_relative_ranks_scale_safe",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    specs = all_specs()
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.components import (
        q_pagerank_parts,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.similarity import (
        q_topk_ivfpq,
        q_topk_pq,
    )

    bench_fn = {
        "similarity_pq_topk": q_topk_pq,
        "similarity_ivfpq_topk": q_topk_ivfpq,
        "graph_pagerank_parts": q_pagerank_parts,
    }

    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    def fn_of(name):
        return bench_fn.get(name, specs[name].fn)

    def run_once(name: str) -> float:
        spark.sparkContext.setJobDescription(f"bench_subset:{name}")
        if name in EAGER_FN:
            t0 = time.time()
            fn_of(name)(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0
        df = fn_of(name)(spark, args.sf)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in args.names:
        run_once(name)  # warmup, untimed
    samples = {n: [] for n in args.names}
    for _ in range(args.runs):
        for name in args.names:
            samples[name].append(run_once(name))
    for name in args.names:
        xs = sorted(samples[name])
        med = xs[len(xs) // 2] if len(xs) % 2 else (xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2
        print(f"{name}: median={med:.3f}s samples={[round(x, 3) for x in xs]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
