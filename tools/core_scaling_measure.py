"""Core-scaling measurement at a size where parallelism matters (r16,
VERDICT r15 ask #8): the 8-vs-32-core block of the sf0.1 bench is
uninformative — the whole battery is stage-overhead-bound there, the
8-core total comes out FASTER, and no query can be diagnosed as serial
from it. This tool times the top headline queries on the 10× sf0.1
replica (/tmp/sf1, built by tools/scaling_bench.py) at 8 and 32 cores in
SEPARATE JVMs and reports the per-query low/high-core speedup.

Usage:
  python tools/scaling_bench.py --build-only   # once, builds /tmp/sf1
  python tools/core_scaling_measure.py         # drives both core counts
  python tools/core_scaling_measure.py --run 8 # internal: one core count
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES = [
    "graph_triangle_counts",
    "dedup_containment_banded",
    "dedup_minhash_lsh",
    "retrieval_maxsim_two_stage",
    "retrieval_rrf_hybrid",
    "dedup_winnowed_shingles",
    "genre_kpis_daily",
]
SF_DIR = "/tmp/sf1"
N_RUNS = 3


def run_one(cpus: str) -> None:
    sys.path.insert(0, "/root/repo")
    from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    spark = get_spark(f"core-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out = {}
    for name in QUERIES:
        xs = []
        for _ in range(N_RUNS):
            # fn() inside the timer: the EAGER queries (maxsim pool
            # checkpoint) do real work at plan-build time, exactly as
            # bench.py's EAGER_FN accounts it
            t0 = time.time()
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            xs.append(time.time() - t0)
        xs.sort()
        out[name] = round(xs[len(xs) // 2], 3)
    print("RESULT " + json.dumps({"cpus": cpus, "queries": out}))
    spark.stop()


def main() -> int:
    if "--run" in sys.argv:
        run_one(sys.argv[sys.argv.index("--run") + 1])
        return 0
    if not os.path.exists(f"{SF_DIR}/lineitem.parquet/_SUCCESS"):
        print(f"{SF_DIR} missing — run tools/scaling_bench.py first", file=sys.stderr)
        return 1
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", cpus],
            env=env, capture_output=True, text=True,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["cpus"]] = r["queries"]
        if cpus not in results:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            return 1
    rows = {
        q: {
            "c8_sec": results["8"][q],
            "c32_sec": results["32"][q],
            "speedup_32_over_8": round(results["8"][q] / results["32"][q], 2),
        }
        for q in QUERIES
    }
    print(json.dumps({"sf_dir": SF_DIR, "rows": rows}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
