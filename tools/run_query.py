"""Run any registered query by name from the command line.

Usage:
  python tools/run_query.py --list                      # all query names + docs
  python tools/run_query.py NAME [NAME...]              # run at default sf
  python tools/run_query.py NAME --sf /root/testdata/sf0.1 --limit 50
  python tools/run_query.py NAME --explain              # formatted physical plan
  python tools/run_query.py NAME --save /tmp/out        # parquet instead of show

The migration entry point for a reference user: every operator in
COVERAGE.md is addressable here by name.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="registered query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="testdata dir")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--save", default=None, help="write result parquet to this path")
    ap.add_argument("--list", action="store_true", help="list all queries")
    args = ap.parse_args()

    specs = all_specs()
    if args.list or not args.names:
        width = max(len(n) for n in specs)
        for name in sorted(specs):
            oracle = "oracle" if specs[name].oracle else "rows-only"
            doc = (specs[name].doc or "").split(" — ")[0].split(". ")[0]
            print(f"{name:<{width}}  [{oracle}] {doc[:90]}")
        return 0

    unknown = [n for n in args.names if n not in specs]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)} (use --list)", file=sys.stderr)
        return 2

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        t0 = time.time()
        df = specs[name].fn(spark, args.sf)
        if args.explain:
            print(f"== {name} ==")
            df.explain(mode="formatted")
        if args.save:
            out = f"{args.save.rstrip('/')}/{name}"
            df.write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            print(f"{name}: {n} rows -> {out} [{time.time() - t0:.2f}s]")
        else:
            df.show(args.limit, truncate=40)
            print(f"{name}: shown up to {args.limit} rows [{time.time() - t0:.2f}s]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
