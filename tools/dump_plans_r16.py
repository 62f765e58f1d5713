"""Dump .explain('formatted') for named queries into plans/r16/<q>_<tag>.txt.

Usage: python tools/dump_plans_r16.py --tag {before,after} NAME [NAME...]
       [--sf DIR] [--executed]

--executed additionally runs the query through the noop sink first and
dumps the AQE-final plan (<q>_<tag>_executed.txt), which is where
ReusedExchange / AQEShuffleRead nodes appear.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--executed", action="store_true")
    args = ap.parse_args()

    specs = all_specs()
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("/root/repo/plans/r16", exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.names:
        df = specs[name].fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(mode)
        out = f"/root/repo/plans/r16/{name}_{args.tag}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
        if args.executed:
            # an action on the df's OWN QueryExecution (a noop write plans
            # a separate command execution and leaves this one initial)
            df.collect()
            plan = df._jdf.queryExecution().explainString(mode)
            out = f"/root/repo/plans/r16/{name}_{args.tag}_executed.txt"
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
