"""Dump .explain('formatted') for named queries into plans/r15/<q>_<tag>.txt.

Usage: python tools/dump_plans_r15.py TAG NAME [NAME...] [--sf DIR]
TAG is 'before' or 'after'.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs


def main() -> int:
    tag = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
        names = [n for n in names if n != sf]
    specs = all_specs()
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("/root/repo/plans/r15", exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = f"/root/repo/plans/r15/{name}_{tag}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
