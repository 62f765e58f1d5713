"""Quantify file-skipping potential of three layouts via parquet footer
min/max stats: fraction of files whose [min,max] overlaps a range
predicate."""
import sys, glob
sys.path.insert(0, "/root/repo")
import pyarrow.parquet as pq
from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark import sinks

spark = get_spark("zorder-measure")
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
    "l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

N = 64
li.repartition(N).write.mode("overwrite").parquet("/tmp/layout_random")
li.repartitionByRange(N, "l_partkey").sortWithinPartitions("l_partkey").write.mode("overwrite").parquet("/tmp/layout_sorted")
sinks.write_zordered(li, "/tmp/layout_zorder", "l_partkey", "l_suppkey", n_files=N)

def overlap_fraction(path, col, lo, hi):
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                cc = md.row_group(rg).column(c)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (hi >= fmin and lo <= fmax):
            hit += 1
    return hit, len(files)

import json
bounds = li.agg({"l_partkey": "max", "l_suppkey": "max"}).collect()[0]
pk_hi, sk_hi = bounds[0], bounds[1]
# 5%-range predicates on each dimension
pk_range = (0, int(pk_hi * 0.05))
sk_range = (0, int(sk_hi * 0.05))
out = {}
for name, path in [("random", "/tmp/layout_random"), ("sorted_partkey", "/tmp/layout_sorted"), ("zorder", "/tmp/layout_zorder")]:
    out[name] = {
        "partkey_5pct": overlap_fraction(path, "l_partkey", *pk_range),
        "suppkey_5pct": overlap_fraction(path, "l_suppkey", *sk_range),
    }
print(json.dumps(out))
spark.stop()
