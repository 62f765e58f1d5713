import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.sources import load_table
from music_streaming_services_etl_pipeline_with_airflow_spark.operators.sketches import daily_user_sketches

spark = get_spark("sketch-rollup-measure")
spark.sparkContext.setLogLevel("ERROR")
ev = load_table(spark, "/tmp/sf1", "events")  # 1M rows
# one-time materialization of the daily sketch relation (the stored state)
daily_user_sketches(ev).write.mode("overwrite").parquet("/tmp/daily_sketches")

def t(f):
    best = None
    for _ in range(3):
        t0 = time.time(); f(); dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)

rescan = t(lambda: ev.agg(F.countDistinct("user_id")).collect())
sk = spark.read.parquet("/tmp/daily_sketches")
rollup = t(lambda: sk.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))).collect())
import os
sk_bytes = sum(os.path.getsize(os.path.join(dp,f)) for dp,_,fs in os.walk("/tmp/daily_sketches") for f in fs)
ev_bytes = sum(os.path.getsize(os.path.join(dp,f)) for dp,_,fs in os.walk("/tmp/sf1/events.parquet") for f in fs)
print(f"RESULT rescan_exact={rescan}s rollup_sketch={rollup}s sketch_bytes={sk_bytes} fact_bytes={ev_bytes}")
spark.stop()
