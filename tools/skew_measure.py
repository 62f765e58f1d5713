"""Skew microbenchmark: 50M-row fact with 15 hot keys, shuffle join forced."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.functions.skew import salted_join

spark = get_spark("skew-measure2")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.enabled", "false")

N = 50_000_000
fact = spark.range(N).select(
    F.col("id").alias("event_id"),
    F.pmod(F.xxhash64("id"), F.lit(15)).alias("user_id"),
)
dim = spark.range(15).select(
    F.col("id").alias("user_id"),
    F.concat(F.lit("seg"), F.col("id")).alias("seg"),
)

def t(df):
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 2)

plain = fact.join(dim, "user_id").select("event_id", "seg")
salted = salted_join(fact, dim, "user_id", n_salts=32, salt_from="event_id").select(
    "event_id", "seg")
t_plain = t(plain)
t_salted = t(salted)
print(f"RESULT plain_smj_15reducers={t_plain}s salted32={t_salted}s")
spark.stop()

# Scenario 3: AQE runtime skew-split on the same join — fresh session with
# AQE on and skew thresholds sized to the data (the defaults trigger at
# 256MB partitions; this fact's hot partitions are ~50MB, so a real
# deployment tunes advisory/threshold to its shuffle sizes).
spark = get_spark("skew-measure-aqe")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

fact = spark.range(N).select(
    F.col("id").alias("event_id"),
    F.pmod(F.xxhash64("id"), F.lit(15)).alias("user_id"),
)
dim = spark.range(15).select(
    F.col("id").alias("user_id"),
    F.concat(F.lit("seg"), F.col("id")).alias("seg"),
)
aqe_join = fact.join(dim, "user_id").select("event_id", "seg")
t_aqe = t(aqe_join)
print(f"RESULT aqe_skew_split={t_aqe}s")
spark.stop()
