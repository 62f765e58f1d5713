"""Sinks (SURVEY §2.2, K1-K5).

The reference's persistence chain is /tmp CSV → S3 upload → Redshift COPY
(append-only — re-runs duplicate rows, SURVEY §8.6). Spark collapses the
chain: DataFrames write straight to the warehouse path/table, and the
append-only bug becomes **idempotent partition overwrite** (the upsert the
problem statement asked for but the reference never built — SURVEY §7.3).

Scale notes:
- KPI outputs are partitioned by ``date``: daily reruns replace exactly one
  partition (dynamic partition overwrite), and date-filtered reads prune.
- CSV single-file parity (the reference's to_csv) is available via
  ``single_file=True`` (coalesce(1)) but the default is parallel part files.
- JDBC writes execute for real against embedded Derby (bundled with Spark)
  in tests/test_jdbc_roundtrip.py — batched insert, overwrite and append
  modes, read back via a partitioned scan. Networked engines
  (Redshift/MySQL/Postgres) swap in via url/driver options only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K1/K2 — header CSV; write directly to the destination (s3a://... in
    production — no separate upload step)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_warehouse(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("date",),
    mode: str = "overwrite_partitions",
) -> None:
    """K3/K4 — partitioned parquet warehouse write.

    mode='overwrite_partitions' (default) is the idempotent upsert: only the
    partitions present in ``df`` are replaced (dynamic partition overwrite),
    so a daily rerun rewrites that day, never duplicating it. mode='append'
    reproduces the reference's (buggy) COPY behavior; mode='overwrite'
    replaces the whole table.
    """
    writer = df.write.format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "overwrite_partitions":
        writer = writer.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    else:
        writer = writer.mode(mode)
    writer.save(path)


def create_table_if_not_exists(spark: SparkSession, name: str, ddl_cols: str, path: str) -> None:
    """K3 — DDL surface (reference dags/music_streaming_services_dag.py:247-285)
    against the Spark catalog (external parquet table)."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({ddl_cols}) USING parquet LOCATION '{path}'"
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles data into ``n_buckets`` hash
    buckets on ``bucket_col`` at write time, so later joins/aggregations on
    that key read co-located buckets and skip the shuffle entirely — the
    100 TB answer to repeatedly joining the same big tables on the same key
    (pay the shuffle once at load, never at query time). Optional per-bucket
    sort enables sort-merge without a sort step."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: tuple[str, ...],
    partition_col: str = "date",
) -> None:
    """Key-level MERGE (upsert) onto a partitioned parquet table without a
    table format: rewrite ONLY the partitions the updates touch, replacing
    matched keys and appending unmatched ones — `WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT` semantics.

    Partition-pruned read + dynamic partition overwrite keeps the rewrite
    proportional to touched partitions, not table size (the parquet-native
    stand-in for Delta/Iceberg MERGE INTO; swapping in a table format later
    changes only this function).

    The merged result is materialized (eager ``localCheckpoint``) BEFORE the
    overwrite starts, so the write job never reads the files it is replacing.
    The commit itself is the parquet committer's staging protocol —
    atomic per partition directory but not across partitions; a crash
    mid-commit can leave a subset of touched partitions replaced. True
    multi-partition transactionality needs a table format (Delta/Iceberg)
    — documented contract, not silently assumed.
    """
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not _path_exists(spark, target_path):
        write_warehouse(updates, target_path, (partition_col,))
        return
    current = spark.read.parquet(target_path).filter(
        F.col(partition_col).isin(touched)
    )
    key_cols = list(keys)
    survivors = current.join(updates.select(*key_cols), key_cols, "left_anti")
    # eager materialization: compute the merge while the target is still
    # intact; the overwrite then writes from checkpointed blocks, not from
    # a lazy plan over the very files being replaced
    merged = survivors.unionByName(updates).localCheckpoint(eager=True)
    write_warehouse(merged, target_path, (partition_col,), mode="overwrite_partitions")


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — works for any
    scheme Spark can read (file://, s3a://, hdfs://), unlike os.path."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def jdbc_writer(df: DataFrame, url: str, table: str, batchsize: int = 5000, mode: str = "append"):
    """K5 — batched JDBC insert (reference executemany chunks of 5000/1000,
    songs_to_rds.py:77-92 / users_to_rds.py:45-60). Returns the configured
    writer; caller invokes .save() where a database is reachable."""
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
        .mode(mode)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 64,
) -> None:
    """Write `df` Z-ORDERED on (col_a, col_b): Morton-code total order,
    range-partitioned into ~equal files, sorted within each — so every
    file's parquet min/max stats cover a small rectangle of the key space
    and range predicates on EITHER column skip most files/row-groups.
    The parquet-native stand-in for Delta OPTIMIZE ZORDER BY; see
    functions/zorder.py and the SCALING.md measurement."""
    from .functions.zorder import with_zorder

    z = with_zorder(df, col_a, col_b)
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_col: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet table into
    ceil(bytes / target_file_mb) files (per partition if partition_col).
    Streaming micro-batches and per-task writers fragment tables into
    thousands of KB-sized files; at 100 TB the fix is a periodic rewrite
    sized by DATA VOLUME, not task count. Returns the file count written.

    Swap protocol (LOCAL-FS ONLY — os.rename/shutil.rmtree do not speak
    s3a/hdfs): the compacted copy is staged beside the table, then swapped
    in with TWO renames (path→``._precompact`` backup, staging→path).
    Readers never see a half-compacted table, but CAN hit a missing path in
    the instant between the renames, and a crash in that window leaves the
    table at ``<path>._precompact`` — recovery is renaming the backup dir
    back. On a real cluster this job belongs behind a metastore location
    swap or a table format's OPTIMIZE, which make the swap one metadata op."""
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "._compacting"
    writer = df.repartition(n_files) if partition_col is None else df.repartition(
        n_files, partition_col
    )
    w = writer.write.mode("overwrite")
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.parquet(staging)
    backup = path.rstrip("/") + "._precompact"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return n_files


def write_jsonl_sharded(
    df: DataFrame, path: str, shard_key: str, n_shards: int
) -> dict:
    """Training-data delivery: JSON-lines shards with DETERMINISTIC
    key-hash shard assignment (the same row lands in the same shard on
    every run and cluster size — loaders can resume / spot-check shards
    reproducibly, unlike round-robin repartition) plus a _manifest.json
    recording per-shard row counts, total, and the schema. Downstream
    dataloaders read the manifest to size epochs and validate delivery
    without scanning the data; a shard with count 0 writes NO shard=N
    directory (Spark partitionBy emits only present keys), so loaders
    must consult the manifest, not the directory listing. The sharded
    frame is persisted across the write and the count so BOTH read the
    same materialization — without the cache a nondeterministic upstream
    (sample(), unordered limit, RNG) could publish a manifest that
    disagrees with the delivered shard bytes. Every shard id 0..n-1
    appears in the manifest, zeros included. The manifest publish is
    atomic (temp file +
    os.replace — the same protocol as snapshots._write_manifest).
    LOCAL-FS ONLY for the manifest side (like `compact`): the data write
    accepts any Hadoop path, but the manifest uses the local filesystem.
    One shuffle on the shard id; shards land as shard=NNN/ partition
    directories of JSON-lines files."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from .operators.sampling import hash_bucket

    sharded = df.withColumn("shard", hash_bucket(F.col(shard_key), n_shards))
    sharded.persist()
    try:
        (
            sharded.repartition(n_shards, "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .json(path)
        )
        counts = {
            int(r["shard"]): r["n"]
            for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
    finally:
        sharded.unpersist()
    manifest = {
        "format": "jsonl",
        "n_shards": n_shards,
        "shard_key": shard_key,
        "total_rows": sum(counts.values()),
        "rows_per_shard": {str(k): counts.get(k, 0) for k in range(n_shards)},
        "columns": sorted(c for c in df.columns),
    }
    target_dir = path.rstrip("/")
    fd, tmp = _tempfile.mkstemp(dir=target_dir, suffix=".tmp")
    with _os.fdopen(fd, "w") as fh:
        _json.dump(manifest, fh, indent=1)
    _os.replace(tmp, f"{target_dir}/_manifest.json")
    return manifest
