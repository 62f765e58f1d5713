"""Shared streaming→batch adapter and drop-folder staging.

``run_stream_to_df`` runs an ``availableNow`` streaming query to completion
and hands back a *distributed* batch DataFrame — never a driver-side
``collect()``:

- ``append`` mode → parquet file sink + checkpoint under a fresh temp dir,
  read back lazily with the declared schema. The result lives in executor
  storage exactly like any other table; at 100 TB this is the real shape
  (sink to object storage, downstream reads the committed files).
- ``complete`` mode → memory sink (the only sink supporting complete for
  arbitrary aggregations), returned as the *lazy* ``spark.table`` over the
  sink — each run gets a unique query name so the table is never clobbered,
  and no extra driver round-trip happens beyond what the sink itself holds.

``stage_events`` stages a testdata parquet file into a streaming drop-folder
with ``ts`` NORMALIZED to the one logical form (timestamp[us, UTC]) — the
physical testdata may be TIMESTAMP(NANOS) or TIMESTAMP(MICROS, ntz)
depending on writer/reader versions, and a ``readStream`` schema is fixed
up-front, so the unit fix must happen at staging time, not per-consumer.
Every streaming source therefore declares ``EVENTS_SCHEMA`` below and never
touches physical units. Staleness-safe: the staged copy carries the source
mtime (``os.utime``) and is re-staged whenever the source mtime diverges,
so regenerated testdata can never be shadowed by a stale staged file.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

# The ONE logical events schema every readStream declares (TimestampType,
# matching sources/tables.py's batch normalization under the UTC session).
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

_counter = [0]


def _normalize_events_file(src: str, dst: str) -> None:
    """Rewrite one events parquet file with ``ts`` as timestamp[us, UTC],
    whatever physical form the source has (int64 nanos, timestamp[ns],
    timestamp[us] ntz, or already tz-aware). Driver-side pyarrow is fine
    here: staging a test fixture into a drop-folder is not a data-plane
    operation — production streams read Kafka/object storage directly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(src)
    idx = table.schema.get_field_index("ts")
    col = table.column(idx)
    t = table.schema.field(idx).type
    if pa.types.is_integer(t):
        # int64 nanoseconds since epoch (the nanosAsLong physical form)
        col = col.cast(pa.timestamp("ns"))
        t = col.type
    if pa.types.is_timestamp(t):
        # NTZ wall-clock == UTC instant for this data; truncate to micros
        col = col.cast(pa.timestamp("us", tz=t.tz or "UTC"), safe=False)
        if col.type.tz != "UTC":
            col = col.cast(pa.timestamp("us", tz="UTC"))
    table = table.set_column(idx, "ts", col)
    pq.write_table(table, dst)


def run_stream_to_df(
    df: DataFrame, output_mode: str = "append", scratch: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) and return the
    emitted rows as a batch DataFrame with zero driver materialization on
    the append path.

    ``scratch`` names a stable per-query scratch dir (``workdirs.
    fresh_work_dir``) for the append path's file sink + checkpoint, so
    repeated invocations reuse instead of accumulating under /tmp; without
    a name the dir is a one-shot mkdtemp (callers in the registry always
    pass one)."""
    from ..workdirs import fresh_work_dir

    spark = df.sparkSession
    _counter[0] += 1
    if output_mode == "complete":
        name = f"stream_mem_{os.getpid()}_{_counter[0]}"
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)

    out_dir = (
        fresh_work_dir(f"stream_out_{scratch}")
        if scratch
        else tempfile.mkdtemp(prefix="spark_engine_stream_out_")
    )
    data_dir = os.path.join(out_dir, "data")
    ckpt_dir = os.path.join(out_dir, "ckpt")
    q = (
        df.writeStream.format("parquet")
        .option("path", data_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: an empty result leaves only the sink metadata log
    return spark.read.schema(df.schema).parquet(data_dir)


def stage_events_with_watermark_sentinel(sf_dir: str, name: str) -> str:
    """Stage events plus one far-future *control file*: a (purchase, error)
    sentinel pair for the reserved user_id -1, 365/367 days past the real
    max event time. Outer stream-stream joins only emit their null-padded
    rows once the global watermark passes `left_ts + interval`; with a
    bounded historical folder the watermark stops 2h short of max(ts), so
    the trailing rows would stay in state forever. The sentinel advances
    both sides' event-time high-mark far past every real row — the standard
    "heartbeat/control event" pattern used to close windows on quiet Kafka
    partitions — and is filtered back out after the join (user_id -1 never
    matches real traffic, and the pair is 2 days apart so it never matches
    itself under a 30-minute bound)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = stage_events(sf_dir, name)  # removes any stale sentinel as leftover
    # derive the staged filenames from the folder instead of hardcoding
    # stage_events' layout; parquet column statistics are OPTIONAL, so a
    # stats-less writer falls back to one bounded read of the ts column
    mx = None
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".parquet"):
            continue
        path = os.path.join(d, fname)
        md = pq.ParquetFile(path).metadata
        if md.num_row_groups == 0:
            continue
        ts_idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts"
        )
        stats = [md.row_group(rg).column(ts_idx).statistics for rg in range(md.num_row_groups)]
        if all(st is not None and st.has_min_max for st in stats):
            file_max = max(st.max for st in stats)
        else:
            import pyarrow.compute as pc

            file_max = pc.max(pq.read_table(path, columns=["ts"])["ts"]).as_py()
        mx = file_max if mx is None else max(mx, file_max)
    if mx is None:
        raise ValueError(f"{d}: no staged parquet rows to derive max(ts) from")
    if mx.tzinfo is None:
        mx = mx.replace(tzinfo=dt.timezone.utc)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    table = pa.table(
        {
            "event_id": [-1, -2],
            "ts": [mx + dt.timedelta(days=365), mx + dt.timedelta(days=367)],
            "user_id": [-1, -1],
            "event_type": ["purchase", "error"],
            "value": [0.0, 0.0],
            "props": [None, None],
        },
        schema=schema,
    )
    tmp = f"{d}.sentinel_partial"  # outside the globbed dir
    pq.write_table(table, tmp)
    os.replace(tmp, f"{d}/sentinel.v2.parquet")
    return d


def stage_events(sf_dir: str, name: str, n_copies: int = 1) -> str:
    """Stage ``{sf_dir}/events.parquet`` into a stream drop-folder with
    ``ts`` normalized to the logical schema (``n_copies`` > 1 simulates
    at-least-once redelivery). Write-then-rename keeps partial files out of
    the globbed folder; mtime comparison keeps staged copies fresh if the
    source is regenerated in place."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    stream_dir = f"/tmp/spark_engine_stream/{tag}/{name}"
    os.makedirs(stream_dir, exist_ok=True)
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    src_mtime = os.stat(src).st_mtime_ns
    # the file source globs the whole folder: anything other than the
    # expected copies (stale layouts, older n_copies) must go
    # v2 = ts-normalized staging format; v1 raw copies are "leftover"
    expected = {f"copy{i}.v2.parquet" for i in range(n_copies)}
    for leftover in os.listdir(stream_dir):
        if leftover not in expected:
            os.remove(os.path.join(stream_dir, leftover))
    for i in range(n_copies):
        staged = f"{stream_dir}/copy{i}.v2.parquet"
        if os.path.exists(staged) and os.stat(staged).st_mtime_ns == src_mtime:
            continue
        tmp = f"{stream_dir}.partial{i}"  # outside the globbed dir
        _normalize_events_file(src, tmp)
        os.utime(tmp, ns=(src_mtime, src_mtime))  # carry source mtime
        os.replace(tmp, staged)
    return stream_dir
