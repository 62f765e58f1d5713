"""foreachBatch upsert sink — the streaming end of the idempotency fix.

The reference's warehouse load is append-only COPY (re-runs duplicate rows,
SURVEY §8.6). In streaming, exactly-once-per-partition lands as
``foreachBatch`` + dynamic partition overwrite: each micro-batch rewrites
only the date partitions it touches, so replays (or late re-deliveries of a
whole partition) converge instead of duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import sinks


def partition_overwrite_each_batch(path: str, partition_by: tuple[str, ...] = ("date",)):
    """Returns the foreachBatch callback: micro-batch → idempotent
    partition-overwrite into the warehouse path."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sinks.write_warehouse(batch_df, path, partition_by, mode="overwrite_partitions")

    return _write
