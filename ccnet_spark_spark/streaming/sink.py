"""Idempotent foreachBatch sink — the canonical production streaming-write
pattern (Structured Streaming guarantees each batchId is replayed with the
SAME data after a failure, so a sink that is idempotent PER batchId gives
end-to-end exactly-once even though foreachBatch itself is at-least-once).

Each micro-batch lands in its own ``batch_id=N`` subdirectory via an
atomic-rename commit: data is written to a hidden staging dir and renamed
into place, so a retry of a half-written batch sees no committed dir and
rewrites cleanly, while a retry of a committed batch is skipped entirely.
Readers see only committed batches (``spark.read.parquet(path)`` with
basePath picks up every batch_id partition).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def idempotent_batch_writer(path: str):
    """Returns the (batch_df, batch_id) callback for
    ``writeStream.foreachBatch``. Commit protocol per batch:

    1. committed dir exists -> replayed batch, skip (idempotence)
    2. write to ``_staging_<id>`` (crash here leaves garbage, never data)
    3. atomic rename staging -> ``batch_id=<id>`` (the commit point)
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(path, f"batch_id={batch_id}")
        if os.path.exists(final):
            return
        staging = os.path.join(path, f"_staging_{batch_id}")
        if os.path.exists(staging):
            shutil.rmtree(staging)  # leftovers from a crashed attempt
        batch_df.write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, final)
        except OSError:
            # lost a race against a concurrent retry of the same batch:
            # if the committed dir now exists the batch IS durable (same
            # data by the replay guarantee) — drop our copy and succeed
            if not os.path.exists(final):
                raise
            shutil.rmtree(staging, ignore_errors=True)

    return write_batch


def start_foreach_batch_stream(stream_df: DataFrame, path: str, checkpoint: str):
    """availableNow foreachBatch stream writing idempotent batch_id
    partitions under ``path``."""
    return (
        stream_df.writeStream.foreachBatch(idempotent_batch_writer(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
