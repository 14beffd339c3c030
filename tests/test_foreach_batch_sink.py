"""Idempotent foreachBatch sink (streaming/sink.py): exactly-once batch
commits under replay, atomic staging, and reader-visible output."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ccnet_spark_spark.streaming.sink import idempotent_batch_writer, start_foreach_batch_stream


def test_stream_writes_batches_and_replay_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = [(i, f"caption number {i}") for i in range(50)]
    spark.createDataFrame(rows, "event_id long, caption string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema("event_id long, caption string").parquet(src)
    q = start_foreach_batch_stream(stream, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.option("basePath", out).parquet(out)
    assert got.count() == 50
    assert {r.event_id for r in got.select("event_id").collect()} == set(range(50))
    batch_dirs = glob.glob(os.path.join(out, "batch_id=*"))
    assert len(batch_dirs) >= 1

    # replaying an already-committed batch must be a no-op (exactly-once)
    writer = idempotent_batch_writer(out)
    before = sorted(glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True))
    writer(spark.createDataFrame([(999, "dup replay")], "event_id long, caption string"), 0)
    after = sorted(glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True))
    assert before == after
    assert spark.read.option("basePath", out).parquet(out).count() == 50


def test_crashed_staging_is_cleaned_and_committed(spark, tmp_path):
    out = str(tmp_path / "out2")
    os.makedirs(os.path.join(out, "_staging_7"))  # a half-written attempt
    with open(os.path.join(out, "_staging_7", "junk"), "w") as f:
        f.write("partial")
    writer = idempotent_batch_writer(out)
    writer(spark.createDataFrame([(1, "x")], "event_id long, caption string"), 7)
    assert not os.path.exists(os.path.join(out, "_staging_7"))
    got = spark.read.option("basePath", out).parquet(out)
    assert got.count() == 1
    assert got.select(F.col("batch_id")).collect()[0][0] == 7
