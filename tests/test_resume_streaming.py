"""Checkpoint/lineage sidecar resume semantics + Structured Streaming smoke."""

import os

import pyspark.sql.functions as F
import pytest

from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
from ccnet_spark_spark.plans.pipeline import Config, Pipeline
from ccnet_spark_spark.plans.rollup import bucket_rollup
from ccnet_spark_spark.sources import tables
from ccnet_spark_spark.synth import generate_pairs


def _partitions(spark, n_parts=4, rows_per=120):
    return {
        f"p{i:02d}": generate_pairs(spark, rows_per, seed=100 + i) for i in range(n_parts)
    }


def test_resume_processes_each_partition_once(spark, tmp_path):
    result_path = str(tmp_path / "result")
    cutoffs = load_cutoffs_dict()
    pipe = Pipeline(spark, Config(cutoffs=cutoffs))
    parts = _partitions(spark)

    calls = []

    def run_one_failing(df):
        if len(calls) == 2:
            calls.append("boom")
            raise RuntimeError("simulated executor loss")
        calls.append("ok")
        return pipe.run(df)

    with pytest.raises(RuntimeError):
        tables.run_resumable(spark, parts, result_path, run_one_failing)
    done_first = set(tables.completed_partitions(spark, result_path))
    assert len(done_first) == 2

    # resume: only the remaining partitions run
    ran_second = tables.run_resumable(spark, parts, result_path, lambda df: pipe.run(df))
    assert set(ran_second) == set(parts) - done_first
    assert set(tables.completed_partitions(spark, result_path)) == set(parts)

    # output complete & identical to an uninterrupted run
    got = spark.read.parquet(result_path)
    assert got.count() == sum(df.count() for df in parts.values())
    fresh_path = str(tmp_path / "fresh")
    tables.run_resumable(spark, parts, fresh_path, lambda df: pipe.run(df))
    fresh = spark.read.parquet(fresh_path)
    a = got.select("image_id", "keep", "bucket", "scrubbed_caption").orderBy("image_id").collect()
    b = fresh.select("image_id", "keep", "bucket", "scrubbed_caption").orderBy("image_id").collect()
    assert a == b

    # sidecar metrics add up
    sidecar = spark.read.parquet(tables.sidecar_path(result_path))
    assert sidecar.count() == len(parts)
    tot = sidecar.agg(F.sum("n_in"), F.sum("n_kept") + F.sum("n_dropped")).collect()[0]
    assert tot[0] == tot[1] == got.count()


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    out = str(tmp_path / "bybucket")
    cutoffs = load_cutoffs_dict()
    res = Pipeline(spark, Config(cutoffs=cutoffs)).run(generate_pairs(spark, 400))
    res = res.withColumn("lang", F.coalesce("lang", F.lit("__null__")))
    tables.write_result(res, out)
    one = tables.read_partition(spark, out, "en", "head")
    rows = one.select("lang", "bucket").distinct().collect()
    assert len(rows) == 1 and rows[0]["lang"] == "en" and rows[0]["bucket"] == "head"
    # pruning is visible in the physical plan (no full-scan of other partitions)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() < res.count()
    assert tables.read_all(spark, out).count() == res.count()


def test_rollup_matches_manual(spark):
    cutoffs = load_cutoffs_dict()
    res = Pipeline(spark, Config(cutoffs=cutoffs)).run(generate_pairs(spark, 300))
    roll = bucket_rollup(res).toPandas()
    assert roll["count"].sum() == 300
    en_head = roll[(roll.lang == "en") & (roll.bucket == "head")]
    manual = res.where((F.col("lang") == "en") & (F.col("bucket") == "head")).count()
    assert int(en_head["count"].iloc[0]) == manual


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    import shutil

    from ccnet_spark_spark.streaming.events import run_stream_to_memory, windowed_event_counts

    ev_dir = str(tmp_path / "events_src")
    os.makedirs(ev_dir)
    shutil.copy("/root/testdata/sf0.001/events.parquet", ev_dir)
    batch = spark.read.parquet(ev_dir)
    expected = windowed_event_counts(batch).count()

    stream = spark.readStream.schema(batch.schema).parquet(ev_dir)
    agg = windowed_event_counts(stream)
    run_stream_to_memory(agg, "win_counts")
    got = spark.sql("select * from win_counts").count()
    # append mode emits only watermark-closed windows; all but the last
    # window(s) must be present
    assert got >= expected - 3 and got <= expected


def test_streaming_pairs_scrub(spark, tmp_path):
    from ccnet_spark_spark.schema import PAIRS_SCHEMA
    from ccnet_spark_spark.streaming.events import run_stream_to_memory, stream_pairs_scrub

    src = str(tmp_path / "stream_src")
    generate_pairs(spark, 150).write.parquet(src)
    out = stream_pairs_scrub(spark, src, PAIRS_SCHEMA, str(tmp_path / "ckpt"))
    run_stream_to_memory(out, "scrubbed_pairs")
    pdf = spark.sql("select * from scrubbed_pairs").toPandas()
    assert len(pdf) == 150
    assert "scrubbed_caption" in pdf.columns and "too_short" in pdf.columns
    assert "@example" not in "\n".join(pdf["scrubbed_caption"])


def test_iceberg_path_gated(spark):
    """Without the runtime jar the Iceberg writers refuse loudly (callers
    fall back to parquet); with it they run — this sandbox has no jar."""
    import pytest

    from ccnet_spark_spark.session import iceberg_configured
    from ccnet_spark_spark.sources import tables
    from ccnet_spark_spark.synth import generate_pairs

    if iceberg_configured():
        pytest.skip("iceberg jar present; covered by the real path")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        tables.write_result_iceberg(generate_pairs(spark, 5))
    with pytest.raises(RuntimeError):
        tables.read_iceberg(spark)


def test_iceberg_partition_spec_construction(spark):
    """The jar is only needed at createOrReplace; the partition spec
    (identity(lang), identity(bucket), bucket(64, image_id)) and the
    DataFrameWriterV2 chain itself must build without it — this pins the
    production writer's plumbing even though the final call is gated."""
    from pyspark.sql import functions as F

    from ccnet_spark_spark.sources import tables
    from ccnet_spark_spark.synth import generate_pairs

    parts = tables.iceberg_partition_transforms(("lang", "bucket"), (64, "image_id"))
    specs = [str(c) for c in parts]
    assert len(specs) == 3
    assert "lang" in specs[0] and "bucket" in specs[1]
    assert "bucket(64, image_id)" in specs[2].replace("'", "")
    # the writer chain builds fine; only execution needs the jar
    df = generate_pairs(spark, 3).withColumn("bucket", F.lit("head")).withColumn("lang", F.lit("en"))
    writer = df.writeTo("local.db.pairs_result").using("iceberg").partitionedBy(*parts)
    assert writer is not None


def test_watermark_drops_late_events(spark, tmp_path):
    """An event older than the watermark arriving in a LATER micro-batch
    must be discarded: the already-emitted window's count may not change,
    and the late row may not spawn a duplicate window row (append mode)."""
    from ccnet_spark_spark.streaming.events import windowed_event_counts

    src = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    sink = str(tmp_path / "wm_sink")
    os.makedirs(src)

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).parquet(src)
        q = (
            windowed_event_counts(stream, window="5 minutes", watermark="10 minutes")
            .selectExpr("window.start as window_start", "event_type", "n", "total_value")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.parquet(sink).toPandas()

    def write_batch(rows):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        ).coalesce(1).write.mode("append").parquet(src)

    import datetime as dt

    t = lambda m: dt.datetime(2026, 1, 1, 10, m)  # noqa: E731
    # window A = [10:00, 10:05); the 10:30 event advances the watermark to
    # 10:20, closing A -> emitted with n=2
    write_batch([(1, t(0), "click", 1.0), (2, t(2), "click", 1.0), (3, t(30), "click", 1.0)])
    got1 = run_once()
    a1 = got1[got1["window_start"] == t(0)]
    assert len(a1) == 1 and int(a1["n"].iloc[0]) == 2

    # batch 2: a LATE event for window A (10:01 << watermark 10:20) must be
    # dropped; the 11:00 event closes the 10:30 window
    write_batch([(4, t(1), "click", 99.0), (5, dt.datetime(2026, 1, 1, 11, 0), "click", 1.0)])
    got2 = run_once()
    a2 = got2[got2["window_start"] == t(0)]
    assert len(a2) == 1 and int(a2["n"].iloc[0]) == 2  # unchanged, no dup row
    assert float(a2["total_value"].iloc[0]) == 2.0  # late value NOT added
    b = got2[got2["window_start"] == t(30)]
    assert len(b) == 1 and int(b["n"].iloc[0]) == 1
