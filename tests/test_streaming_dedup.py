"""Cross-micro-batch stateful streaming dedup: state must persist across a
stream restart through the checkpoint."""

import os

from ccnet_spark_spark.streaming.dedup import streaming_exact_dedup


def _run_once(spark, src, ckpt, sink):
    stream = spark.readStream.schema("image_id string, caption string").parquet(src)
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(sink).toPandas()


def test_stateful_dedup_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    batch1 = spark.createDataFrame(
        [("a", "THE QUICK fox"), ("b", "the quick fox!"), ("c", "something else entirely")],
        ["image_id", "caption"],
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    sink = str(tmp_path / "sink")
    got1 = _run_once(spark, src, ckpt, sink)
    # b normalizes to the same line as a -> within-batch dedup keeps one
    assert len(got1) == 2
    assert set(got1["hash_value"]) == {h for h in got1["hash_value"]}

    # second micro-batch: duplicate of batch1 + one new caption
    batch2 = spark.createDataFrame(
        [("d", "the quick fox"), ("e", "a brand new caption here")],
        ["image_id", "caption"],
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    all_out = _run_once(spark, src, ckpt, sink)
    got2 = all_out[~all_out["image_id"].isin(got1["image_id"])]
    # state recovered from checkpoint: 'the quick fox' already seen -> only e
    assert list(got2["image_id"]) == ["e"]


def test_state_ttl_evicts_and_reemits(spark, tmp_path):
    """The bounded-state knob: with a tiny TTL, a hash seen long ago is
    evicted and its next occurrence is emitted again (approximate beyond
    the TTL horizon, by design); within the TTL it still dedups.

    Uses a live processingTime trigger and POLLS the sink: with
    ProcessingTimeTimeout configured, the stream legitimately runs a batch
    every trigger tick to check timeout clocks, so processAllAvailable()
    never observes quiescence (and an availableNow query never terminates)
    — both would hang forever."""
    import time

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    def wait_rows(n, timeout_s=90):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            try:
                pdf = spark.read.parquet(sink).toPandas()
                if len(pdf) >= n:
                    return pdf
            except Exception:
                pass  # sink dir not created yet
            time.sleep(1)
        raise AssertionError(f"sink never reached {n} rows")

    spark.createDataFrame(
        [("a", "caption one"), ("b", "caption one"), ("c", "caption two")],
        ["image_id", "caption"],
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("image_id string, caption string").parquet(src)
    q = (
        streaming_exact_dedup(stream, ttl_ms=500)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        got1 = wait_rows(2)
        assert len(got1) == 2  # within-batch dedup still exact

        # several trigger ticks pass with no data for these keys -> the
        # 500ms timeouts fire and state is evicted (generous margin for
        # bursty-host stalls)
        time.sleep(5)
        spark.createDataFrame(
            [("d", "caption one"), ("e", "caption two"), ("f", "caption three")],
            ["image_id", "caption"],
        ).coalesce(1).write.mode("append").parquet(src)
        all_out = wait_rows(5)
    finally:
        q.stop()
    new = all_out[all_out["image_id"].isin(["d", "e", "f"])]
    # state for both old hashes expired -> d and e re-emitted; f is new
    assert sorted(new["image_id"]) == ["d", "e", "f"]
