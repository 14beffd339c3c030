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
