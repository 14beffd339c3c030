"""Aspect-ratio bucketing + batch packing (operators/aspect.py)."""

import pytest
from pyspark.sql import functions as F

from ccnet_spark_spark.operators.aspect import (
    BUCKETS,
    _MULT,
    aspect_bucket,
    pack_batches,
)


def _expected_bucket(w: int, h: int) -> tuple[int, int, int]:
    # independent python argmin over exact Fractions
    from fractions import Fraction

    best = min(
        (abs(Fraction(w, h) - Fraction(bw, bh)), bid, bw, bh) for bid, bw, bh in BUCKETS
    )
    return best[1], best[2], best[3]


def test_integer_keys_match_fraction_argmin(spark):
    """The cross-multiplied int64 keys pick the same bucket as exact
    rational arithmetic for every dim pair in a dense sweep."""
    dims = [(w, h) for w in range(1, 80, 3) for h in range(1, 80, 7)]
    df = spark.createDataFrame(dims, "w int, h int").withColumn(
        "image_id", F.concat(F.lit("i"), F.col("w"), F.lit("x"), F.col("h"))
    )
    got = {
        (r["w"], r["h"]): (r["bucket_id"], r["target_w"], r["target_h"])
        for r in aspect_bucket(df).collect()
    }
    for w, h in dims:
        assert got[(w, h)] == _expected_bucket(w, h), (w, h)


def test_key_headroom_at_large_dims():
    """int64 never overflows for dims up to 10^5 px (the docstring's claim)."""
    max_key = max(
        abs(10**5 * bh - 10**5 * bw) * _MULT[bid] for bid, bw, bh in BUCKETS
    )
    assert max_key < 2**62


def test_square_and_extremes(spark):
    df = spark.createDataFrame(
        [("sq", 512, 512), ("tall", 100, 1000), ("wide", 4000, 1000)],
        "image_id string, w int, h int",
    )
    out = {r["image_id"]: r["bucket_id"] for r in aspect_bucket(df).collect()}
    assert out["sq"] == 4  # 1:1
    assert out["tall"] == 0  # most-portrait bucket
    assert out["wide"] == 8  # most-landscape bucket


def test_bad_dims_null_bucket_and_batch(spark):
    df = spark.createDataFrame(
        [("ok", 32, 32), ("z", 0, 32), ("n", None, 32)], "image_id string, w int, h int"
    )
    out = {r["image_id"]: r for r in pack_batches(aspect_bucket(df)).collect()}
    assert out["ok"]["bucket_id"] is not None and out["ok"]["batch_id"] == 0
    for bad in ("z", "n"):
        assert out[bad]["bucket_id"] is None
        assert out[bad]["batch_id"] is None


def test_pack_unsharded_contiguous(spark):
    """Unsharded: ids pack contiguously per bucket, ceil(n/b) batches, only
    the last ragged."""
    rows = [("a%03d" % i, 512, 512) for i in range(10)] + [
        ("b%03d" % i, 100, 1000) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = pack_batches(aspect_bucket(df), batch_size=4).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket_id"], []).append((r["image_id"], r["batch_id"]))
    sq = sorted(by_bucket[4])
    assert [b for _, b in sq] == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    assert [b for _, b in sorted(by_bucket[0])] == [0, 0, 0]


def test_pack_sharded_deterministic_and_bounded(spark):
    """Sharded mode: same output on repeated runs and under repartition
    (pure function of the row set); per-(bucket, shard) batches are full
    except at most one ragged; shard recoverable from batch_id."""
    rows = [("img%04d" % i, 512, 512) for i in range(200)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    a = pack_batches(aspect_bucket(df), batch_size=8, shards=4)
    b = pack_batches(aspect_bucket(df.repartition(7)), batch_size=8, shards=4)
    ra = sorted((r["image_id"], r["batch_id"]) for r in a.collect())
    rb = sorted((r["image_id"], r["batch_id"]) for r in b.collect())
    assert ra == rb
    sizes = {}
    for _, bid in ra:
        sizes[bid] = sizes.get(bid, 0) + 1
    for bid, n in sizes.items():
        assert n <= 8
    # within each shard, every batch except the highest-numbered is full
    per_shard = {}
    for bid in sizes:
        per_shard.setdefault(bid >> 40, []).append(bid)
    assert set(per_shard) <= {0, 1, 2, 3}
    for shard, bids in per_shard.items():
        for bid in bids:
            if bid != max(bids):
                assert sizes[bid] == 8, (shard, bid, sizes[bid])


def test_pack_batches_validates_args(spark):
    df = spark.createDataFrame([("a", 1, 1)], "image_id string, w int, h int")
    with pytest.raises(ValueError, match="batch_size"):
        pack_batches(aspect_bucket(df), batch_size=0)
    with pytest.raises(ValueError, match="shards"):
        pack_batches(aspect_bucket(df), shards=0)


def test_bucket_assignment_is_scan_side(spark):
    """Bucket assignment adds no exchange: the plan for aspect_bucket over
    a parquet-free in-memory scan contains zero Exchange nodes."""
    df = spark.createDataFrame([("a", 32, 16)], "image_id string, w int, h int")
    plan = aspect_bucket(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_to_bucket_targets(spark):
    """resize_to honors per-row targets (rectangular), drops NULL-target
    rows, and payloads re-decode to the target shape."""
    from ccnet_spark_spark import codecs
    from ccnet_spark_spark.operators.multimodal import resize_to
    from ccnet_spark_spark.synth import generate_pairs

    pairs = aspect_bucket(generate_pairs(spark, 12))
    scaled = pairs.withColumn("target_w", (F.col("target_w") / 32).cast("int")).withColumn(
        "target_h", (F.col("target_h") / 32).cast("int")
    )
    out = resize_to(scaled).collect()
    assert len(out) == 12
    want = {(r["image_id"]): (r["target_w"], r["target_h"]) for r in scaled.collect()}
    for r in out:
        tw, th = want[r["image_id"]]
        assert (r["w"], r["h"], r["fmt"]) == (tw, th, "ppm")
        px = codecs.decode(bytes(r["bytes"]), "ppm")
        assert px.shape == (th, tw, 3)


def test_resize_to_drops_null_targets(spark):
    from ccnet_spark_spark.operators.multimodal import resize_to
    from ccnet_spark_spark.synth import generate_pairs

    pairs = generate_pairs(spark, 3).withColumns(
        {
            "target_w": F.when(F.col("image_id") != "img0000000000", F.lit(8)),
            "target_h": F.when(F.col("image_id") != "img0000000000", F.lit(16)),
        }
    )
    out = resize_to(pairs).collect()
    assert sorted(r["image_id"] for r in out) == ["img0000000001", "img0000000002"]
