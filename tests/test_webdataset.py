"""WebDataset tar-shard sink (sources/webdataset.py)."""

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from ccnet_spark_spark.sources.webdataset import assign_shards, write_webdataset
from ccnet_spark_spark.synth import generate_pairs


def test_assign_shards_budget_bound(spark):
    """Contiguous packing: every shard's byte total stays within budget +
    one payload (the prefix-sum guarantee), shard ids are dense from 0."""
    pairs = generate_pairs(spark, 120)
    out = assign_shards(pairs, budget_bytes=32_768).select("image_id", "n_bytes", "shard_id")
    rows = out.collect()
    totals, max_item = {}, max(r["n_bytes"] for r in rows)
    for r in rows:
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["n_bytes"]
    assert sorted(totals) == list(range(len(totals)))
    for sid, tot in totals.items():
        assert tot <= 32_768 + max_item, (sid, tot)


def test_assign_shards_substreams_deterministic(spark):
    """Substream mode is a pure function of the row set: identical under
    repartition; stream recoverable from shard_id."""
    pairs = generate_pairs(spark, 150)
    a = assign_shards(pairs, budget_bytes=32_768, substreams=4)
    b = assign_shards(pairs.repartition(7), budget_bytes=32_768, substreams=4)
    ra = sorted((r["image_id"], r["shard_id"]) for r in a.collect())
    rb = sorted((r["image_id"], r["shard_id"]) for r in b.collect())
    assert ra == rb
    assert {sid >> 40 for _, sid in ra} <= {0, 1, 2, 3}


def test_assign_shards_validates(spark):
    pairs = generate_pairs(spark, 5)
    with pytest.raises(ValueError, match="budget_bytes"):
        assign_shards(pairs, 0)
    with pytest.raises(ValueError, match="substreams"):
        assign_shards(pairs, 100, substreams=0)


def test_write_webdataset_roundtrip(spark, tmp_path):
    """Tars on disk reconstruct the exact corpus: payload bytes, captions,
    webdataset <key>.<ext> naming; manifest matches the files."""
    pairs = generate_pairs(spark, 60)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(pairs, out, budget_bytes=65_536).collect()
    src = {
        r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["caption"])
        for r in pairs.select("image_id", "bytes", "fmt", "caption").collect()
    }
    seen = {}
    for m in manifest:
        assert os.path.basename(m["tar_path"]) == f"shard-{m['shard_id']:012x}.tar"
        with open(m["tar_path"], "rb") as f:
            blob = f.read()
        assert hashlib.sha256(blob).hexdigest() == m["tar_sha256"]
        with tarfile.open(m["tar_path"]) as tar:
            names = tar.getnames()
            payloads = [n for n in names if not n.endswith(".txt")]
            assert m["n_items"] == len(payloads)
            for n in payloads:
                key, ext = n.rsplit(".", 1)
                data = tar.extractfile(n).read()
                cap_member = f"{key}.txt"
                cap = (
                    tar.extractfile(cap_member).read().decode("utf-8")
                    if cap_member in names
                    else None
                )
                seen[key] = (data, ext, cap)
    assert seen == src


def test_write_webdataset_deterministic(spark, tmp_path):
    """Two independent writes produce byte-identical shards (retry /
    re-run safety)."""
    pairs = generate_pairs(spark, 40)
    m1 = {
        r["shard_id"]: r["tar_sha256"]
        for r in write_webdataset(pairs, str(tmp_path / "a"), 65_536).collect()
    }
    m2 = {
        r["shard_id"]: r["tar_sha256"]
        for r in write_webdataset(pairs, str(tmp_path / "b"), 65_536).collect()
    }
    assert m1 == m2


def test_write_webdataset_null_caption_omitted(spark, tmp_path):
    """NULL captions write no .txt member (webdataset's missing-field
    convention) instead of crashing or writing 'None'."""
    pairs = generate_pairs(spark, 2).withColumn("caption", F.lit(None).cast("string"))
    manifest = write_webdataset(pairs, str(tmp_path / "n"), 65_536).collect()
    for m in manifest:
        with tarfile.open(m["tar_path"]) as tar:
            assert all(not n.endswith(".txt") for n in tar.getnames())
