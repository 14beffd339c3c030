"""Checked-in oracle fixtures must stay in sync with their generators.

The fixture parquets (fixtures/*.parquet, built by tools/make_fixtures.py)
are referenced from oracle_sql() via read_parquet — if synth.py, the
codecs spec, or the driver testdata drift, the fixtures go stale and the
driver gate fails far from the cause. These tests regenerate a SAMPLE of
each fixture in-memory and compare against the committed file, failing
with a pointer to rerun make_fixtures.py. (No Spark needed — fixtures are
pandas-built by design.)
"""

import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "fixtures")
sys.path.insert(0, os.path.join(REPO, "tools"))

import make_fixtures as mf  # noqa: E402

STALE = "stale fixture — rerun `python tools/make_fixtures.py` and commit"


def test_pairs_input_fixture_fresh():
    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(FIX, "pairs400_input.parquet"))
    assert len(disk) == 400, STALE
    regen = gen_pandas(0, 25)[["image_id", "caption"]]
    pd.testing.assert_frame_equal(disk.head(25), regen, obj=STALE)


def test_image_stats_fixture_fresh():
    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(FIX, "image_stats200_expected.parquet"))
    assert len(disk) == 200, STALE
    src = gen_pandas(0, 10)
    for i, r in enumerate(src.itertuples()):
        px = mf._decode_independent(bytes(r.bytes))
        assert disk.loc[i, "image_id"] == r.image_id, STALE
        assert disk.loc[i, "phash_check"] == mf._ahash_independent(px), STALE
        assert disk.loc[i, "brightness"] == px.reshape(-1, 3).mean(axis=0).mean(), STALE


def test_simhash_fixture_fresh():
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata absent")
    disk = pd.read_parquet(os.path.join(FIX, "simhash_expected_sf0.01.parquet"))
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]).head(10)
    by_id = dict(zip(disk["doc_id"], disk["simhash"]))
    for r in docs.itertuples():
        assert by_id[r.doc_id] == mf._simhash_independent(r.text.split()), STALE
    # planted rows present: exact dups (+100000) share the original's hash
    assert by_id[100000 + int(docs["doc_id"].iloc[0])] == by_id[int(docs["doc_id"].iloc[0])], STALE


def test_independent_simhash_matches_engine():
    """The two implementations (engine numpy vs fixture pure-int) are
    INDEPENDENT code paths for the same spec — they must agree."""
    from ccnet_spark_spark.functions.hashing import simhash64

    for toks in ([], ["a"], "the quick brown fox".split(), ["é", "中文", "x" * 50]):
        assert mf._simhash_independent(toks) == simhash64(toks)


def test_keepdrop_labels_fixture_fresh():
    """Labels fixture = pandas-oracle keep column over the pairs corpus;
    regenerate the first 60 pairs and compare (enough to cover keeps AND
    drops: too_short rows appear well inside the first 60)."""
    from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
    from ccnet_spark_spark.synth import gen_pandas
    from tests.oracle_pandas import run_oracle

    disk = pd.read_parquet(os.path.join(FIX, "pairs400_expected_labels.parquet"))
    assert len(disk) == 400, STALE
    assert 0 < disk.keep_expected.sum() < 400, STALE  # both classes present
    pairs = gen_pandas(0, 60)[["image_id", "caption"]]
    regen = run_oracle(pairs, cutoffs=load_cutoffs_dict())
    by_id = dict(zip(disk["image_id"], disk["keep_expected"]))
    for r in regen.itertuples():
        assert by_id[r.image_id] == r.keep, STALE


def test_pairs_phash_fixture_fresh():
    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(FIX, "pairs400_phash.parquet"))
    assert len(disk) == 400, STALE
    regen = gen_pandas(0, 25)[["image_id", "phash"]]
    pd.testing.assert_frame_equal(disk.head(25), regen, obj=STALE)


def test_source_format_fixtures_fresh():
    """JSONL/CSV/ORC re-encodings must match the driver's parquet (pandas
    read-back of each equals the original)."""
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata absent")
    orig = pd.read_parquet(os.path.join(sf_dir, "documents.parquet")).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    js = pd.read_json(os.path.join(FIX, "documents_sf001.jsonl"), lines=True)
    pd.testing.assert_frame_equal(js, orig, obj=STALE)
    cs = pd.read_csv(os.path.join(FIX, "documents_sf001.csv"))
    pd.testing.assert_frame_equal(cs, orig, obj=STALE)
    import pyarrow.orc

    orc = pyarrow.orc.read_table(os.path.join(FIX, "documents_sf001.orc")).to_pandas()
    pd.testing.assert_frame_equal(orc, orig, obj=STALE)


def test_multimodal_fixtures_fresh():
    """frame/audio expected tables must track the shared input generators
    (spot-check a few ids through the INDEPENDENT recompute paths)."""
    import importlib

    disk_f = pd.read_parquet(os.path.join(FIX, "frame_sample_expected.parquet"))
    assert len(disk_f) == 180, STALE
    disk_a = pd.read_parquet(os.path.join(FIX, "audio_stats_expected.parquet"))
    assert len(disk_a) == 100, STALE
    mf2 = importlib.import_module("make_fixtures")
    import hashlib, re
    from ccnet_spark_spark.synth import gen_audio_row, gen_video_row

    v = gen_video_row(3, 6)
    m = re.match(rb"^P6 (\d+) (\d+) 255\n", v["bytes"])
    w, h = int(m.group(1)), int(m.group(2))
    first = v["bytes"][: m.end() + w * h * 3]
    row = disk_f[(disk_f.video_id == v["video_id"]) & (disk_f.frame_idx == 0)].iloc[0]
    assert row["frame_sha"] == hashlib.sha256(first).hexdigest(), STALE

    a = gen_audio_row(7)
    row = disk_a[disk_a.audio_id == a["audio_id"]].iloc[0]
    assert row["n_samples"] * 2 == len(a["bytes"]), STALE


def test_image_embedding_fixture_fresh():
    """Embedding fixture must track the independent decoder + the embed
    spec (8x8 gray downsample -> float32 L2 normalize): spot-check rows,
    including a planted _dup copy sharing its source's embedding."""
    import numpy as np

    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(FIX, "image_embed200_expected.parquet"))
    assert len(disk) == 210, STALE
    src = gen_pandas(0, 3)
    d = disk.set_index("image_id")
    for r in src.itertuples():
        px = mf._decode_independent(bytes(r.bytes)).astype(np.float32)
        gray = px.mean(axis=2)
        ys = (np.arange(8) * gray.shape[0] // 8).clip(0, gray.shape[0] - 1)
        xs = (np.arange(8) * gray.shape[1] // 8).clip(0, gray.shape[1] - 1)
        v = gray[np.ix_(ys, xs)].flatten()[:64]
        if len(v) < 64:
            v = np.pad(v, (0, 64 - len(v)))
        nrm = float(np.linalg.norm(v)) or 1.0
        want = (v / nrm).astype(np.float32).tolist()
        assert list(d.loc[r.image_id, "embedding"]) == want, STALE
        assert list(d.loc[r.image_id + "_dup", "embedding"]) == want, STALE


def test_bpe_fixture_fresh():
    """BPE fixtures must track the documents tables: first merges re-derived
    by a third, in-test pair count over the raw corpus."""
    import re
    from collections import Counter

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("no sf0.01 testdata")
    merges = pd.read_parquet(os.path.join(FIX, "bpe_merges_sf0.01.parquet"))
    assert len(merges) == 16, STALE
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))["text"]
    vocab = Counter()
    for t in docs:
        for w in re.split(r"\s+", str(t).strip().lower()):
            if w:
                vocab[w] += 1
    pc = Counter()
    for w, f in vocab.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += f
    (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    r0 = merges.iloc[0]
    assert (r0["left"], r0["right"], int(r0["pair_count"])) == (a, b, cnt), STALE
    vdisk = pd.read_parquet(os.path.join(FIX, "bpe_vocab_sf0.01.parquet"))
    assert set(vdisk["word"]) == set(vocab), STALE


def test_payload_sha_fixture_fresh():
    import hashlib

    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(FIX, "pairs300_payload_sha.parquet"))
    assert len(disk) == 300, STALE
    regen = gen_pandas(0, 10)
    expect = [hashlib.sha256(bytes(b)).hexdigest() for b in regen["bytes"]]
    assert list(disk.head(10).payload_sha) == expect, STALE


def test_aspect_resize_fixture_fresh():
    import hashlib
    from fractions import Fraction

    import numpy as np

    from ccnet_spark_spark.operators.aspect import BUCKETS
    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(FIX, "aspect_resize200_expected.parquet"))
    assert len(disk) == 200, STALE
    src = gen_pandas(0, 8)
    for i, r in enumerate(src.itertuples()):
        px = mf._decode_independent(bytes(r.bytes))
        h, w = px.shape[0], px.shape[1]
        _, bid, bw, bh = min(
            (abs(Fraction(w, h) - Fraction(tw, th)), j, tw, th) for j, tw, th in BUCKETS
        )
        tw, th = bw // 32, bh // 32
        ys = np.minimum(np.arange(th) * h // th, h - 1)
        xs = np.minimum(np.arange(tw) * w // tw, w - 1)
        sha = hashlib.sha256(mf._encode_ppm_independent(px[np.ix_(ys, xs)])).hexdigest()
        assert disk.loc[i, "image_id"] == r.image_id, STALE
        assert int(disk.loc[i, "bucket_id"]) == bid, STALE
        assert (int(disk.loc[i, "w"]), int(disk.loc[i, "h"])) == (tw, th), STALE
        assert disk.loc[i, "payload_sha"] == sha, STALE
