"""Generate the checked-in oracle fixture parquets (run once; commit output).

The driver's DuckDB oracle runs arbitrary SQL strings, so a fixture parquet
referenced via read_parquet('<abs path>') lets us oracle-check operators
whose math DuckDB cannot reproduce natively (VERDICT r2 #2/#4):

- pairs400_input.parquet — the deterministic 400-row image+caption INPUT
  table (pandas twin of synth.generate_pairs; gen_row is a pure function of
  (i, seed)). The pairs_pipeline oracle is the full composed SQL twin over
  this input — a genuine end-to-end check of the engine's NATIVE input path.
- image_stats200_expected.parquet — expected decode+stats output for 200
  pairs, computed by an INDEPENDENT re-implementation of the ppm/qjpg
  decoders and the average-hash (not the ccnet_spark_spark.codecs code the
  engine ships), so engine and oracle share only the format spec.
- simhash_expected_<sf>.parquet — (doc_id, simhash) over each sf's
  documents table PLUS the planted exact/near duplicate rows the
  simhash_neardup contract query unions in, computed by an INDEPENDENT
  pure-int re-implementation of the 64-bit blake2b SimHash (no numpy
  unpackbits). Lets DuckDB verify both the simhash values and the
  bucket+hamming near-dup pairs via its own xor/bit_count.

Usage: python tools/make_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures")

# planted-corpus constants shared with __spark_entry__.q_simhash_neardup
SIMHASH_PLANT_N = 20
SIMHASH_NEAR_SUFFIX = " extra trailing piece"


def make_pairs_input(n: int = 400) -> None:
    from ccnet_spark_spark.synth import gen_pandas

    df = gen_pandas(0, n)[["image_id", "caption"]]
    df.to_parquet(os.path.join(FIXTURES, "pairs400_input.parquet"), index=False)
    print(f"pairs400_input.parquet: {len(df)} rows")


def make_pairs_phash(n: int = 400) -> None:
    """(image_id, phash) for the 400-pair corpus — the q_phash_neardup
    oracle rebuilds the planted near-dup construction and the
    bucket/hamming math in DuckDB over these int64 values."""
    from ccnet_spark_spark.synth import gen_pandas

    df = gen_pandas(0, n)[["image_id", "phash"]]
    df.to_parquet(os.path.join(FIXTURES, "pairs400_phash.parquet"), index=False)
    print(f"pairs400_phash.parquet: {len(df)} rows")


def make_frame_sample_expected(n: int = 60, n_frames: int = 6, every_k: int = 2) -> None:
    """Expected frame-sampling output: the INPUT videos come from the shared
    pure generator (synth.gen_video_row), but the container is demuxed by an
    INDEPENDENT walker (regex header parse + manual offsets, not the
    engine's index/split code) — engine and oracle share only the P6 spec."""
    import hashlib
    import re

    from ccnet_spark_spark.synth import gen_video_row

    rows = []
    header_re = re.compile(rb"^P6 (\d+) (\d+) 255\n")
    for i in range(n):
        v = gen_video_row(i, n_frames)
        data, pos, idx = v["bytes"], 0, 0
        while pos < len(data):
            m = header_re.match(data[pos:])
            assert m, f"bad header in video {i} at {pos}"
            w, h = int(m.group(1)), int(m.group(2))
            end = pos + m.end() + w * h * 3
            if idx % every_k == 0:
                rows.append(
                    {
                        "video_id": v["video_id"],
                        "frame_idx": idx,
                        "frame_sha": hashlib.sha256(data[pos:end]).hexdigest(),
                        "w": w,
                        "h": h,
                    }
                )
            pos, idx = end, idx + 1
    out = pd.DataFrame(rows)
    out.to_parquet(os.path.join(FIXTURES, "frame_sample_expected.parquet"), index=False)
    print(f"frame_sample_expected.parquet: {len(out)} rows")


def make_audio_stats_expected(n: int = 100) -> None:
    """Expected audio stats via an INDEPENDENT PCM path: struct.iter_unpack
    + math (not the engine's numpy frombuffer/vector ops)."""
    import math
    import struct

    from ccnet_spark_spark.synth import gen_audio_row

    rows = []
    for i in range(n):
        a = gen_audio_row(i)
        samples = [s for (s,) in struct.iter_unpack("<h", a["bytes"])]
        sq = sum(float(s) * float(s) for s in samples)
        rows.append(
            {
                "audio_id": a["audio_id"],
                "n_samples": len(samples),
                "duration_ms": len(samples) * 1000 // a["sample_rate"],
                "rms": round(math.sqrt(sq / len(samples)), 4),
                "peak": max(abs(s) for s in samples),
            }
        )
    out = pd.DataFrame(rows)
    out["n_samples"] = out["n_samples"].astype("int64")
    out["duration_ms"] = out["duration_ms"].astype("int64")
    out["peak"] = out["peak"].astype("int32")
    out.to_parquet(os.path.join(FIXTURES, "audio_stats_expected.parquet"), index=False)
    print(f"audio_stats_expected.parquet: {len(out)} rows")


def make_source_formats(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """The sf0.01 documents table re-encoded as JSONL, CSV, and ORC —
    source-format breadth fixtures: the engine reads each with an explicit
    schema and must produce rows identical to the parquet original (the
    oracle is simply `select * from documents`)."""
    import pyarrow as pa
    import pyarrow.orc

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    docs.to_json(
        os.path.join(FIXTURES, "documents_sf001.jsonl"), orient="records", lines=True,
        force_ascii=True,
    )
    docs.to_csv(os.path.join(FIXTURES, "documents_sf001.csv"), index=False)
    pyarrow.orc.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(FIXTURES, "documents_sf001.orc"),
    )
    print(f"documents_sf001.{{jsonl,csv,orc}}: {len(docs)} rows each")


def make_pairs_payload_sha(n: int = 300) -> None:
    """(image_id, payload_sha) for q_image_exact_dedup: the digests come
    from python hashlib over the generator payloads — an implementation of
    SHA-256 independent of the JVM's, so the oracle genuinely cross-checks
    Spark's sha2(bytes, 256)."""
    import hashlib

    from ccnet_spark_spark.synth import gen_pandas

    df = gen_pandas(0, n)
    out = pd.DataFrame(
        {
            "image_id": df["image_id"],
            "payload_sha": [hashlib.sha256(bytes(b)).hexdigest() for b in df["bytes"]],
        }
    )
    out.to_parquet(os.path.join(FIXTURES, "pairs300_payload_sha.parquet"), index=False)
    print(f"pairs300_payload_sha.parquet: {len(out)} rows")


def make_pairs_meta(n: int = 400) -> None:
    """(image_id, w, h, fmt, n_bytes, caption) for the 400-pair corpus —
    the q_image_quality_gates oracle runs the SQL CASE-chain twin over
    this metadata (n_bytes stands in for length(bytes); the INPUT is
    shared like pairs400_input, the gate TRANSFORM is what the DuckDB
    twin re-expresses independently)."""
    from ccnet_spark_spark.synth import gen_pandas

    df = gen_pandas(0, n)
    df["n_bytes"] = df["bytes"].map(len)
    df = df[["image_id", "w", "h", "fmt", "n_bytes", "caption"]]
    df.to_parquet(os.path.join(FIXTURES, "pairs400_meta.parquet"), index=False)
    print(f"pairs400_meta.parquet: {len(df)} rows")


def make_keepdrop_labels(n: int = 400) -> None:
    """Expected keep/drop labels for the 400-pair corpus, computed by the
    single-node pandas oracle (tests/oracle_pandas.py — shares the stub
    model functions verbatim but re-derives ALL dataflow independently in
    plain Python loops). This is the 'reference labels' side of the north
    rule's F1 >= 0.99 criterion: q_keepdrop_f1 scores the Spark pipeline's
    keep column against this table."""
    from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
    from ccnet_spark_spark.synth import gen_pandas
    from tests.oracle_pandas import run_oracle

    pairs = gen_pandas(0, n)[["image_id", "caption"]]
    out = run_oracle(pairs, cutoffs=load_cutoffs_dict())
    lab = out[["image_id", "keep"]].rename(columns={"keep": "keep_expected"})
    lab = lab.sort_values("image_id").reset_index(drop=True)
    lab.to_parquet(os.path.join(FIXTURES, "pairs400_expected_labels.parquet"), index=False)
    print(f"pairs400_expected_labels.parquet: {len(lab)} rows, {int(lab.keep_expected.sum())} keeps")


# ---------------------------------------------------- independent image path
def _decode_independent(data: bytes) -> np.ndarray:
    """Re-implements the ppm/qjpg FORMAT SPEC (codecs.py module doc) without
    importing codecs: header = b'<magic> <w> <h> <maxv|step>\\n', body = raw
    HxWx3 bytes; qjpg reconstructs mid-bin values min(q*step + step//2, 255)."""
    nl = data.index(b"\n")
    fields = data[:nl].split()
    body = np.frombuffer(data[nl + 1 :], dtype=np.uint8)
    if fields[0] == b"P6":
        w, h = int(fields[1]), int(fields[2])
        return body.reshape(h, w, 3).astype(np.int64)
    if fields[0] == b"QJ":
        w, h, step = int(fields[1]), int(fields[2]), int(fields[3])
        q = body.reshape(h, w, 3).astype(np.int64)
        return np.minimum(q * step + step // 2, 255)
    raise ValueError(f"unknown magic {fields[0]!r}")


def _ahash_independent(px: np.ndarray) -> int:
    gray = px.mean(axis=2)
    out = 0
    for b in (gray > gray.mean()).flatten()[:64]:
        out = (out << 1) | int(b)
    if out >= 2**63:
        out -= 2**64
    return out


def _encode_ppm_independent(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return ("P6 %d %d 255\n" % (w, h)).encode() + px.astype(np.uint8).tobytes()


def make_image_resize_expected(n: int = 200, target: int = 16) -> None:
    """Expected output of operators/multimodal.resize: nearest-neighbor
    16x16 + lossless ppm re-encode. All-integer math, so the independent
    recompute is bit-exact and the payload is comparable by sha256."""
    from ccnet_spark_spark.synth import gen_pandas

    src = gen_pandas(0, n)
    rows = []
    for r in src.itertuples():
        px = _decode_independent(bytes(r.bytes))
        ys = np.minimum(np.arange(target) * px.shape[0] // target, px.shape[0] - 1)
        xs = np.minimum(np.arange(target) * px.shape[1] // target, px.shape[1] - 1)
        data = _encode_ppm_independent(px[np.ix_(ys, xs)])
        rows.append(
            {
                "image_id": r.image_id,
                "w": target,
                "h": target,
                "fmt": "ppm",
                "payload_sha": hashlib.sha256(data).hexdigest(),
            }
        )
    out = pd.DataFrame(rows).astype({"w": "int32", "h": "int32"})
    out.to_parquet(os.path.join(FIXTURES, "image_resize200_expected.parquet"), index=False)
    print(f"image_resize200_expected.parquet: {len(out)} rows")


def make_aspect_resize_expected(n: int = 200, divisor: int = 32) -> None:
    """Expected output of aspect_bucket -> resize_to at test scale: the
    nearest aspect bucket recomputed INDEPENDENTLY with exact Fractions
    (the engine uses cross-multiplied int64 keys — agreement IS the
    check), targets divided by `divisor` (every bucket dim is divisible
    by 32, keeping test payloads small), then the per-row-target
    nearest-neighbor resize + ppm re-encode — all-integer, sha256-exact."""
    from fractions import Fraction

    from ccnet_spark_spark.operators.aspect import BUCKETS
    from ccnet_spark_spark.synth import gen_pandas

    src = gen_pandas(0, n)
    rows = []
    for r in src.itertuples():
        px = _decode_independent(bytes(r.bytes))
        h, w = px.shape[0], px.shape[1]
        _, bid, bw, bh = min(
            (abs(Fraction(w, h) - Fraction(tw, th)), i, tw, th) for i, tw, th in BUCKETS
        )
        tw, th = bw // divisor, bh // divisor
        ys = np.minimum(np.arange(th) * h // th, h - 1)
        xs = np.minimum(np.arange(tw) * w // tw, w - 1)
        data = _encode_ppm_independent(px[np.ix_(ys, xs)])
        rows.append(
            {
                "image_id": r.image_id,
                "bucket_id": bid,
                "w": tw,
                "h": th,
                "fmt": "ppm",
                "payload_sha": hashlib.sha256(data).hexdigest(),
            }
        )
    out = pd.DataFrame(rows).astype({"bucket_id": "int32", "w": "int32", "h": "int32"})
    out.to_parquet(os.path.join(FIXTURES, "aspect_resize200_expected.parquet"), index=False)
    print(f"aspect_resize200_expected.parquet: {len(out)} rows")


def make_image_stats_expected(n: int = 200) -> None:
    from ccnet_spark_spark.synth import gen_pandas

    src = gen_pandas(0, n)
    rows = []
    for r in src.itertuples():
        px = _decode_independent(bytes(r.bytes))
        means = px.reshape(-1, 3).mean(axis=0)
        rows.append(
            {
                "image_id": r.image_id,
                "w": np.int32(px.shape[1]),
                "h": np.int32(px.shape[0]),
                "fmt": r.fmt,
                "mean_r": float(means[0]),
                "mean_g": float(means[1]),
                "mean_b": float(means[2]),
                "brightness": float(means.mean()),
                "phash_check": _ahash_independent(px),
            }
        )
    out = pd.DataFrame(rows).astype({"w": "int32", "h": "int32", "phash_check": "int64"})
    out.to_parquet(os.path.join(FIXTURES, "image_stats200_expected.parquet"), index=False)
    print(f"image_stats200_expected.parquet: {len(out)} rows")


# ------------------------------------------------------- independent simhash
def _simhash_independent(tokens: list[str]) -> int:
    """Pure-int twin of functions/hashing.simhash64: per token, blake2b-8
    digest bits MSB-first per byte; acc>0 -> set bit i (1 << i); wrap to
    signed int64. No numpy — independent code path, same spec."""
    acc = [0] * 64
    for t in tokens:
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
        for i in range(64):
            bit = (d[i // 8] >> (7 - (i % 8))) & 1
            acc[i] += 1 if bit else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    if out >= 2**63:
        out -= 2**64
    return out


def make_caption_embedding_expected(n: int = 200, dim: int = 64) -> None:
    """Expected caption embeddings for q_caption_alignment: an INDEPENDENT
    re-implementation of the hashed bag-of-words spec (dict accumulation +
    struct.unpack instead of the engine's numpy-indexed counts +
    int.from_bytes; the normalize line is the numpy op the spec fixes, so
    values are bit-identical like the image-embed fixture)."""
    import hashlib
    import struct

    from ccnet_spark_spark.synth import gen_pandas

    def embed(caption: str) -> list:
        acc: dict[int, float] = {}
        for tok in (caption or "").lower().split():
            (d,) = struct.unpack(">Q", hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest())
            acc[d % dim] = acc.get(d % dim, 0.0) + (1.0 if ((d >> 6) & 1) == 0 else -1.0)
        v = np.array([acc.get(i, 0.0) for i in range(dim)], dtype=np.float32)
        nrm = float(np.linalg.norm(v)) or 1.0
        return (v / nrm).astype(np.float32).tolist()

    pairs = gen_pandas(0, n)
    out = pd.DataFrame(
        [{"image_id": r["image_id"], "embedding": embed(r["caption"])} for _, r in pairs.iterrows()]
    )
    # zero vectors are LEGAL (whitespace-only captions): both engines map
    # them to NULL alignment (Spark NaN->NULL guard; DuckDB 0/0 -> NULL)
    out.to_parquet(os.path.join(FIXTURES, f"caption_embed{n}_expected.parquet"), index=False)
    print(f"caption_embed{n}_expected.parquet: {len(out)} rows")


def make_image_embedding_expected(n: int = 200, plant: int = 10, dim: int = 64) -> None:
    """Expected image embeddings for the decode->embed->LSH-near-dup chain
    (q_image_embed_neardup): the 200-pair corpus PLUS planted exact-payload
    copies ('<id>_dup') of the first `plant` images. Decode goes through the
    INDEPENDENT format-spec decoder above (not engine codecs); the embed
    arithmetic (8x8 grayscale downsample -> flatten -> float32 L2 normalize)
    follows the documented spec with the same numpy ops the spec fixes, so
    values are bit-identical and DuckDB can rebuild the LSH buckets and
    cosine pairs from these numbers alone."""
    from ccnet_spark_spark.synth import gen_pandas

    def embed(data: bytes) -> list:
        px = _decode_independent(bytes(data)).astype(np.float32)
        gray = px.mean(axis=2)
        ys = (np.arange(8) * gray.shape[0] // 8).clip(0, gray.shape[0] - 1)
        xs = (np.arange(8) * gray.shape[1] // 8).clip(0, gray.shape[1] - 1)
        v = gray[np.ix_(ys, xs)].flatten()[:dim]
        if len(v) < dim:
            v = np.pad(v, (0, dim - len(v)))
        nrm = float(np.linalg.norm(v)) or 1.0
        return (v / nrm).astype(np.float32).tolist()

    pairs = gen_pandas(0, n)
    rows = [
        {"image_id": r["image_id"], "embedding": embed(r["bytes"])} for _, r in pairs.iterrows()
    ]
    for _, r in pairs.head(plant).iterrows():
        rows.append({"image_id": r["image_id"] + "_dup", "embedding": embed(r["bytes"])})
    out = pd.DataFrame(rows)
    out.to_parquet(os.path.join(FIXTURES, f"image_embed{n}_expected.parquet"), index=False)
    print(f"image_embed{n}_expected.parquet: {len(out)} rows")


def make_image_entropy_expected(n: int = 200, plants: int = 10, flat_threshold: float = 1.0) -> None:
    """Expected output of multimodal.image_entropy over n generated pairs +
    `plants` SOLID 8x8 images (value 10*i+5) — decoded with the INDEPENDENT
    decoder; the entropy math is the shared spec (integer gray=(R+G+B)//3,
    256-bin bincount, float64 -(p*log2 p).sum over nonzero bins)."""
    from ccnet_spark_spark.synth import gen_pandas

    src = gen_pandas(0, n)
    payloads = [(r.image_id, bytes(r.bytes)) for r in src.itertuples()]
    for i in range(plants):
        px = np.full((8, 8, 3), 10 * i + 5, dtype=np.uint8)
        payloads.append((f"img_flat_{i:02d}", _encode_ppm_independent(px)))
    rows = []
    for image_id, data in payloads:
        px = _decode_independent(data)
        gray = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
        cnt = np.bincount(gray.reshape(-1), minlength=256)
        nz = cnt[cnt > 0]
        p = nz / nz.sum()
        ent = float(-(p * np.log2(p)).sum())
        rows.append(
            {
                "image_id": image_id,
                "entropy": ent,
                "n_gray": np.int32((cnt > 0).sum()),
                "flat": bool(ent < flat_threshold),
            }
        )
    out = pd.DataFrame(rows).astype({"n_gray": "int32"})
    out.to_parquet(os.path.join(FIXTURES, "image_entropy210_expected.parquet"), index=False)
    print(f"image_entropy210_expected.parquet: {len(out)} rows, {int(out.flat.sum())} flat")


def make_bpe_expected(
    sf_dir: str, num_merges: int = 16, batch_size: int = 1, suffix: str = ""
) -> None:
    """Expected BPE trainer output per sf — an INDEPENDENT pure-Python BPE
    (Counter over symbol tuples, explicit merge loop): same spec as
    operators/bpe.py (freq-weighted pair counts, winner = max count then
    lexical pair, leftmost-greedy merge) but sharing no dataflow with the
    Spark implementation. batch_size > 1 implements the trainer's BATCHED
    schedule: per round sort pairs by (count desc, left, right), truncate
    to the candidate window max(64, 8*batch_size), greedily select up to
    batch_size pairs whose {left, right, merged} collide with no
    already-selected pair's, apply in selection order (batch_size=1 is
    classic BPE). Writes bpe_merges<suffix>_<sf>.parquet and
    bpe_vocab<suffix>_<sf>.parquet."""
    import re
    from collections import Counter

    candidate_window = max(64, 8 * batch_size)
    sfname = os.path.basename(sf_dir.rstrip("/"))
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))["text"]
    vocab = Counter()
    for t in docs:
        for w in re.split(r"\s+", str(t).strip().lower()):
            if w:
                vocab[w] += 1
    words = {w: tuple(w) for w in vocab}
    merges = []
    while len(merges) < num_merges:
        pc = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        ordered = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[
            :candidate_window
        ]
        batch, used = [], set()
        for (a, b), cnt in ordered:
            if len(batch) >= min(batch_size, num_merges - len(merges)):
                break
            if a in used or b in used or (a + b) in used:
                continue
            batch.append((a, b, cnt))
            used.update((a, b, a + b))
        for a, b, cnt in batch:
            merges.append(
                {"rank": len(merges), "left": a, "right": b, "merged": a + b, "pair_count": cnt}
            )
            new_words = {}
            for w, syms in words.items():
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                new_words[w] = tuple(res)
            words = new_words
    m = pd.DataFrame(merges)
    m["rank"] = m["rank"].astype("int32")
    m.to_parquet(os.path.join(FIXTURES, f"bpe_merges{suffix}_{sfname}.parquet"), index=False)
    v = pd.DataFrame(
        [{"word": w, "symbols": " ".join(words[w]), "freq": vocab[w]} for w in sorted(words)]
    )
    v.to_parquet(os.path.join(FIXTURES, f"bpe_vocab{suffix}_{sfname}.parquet"), index=False)
    print(f"bpe_merges/vocab{suffix}_{sfname}.parquet: {len(m)} merges, {len(v)} words")


def make_simhash_expected(sf_dir: str) -> None:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    planted = docs[docs["doc_id"] < SIMHASH_PLANT_N]
    corpus = pd.concat(
        [
            docs,
            planted.assign(doc_id=planted["doc_id"] + 100000),  # exact dups
            planted.assign(
                doc_id=planted["doc_id"] + 200000,
                text=planted["text"] + SIMHASH_NEAR_SUFFIX,  # near dups
            ),
        ],
        ignore_index=True,
    )
    out = pd.DataFrame(
        {
            "doc_id": corpus["doc_id"].astype("int64"),
            "simhash": [_simhash_independent((t or "").split()) for t in corpus["text"]],
        }
    ).astype({"simhash": "int64"})
    name = f"simhash_expected_{os.path.basename(sf_dir.rstrip('/'))}.parquet"
    out.to_parquet(os.path.join(FIXTURES, name), index=False)
    print(f"{name}: {len(out)} rows")


def _validate_independent(data: bytes, fmt: str, w: int, h: int) -> str:
    """Spec-level payload validator (reason ladder documented at
    operators/multimodal.classify_payload) re-implemented from the FORMAT
    SPEC with a regex header grammar — no codecs import. The grammar is
    the full Netpbm-style spec the engine implements, not a canonical
    subset: tokens separated by ANY mix of whitespace and `#`-to-newline
    comments (leading gap allowed), token = run of non-whitespace
    non-`#` bytes, three signed-integer fields, and exactly ONE
    whitespace byte terminating the header (raster bytes may start with
    0x23/whitespace values); raster = w*h*3 raw bytes."""
    import re

    magic = {"ppm": b"P6", "qjpg": b"QJ"}.get(fmt or "")
    if magic is None:
        return "unsupported_fmt"
    gap = rb"(?:\s|#[^\n]*\n)"
    m = re.match(
        gap + rb"*([^\s#]+)"  # magic
        + gap + rb"+([+-]?\d+)"  # w
        + gap + rb"+([+-]?\d+)"  # h
        + gap + rb"+([+-]?\d+)"  # maxval / step
        + rb"\s",  # single terminator
        data,
    )
    if m is None:
        return "bad_header"
    if m.group(1) != magic:
        return "bad_magic"
    try:
        mw, mh = int(w), int(h)
    except (TypeError, ValueError):  # missing/unparseable metadata dims
        return "dims_mismatch"
    hw, hh = int(m.group(2)), int(m.group(3))
    if hw != mw or hh != mh:
        return "dims_mismatch"
    if len(data) - m.end() != hw * hh * 3:
        return "bad_raster"
    return "ok"


def make_payload_quarantine_expected(n: int = 200, k: int = 8) -> None:
    """Expected verdicts of multimodal.validate_payloads over n generated
    pairs + the gen_quarantine_pairs plant corpus (5 kinds x k variants),
    classified by the INDEPENDENT spec-level validator above."""
    from ccnet_spark_spark.synth import gen_pandas, gen_quarantine_pairs

    src = pd.concat([gen_pandas(0, n), gen_quarantine_pairs(k)], ignore_index=True)
    out = pd.DataFrame(
        {
            "image_id": src["image_id"],
            "fmt": src["fmt"],
            "reason": [
                _validate_independent(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                for r in src.itertuples()
            ],
        }
    )
    out["ok"] = out["reason"] == "ok"
    out = out[["image_id", "fmt", "ok", "reason"]]
    out.to_parquet(os.path.join(FIXTURES, "payload_quarantine_expected.parquet"), index=False)
    bad = out[~out.ok].reason.value_counts().to_dict()
    print(f"payload_quarantine_expected.parquet: {len(out)} rows, quarantined by reason: {bad}")


if __name__ == "__main__":
    make_pairs_input()
    make_pairs_phash()
    make_pairs_meta()
    make_pairs_payload_sha()
    make_keepdrop_labels()
    make_source_formats()
    make_frame_sample_expected()
    make_audio_stats_expected()
    make_image_stats_expected()
    make_image_entropy_expected()
    make_payload_quarantine_expected()
    make_image_resize_expected()
    make_aspect_resize_expected()
    make_image_embedding_expected()
    make_caption_embedding_expected()
    # 400-row towers (no plants) for the curated-pipeline oracle
    # (pairs_pipeline_curated restricts the composed twin's input by
    # model-head + alignment verdicts over the FULL 400 corpus)
    make_image_embedding_expected(n=400, plant=0)
    make_caption_embedding_expected(n=400)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = os.path.join("/root/testdata", sf)
        if os.path.isdir(d):
            make_simhash_expected(d)
            make_bpe_expected(d)
