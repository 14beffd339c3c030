"""Deterministic synthetic image+caption pairs generator (FIXTURES.md F1).

Replaces the reference's WET download+parse source
(/root/reference/pipe_load.py:30-170) — our source is a table scan, and this
module writes that table. Generation is *distributed* (mapInPandas over
spark.range) and *deterministic per image_id* (numpy PRNG seeded with
(seed, i)), so any scale regenerates identically and the single-node pandas
oracle can rebuild the exact same rows without Spark.

Planted caption features (so every operator path is exercised):
exact-duplicate boilerplate lines across rows, near-duplicates differing in
case/digits (collide after normalize_for_dedup), empty/whitespace lines,
sub-min_len captions, digit-heavy lines, accented fr / CJK zh text, PII
tokens (email/phone/IPv4), toxicity words, and gibberish below-LID-threshold
captions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import codecs
from .models import VOCAB
from .schema import PAIRS_SCHEMA

DEFAULT_SEED = 42

LANG_WEIGHTS = [  # deliberate skew: en dominates (SURVEY.md §7 risk 4)
    ("en", 0.55),
    ("zh", 0.20),
    ("fr", 0.10),
    ("de", 0.07),
    ("es", 0.05),
    ("xx", 0.03),  # gibberish -> LID below threshold -> lang null
]

TOX_WORDS = ["frakk", "blorgh", "sneckduk", "grawlix"]  # stand-in lexicon
PII_SAMPLES = [
    "contact me at {u}@example{d}.com for details",
    "call 555-{a}-{b} before noon",
    "server at 192.168.{o}.{p} responded",
]


def _boilerplate_pool(lang: str, n: int = 24) -> list[str]:
    """Shared per-language duplicate-line pool — same lines appear in many
    captions, driving the dedup operators. Seeded by lang only."""
    rng = np.random.default_rng([DEFAULT_SEED, 7, sum(map(ord, lang))])
    vocab = VOCAB.get(lang, VOCAB["en"])
    pool = []
    for _ in range(n):
        k = int(rng.integers(6, 12))
        pool.append(" ".join(rng.choice(vocab, size=k)))
    return pool


_POOLS = {lang: _boilerplate_pool(lang) for lang in VOCAB}
_GIBBERISH_ALPHABET = np.array(list("bcdfghjklmnpqrstvwxz"))


def gen_row(i: int, seed: int = DEFAULT_SEED) -> dict:
    """Build pair row i. Pure function of (i, seed) — shared by the Spark
    generator and the pandas test oracle."""
    rng = np.random.default_rng([seed, i])
    roll = rng.random()
    acc, lang = 0.0, "en"
    for lg, wgt in LANG_WEIGHTS:
        acc += wgt
        if roll < acc:
            lang = lg
            break

    # --- caption ---
    lines: list[str] = []
    if lang == "xx":
        # half land below min_len (drop: too_short), half are long enough to
        # reach LID and fall below its threshold (drop: lid_null)
        n_lines = int(rng.integers(1, 13))
        for _ in range(n_lines):
            words = ["".join(rng.choice(_GIBBERISH_ALPHABET, size=int(rng.integers(4, 9)))) for _ in range(int(rng.integers(7, 14)))]
            lines.append(" ".join(words))
    else:
        vocab = VOCAB[lang]
        pool = _POOLS[lang]
        short_doc = rng.random() < 0.10
        n_lines = int(rng.integers(1, 3)) if short_doc else int(rng.integers(7, 18))
        for _ in range(n_lines):
            r = rng.random()
            if r < 0.25:  # exact duplicate from shared pool
                line = pool[int(rng.integers(len(pool)))]
                v = rng.random()
                if v < 0.15:  # near-dup: case variant (collides post-normalize)
                    line = line.upper()
                elif v < 0.25:  # near-dup: digit variant
                    line = line + " 123"
            elif r < 0.29:
                line = ""  # empty line (normalize->"" edge, pipe_hash.py:32-33)
            elif r < 0.32:
                line = "   "  # whitespace-only
            elif r < 0.36:  # digit-heavy
                line = " ".join(str(rng.integers(0, 99999)) for _ in range(8))
            else:
                k = int(rng.integers(9, 18))
                line = " ".join(rng.choice(vocab, size=k))
            lines.append(line)
        if rng.random() < 0.08:  # planted PII
            tpl = PII_SAMPLES[int(rng.integers(len(PII_SAMPLES)))]
            lines.append(
                tpl.format(
                    u="user%d" % rng.integers(1000),
                    d=int(rng.integers(9)),
                    a="%03d" % rng.integers(1000),
                    b="%04d" % rng.integers(10000),
                    o=int(rng.integers(256)),
                    p=int(rng.integers(256)),
                )
            )
        if rng.random() < 0.05:  # planted toxicity word
            lines.append("this " + TOX_WORDS[int(rng.integers(len(TOX_WORDS)))] + " thing again")
    caption = "\n".join(lines)

    # --- image payload ---
    wh = [16, 16, 16, 32, 32, 64]
    w = int(wh[int(rng.integers(len(wh)))])
    h = int(wh[int(rng.integers(len(wh)))])
    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if rng.random() < 0.20:
        fmt, data = "qjpg", codecs.encode_qjpg(pixels)
    else:
        fmt, data = "ppm", codecs.encode_ppm(pixels)

    # average-hash style phash over the raw pixels (deterministic int64)
    gray = pixels.mean(axis=2)
    bits = (gray > gray.mean()).flatten()[:64]
    phash = 0
    for b in bits:
        phash = (phash << 1) | int(b)
    phash = int(np.int64(np.uint64(phash)))  # wrap into signed int64

    return {
        "image_id": f"img{i:010d}",
        "bytes": bytearray(data),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
    }


def gen_pandas(start: int, end: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    return pd.DataFrame([gen_row(i, seed) for i in range(start, end)])


def generate_pairs(spark, n_rows: int, seed: int = DEFAULT_SEED, partitions: int | None = None):
    """Distributed generation: spark.range drives ids; each task builds its
    slice independently (no shuffle, no driver materialization).

    Default partition count is scale-adaptive, not a constant: one task per
    ~64 rows, capped at the session's parallelism. A fixed fan-out of
    defaultParallelism made every tiny generated corpus (the 200-row
    contract inputs) pay 32+ near-empty Python-dispatch tasks PER Arrow
    stage downstream — pure per-task overhead (guide §2.2/§6: fewer,
    larger tasks when the data is small); large generations still use the
    full parallelism."""
    if partitions is None:
        par = max(spark.sparkContext.defaultParallelism, 8)
        partitions = max(1, min(par, (n_rows + 63) // 64))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield pd.DataFrame([gen_row(int(i), seed) for i in ids])

    rng_df = spark.range(0, n_rows, 1, partitions)
    return rng_df.mapInPandas(gen, schema=PAIRS_SCHEMA)


def write_pairs(spark, path: str, n_rows: int, seed: int = DEFAULT_SEED, partitions: int | None = None) -> None:
    """partitions matters for benchmarking: a table written with fewer files
    than the reading session has cores caps scan parallelism (maxPartitionBytes
    bin-packing), silently under-using the larger cluster — pass an explicit
    count >= the largest parallelism that will read it."""
    generate_pairs(spark, n_rows, seed, partitions).write.mode("overwrite").parquet(path)


# ------------------------------------------------- multimodal extensions
# Video = concatenated P6 ppm frames (real container parsing, no external
# codec); audio = s16le mono PCM. Both pure functions of (i, seed) like
# gen_row, so fixtures and the engine derive identical inputs.
def gen_video_row(i: int, n_frames: int = 6, seed: int = DEFAULT_SEED) -> dict:
    from .codecs import encode_ppm

    frames = []
    for f in range(n_frames):
        rng = np.random.default_rng([seed, 101, i, f])
        px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        frames.append(encode_ppm(px))
    return {
        "video_id": f"vid{i:08d}",
        "bytes": b"".join(frames),
        "n_frames": n_frames,
        "w": 6,
        "h": 4,
    }


VIDEOS_SCHEMA = "video_id string, bytes binary, n_frames int, w int, h int"


def generate_videos(spark, n_rows: int, n_frames: int = 6, seed: int = DEFAULT_SEED, partitions: int | None = None):
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield pd.DataFrame([gen_video_row(int(i), n_frames, seed) for i in ids])

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, schema=VIDEOS_SCHEMA)


AUDIO_RATE = 16_000


def gen_audio_row(i: int, seed: int = DEFAULT_SEED) -> dict:
    rng = np.random.default_rng([seed, 202, i])
    n = int(rng.integers(AUDIO_RATE // 4, AUDIO_RATE))  # 0.25-1.0 s
    t = np.arange(n, dtype=np.float64)
    freq = 100.0 + float(rng.integers(0, 900))
    wave = 0.5 * np.sin(2 * np.pi * freq * t / AUDIO_RATE) + 0.05 * rng.standard_normal(n)
    pcm = np.clip(wave * 32767.0, -32768, 32767).astype("<i2")
    return {"audio_id": f"aud{i:08d}", "bytes": pcm.tobytes(), "sample_rate": AUDIO_RATE}


AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int"


def generate_audio(spark, n_rows: int, seed: int = DEFAULT_SEED, partitions: int | None = None):
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield pd.DataFrame([gen_audio_row(int(i), seed) for i in ids])

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, schema=AUDIO_SCHEMA)


# ------------------------------------------------- quarantine plant corpus
# Corruption kinds for the payload-quarantine contract query; the KIND
# list and the byte mutations are the shared INPUT construction (like the
# simhash plant constants) — the verdicts are recomputed independently on
# each side (operators/multimodal.classify_payload vs the fixture's
# spec-level validator in tools/make_fixtures.py).
QUARANTINE_KINDS = (
    "bad_header",
    "bad_magic",
    "bad_raster",
    "dims_mismatch",
    "ok_copy",
    # spec-valid NON-CANONICAL headers — must classify ok on both sides
    # (they exercise the full header grammar: comments and multi-byte
    # whitespace gaps between tokens, which real-world Netpbm carries)
    "ok_comment",
    "ok_multispace",
)


def gen_quarantine_pairs(k: int = 8, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """k variants PER KIND, derived from generated rows 0..k-1: truncated
    header, wrong magic, short raster, metadata dimension lie, an
    untouched control copy, and two spec-valid non-canonical headers
    (comment in the first token gap; doubled whitespace). Pure function
    of (k, seed), so the fixture maker and the contract query derive
    identical bytes."""
    base = gen_pandas(0, k, seed)
    rows = []
    for r in base.itertuples():
        data = bytes(r.bytes)
        variants = {
            "bad_header": (data[:6], r.w, r.h),
            "bad_magic": (b"XX" + data[2:], r.w, r.h),
            "bad_raster": (data[:-3], r.w, r.h),
            "dims_mismatch": (data, r.w + 1, r.h),
            "ok_copy": (data, r.w, r.h),
            # first gap (after the magic) gains a comment / extra space —
            # header-only mutations, the raster bytes are untouched
            "ok_comment": (
                data.replace(b" ", b" # synthetic EXIF-ish creator tag\n", 1),
                r.w,
                r.h,
            ),
            "ok_multispace": (data.replace(b" ", b"  \t ", 1), r.w, r.h),
        }
        for kind in QUARANTINE_KINDS:
            payload, w, h = variants[kind]
            rows.append(
                {
                    "image_id": f"img_{kind}_{r.Index:03d}",
                    "bytes": bytearray(payload),
                    "w": int(w),
                    "h": int(h),
                    "fmt": r.fmt,
                    "caption": r.caption,
                    "phash": int(r.phash),
                }
            )
    return pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
