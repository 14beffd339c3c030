"""Pure-python/numpy image codecs for the binary payload column.

The sandbox has no Pillow/opencv, so the engine ships two deterministic
self-describing formats (FIXTURES.md F1):

- ``ppm``  — lossless: standard binary P6 header + raw RGB24.
- ``qjpg`` — lossy stand-in: pixels quantized to a step grid, then stored
  raw with a ``QJ`` header. Decode reconstructs mid-bin values; with the
  default step=4 the max per-channel error is 2 → PSNR ≈ 46 dB, above the
  40 dB fidelity gate (BASELINE.json input_hint).

Real JPEG/PNG decode slots in behind the same (bytes -> HxWx3 uint8)
interface when Pillow is available (see operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np

QJPG_STEP = 4


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6 %d %d 255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    nl = data.index(b"\n")
    magic, w, h, _maxv = data[:nl].split()
    assert magic == b"P6", f"not a P6 ppm: {magic!r}"
    w, h = int(w), int(h)
    return np.frombuffer(data[nl + 1 :], dtype=np.uint8).reshape(h, w, 3)


def encode_qjpg(pixels: np.ndarray, step: int = QJPG_STEP) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.uint8) // step).astype(np.uint8)
    return b"QJ %d %d %d\n" % (w, h, step) + q.tobytes()


def decode_qjpg(data: bytes) -> np.ndarray:
    nl = data.index(b"\n")
    magic, w, h, step = data[:nl].split()
    assert magic == b"QJ", f"not a qjpg: {magic!r}"
    w, h, step = int(w), int(h), int(step)
    q = np.frombuffer(data[nl + 1 :], dtype=np.uint8).reshape(h, w, 3)
    return np.clip(q.astype(np.int32) * step + step // 2, 0, 255).astype(np.uint8)


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "qjpg":
        return decode_qjpg(data)
    raise NotImplementedError(
        f"fmt={fmt!r}: real image codecs (jpeg/png/webp) require Pillow, "
        "not present in this sandbox; plumbing is format-agnostic"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
