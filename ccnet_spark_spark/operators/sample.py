"""Deterministic content-hash sampling.

The reference's sampling knob (isSample/sampleRate,
/root/reference/pipe_line.py:76-79) and Spark's own ``df.sample(fraction,
seed)`` are only reproducible for one engine + partitioning; re-running on
a different cluster layout (or in DuckDB for the oracle) yields a
different row set. A CONTENT-hash sample — keep rows whose
sha256(id) prefix falls below a threshold — is stable across engines,
stage retries, cluster sizes and time: the production pattern for carving
a fixed dev/eval slice out of a 100 TB corpus (every run sees the same
rows, and appending new data never reshuffles previously-sampled ids).

Pure built-in expressions, so the predicate rides inside the scan's
codegen'd filter; the identical formula runs in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(rate_256: int) -> str:
    # 1..255 only: format(256, '02x') is the 3-char '100', and a 2-char
    # prefix compared against it keeps ~17/256 of rows instead of all —
    # rate 256 means "don't sample", which is not this operator's job
    if not 0 < rate_256 < 256:
        raise ValueError(f"rate_256 must be in 1..255 (256 = no sampling), got {rate_256}")
    return format(rate_256, "02x")


def hash_sample(df: DataFrame, id_col: str | Column, rate_256: int) -> DataFrame:
    """Keep rows whose sha256(cast(id as string)) first hex byte is below
    rate_256 — an exact rate_256/256 expected fraction (e.g. 26 ≈ 10.2 %),
    deterministic per id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.substring(F.sha2(c.cast("string"), 256), 1, 2)
    return df.where(prefix < F.lit(_threshold_hex(rate_256)))


def hash_sample_sql(id_expr: str, rate_256: int) -> str:
    """DuckDB twin of the sampling predicate (for oracle_sql entries)."""
    return f"substr(sha256(cast({id_expr} as varchar)), 1, 2) < '{_threshold_hex(rate_256)}'"
