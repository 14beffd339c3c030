"""Aspect-ratio bucketing + per-bucket training-batch packing.

Image-generation training (the SDXL / NovelAI practice) cannot batch
images of different shapes: pipelines assign every image to the
NEAREST aspect-ratio bucket from a fixed resolution table, resize to
the bucket's target resolution downstream, and then pack each bucket's
images into fixed-size training batches. This is the image-axis
counterpart of `q_pack_sequences` (text sequence packing) and composes
with `multimodal.resize` (the target (w, h) this operator emits is the
resize target).

Engine addition — the reference has no image-shape operator; the bucket
table shape follows the published SDXL appendix (2^20-pixel buckets,
64-px steps; a representative 9-entry subset here).

Scale notes:
- Bucket ASSIGNMENT is a pure built-in expression (array_min over an
  inline struct array), so it rides inside the scan's codegen — zero
  shuffle, zero Python, and the nearest-bucket argmin is EXACT integer
  arithmetic (see below), never a float comparison that could disagree
  across engines in the last ulp.
- Batch PACKING is one window shuffle. A plain per-bucket window would
  serialize each bucket's global ordering through a single task (9
  buckets = 9 tasks at 10^12 rows), so the scale path shards every
  bucket into `shards` deterministic content-hash sub-streams first and
  packs within (bucket, shard) — parallelism = buckets x shards, batch
  ids globally unique via shard-offset arithmetic, and the assignment is
  still a pure function of the row set (stable across cluster sizes and
  retries, same property as operators/sample.py). shards=None keeps the
  exact single-stream ordering for small/ordered use.

Nearest-bucket argmin, exactly: minimizing |w/h - bw_i/bh_i| compares
fractions, and cross-multiplying each difference by h * L (L = lcm of
all bh_i, a compile-time constant of the bucket table) turns every key
into the integer |w*bh_i - h*bw_i| * (L / bh_i). int64 is ample: dims
to 10^5 px keep keys < 2^62. Ties break on bucket_id (struct ordering
compares fields left to right). DuckDB reproduces the identical integer
keys, so the oracle check is exact, not approximate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (bucket_id, target_w, target_h) — SDXL-style ~2^20-pixel buckets from
# extreme portrait to extreme landscape; bucket_id ascends with w/h.
BUCKETS: list[tuple[int, int, int]] = [
    (0, 640, 1536),
    (1, 768, 1344),
    (2, 832, 1216),
    (3, 896, 1152),
    (4, 1024, 1024),
    (5, 1152, 896),
    (6, 1216, 832),
    (7, 1344, 768),
    (8, 1536, 640),
]

_L = math.lcm(*[bh for _, _, bh in BUCKETS])
# per-bucket integer multiplier making the cross-multiplied keys comparable
_MULT = {bid: _L // bh for bid, _, bh in BUCKETS}


def bucket_struct_col(w_col: str = "w", h_col: str = "h") -> Column:
    """Nearest-bucket argmin as a single expression: array_min over one
    struct per bucket, ordered by (integer key, bucket_id). Returns a
    struct(bucket_id, target_w, target_h)."""
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    entries = [
        F.struct(
            (F.abs(w * bh - h * bw) * F.lit(_MULT[bid])).alias("k"),
            F.lit(bid).cast("int").alias("bucket_id"),
            F.lit(bw).cast("int").alias("target_w"),
            F.lit(bh).cast("int").alias("target_h"),
        )
        for bid, bw, bh in BUCKETS
    ]
    best = F.array_min(F.array(*entries))
    return F.struct(
        best["bucket_id"].alias("bucket_id"),
        best["target_w"].alias("target_w"),
        best["target_h"].alias("target_h"),
    )


def aspect_bucket(df: DataFrame, w_col: str = "w", h_col: str = "h") -> DataFrame:
    """df(+w, h) -> df + (bucket_id, target_w, target_h). Pure expression,
    no shuffle; NULL or non-positive dims get bucket_id NULL (such rows are
    the metadata gates' problem, not this operator's)."""
    ok = F.col(w_col).isNotNull() & F.col(h_col).isNotNull() & (F.col(w_col) > 0) & (F.col(h_col) > 0)
    b = F.when(ok, bucket_struct_col(w_col, h_col))
    return df.withColumns(
        {
            "bucket_id": b["bucket_id"],
            "target_w": b["target_w"],
            "target_h": b["target_h"],
        }
    )


def _shard_col(id_col: str, shards: int) -> Column:
    # first sha256 hex byte mod shards — same engine-portable content-hash
    # family as operators/sample.py (deterministic per id, both engines)
    byte = F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 2), 16, 10)
    return (byte.cast("int") % shards).alias("_shard")


# shard-offset stride for globally-unique batch ids in sharded mode; any
# per-(bucket, shard) local batch count below 2^40 keeps ids collision-free
_SHARD_STRIDE = 1 << 40


def pack_batches(
    df: DataFrame,
    batch_size: int = 8,
    id_col: str = "image_id",
    shards: int | None = None,
) -> DataFrame:
    """Assign batch_id within each aspect bucket: deterministic id order,
    batch_id = floor(rank/batch_size). shards=None = one global stream per
    bucket (exact, serial per bucket); shards=S = the scale path — each
    bucket splits into S content-hash sub-streams packed independently,
    batch_id = shard * 2^40 + local batch (unique across shards, at most
    one ragged final batch per (bucket, shard)). Rows with NULL bucket_id
    (bad dims) get batch_id NULL."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if shards is None:
        w = Window.partitionBy("bucket_id").orderBy(id_col)
        local = F.floor((F.row_number().over(w) - 1) / batch_size)
        out = df.withColumn("batch_id", local.cast("long"))
    else:
        if not 0 < shards <= 256:
            raise ValueError(f"shards must be in 1..256, got {shards}")
        shard = _shard_col(id_col, shards)
        w = Window.partitionBy("bucket_id", "_shard").orderBy(id_col)
        local = F.floor((F.row_number().over(w) - 1) / batch_size)
        out = (
            df.withColumn("_shard", shard)
            .withColumn("batch_id", (F.col("_shard").cast("long") * _SHARD_STRIDE + local))
            .drop("_shard")
        )
    return out.withColumn(
        "batch_id", F.when(F.col("bucket_id").isNotNull(), F.col("batch_id"))
    )


def aspect_bucket_sql(pairs_table: str, w_col: str = "w", h_col: str = "h") -> str:
    """DuckDB twin of aspect_bucket: cross join the inline bucket table,
    rank by the identical integer key, keep rank 1. Emits (image_id,
    bucket_id, target_w, target_h) plus the pass-through of every pairs
    column via p.*."""
    values = ", ".join(f"({bid}, {bw}, {bh}, {_MULT[bid]})" for bid, bw, bh in BUCKETS)
    return (
        f"select * exclude (rn) from ("
        f"select p.*, b.bucket_id, b.bw as target_w, b.bh as target_h, "
        f"row_number() over (partition by p.image_id order by "
        f"abs(p.{w_col} * b.bh - p.{h_col} * b.bw) * b.m, b.bucket_id) as rn "
        f"from {pairs_table} p cross join "
        f"(select * from (values {values}) v(bucket_id, bw, bh, m)) b "
        f"where p.{w_col} is not null and p.{h_col} is not null "
        f"and p.{w_col} > 0 and p.{h_col} > 0) where rn = 1"
    )


def pack_batches_sql(
    bucketed_table: str, batch_size: int = 8, id_col: str = "image_id", shards: int | None = None
) -> str:
    """DuckDB twin of pack_batches over a table that already carries
    bucket_id (e.g. aspect_bucket_sql's output)."""
    if shards is None:
        return (
            f"select *, cast((row_number() over "
            f"(partition by bucket_id order by {id_col}) - 1) // {batch_size} "
            f"as bigint) as batch_id from {bucketed_table}"
        )
    return (
        f"select * exclude (_shard), cast(_shard * {_SHARD_STRIDE} + (row_number() over "
        f"(partition by bucket_id, _shard order by {id_col}) - 1) // {batch_size} "
        f"as bigint) as batch_id from (select *, "
        f"cast(('0x' || substr(sha256(cast({id_col} as varchar)), 1, 2)) as int) % {shards} "
        f"as _shard from {bucketed_table})"
    )
