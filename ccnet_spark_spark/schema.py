"""Explicit schemas (never inferred — the reference infers dict schemas at
/root/reference/pipe_line.py:172, which is unsafe at 10^12 rows).

PAIRS is the engine's sole input contract (BASELINE.json input_hint):
one row per image+caption pair.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table: image + caption pairs.
PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# Output table: the reference's final row shape (/root/reference/dev.md:145)
# transplanted to pairs, plus our auditable keep/drop verdict. The reference
# *drops* filtered rows; we keep an explicit (keep, drop_reason) label so the
# F1 gate and lineage are checkable (SURVEY.md §7 step 6).
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),  # original, untouched
        T.StructField("phash", T.LongType(), True),
        T.StructField("original_length", T.IntegerType(), True),
        T.StructField("original_nlines", T.IntegerType(), True),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("nlines", T.IntegerType(), True),
        T.StructField("dedup_caption", T.StringType(), True),  # post-dedup text
        T.StructField("line_ids_kept", T.ArrayType(T.IntegerType()), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("score", T.FloatType(), True),
        T.StructField("tokenized", T.StringType(), True),
        T.StructField("perplexity", T.FloatType(), True),
        T.StructField("bucket", T.StringType(), True),
        T.StructField("scrubbed_caption", T.StringType(), True),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("drop_reason", T.StringType(), True),
    ]
)

# Per-language perplexity cutoffs, broadcast at bucket time
# (replaces the reference's driver-side literal CASE chain,
# /root/reference/pipe_line.py:123-130,302-336).
CUTOFFS_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("pp_head", T.DoubleType(), False),
        T.StructField("pp_tail", T.DoubleType(), False),
    ]
)

# Checkpoint/lineage sidecar (FIXTURES.md F4; A3-rollup shape from
# /root/reference/pipe_save.py:105-122).
SIDECAR_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("n_in", T.LongType(), True),
        T.StructField("n_kept", T.LongType(), True),
        T.StructField("n_dropped", T.LongType(), True),
        T.StructField("sum_length", T.LongType(), True),
        T.StructField("sum_original_length", T.LongType(), True),
        T.StructField("by_bucket", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("completed_at", T.TimestampType(), True),
    ]
)
