"""Analysis rollup (reference A3, /root/reference/pipe_save.py:105-122):
per-(lang,bucket) counts, length sums and retention ratios — the engine's
correctness dashboard and the metrics half of the lineage sidecar."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_rollup(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum("original_length").alias("sum_original_length"),
            F.sum("length").alias("sum_length"),
            F.sum("nlines").alias("sum_nlines"),
            F.sum("original_nlines").alias("sum_original_nlines"),
        )
        .withColumn("length_ratio", F.round(F.col("sum_length") / F.col("sum_original_length"), 4))
        .withColumn("nlines_ratio", F.round(F.col("sum_nlines") / F.col("sum_original_nlines"), 4))
    )
