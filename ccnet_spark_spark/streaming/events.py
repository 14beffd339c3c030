"""Structured Streaming ingestion (engine addition — the reference is
batch-only, SURVEY.md §2.8; a production quality-filter also runs as a
stream over newly landed pairs).

Pattern: readStream over the input parquet/Iceberg directory -> the same
stateless pipeline expressions (filters, scrub — anything not requiring a
global dedup) -> windowed/watermarked metrics -> sink. Global line-dedup is
batch-only by nature; the streaming path applies within-document dedup and
heuristic/scrub/LID stages which are all per-row."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "5 minutes", slide: str | None = None, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling/sliding window counts over the events table
    (works identically on a static DF and a readStream DF)."""
    # watermarks require TIMESTAMP (with zone); parquet often lands NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    win = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(win, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def stream_pairs_scrub(spark: SparkSession, input_dir: str, schema, checkpoint: str):
    """readStream the pairs table and apply the stateless pipeline stages
    (scrub + heuristics); returns a writeStream-ready DataFrame."""
    from ..functions.scrub import scrub_expr
    from ..operators.length import with_heuristic_flags

    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = with_heuristic_flags(stream).withColumn("scrubbed_caption", scrub_expr(F.col("caption")))
    return out


def run_stream_to_memory(df: DataFrame, name: str):
    """Drive a streaming DF to completion synchronously (local smoke)."""
    q = df.writeStream.outputMode("append").format("memory").queryName(name).trigger(availableNow=True).start()
    q.processAllAvailable()
    q.stop()
    return name
