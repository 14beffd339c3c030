"""Token-window chunking (training-data addition).

LLM training pipelines cut long documents into fixed-token windows with
overlap before tokenization/packing. Pure built-in expressions: split once
(materialized in its own select — Catalyst would otherwise inline the split
into every slice; see minhash_signatures' same lesson), then
transform(sequence) + slice + posexplode. No UDF, no shuffle — chunking is
map-only, so at 100 TB it rides inside the scan stage.

Chunk layout: chunk i covers tokens [i*stride, i*stride + chunk_tokens),
stride = chunk_tokens - overlap; n_chunks = max(1, ceil((n_tokens -
overlap) / stride)) so every token is covered and the final chunk may be
short. A doc with fewer tokens than chunk_tokens yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    with_toks = df.select(id_col, F.split(F.col(text_col), "\\s+").alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(float(stride))), F.lit(1)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i * stride + 1, chunk_tokens)),
    )
    out = with_toks.select(id_col, F.posexplode(chunks).alias("chunk_id", "chunk"))
    return out.withColumn("n_tokens", F.size(F.split(F.col("chunk"), "\\s+")).cast("int"))


def chunk_text_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> str:
    """DuckDB twin: same stride math, list_slice is 1-based end-inclusive so
    end = start + chunk_tokens - 1 elements == Spark's slice(start, length)."""
    stride = chunk_tokens - overlap
    return (
        f"with t as (select {id_col}, regexp_split_to_array({text_col}, '\\s+') as toks from {table}), "
        f"c as (select {id_col}, toks, greatest(cast(ceil((len(toks) - {overlap}) / "
        f"cast({stride} as double)) as int), 1) as n_chunks from t) "
        f"select {id_col}, cast(i as int) as chunk_id, "
        f"array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {chunk_tokens}), ' ') as chunk, "
        f"cast(len(list_slice(toks, i * {stride} + 1, i * {stride} + {chunk_tokens})) as int) as n_tokens "
        f"from (select {id_col}, toks, n_chunks, unnest(range(0, n_chunks)) as i from c)"
    )
