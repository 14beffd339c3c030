"""Similarity search over embedding columns (training-data additions).

- brute-force cosine top-k: pure built-in expressions (zip_with + aggregate
  for the dot product — JVM-side, no Python), broadcast the query set,
  row_number window for top-k. The exact baseline.
- LSH-bucketed variant: random-hyperplane signs -> bucket key; candidates
  only within matching buckets — the 100 TB scale path (bucket groupBy is
  the only shuffle; the full corpus never cross-joins).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, a_col: str, b_col: str, out_col: str = "cosine", dp: int = 4) -> DataFrame:
    a = F.col(a_col).cast("array<double>")
    b = F.col(b_col).cast("array<double>")
    return df.withColumn(out_col, F.round(_dot(a, b) / (_norm(a) * _norm(b)), dp))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine (excluding
    self). queries is broadcast — corpus never shuffles; top-k via window
    (partial per-partition top-k handled by AQE + the window sort on the
    small (query x corpus-partition) result)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>"))
                / (_norm(F.col("_qv").cast("array<double>")) * _norm(F.col("_cv").cast("array<double>"))),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def with_lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]], out_col: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane LSH: bucket = bit string of sign(v . h_i). Pure
    built-ins: each plane is a literal array, dot via zip_with/aggregate."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(v, lit) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn(out_col, F.concat(*bits))


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10, n_planes: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """ANN: candidates share the query's LSH bucket; exact cosine re-rank
    within bucket. Recall < 1 by construction (scale path; brute_force_topk
    is the exactness baseline)."""
    planes = hyperplanes(dim, n_planes, seed)
    cb = with_lsh_bucket(corpus, vec_col, planes).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "lsh_bucket"
    )
    qb = with_lsh_bucket(queries, vec_col, planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "lsh_bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), on="lsh_bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>"))
                / (_norm(F.col("_qv").cast("array<double>")) * _norm(F.col("_cv").cast("array<double>"))),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.95, n_planes: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify."""
    planes = hyperplanes(dim, n_planes, seed)
    b = with_lsh_bucket(df, vec_col, planes).select(id_col, F.col(vec_col).alias("_v"), "lsh_bucket")
    a1, a2 = b.alias("a"), b.alias("b")
    return (
        a1.join(a2, on="lsh_bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("a._v").cast("array<double>"), F.col("b._v").cast("array<double>"))
                / (_norm(F.col("a._v").cast("array<double>")) * _norm(F.col("b._v").cast("array<double>"))),
                4,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )
