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
import pandas as pd
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


def lsh_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """DuckDB twin of with_lsh_bucket: same plane literals (hyperplanes() is
    deterministic and 6dp-rounded, so both engines parse identical doubles),
    same sign-bit concatenation. Makes the LSH-bucketed ANN/near-dup shapes
    fully oracle-checkable rather than rows-only."""
    bits = []
    for p in planes:
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        dot = (
            f"list_sum(list_transform(range(1, len({vec_expr}) + 1), "
            f"i -> cast(list_extract({vec_expr}, i) as double) * list_extract({lit}, i)))"
        )
        bits.append(f"case when {dot} >= 0 then '1' else '0' end")
    return "concat(" + ", ".join(bits) + ")"


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
    a = F.col("_qv").cast("array<double>")
    b = F.col("_cv").cast("array<double>")
    denom = _norm(a) * _norm(b)
    scored = (
        cb.join(F.broadcast(qb), on="lsh_bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        # zero-norm guard BEFORE the division (ANSI mode raises on 0/0);
        # NULL-cosine candidates (zero vectors) are unrankable and dropped
        .withColumn("cosine", F.when(denom != 0, F.round(_dot(a, b) / denom, 4)))
        .where(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def train_ivf_centroids(df: DataFrame, vec_col: str = "embedding", k: int = 16, sample_rows: int = 2048, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Driver-side mini k-means over a bounded sample (the IVF 'train' step;
    at 100 TB you train on a sample anyway — the sample size, not the corpus,
    bounds driver memory).

    The sample is a deterministic CORPUS-WIDE draw: order by a content hash
    of the vector, take the first sample_rows (TakeOrdered — per-partition
    partial top-n, no full sort shuffle, driver merges n rows). A plain
    limit() would take the first scanned partition's rows, so at scale the
    centroids would train on one file's skewed distribution (skewed
    centroids -> skewed IVF cells -> hot probe partitions); the hash order
    is also invariant to partition count/order, so training is reproducible
    across cluster layouts and retries."""
    sample = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(sample_rows)
        .toPandas()[vec_col]
    )
    x = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-12)
    return centroids


def make_ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """Vectorized assignment: one numpy matmul per Arrow batch; returns the
    nprobe nearest centroid ids (queries probe several, corpus stores 1)."""
    from pyspark.sql import types as T

    cent = centroids  # captured; small (k x dim), ships in the closure

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign_udf(vecs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cent.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return assign_udf


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10, n_centroids: int = 16, nprobe: int = 4, seed: int = 42) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cluster; a query probes its nprobe nearest clusters and re-ranks
    exactly within them. The cluster equi-join replaces the cross join —
    at scale, cluster id becomes the table's partition key so probes are
    partition-pruned scans."""
    centroids = train_ivf_centroids(corpus, vec_col, k=n_centroids, seed=seed)
    c_assign = make_ivf_assign_udf(centroids, nprobe=1)
    q_assign = make_ivf_assign_udf(centroids, nprobe=nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("cluster", c_assign(F.col("_cv"))[0])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")).withColumn(
        "cluster", F.explode(q_assign(F.col("_qv")))
    )
    scored = (
        c.join(F.broadcast(q), on="cluster")
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


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """SEMANTIC benchmark decontamination: drop every corpus row whose
    embedding near-duplicates ANY eval-set row at cosine >= threshold —
    the leak class the n-gram (dedup.decontaminate) and fuzzy-Jaccard
    (dedup.fuzzy_decontaminate) passes can't see (paraphrases,
    translations, re-crops sharing an embedding neighborhood).

    Scale shape mirrors the other decontaminations: the EVAL side is tiny
    and BROADCASTS (bucketed by the same seeded hyperplanes); the corpus
    side computes its bucket as a scan-side sign expression and
    equi-joins — never all-pairs, the corpus never shuffles. Flagged ids
    are a sliver by construction and anti-join back as a broadcast.
    Exact-cosine verify inside the bucket (4dp, the engine convention)
    keeps LSH recall the only approximation — same planes on both sides,
    so an exact leak (cosine 1.0) ALWAYS shares the bucket and is always
    caught."""
    planes = hyperplanes(dim, n_planes, seed)
    cb = with_lsh_bucket(corpus.select(id_col, vec_col), vec_col, planes).select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"), "lsh_bucket"
    )
    eb = with_lsh_bucket(eval_df.select(vec_col), vec_col, planes).select(
        F.col(vec_col).alias("_ev"), "lsh_bucket"
    )
    flagged = (
        with_cosine(cb.join(F.broadcast(eb), "lsh_bucket"), "_cv", "_ev")
        .where(F.col("cosine") >= threshold)
        .select(F.col("_cid").alias(id_col))
        .distinct()
    )
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    n_planes: int = 3,
    dim: int = 64,
    seed: int = 5,
) -> DataFrame:
    """Cross-tower HARD-NEGATIVE mining (contrastive-training practice:
    for each query image, the most-similar NON-matching caption makes the
    hardest negative in the batch). For every query row, rank the corpus
    rows sharing its hyperplane-LSH bucket (excluding the query's own id
    — its positive) by exact cosine and keep the top k.

    Scale shape: delegates to lsh_topk — the query tower BROADCASTS into
    the bucket equi-join (the corpus never shuffles; a plain join on an
    8-value bucket key would funnel the whole corpus through 8 tasks),
    exact cosine re-rank within bucket, own-id excluded. Zero-vector
    rows (NULL cosine) are excluded on both engines (DuckDB 0/0 -> NULL
    natively; lsh_topk guards the division)."""
    out = lsh_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k,
        n_planes=n_planes, dim=dim, seed=seed,
    )
    return out.select(
        "query_id", F.col("neighbor_id").alias("negative_id"), "rank", "cosine"
    )
