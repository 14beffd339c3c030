"""Model-score gates over embedding columns: LAION/DataComp-style
aesthetic and NSFW predictors expressed as LINEAR HEADS over the image
embedding — the exact production shape (LAION-aesthetics v1 is a linear
probe over CLIP embeddings; LAION's NSFW gate is a small head over the
same vector), so a real trained weight vector drops into `weights`
untouched.

Scale design: the head is a dot product against a WEIGHT LITERAL, so the
whole score is a Catalyst expression — zero Python, no shuffle, runs
inside the embedding scan's codegen stage at any corpus size (precedent:
the hyperplane-LSH literals in operators/similarity.py). Heads bigger
than a comfortable plan literal (multi-layer, >~10k floats) would ship as
one sc.broadcast numpy array + Arrow UDF instead — the same fallback the
bloom probe uses (operators/dedup.py).

Cross-engine exactness: weights are deterministic 6dp-rounded doubles
(both engines parse identical values), scores round to 4dp before the
threshold compare, and the contract thresholds sit >=2e-3 from every
fixture score while sum-order float error is ~1e-15 — the compare can
never flip between engines.

No reference counterpart (the reference is text-only); this is the
engine's image-axis extension of its quality-gate family
(pipe_keepdrop.py:10-34 is the analogous text-side verdict op).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AESTHETIC_SEED = 7
NSFW_SEED = 13
AESTHETIC_THRESHOLD = -1.6  # keep images scoring at or above
NSFW_THRESHOLD = 1.9  # flag images scoring at or above


def head_weights(dim: int = 64, seed: int = AESTHETIC_SEED) -> list[float]:
    """Deterministic stand-in weight vector (6dp-rounded, the
    similarity.hyperplanes precedent). A real trained head replaces this
    list; everything downstream is unchanged."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).round(6).tolist()


def linear_score_col(vec_col: str, weights: list[float], dp: int = 4) -> Column:
    """round(dot(vec, weights), dp) as a pure Catalyst expression."""
    v = F.col(vec_col).cast("array<double>")
    lit = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(v, lit, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.round(dot, dp)


def linear_score_sql(vec_expr: str, weights: list[float], dp: int = 4) -> str:
    """DuckDB twin: same 6dp literals, same 4dp rounding."""
    lit = "[" + ", ".join(repr(float(x)) for x in weights) + "]"
    dot = (
        f"list_sum(list_transform(range(1, len({vec_expr}) + 1), "
        f"i -> cast(list_extract({vec_expr}, i) as double) * list_extract({lit}, i)))"
    )
    return f"round({dot}, {dp})"


def model_score_gates(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    aesthetic_threshold: float = AESTHETIC_THRESHOLD,
    nsfw_threshold: float = NSFW_THRESHOLD,
) -> DataFrame:
    """emb(id, embedding, ...) -> + aesthetic, nsfw, model_keep. Keep =
    aesthetic at/above its bar AND nsfw strictly below its bar; NULL
    embeddings fail closed (model_keep=false), matching the metadata
    gates' NULL policy (image_quality._nn)."""
    aes = linear_score_col(vec_col, head_weights(dim, AESTHETIC_SEED))
    nsfw = linear_score_col(vec_col, head_weights(dim, NSFW_SEED))
    return (
        emb.withColumn("aesthetic", aes)
        .withColumn("nsfw", nsfw)
        .withColumn(
            "model_keep",
            F.coalesce(
                (F.col("aesthetic") >= F.lit(aesthetic_threshold))
                & (F.col("nsfw") < F.lit(nsfw_threshold)),
                F.lit(False),
            ),
        )
    )


def model_score_gates_sql(
    vec_expr: str = "embedding",
    dim: int = 64,
    aesthetic_threshold: float = AESTHETIC_THRESHOLD,
    nsfw_threshold: float = NSFW_THRESHOLD,
) -> dict[str, str]:
    """The three output expressions as DuckDB SQL fragments, keyed by
    output column name."""
    aes = linear_score_sql(vec_expr, head_weights(dim, AESTHETIC_SEED))
    nsfw = linear_score_sql(vec_expr, head_weights(dim, NSFW_SEED))
    return {
        "aesthetic": aes,
        "nsfw": nsfw,
        "model_keep": (
            f"coalesce(({aes}) >= {aesthetic_threshold!r} "
            f"and ({nsfw}) < {nsfw_threshold!r}, false)"
        ),
    }
