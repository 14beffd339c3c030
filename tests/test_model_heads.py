"""Model-score gates (aesthetic/NSFW linear heads) and the
boilerplate-caption frequency gate."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


def test_linear_score_matches_numpy(spark):
    """The Catalyst dot product equals numpy's within float-sum noise,
    and the 4dp rounding pins them equal."""
    from ccnet_spark_spark.operators.model_heads import head_weights, linear_score_col

    rng = np.random.default_rng(99)
    vecs = rng.standard_normal((20, 64)).astype(np.float32)
    w = head_weights(64, seed=7)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "id int, embedding array<float>"
    )
    got = {
        r["id"]: r["s"]
        for r in df.select("id", linear_score_col("embedding", w).alias("s")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == pytest.approx(
            round(float(v.astype(np.float64) @ np.array(w)), 4), abs=1e-4
        )


def test_model_keep_null_fails_closed(spark):
    """NULL embedding -> NULL scores -> model_keep false, never NULL."""
    from ccnet_spark_spark.operators.model_heads import model_score_gates

    df = spark.createDataFrame(
        [(1, [0.1] * 64), (2, None)], "id int, embedding array<float>"
    )
    rows = {r["id"]: r for r in model_score_gates(df).collect()}
    assert rows[2]["aesthetic"] is None and rows[2]["nsfw"] is None
    assert rows[2]["model_keep"] is False
    assert rows[1]["model_keep"] in (True, False)


def test_sql_twin_matches_spark(spark):
    """DuckDB recomputes identical scores + verdicts from the same
    vectors (the cross-engine property the contract oracle relies on)."""
    import duckdb

    from ccnet_spark_spark.operators.model_heads import (
        model_score_gates,
        model_score_gates_sql,
    )

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((30, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "id int, embedding array<float>"
    )
    got = {
        r["id"]: (r["aesthetic"], r["nsfw"], r["model_keep"])
        for r in model_score_gates(df).collect()
    }
    frags = model_score_gates_sql("embedding")
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        {"id": range(30), "embedding": [v.astype(np.float64).tolist() for v in vecs]}
    ))
    sel = ", ".join(f"{sql} as {n}" for n, sql in frags.items())
    for rid, aes, nsfw, keep in con.execute(f"select id, {sel} from t").fetchall():
        assert got[rid] == (pytest.approx(aes, abs=1e-9), pytest.approx(nsfw, abs=1e-9), keep)


def test_caption_frequency_boundary_and_null(spark):
    """count > max flags; count == max does not; NULL captions group but
    are exempt; digit variants collapse via the dedup normalizer."""
    from ccnet_spark_spark.operators.image_quality import caption_frequency

    rows = (
        [(f"a{i}", "stock photo") for i in range(4)]
        + [(f"b{i}", "unique caption " + c) for i, c in enumerate("xyz")]
        + [("c0", None), ("c1", None)]
        + [("d0", "IMG 001 file"), ("d1", "img 002 file")]  # digits collapse
    )
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = {r["image_id"]: r for r in caption_frequency(df, max_count=3).collect()}
    assert out["a0"]["caption_count"] == 4 and out["a0"]["boilerplate"] is True
    assert out["b0"]["caption_count"] == 1 and out["b0"]["boilerplate"] is False
    assert out["c0"]["caption_count"] == 2 and out["c0"]["boilerplate"] is False
    # normalizer folds case + digits: the two d rows share one group
    assert out["d0"]["caption_count"] == 2
    # boundary: exactly max_count is NOT boilerplate
    df3 = spark.createDataFrame(
        [(f"e{i}", "thrice told tale") for i in range(3)], "image_id string, caption string"
    )
    out3 = caption_frequency(df3, max_count=3).collect()
    assert all(not r["boilerplate"] for r in out3)
