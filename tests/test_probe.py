"""Ridge quality probe (operators/probe.py): trainer parity, scoring plan
shape, and the mimic-accuracy promise."""

import pytest
from pyspark.sql import functions as F

from ccnet_spark_spark.operators import probe

SF001 = "/root/testdata/sf0.001"
LANGS = ("de", "en", "es", "fr", "zh")


def test_spark_and_oracle_trainers_agree_bitwise(spark):
    """The whole exactness story in one assert: the distributed
    normal-equations trainer (Spark agg) and the independent oracle
    retrain (DuckDB features + numpy) produce IDENTICAL float64 weights,
    because X'X / X'y are exact int64 sums on both sides."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    labeled = docs.withColumn(
        "label", F.when(F.size(F.split("text", " ")) >= 20, F.lit(1)).otherwise(F.lit(0))
    )
    w_spark = probe.train_ridge(labeled, "label", langs=LANGS)
    w_oracle = probe.oracle_train_ridge(
        f"{SF001}/documents.parquet",
        "text is not null and lang is not null",
        "case when len(string_split(text, ' ')) >= 20 then 1 else 0 end",
        langs=LANGS,
    )
    assert w_spark == w_oracle  # bit-exact, not approx


def test_null_rows_do_not_poison_training(spark):
    """A NULL text (or label) row must be filtered, not wrapped to -2^63
    by the NaN->int64 conversion inside the Gram partial."""
    import pyspark.sql.functions as F  # noqa: F811

    docs = spark.read.parquet(f"{SF001}/documents.parquet").withColumn(
        "label", F.when(F.size(F.split("text", " ")) >= 20, F.lit(1)).otherwise(F.lit(0))
    )
    poisoned = docs.unionByName(
        docs.limit(2).withColumn("text", F.lit(None).cast("string"))
    ).unionByName(docs.limit(1).withColumn("label", F.lit(None).cast("int")))
    w_clean = probe.train_ridge(docs, "label", langs=LANGS)
    w_poisoned = probe.train_ridge(poisoned, "label", langs=LANGS)
    assert w_clean == w_poisoned  # bit-equal: null rows contributed nothing


def test_features_match_pandas(spark):
    rows = [
        (1, "the cat and a dog 12 jumped", "en"),
        (2, "ab\ncd ef", "fr"),
        (3, "xyzzy", "zh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: r
        for r in probe.with_features(df, langs=LANGS).orderBy("doc_id").collect()
    }
    r1 = got[1]
    assert r1.n_chars == 27 and r1.n_words == 7 and r1.n_lines == 1
    assert r1.n_digits == 2 and r1.max_word_len == 6 and r1.n_stop == 3
    assert r1.n_wlen_3 == 4  # the, cat, and, dog
    assert r1.is_en == 1 and r1.is_fr == 0
    assert r1.nw_x_en == 7 and r1.nw_x_zh == 0
    r2 = got[2]
    assert r2.n_lines == 2 and r2.n_words == 2  # split on ' ': ['ab\ncd', 'ef']


def test_scoring_is_pure_projection(spark):
    """Scoring must compile to a scan-side projection: literal weights ×
    integer features — no join, no shuffle, no UDF."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    w = [0.1] * len(probe.feature_names(LANGS))
    plan = (
        docs.select("doc_id", probe.score_expr(w, langs=LANGS).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "Join", "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, bad


def test_probe_mimics_lm_gate(spark):
    """The contract query's promise: the linear probe reproduces the
    LM-perplexity keep gate on >= 85% of held-out documents (vs a ~61%
    majority-class base rate at sf0.01)."""
    import __spark_entry__ as em

    out = em.queries()["quality_probe"](spark, "/root/testdata/sf0.01").collect()
    acc = sum(1 for r in out if r.pred == (r.label == 1)) / len(out)
    assert acc >= 0.85, acc


class TestImageEntropy:
    """multimodal.image_entropy hand cases (kept here with the other
    quality-gate tests)."""

    def test_hand_cases(self, spark):
        import numpy as np

        from ccnet_spark_spark import codecs
        from ccnet_spark_spark.operators.multimodal import image_entropy

        solid = np.full((4, 4, 3), 77, dtype=np.uint8)
        # checkerboard of two gray values, equal mass -> exactly 1 bit
        board = np.zeros((4, 4, 3), dtype=np.uint8)
        board[::2, ::2] = 200
        board[1::2, 1::2] = 200
        rows = [
            ("solid", bytearray(codecs.encode_ppm(solid)), "ppm"),
            ("board", bytearray(codecs.encode_ppm(board)), "ppm"),
            ("solid_q", bytearray(codecs.encode_qjpg(solid)), "qjpg"),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        got = {r.image_id: r for r in image_entropy(df).collect()}
        assert got["solid"].entropy == 0.0 and got["solid"].flat and got["solid"].n_gray == 1
        # exactly 1 bit sits ON the strict threshold -> NOT flat (boundary pin)
        assert got["board"].entropy == 1.0 and got["board"].n_gray == 2 and not got["board"].flat
        assert got["solid_q"].entropy == 0.0 and got["solid_q"].flat  # lossy path too

    def test_gate_separates_plants(self, spark):
        import __spark_entry__ as em

        out = em.queries()["image_entropy_gate"](spark, "/root/testdata/sf0.001").collect()
        flats = {r.image_id for r in out if r.flat}
        assert flats == {f"img_flat_{i:02d}" for i in range(10)}
