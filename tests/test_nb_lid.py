"""Trained char-trigram Naive-Bayes LID (operators/nb_lid.py).

Hand-computed oracle on a 2-doc corpus, zero-gram prior-only fallback,
plan shape, and the distillation agreement pin the contract query's
docstring promises."""

import math

import pytest
from pyspark.sql import functions as F

from ccnet_spark_spark.operators import nb_lid


def r6(x):
    return round(x, 6)


@pytest.fixture(scope="module")
def tiny_model(spark):
    train = spark.createDataFrame(
        [(1, "aaab", "en"), (2, "bbbb", "fr")], ["doc_id", "text", "lang"]
    )
    return nb_lid.train_nb_lid(train)


def test_train_hand_computed(spark, tiny_model):
    model = tiny_model
    # grams: en -> aaa, aab (1 each, n=2); fr -> bbb (x2, n=2); V = 3
    assert model["v"] == 3 and model["n_total"] == 2
    grams = {(r.lang, r.gram): (r.c, r.logp) for r in model["grams"].collect()}
    assert grams == {
        ("en", "aaa"): (1, r6(math.log10(2 / 5))),
        ("en", "aab"): (1, r6(math.log10(2 / 5))),
        ("fr", "bbb"): (2, r6(math.log10(3 / 5))),
    }
    langs = {r.lang: r for r in model["langs"].collect()}
    assert langs["en"].unseen_logp == r6(math.log10(1 / 5))
    assert langs["en"].prior_logp == r6(math.log10(0.5))


def test_predict_hand_computed(spark, tiny_model):
    score = spark.createDataFrame([(10, "aaab"), (11, "ab")], ["doc_id", "text"])
    out = {r.doc_id: r for r in nb_lid.predict_nb_lid(score, tiny_model, ["en", "fr"]).collect()}
    # "aaab": en = logp(aaa)+logp(aab)+prior; fr = 2*unseen+prior
    en_score = r6(math.log10(2 / 5)) * 2 + r6(math.log10(0.5))
    assert out[10].pred_lang == "en"
    assert out[10].nb_score == pytest.approx(en_score, abs=1e-9)
    # "ab" has zero trigrams: prior-only, equal priors -> alphabetical tie
    assert out[11].pred_lang == "en"
    assert out[11].nb_score == pytest.approx(r6(math.log10(0.5)), abs=1e-9)


def test_predict_plan_no_cartesian(spark, tiny_model):
    score = spark.createDataFrame([(20, "aaab")], ["doc_id", "text"])
    plan = (
        nb_lid.predict_nb_lid(score, tiny_model, ["en", "fr"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan


def test_distill_agreement(spark):
    """The contract query's promise: the NB student reproduces the
    stub-LID teacher's label on >= 90% of held-out captions (captions are
    lang-correlated by synth construction, so the signal is real)."""
    from ccnet_spark_spark.operators import lid as lid_op
    from ccnet_spark_spark.synth import generate_pairs

    pairs = generate_pairs(spark, 400).select("image_id", "caption")
    labeled = (
        lid_op.with_lang(pairs, "caption")
        .select(
            "image_id",
            "caption",
            "lang",
            F.expr("cast(substring(image_id, 4) as int)").alias("_i"),
        )
        .localCheckpoint()
    )
    train = labeled.where((F.col("_i") % 2 == 0) & F.col("lang").isNotNull())
    rest = labeled.where(F.col("_i") % 2 == 1)
    model = nb_lid.train_nb_lid(train, text_col="caption")
    langs = sorted(r.lang for r in model["langs"].select("lang").collect())
    pred = nb_lid.predict_nb_lid(rest, model, langs, text_col="caption", id_col="image_id")
    joined = rest.select("image_id", "lang").join(pred, "image_id").where(F.col("lang").isNotNull())
    agree = joined.agg(
        F.avg((F.col("lang") == F.col("pred_lang")).cast("double")).alias("a")
    ).collect()[0].a
    assert agree >= 0.9, agree
