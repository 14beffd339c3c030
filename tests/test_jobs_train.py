"""run_train CLI smoke: every trainer mode writes its artifact tables and
the artifacts round-trip (in-process main(), shared session kept alive)."""

import os

import pytest
from pyspark.sql import functions as F

from jobs import run_train

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "artifact")


def _run(argv):
    assert run_train.main(argv, stop_session=False) == 0


def test_lm_mode(spark, outdir):
    _run(["--mode", "lm", "--input", DOCS, "--output", outdir])
    bi = spark.read.parquet(f"{outdir}/bigrams")
    assert {"lang", "w1", "w2", "c12", "logp"} <= set(bi.columns)
    assert bi.count() > 0
    assert spark.read.parquet(f"{outdir}/vocab").count() == 5  # one row per lang


def test_nb_lid_mode(spark, outdir):
    _run(["--mode", "nb-lid", "--input", DOCS, "--output", outdir])
    meta = spark.read.parquet(f"{outdir}/meta").collect()[0]
    assert meta.v > 0 and meta.n_total == 500
    assert spark.read.parquet(f"{outdir}/langs").count() == 5


def test_probe_mode(spark, outdir, tmp_path):
    labeled = str(tmp_path / "labeled")
    docs = spark.read.parquet(DOCS).withColumn(
        "label", F.when(F.length("text") >= 300, F.lit(1)).otherwise(F.lit(0))
    )
    docs.write.parquet(labeled)
    _run(["--mode", "probe", "--input", labeled, "--output", outdir, "--label-col", "label"])
    w = spark.read.parquet(f"{outdir}/weights")
    from ccnet_spark_spark.operators.probe import feature_names

    assert w.count() == len(feature_names(("de", "en", "es", "fr", "zh")))


def test_dsir_mode(spark, outdir, tmp_path):
    target = str(tmp_path / "target")
    spark.read.parquet(DOCS).where(F.col("lang") == "en").write.parquet(target)
    _run(["--mode", "dsir", "--input", DOCS, "--output", outdir, "--target", target])
    model = spark.read.parquet(f"{outdir}/model")
    assert {"bucket", "ct", "cr", "delta_logp"} <= set(model.columns)
    meta = spark.read.parquet(f"{outdir}/meta").collect()[0]
    assert meta.n_raw > meta.n_target > 0


def test_cutoffs_and_bpe_modes(spark, outdir, tmp_path):
    pp = str(tmp_path / "pp")
    spark.read.parquet(DOCS).withColumn(
        "perplexity", (F.length("text") % 100).cast("double")
    ).write.parquet(pp)
    _run(["--mode", "cutoffs", "--input", pp, "--output", outdir])
    m = spark.read.parquet(f"{outdir}/matrix")
    assert m.count() == 5 * 101  # 101 percentiles per language
    out2 = str(tmp_path / "bpe")
    _run(["--mode", "bpe", "--input", DOCS, "--output", out2, "--num-merges", "4"])
    assert spark.read.parquet(f"{out2}/merges").count() == 4
    assert spark.read.parquet(f"{out2}/vocab").count() > 0


def test_lm_artifact_consumed_by_pipeline(spark, tmp_path):
    """Close the train -> apply loop operationally: run_train writes the LM
    artifact, the Pipeline scores perplexity WITH it (Config.lm_artifact)
    and the pipeline's perplexity column equals the standalone scorer."""
    from ccnet_spark_spark.operators import lm
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    art = str(tmp_path / "lm_art")
    pairs = generate_pairs(spark, 120).localCheckpoint()
    # teacher-label captions so the artifact has real per-lang models
    from ccnet_spark_spark.operators import lid as lid_op

    labeled = lid_op.with_lang(pairs.select("image_id", "caption"), "caption").where(
        F.col("lang").isNotNull()
    )
    labeled.select(F.col("caption").alias("text"), "lang").write.parquet(str(tmp_path / "train"))
    from jobs import run_train

    assert run_train.main(
        ["--mode", "lm", "--input", str(tmp_path / "train"), "--output", art],
        stop_session=False,
    ) == 0

    out = Pipeline(spark, Config(lm_artifact=art, min_len=1)).run(pairs)
    model = lm.load_model(spark, art)
    # the pipeline dedups lines first — score the pipeline's OWN dedup text
    base = out.select("image_id", "dedup_caption", "lang").where(F.col("lang").isNotNull())
    expected = lm.score_bigram_pp(base, model, text_col="dedup_caption", id_col="image_id")
    joined = (
        out.select("image_id", "perplexity")
        .join(expected.select("image_id", "lm_pp"), "image_id")
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        assert r.perplexity == pytest.approx(r.lm_pp, abs=1e-3)
    # LID-refused rows keep NULL perplexity -> bucket 'all'
    nulls = out.where(F.col("lang").isNull()).select("perplexity", "bucket").collect()
    for r in nulls:
        assert r.perplexity is None and r.bucket == "all"


def test_nb_lid_artifact_consumed_by_pipeline(spark, tmp_path):
    """Same loop for LID: run_train writes the NB artifact, the Pipeline
    assigns lang WITH it (Config.lid_artifact — pure broadcast joins, no
    Python in the LID stage) and matches the standalone predictor."""
    from ccnet_spark_spark.operators import lid as lid_op
    from ccnet_spark_spark.operators import nb_lid
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs
    from jobs import run_train

    art = str(tmp_path / "nb_art")
    pairs = generate_pairs(spark, 120).localCheckpoint()
    labeled = lid_op.with_lang(pairs.select("image_id", "caption"), "caption").where(
        F.col("lang").isNotNull()
    )
    labeled.select(F.col("caption").alias("text"), "lang").write.parquet(str(tmp_path / "train"))
    assert run_train.main(
        ["--mode", "nb-lid", "--input", str(tmp_path / "train"), "--output", art],
        stop_session=False,
    ) == 0

    out = Pipeline(spark, Config(lid_artifact=art, min_len=1)).run(pairs)
    model = nb_lid.load_model(spark, art)
    lang_values = sorted(r.lang for r in model["langs"].select("lang").collect())
    expected = nb_lid.predict_nb_lid(
        out.select("image_id", "dedup_caption"),
        model,
        lang_values,
        text_col="dedup_caption",
        id_col="image_id",
    )
    joined = (
        out.select("image_id", "lang", "score")
        .join(expected.select("image_id", "pred_lang"), "image_id")
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        assert r.lang == r.pred_lang and r.score is None
