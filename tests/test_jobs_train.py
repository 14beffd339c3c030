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
