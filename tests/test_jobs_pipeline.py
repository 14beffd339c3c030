"""Smoke the spark-submit pipeline CLI (jobs/run_pipeline.py) end-to-end
in-process: default run and the --trim-passages variant both produce a
labeled verdict table."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)

import run_pipeline  # noqa: E402

CUTOFFS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "cutoffs.csv"
)


def _write_pairs(spark, tmp_path, n=60):
    from ccnet_spark_spark.synth import generate_pairs

    p = str(tmp_path / "pairs_in")
    generate_pairs(spark, n).write.parquet(p)
    return p


def test_run_pipeline_cli_default(spark, tmp_path):
    inp = _write_pairs(spark, tmp_path)
    out = str(tmp_path / "out_default")
    rc = run_pipeline.main(["--input", inp, "--output", out, "--cutoffs", CUTOFFS, "--min-len", "50"], stop_session=False)
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.count() == 60  # every row survives with a verdict
    assert {"keep", "drop_reason", "bucket", "scrubbed_caption"} <= set(res.columns)
    assert res.where("keep").count() > 0


def test_run_pipeline_cli_trim_passages(spark, tmp_path):
    inp = _write_pairs(spark, tmp_path)
    out = str(tmp_path / "out_trim")
    rc = run_pipeline.main(
        [
            "--input", inp, "--output", out, "--cutoffs", CUTOFFS,
            "--min-len", "50", "--trim-passages", "--passage-gram-n", "6",
        ],
        stop_session=False,
    )
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.count() == 60
    # trimming can only shrink the deduped caption
    import pyspark.sql.functions as F

    bad = res.where(F.length("dedup_caption") > F.col("original_length")).count()
    assert bad == 0


def test_run_pipeline_cli_image_gates(spark, tmp_path):
    inp = _write_pairs(spark, tmp_path)
    out = str(tmp_path / "out_gated")
    rc = run_pipeline.main(
        ["--input", inp, "--output", out, "--cutoffs", CUTOFFS, "--min-len", "50", "--image-gates"],
        stop_session=False,
    )
    assert rc == 0
    res = spark.read.parquet(out)
    # the gates are a PRE-filter: the verdict table holds only gate
    # survivors, and every survivor satisfies the gate predicate
    from ccnet_spark_spark.operators.image_quality import ImageGateConfig, keep_expr

    n = res.count()
    assert 0 < n < 60
    pairs = spark.read.parquet(inp)
    expected = pairs.filter(keep_expr(ImageGateConfig(), "caption")).count()
    assert n == expected


def test_run_pipeline_cli_curated_fused_matches_join(spark, tmp_path):
    """The full curated cascade through the CLI, both model-gate modes:
    identical surviving rows (the pytest pin, driven via spark-submit
    flags), and the curated output is a strict subset of the corpus."""
    inp = _write_pairs(spark, tmp_path, n=120)
    outs = {}
    for mode in ("join", "fused"):
        out = str(tmp_path / f"out_curated_{mode}")
        rc = run_pipeline.main(
            [
                "--input", inp, "--output", out, "--cutoffs", CUTOFFS,
                "--min-len", "50", "--image-gates", "--caption-budget", "10",
                "--model-gates", "--model-gates-mode", mode,
            ],
            stop_session=False,
        )
        assert rc == 0
        res = spark.read.parquet(out)
        outs[mode] = sorted(
            (r["image_id"], r["keep"], r["scrubbed_caption"]) for r in res.collect()
        )
        assert 0 < len(outs[mode]) < 120
    assert outs["join"] == outs["fused"]


def test_run_pipeline_cli_quarantine(spark, tmp_path):
    """--quarantine drops corrupt payloads at stage 0; without it the same
    corrupt corpus fails inside --scrub-payload-metadata."""
    from ccnet_spark_spark.schema import PAIRS_SCHEMA
    from ccnet_spark_spark.synth import gen_quarantine_pairs, generate_pairs

    inp = str(tmp_path / "pairs_corrupt")
    corrupt = spark.createDataFrame(gen_quarantine_pairs(3), schema=PAIRS_SCHEMA)
    generate_pairs(spark, 40).unionByName(corrupt).write.parquet(inp)
    out = str(tmp_path / "out_quarantine")
    rc = run_pipeline.main(
        [
            "--input", inp, "--output", out, "--cutoffs", CUTOFFS, "--min-len", "10",
            "--quarantine", "--scrub-payload-metadata",
        ],
        stop_session=False,
    )
    assert rc == 0
    ids = {r.image_id for r in spark.read.parquet(out).select("image_id").collect()}
    assert not any(i.startswith(("img_bad_", "img_dims_")) for i in ids)
    assert any(i.startswith("img_ok_copy_") for i in ids)
