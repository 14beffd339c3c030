"""image_quality_gates: LAION/DataComp-style metadata+caption gates.

Covers what the oracle row can't: NULL metadata handling (fail-the-gate,
never NULL-propagate into keep), reason priority order, keep == AND of
all gates, plan purity (scan-side only: no shuffle, no Python, bytes
pruned), and fixture freshness for pairs400_meta.parquet.
"""

import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ccnet_spark_spark.operators.image_quality import (  # noqa: E402
    GATE_REASONS,
    ImageGateConfig,
    image_quality_gates,
)
from ccnet_spark_spark.schema import PAIRS_SCHEMA  # noqa: E402

GATE_NAMES = [n for n, _ in GATE_REASONS]


def _mk(spark, rows):
    return spark.createDataFrame(rows, PAIRS_SCHEMA)


def _row(image_id="img0", bytes_=b"x" * 2000, w=64, h=64, fmt="ppm",
         caption="the quick brown fox jumps", phash=0):
    return (image_id, bytearray(bytes_), w, h, fmt, caption, phash)


def test_clean_row_keeps(spark):
    out = image_quality_gates(_mk(spark, [_row()])).collect()[0]
    assert out.keep is True and out.reason == "ok"
    assert all(out[g] for g in GATE_NAMES)


@pytest.mark.parametrize(
    "patch, failed_gate, reason",
    [
        (dict(w=16), "dims_ok", "bad_dims"),
        (dict(w=None), "dims_ok", "bad_dims"),
        (dict(w=64, h=16), "dims_ok", "bad_dims"),
        (dict(w=128, h=32), "aspect_ok", "bad_aspect"),
        (dict(fmt="gif"), "fmt_ok", "bad_fmt"),
        (dict(fmt=None), "fmt_ok", "bad_fmt"),
        (dict(bytes_=b"x" * 100), "bytes_ok", "too_few_bytes"),
        (dict(bytes_=None), "bytes_ok", "too_few_bytes"),
        (dict(caption="hi"), "caption_chars_ok", "caption_len"),
        (dict(caption="x" * 6000), "caption_chars_ok", "caption_len"),
        (dict(caption=None), "caption_chars_ok", "caption_len"),
        (dict(caption="hello world"), "caption_words_ok", "too_few_words"),
        (dict(caption="call 123 456 789 000"), "digit_ok", "digit_heavy"),
    ],
)
def test_single_gate_failures(spark, patch, failed_gate, reason):
    if "bytes_" in patch and patch["bytes_"] is None:
        row = ("img0", None, 64, 64, "ppm", "the quick brown fox jumps", 0)
    elif "caption" in patch and patch["caption"] is None:
        row = ("img0", bytearray(b"x" * 2000), 64, 64, "ppm", None, 0)
    else:
        row = _row(**patch)
    out = image_quality_gates(_mk(spark, [row])).collect()[0]
    assert out[failed_gate] is False
    assert out.keep is False
    assert out.reason == reason


def test_reason_is_first_failure_in_priority_order(spark):
    # fails dims AND digit ratio -> reason must be the higher-priority bad_dims
    row = _row(w=16, caption="call 123 456 789 000")
    out = image_quality_gates(_mk(spark, [row])).collect()[0]
    assert out.reason == "bad_dims"
    assert out.digit_ok is False and out.dims_ok is False


def test_keep_equals_conjunction(spark):
    from ccnet_spark_spark.synth import generate_pairs

    pdf = image_quality_gates(generate_pairs(spark, 120)).toPandas()
    assert (pdf["keep"] == pdf[GATE_NAMES].all(axis=1)).all()
    assert ((pdf["reason"] == "ok") == pdf["keep"]).all()


def test_aspect_bound_is_integer_exact(spark):
    cfg = ImageGateConfig(aspect_num=3, aspect_den=2)  # longer <= 1.5x shorter
    rows = [_row(image_id="a", w=48, h=32), _row(image_id="b", w=49, h=32)]
    out = {r.image_id: r.aspect_ok for r in image_quality_gates(_mk(spark, rows), cfg).collect()}
    assert out == {"a": True, "b": False}


def test_plan_is_scan_side_only(spark):
    from ccnet_spark_spark.synth import generate_pairs

    df = image_quality_gates(generate_pairs(spark, 50))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # the generator itself is mapInPandas; the GATES must add no Python
    assert plan.count("ArrowEvalPython") == 0 and plan.count("BatchEvalPython") == 0, plan


def test_gates_prune_bytes_on_parquet_scan(spark, tmp_path):
    from ccnet_spark_spark.synth import generate_pairs

    p = str(tmp_path / "pairs.parquet")
    generate_pairs(spark, 50).write.parquet(p)
    # min_bytes=0 disables the only bytes-touching gate -> the payload
    # column must vanish from the parquet ReadSchema (column pruning)
    gates = image_quality_gates(spark.read.parquet(p), ImageGateConfig(min_bytes=0))
    plan = gates._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "bytes" not in read_schema, read_schema
    assert gates.collect()[0].bytes_ok is True
    # with the gate enabled, bytes IS in the schema (length needs the value)
    plan_on = image_quality_gates(spark.read.parquet(p))._jdf.queryExecution().executedPlan().toString()
    assert "bytes" in plan_on.split("ReadSchema:")[-1].splitlines()[0]


def test_meta_fixture_fresh():
    from ccnet_spark_spark.synth import gen_pandas

    disk = pd.read_parquet(os.path.join(REPO, "fixtures", "pairs400_meta.parquet"))
    assert len(disk) == 400, "stale fixture — rerun `python tools/make_fixtures.py`"
    regen = gen_pandas(0, 25)
    regen["n_bytes"] = regen["bytes"].map(len)
    regen = regen[["image_id", "w", "h", "fmt", "n_bytes", "caption"]]
    pd.testing.assert_frame_equal(disk.head(25), regen, check_dtype=False)


def test_pipeline_image_gates_prefilter(spark):
    """Config.image_gates composes the gates as the FIRST filter: output
    ids == ungated pipeline run over the manually-gated input (order
    matters — gating precedes global line dedup)."""
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    cutoffs = {lang: (300.0, 340.0) for lang in ("en", "de", "fr", "es", "zh")}
    pairs = generate_pairs(spark, 150)
    gated = Pipeline(spark, Config(cutoffs=cutoffs, image_gates=True)).run(pairs)
    manual = Pipeline(spark, Config(cutoffs=cutoffs)).run(
        pairs.join(image_quality_gates(pairs).where("keep").select("image_id"), "image_id")
    )
    got = {r.image_id: (r.keep, r.bucket) for r in gated.select("image_id", "keep", "bucket").collect()}
    exp = {r.image_id: (r.keep, r.bucket) for r in manual.select("image_id", "keep", "bucket").collect()}
    assert got == exp and 0 < len(got) < 150
