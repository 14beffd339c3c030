"""image_stats value oracle: the mapInPandas decode+stats path must equal a
pure-pandas recompute over the same deterministic pairs (no Spark on the
oracle side). Closes the round-1 gap where image_stats was rows-only."""

import numpy as np
import pandas as pd

from ccnet_spark_spark import codecs
from ccnet_spark_spark.operators.multimodal import _ahash, image_stats
from ccnet_spark_spark.synth import gen_pandas, generate_pairs

N = 60


def _pandas_oracle() -> pd.DataFrame:
    src = gen_pandas(0, N)
    rows = []
    for r in src.itertuples():
        px = codecs.decode(bytes(r.bytes), r.fmt)
        means = px.reshape(-1, 3).mean(axis=0)
        rows.append(
            {
                "image_id": r.image_id,
                "w": px.shape[1],
                "h": px.shape[0],
                "fmt": r.fmt,
                "mean_r": float(means[0]),
                "mean_g": float(means[1]),
                "mean_b": float(means[2]),
                "brightness": float(means.mean()),
                "phash_check": _ahash(px),
            }
        )
    return pd.DataFrame(rows).sort_values("image_id").reset_index(drop=True)


def test_image_stats_matches_pandas_oracle(spark):
    got = (
        image_stats(generate_pairs(spark, N))
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = _pandas_oracle()
    assert list(got.columns) == list(exp.columns)
    assert len(got) == N
    pd.testing.assert_frame_equal(got.astype({"w": "int64", "h": "int64"}),
                                  exp.astype({"w": "int64", "h": "int64"}),
                                  check_exact=False, rtol=0, atol=1e-9)
    # lossless ppm payloads must reproduce the stored phash exactly
    src = gen_pandas(0, N)[["image_id", "fmt", "phash"]]
    merged = got.merge(src, on="image_id")
    ppm = merged[merged["fmt_y"] == "ppm"] if "fmt_y" in merged else merged[merged["fmt"] == "ppm"]
    assert len(ppm) > 0
    assert (ppm["phash_check"] == ppm["phash"]).all()


def test_image_stats_brightness_is_channel_mean(spark):
    got = image_stats(generate_pairs(spark, 20)).toPandas()
    calc = (got["mean_r"] + got["mean_g"] + got["mean_b"]) / 3
    assert np.allclose(got["brightness"], calc, atol=1e-9)
