"""SimHash value-level oracle (VERDICT round-1 gap: simhash was rows-only).

The 64-bit blake2b-derived bit math cannot run in DuckDB (no blake2b, no
portable bit ops over 64-bit unsigned), so the oracle is the pure-Python
pandas twin — computed WITHOUT Spark — compared value-for-value against the
Arrow-UDF result over the driver's own documents parquet, plus pinned
expected hashes so the function itself cannot silently drift.
"""

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from ccnet_spark_spark.functions.hashing import make_simhash_udf, simhash64, simhash_pandas

SF_DIR = "/root/testdata/sf0.001"


def test_simhash_pinned_values():
    # regression pins: any change to the hash function breaks these loudly
    assert simhash64("the quick brown fox".split()) == -6026860803028612288
    assert simhash64([]) == 0
    assert simhash64(["a"]) == simhash64(["a"])  # deterministic
    assert simhash64(["a", "a"]) == simhash64(["a"])  # weight stacking keeps sign


def test_simhash_near_duplicates_close():
    a = simhash64("the quick brown fox jumps over the lazy dog".split())
    b = simhash64("the quick brown fox jumps over the lazy cat".split())
    c = simhash64("completely unrelated words about something else entirely".split())
    ham = lambda x, y: bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")  # noqa: E731
    assert ham(a, b) < ham(a, c)


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="driver testdata absent")
def test_simhash_spark_matches_pandas_oracle(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = (
        docs.select("doc_id", make_simhash_udf()(F.col("text")).alias("simhash"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    raw = docs.select("doc_id", "text").toPandas().sort_values("doc_id").reset_index(drop=True)
    expected = simhash_pandas(raw["text"])
    assert len(got) > 0
    pd.testing.assert_series_equal(
        got["simhash"].astype("int64"), expected.rename("simhash"), check_names=False
    )
