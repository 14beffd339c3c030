"""Token-window chunking + repetition-ratio quality signal."""

import pyspark.sql.functions as F
import pytest

from ccnet_spark_spark.functions import textstats
from ccnet_spark_spark.operators.chunk import chunk_text


def test_chunk_covers_all_tokens_with_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([("d0", " ".join(words))], ["doc_id", "text"])
    out = chunk_text(df, "doc_id", "text", chunk_tokens=5, overlap=2).collect()
    # stride 3, n=10 -> ceil(8/3)=3 chunks at offsets 0,3,6
    chunks = {r["chunk_id"]: r["chunk"].split() for r in out}
    assert len(chunks) == 3
    assert chunks[0] == words[0:5]
    assert chunks[1] == words[3:8]
    assert chunks[2] == words[6:10]  # final chunk short (4 tokens)
    assert out[2]["n_tokens"] == 4
    covered = set()
    for c in chunks.values():
        covered.update(c)
    assert covered == set(words)


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([("d0", "just three words"), ("d1", "one")], ["doc_id", "text"])
    out = chunk_text(df, "doc_id", "text", chunk_tokens=128, overlap=16).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 2  # exactly one chunk each
    assert by_id["d0"]["chunk"] == "just three words"
    assert by_id["d1"]["n_tokens"] == 1


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([("d0", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_repetition_ratio_values(spark):
    df = spark.createDataFrame(
        [
            ("unique", "alpha beta gamma delta"),
            ("tripled", "spam spam spam"),
            ("bigram_loop", "go stop go stop go"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["w"], r["b"])
        for r in df.select(
            "doc_id",
            textstats.repetition_ratio_expr("text", 1).alias("w"),
            textstats.repetition_ratio_expr("text", 2).alias("b"),
        ).collect()
    }
    assert got["unique"] == (0.0, 0.0)
    assert got["tripled"][0] == pytest.approx(1 - 1 / 3, abs=1e-4)
    # bigrams: [go stop, stop go, go stop, stop go] -> 2 distinct of 4
    assert got["bigram_loop"][1] == pytest.approx(0.5, abs=1e-4)


def test_repetition_ratio_short_text_no_crash(spark):
    df = spark.createDataFrame([("d0", ""), ("d1", "one")], ["doc_id", "text"])
    rows = df.select(
        textstats.repetition_ratio_expr("text", 2).alias("b")
    ).collect()
    assert [r["b"] for r in rows] == [0.0, 0.0]
