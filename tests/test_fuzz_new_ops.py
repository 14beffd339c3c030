"""Cross-engine fuzz for the round-2 operators: random + planted-edge-case
strings through the Spark expression AND its DuckDB twin must agree exactly
(same pattern as test_step_prefixes' normalize/scrub fuzz). Short texts are
deliberately over-represented — the round-1 shingle crash lived there."""

import duckdb
import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from ccnet_spark_spark.functions import hashing, textstats
from ccnet_spark_spark.operators.chunk import chunk_text, chunk_text_sql

EDGES = [
    "",
    " ",
    "   ",
    "one",
    "two words",
    "a b",
    "\tleading tab",
    "trailing space ",
    "  double  spaces  inside  ",
    "digits 123 456 789 mixed",
    "élégant café crème fenêtre",
    "山河 湖海 天空",
    "newline\nin the middle",
    "punct!!! only??? ...",
]


def _corpus(n=120):
    rng = np.random.default_rng(1234)
    words = ["the", "fox", "a", "0", "héllo", "x" * 12, "山", "w!rd", ""]
    out = list(EDGES)
    for _ in range(n - len(EDGES)):
        k = int(rng.integers(0, 9))  # heavy weight on short docs
        out.append(" ".join(rng.choice(words, size=k)))
    return pd.DataFrame({"doc_id": range(len(out)), "text": out})


def _duck(pdf):
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


def test_fuzz_chunking_cross_engine(spark):
    pdf = _corpus()
    sdf = spark.createDataFrame(pdf)
    got = (
        chunk_text(sdf, "doc_id", "text", chunk_tokens=7, overlap=2)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    exp = (
        _duck(pdf)
        .execute(chunk_text_sql("documents", "doc_id", "text", chunk_tokens=7, overlap=2))
        .df()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert list(got["chunk"]) == list(exp["chunk"])
    assert list(got["n_tokens"]) == list(exp["n_tokens"])


def test_fuzz_repetition_ratio_cross_engine(spark):
    pdf = _corpus()
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "doc_id",
            textstats.repetition_ratio_expr("text", 1).alias("r1"),
            textstats.repetition_ratio_expr("text", 2).alias("r2"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _duck(pdf)
        .execute(
            f"select doc_id, {textstats.repetition_ratio_sql('text', 1)} as r1, "
            f"{textstats.repetition_ratio_sql('text', 2)} as r2 from documents"
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(got["r1"], exp["r1"], atol=1e-9)
    assert np.allclose(got["r2"], exp["r2"], atol=1e-9)


def test_fuzz_shingles_cross_engine(spark):
    pdf = _corpus()
    sdf = spark.createDataFrame(pdf)
    toks = F.split(F.col("text"), "\\s+")
    got = {
        r["doc_id"]: list(r["sh"])
        for r in sdf.select(
            "doc_id", hashing.word_shingles_expr(toks, n=3).alias("sh")
        ).collect()
    }
    sql = (
        "select doc_id, list_transform(range(0, greatest(len(toks) - 2, 0)), "
        "i -> list_extract(toks, i + 1) || ' ' || list_extract(toks, i + 2) || ' ' || list_extract(toks, i + 3)) as sh "
        "from (select doc_id, regexp_split_to_array(text, '\\s+') as toks from documents)"
    )
    exp = {r[0]: list(r[1]) for r in _duck(pdf).execute(sql).fetchall()}
    assert got == exp
