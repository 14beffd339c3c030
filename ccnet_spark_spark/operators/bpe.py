"""On-corpus BPE tokenizer TRAINING — the offline step behind the
reference's SentencePiece model (cc_net ships per-language sp.model
artifacts it trained elsewhere; pipe_tokenized.py:24-33 only loads them).
Like the perplexity-cutoff trainer (operators/bucket.py), the engine
implements the trainer itself, Spark-shaped.

Scale shape — the corpus is touched ONCE: the only corpus-sized pass
builds the (word, freq) vocabulary (explode + groupBy, map-side partial
counts). Every BPE merge iteration then runs over the VOCAB-sized frame
(|distinct words| — thousands-to-millions of rows even at 100 TB, and
each row is a short symbol array):

- pair statistics: explode adjacent symbol pairs weighted by word freq,
  one groupBy; the winner is max by (count, then lexical pair) — a
  deterministic total order, so training is reproducible across
  partitionings and engines;
- merge application is the canonical leftmost-greedy list merge in a
  pandas UDF. This is a deliberate exception to the JVM-only rule: the
  frame it runs over is the VOCABULARY, not the corpus (the corpus never
  crosses Python), and the equivalent single-pass JVM string replace is
  NOT standard BPE (on a run like "a a a a" one non-rescanning pass
  yields [aa, a, a] where BPE's same-pass scan yields [aa, aa]);
- the driver holds only the merge list (num_merges rows); the vocab frame
  is localCheckpoint'd each round so the replayed lineage stays flat
  (same pattern as connected components).

The oracle is a checked-in fixture from an INDEPENDENT pure-Python BPE
(tools/make_fixtures.py — Counter over tuples, explicit merge loop;
shares nothing with this implementation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased whitespace-split corpus — the one
    corpus-sized pass. Empty tokens (from empty docs) are dropped."""
    return (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _make_merge_udf(left: str, right: str):
    @F.pandas_udf("array<string>")
    def merge_udf(sym: pd.Series) -> pd.Series:
        merged = left + right
        out = []
        for s in sym:
            s = list(s)
            res, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == left and s[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return merge_udf


def train_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Returns (merges, vocab):
    merges — (rank int, left string, right string, merged string,
    pair_count long), the learned merge table in application order;
    vocab — (word, symbols string [space-joined], freq) after ALL merges,
    i.e. the trained tokenizer applied to its own vocabulary — trainer and
    encoder checked in one artifact."""
    vocab = (
        build_word_vocab(df, text_col)
        .withColumn("sym", F.expr("filter(split(word, ''), x -> x != '')"))
        .localCheckpoint()
    )
    merges = []
    for rank in range(num_merges):
        pairs = (
            vocab.where(F.size("sym") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(sym, 1, size(sym) - 1), (x, i) -> struct(x as l, sym[i + 1] as r))"
                    )
                ).alias("_p"),
            )
            .groupBy(F.col("_p.l").alias("left"), F.col("_p.r").alias("right"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        vocab = vocab.withColumn("sym", _make_merge_udf(left, right)(F.col("sym"))).localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )
    vocab_df = vocab.select("word", F.array_join(F.col("sym"), " ").alias("symbols"), "freq")
    return merges_df, vocab_df
