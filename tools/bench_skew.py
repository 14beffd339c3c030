"""Measured salted-vs-unsalted skew A/B (SCALE.md evidence).

The model stages (Arrow UDFs) run after a repartition on the language key;
the synthetic corpus is en-dominant, so a plain repartition("lang") funnels
most rows into one partition and the stage runs at single-task speed.
salted_repartition (lang, deterministic salt) spreads the hot key over
salt_buckets partitions. This script times the SAME fused tokenize+pp stage
over the SAME input under three partitionings, interleaved per round
(shared-host methodology, see BENCH.md):

  by-lang    repartition(N, lang)             -- the skewed shape
  salted     salted_repartition(N, lang)      -- the engine's shape
  round-robin repartition(N)                  -- skew-free upper bound

Usage: python tools/bench_skew.py [n_rows] [rounds] [cores]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from ccnet_spark_spark.operators.lid import salted_repartition
    from ccnet_spark_spark.operators.perplexity import with_tokenized_and_perplexity
    from ccnet_spark_spark.session import get_spark
    from ccnet_spark_spark.synth import write_pairs

    spark = get_spark(app_name="skew_ab", cores=CORES)
    path = f"/tmp/ccnet_skew_pairs_n{N_ROWS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_pairs(spark, path, N_ROWS, partitions=64)
    base = (
        spark.read.parquet(path)
        .select("image_id", "caption")
        .withColumn("lang", F.lit("en"))  # worst case: ONE hot key
        .withColumn("dedup_caption", F.col("caption"))
    )

    def stage(df):
        return with_tokenized_and_perplexity(df).select(F.count("perplexity")).collect()

    variants = {
        "by_lang": lambda: stage(base.repartition(CORES, F.col("lang"))),
        "salted": lambda: stage(salted_repartition(base, CORES, "lang", id_col="image_id")),
        "round_robin": lambda: stage(base.repartition(CORES)),
    }
    for fn in variants.values():  # untimed warmup
        fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.time()
            fn()
            times[name].append(time.time() - t0)
    print("| variant | min sec | median sec |")
    print("|---|---|---|")
    for name, ts in times.items():
        print(f"| {name} | {min(ts):.2f} | {statistics.median(ts):.2f} |")
    by_lang, salted = min(times["by_lang"]), min(times["salted"])
    print(f"salting speedup on the hot-key stage: {by_lang / salted:.2f}x")


if __name__ == "__main__":
    main()
