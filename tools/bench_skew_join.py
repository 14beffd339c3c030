"""Measured AQE skew-JOIN A/B (SCALE.md evidence; complements
tools/bench_skew.py, which covers the UDF-stage skew the salted
repartition owns).

The north rule calls for "salted repartitioning AND AQE skew-join hints".
Salting is measured (10.4x, BENCH.md); this script measures the OTHER
mechanism on the shape it owns: a sort-merge JOIN whose left side is
dominated by one hot key (99% of rows), joined to a non-broadcastable
dim, with per-row expression work AFTER the join (the realistic regime —
joined rows get processed, and that work rides the join partitions).
With spark.sql.adaptive.skewJoin disabled the hot partition runs as ONE
task end-to-end; enabled, AQE splits it at runtime (OptimizeSkewedJoin)
into advisory-sized slices and the post-join work parallelizes with it.

Skew thresholds are scaled DOWN to the test corpus
(skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes) — at
production scale the 256 MB defaults fire on the same shape; the
mechanism, not the constant, is what transfers.

Usage: python tools/bench_skew_join.py [n_rows] [rounds] [cores]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from ccnet_spark_spark.session import get_spark

    spark = get_spark(app_name="skew_join_ab", cores=CORES)
    # the join must not broadcast (the regime AQE skew-join exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    # fact: 99% of rows carry key 0 (one hot language/domain); ~220 B rows
    fact = (
        spark.range(0, N_ROWS, 1, 64)
        .withColumn(
            "key",
            F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(1000))
            ),
        )
        .withColumn("payload", F.concat(F.lit("x" * 200), F.col("id").cast("string")))
    )
    dim = (
        spark.range(0, 1000, 1, 8)
        .withColumnRenamed("id", "key")
        .withColumn("dim_payload", F.concat(F.lit("y" * 100), F.col("key").cast("string")))
    )

    def run():
        j = fact.join(dim, "key").withColumn(
            "z",
            F.length(
                F.regexp_replace(F.concat("payload", "dim_payload"), "xy|yx", "z")
            ),
        )
        return j.agg(F.sum("z"), F.count(F.lit(1))).collect()

    arms = ("skewjoin_off", "skewjoin_on")

    def set_arm(arm: str) -> None:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if arm == "skewjoin_on" else "false",
        )

    for arm in arms:  # untimed warmup
        set_arm(arm)
        run()

    times: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(ROUNDS):
        for arm in arms:  # interleaved (shared-host methodology)
            set_arm(arm)
            t0 = time.time()
            run()
            times[arm].append(time.time() - t0)

    for arm in arms:
        t = times[arm]
        print(
            f"{arm}: min {min(t):.2f} s  median {statistics.median(t):.2f} s  "
            f"({', '.join(f'{x:.2f}' for x in t)})"
        )
    print(
        f"speedup (min-based): {min(times['skewjoin_off']) / min(times['skewjoin_on']):.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
