"""A/B bench for Bloom-prefiltered ingestion dedup in its WINNING regime.

The contract query `incremental_dedup_bloom` runs at a 250-doc corpus vs
a 770-row batch — a ratio where the bloom build is pure overhead and the
r4 bench line read as a 5x anti-win. The operator exists for the
opposite regime, benched here:

  corpus : 20,000,000 committed hashes, stored as the hash SIDECAR the
           resume protocol implies (at 10^12 scale the corpus hash
           projection is committed once, never re-derived from text per
           batch) — passed via corpus_hv_col
  batch  : 50,000-row increments, 10 % true duplicates of the corpus
  bloom  : built ONCE per committed snapshot (timed separately,
           amortized over every batch deduped against that snapshot),
           then per-batch scan-side probe + broadcast-sliver check — the
           corpus is only ever SCANNED, never shuffled
  exact  : per-batch anti-join against the full corpus sidecar

spark.sql.autoBroadcastJoinThreshold is DISABLED (-1, and the AQE
variant) to emulate the 10^12 regime where the corpus side exceeds any
broadcast limit — locally 2M hashes would broadcast and hide the
shuffle the exact path pays at scale. The bloom path's explicit
F.broadcast hints are on SLIVER-sized frames only, exactly as they
would be at scale.

Rounds are interleaved (exact, bloom, exact, bloom, ...) so host-load
drift hits both arms equally; min and median reported. Outputs are
asserted EQUAL each round (the bloom is a prefilter, not an
approximation).

Besides wall time, the bench records SHUFFLE BYTES per arm (delta of
the local block-manager dirs): on one box a 20M-hash shuffle moves
through memory/page cache and costs little wall time, so the arms look
comparable — but on a 1000-executor cluster that shuffle is NETWORK,
and the bloom arm's point is that it never shuffles the corpus at all
(scan + broadcast-sliver joins only). Shuffle volume is the
scale-transferable number; wall time here is dominated by the corpus
scan both arms share. m_bits is sized for the corpus (2^28 -> fpp ~0.2 % at
n=20M, k=5); the 32 MiB bit array ships as ONE sc.broadcast numpy
array, created once and passed by handle to every batch (see
bloom_might_contain's broadcast strategy).

Prints one JSON line; recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_N = 20_000_000
BATCH_N = 50_000
DUP_FRAC = 0.1
M_BITS = 1 << 28
ROUNDS = 5


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ccnet_spark_spark.functions.hashing import line_hash_expr
    from ccnet_spark_spark.functions.normalize import normalize_for_dedup_expr
    from ccnet_spark_spark.operators import dedup
    from ccnet_spark_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_bloom", cores=cpus)
    entrymod._ensure_pkg(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # deterministic distinct texts; ids are LETTER-encoded because the
    # ccnet dedup normalization maps every digit to 0 (digit-bearing ids
    # would collapse to one hash)
    def letters(c):
        return F.translate(F.conv(c.cast("string"), 10, 16), "0123456789", "ghijklmnop")

    def text(c):
        return F.concat(
            F.lit("committed document body "),
            letters(c),
            F.lit(" with enough distinct words to hash "),
            letters(c * 7),
        )

    hv = line_hash_expr(normalize_for_dedup_expr(text(F.col("id"))))
    base = f"/tmp/ccnet_bench_bloom_v2_{CORPUS_N}"
    sidecar_path, batch_path = base + "_sidecar", base + "_batch"
    if not os.path.exists(os.path.join(sidecar_path, "_SUCCESS")):
        # the committed snapshot's hash sidecar: hashed ONCE at commit time
        spark.range(CORPUS_N).select(hv.alias("hv")).repartition(cpus).write.mode(
            "overwrite"
        ).parquet(sidecar_path)
    if not os.path.exists(os.path.join(batch_path, "_SUCCESS")):
        n_dup = int(BATCH_N * DUP_FRAC)
        news = spark.range(CORPUS_N, CORPUS_N + BATCH_N - n_dup).select(
            F.col("id").alias("doc_id"), text(F.col("id")).alias("text")
        )
        dups = spark.range(n_dup).select(
            (F.col("id") + 9_000_000).alias("doc_id"), text(F.col("id")).alias("text")
        )
        news.union(dups).repartition(8).write.mode("overwrite").parquet(batch_path)

    sidecar = spark.read.parquet(sidecar_path)
    batch = spark.read.parquet(batch_path)

    # per-snapshot bloom build (amortized over every batch against this
    # snapshot)
    import numpy as np

    t0 = time.time()
    words = dedup.build_bloom_words(sidecar.select(F.col("hv").alias("_hv")), "_hv", m_bits=M_BITS)
    words = spark.sparkContext.broadcast(np.array(words, dtype=np.int64))
    build_sec = time.time() - t0

    def exact():
        return dedup.incremental_dedup(
            batch, sidecar, "doc_id", "text", corpus_hv_col="hv"
        ).count()

    def bloom():
        return dedup.incremental_dedup_bloom(
            batch, sidecar, "doc_id", "text", words=words, corpus_hv_col="hv"
        ).count()

    import glob

    def shuffle_disk_bytes() -> int:
        total = 0
        for d in glob.glob("/tmp/blockmgr-*"):
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total

    exact(), bloom()  # untimed warmup (JIT + python worker spin-up)

    exact_t, bloom_t, exact_sh, bloom_sh = [], [], [], []
    expected = None
    for _ in range(ROUNDS):
        s0 = shuffle_disk_bytes()
        t0 = time.time()
        n_exact = exact()
        exact_t.append(time.time() - t0)
        s1 = shuffle_disk_bytes()
        exact_sh.append(max(0, s1 - s0))
        t0 = time.time()
        n_bloom = bloom()
        bloom_t.append(time.time() - t0)
        bloom_sh.append(max(0, shuffle_disk_bytes() - s1))
        assert n_exact == n_bloom, (n_exact, n_bloom)
        expected = n_exact

    print(
        json.dumps(
            {
                "metric": "bloom_prefilter_ingestion_dedup",
                "corpus_rows": CORPUS_N,
                "batch_rows": BATCH_N,
                "dup_frac": DUP_FRAC,
                "m_bits": M_BITS,
                "survivors": expected,
                "bloom_build_sec": round(build_sec, 3),
                "exact_per_batch_sec": {
                    "min": round(min(exact_t), 3),
                    "median": round(statistics.median(exact_t), 3),
                },
                "bloom_per_batch_sec": {
                    "min": round(min(bloom_t), 3),
                    "median": round(statistics.median(bloom_t), 3),
                },
                "exact_shuffle_mb_median": round(
                    statistics.median(exact_sh) / 1e6, 2
                ),
                "bloom_shuffle_mb_median": round(
                    statistics.median(bloom_sh) / 1e6, 2
                ),
                "cpus": cpus,
                "rounds": ROUNDS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
