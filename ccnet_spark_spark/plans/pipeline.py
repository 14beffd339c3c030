"""The end-to-end quality-filter pipeline.

Step list mirrors the reference's 9-step enum
(/root/reference/pipe_line.py:37-59: real_len -> hash -> dedup -> regroup ->
lid -> sp -> lm -> pp_bucket -> drop), re-planned Spark-first:

- every input row survives to the output with an auditable (keep,
  drop_reason) verdict instead of silently vanishing,
- the explode/dedup sub-plan is NARROW (image bytes never explode/shuffle;
  one join-back by image_id at the end — on Iceberg, a storage-partitioned
  join when the table is bucketed by image_id),
- model stages are Arrow pandas UDFs behind a salted repartition on
  (lang, salt) to spread language skew,
- bucketing is a broadcast join against the cutoff table,
- scrub is a codegen'd regexp_replace chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scrub import scrub_expr
from ..operators import bucket as bucket_op
from ..operators import dedup, lid, perplexity, tokenize, verdict
from ..operators.length import DEFAULT_MIN_LEN

# Step names (superset of the reference enum; scrub/verdict are north_rule
# additions).
ALL_STEPS = ["real_len", "dedup", "lid", "sp", "lm", "pp_bucket", "scrub", "verdict", "drop"]


@dataclass
class Config:
    min_len: int = DEFAULT_MIN_LEN
    dedup_variant: str = "keep"  # "keep" | "nokeep" (reference H5/H6)
    hash_algo: str = "sha2"  # "sha2" (oracle-reproducible) | "xxhash64" (fast path)
    lid_model_path: str | None = None
    lid_threshold: float = 0.5
    lm_dir: str | None = None
    selected_langs: list[str] | None = None
    cutoffs: dict[str, tuple[float, float]] | None = None
    cutoffs_csv: str | None = None
    salt_partitions: int | None = None  # None -> spark default parallelism
    sample_rate: float | None = None  # reference isSample/sampleRate knob
    fuse_lm: bool = True  # tokenize+perplexity in one Arrow crossing
    drop_tokenized: bool = True  # reference DROP step (pipe_line.py:342-343)
    steps: list[str] = field(default_factory=lambda: list(ALL_STEPS))


class Pipeline:
    def __init__(self, spark: SparkSession, config: Config | None = None):
        self.spark = spark
        self.config = config or Config()

    def run(self, pairs: DataFrame) -> DataFrame:
        cfg = self.config
        df = pairs
        if cfg.sample_rate:
            df = df.sample(fraction=cfg.sample_rate, seed=42)

        # real_len + original_* (reference P1 + regroup renames H7)
        base = (
            df.withColumn("original_length", F.length("caption").cast("int"))
            .withColumn("original_nlines", F.size(F.split(F.col("caption"), "\n")).cast("int"))
            # coalesce: a NULL caption is "too short", not a dedup casualty
            .withColumn("too_short", F.coalesce(F.col("original_length") < cfg.min_len, F.lit(True)))
        )

        # --- narrow text plan: only (image_id, caption) for non-short docs ---
        docs = base.filter(~F.col("too_short")).select("image_id", "caption")
        enriched = dedup.line_dedup(
            docs, id_col="image_id", text_col="caption", variant=cfg.dedup_variant, hash_algo=cfg.hash_algo
        )
        if "lid" in cfg.steps:
            enriched = lid.with_lang(enriched, "dedup_caption", cfg.lid_model_path, cfg.lid_threshold)
            n_parts = cfg.salt_partitions or self.spark.sparkContext.defaultParallelism
            enriched = lid.salted_repartition(enriched, n_parts, "lang")
        if "sp" in cfg.steps and "lm" in cfg.steps and cfg.fuse_lm:
            # one Arrow crossing for tokenize+perplexity (see perplexity.py)
            enriched = perplexity.with_tokenized_and_perplexity(enriched, "dedup_caption", cfg.lm_dir)
        else:
            if "sp" in cfg.steps:
                enriched = tokenize.with_tokenized(enriched, "dedup_caption", cfg.lm_dir)
            if "lm" in cfg.steps:
                enriched = perplexity.with_perplexity(enriched, "tokenized", cfg.lm_dir)
        if cfg.drop_tokenized and "sp" in cfg.steps:
            enriched = enriched.drop("tokenized")

        # --- join the narrow results back to the wide payload rows ---
        out = base.join(enriched, on="image_id", how="left")

        if "pp_bucket" in cfg.steps:
            cutoffs_df = bucket_op.load_cutoffs(self.spark, cfg.cutoffs_csv, cfg.cutoffs)
            out = bucket_op.with_bucket(out, cutoffs_df)
        if "scrub" in cfg.steps:
            out = out.withColumn("scrubbed_caption", scrub_expr(F.coalesce(F.col("dedup_caption"), F.col("caption"))))
        if "verdict" in cfg.steps:
            out = verdict.with_verdict(out, cfg.selected_langs)
        return out.drop("too_short")
