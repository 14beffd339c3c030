"""The xxhash64 fast-path must produce identical keep/drop labels to the
oracle-reproducible sha2 default (hash choice only changes the dedup key
encoding, not semantics, absent collisions)."""

from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
from ccnet_spark_spark.plans.pipeline import Config, Pipeline
from ccnet_spark_spark.synth import generate_pairs


def test_xxhash64_labels_match_sha2(spark):
    cutoffs = load_cutoffs_dict()
    pairs = generate_pairs(spark, 400)
    cols = ["image_id", "keep", "drop_reason", "dedup_caption", "bucket"]
    a = (
        Pipeline(spark, Config(cutoffs=cutoffs, hash_algo="sha2"))
        .run(pairs)
        .select(*cols)
        .orderBy("image_id")
        .collect()
    )
    b = (
        Pipeline(spark, Config(cutoffs=cutoffs, hash_algo="xxhash64"))
        .run(pairs)
        .select(*cols)
        .orderBy("image_id")
        .collect()
    )
    assert a == b


def test_results_invariant_to_partitioning(spark):
    """Verdicts must not depend on physical partitioning (catches
    accidental partition-local logic in a global-semantics pipeline)."""
    cutoffs = load_cutoffs_dict()
    cols = ["image_id", "keep", "drop_reason", "dedup_caption", "bucket", "scrubbed_caption"]
    base = generate_pairs(spark, 300)
    a = (
        Pipeline(spark, Config(cutoffs=cutoffs))
        .run(base.repartition(3))
        .select(*cols).orderBy("image_id").collect()
    )
    b = (
        Pipeline(spark, Config(cutoffs=cutoffs))
        .run(base.repartition(17))
        .select(*cols).orderBy("image_id").collect()
    )
    assert a == b
