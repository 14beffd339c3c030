"""The join-back of verdict labels to the wide payload table is THE
unavoidable shuffle of the naive plan. At scale the input and label tables
are bucketed by image_id (Iceberg: bucket(N, image_id) partition transform,
or Spark bucketBy) so the join is storage-partitioned — no Exchange on
either side. This test proves the engine's claim on Spark's built-in
bucketed tables."""

import pyspark.sql.functions as F

from ccnet_spark_spark.synth import generate_pairs


def test_bucketed_join_back_is_shuffle_free(spark, tmp_path):
    spark.sql("drop table if exists pairs_b")
    spark.sql("drop table if exists labels_b")
    pairs = generate_pairs(spark, 300)
    pairs.write.bucketBy(4, "image_id").sortBy("image_id").saveAsTable("pairs_b")
    labels = pairs.select("image_id", (F.length("caption") >= 300).alias("keep"))
    labels.write.bucketBy(4, "image_id").sortBy("image_id").saveAsTable("labels_b")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("pairs_b").join(spark.table("labels_b"), "image_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, f"bucketed join should not shuffle:\n{plan[:1500]}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert joined.count() == 300
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists pairs_b")
        spark.sql("drop table if exists labels_b")
