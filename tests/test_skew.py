"""Salted repartition must actually spread the hot language: with ~55% of
rows in 'en', repartitioning by lang alone puts them all in one partition
(the straggler the reference suffered, /root/reference/pipe_line.py:289-290);
salting bounds the largest partition near the mean."""

import pyspark.sql.functions as F

from ccnet_spark_spark.operators.lid import salted_repartition


def _partition_sizes(df):
    return [len(p) for p in df.rdd.glom().collect()]


def test_salting_bounds_partition_skew(spark):
    n = 4000
    df = spark.range(n).withColumn(
        "lang", F.when(F.col("id") % 100 < 55, "en").otherwise((F.col("id") % 5).cast("string"))
    )
    by_lang = df.repartition(16, F.col("lang"))
    salted = salted_repartition(df, 16, "lang", salt_buckets=32)

    sizes_lang = _partition_sizes(by_lang)
    sizes_salted = _partition_sizes(salted)
    assert sum(sizes_lang) == sum(sizes_salted) == n
    # lang-only: the 'en' partition holds >=55% of all rows
    assert max(sizes_lang) >= 0.55 * n
    # salted: largest partition within 2x of the ideal mean
    assert max(sizes_salted) <= 2 * (n / 16)
