"""SparkSession factory.

Mirrors the session concerns of the reference (Arrow for pandas
interchange, tuned shuffle partitions — /root/reference/test_pipeline.py:80-95)
but adds the scale knobs the reference left to spark-submit conf
(/root/reference/cluster_run.sh:14-44): AQE with skew-join handling,
explicit shuffle-partition sizing, UTC timezone (for oracle comparison),
and optional Iceberg catalog wiring gated on the runtime jar being present.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for a local[N] single-JVM sandbox; on a real cluster these
# are overridden by spark-submit conf (executor memory/cores, shuffle service,
# dynamic allocation) — the code below never assumes local mode.
_LOCAL_DRIVER_MEMORY = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")


def iceberg_configured() -> bool:
    """True if an Iceberg runtime jar is importable on the Spark classpath.

    The production deployment reads/writes Iceberg tables; this sandbox image
    has no iceberg-spark-runtime jar, so table IO falls back to
    hive-partitioned parquet with the same logical contract
    (see sources/tables.py).
    """
    import glob

    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*"))
    return bool(jars) or bool(os.environ.get("SPARK_GRAFT_ICEBERG_JAR"))


def get_spark(
    app_name: str = "ccnet_spark_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    cores: int N -> master local[N]; None -> local[*] (or inherit an
    existing session / spark-submit master).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_cores = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
    if shuffle_partitions is None:
        # ~cores for local runs; a real cluster submit overrides this
        # (rule of thumb: 2-3x total executor cores, or rely on AQE coalesce).
        shuffle_partitions = max(int(n_cores), 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", _LOCAL_DRIVER_MEMORY)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # Keep binary image payloads from blowing file-split planning:
        # 128MB splits are the parquet default sweet spot at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if iceberg_configured():
        # Production path: a hadoop-catalog Iceberg warehouse. Safe to set
        # only when the jar is actually on the classpath.
        warehouse = os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/ccnet_spark_warehouse")
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", warehouse)
        )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
