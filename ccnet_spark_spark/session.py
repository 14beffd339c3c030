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


def release_local_checkpoint(df) -> None:
    """Free the executor storage blocks behind a DataFrame returned by
    `localCheckpoint()`. `Dataset.unpersist()` only clears cache-manager
    entries — NOT the checkpointed RDD's blocks (verified empirically:
    `getRDDStorageInfo` still lists them afterwards); without this the
    blocks live until the JVM-side Dataset is garbage-collected, so an
    iterative trainer (BPE, connected components) accumulates one full
    vocab/label copy per round for the life of the session. Reaches the
    LogicalRDD's backing rdd through the query execution; best-effort
    (silent no-op when the plan isn't a checkpointed LogicalRDD)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _submitted_conf():
    """SparkConf carrying whatever spark-submit configured.

    Subtle but load-bearing: ``SparkConf()`` before the py4j gateway exists
    is a PURE-PYTHON empty conf — under spark-submit it would report no
    spark.master and get_spark would silently override the cluster master
    with local mode (verified: spark-submit --master local[3] resolved to
    local[*] without this). Initializing the gateway first attaches to the
    JVM spark-submit already launched (env PYSPARK_GATEWAY_PORT), whose
    system properties carry --master/--conf.

    ...but ONLY attach, never spawn: in a plain python launch,
    _ensure_initialized would start the JVM BEFORE the builder sets
    spark.driver.memory, which is pre-launch-only — the driver would
    silently run on the 1g default heap and OOM on real inputs (verified:
    the 480k-pair pipeline OOMed exactly this way). So the gateway is
    touched only when spark-submit already created it (PYSPARK_GATEWAY_PORT
    in the env) or a context already exists in-process."""
    from pyspark import SparkConf

    try:
        # 4.x module path first, then the 3.x path: a blanket failure here
        # would silently re-introduce the cluster-master-downgrade bug on
        # PySpark 3 clusters (ADVICE r2).
        try:
            from pyspark.core.context import SparkContext  # PySpark >= 4
        except ImportError:
            from pyspark.context import SparkContext  # PySpark 3.x

        if SparkContext._gateway is not None or "PYSPARK_GATEWAY_PORT" in os.environ:
            SparkContext._ensure_initialized()
    except Exception:
        pass  # Connect-only or future API drift: fall back to python conf
    return SparkConf()


def _resolve_master(cores: int | str | None, submitted_has_master: bool) -> tuple[str | None, int | None]:
    """(master-to-set-or-None, local core count-or-None). Explicit cores (arg
    or SPARK_GRAFT_CPUS) force local[N]; else a spark-submit master is
    inherited (None = don't call .master() — overriding it would silently
    downgrade a cluster job to single-JVM local mode); else local[*]."""
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is not None or not submitted_has_master:
        master = f"local[{cores if cores is not None else '*'}]"
        n_cores = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
        return master, n_cores
    return None, None  # inherit the submitted master


def get_spark(
    app_name: str = "ccnet_spark_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Master resolution: an explicit ``cores`` argument (or SPARK_GRAFT_CPUS)
    wins -> local[N]. Otherwise, a master already configured by spark-submit
    / an existing SparkConf is INHERITED untouched — on a real cluster this
    function must never silently downgrade the job to single-JVM local mode.
    Only when neither exists does it default to local[*].

    Engine tunables are applied set-if-absent: anything the operator passed
    via spark-submit --conf takes precedence over our local-sandbox defaults
    (driver memory in particular is only meaningful pre-JVM-launch and must
    stay under spark-submit's control on a cluster).
    """
    submitted = _submitted_conf()
    master, n_cores = _resolve_master(cores, submitted.contains("spark.master"))
    if shuffle_partitions is None and n_cores is not None:
        # ~cores for local runs; a real cluster submit sets its own
        # (rule of thumb: 2-3x total executor cores, or rely on AQE coalesce).
        shuffle_partitions = max(int(n_cores), 8)

    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)

    def conf_if_absent(builder, key, value):
        return builder if submitted.contains(key) else builder.config(key, value)

    if shuffle_partitions is not None:
        b = conf_if_absent(b, "spark.sql.shuffle.partitions", str(shuffle_partitions))
    for key, value in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.localShuffleReader.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"),
        ("spark.sql.session.timeZone", "UTC"),
        # ObjectHashAggregate (collect_list/min_by — the regroup and
        # dedup_keep aggregations) falls back to SORT-based aggregation
        # after only 128 distinct groups per task (SPARK-17949 default),
        # which turns every many-group aggregation into a full sort with
        # per-row object serialization — measured 6x on the regroup stage
        # at sf0.1. 128k groups bounds the in-memory agg-buffer overhead
        # to ~tens of MB per task (safe at any partition size; beyond it
        # the sort fallback still protects giant aggregation states), so
        # this is scale-safe, not a local-mode tune. Overridable via
        # spark-submit like every conf here.
        ("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072"),
        ("spark.driver.maxResultSize", "4g"),
        ("spark.sql.parquet.compression.codec", "zstd"),
        ("spark.serializer", "org.apache.spark.serializer.KryoSerializer"),
        ("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false")),
        # Keep binary image payloads from blowing file-split planning:
        # 128MB splits are the parquet default sweet spot at scale.
        ("spark.sql.files.maxPartitionBytes", "134217728"),
    ]:
        b = conf_if_absent(b, key, value)
    if master is not None:
        # driver memory is ours to size only when we launch the local JVM
        b = conf_if_absent(b, "spark.driver.memory", _LOCAL_DRIVER_MEMORY)
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
