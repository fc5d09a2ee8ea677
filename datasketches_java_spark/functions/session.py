"""SparkSession factory with the engine's scale-aware defaults.

Local mode is for correctness tests and the two-parallelism-level
scaling bench; the same config block is what we'd ship in
spark-submit --py-files on a real cluster (AQE, skew join, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "datasketches_java_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              driver_memory: str = "48g",
              master: str | None = None,
              executor_memory: str | None = None) -> SparkSession:
    """`master` overrides the default local[cores] — used by the
    scaling bench's local-cluster[N, cores, mem] mode (separate
    executor JVMs + real shuffle transport, the closest in-sandbox
    analogue to multi-executor scaling).  local-cluster needs
    SPARK_HOME pointing at the pyspark distribution."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    executor_pythonpath = None
    if master is None:
        master = f"local[{cores}]"
    elif master.startswith("local-cluster"):
        os.environ.setdefault(
            "SPARK_HOME",
            os.path.dirname(os.path.abspath(__import__("pyspark").__file__)))
        # separate executor JVMs spawn their own Python workers, which
        # do NOT inherit the driver's sys.path — point them at the repo
        # (on a real cluster this is what --py-files provides)
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        executor_pythonpath = os.pathsep.join(
            p for p in (repo_root, os.environ.get("PYTHONPATH")) if p)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if executor_memory is not None:
        builder = builder.config("spark.executor.memory", executor_memory)
    if executor_pythonpath is not None:
        builder = builder.config("spark.executorEnv.PYTHONPATH",
                                 executor_pythonpath)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read a driver-provided table; Iceberg first (the production
    format per BASELINE.json input_hint), parquet fallback in sandbox."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if not path.endswith(".parquet"):
            return spark.read.format("iceberg").load(path)
    except Exception:
        pass
    return spark.read.parquet(path)
