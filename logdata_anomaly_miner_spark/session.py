"""SparkSession factory tuned for this engine.

Replaces AMiner's process bootstrap (aminer.py main / AnalysisChild fork,
reference: source/root/usr/lib/logdata-anomaly-miner/aminer/AnalysisChild.py)
with a SparkSession: AQE on, Arrow on, UTC session time zone so epoch
extraction is deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "logdata-anomaly-miner-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    same code path serves tests, bench at two parallelism levels, and a real
    cluster via spark-submit (where ``master`` is provided by the submitter).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # In local mode, match shuffle width to cores; on a cluster this is
        # overridden by spark-submit conf (AQE coalesces the rest).
        try:
            shuffle_partitions = int(master.split("[")[1].rstrip("]").replace("*", str(cpus)))
        except (IndexError, ValueError):
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GC_OPTS", "-XX:+UseG1GC"),
        )
    )
    # shuffle/spill to tmpfs when available: local-mode shuffles are
    # disk-bound on overlay filesystems; on a real cluster this is
    # irrelevant (executors use their own local dirs)
    if os.path.isdir("/dev/shm"):
        builder = builder.config(
            "spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
