"""SparkSession construction tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings map directly onto a
multi-executor cluster (AQE, Arrow, sane shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "nous_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``. ``shuffle_partitions`` defaults to the
    core count (local mode: more partitions than cores just adds scheduling
    overhead; on a real cluster this is set to 2-3× total executor cores).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan-split size is scale-dependent (guide §6): the 128m default
        # leaves a compacted single-file table scanning on 1-2 cores in
        # local mode (row groups permitting), while petabyte deployments
        # want 512m-1g splits for sequential throughput. Parameterised via
        # env; the local default favors scan parallelism on the small
        # single-file inputs this mode serves.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("NOUS_MAX_PARTITION_BYTES", "16m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("NOUS_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ParallelGC: G1 (the JDK default) collapses under many concurrent
        # allocating tasks in local mode — measured 4.8x slower on a
        # 32-thread parquet write of 8.7M rows. Throughput GC wins for
        # batch analytics.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
