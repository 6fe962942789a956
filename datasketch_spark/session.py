"""SparkSession factory tuned for the dedup pipeline.

Arrow on (the signature UDF is the one Python boundary), AQE on (skew-join
splitting + adaptive shuffle partitions), shuffle partitions sized for the
sandbox; on a real cluster these come from spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dirs() -> str | None:
    """Prefer RAM-backed shuffle spill in local mode: shuffle I/O through a
    disk-backed /tmp serializes the shuffle-heavy stages regardless of core
    count. On a real cluster this comes from the node's NVMe via
    spark.local.dir in the cluster conf instead."""
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        path = os.path.join(shm, "spark-local")
        os.makedirs(path, exist_ok=True)
        return path
    return None


def get_spark(
    app_name: str = "datasketch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Partition coalescing measured 2.7x SLOWER on the bucket-groupBy
        # stage at bench scale (extra re-optimization barriers; our
        # shuffle_partitions are already sized to the cluster, so
        # coalescing only adds stage boundaries). AQE itself + skew-join
        # splitting stay on.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        # ContextCleaner only reclaims finished queries' shuffle files /
        # broadcasts when the driver GCs; with a large mostly-idle heap
        # that can be never within a session, so old query state (incl.
        # RAM-backed shuffle dirs) accumulates. 2 min periodic GC is
        # standard long-session hygiene; override via env for clusters.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "120s"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    local_dirs = _local_dirs()
    if local_dirs and master.startswith("local"):
        builder = builder.config("spark.local.dir", local_dirs)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
