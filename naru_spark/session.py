"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the local[32]/128GiB test box but expressed the way a
1000-executor cluster job would set them: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow for any pandas exchange, sane shuffle
partition count, and broadcast threshold high enough that dimension tables and
per-column dictionaries broadcast instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "naru_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: the driver JVM hosts all executor threads, so this IS
        # the executor memory — size it for 32 concurrent tasks + caches
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Timestamps in the testdata are naive; keep session in UTC so Spark
        # and DuckDB agree on literal values.
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
