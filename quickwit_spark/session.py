"""SparkSession factory with the engine's defaults.

Local-mode knobs follow the sandbox (local[N], single JVM); on a real
cluster the same code runs unchanged — partitioning is expressed
logically (repartition on routing keys, AQE enabled) so Catalyst/AQE
pick physical parallelism per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "quickwit_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("QWS_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
        shuffle_partitions = max(int(n), 8)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
