"""SparkSession factory with the engine's defaults.

Local-mode knobs follow the sandbox (local[N], single JVM); on a real
cluster the same code runs unchanged — partitioning is expressed
logically (repartition on routing keys, AQE enabled) so Catalyst/AQE
pick physical parallelism per deployment.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Ship quickwit_spark to executors (the `spark-submit --py-files`
    mechanism, done programmatically so any entry point works).

    Python workers unpickle our pandas-UDF closures, which reference
    this package — without this, a driver launched outside the repo
    root fails with ModuleNotFoundError in the worker.
    """
    import quickwit_spark

    pkg_dir = os.path.dirname(os.path.abspath(quickwit_spark.__file__))
    fd, tmp = tempfile.mkstemp(suffix=".zip", prefix="quickwit_spark_")
    os.close(fd)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "quickwit_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    dest = os.path.join(tempfile.gettempdir(), "quickwit_spark_pkg.zip")
    shutil.move(tmp, dest)
    spark.sparkContext.addPyFile(dest)


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
    ship_package(spark)
    return spark
