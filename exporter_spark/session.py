"""SparkSession factory tuned for this engine.

Scale posture: these defaults are what we'd set on a real cluster too —
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow for any pandas-UDF path, and a shuffle-partition count sized to
the parallelism at hand rather than Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "exporter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # Python workers must be able to import this package (pandas-UDF
    # closures pickle by module reference). Locally that means putting
    # the package root on PYTHONPATH before the JVM spawns workers; on
    # a real cluster, ship the package with --py-files / pip install.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events.parquet stores TIMESTAMP(NANOS), which the
        # parquet reader rejects by default; read as long and let
        # sources.files restore a (microsecond) timestamp column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
