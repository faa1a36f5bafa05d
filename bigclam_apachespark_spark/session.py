"""SparkSession factory tuned for the driver's local[N] harness.

Local mode is a single JVM; the same settings (AQE, adaptive
coalescing, Arrow) are the ones we'd ship to a 1000-executor cluster —
only memory/partition counts would be retuned there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bigclam_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    Shuffle partitions default to the core count: at local scale 200
    tiny partitions only add scheduling overhead; on a real cluster
    AQE coalescing makes the initial number mostly a ceiling.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The driver's parquet fixtures store TIMESTAMP(NANOS), which the
        # Spark reader rejects outright; read as long and convert at use.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Fail-loud arithmetic: integer-cents money folds document an
        # exactness contract ("fits DECIMAL(38,0) at any scale"), and
        # the hot per-row terms accumulate through int64 first. Spark 4
        # defaults ANSI on, but pin it explicitly so an int64 overflow
        # at scale (or a downgraded runtime where ANSI defaults off)
        # throws instead of silently wrapping.
        .config("spark.sql.ansi.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
