"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same confs are what we would
set on a real cluster (AQE for runtime re-planning and skew handling,
Arrow for the few Pandas-UDF operators, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "faiss-vector-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # At 100 TB this would be sized to ~128-200 MB per shuffle
        # partition; locally match core count so every core has work.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for applyInPandas/mapInPandas operators (chunker, stubs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Engine-wide timestamp contract: all timestamps are UTC
        # instants. Pinned here (constant, explicit) and re-asserted by
        # io.load_table for sessions the factory didn't build (the
        # round driver's own session).
        .config("spark.sql.session.timeZone", "UTC")
        # Older testdata generations carried TIMESTAMP(NANOS), which
        # Spark's reader rejects by default; read as long (ns since
        # epoch). Harmless for µs data.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
