"""Table maintenance for a long-lived 100 TB corpus store
(SURVEY.md §2d): small-file compaction and partition-level upsert.

Streaming ingestion (streaming/streams.py) and incremental index adds
(operators/index_store.py) inevitably produce many small files — the
classic HDFS/object-store killer: a 100 TB table in 1 MB files is
100M objects, and every scan pays per-file open/list overhead.
Compaction rewrites a table into target-size files; partition upsert
replaces only the partitions a batch touches (dynamic partition
overwrite) instead of rewriting the table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_bytes(spark: SparkSession, path: str) -> int:
    """On-disk size of a table directory via the Hadoop FileSystem
    API — works the same on local FS, HDFS, and object stores."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    shuffle: bool = False,
) -> dict[str, int]:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_file_bytes``
    files. ``shuffle=False`` (default) uses ``coalesce`` — a narrow
    dependency, no shuffle: tasks just concatenate input splits, so
    compaction reads and writes each byte exactly once.
    ``shuffle=True`` uses ``repartition`` for when the rewrite should
    also rebalance pathological input skew (pays one full shuffle).

    Returns {files_in, files_out, bytes} for the caller's bookkeeping.
    """
    df = spark.read.parquet(src)
    files_in = len(df.inputFiles())
    n_bytes = table_bytes(spark, src)
    n_out = max(1, math.ceil(n_bytes / target_file_bytes))
    out = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst)
    files_out = len(spark.read.parquet(dst).inputFiles())
    return {"files_in": files_in, "files_out": files_out, "bytes": n_bytes}


def upsert_partitions(
    updates: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Replace exactly the partitions present in ``updates``, leaving
    every other partition untouched (dynamic partition overwrite) —
    the idempotent daily-batch pattern: re-running a day's load
    replaces that day, never truncates the table. Static overwrite
    mode (the default) would drop ALL partitions first; this sets the
    dynamic mode on the writer itself so the session conf is not
    mutated."""
    (
        updates.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_merge(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    partition_col: str,
    key_cols: list[str],
) -> None:
    """Keyed merge into a partitioned parquet table (the MERGE /
    upsert-by-key pattern, emulated without a table format): rows in
    ``updates`` replace existing rows with the same key; untouched
    keys in the SAME partition survive (a bare dynamic overwrite
    would drop them); untouched partitions are never read or written.

    Plan: touched-partition values collect (tiny — bounded by the
    batch's distinct partitions), the existing read prunes to exactly
    those partitions, survivors come from a broadcast anti-join on the
    key, and the merged frame is localCheckpoint-materialized before
    the write because Spark cannot overwrite a path it is still
    reading lazily.
    """
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return
    try:
        existing = spark.read.parquet(path).where(
            F.col(partition_col).isin(parts)
        )
    except AnalysisException:  # first write: table does not exist yet
        updates.write.partitionBy(partition_col).parquet(path)
        return
    survivors = existing.join(
        F.broadcast(updates.select(*key_cols).distinct()),
        on=key_cols,
        how="left_anti",
    )
    merged = survivors.unionByName(updates).localCheckpoint(eager=True)
    upsert_partitions(merged, path, partition_col)
