"""Table loaders for the driver's parquet layout.

Every loader is a plain ``spark.read.parquet`` so Catalyst gets full
predicate pushdown / column pruning / partition pruning on whatever the
caller stacks on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Engine-wide timestamp contract: all timestamps are UTC instants,
    # pinned ONCE at session build (session.get_spark sets
    # spark.sql.session.timeZone=UTC and legacy nanosAsLong). load_table
    # deliberately does NOT mutate session conf — a loader that flips
    # session-global settings makes a foreign caller's behavior depend
    # on load order. Sessions not built by the factory (e.g. the round
    # driver's) inherit the JVM default zone, which this environment
    # pins to UTC; the parquet stores naive µs timestamps
    # (TIMESTAMP_NTZ), the oracle (DuckDB) interprets them as-written,
    # and the NTZ→LTZ cast below gives the same interpretation under a
    # UTC session zone. The cast is unwrapped by
    # UnwrapCastInBinaryComparison, so date predicates still reach the
    # parquet scan as PushedFilters (test_plans) — an opaque per-column
    # rewrite (to_utc_timestamp) would block that pushdown, which is
    # why the session-zone contract is the chosen form.
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FileSystem
    API — works for local paths, HDFS, and object stores (s3a://, ...)
    alike, unlike ``os.path``, which silently answers False for any
    non-local URI. Used wherever a write path branches on "does the
    store exist yet" (e.g. first-batch detection in streaming ingest),
    where a wrong False is a silent-correctness bug, not a crash."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
