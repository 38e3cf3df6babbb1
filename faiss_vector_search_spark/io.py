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
    if name == "events":
        # older testdata generations carried TIMESTAMP(NANOS), which
        # Spark's reader rejects by default; read as long (ns since
        # epoch). Runtime conf, set here so it works under the
        # driver's own session. Harmless for µs data.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        # the parquet stores naive timestamps (TIMESTAMP_NTZ); the
        # oracle (DuckDB) interprets them as-written, i.e. as UTC
        # instants. Pin the session zone so the NTZ→LTZ cast below is
        # the same interpretation, then cast so every downstream
        # operator sees plain TIMESTAMP. The cast is unwrapped by
        # UnwrapCastInBinaryComparison, so date predicates still reach
        # the parquet scan as PushedFilters (asserted in test_plans).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
