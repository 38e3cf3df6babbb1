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
    # Engine-wide timestamp contract (also pinned by session.get_spark,
    # re-asserted here UNCONDITIONALLY for sessions the factory didn't
    # build, e.g. the round driver's): the session zone is UTC from the
    # first load_table call onward — a constant invariant, not a
    # load-order-dependent side effect. The parquet stores naive
    # timestamps (TIMESTAMP_NTZ); the oracle (DuckDB) interprets them
    # as-written, i.e. as UTC instants, so the NTZ→LTZ cast below is
    # the same interpretation under a UTC session zone. The cast is
    # unwrapped by UnwrapCastInBinaryComparison, so date predicates
    # still reach the parquet scan as PushedFilters (test_plans) — an
    # opaque per-column rewrite (to_utc_timestamp) would block that
    # pushdown, which is why the session-zone pin is the chosen form.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Older testdata generations carried TIMESTAMP(NANOS); read as
    # long (ns since epoch). Harmless for µs data.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
