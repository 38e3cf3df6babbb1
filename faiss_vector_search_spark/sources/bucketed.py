"""Bucketed table store — pre-shuffled persistence for co-located
joins (SURVEY.md §2d, §4).

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle.
Writing both sides bucketed by the join key (same bucket count) makes
the partitioning part of the STORED layout: every future join on that
key is exchange-free — Spark reads bucket i of each side into the
same task. This is the batch analogue of the reference keeping its
FAISS index pre-organized on disk: pay the organization cost once at
write time, amortize it over every query.

Bucketed tables need the session catalog (``saveAsTable``) because
the bucket spec lives in table metadata, not in the parquet files;
``path`` makes them external so the data lands where the caller says
(and survives a catalog drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and in-bucket sorted) by the join key.
    Sorting at write time lets a later sort-merge join skip its sort
    as well — the read is both exchange-free and sort-free."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .saveAsTable(table)
    )


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with the bucket spec attached (a plain
    ``read.parquet`` of the same path would lose it and re-shuffle)."""
    return spark.table(table)
