"""Columnar interchange formats beyond parquet: ORC (built into
Spark) and Avro (module-gated — the ``spark-avro`` package isn't
always on the classpath). Corpora arrive in whatever the upstream
warehouse wrote; an engine that only reads parquet makes the user run
a conversion job first.

Scale notes:
- ORC carries the same pushdown machinery as parquet (predicate
  pushdown into stripe/row-group skipping, column projection) — the
  plan gate in tests asserts the filter reaches the ORC scan.
- Writes go through ``maintenance.compact_small_files``-compatible
  layouts: plain directory, optional partition columns.
- Avro is row-oriented: fine as an INGEST format (splittable,
  schema'd), wrong as the analytical store — ``to_parquet`` exists
  precisely to land Avro input into a columnar layout once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame, path: str, partition_by: str | None = None
) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — schema travels with the files; filters/projections
    push down exactly like parquet (stripe + row-group skipping)."""
    return spark.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is on the classpath."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
    except Exception as e:  # noqa: BLE001 — classify by message
        msg = str(e)
        if "Failed to find" in msg and "avro" in msg.lower():
            return False
        return True  # source resolved; the probe path just doesn't exist
    return True


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro ingest (module-gated). Raises a clear error when the
    spark-avro package is absent instead of a classpath stack."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro is not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "or land the data as parquet/ORC/CSV/JSONL instead"
        )
    return spark.read.format("avro").load(path)


def to_parquet(
    df: DataFrame, path: str, partition_by: str | None = None
) -> None:
    """Land row-oriented input (Avro/CSV/JSONL) into the columnar
    analytical layout — run once at ingest, every downstream scan
    then gets projection + predicate pushdown for free."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)
