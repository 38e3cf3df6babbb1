"""JSONL (JSON-lines) document ingestion — the de-facto interchange
format of LLM training-data pipelines (one JSON object per line:
text + metadata). Beyond the reference's text/docx readers (SURVEY
§2d): a corpus pipeline on this engine ingests JSONL dumps directly.

Scale notes:
- ``spark.read.json`` with an EXPLICIT schema: schema inference is a
  full extra pass over the data — never let it run at 100 TB.
- malformed lines land in ``_corrupt_record`` (PERMISSIVE mode)
  instead of failing the job; ``read_jsonl`` surfaces them in a
  separate column so the pipeline can count/quarantine them.
- compressed inputs (``.jsonl.gz``) work transparently but gzip is
  non-splittable — one task per file; prefer zstd-framed or many
  medium files for parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "meta map<string,string>, _corrupt_record string"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """JSONL file(s)/glob → documents DataFrame. Rows that fail to
    parse keep their raw line in ``bad_line`` (everything else null);
    well-formed rows have ``bad_line`` null."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumnRenamed("_corrupt_record", "bad_line")
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows drop the sentinel column;
    quarantined rows keep the raw line.

    The parsed frame is cached first: Spark refuses queries over a
    raw JSON scan that reference only the corrupt-record column
    (column pruning reduces a filter/count on ``bad_line`` to exactly
    that), and caching the fully-parsed rows is the documented
    resolution. It also means one parse feeds both branches. For a
    dump too large to cache, write the parsed frame to parquet and
    split from there instead."""
    df = df.cache()
    clean = df.where(F.col("bad_line").isNull()).drop("bad_line")
    bad = df.where(F.col("bad_line").isNotNull()).select("bad_line")
    return clean, bad


def write_jsonl(df: DataFrame, path: str, compress: bool = False) -> None:
    """Documents → JSONL dump (the hand-off format back to training
    jobs). Column order is preserved; one JSON object per line."""
    writer = df.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)
