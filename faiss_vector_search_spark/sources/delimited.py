"""Delimited-text (CSV/TSV) ingestion with corrupt-row quarantine —
the other interchange format corpora arrive in (SURVEY.md §2d),
sharing the JSONL reader's contract: explicit schema (inference is a
full extra pass — never at 100 TB), PERMISSIVE parse, malformed rows
surfaced in ``bad_line`` for quarantine via
:func:`..sources.jsonl.split_corrupt`.

CSV-specific scale notes:
- ``multiLine`` stays OFF: multi-line CSV is non-splittable (one task
  per file). Quoted embedded newlines need pre-splitting upstream.
- ``sep``/``quote``/``escape`` are explicit parameters, not sniffed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_CSV_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "_corrupt_record string"
)


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: str = DOC_CSV_SCHEMA,
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
) -> DataFrame:
    """CSV/TSV file(s)/glob → DataFrame with a ``bad_line`` column
    carrying the raw text of rows that failed to parse (wrong column
    count, uncastable values); clean rows have it null."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("quote", quote)
        .csv(path)
        .withColumnRenamed("_corrupt_record", "bad_line")
    )
