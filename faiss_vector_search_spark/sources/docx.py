"""docx → text ingestion (reference preprocessing/process_docx_files.py:
walks a files/ dir, converts each .docx to markdown-ish text for the
chunker).

The container has no ``python-docx``, so the byte-level decode is
STUBBED: :func:`default_docx_decoder` import-tries the real library
and otherwise raises ``NotImplementedError``. Everything Spark-side —
the binaryFile scan, the Arrow-batched ``mapInPandas`` decode, the
output contract feeding the chunker — is real and tested with an
injected fake decoder."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCX_SCHEMA = "doc_id bigint, path string, text string, n_bytes bigint"


def default_docx_decoder(data: bytes) -> str:
    """Real decode path (python-docx paragraphs joined by blank
    lines, matching the reference's markdown-ish output); STUB when
    the library is absent."""
    try:
        import io

        import docx  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - container has no python-docx
        raise NotImplementedError(
            "python-docx is not installed; pass decoder= to read_docx_dir"
        ) from e
    document = docx.Document(io.BytesIO(data))
    return "\n\n".join(p.text for p in document.paragraphs if p.text.strip())


def read_docx_dir(
    spark: SparkSession,
    path: str,
    decoder: Callable[[bytes], str] | None = None,
    glob: str = "*.docx",
) -> DataFrame:
    """Directory of .docx → ``(doc_id, path, text, n_bytes)``.

    Decode runs inside ``mapInPandas`` so each executor converts its
    own files (Arrow-batched, no driver round-trip); the scan carries
    bytes exactly once.
    """
    decode = decoder or default_docx_decoder
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content", "length")
    )

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": [
                        zlib.crc32(p.encode()) for p in pdf["path"]
                    ],
                    "path": pdf["path"],
                    "text": [decode(bytes(c)) for c in pdf["content"]],
                    "n_bytes": pdf["length"],
                }
            )

    return files.mapInPandas(convert, schema=DOCX_SCHEMA)
