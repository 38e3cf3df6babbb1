"""Multimodal columns (SURVEY.md §2b #29): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The container has no image/audio libraries, so the *decode kernels*
are stubbed: each operator takes a ``kernel=`` callable; the default
import-tries the real library (Pillow for images) and otherwise raises
``NotImplementedError``. The Spark side — schema contract, binaryFile
ingest, batch shapes, explode semantics for frame sampling — is real
and tested with deterministic fake kernels.

Scale notes: payloads travel the plan at most once (scan → kernel);
operators emit *features, not payloads* wherever possible so shuffles
carry KBs, not media bytes. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
batch_rows × max_payload fits executor memory (e.g. 64 rows × 16 MB
video chunks).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ITEM_SCHEMA = (
    "item_id bigint, modality string, payload binary, meta map<string,string>"
)


def read_media_dir(
    spark: SparkSession, path: str, modality: str, glob: str = "*"
) -> DataFrame:
    """Directory of media files → the ITEM_SCHEMA contract."""
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )
    return files.select(
        F.abs(F.xxhash64(F.col("path"))).alias("item_id"),
        F.lit(modality).alias("modality"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("n_bytes"), F.col("length").cast("string"),
        ).alias("meta"),
    )


def _no_image_lib(payload: bytes) -> tuple[int, int, int]:  # pragma: no cover
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "no image library in this environment; pass kernel= explicitly"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, len(img.getbands())


DECODE_SCHEMA = "item_id bigint, width int, height int, channels int"


def decode_images(
    items: DataFrame,
    kernel: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """payload → (width, height, channels). Emits metadata only —
    the decoded pixel planes stay executor-local and die with the
    batch, which is what you want when the corpus is 100 TB of JPEG."""
    k = kernel or _no_image_lib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            dims = [k(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return items.select("item_id", "payload").mapInPandas(
        run, schema=DECODE_SCHEMA
    )


def extract_features(
    items: DataFrame,
    dim: int = 16,
    kernel: Callable[[bytes, int], np.ndarray] | None = None,
) -> DataFrame:
    """payload → fixed-dim float feature vector (the CLIP/encoder slot).

    Default kernel is a deterministic byte-histogram fake — a stand-in
    with the exact signature/batch shape a learned encoder would use
    (swap in a GPU model via ``kernel=`` without touching the plan).
    """

    def _histogram(payload: bytes, d: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return np.zeros(d, dtype=np.float32)
        h = np.bincount(arr % d, minlength=d).astype(np.float64)
        n = np.linalg.norm(h)
        return (h / n if n else h).astype(np.float32)

    k = kernel or _histogram

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [k(bytes(p), dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {"item_id": pdf["item_id"], "features": [f.tolist() for f in feats]}
            )

    return items.select("item_id", "payload").mapInPandas(
        run, schema="item_id bigint, features array<float>"
    )


def sample_frames(
    items: DataFrame,
    frame_bytes: int = 1024,
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling plumbing: payload → every Nth frame as its
    own row ``(item_id, frame_idx, frame)``. The stub treats the
    payload as a flat concatenation of fixed-size frames (a real
    kernel would demux the container format); the explode shape —
    one input row fanning out to variable rows — is the real contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, frames = [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_bytes, 0)
                for i in range(0, n_frames, every_n):
                    ids.append(item_id)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"item_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return items.select("item_id", "payload").mapInPandas(
        run, schema="item_id bigint, frame_idx int, frame binary"
    )
