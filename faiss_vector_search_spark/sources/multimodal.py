"""Multimodal columns (SURVEY.md §2b #29): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

Decode support comes in two tiers:

- **Built-in pure-numpy codecs**, no external library: BMP (BI_RGB
  8/24/32 bpp — :func:`bmp_decode` / :func:`bmp_encode`), WAV (RIFF
  PCM — :func:`wav_decode`), PNG (RFC 2083 — :func:`png_decode` /
  :func:`png_encode`), and JPEG — baseline (ITU-T T.81 SOF0/SOF1
  sequential Huffman incl. 4:2:0) AND progressive (SOF2 spectral
  selection + successive approximation) — :mod:`.jpeg`.
  ``decode_images``, ``resize_images``, and ``audio_stats`` are
  fully functional on them in this container, end to end.
- **Built-in MP4 demux** (:mod:`.mp4` — ISO 14496-12 sample tables,
  pure stdlib, unfragmented AND moof/traf fragments): frame sampling,
  timestamps, and keyframe indexes work without a library
  (``mp4.mp4_sample_frames`` emits coded access units); only PIXEL
  decode of those units needs a codec.
- **Library swap-ins** for the rest (arithmetic-coded JPEG via
  Pillow, coded-frame pixel decode / encrypted MP4 via av): each
  operator takes a ``kernel=`` callable; the default import-tries the
  library and raises ``NotImplementedError`` when absent. The Spark
  side — schema contract, binaryFile ingest, batch shapes, explode
  semantics for frame sampling — is identical either way.

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


def bmp_decode(payload: bytes) -> "np.ndarray":
    """Pure-numpy BMP decode (Windows BITMAPINFOHEADER, BI_RGB,
    8/24/32 bpp — the public struct layout, no library): returns an
    (height, width, channels) uint8 array. 24/32 bpp channel order is
    the file's own BGR(A); rows un-flip from the bottom-up layout."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    ch = bpp // 8
    top_down = height < 0
    h = abs(height)
    stride = ((width * bpp + 31) // 32) * 4
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                        offset=pixel_off)
    img = raw.reshape(h, stride)[:, : width * ch].reshape(h, width, ch)
    return img if top_down else img[::-1]


def bmp_encode(img: "np.ndarray") -> bytes:
    """Inverse of :func:`bmp_decode`: (h, w, ch) uint8 → BMP bytes
    (bottom-up, BI_RGB)."""
    import struct

    h, w, ch = img.shape
    stride = ((w * ch * 8 + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * ch] = img[::-1].reshape(h, w * ch)
    # 8-bpp needs the 256-entry grayscale palette after the header
    palette = (
        b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
        if ch == 1 else b""
    )
    pixel_off = 54 + len(palette)
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(data), 0, 0, pixel_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, ch * 8, 0, len(data), 2835, 2835,
        256 if ch == 1 else 0, 0,
    )
    return header + palette + data


def wav_decode(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Pure-numpy RIFF/WAVE PCM decode (the public chunk layout, no
    library): returns (sample_rate, n_channels, samples[int16 frames
    × channels])."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: format={fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, n_ch, samples.reshape(-1, n_ch)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_decode(payload: bytes) -> "np.ndarray":
    """Pure stdlib+numpy PNG decode (the public RFC 2083 layout:
    chunk walk → zlib inflate → per-row unfilter). Supports the
    mainstream shape — 8-bit depth, gray / RGB / RGBA, no interlace.
    Returns (height, width, channels) uint8. Filters 0-2 vectorize
    (None/Sub-as-cumsum/Up); Average/Paeth rows fall back to a
    per-pixel loop (left-neighbor serial dependency) — correctness-
    complete; route perf-critical PNG corpora through the Pillow
    ``kernel=`` swap-in."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} "
            f"interlace={interlace}"
        )
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * channels
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * channels), dtype=np.uint8)
    ch = channels
    for y in range(h):
        f, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros_like(line)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumsum per channel lane
            rec = np.cumsum(
                line.reshape(w, ch).astype(np.int64), axis=0
            ).reshape(-1) % 256
        elif f == 2:  # Up
            rec = line + prev
        elif f in (3, 4):  # Average / Paeth: left-serial
            rec = np.zeros_like(line)
            for i in range(line.size):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                if f == 3:
                    rec[i] = line[i] + ((a + b) >> 1)
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    rec[i] = line[i] + pr
                rec[i] %= 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec % 256
    return out.reshape(h, w, ch)


def png_encode(img: "np.ndarray") -> bytes:
    """Inverse of :func:`png_decode`: (h, w, ch) uint8 → PNG bytes
    (filter 0 rows, one zlib stream). Pure stdlib."""
    import struct
    import zlib

    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    rows[:, 1:] = img.reshape(h, w * ch)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + chunk(b"IEND", b""))


def _default_image_kernel(payload: bytes) -> tuple[int, int, int]:
    """BMP, PNG, and baseline JPEG decode built-in; other formats
    (and non-baseline JPEG processes) need Pillow."""
    if payload[:2] == b"BM":
        img = bmp_decode(payload)
        return img.shape[1], img.shape[0], img.shape[2]
    if payload[:8] == PNG_SIG:
        img = png_decode(payload)
        return img.shape[1], img.shape[0], img.shape[2]
    if payload[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        img = jpeg_decode(payload)
        return img.shape[1], img.shape[0], img.shape[2]
    try:  # pragma: no cover - library absent in this container
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "image format outside the built-in BMP/PNG/baseline-JPEG "
            "codecs and no image library in this environment; "
            "pass kernel= explicitly"
        ) from e
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    return img.width, img.height, len(img.getbands())  # pragma: no cover


DECODE_SCHEMA = "item_id bigint, width int, height int, channels int"


def decode_images(
    items: DataFrame,
    kernel: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """payload → (width, height, channels). Emits metadata only —
    the decoded pixel planes stay executor-local and die with the
    batch, which is what you want when the corpus is 100 TB of JPEG.
    BMP payloads decode with the built-in numpy codec; other formats
    use Pillow via the default kernel (or pass ``kernel=``)."""
    k = kernel or _default_image_kernel

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


def resize_images(
    items: DataFrame,
    out_w: int,
    out_h: int,
) -> DataFrame:
    """Nearest-neighbor resize for BMP/PNG/baseline-JPEG payloads,
    fully functional
    in pure numpy+stdlib: decode → index-stride resample → re-encode
    in the SAME format. Emits (item_id, payload, width, height) — the
    standard thumbnail / model-input-normalization preprocessing
    stage, payload-in payload-out so it chains ahead of
    :func:`extract_features`.

    Scale shape: one mapInPandas over the payload scan; resized
    payloads are strictly smaller than inputs for downscales, so the
    downstream pipeline moves less data than the raw corpus."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, outs = [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:8] == PNG_SIG:
                    img, enc = png_decode(raw), png_encode
                elif raw[:2] == b"\xff\xd8":
                    from .jpeg import jpeg_decode, jpeg_encode

                    img, enc = jpeg_decode(raw), jpeg_encode
                else:
                    img, enc = bmp_decode(raw), bmp_encode
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                outs.append(enc(img[yi][:, xi]))
                ids.append(item_id)
            yield pd.DataFrame(
                {"item_id": ids, "payload": outs,
                 "width": [out_w] * len(ids), "height": [out_h] * len(ids)}
            )

    return items.select("item_id", "payload").mapInPandas(
        run, schema="item_id bigint, payload binary, width int, height int"
    )


def audio_stats(items: DataFrame) -> DataFrame:
    """WAV payload → (sample_rate, n_channels, n_frames, duration_sec,
    rms) — fully functional in pure numpy (RIFF PCM codec above).
    The dedup/quality signal stage for audio corpora: silence (rms≈0)
    and duration outliers filter at scan speed, features only —
    payloads never shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                rate, n_ch, samples = wav_decode(bytes(payload))
                x = samples.astype(np.float64) / 32768.0
                rows.append((
                    item_id, rate, n_ch, samples.shape[0],
                    round(samples.shape[0] / rate, 6),
                    round(float(np.sqrt((x * x).mean())) if x.size else 0.0, 6),
                ))
            yield pd.DataFrame(
                rows, columns=["item_id", "sample_rate", "n_channels",
                               "n_frames", "duration_sec", "rms"]
            )

    return items.select("item_id", "payload").mapInPandas(
        run,
        schema="item_id bigint, sample_rate int, n_channels int, "
               "n_frames bigint, duration_sec double, rms double",
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
