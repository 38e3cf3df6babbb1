"""Pure-stdlib ISO-BMFF (MP4) demuxer — the container half of video
support (SURVEY §2b #29), same posture as the BMP/PNG/WAV/JPEG codecs:
the box layout is the public ISO/IEC 14496-12 spec, so SAMPLE
EXTRACTION (which bytes are frame N, when does it play, is it a
keyframe) is fully implementable without any library. What stays a
``kernel=`` swap-in is the CODEC — turning an extracted H.264/H.265
access unit into pixels needs a real decoder.

That split matches what a 100 TB video-corpus pipeline actually
needs first: frame sampling, duration/fps stats, keyframe indexes and
per-track audits are all DEMUX-level questions; full pixel decode is
the expensive GPU stage you run on the sampled minority.

Supported: unfragmented MP4 (moov sample tables — stts/stsc/stsz/
stco/co64/stss) AND fragmented MP4 (DASH/CMAF-style moof/traf/trun
run tables with mvex/trex defaults, tfhd overrides, tfdt decode
times, and per-sample/first-sample sync flags), any track count,
32- and 64-bit box sizes. Encrypted fragments (CENC ``senc``) raise
a clear error — decryption needs keys, not a parser.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, path: tuple[bytes, ...]):
    """All body ranges matching a box path like (b'moov', b'trak')."""
    if not path:
        yield start, end
        return
    for btype, b0, b1 in _boxes(buf, start, end):
        if btype == path[0]:
            yield from _find(buf, b0, b1, path[1:])


def mp4_demux(payload: bytes) -> list[dict]:
    """Parse the moov sample tables: one dict per track with
    ``track_id, handler, codec, timescale, n_samples, samples``
    (a list of (offset, size, dts) into the PAYLOAD), ``keyframes``
    (1-based sync-sample indexes) and ``all_sync`` (True when the
    stss box is ABSENT, which per ISO 14496-12 §8.6.2 means every
    sample is sync). Sync-ness is carried by the explicit flag, not
    an empty-set sentinel: a present-but-empty stss — or a fragmented
    track whose samples are all flagged non-sync — reports
    ``all_sync=False`` with an empty ``keyframes`` set, i.e. NO sync
    samples, which the sentinel could not represent. Fragmented
    payloads (moof run tables) demux through :func:`_apply_fragments`
    — same output contract, with ``all_sync`` False for any track
    that received fragment samples (their sync-ness is explicit in
    the run flags); a track the fragments never touched keeps its
    moov-derived flag."""
    if len(payload) < 16:
        raise ValueError("not an MP4 payload")
    try:
        top = {t for t, _, _ in _boxes(payload, 0, len(payload))}
    except ValueError as e:
        raise ValueError("not an MP4 payload (bad box structure)") from e
    fragmented = b"moof" in top
    if b"moov" not in top:
        raise ValueError("not an MP4 payload (no moov)")

    tracks = []
    for t0, t1 in _find(payload, 0, len(payload), (b"moov", b"trak")):
        track: dict = {"track_id": None, "handler": None, "codec": None,
                       "timescale": None}
        # tkhd: version-dependent layout; track_id after the times
        for b0, b1 in _find(payload, t0, t1, (b"tkhd",)):
            ver = payload[b0]
            off = b0 + 4 + (16 if ver == 1 else 8)
            track["track_id"] = struct.unpack_from(">I", payload, off)[0]
        for b0, b1 in _find(payload, t0, t1, (b"mdia", b"mdhd")):
            ver = payload[b0]
            off = b0 + 4 + (16 if ver == 1 else 8)
            track["timescale"] = struct.unpack_from(">I", payload, off)[0]
        for b0, b1 in _find(payload, t0, t1, (b"mdia", b"hdlr")):
            track["handler"] = payload[b0 + 8:b0 + 12].decode(
                "ascii", "replace")

        stbl = list(_find(payload, t0, t1, (b"mdia", b"minf", b"stbl")))
        if not stbl:
            continue
        s0, s1 = stbl[0]
        tables: dict = {}
        for btype, b0, b1 in _boxes(payload, s0, s1):
            tables[btype] = (b0, b1)

        if b"stsd" in tables:
            b0, _ = tables[b"stsd"]
            n = struct.unpack_from(">I", payload, b0 + 4)[0]
            if n >= 1:
                track["codec"] = payload[b0 + 12:b0 + 16].decode(
                    "ascii", "replace")

        def _entries(key, fmt, width):
            if key not in tables:
                return []
            b0, _ = tables[key]
            n = struct.unpack_from(">I", payload, b0 + 4)[0]
            return [
                struct.unpack_from(fmt, payload, b0 + 8 + i * width)
                for i in range(n)
            ]

        # sample sizes
        sizes: list[int] = []
        if b"stsz" in tables:
            b0, _ = tables[b"stsz"]
            uniform, count = struct.unpack_from(">II", payload, b0 + 4)
            if uniform:
                sizes = [uniform] * count
            else:
                sizes = list(struct.unpack_from(f">{count}I", payload, b0 + 12))
        n_samples = len(sizes)

        # chunk offsets (stco 32-bit / co64 64-bit)
        if b"stco" in tables:
            chunk_offs = [o for (o,) in _entries(b"stco", ">I", 4)]
        else:
            chunk_offs = [o for (o,) in _entries(b"co64", ">Q", 8)]

        # sample-to-chunk runs -> samples per chunk
        stsc = _entries(b"stsc", ">III", 12)
        per_chunk: list[int] = []
        for i, (first, spc, _desc) in enumerate(stsc):
            last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(chunk_offs)
            per_chunk.extend([spc] * (last - first + 1))

        # decode timestamps from stts runs
        dts: list[int] = []
        t = 0
        for count, delta in _entries(b"stts", ">II", 8):
            for _ in range(count):
                dts.append(t)
                t += delta

        samples: list[tuple[int, int, int]] = []
        si = 0
        for ci, coff in enumerate(chunk_offs):
            pos = coff
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= n_samples:
                    break
                samples.append(
                    (pos, sizes[si], dts[si] if si < len(dts) else 0)
                )
                pos += sizes[si]
                si += 1
        if len(samples) < n_samples and not fragmented:
            # a truncated/inconsistent moov must fail HERE with the
            # module's malformed-file posture, not as an IndexError
            # deep inside a frame-sampling task
            raise ValueError(
                "stsz/stsc sample-count mismatch: stsz declares "
                f"{n_samples} samples but the chunk tables cover "
                f"{len(samples)}"
            )
        track["n_samples"] = len(samples)
        track["samples"] = samples
        track["keyframes"] = {
            s for (s,) in _entries(b"stss", ">I", 4)
        }
        # stss ABSENT = every sample is sync (spec); stss present is an
        # explicit enumeration, even when empty (no sync samples)
        track["all_sync"] = b"stss" not in tables
        tracks.append(track)
    if fragmented:
        _apply_fragments(payload, tracks)
    return tracks


# tfhd / trun flag bits (ISO/IEC 14496-12 §8.8.7-8.8.8)
_TFHD_BASE_OFFSET = 0x1
_TFHD_SAMPLE_DESC = 0x2
_TFHD_DEF_DURATION = 0x8
_TFHD_DEF_SIZE = 0x10
_TFHD_DEF_FLAGS = 0x20
_TFHD_BASE_IS_MOOF = 0x20000
_TRUN_DATA_OFFSET = 0x1
_TRUN_FIRST_FLAGS = 0x4
_TRUN_DURATION = 0x100
_TRUN_SIZE = 0x200
_TRUN_FLAGS = 0x400
_TRUN_CTS = 0x800
_NON_SYNC_BIT = 0x00010000


def _apply_fragments(payload: bytes, tracks: list[dict]) -> None:
    """Walk every moof/traf/trun and append the fragment samples to
    the moov-declared tracks IN PLACE — (offset, size, dts) tuples
    plus 1-based sync-sample indexes, the same contract the
    unfragmented tables produce.

    Defaults resolve per spec: per-sample trun fields, else the
    trun's first-sample-flags (first sample only), else tfhd
    defaults, else the mvex/trex defaults. The data base offset is
    tfhd's explicit base-data-offset when present, else the first
    byte of the enclosing moof when ``default-base-is-moof``
    (0x20000) is set. When NEITHER flag is set, ISO 14496-12 §8.8.7
    says the first traf of a moof anchors at the moof start and each
    subsequent traf anchors at the END of the previous traf's data —
    so multi-traf moofs without explicit trun data offsets resolve by
    carrying the running end-of-data position across trafs (within
    one traf, a trun without a data-offset already continues from
    the previous trun). Encrypted fragments (a ``senc`` box in any
    traf) raise — sample decryption needs CENC keys, not a parser.
    """
    by_id = {t["track_id"]: t for t in tracks}
    # mvex/trex defaults: (duration, size, flags) per track
    trex: dict[int, tuple[int, int, int]] = {}
    for b0, b1 in _find(payload, 0, len(payload),
                        (b"moov", b"mvex", b"trex")):
        tid, _desc, dur, size, flags = struct.unpack_from(
            ">IIIII", payload, b0 + 4)
        trex[tid] = (dur, size, flags)
    # running decode time per track (tfdt overrides when present)
    tnext: dict[int, int] = {tid: 0 for tid in by_id}
    sync: dict[int, set] = {tid: set() for tid in by_id}
    # moov-declared sample counts (before any fragment appends) and
    # per-track fragment sample counts — the sync-set merge needs both
    n_moov: dict[int, int] = {tid: len(t["samples"]) for tid, t in by_id.items()}
    n_frag: dict[int, int] = {tid: 0 for tid in by_id}

    # top-level walk that also tracks each box's START byte (the
    # moof anchor per spec includes the box header, and the header
    # can be 8 or 16 bytes)
    top: list[tuple[bytes, int, int, int]] = []
    pos = 0
    end = len(payload)
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", payload, pos)
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        top.append((btype, pos, pos + hdr, pos + size))
        pos += size

    for btype, moof_start, m0, m1 in top:
        if btype != b"moof":
            continue
        # end of the previous traf's data within THIS moof — the
        # implicit base for a traf carrying neither base-data-offset
        # nor default-base-is-moof (None = first traf → moof start)
        prev_traf_end: int | None = None
        for tb, t0, t1 in _boxes(payload, m0, m1):
            if tb != b"traf":
                continue
            inner = {bt: (b0, b1) for bt, b0, b1 in
                     _boxes(payload, t0, t1) if bt != b"trun"}
            if b"senc" in inner:
                raise ValueError(
                    "encrypted fMP4 (CENC senc) unsupported by the "
                    "built-in demuxer; decryption requires content keys"
                )
            if b"tfhd" not in inner:
                raise ValueError("malformed fMP4: traf without tfhd")
            b0, _ = inner[b"tfhd"]
            tf_flags = struct.unpack_from(">I", payload, b0)[0] & 0xFFFFFF
            tid = struct.unpack_from(">I", payload, b0 + 4)[0]
            if tid not in by_id:
                raise ValueError(
                    f"malformed fMP4: traf for undeclared track {tid}")
            pos = b0 + 8
            if tf_flags & _TFHD_BASE_IS_MOOF or prev_traf_end is None:
                base = moof_start
            else:
                base = prev_traf_end
            if tf_flags & _TFHD_BASE_OFFSET:
                base = struct.unpack_from(">Q", payload, pos)[0]
                pos += 8
            if tf_flags & _TFHD_SAMPLE_DESC:
                pos += 4
            tdur, tsize, tflags = trex.get(tid, (0, 0, 0))
            if tf_flags & _TFHD_DEF_DURATION:
                tdur = struct.unpack_from(">I", payload, pos)[0]
                pos += 4
            if tf_flags & _TFHD_DEF_SIZE:
                tsize = struct.unpack_from(">I", payload, pos)[0]
                pos += 4
            if tf_flags & _TFHD_DEF_FLAGS:
                tflags = struct.unpack_from(">I", payload, pos)[0]
                pos += 4
            if b"tfdt" in inner:
                d0, _ = inner[b"tfdt"]
                ver = payload[d0]
                tnext[tid] = (
                    struct.unpack_from(">Q", payload, d0 + 4)[0]
                    if ver == 1 else
                    struct.unpack_from(">I", payload, d0 + 4)[0]
                )
            track = by_id[tid]
            data_pos = None  # trun without data-offset continues
            traf_end: int | None = None  # furthest data byte this traf
            for bt, r0, r1 in _boxes(payload, t0, t1):
                if bt != b"trun":
                    continue
                tr_flags = struct.unpack_from(">I", payload, r0)[0]
                ver = payload[r0]
                tr_bits = tr_flags & 0xFFFFFF
                n = struct.unpack_from(">I", payload, r0 + 4)[0]
                p = r0 + 8
                if tr_bits & _TRUN_DATA_OFFSET:
                    (doff,) = struct.unpack_from(">i", payload, p)
                    p += 4
                    data_pos = base + doff
                elif data_pos is None:
                    data_pos = base
                first_flags = None
                if tr_bits & _TRUN_FIRST_FLAGS:
                    first_flags = struct.unpack_from(">I", payload, p)[0]
                    p += 4
                for i in range(n):
                    dur, size, sflags = tdur, tsize, tflags
                    if tr_bits & _TRUN_DURATION:
                        dur = struct.unpack_from(">I", payload, p)[0]
                        p += 4
                    if tr_bits & _TRUN_SIZE:
                        size = struct.unpack_from(">I", payload, p)[0]
                        p += 4
                    if tr_bits & _TRUN_FLAGS:
                        sflags = struct.unpack_from(">I", payload, p)[0]
                        p += 4
                    elif i == 0 and first_flags is not None:
                        sflags = first_flags
                    if tr_bits & _TRUN_CTS:
                        p += 4  # composition offset: presentation-only
                    if data_pos + size > len(payload):
                        raise ValueError(
                            "malformed fMP4: trun sample outside payload")
                    track["samples"].append((data_pos, size, tnext[tid]))
                    n_frag[tid] += 1
                    if not (sflags & _NON_SYNC_BIT):
                        sync[tid].add(len(track["samples"]))
                    data_pos += size
                    tnext[tid] += dur
                if data_pos is not None:
                    traf_end = (
                        data_pos if traf_end is None
                        else max(traf_end, data_pos)
                    )
            if traf_end is not None:
                prev_traf_end = traf_end
    for tid, track in by_id.items():
        if not n_frag[tid]:
            continue  # no fragment samples -> moov tables stand as-is
        # Merging fragment sync indexes into the moov set must respect
        # the no-stss convention that every moov sample is sync:
        # promoting to an explicit set without enumerating the moov
        # samples would silently reclassify them as non-sync. After the
        # merge the set is EXPLICIT (all_sync drops): a fragmented
        # track whose samples are all flagged non-sync ends with an
        # empty keyframes set meaning "no sync samples" — the state
        # the old empty-set-means-all-sync sentinel couldn't represent.
        moov_sync = set(track["keyframes"])
        if track["all_sync"] and n_moov[tid]:
            moov_sync = set(range(1, n_moov[tid] + 1))
        track["n_samples"] = len(track["samples"])
        track["keyframes"] = moov_sync | sync[tid]
        track["all_sync"] = False


def mp4_sample_frames(
    items,
    every_n: int = 10,
    handler: str = "vide",
):
    """Real video frame sampling over MP4 payloads: demux the sample
    tables and emit every Nth sample of the matching track(s) as its
    own row — (item_id, track_id, frame_idx, dts, keyframe, frame).
    ``frame`` is the CODED sample (e.g. one H.264 access unit); pixel
    decode is the downstream ``kernel=`` stage. One ``mapInPandas``
    over the payload scan; emitted bytes are the sampled minority, so
    the downstream moves every_n× less data than the corpus.

    This retires the fixed-size-frame stub for .mp4 payloads —
    :func:`multimodal.sample_frames` keeps the stub contract for
    opaque payloads; route MP4 corpora here.
    """
    import pandas as pd

    def run(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                for tr in mp4_demux(raw):
                    if handler and tr["handler"] != handler:
                        continue
                    kf = tr["keyframes"]
                    all_sync = tr["all_sync"]
                    for i in range(0, tr["n_samples"], every_n):
                        off, size, dts = tr["samples"][i]
                        rows.append((
                            item_id, tr["track_id"], i, dts,
                            all_sync or (i + 1) in kf,
                            raw[off:off + size],
                        ))
            yield pd.DataFrame(
                rows, columns=["item_id", "track_id", "frame_idx",
                               "dts", "keyframe", "frame"]
            )

    return items.select("item_id", "payload").mapInPandas(
        run,
        schema="item_id bigint, track_id int, frame_idx int, "
               "dts bigint, keyframe boolean, frame binary",
    )
