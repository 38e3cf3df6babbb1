"""Pure numpy+stdlib baseline JPEG codec (public ITU-T T.81 layout;
SURVEY §2b #29, r5 verdict ask #6) — the same posture as the BMP/PNG/
WAV codecs in :mod:`multimodal`: no external library, correctness
gated against an independent in-repo encoder, perf-critical corpora
route through the Pillow ``kernel=`` swap-in.

Supported subset (the "baseline process" of T.81 Annex F, which is
what cameras and `cjpeg` emit by default):

- SOF0 (baseline sequential DCT, 8-bit) and SOF1 (extended sequential,
  Huffman) frames; grayscale (1 component) and YCbCr (3 components).
- Chroma sampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0); upsampling
  is sample replication (nearest), the T.81 Annex A default.
- DRI/RSTn restart markers (byte realign + DC predictor reset).
- Rejected with a clear error: progressive (SOF2), arithmetic coding
  (SOF9+), hierarchical, 12-bit precision.

The encoder is deliberately minimal — 4:4:4 or 4:2:0, one canonical
all-8-bit-code Huffman table pair built from the symbol alphabet
(valid per T.81 C.2; avoids retyping the Annex K example tables) —
it exists so the decoder is gated against an INDEPENDENT
implementation of the bit layout, not against itself.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8x8 DCT-II matrix: spatial = C.T @ coeffs @ C
_C = np.array([
    [np.sqrt(0.125) if u == 0 else 0.5
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])
_C[0] = np.sqrt(0.125)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops feeding at any real marker (0xFF xx, xx != 0)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("hit marker inside entropy stream")
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        self.nbits = 0
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and self.data[self.pos + 1] == 0xD0 + (n & 7)):
            self.pos += 2
        else:
            raise ValueError("expected RST marker")


def _extend(v: int, ssss: int) -> int:
    # T.81 F.2.2.1: map the ssss-bit raw value to the signed diff
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _build_huff(counts: list[int], symbols: bytes) -> dict:
    """canonical (length, code) -> symbol, per T.81 C.2."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (height, width, channels) uint8 (grayscale →
    channels=1, YCbCr → RGB channels=3)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(body, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    tab = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                    p += 64
                qt[tq] = tab
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG process (progressive/arithmetic/"
                "hierarchical) — baseline SOF0/SOF1 only; route through "
                "the Pillow kernel= swap-in"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                counts = list(body[p + 1:p + 17])
                n = sum(counts)
                huff[(tc, th)] = _build_huff(counts, body[p + 17:p + 17 + n])
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            pos += ln
            break  # entropy data follows
        pos += ln
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {
        cid: np.zeros((mcuy * 8 * vf, mcux * 8 * hf))
        for cid, hf, vf, _ in comps
    }
    tabs = {cid: (huff[(0, dc)], huff[(1, ac)]) for cid, dc, ac in scan}

    r = _BitReader(payload, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    rst_n = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                r.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = {cid: 0 for cid in pred}
            for cid, _, _ in scan:
                _, hf, vf, tq = by_id[cid]
                dc_tab, ac_tab = tabs[cid]
                q = qt[tq]
                for v in range(vf):
                    for u in range(hf):
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = _huff_decode(r, dc_tab)
                        diff = _extend(r.receive(ssss), ssss) if ssss else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tab)
                            rrrr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rrrr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(r.receive(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[_ZZ] = zz * q
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * vf + v) * 8
                        x0 = (mx * hf + u) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
            mcu_i += 1

    out = []
    for cid, hf, vf, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vf, axis=0), hmax // hf, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# encoder (the independent bit-layout implementation the decoder's
# tests gate against)
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _flat8_table(symbols: list[int]) -> tuple[list[int], bytes, dict]:
    """All symbols at code length 8 (valid canonical table while
    n <= 255: the all-ones 8-bit code stays unused, per T.81 C.2)."""
    counts = [0] * 16
    counts[7] = len(symbols)
    enc = {s: (i, 8) for i, s in enumerate(symbols)}
    return counts, bytes(symbols), enc


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | s for run in range(16) for s in range(1, 11)
]


def _ssss(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode(img: np.ndarray, quant: int = 1,
                subsample: bool = False) -> bytes:
    """(h, w, ch) uint8 (ch 1 or 3) → baseline JPEG bytes. ``quant``
    is a flat quantization step (1 = near-lossless, just DCT rounding);
    ``subsample=True`` emits 4:2:0 (2×2 luma sampling, chroma averaged
    2×2) to exercise the decoder's upsampling path."""
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("jpeg_encode: 1 or 3 channels")
    q = np.full(64, quant, dtype=np.int32)

    if ch == 3:
        x = img.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = 128.0 - 0.168736 * x[..., 0] - 0.331264 * x[..., 1] \
            + 0.5 * x[..., 2]
        cr = 128.0 + 0.5 * x[..., 0] - 0.418688 * x[..., 1] \
            - 0.081312 * x[..., 2]
        chans = [y, cb, cr]
    else:
        chans = [img[..., 0].astype(np.float64)]

    if subsample and ch == 3:
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1)] * ch
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for c, (hf, vf) in zip(chans, factors):
        ph, pw = mcuy * 8 * vf, mcux * 8 * hf
        # downsample by box average to the component resolution
        sy, sx = vmax // vf, hmax // hf
        if sy > 1 or sx > 1:
            th, tw = -(-h // sy) * sy, -(-w // sx) * sx
            tmp = np.pad(c, ((0, th - h), (0, tw - w)), mode="edge")
            c = tmp.reshape(th // sy, sy, tw // sx, sx).mean(axis=(1, 3))
        p = np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])),
                   mode="edge")
        planes.append(p - 128.0)

    dc_counts, dc_syms, dc_enc = _flat8_table(_DC_SYMS)
    ac_counts, ac_syms, ac_enc = _flat8_table(_AC_SYMS)

    wtr = _BitWriter()
    pred = [0] * ch
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (hf, vf)) in enumerate(zip(planes, factors)):
                for v in range(vf):
                    for u in range(hf):
                        y0 = (my * vf + v) * 8
                        x0 = (mx * hf + u) * 8
                        coef = np.round(
                            _dct2(p[y0:y0 + 8, x0:x0 + 8])
                            / q.reshape(8, 8)
                        ).astype(np.int64)
                        zz = coef.reshape(-1)[_ZZ]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s = _ssss(diff)
                        code, ln = dc_enc[s]
                        wtr.write(code, ln)
                        if s:
                            wtr.write(diff if diff >= 0
                                      else diff + (1 << s) - 1, s)
                        run = 0
                        for k in range(1, 64):
                            val = int(zz[k])
                            if val == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_enc[0xF0]
                                wtr.write(code, ln)
                                run -= 16
                            s = _ssss(val)
                            code, ln = ac_enc[(run << 4) | s]
                            wtr.write(code, ln)
                            wtr.write(val if val >= 0
                                      else val + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = ac_enc[0x00]
                            wtr.write(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(q.reshape(-1)[_ZZ].astype(np.uint8)))
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0)
        for i in range(ch)
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, ch) + sof_comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms
              + bytes([0x10]) + bytes(ac_counts) + ac_syms)
    sos = seg(0xDA, bytes([ch]) + b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(ch)
    ) + bytes([0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos
            + wtr.flush() + b"\xff\xd9")
