"""Pure numpy+stdlib baseline JPEG codec (public ITU-T T.81 layout;
SURVEY §2b #29, r5 verdict ask #6) — the same posture as the BMP/PNG/
WAV codecs in :mod:`multimodal`: no external library, correctness
gated against an independent in-repo encoder, perf-critical corpora
route through the Pillow ``kernel=`` swap-in.

Supported subset:

- SOF0 (baseline sequential DCT, 8-bit) and SOF1 (extended sequential,
  Huffman) frames; grayscale (1 component) and YCbCr (3 components).
- SOF2 (progressive DCT, Huffman — T.81 Annex G.2): spectral
  selection, successive approximation for DC and AC (incl. EOB runs,
  ZRL and correction bits in refinement scans), interleaved DC scans
  and non-interleaved AC scans, any scan script. This is the most
  common JPEG variant in web crawls after baseline.
- Chroma sampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0); upsampling
  is sample replication (nearest), the T.81 Annex A default.
- DRI/RSTn restart markers (byte realign + DC predictor + EOB-run
  reset), in sequential and progressive scans.
- DNL (define-number-of-lines, T.81 B.2.5): a frame declaring height
  0 in SOF takes its real line count from the DNL segment after the
  first scan — the streaming-encoder layout crawls do contain. The
  whole payload is in memory here, so the decoder resolves the DNL
  height up front (segment walk that skips entropy data) instead of
  re-sizing mid-scan.
- EXIF orientation (APP1 TIFF tag 0x0112): :func:`jpeg_orientation`
  parses it (both byte orders), :func:`apply_exif_orientation`
  applies the 8 standard transposes, and ``jpeg_decode(...,
  apply_orientation=True)`` opts in — the default leaves pixels in
  stored order, matching what every decoder library does.
- Rejected with a clear error: arithmetic coding (SOF9+),
  hierarchical, lossless, 12-bit precision.

The encoders are deliberately minimal — 4:4:4 or 4:2:0, one canonical
all-8-bit-code Huffman table pair built from the symbol alphabet
(valid per T.81 C.2; avoids retyping the Annex K example tables) —
they exist so the decoder is gated against an INDEPENDENT
implementation of the bit layout, not against itself:
:func:`jpeg_encode` (baseline) and :func:`jpeg_encode_progressive`
(a 10-scan DC+AC successive-approximation scan script).
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


class _Component:
    """Per-component frame state: sampling factors, quant table id,
    the MCU-padded coefficient grid (zigzag index order, accumulated
    across scans), and the non-interleaved block-grid dims."""

    def __init__(self, cid, hf, vf, tq, mcux, mcuy, w, h, hmax, vmax):
        self.cid, self.hf, self.vf, self.tq = cid, hf, vf, tq
        self.bw = mcux * hf            # padded block grid (interleaved)
        self.bh = mcuy * vf
        cw = -(-w * hf // hmax)        # component sample dims
        chh = -(-h * vf // vmax)
        self.nbw = -(-cw // 8)         # non-interleaved block grid
        self.nbh = -(-chh // 8)
        self.coef = np.zeros((self.bh, self.bw, 64), dtype=np.int64)


def _decode_seq_block(r, coef, dc_tab, ac_tab, pred):
    """One baseline-sequential block into ``coef`` (zigzag order);
    returns the updated DC predictor."""
    ssss = _huff_decode(r, dc_tab)
    diff = _extend(r.receive(ssss), ssss) if ssss else 0
    pred += diff
    coef[0] = pred
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
        coef[k] = _extend(r.receive(s), s)
        k += 1
    return pred


def _decode_ac_first(r, coef, ac_tab, ss, se, al, eobrun):
    """Progressive AC first pass (T.81 G.2, Ah=0) for one block."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, ac_tab)
        rrrr, s = rs >> 4, rs & 15
        if s == 0:
            if rrrr != 15:
                eobrun = 1 << rrrr
                if rrrr:
                    eobrun += r.receive(rrrr)
                return eobrun - 1  # current block consumed
            k += 16  # ZRL
            continue
        k += rrrr
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        coef[k] = _extend(r.receive(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(r, coef, ac_tab, ss, se, al, eobrun):
    """Progressive AC refinement (T.81 G.2, Ah>0) for one block —
    correction bits on already-nonzero coefficients, newly-significant
    insertions, EOB runs (libjpeg decode_mcu_AC_refine structure)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, ac_tab)
            rrrr, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if rrrr != 15:
                    eobrun = 1 << rrrr
                    if rrrr:
                        eobrun += r.receive(rrrr)
                    break  # tail handled below (current block in run)
                # rrrr == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad newly-significant magnitude")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    # append the correction bit unless already set
                    # (two's complement test, as in libjpeg — Python
                    # negative-int & matches C here)
                    if r.read_bit() and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if rrrr == 0:
                        break
                    rrrr -= 1
                k += 1
            if val:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if r.read_bit() and not (coef[k] & p1):
                    coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _skip_entropy(payload: bytes, pos: int) -> int:
    """Advance past entropy-coded data: the next 0xFF followed by a
    real marker byte (not a 0x00 stuffing byte, not RST0-7)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7) and nxt != 0xFF:
                return pos
        pos += 1
    return n


def _find_dnl_height(payload: bytes, pos: int) -> int:
    """Segment walk from ``pos`` to the DNL (0xDC) segment's
    number-of-lines — the height a SOF with the streaming-encoder
    height-0 convention defers (T.81 B.2.5). Raises when the stream
    ends without one."""
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment while seeking DNL")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        pos += 2
        ln = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xDC:
            return struct.unpack_from(">H", payload, pos + 2)[0]
        if marker == 0xDA:  # scan header, then entropy data
            pos = _skip_entropy(payload, pos + ln)
            continue
        pos += ln
    raise ValueError("JPEG SOF declares 0 lines but carries no DNL segment")


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Apply an EXIF orientation (1-8) to an (h, w, c) array — the
    same eight transposes Pillow's ``ImageOps.exif_transpose`` maps.
    Unknown/1 → unchanged."""
    if orientation == 2:    # mirror horizontal
        return img[:, ::-1]
    if orientation == 3:    # rotate 180
        return img[::-1, ::-1]
    if orientation == 4:    # mirror vertical
        return img[::-1]
    if orientation == 5:    # transpose (main diagonal)
        return img.swapaxes(0, 1)
    if orientation == 6:    # rotate 90 CW to display
        return img.swapaxes(0, 1)[:, ::-1]
    if orientation == 7:    # transverse (other diagonal)
        return img.swapaxes(0, 1)[::-1, ::-1]
    if orientation == 8:    # rotate 90 CCW to display
        return img.swapaxes(0, 1)[::-1]
    return img


def jpeg_orientation(payload: bytes) -> int:
    """EXIF orientation from the APP1 segment (TIFF IFD0 tag 0x0112),
    both byte orders; 1 (top-left, the identity) when absent or
    malformed — a crawl pipeline must never fail an image over its
    metadata."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return 1
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD9, 0xDA):  # EOI / entropy data: no EXIF ahead
            return 1
        pos += 2
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2:pos + ln]
        pos += ln
        if marker != 0xE1 or not body.startswith(b"Exif\x00\x00"):
            continue
        tiff = body[6:]
        if len(tiff) < 8:
            return 1
        if tiff[:2] == b"II":
            e = "<"
        elif tiff[:2] == b"MM":
            e = ">"
        else:
            return 1
        try:
            if struct.unpack_from(e + "H", tiff, 2)[0] != 42:
                return 1
            ifd = struct.unpack_from(e + "I", tiff, 4)[0]
            cnt = struct.unpack_from(e + "H", tiff, ifd)[0]
            for i in range(cnt):
                off = ifd + 2 + 12 * i
                tag, typ, _n = struct.unpack_from(e + "HHI", tiff, off)
                if tag == 0x0112 and typ == 3:  # Orientation, SHORT
                    v = struct.unpack_from(e + "H", tiff, off + 8)[0]
                    return v if 1 <= v <= 8 else 1
        except struct.error:
            return 1
        return 1
    return 1


def jpeg_decode(payload: bytes, apply_orientation: bool = False) -> np.ndarray:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JPEG → (height,
    width, channels) uint8 (grayscale → channels=1, YCbCr → RGB
    channels=3). Entropy-coded scans accumulate into per-component
    coefficient grids; dequantization + IDCT happen once at the end
    (the natural multi-scan structure, which for baseline is just the
    single-scan special case). A SOF height of 0 resolves through the
    post-scan DNL segment; ``apply_orientation=True`` additionally
    applies the EXIF orientation tag to the output."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    progressive = False
    restart = 0
    comps: dict[int, _Component] = {}
    order: list[int] = []
    mcux = mcuy = 0
    saw_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h == 0:  # streaming-encoder layout: height arrives in DNL
                h = _find_dnl_height(payload, pos + ln)
                if h == 0:
                    raise ValueError("JPEG DNL declares 0 lines")
            raw = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                raw.append((cid, hv >> 4, hv & 15, tq))
            hmax = max(c[1] for c in raw)
            vmax = max(c[2] for c in raw)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            comps = {
                cid: _Component(cid, hf, vf, tq, mcux, mcuy, w, h,
                                hmax, vmax)
                for cid, hf, vf, tq in raw
            }
            order = [c[0] for c in raw]
            frame = (h, w, hmax, vmax)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG process (arithmetic/hierarchical/"
                "lossless) — SOF0/SOF1/SOF2 only; route through "
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
        elif marker == 0xDC:  # DNL: must agree with the height in use
            nl = struct.unpack_from(">H", body, 0)[0]
            if frame is not None and nl != frame[0]:
                raise ValueError(
                    f"JPEG DNL line count {nl} contradicts frame "
                    f"height {frame[0]}"
                )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            ss, se, a = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            ah, al = a >> 4, a & 15
            r = _BitReader(payload, pos + ln)
            _decode_scan(r, scan, comps, huff, restart, mcux, mcuy,
                         progressive, ss, se, ah, al)
            saw_scan = True
            pos = r.pos
            continue
        pos += ln
    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, hmax, vmax = frame
    out = []
    for cid in order:
        c = comps[cid]
        q = qt[c.tq].astype(np.int64)
        nat = np.zeros((c.bh, c.bw, 64))
        nat[:, :, _ZZ] = c.coef * q  # dequantize, zigzag -> natural
        blocks = nat.reshape(c.bh, c.bw, 8, 8)
        # batched IDCT: C.T @ B @ C over every block at once
        px = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(c.bh * 8, c.bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // c.vf, axis=0),
                          hmax // c.hf, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        img = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[..., None]
    else:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
        img = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    if apply_orientation:
        img = apply_exif_orientation(img, jpeg_orientation(payload))
    return img


def _decode_scan(r, scan, comps, huff, restart, mcux, mcuy,
                 progressive, ss, se, ah, al):
    """Decode one entropy-coded scan into the component coefficient
    grids. Sequential scans and progressive DC scans iterate MCUs
    (interleaved); progressive AC scans are single-component,
    non-interleaved block raster per T.81 G.2. Restart markers reset
    the DC predictors AND the EOB run."""
    if progressive and ss != 0:
        # AC scan: exactly one component, block raster over the
        # component's own (unpadded) block grid
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid, _td, ta = scan[0]
        c = comps[cid]
        ac_tab = huff.get((1, ta))
        if ac_tab is None:
            raise ValueError("missing AC Huffman table")
        eobrun = 0
        rst_n = 0
        n_i = 0
        for by in range(c.nbh):
            for bx in range(c.nbw):
                if restart and n_i and n_i % restart == 0:
                    r.align_and_expect_rst(rst_n)
                    rst_n = (rst_n + 1) & 7
                    eobrun = 0
                blk = c.coef[by, bx]
                if ah == 0:
                    eobrun = _decode_ac_first(
                        r, blk, ac_tab, ss, se, al, eobrun)
                else:
                    eobrun = _decode_ac_refine(
                        r, blk, ac_tab, ss, se, al, eobrun)
                n_i += 1
        return

    # interleaved (sequential scans; progressive DC scans). A
    # single-component sequential scan uses its non-interleaved grid.
    pred = {cid: 0 for cid, _, _ in scan}
    rst_n = 0
    mcu_i = 0
    single = len(scan) == 1
    if single:
        cid0 = scan[0][0]
        c0 = comps[cid0]
        nx, ny = c0.nbw, c0.nbh
    else:
        nx, ny = mcux, mcuy

    for my in range(ny):
        for mx in range(nx):
            if restart and mcu_i and mcu_i % restart == 0:
                r.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                c = comps[cid]
                if single:
                    units = [(my, mx)]
                else:
                    units = [
                        (my * c.vf + v, mx * c.hf + u)
                        for v in range(c.vf) for u in range(c.hf)
                    ]
                for by, bx in units:
                    blk = c.coef[by, bx]
                    if not progressive:
                        pred[cid] = _decode_seq_block(
                            r, blk, huff[(0, td)], huff[(1, ta)],
                            pred[cid])
                    elif ah == 0:  # DC first pass
                        dc_tab = huff.get((0, td))
                        if dc_tab is None:
                            raise ValueError("missing DC Huffman table")
                        ssss = _huff_decode(r, dc_tab)
                        diff = _extend(r.receive(ssss), ssss) if ssss else 0
                        pred[cid] += diff
                        blk[0] = pred[cid] << al
                    else:  # DC refinement: one bit, OR into bit al
                        if r.read_bit():
                            blk[0] |= 1 << al
            mcu_i += 1


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
# EOBn symbols (r<<4, r=1..14) appended LAST so the baseline
# encoder's code assignments are unchanged; only progressive scans
# emit them (EOB runs, T.81 G.1.2.2)
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | s for run in range(16) for s in range(1, 11)
] + [run << 4 for run in range(1, 15)]


def _ssss(v: int) -> int:
    return int(abs(v)).bit_length()


def _component_coefs(img: np.ndarray, quant: int, subsample: bool):
    """Shared encoder front half: color convert, downsample, pad to
    MCU coverage, 8×8 DCT, quantize, zigzag. Returns (h, w, ch,
    factors, q, grids, mcux, mcuy) where grids[ci] is an int64
    (block_rows, block_cols, 64) array of quantized zigzag
    coefficients — the same layout the decoder accumulates into."""
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

    grids = []
    for c, (hf, vf) in zip(chans, factors):
        ph, pw = mcuy * 8 * vf, mcux * 8 * hf
        # downsample by box average to the component resolution
        sy, sx = vmax // vf, hmax // hf
        if sy > 1 or sx > 1:
            th, tw = -(-h // sy) * sy, -(-w // sx) * sx
            tmp = np.pad(c, ((0, th - h), (0, tw - w)), mode="edge")
            c = tmp.reshape(th // sy, sy, tw // sx, sx).mean(axis=(1, 3))
        p = np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])),
                   mode="edge") - 128.0
        bh, bw = ph // 8, pw // 8
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.round(
            np.einsum("ij,abjk,kl->abil", _C, blocks, _C.T)
            / quant
        ).astype(np.int64)
        grids.append(coef.reshape(bh, bw, 64)[:, :, _ZZ])
    return h, w, ch, factors, q, grids, mcux, mcuy


def jpeg_encode(img: np.ndarray, quant: int = 1,
                subsample: bool = False) -> bytes:
    """(h, w, ch) uint8 (ch 1 or 3) → baseline JPEG bytes. ``quant``
    is a flat quantization step (1 = near-lossless, just DCT rounding);
    ``subsample=True`` emits 4:2:0 (2×2 luma sampling, chroma averaged
    2×2) to exercise the decoder's upsampling path."""
    h, w, ch, factors, q, grids, mcux, mcuy = _component_coefs(
        img, quant, subsample)

    dc_counts, dc_syms, dc_enc = _flat8_table(_DC_SYMS)
    ac_counts, ac_syms, ac_enc = _flat8_table(_AC_SYMS)

    wtr = _BitWriter()
    pred = [0] * ch
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (g, (hf, vf)) in enumerate(zip(grids, factors)):
                for v in range(vf):
                    for u in range(hf):
                        zz = g[my * vf + v, mx * hf + u]
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


def _mag_shift(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): magnitude shift, sign kept."""
    return -((-v) >> al) if v < 0 else v >> al


class _EobState:
    """Deferred EOB-run emission for progressive scans: counts EOB
    events and (for refinement scans) buffers the correction bits each
    run block must append, flushing EOBn + extra bits + buffered bits
    in block order — the layout decode_mcu_AC_refine consumes."""

    def __init__(self, wtr: _BitWriter, ac_enc: dict):
        self.wtr, self.ac_enc = wtr, ac_enc
        self.count = 0
        self.bits: list[int] = []

    def add(self, bits=()):
        self.count += 1
        self.bits.extend(bits)
        if self.count == 32767:  # EOB14 ceiling
            self.flush()

    def flush(self):
        if not self.count:
            return
        r = self.count.bit_length() - 1
        code, ln = self.ac_enc[r << 4]
        self.wtr.write(code, ln)
        if r:
            self.wtr.write(self.count - (1 << r), r)
        for b in self.bits:
            self.wtr.write(b, 1)
        self.count = 0
        self.bits = []


def jpeg_encode_progressive(img: np.ndarray, quant: int = 1,
                            subsample: bool = False) -> bytes:
    """(h, w, ch) uint8 → progressive (SOF2) JPEG bytes, exercising
    the full Annex G.1 toolbox the decoder must handle: an interleaved
    DC first scan at Al=1 + a DC refinement scan, then per component
    two spectral bands (1–5, 6–63) each coded as a successive-
    approximation pair (first pass at Al=1, refinement to Al=0) —
    with EOB runs (shared across blocks), ZRL, and refinement
    correction bits. 2 + 4·ch scans total."""
    h, w, ch, factors, q, grids, mcux, mcuy = _component_coefs(
        img, quant, subsample)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    dc_counts, dc_syms, dc_enc = _flat8_table(_DC_SYMS)
    ac_counts, ac_syms, ac_enc = _flat8_table(_AC_SYMS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int,
            data: bytes) -> bytes:
        hdr = bytes([len(comp_ids)]) + b"".join(
            struct.pack(">BB", cid, 0x00) for cid in comp_ids
        ) + bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + data

    # non-interleaved block grid per component (ceil of sample dims)
    def _ni(ci: int) -> tuple[int, int]:
        hf, vf = factors[ci]
        ch_ = -(-h * vf // vmax)   # component sample height
        cw_ = -(-w * hf // hmax)   # component sample width
        return -(-ch_ // 8), -(-cw_ // 8)

    scans = []

    # ---- DC first pass (interleaved when ch > 1), Al = 1 ----
    wtr = _BitWriter()
    pred = [0] * ch
    if ch == 1:
        nbh, nbw = _ni(0)
        units = [(0, by, bx) for by in range(nbh) for bx in range(nbw)]
    else:
        units = [
            (ci, my * factors[ci][1] + v, mx * factors[ci][0] + u)
            for my in range(mcuy) for mx in range(mcux)
            for ci in range(ch)
            for v in range(factors[ci][1]) for u in range(factors[ci][0])
        ]
    for ci, by, bx in units:
        v0 = int(grids[ci][by, bx, 0]) >> 1  # DC: arithmetic shift
        diff = v0 - pred[ci]
        pred[ci] = v0
        s = _ssss(diff)
        code, ln = dc_enc[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    scans.append(sos(list(range(1, ch + 1)), 0, 0, 0, 1, wtr.flush()))

    # ---- DC refinement, Ah=1 -> Al=0: one raw bit per block ----
    wtr = _BitWriter()
    for ci, by, bx in units:
        wtr.write(int(grids[ci][by, bx, 0]) & 1, 1)
    scans.append(sos(list(range(1, ch + 1)), 0, 0, 1, 0, wtr.flush()))

    bands = [(1, 5), (6, 63)]

    # ---- AC first passes (Al=1), per component, per band ----
    for ci in range(ch):
        nbh, nbw = _ni(ci)
        g = grids[ci]
        for ss, se in bands:
            wtr = _BitWriter()
            eob = _EobState(wtr, ac_enc)
            for by in range(nbh):
                for bx in range(nbw):
                    zz = g[by, bx]
                    vals = [_mag_shift(int(zz[k]), 1)
                            for k in range(ss, se + 1)]
                    if not any(vals):
                        eob.add()
                        continue
                    eob.flush()
                    run = 0
                    for v in vals:
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        s = _ssss(v)
                        code, ln = ac_enc[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:  # trailing zeros -> this block opens a run
                        eob.add()
            eob.flush()
            scans.append(sos([ci + 1], ss, se, 0, 1, wtr.flush()))

    # ---- AC refinement passes (Ah=1 -> Al=0) ----
    for ci in range(ch):
        nbh, nbw = _ni(ci)
        g = grids[ci]
        for ss, se in bands:
            wtr = _BitWriter()
            eob = _EobState(wtr, ac_enc)
            for by in range(nbh):
                for bx in range(nbw):
                    zz = g[by, bx]
                    hist = [_mag_shift(int(zz[k]), 1)
                            for k in range(ss, se + 1)]
                    now = [int(zz[k]) for k in range(ss, se + 1)]
                    if not any(h == 0 and n != 0
                               for h, n in zip(hist, now)):
                        # no newly-significant coefs: pure EOB block —
                        # buffer every history coef's correction bit
                        eob.add([abs(n) & 1 for h, n in zip(hist, now)
                                 if h != 0])
                        continue
                    eob.flush()
                    run = 0
                    pending: list[int] = []
                    for hv, nv in zip(hist, now):
                        if hv != 0:
                            pending.append(abs(nv) & 1)
                        elif nv == 0:
                            run += 1
                        else:  # newly significant, |nv| == 1
                            while run > 15:
                                code, ln = ac_enc[0xF0]
                                wtr.write(code, ln)
                                for b in pending:
                                    wtr.write(b, 1)
                                pending = []
                                run -= 16
                            code, ln = ac_enc[(run << 4) | 1]
                            wtr.write(code, ln)
                            wtr.write(1 if nv > 0 else 0, 1)
                            for b in pending:
                                wtr.write(b, 1)
                            pending = []
                            run = 0
                    if run or pending:  # uncoded tail -> EOB event
                        eob.add(pending)
            eob.flush()
            scans.append(sos([ci + 1], ss, se, 1, 0, wtr.flush()))

    dqt = seg(0xDB, bytes([0]) + bytes(q.reshape(-1)[_ZZ].astype(np.uint8)))
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0)
        for i in range(ch)
    )
    sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, ch) + sof_comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms
              + bytes([0x10]) + bytes(ac_counts) + ac_syms)
    return (b"\xff\xd8" + dqt + sof + dht
            + b"".join(scans) + b"\xff\xd9")
