"""Baseline JPEG codec — numpy + stdlib only, no Pillow.

Closes the last Pillow-gated slot in the multimodal codec family
(VERDICT r6 "What's missing" #4): ``decode_jpeg`` handles baseline
sequential DCT JPEG/JFIF (SOF0, 8-bit, Huffman, 1 or 3 components,
sampling factors up to 2×2 incl. 4:2:0, restart markers), and
``encode_jpeg`` produces standard-conformant 4:4:4 baseline files with
the Annex K quantization/Huffman tables, so any third-party decoder can
read them and the round trip is self-checking.

Scale shape: the codec runs per-payload inside the Arrow-batched
``mapInPandas`` slot (`multimodal.decode_image`) — the per-image work is
numpy-vectorized (matrix DCT over all blocks at once; the only Python
loop is the Huffman entropy coder, which is linear in coefficient
count). Production deployments still prefer Pillow/libjpeg-turbo for
raw throughput when present — this module removes the *correctness*
dependency, not the fast path.

Reference scope: the Kafka connector has no media codecs (SURVEY §2.A
ends at Avro/JSON/Arrow); this is part of the beyond-parity multimodal
surface. Format per ITU-T T.81 (JPEG) + JFIF; tables from Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

_STD_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_STD_CHR_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag[i] = block index (row-major) of the i-th coefficient in zigzag order
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_codes(spec):
    """Canonical Huffman: (BITS, HUFFVAL) → {symbol: (code, length)}."""
    bits, vals = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(spec):
    """Canonical Huffman: (BITS, HUFFVAL) → {(length, code): symbol}."""
    bits, vals = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# Orthonormal DCT-II basis (8-point)
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(N,8,8) spatial → (N,8,8) DCT coefficients."""
    return np.einsum("kn,bnm,lm->bkl", _C, blocks, _C, optimize=True)


def _idct2(coefs: np.ndarray) -> np.ndarray:
    """(N,8,8) DCT coefficients → (N,8,8) spatial (B = Cᵀ F C)."""
    return np.einsum("kn,bkl,lm->bnm", _C, coefs, _C, optimize=True)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    """Reads entropy-coded bits, un-stuffing FF00 and stopping at any
    other marker (position of which is exposed via ``marker``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise CodecError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker — consumed by the caller via sync()
                self.marker = nxt
                raise _RestartPending()
            else:
                self.marker = nxt
                raise CodecError("marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker; clears bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.marker = None
                return
            p += 1
        raise CodecError("expected JPEG restart marker")


class _RestartPending(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """JPEG signed-magnitude DIFF decode (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, single interleaved scan)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y = arr[:, :, 0]
    cb = arr[:, :, 1] - 128.0
    cr = arr[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H,W) with H,W % 8 == 0 → (n_v, n_h, 8, 8) → (N,8,8) row-major."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_blocks(writer, zz, dc_codes, ac_codes, pred):
    """Entropy-code one component block (zigzag int array); returns new
    DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        v = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(v, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        bits = v if v >= 0 else v + (1 << size) - 1
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w, 1|3) uint8 → baseline JFIF bytes (Annex K tables,
    quality-scaled quantization). ``subsample`` is '4:4:4' or '4:2:0'
    (3-component only; chroma 2×2 box-averaged). ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every N MCUs.

    ``progressive=True`` emits SOF2 with a libjpeg-style scan script —
    interleaved DC first scan at Al=1 + DC refinement, per-component
    spectral-split AC first scans (1-5, 6-63) at Al=1, then AC
    refinement scans — exercising every progressive decode path
    (spectral selection, successive approximation, EOB runs) so the
    round trip is self-checking without third-party codecs."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise CodecError(f"encode_jpeg expects (h,w,1|3), got {arr.shape}")
    h, w, ncomp = arr.shape
    if h == 0 or w == 0:
        raise CodecError("empty image")
    if subsample not in ("4:4:4", "4:2:0"):
        raise CodecError(f"unsupported subsampling {subsample!r}")
    sub420 = subsample == "4:2:0" and ncomp == 3
    qlum = _quality_scale(_STD_LUM_Q, quality)
    qchr = _quality_scale(_STD_CHR_Q, quality)

    # MCU geometry: (h_i, v_i) per component
    if ncomp == 1:
        samp = [(1, 1)]
    elif sub420:
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    if ncomp == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
        qtabs = [qlum, qchr, qchr]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
        qtabs = [qlum]

    # per-component quantized-zigzag block grids, shape (bh, bw, 64)
    grids = []
    for (hi, vi), plane, q in zip(samp, planes, qtabs):
        if sub420 and (hi, vi) == (1, 1):
            # chroma: pad to even dims, then 2×2 box average
            ph0 = -(-plane.shape[0] // 2) * 2
            pw0 = -(-plane.shape[1] // 2) * 2
            p = np.pad(
                plane,
                ((0, ph0 - plane.shape[0]), (0, pw0 - plane.shape[1])),
                mode="edge",
            )
            plane = p.reshape(ph0 // 2, 2, pw0 // 2, 2).mean(axis=(1, 3))
        bh = mcus_y * vi
        bw = mcus_x * hi
        padded = np.pad(
            plane,
            ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])),
            mode="edge",
        )
        coefs = _dct2(_blockify(padded) - 128.0)
        qmat = q.reshape(8, 8).astype(np.float64)
        quant = np.round(coefs / qmat).astype(np.int32)
        grids.append(quant.reshape(bh, bw, 64)[:, :, _ZIGZAG])

    dc_lum = _huff_codes(_DC_LUM_SPEC)
    ac_lum = _huff_codes(_AC_LUM_SPEC)
    dc_chr = _huff_codes(_DC_CHR_SPEC)
    ac_chr = _huff_codes(_AC_CHR_SPEC)
    tables = [
        (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
        for ci in range(ncomp)
    ]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    ntab = 1 if ncomp == 1 else 2
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65 * ntab)
    out += b"\x00" + bytes(int(qlum[z]) for z in _ZIGZAG)
    if ntab == 2:
        out += b"\x01" + bytes(int(qchr[z]) for z in _ZIGZAG)
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        out += bytes([ci + 1, hv, 0 if ci == 0 else 1])

    def dht(cls, tid, spec):
        bits, vals = spec
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg

    out += dht(0, 0, _DC_LUM_SPEC) + dht(1, 0, _AC_LUM_SPEC)
    if ncomp == 3:
        out += dht(0, 1, _DC_CHR_SPEC) + dht(1, 1, _AC_CHR_SPEC)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _encode_progressive_scans(
            out, grids, samp, tables, mcus_x, mcus_y, restart_interval,
            frame_dims=(h, w), hmax=hmax, vmax=vmax,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        zz = grids[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_blocks(
                            writer, zz, tables[ci][0], tables[ci][1], preds[ci]
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoding (ITU-T T.81 §G.1): libjpeg-style scan script with
# successive approximation, so every progressive decode path round-trips.
# ---------------------------------------------------------------------------

_PROG_AL = 1  # successive-approximation point: first scans at Al=1


def _emit_sos(out, scan_comps, Ss, Se, Ah, Al) -> None:
    seg = bytes([len(scan_comps)])
    for cid, td, ta in scan_comps:
        seg += bytes([cid + 1, (td << 4) | ta])
    seg += bytes([Ss, Se, (Ah << 4) | Al])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg


class _RestartingWriter:
    """BitWriter wrapper that segments output at restart intervals
    (shared by the progressive scan emitters)."""

    def __init__(self, out: bytearray, interval: int):
        self.out = out
        self.interval = interval
        self.w = _BitWriter()
        self.count = 0
        self.rst = 0

    def unit_boundary(self, on_reset=None) -> None:
        """Call before each MCU/block; emits RSTn when due."""
        if self.interval and self.count and self.count % self.interval == 0:
            self.w.flush()
            self.out += self.w.out
            self.out += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) % 8
            self.w = _BitWriter()
            if on_reset:
                on_reset()
        self.count += 1

    def finish(self) -> None:
        self.w.flush()
        self.out += self.w.out


def _encode_progressive_scans(
    out, grids, samp, tables, mcus_x, mcus_y, restart_interval, frame_dims,
    hmax, vmax,
) -> None:
    ncomp = len(grids)
    h, w = frame_dims
    al = _PROG_AL

    def comp_blocks(ci: int) -> tuple[int, int]:
        hi, vi = samp[ci]
        return -(-(-(-h * vi // vmax)) // 8), -(-(-(-w * hi // hmax)) // 8)

    # -- scan 1: DC first, all components interleaved, Al=al
    _emit_sos(out, [(ci, 0 if ci == 0 else 1, 0) for ci in range(ncomp)],
              0, 0, 0, al)
    rw = _RestartingWriter(out, restart_interval)
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            rw.unit_boundary(lambda: preds.__setitem__(
                slice(None), [0] * ncomp))
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(grids[ci][my * vi + by, mx * hi + bx, 0]) >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size = _category(diff)
                        code, length = tables[ci][0][size]
                        rw.w.write(code, length)
                        if size:
                            v = diff if diff >= 0 else diff + (1 << size) - 1
                            rw.w.write(v, size)
    rw.finish()

    # -- per-component AC first scans (spectral split), Al=al
    for ci in range(ncomp):
        nbh, nbw = comp_blocks(ci)
        for ss, se in ((1, 5), (6, 63)):
            _emit_ac_scan(
                out, grids[ci], nbh, nbw, ss, se, 0, al, restart_interval, ci,
            )

    # -- DC refinement (raw bits, no Huffman), Ah=al → Al=0
    _emit_sos(out, [(ci, 0, 0) for ci in range(ncomp)], 0, 0, al, 0)
    rw = _RestartingWriter(out, restart_interval)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            rw.unit_boundary()
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        rw.w.write(
                            int(grids[ci][my * vi + by, mx * hi + bx, 0]) & 1, 1
                        )
    rw.finish()

    # -- per-component AC refinement, Ah=al → Al=0 (same band split as
    # the first scans: refinement bands must match previously-coded ones)
    for ci in range(ncomp):
        nbh, nbw = comp_blocks(ci)
        for ss, se in ((1, 5), (6, 63)):
            _emit_ac_scan(
                out, grids[ci], nbh, nbw, ss, se, al, 0, restart_interval, ci,
            )


class _CountingCodes:
    """ac_codes stand-in for the statistics pass: every lookup counts the
    symbol and returns a dummy 1-bit code (control flow in the scan
    emitters depends only on coefficient values, never on code words)."""

    def __init__(self):
        self.freq: dict[int, int] = {}

    def __getitem__(self, sym: int):
        self.freq[sym] = self.freq.get(sym, 0) + 1
        return (0, 1)


def _optimal_huff_spec(freq: dict[int, int]):
    """Frequencies → (BITS[1..16], HUFFVAL) per ITU-T T.81 Annex K.2
    (the two-pass optimal-table flow): Huffman code sizes by pair
    merging, 16-bit length cap adjustment, and a reserved pseudo-symbol
    so no real symbol gets the all-1s code word."""
    freqs = [0] * 257
    for s, f in freq.items():
        freqs[s] = f
    freqs[256] = 1  # reserved: keeps the all-1s code unused
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        # two least-frequent chains (ties → larger symbol first, K.2 figure)
        c1 = c2 = -1
        v1 = v2 = float("inf")
        for i in range(257):
            f = freqs[i]
            if f and f <= v1:
                v1, c1 = f, i
        for i in range(257):
            f = freqs[i]
            if f and f <= v2 and i != c1:
                v2, c2 = f, i
        if c2 < 0:
            break
        freqs[c1] += freqs[c2]
        freqs[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # cap code lengths at 16 (K.2 "Adjust_BITS")
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved pseudo-symbol
    huffval = [
        s
        for size in range(1, 33)
        for s in range(256)
        if codesize[s] == size
    ]
    return bits[1:17], huffval


def _emit_ac_scan(
    out, grid, nbh, nbw, Ss, Se, Ah, Al, restart_interval, ci
) -> None:
    """Statistics pass → optimal AC table → DHT + SOS + entropy data.
    Progressive AC scans need EOBn symbols the Annex K sequential tables
    do not define, so each scan ships its own optimal table (libjpeg
    does the same — progressive always runs Huffman optimization)."""
    counter = _CountingCodes()
    _encode_ac_scan(
        bytearray(), grid, counter, nbh, nbw, Ss, Se, Ah, Al, restart_interval
    )
    if not counter.freq:
        counter.freq[0x00] = 1
    spec = _optimal_huff_spec(counter.freq)
    ta = 0 if ci == 0 else 1
    bits, vals = spec
    seg = bytes([(1 << 4) | ta]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    _emit_sos(out, [(ci, 0, ta)], Ss, Se, Ah, Al)
    _encode_ac_scan(
        out, grid, _huff_codes(spec), nbh, nbw, Ss, Se, Ah, Al,
        restart_interval,
    )


def _encode_ac_scan(
    out, grid, ac_codes, nbh, nbw, Ss, Se, Ah, Al, restart_interval
) -> None:
    """One progressive AC scan (first when Ah == 0, refinement
    otherwise) with EOB-run accumulation across blocks — the encoder
    mirror of `_decode_ac_first_block` / `_decode_ac_refine_block`,
    following the T.81 §G.1.2.2-3 flow (eager ZRL emission keeps
    buffered correction bits inside the span the decoder walks)."""
    rw = _RestartingWriter(out, restart_interval)
    state = {"eobrun": 0, "pend": []}

    def flush_eob() -> None:
        if state["eobrun"] > 0:
            nbits = state["eobrun"].bit_length() - 1
            code, length = ac_codes[nbits << 4]
            rw.w.write(code, length)
            if nbits:
                rw.w.write(state["eobrun"] & ((1 << nbits) - 1), nbits)
            state["eobrun"] = 0
        for b in state["pend"]:
            rw.w.write(b, 1)
        state["pend"] = []

    def reset() -> None:
        state["eobrun"] = 0
        state["pend"] = []

    for by in range(nbh):
        for bx in range(nbw):
            if (
                rw.interval
                and rw.count
                and rw.count % rw.interval == 0
            ):
                flush_eob()  # EOB runs cannot cross a restart boundary
            rw.unit_boundary(reset)
            zz = grid[by, bx]
            if Ah == 0:
                _encode_ac_first_block(rw, ac_codes, zz, Ss, Se, Al, state, flush_eob)
            else:
                _encode_ac_refine_block(rw, ac_codes, zz, Ss, Se, Al, state, flush_eob)
    flush_eob()
    rw.finish()


def _encode_ac_first_block(rw, ac_codes, zz, Ss, Se, Al, state, flush_eob) -> None:
    r = 0
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        t = abs(v) >> Al
        if t == 0:
            r += 1
            continue
        while r > 15:
            flush_eob()
            code, length = ac_codes[0xF0]  # ZRL
            rw.w.write(code, length)
            r -= 16
        flush_eob()
        size = t.bit_length()
        code, length = ac_codes[(r << 4) | size]
        rw.w.write(code, length)
        rw.w.write(t if v >= 0 else (1 << size) - 1 - t, size)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            flush_eob()


def _encode_ac_refine_block(rw, ac_codes, zz, Ss, Se, Al, state, flush_eob) -> None:
    absv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eob = Ss - 1  # position of the last newly-significant coefficient
    for i, k in enumerate(range(Ss, Se + 1)):
        if absv[i] == 1:
            eob = k
    r = 0
    br: list[int] = []
    for i, k in enumerate(range(Ss, Se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            flush_eob()
            code, length = ac_codes[0xF0]
            rw.w.write(code, length)
            r -= 16
            for b in br:
                rw.w.write(b, 1)
            br = []
        if t > 1:  # already significant: buffered correction bit
            br.append(t & 1)
            continue
        flush_eob()
        code, length = ac_codes[(r << 4) | 1]
        rw.w.write(code, length)
        rw.w.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            rw.w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["pend"].extend(br)
        if state["eobrun"] == 0x7FFF:
            flush_eob()


# ---------------------------------------------------------------------------
# Decoder (baseline sequential, sampling factors ≤ 2×2, restart markers)
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG → (h, w, 1|3) uint8.
    Progressive support covers the full Huffman feature set: spectral
    selection, successive approximation (DC + AC first/refinement
    scans), EOB runs, and restart intervals — per ITU-T T.81 §G.2.
    Arithmetic coding, 12-bit precision, hierarchical (SOF5+), and
    sampling factors > 2 raise CodecError. All corrupt-payload failures
    surface as CodecError (the mapInPandas per-row handler depends on
    it — same contract as decode_png)."""
    try:
        return _decode_jpeg_impl(payload)
    except CodecError:
        raise
    except (IndexError, ValueError, KeyError, struct.error, ZeroDivisionError) as e:
        raise CodecError(f"corrupt JPEG payload: {type(e).__name__}: {e}") from e


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None  # progressive: zigzag coef grids
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise CodecError(f"expected marker at {pos}")
        # Any number of 0xFF fill bytes may pad the space before a
        # marker code (ITU-T T.81 B.1.1.2) — skip to the last 0xFF.
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                return _reconstruct_progressive(frame, coefs, qtabs)
            raise CodecError("JPEG without scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > n:
            break
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise CodecError("16-bit quant tables not supported")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(
                    np.int32
                )
                full = np.zeros(64, dtype=np.int32)
                full[_ZIGZAG] = tbl
                qtabs[tq] = full
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                table = _huff_decode_table((bits, vals))
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise CodecError(f"unsupported precision {precision}")
            fh, fw = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
            progressive = marker == 0xC2
            if progressive:
                hmax, vmax, mcus_x, mcus_y = _geometry(frame)
                coefs = [
                    np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise CodecError("only baseline/progressive Huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise CodecError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise CodecError(f"scan references unknown component {cs}")
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            if progressive:
                band = (
                    seg[1 + 2 * ns],
                    seg[2 + 2 * ns],
                    seg[3 + 2 * ns] >> 4,
                    seg[3 + 2 * ns] & 0x0F,
                )
                pos = _decode_progressive_scan(
                    payload, pos + seglen, frame, scan, band, huff_dc,
                    huff_ac, restart_interval, coefs,
                )
                continue
            if ns != len(frame["comps"]):
                # Baseline allows one scan per component
                # (non-interleaved); this decoder handles only the
                # single fully-interleaved scan — refuse loudly rather
                # than silently returning the first component alone.
                raise CodecError(
                    f"non-interleaved JPEG ({ns} of "
                    f"{len(frame['comps'])} components in scan) not "
                    "supported"
                )
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtabs, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += seglen
    raise CodecError("truncated JPEG (no SOS)")


def _geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise CodecError(f"unsupported sampling {hmax}x{vmax}")
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise CodecError("unsupported per-component sampling")
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _noninterleaved_blocks(frame, c) -> tuple[int, int]:
    """Block-grid dims of a single-component (non-interleaved) scan:
    padded to 8, NOT to the MCU multiple (T.81 A.2.2)."""
    hmax, vmax, _, _ = _geometry(frame)
    comp_w = -(-frame["w"] * c["h"] // hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    return -(-comp_h // 8), -(-comp_w // 8)


def _decode_scan(data, pos, frame, scan, qtabs, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise CodecError("zero-dimension JPEG")
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise CodecError(f"unsupported sampling {hmax}x{vmax}")
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise CodecError("unsupported per-component sampling")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))

    def read_block(reader, dc_table, ac_table, pred):
        sym = _read_huff(reader, dc_table)
        diff = _extend(reader.receive(sym), sym) if sym else 0
        dc = pred + diff
        zz = np.zeros(64, dtype=np.int32)
        zz[0] = dc
        k = 1
        while k < 64:
            sym = _read_huff(reader, ac_table)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k >= 64 or size == 0:
                raise CodecError("AC coefficient index out of range")
            zz[k] = _extend(reader.receive(size), size)
            k += 1
        return zz, dc

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(comps)
            try:
                for ci, (c, td, ta) in enumerate(scan):
                    q = qtabs.get(c["tq"])
                    if q is None:
                        raise CodecError(f"missing quant table {c['tq']}")
                    dct = huff_dc.get(td)
                    act = huff_ac.get(ta)
                    if dct is None or act is None:
                        raise CodecError("missing Huffman table")
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz, preds[ci] = read_block(reader, dct, act, preds[ci])
                            coef = np.zeros(64, dtype=np.float64)
                            coef[_ZIGZAG] = zz * q[_ZIGZAG]
                            block = _idct2(coef.reshape(1, 8, 8))[0] + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartPending:
                raise CodecError("unexpected restart marker")
            mcu_count += 1

    return _assemble_planes(h, w, hmax, vmax, comps, planes)


def _assemble_planes(h, w, hmax, vmax, comps, planes) -> np.ndarray:
    """Upsample subsampled components, crop to frame dims, and convert
    YCbCr→RGB (shared by the baseline and progressive paths)."""
    out_planes = []
    for c, plane in zip(comps, planes):
        ry = vmax // c["v"]
        rx = hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        img = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return img[:, :, None]
    ycc = np.stack(out_planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoding (ITU-T T.81 §G.2): each SOS refines the frame's
# coefficient grids; reconstruction happens once at EOI.
# ---------------------------------------------------------------------------


def _decode_progressive_scan(
    data, pos, frame, scan, band, huff_dc, huff_ac, restart_interval, coefs
) -> int:
    """Decode one progressive scan's entropy data into ``coefs``
    (per-component (bh, bw, 64) int32 grids in zigzag index order) and
    return the byte position of the next marker."""
    Ss, Se, Ah, Al = band
    comps_all = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _geometry(frame)
    reader = _BitReader(data, pos)

    def maybe_restart(count, reset):
        if restart_interval and count and count % restart_interval == 0:
            reader.sync_restart()
            return reset()
        return None

    if Ss == 0:
        if Se != 0:
            raise CodecError("progressive DC scan must have Se = 0")
        grids = [coefs[comps_all.index(c)] for c, _, _ in scan]
        tables = []
        for c, td, _ta in scan:
            t = huff_dc.get(td)
            if t is None and Ah == 0:
                raise CodecError("missing DC Huffman table")
            tables.append(t)
        preds = [0] * len(scan)
        interleaved = len(scan) > 1
        if interleaved:
            blocks_iter = (
                (my, mx) for my in range(mcus_y) for mx in range(mcus_x)
            )
        else:
            nbh, nbw = _noninterleaved_blocks(frame, scan[0][0])
            blocks_iter = ((by, bx) for by in range(nbh) for bx in range(nbw))
        count = 0
        for my, mx in blocks_iter:
            maybe_restart(count, lambda: preds.__setitem__(
                slice(None), [0] * len(scan)))
            for si, (c, _td, _ta) in enumerate(scan):
                reps = (
                    [(by, bx) for by in range(c["v"]) for bx in range(c["h"])]
                    if interleaved
                    else [(0, 0)]
                )
                for by, bx in reps:
                    y = my * c["v"] + by if interleaved else my
                    x = mx * c["h"] + bx if interleaved else mx
                    blk = grids[si][y, x]
                    if Ah == 0:
                        sym = _read_huff(reader, tables[si])
                        diff = _extend(reader.receive(sym), sym) if sym else 0
                        preds[si] += diff
                        blk[0] = preds[si] << Al
                    else:  # DC refinement: one raw bit per block
                        if reader.bit():
                            blk[0] = int(blk[0]) | (1 << Al)
            count += 1
        return _skip_to_marker(data, reader.pos)

    # AC scan: always single-component (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise CodecError("progressive AC scan must be single-component")
    c, _td, ta = scan[0]
    act = huff_ac.get(ta)
    if act is None:
        raise CodecError("missing AC Huffman table")
    grid = coefs[comps_all.index(c)]
    nbh, nbw = _noninterleaved_blocks(frame, c)
    eobrun = 0
    count = 0
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and count and count % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            blk = grid[by, bx]
            if Ah == 0:
                eobrun = _decode_ac_first_block(reader, act, blk, Ss, Se, Al, eobrun)
            else:
                eobrun = _decode_ac_refine_block(reader, act, blk, Ss, Se, Al, eobrun)
            count += 1
    return _skip_to_marker(data, reader.pos)


def _decode_ac_first_block(reader, act, blk, Ss, Se, Al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1  # whole block inside the EOB run
    k = Ss
    while k <= Se:
        sym = _read_huff(reader, act)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.receive(r)
            return eobrun - 1
        k += r
        if k > Se:
            raise CodecError("AC coefficient index out of band")
        blk[k] = _extend(reader.receive(s), s) << Al
        k += 1
    return 0


def _refine_bit(reader, blk, k, p1) -> None:
    """Correction bit for an already-nonzero coefficient (T.81 G.2.2)."""
    if reader.bit():
        v = int(blk[k])
        if (v & p1) == 0:
            blk[k] = v + (p1 if v >= 0 else -p1)


def _decode_ac_refine_block(reader, act, blk, Ss, Se, Al, eobrun) -> int:
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = _read_huff(reader, act)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise CodecError("invalid newly-significant magnitude")
                newval = p1 if reader.bit() else -p1
            while k <= Se:
                if blk[k] != 0:
                    _refine_bit(reader, blk, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= Se and newval:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            if blk[k] != 0:
                _refine_bit(reader, blk, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Past any pad bits / stuffing / restart markers to the next real
    marker's 0xFF byte."""
    n = len(data)
    p = pos
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise CodecError("truncated JPEG (no marker after scan)")


def _reconstruct_progressive(frame, coefs, qtabs) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise CodecError("zero-dimension JPEG")
    hmax, vmax, _, _ = _geometry(frame)
    planes = []
    for c, zz in zip(comps, coefs):
        q = qtabs.get(c["tq"])
        if q is None:
            raise CodecError(f"missing quant table {c['tq']}")
        bh, bw, _ = zz.shape
        nat = np.zeros((bh * bw, 64), dtype=np.float64)
        nat[:, _ZIGZAG] = zz.reshape(-1, 64) * q[_ZIGZAG][None, :]
        blocks = _idct2(nat.reshape(-1, 8, 8)) + 128.0
        planes.append(
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _assemble_planes(h, w, hmax, vmax, comps, planes)


def _read_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise CodecError("invalid Huffman code")
