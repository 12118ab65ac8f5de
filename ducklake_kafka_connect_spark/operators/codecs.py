"""Real media codecs with zero third-party codec dependencies.

The container ships no Pillow/soundfile, but three standard formats are
decodable with numpy + the stdlib alone, which upgrades the multimodal
pipeline's codec slot from "deterministic stand-in" to a REAL decode for
uncompressed media:

- **PPM/PGM** (netpbm P6/P5 binary): header parse + frombuffer reshape.
- **BMP** (24/32-bit uncompressed BITMAPINFOHEADER): struct header,
  bottom-up row order, 4-byte row padding.
- **WAV** (PCM): stdlib ``wave`` for framing, numpy for samples.

Compressed formats (JPEG/PNG/FLAC/…) still require Pillow/soundfile and
stay behind the import-try gate in ``multimodal.py`` — ``sniff_format``
tells callers which path a payload needs. Resize is nearest-neighbor
index sampling (the deterministic choice: no filter kernels to disagree
about).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class CodecError(ValueError):
    pass


def sniff_format(payload: bytes) -> str | None:
    """Best-effort container sniff from magic bytes; None = unknown."""
    if payload.startswith(b"P6") or payload.startswith(b"P5"):
        return "ppm"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


# ---------------------------------------------------------------------------
# netpbm (P5 grayscale / P6 RGB, binary)
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes):
    """Parse 'P5|P6 <w> <h> <maxval>' allowing comments/whitespace; returns
    (magic, width, height, maxval, data_offset)."""
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < n and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise CodecError("truncated PNM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as e:
            raise CodecError(f"bad PNM header token {payload[start:pos]!r}") from e
    return payload[:2], fields[0], fields[1], fields[2], pos + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8; P5 → (h, w, 1) uint8."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise CodecError(f"not a binary PNM payload: {magic!r}")
    _, w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise CodecError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    body = payload[off : off + need]
    if len(body) < need:
        raise CodecError(f"PNM body truncated: {len(body)} < {need}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, ch)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 1|3) uint8 → binary PGM/PPM (the test-fixture writer)."""
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f" {w} {h} 255\n".encode() + arr.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP → (h, w, 3) uint8 RGB (alpha dropped).
    Handles bottom-up (positive height) and top-down rows, and the
    4-byte row padding the format requires."""
    if payload[:2] != b"BM":
        raise CodecError("not a BMP payload")
    if len(payload) < 54:
        raise CodecError("BMP header truncated")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise CodecError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise CodecError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    bytes_px = bpp // 8
    stride = (w * bytes_px + 3) & ~3
    need = stride * h
    body = payload[data_off : data_off + need]
    if len(body) < need:
        raise CodecError(f"BMP body truncated: {len(body)} < {need}")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * bytes_px].reshape(h, w, bytes_px)
    if not top_down:
        px = px[::-1]
    # BGR(A) storage → RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP (test-fixture writer)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = arr[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for row in bgr[::-1]:
        body += row.astype(np.uint8).tobytes() + pad
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → ((n_frames, n_channels) int array, sample_rate)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            nch = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    # wave raises EOFError (not wave.Error) on empty/truncated chunks
    except (wave.Error, EOFError, struct.error) as e:
        raise CodecError(f"bad WAV payload: {e}") from e
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        arr = np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise CodecError(f"unsupported WAV sample width {width}")
    return arr.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n, ch) int16 → PCM WAV bytes (test-fixture writer)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize: deterministic (no kernel choices), pure
    index arithmetic — identical on every platform."""
    h, w = arr.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[yi][:, xi]


def decode_image_array(payload: bytes) -> np.ndarray:
    """Dispatch decode by sniffed format; CodecError for compressed or
    unknown formats (those need the Pillow-gated path)."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise CodecError(f"no built-in decoder for format {fmt!r}")
