"""Pure-Python/numpy PNG codec (RFC 2083): 8-bit grayscale and RGB.

The container has no imaging libraries, but PNG needs only stdlib zlib +
byte plumbing, so the media path gets ONE real interchange format instead
of a stub: ``png_encode``/``png_decode`` round-trip bit-exactly and decode
output from any standards-compliant encoder (all five scanline filters are
implemented). ``decode_external`` in functions/images.py routes codec
"png" here and codec "jpeg" to the baseline JPEG codec in
functions/jpeg.py; only video demux remains a documented stub
(reference media I/O: ``table_detector_agent.py:183-191`` writes PNG page
rasters via pdf2image; ``fake_scan.py:239-245`` re-encodes JPEG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .malloc_tuning import tune_malloc

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    body = tag + payload
    return (
        struct.pack(">I", len(payload))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to PNG bytes
    (filter type 0 scanlines — simple, deterministic)."""
    tune_malloc()
    if img.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # scanlines: filter byte 0 + raw row
    rows = np.ascontiguousarray(img).reshape(h, w * channels)
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = rows
    idat = zlib.compress(raw.tobytes(), level)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(
    raw: np.ndarray, h: int, w: int, channels: int
) -> np.ndarray:
    """Reverse PNG scanline filtering. Filters 0/2 are vectorized; 1/3/4
    carry a left-neighbor dependency and run per pixel on the row."""
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    pos = 0
    for y in range(h):
        ftype = int(raw[pos])
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(
            stride, dtype=np.int32
        )
        if ftype == 0:
            res = line
        elif ftype == 2:  # Up
            res = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            res = line.copy()
            for x in range(bpp, stride):
                res[x] = (res[x] + res[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            res = line.copy()
            for x in range(stride):
                left = res[x - bpp] if x >= bpp else 0
                res[x] = (res[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            res = line.copy()
            for x in range(stride):
                left = int(res[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                res[x] = (res[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = res.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (h, w) or (h, w, 3) uint8. Supports bit depth
    8, color types 0 (gray) and 2 (RGB), no interlacing."""
    tune_malloc()
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    if color_type == 0:
        channels = 1
    elif color_type == 2:
        channels = 3
    else:
        raise ValueError(f"unsupported color type {color_type}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expected = h * (1 + w * channels)
    if len(raw) != expected:
        raise ValueError(f"IDAT size {len(raw)} != expected {expected}")
    out = _unfilter(raw, h, w, channels)
    return out.reshape((h, w) if channels == 1 else (h, w, channels))


# ---------------------------------------------------------------------------
# Netpbm PGM/PPM (binary P5/P6): the no-compression interchange format —
# trivial but REAL (any netpbm tool can read/write these streams).
# ---------------------------------------------------------------------------
def pnm_encode(img: np.ndarray) -> bytes:
    """P5 (grayscale, 2-D) or P6 (RGB, 3-D) binary netpbm."""
    if img.dtype != np.uint8:
        raise ValueError("pnm_encode expects uint8")
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    if img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise ValueError(f"unsupported shape {img.shape}")


def pnm_decode(data: bytes) -> np.ndarray:
    """Decode binary P5/P6 (whitespace- and comment-tolerant header)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM stream")
    rgb = data[:2] == b"P6"
    # header: magic, width, height, maxval — tokens separated by
    # whitespace, with '#' comments running to end of line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    if w <= 0 or h <= 0:
        # np.frombuffer(count=negative) silently reads everything and
        # reshape infers negative dims — reject the malformed header
        raise ValueError(f"invalid dimensions {w}x{h}")
    n = w * h * (3 if rgb else 1)
    if len(data) - pos < n:
        raise ValueError(
            f"truncated pixel data: need {n} bytes, have {len(data) - pos}"
        )
    buf = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return buf.reshape((h, w, 3) if rgb else (h, w)).copy()
