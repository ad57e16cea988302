"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The container has no imaging libraries; this gives the media path a REAL
lossy interchange format next to the PNG codec in functions/png.py, closing
the reference's rasterize-and-recompress front end (the reference re-encodes
scanned pages as JPEG: ``fake_scan.py:239-245``; its committed source scan
``source/Table23-0471_residential_code.jpg`` is a baseline grayscale SOF0
file this decoder reads end-to-end).

Scope — baseline sequential DCT (SOF0), 8-bit:
- decode: grayscale and YCbCr 4:4:4 / 4:2:2 / 4:2:0, restart markers,
  16-bit DQT entries, multi-table DHT; progressive (SOF2) raises and the
  caller falls through to the PIL/cv2 seam in functions/images.py.
- encode: grayscale or RGB (4:4:4 or 4:2:0), libjpeg-style quality scaling
  of the Annex K tables, optional restart interval.

Entropy decoding uses a 16-bit peek LUT per Huffman table (symbol + code
length resolved in one indexed load), so the Python loop costs O(symbols),
not O(bits); everything block-shaped (DCT, quantization, zigzag, level
shift, subsampling) is vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

from .malloc_tuning import tune_malloc

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the public "typical" tables)
# ---------------------------------------------------------------------------
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# zigzag index: _ZIGZAG[k] = position in row-major 8x8 of the k-th zigzag coeff
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K Huffman specs: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: block = _DCT8 @ pixels @ _DCT8.T
_DCT8 = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    _DCT8[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)
# float32 twin for the ENCODE path (half the DRAM traffic; decode keeps
# float64 so the reference-scan conformance statistics stay pinned)
_DCT8_F32 = _DCT8.astype(np.float32)


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------
def _canonical_codes(bits: list[int], vals: list[int]):
    """(code, length, symbol) triples in canonical order."""
    out = []
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


# Plain dict cache, NOT functools.lru_cache: an lru_cache wrapper is
# pickled by reference and breaks pickle-by-value shipping to Ray workers.
# Building + .tolist() of the 64Ki-entry LUT costs ~1.6 ms — rebuilt per
# image it dominated decode; the same Annex-K tables recur in practice.
_DECODE_LUT_CACHE: dict[tuple, list[int]] = {}


def _decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit-peek LUT as a plain Python list of (length << 8 | symbol):
    one index resolves both in the hot loop (list indexing beats numpy
    scalar indexing ~5x in CPython). Codes longer than the peek window
    can't occur (JPEG caps code length at 16); 0 marks invalid codes."""
    key = (tuple(bits), tuple(vals))
    cached = _DECODE_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.int32)
    for code, ln, sym in _canonical_codes(bits, vals):
        lo = code << (16 - ln)
        hi = (code + 1) << (16 - ln)
        lut[lo:hi] = (ln << 8) | sym
    out = lut.tolist()
    if len(_DECODE_LUT_CACHE) < 64:
        _DECODE_LUT_CACHE[key] = out
    return out


def _encode_table(bits: list[int], vals: list[int]):
    codes = {}
    for code, ln, sym in _canonical_codes(bits, vals):
        codes[sym] = (code, ln)
    return codes


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------
class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (H//8 * W//8, 8, 8) raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = img.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All-blocks forward DCT + quantization -> (nblocks, 64) zigzag ints.

    float32 DCT + int16 coefficients (|quantized| <= 2032 at any quality):
    uint8 pixels are exact in float32 and the per-block dot products are
    8 terms, so precision is ample — and HALVING the bytes/element is what
    keeps 32 concurrent encode tasks off the DRAM-bandwidth wall (the
    float64/int64 pipeline ran 10-15x slower at full concurrency than
    alone; uint8/int16 stages degraded <2x on the same host)."""
    blocks = _blockify(plane).astype(np.float32) - np.float32(128.0)
    coef = np.matmul(np.matmul(_DCT8_F32, blocks), _DCT8_F32.T)
    q = qtab.reshape(8, 8).astype(np.float32)
    quant = np.round(coef / q).astype(np.int16)
    return quant.reshape(-1, 64)[:, _ZIGZAG]


def _encode_block(
    bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff > 0 else int(-diff).bit_length()
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        prev = int(idx) + 1
        while run >= 16:
            c, l = ac_codes[0xF0]
            bw.put(c, l)
            run -= 16
        v = int(zz[1 + idx])
        s = v.bit_length() if v > 0 else (-v).bit_length()
        c, l = ac_codes[(run << 4) | s]
        bw.put(c, l)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
    if prev < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.put(c, l)
    return int(zz[0])


_POW2_16 = np.uint64(1) << np.arange(0, 17, dtype=np.uint64)


def _bitlen_vec(v: np.ndarray) -> np.ndarray:
    """Exact bit_length of |v| per element (any int dtype in, int64 out)."""
    a = np.abs(v)
    # narrow inputs keep the narrow dtype (searchsorted handles mixed
    # dtypes); the uint64 upcast only for values that could need it
    if a.dtype.itemsize > 2:
        a = a.astype(np.uint64)
    return np.searchsorted(_POW2_16[1:], a, side="right").astype(
        np.int64
    ) + (a > 0)


def _table_arrays(codes: dict, size: int):
    code = np.zeros(size, dtype=np.int64)
    ln = np.zeros(size, dtype=np.int64)
    for sym, (c, l) in codes.items():
        code[sym] = c
        ln[sym] = l
    return code, ln


def _encode_scan_vec(
    zzall: np.ndarray,
    tsel: np.ndarray,
    csel: np.ndarray,
    tables,
    img_of_block: np.ndarray | None = None,
) -> list[bytes]:
    """Vectorized entropy coding of one or MANY scans (no restart markers).

    ``zzall``: (B, 64) quantized zigzag blocks in MCU scan order (images
    concatenated back-to-back when batching).
    ``tsel``: (B,) Huffman table id per block (0 luma / 1 chroma).
    ``csel``: (B,) DC-prediction chain key per block (component id, or
    image*ncomp+component when batching — chains reset per image).
    ``tables``: (dc_code, dc_len, ac_code, ac_len) arrays, each indexed
    [table_id, symbol].
    ``img_of_block``: (B,) image index per block (ascending); None = one
    image. Returns one scan byte-string per image, each independently
    1-padded to a byte boundary and 0xFF-stuffed.

    The per-coefficient Python loop of _encode_block becomes ~40 numpy
    ops over the full block set — run-lengths from np.nonzero gaps, ZRL
    expansion by repeat, canonical codes via LUT gather, one global bit
    scatter + packbits — and the fixed numpy overhead amortizes over the
    whole BATCH of pages, not per image (the reason jpeg_encode_batch
    exists: ~0.2 ms/page vs 5.8 ms scalar on 96x64 pages).
    """
    dc_code, dc_len, ac_code, ac_len = tables
    B = zzall.shape[0]
    if B == 0:
        return []
    blk = np.arange(B, dtype=np.int64)
    if img_of_block is None:
        img_of_block = np.zeros(B, dtype=np.int64)

    # ---- DC: per-chain first differences. Chains with contiguous blocks
    # (grayscale, batched or not) take the vectorized group-diff; the
    # interleaved color case has <= 4 chains and loops over masks.
    dcv = zzall[:, 0]
    uniq_chains = np.unique(csel)
    if len(uniq_chains) <= 4:
        diff = dcv.copy()
        for c in uniq_chains:
            m = csel == c
            d = dcv[m]
            diff[m] = np.concatenate([d[:1], np.diff(d)])
    else:
        chain_first = np.concatenate([[True], csel[1:] != csel[:-1]])
        if int(chain_first.sum()) != len(uniq_chains):
            raise JpegError("batched encode requires contiguous chains")
        prev_dc = np.concatenate([[np.int64(0)], dcv[:-1]])
        diff = np.where(chain_first, dcv, dcv - prev_dc)
    s_dc = _bitlen_vec(diff)
    dc_bits = np.where(diff > 0, diff, diff + (1 << s_dc) - 1)

    # ---- AC: nonzero runs, ZRL expansion, EOB flags. Value arrays are
    # int16/int32 (|coef| <= 2032, runs <= 62): every byte of dtype here
    # is DRAM traffic multiplied by task concurrency.
    ac = zzall[:, 1:]
    nzb, nzp = np.nonzero(ac)
    nzp32 = nzp.astype(np.int32)
    prev = np.concatenate([[np.int32(-1)], nzp32[:-1]])
    first = np.concatenate(
        [[True], nzb[1:] != nzb[:-1]]
    ) if len(nzb) else np.zeros(0, dtype=bool)
    prev[first] = -1
    run = nzp32 - prev - np.int32(1)
    kz = run >> 4  # ZRL count before this symbol
    rem = run & np.int32(15)
    v = ac[nzb, nzp].astype(np.int16)
    s_ac = _bitlen_vec(v).astype(np.int16)
    sym = (rem << 4) | s_ac
    v_bits = np.where(
        v > 0, v, v + ((np.int16(1) << s_ac) - np.int16(1))
    )

    has_nz = np.zeros(B, dtype=bool)
    has_nz[nzb] = True
    last_p = np.full(B, -1, dtype=np.int64)
    last_p[nzb] = nzp  # nzp ascending within each block
    eob = last_p < 62  # blocks whose data doesn't reach coeff 63

    # ---- direct positional assembly (no sort): per-block item counts
    # are known up front, so every symbol's final stream index is
    # computable and the codes scatter straight into place.
    # Within-block layout: DC sym, DC val, then per nonzero kz ZRLs +
    # AC sym + AC val, then EOB (when the block doesn't reach coeff 63).
    item_off = np.zeros(len(nzb), dtype=np.int64)
    if len(nzb):
        width = kz + 2
        cumw = np.cumsum(width)
        start_in_stream = cumw - width
        firsts = np.flatnonzero(first)
        block_first_idx = np.zeros(len(nzb), dtype=np.int32)
        block_first_idx[firsts] = start_in_stream[firsts]
        block_first_idx = np.maximum.accumulate(block_first_idx)
        item_off = 2 + start_in_stream - block_first_idx
        ac_width = np.bincount(
            nzb, weights=width.astype(np.float64), minlength=B
        ).astype(np.int64)
    else:
        ac_width = np.zeros(B, dtype=np.int64)
    counts = 2 + ac_width + eob.astype(np.int64)
    base = np.cumsum(counts) - counts
    M = int(counts.sum())
    a_bits = np.zeros(M, dtype=np.int32)  # codes <= 16 bits, values <= 12
    a_len = np.zeros(M, dtype=np.uint8)   # item bit-lengths <= 16
    a_bits[base] = dc_code[tsel, s_dc]
    a_len[base] = dc_len[tsel, s_dc]
    a_bits[base + 1] = dc_bits
    a_len[base + 1] = s_dc  # s_dc == 0 -> zero-length item, emits no bits
    if len(nzb):
        tz = int(kz.sum())
        if tz:
            zb = np.repeat(nzb, kz)
            zoff = np.repeat(item_off, kz) + (
                np.arange(tz) - np.repeat(np.cumsum(kz) - kz, kz)
            )
            zpos = base[zb] + zoff
            zt = tsel[zb]
            a_bits[zpos] = ac_code[zt, 0xF0]
            a_len[zpos] = ac_len[zt, 0xF0]
        t_nz = tsel[nzb]
        spos = base[nzb] + item_off + kz
        a_bits[spos] = ac_code[t_nz, sym]
        a_len[spos] = ac_len[t_nz, sym]
        a_bits[spos + 1] = v_bits
        a_len[spos + 1] = s_ac
    eb = np.flatnonzero(eob)
    epos = base[eb] + counts[eb] - 1
    a_bits[epos] = ac_code[tsel[eb], 0x00]
    a_len[epos] = ac_len[tsel[eb], 0x00]
    a_img = np.repeat(img_of_block.astype(np.int32), counts)

    # ---- per-image byte-aligned packing: scatter every code's bits into
    # one global bit array where each image starts on its own byte
    # boundary (pad bits are 1s, per T.81), then ONE packbits + ONE
    # stuffing pass, split at per-image byte offsets.
    n_img = int(img_of_block[-1]) + 1 if B else 0
    cum = np.cumsum(a_len, dtype=np.int64)  # uint8 input would wrap
    item_start = cum - a_len
    img_first = np.concatenate([[True], a_img[1:] != a_img[:-1]])
    first_idx = np.flatnonzero(img_first)
    # bits consumed before each image starts (item-stream coordinates)
    img_start_bits = item_start[first_idx]
    img_total_bits = np.diff(
        np.concatenate([img_start_bits, [cum[-1]]])
    )
    img_ids_present = a_img[first_idx]
    tot_bits = np.zeros(n_img, dtype=np.int64)
    tot_bits[img_ids_present] = img_total_bits
    padded = ((tot_bits + 7) // 8) * 8
    pad_base = np.concatenate([[0], np.cumsum(padded)[:-1]])

    # top-align each code in a uint16 and unpackbits MSB-first: the
    # item's bits are the first a_len columns. (The naive (M, 16) int64
    # shift matrix moves ~1.4 GB of temporaries; this is ~25x lighter.)
    sh = (a_bits << (16 - a_len)).astype(np.uint16)
    bitmat = np.unpackbits(
        sh.astype(">u2").view(np.uint8).reshape(-1, 2), axis=1
    )
    mask = np.arange(16, dtype=np.uint8)[None, :] < a_len[:, None]
    flat_vals = bitmat[mask]  # row-major == stream order
    # flat_vals is ALREADY the concatenated bit stream: items are
    # contiguous within an image, so destination gaps exist only at
    # image boundaries (byte padding). Per-image slice copies replace
    # the old positional scatter, whose three stream-length int64 index
    # arrays (~24 B/bit) were the encoder's dominant memory traffic —
    # the reason 32 concurrent encode tasks ran 10x slower than one
    # (DRAM-bandwidth saturation), measured 72 -> ~14 ms/page.
    allbits = np.ones(int(padded.sum()), dtype=np.uint8)  # 1-padding
    for ii, gi in enumerate(img_ids_present):
        s = img_start_bits[ii]
        t = s + img_total_bits[ii]
        dst = pad_base[gi]
        allbits[dst : dst + (t - s)] = flat_vals[s:t]
    packed = np.packbits(allbits)

    byte_bounds = np.concatenate([pad_base, [int(padded.sum())]]) // 8
    stuff = np.flatnonzero(packed == 0xFF)
    if len(stuff):
        packed = np.insert(packed, stuff + 1, 0)
        byte_bounds = byte_bounds + np.searchsorted(stuff, byte_bounds)
    return [
        packed[a:b].tobytes()
        for a, b in zip(byte_bounds[:-1], byte_bounds[1:])
    ]


def _rgb_to_ycbcr(img: np.ndarray):
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.float64)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def jpeg_encode(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to baseline JPEG."""
    tune_malloc()
    if img.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"unsupported image shape {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qy[_ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].tolist()))

    sub = 2 if (not gray and subsampling == "420") else 1
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (sub << 4) | sub, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)

    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_y = _encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    if gray:
        plane = _pad_to(img.astype(np.float64), 8, 8)
        zz = _fdct_quant(plane, qy)
        bpr = plane.shape[1] // 8
        mcus = [([("y", i)], None) for i in range(zz.shape[0])]
        planes = {"y": (zz, bpr)}
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        mh = 8 * sub
        y = _pad_to(y, mh, mh)
        if sub == 2:
            cb = _pad_to(cb, 16, 16).reshape(
                y.shape[0] // 2, 2, y.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr = _pad_to(cr, 16, 16).reshape(
                y.shape[0] // 2, 2, y.shape[1] // 2, 2
            ).mean(axis=(1, 3))
        else:
            cb = _pad_to(cb, 8, 8)
            cr = _pad_to(cr, 8, 8)
        zzy = _fdct_quant(y, qy)
        zzb = _fdct_quant(cb, qc)
        zzr = _fdct_quant(cr, qc)
        ybpr = y.shape[1] // 8
        cbpr = cb.shape[1] // 8
        mcux = y.shape[1] // (8 * sub)
        mcuy = y.shape[0] // (8 * sub)
        mcus = []
        for my in range(mcuy):
            for mx in range(mcux):
                order = []
                for dy in range(sub):
                    for dx in range(sub):
                        order.append(
                            ("y", (my * sub + dy) * ybpr + mx * sub + dx)
                        )
                order.append(("cb", my * cbpr + mx))
                order.append(("cr", my * cbpr + mx))
                mcus.append((order, None))
        planes = {"y": (zzy, ybpr), "cb": (zzb, cbpr), "cr": (zzr, cbpr)}

    tabs = {
        "y": (dc_y, ac_y),
        "cb": (dc_c, ac_c),
        "cr": (dc_c, ac_c),
    }
    if not restart_interval:
        # vectorized scan: gather blocks into MCU order + table/component
        # selectors, then one numpy entropy-coding pass
        comp_ids = {"y": 0, "cb": 1, "cr": 2}
        flat = [(comp, bi) for order, _ in mcus for comp, bi in order]
        csel = np.array([comp_ids[c] for c, _ in flat], dtype=np.int64)
        bis = np.array([bi for _, bi in flat], dtype=np.int64)
        tsel = (csel > 0).astype(np.int64)
        zzall = np.empty((len(flat), 64), dtype=np.int64)
        for comp, cid in comp_ids.items():
            m = csel == cid
            if m.any():
                zzall[m] = planes[comp][0][bis[m]]
        dc_code = np.zeros((2, 12), dtype=np.int64)
        dc_ln = np.zeros((2, 12), dtype=np.int64)
        ac_code = np.zeros((2, 256), dtype=np.int64)
        ac_ln = np.zeros((2, 256), dtype=np.int64)
        dc_code[0], dc_ln[0] = _table_arrays(dc_y, 12)
        dc_code[1], dc_ln[1] = _table_arrays(dc_c, 12)
        ac_code[0], ac_ln[0] = _table_arrays(ac_y, 256)
        ac_code[1], ac_ln[1] = _table_arrays(ac_c, 256)
        out += _encode_scan_vec(
            zzall, tsel, csel, (dc_code, dc_ln, ac_code, ac_ln)
        )[0]
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # restart markers need per-interval predictor resets and aligned
    # flushes: keep the scalar path for that (rare) configuration
    bw = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}
    rst = 0
    for k, (order, _) in enumerate(mcus):
        if restart_interval and k and k % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = {"y": 0, "cb": 0, "cr": 0}
        for comp, bi in order:
            zz, _bpr = planes[comp]
            dc, ac = tabs[comp]
            pred[comp] = _encode_block(bw, zz[bi], pred[comp], dc, ac)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def _destuff(data: bytes):
    """Strip 0xFF00 stuffing; split at RSTn. Returns (segments, end_index)
    where end_index points at the terminating marker's 0xFF.

    Jumps 0xFF-to-0xFF with bytes.find instead of walking every byte
    (entropy data is mostly non-0xFF), accumulating split points; the
    stuffing is stripped with one bytes.replace per segment."""
    bounds = [0]  # raw-offset starts of segments
    cuts = []     # (seg_end_raw, next_start_raw) at RST markers
    i = 0
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0:
            i = n
            break
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            cuts.append((j, j + 2))
            i = j + 2
        else:
            i = j
            break
    segs = []
    start = 0
    for end, nstart in cuts:
        segs.append(data[start:end].replace(b"\xff\x00", b"\xff"))
        start = nstart
    segs.append(data[start:i].replace(b"\xff\x00", b"\xff"))
    return segs, i


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG to (h, w) grayscale uint8 or (h, w, 3) RGB.

    Every parse failure raises JpegError (the contract decode_external
    relies on for its PIL/cv2/fake fall-through): malformed streams that
    would otherwise surface IndexError / struct.error / KeyError from the
    marker walk or the entropy decoder are wrapped here."""
    tune_malloc()
    try:
        return _jpeg_decode_inner(payload)
    except JpegError:
        raise
    except (IndexError, KeyError, ValueError, struct.error) as exc:
        raise JpegError(f"malformed JPEG stream: {exc!r}") from exc


def _jpeg_decode_inner(payload: bytes) -> np.ndarray:
    coef, bpr, comps, qtabs, size = _parse_to_coef_inner(payload)
    return _idct_assemble(coef, bpr, comps, qtabs, size)


def _parse_to_coef_inner(payload: bytes):
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, tuple] = {}
    ac_luts: dict[int, tuple] = {}
    comps = None  # list of (cid, H, V, tq)
    size = None
    dri = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise JpegError(f"expected marker at {i}")
        if i + 2 > n:
            raise JpegError("truncated marker stream")
        m = payload[i + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise JpegError("truncated marker stream")
        ln = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + ln]
        i += 2 + ln
        if m == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(
                        seg[j:j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(
                        seg[j:j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = vals  # stored in zigzag order
                qtabs[tq] = tab
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                j += 17 + nv
                (ac_luts if tc else dc_luts)[th] = _decode_lut(bits, vals)
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline / ext. sequential)
            prec = seg[0]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15,
                 seg[8 + 3 * c])
                for c in range(nc)
            ]
            size = (h, w)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0x{m:02x} "
                            "(progressive/arithmetic)")
        elif m == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if comps is None or size is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cid, tabsel = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(
                    (k for k, cc in enumerate(comps) if cc[0] == cid), None
                )
                if idx is None:
                    raise JpegError(
                        f"SOS references undeclared component id {cid}"
                    )
                scomp.append((idx, tabsel >> 4, tabsel & 15))
            if ns != len(comps):
                raise JpegError("multi-scan files not supported (baseline "
                                "interleaved or single-component only)")
            for idx, td, ta in scomp:
                if comps[idx][3] not in qtabs:
                    raise JpegError(
                        f"missing DQT table {comps[idx][3]} for scan"
                    )
                if td not in dc_luts or ta not in ac_luts:
                    raise JpegError(
                        f"missing DHT table (dc={td}, ac={ta}) for scan"
                    )
            segs, end = _destuff(payload[i:])
            coef, bpr = _decode_scan_coef(
                segs, size, comps, scomp, dc_luts, ac_luts, dri
            )
            return coef, bpr, comps, qtabs, size
        # APPn / COM: skip
    raise JpegError("no SOS found")


def _decode_scan_coef(segs, size, comps, scomp, dc_luts, ac_luts, dri):
    """Entropy decode only: (coef per component, blocks-per-row list).
    The block-shaped tail (dequant / IDCT / plane assembly) lives in
    _idct_assemble so jpeg_decode_batch can run it ONCE across a whole
    page batch instead of paying small-array numpy overhead per image."""
    h, w = size
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # MCU geometry
    if len(comps) == 1:
        # single-component scan: MCU is one block, raster over padded dims
        bx = (w + 7) // 8
        by = (h + 7) // 8
        n_mcu = bx * by
        per_mcu = [(0, 1, 1)]  # comp 0, one block
    else:
        bx = by = None
        n_mcu = ((w + 8 * hmax - 1) // (8 * hmax)) * (
            (h + 8 * vmax - 1) // (8 * vmax)
        )
        per_mcu = [(idx, comps[idx][1], comps[idx][2]) for idx, _, _ in scomp]

    # coefficient store per component
    coef = []
    bpr = []  # blocks per row per component
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        if len(comps) == 1:
            cw, cvh = (w + 7) // 8, (h + 7) // 8
        else:
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            cw, cvh = mcux * ch, mcuy * cv
        coef.append(np.zeros((cvh * cw, 64), dtype=np.int64))
        bpr.append(cw)

    tab_for = {idx: (td, ta) for idx, td, ta in scomp}
    pred = [0] * len(comps)
    mcux_full = bpr[0] if len(comps) == 1 else (w + 8 * hmax - 1) // (8 * hmax)

    # per-MCU (component, block-row-stride, intra-MCU dx, dy) template
    if len(comps) == 1:
        template = [(0, 1, 1, 0, 0)]
    else:
        template = []
        for idx, ch, cv in per_mcu:
            for dy in range(cv):
                for dx in range(ch):
                    template.append((idx, ch, cv, dx, dy))

    # hot loop: plain-int bit reader + fused LUTs + Python-list coefficient
    # rows (converted to the numpy store afterwards)
    coef_rows = [c.tolist() for c in coef]  # list-of-list, fast item writes
    dc_t = {th: lut for th, lut in dc_luts.items()}
    ac_t = {th: lut for th, lut in ac_luts.items()}
    seg_i = 0
    data = segs[0]
    dn = len(data)
    di = 0
    acc = 0
    nbits = 0
    for k in range(n_mcu):
        if dri and k and k % dri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise JpegError("missing restart segment")
            data = segs[seg_i]
            dn = len(data)
            di = 0
            acc = 0
            nbits = 0
            pred = [0] * len(comps)
        my, mx = divmod(k, mcux_full)
        for ci, ch, cv, dx, dy in template:
            td, ta = tab_for[ci]
            dlut = dc_t[td]
            alut = ac_t[ta]
            if len(comps) == 1:
                bi = k
            else:
                bi = (my * cv + dy) * bpr[ci] + mx * ch + dx
            zz = coef_rows[ci][bi]
            # --- DC --- (invariant: one >=27-bit refill covers the 16-bit
            # symbol peek AND the <=11-bit value read — three separate
            # byte-at-a-time while loops collapse to one branch/coeff)
            if nbits < 27:
                chunk = data[di:di + 4]
                di += len(chunk)
                acc = (acc << 32) | (
                    int.from_bytes(chunk, "big") << (32 - 8 * len(chunk))
                )
                nbits += 32
            e = dlut[(acc >> (nbits - 16)) & 0xFFFF]
            if e == 0:
                raise JpegError("bad DC huffman code")
            s = e & 0xFF
            nbits -= e >> 8
            if s:
                nbits -= s
                v = (acc >> nbits) & ((1 << s) - 1)
                diff = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                pred[ci] += diff
            zz[0] = pred[ci]
            # --- AC ---
            j = 1
            while j < 64:
                if nbits < 27:
                    chunk = data[di:di + 4]
                    di += len(chunk)
                    acc = (acc << 32) | (
                        int.from_bytes(chunk, "big")
                        << (32 - 8 * len(chunk))
                    )
                    nbits += 32
                e = alut[(acc >> (nbits - 16)) & 0xFFFF]
                if e == 0:
                    raise JpegError("bad AC huffman code")
                rs = e & 0xFF
                nbits -= e >> 8
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    j += 16
                    continue
                j += rs >> 4
                s = rs & 15
                if j > 63:
                    raise JpegError("AC coefficient overflow")
                nbits -= s
                v = (acc >> nbits) & ((1 << s) - 1)
                zz[j] = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                j += 1
            acc &= (1 << nbits) - 1  # keep the int small
    for ci in range(len(comps)):
        coef[ci][:] = np.asarray(coef_rows[ci], dtype=np.int64)
    return coef, bpr


def _idct_assemble(coef, bpr, comps, qtabs, size):
    h, w = size
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # dequantize + IDCT all blocks per component (vectorized)
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        q = qtabs[tq]
        dq = (coef[ci] * q[np.newaxis, :])[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.matmul(
            np.matmul(_DCT8.T, dq.astype(np.float64)), _DCT8
        ) + 128.0  # BLAS inverse DCT, not einsum
        cw = bpr[ci]
        cvh = coef[ci].shape[0] // cw
        plane = (
            pix.reshape(cvh, cw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(cvh * 8, cw * 8)
        )
        planes.append(np.clip(np.round(plane), 0, 255).astype(np.uint8))

    if len(comps) == 1:
        return planes[0][:h, :w]

    # upsample chroma to luma grid, crop, YCbCr -> RGB
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w].astype(np.float64))
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


_ENC_CHUNK_PAGES = 96   # encode working set ~ a few MB per chunk
_DEC_CHUNK_PAGES = 128  # decode stacks are lighter (coef store only)


def jpeg_encode_batch(
    stack: np.ndarray, quality: int = 85
) -> list[bytes]:
    """Encode a (N, H, W) uint8 grayscale stack to N baseline JPEGs in
    ONE vectorized pass: shared header bytes, one FDCT/quantize einsum
    over every block of every page, one entropy-coding pass with
    per-image DC-chain resets and per-image byte-aligned packing.

    This is the media-pipeline hot path (map_batches over page stacks):
    per-image numpy overhead dominates jpeg_encode on small pages
    (~5.6 ms each); batching amortizes it to ~0.2 ms/page. Byte output
    is identical to calling jpeg_encode per image."""
    tune_malloc()
    if stack.dtype != np.uint8 or stack.ndim != 3:
        raise ValueError("jpeg_encode_batch expects (N, H, W) uint8")
    n, h, w = stack.shape
    if n == 0:
        return []
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # Chunk big stacks: DC chains reset per image, so chunk outputs
    # concatenate byte-identically — and a 6x smaller working set means a
    # COLD worker faults ~1/6 the pages on its first chunk and reuses
    # them for the rest (the 10 s straggler tasks in a fresh Ray worker
    # pool were first-touch page faults, not codec arithmetic). Batching
    # efficiency is already saturated well below the chunk size.
    if n > _ENC_CHUNK_PAGES:
        out: list[bytes] = []
        for s in range(0, n, _ENC_CHUNK_PAGES):
            out.extend(
                jpeg_encode_batch(stack[s : s + _ENC_CHUNK_PAGES], quality)
            )
        return out
    qy = _quality_scale(_QUANT_LUMA, quality)

    header = bytearray(b"\xff\xd8")
    header += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    header += _seg(0xDB, bytes([0]) + bytes(qy[_ZIGZAG].tolist()))
    header += _seg(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    header += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    header += _seg(0xC4, _dht_payload(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    header += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    header = bytes(header)

    # float32 pixels / int16 coefficients end-to-end (see _fdct_quant):
    # the float64/int64 version of this stage saturated DRAM bandwidth at
    # 32-way task concurrency (10-15x per-task slowdown vs alone)
    ph, pw = ((h + 7) // 8) * 8, ((w + 7) // 8) * 8
    padded = np.empty((n, ph, pw), dtype=np.float32)
    padded[:, :h, :w] = stack
    if ph > h:
        padded[:, h:, :w] = stack[:, h - 1:h, :]
    if pw > w:
        padded[:, :, w:] = padded[:, :, w - 1:w]
    blocks = (
        padded.reshape(n, ph // 8, 8, pw // 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(-1, 8, 8)
    ) - np.float32(128.0)
    coef = np.matmul(np.matmul(_DCT8_F32, blocks), _DCT8_F32.T)
    q = qy.reshape(8, 8).astype(np.float32)
    zzall = (
        np.round(coef / q).astype(np.int16).reshape(-1, 64)[:, _ZIGZAG]
    )

    bpi = (ph // 8) * (pw // 8)  # blocks per image
    img = np.repeat(np.arange(n, dtype=np.int64), bpi)
    tsel = np.zeros(n * bpi, dtype=np.int64)
    dc_code = np.zeros((2, 12), dtype=np.int64)
    dc_ln = np.zeros((2, 12), dtype=np.int64)
    ac_code = np.zeros((2, 256), dtype=np.int64)
    ac_ln = np.zeros((2, 256), dtype=np.int64)
    dc_code[0], dc_ln[0] = _table_arrays(
        _encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS), 12
    )
    ac_code[0], ac_ln[0] = _table_arrays(
        _encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS), 256
    )
    scans = _encode_scan_vec(
        zzall, tsel, img, (dc_code, dc_ln, ac_code, ac_ln),
        img_of_block=img,
    )
    return [header + s + b"\xff\xd9" for s in scans]


def jpeg_decode_batch(payloads: list[bytes]) -> list[np.ndarray]:
    """Decode MANY baseline JPEGs with the block-shaped reconstruction
    stacked across the batch (the decode twin of jpeg_encode_batch).

    The marker parse + Huffman symbol walk stay per-image (each stream's
    bit state is sequential by construction), but for grayscale images the
    dequantize / inverse DCT / level-shift / clip — several small-array
    numpy ops per image that dominate decode wall on small pages — run as
    ONE concatenated pass over every block of every image, grouped by
    quantization table. Color / subsampled images fall back to the scalar
    tail per image. Output is byte-identical to jpeg_decode per payload."""
    tune_malloc()
    n = len(payloads)
    if n == 0:
        return []
    if n > _DEC_CHUNK_PAGES:
        out_all: list[np.ndarray] = []
        for s in range(0, n, _DEC_CHUNK_PAGES):
            out_all.extend(
                jpeg_decode_batch(payloads[s : s + _DEC_CHUNK_PAGES])
            )
        return out_all
    parsed = []
    for p in payloads:
        try:
            parsed.append(_parse_to_coef_inner(p))
        except JpegError:
            raise
        except (IndexError, KeyError, ValueError, struct.error) as exc:
            raise JpegError(f"malformed JPEG stream: {exc!r}") from exc

    out: list[np.ndarray | None] = [None] * n
    # group grayscale images by quantization table; everything else takes
    # the scalar tail (color assembly is not block-shaped after upsampling)
    groups: dict[bytes, list[int]] = {}
    for k, (coef, bpr, comps, qtabs, size) in enumerate(parsed):
        if len(comps) == 1:
            groups.setdefault(qtabs[comps[0][3]].tobytes(), []).append(k)
        else:
            out[k] = _idct_assemble(coef, bpr, comps, qtabs, size)
    for _, idxs in groups.items():
        q0 = parsed[idxs[0]][3][parsed[idxs[0]][2][0][3]]
        allcoef = np.concatenate([parsed[k][0][0] for k in idxs], axis=0)
        dq = (allcoef * q0[np.newaxis, :])[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.matmul(
            np.matmul(_DCT8.T, dq.astype(np.float64)), _DCT8
        ) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        off = 0
        for k in idxs:
            coef, bpr, comps, qtabs, size = parsed[k]
            h, w = size
            cw = bpr[0]
            cvh = coef[0].shape[0] // cw
            nb = coef[0].shape[0]
            plane = (
                pix[off:off + nb]
                .reshape(cvh, cw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(cvh * 8, cw * 8)
            )
            out[k] = plane[:h, :w]
            off += nb
    return out  # type: ignore[return-value]
