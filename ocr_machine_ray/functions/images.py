"""Image kernels (pure numpy — no OpenCV/PIL in this environment).

Images are raw 8-bit grayscale arrays carried as Arrow binary columns plus
(width, height) metadata — the engine's media representation (page rasters /
word crops, reference ``table_detector_agent.py:183-191``,
``create_bbox_chunked.py:25-26``).

`decode_external` routes codec "png" to the REAL pure-numpy/zlib codec in
functions/png.py, baseline JPEG to the real codec in functions/jpeg.py,
and MJPEG-in-AVI video to the real RIFF demux in functions/avi.py.
Progressive JPEG / WebP / mp4 / webm sit behind the PIL/cv2 import-try
seam: with no libs installed they fall to the deterministic fake
(fake=True, plumbing tests) or raise NotImplementedError.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Module-level package imports ONLY in files whose functions run inside
# worker batch fns: a function-body `from .jpeg import ...` executes on the
# worker at call time, where pickle-by-value shipped the CODE but the
# package itself is not importable (foreign driver cwd).
from .avi import AviError, avi_decode, is_avi
from .jpeg import JpegError, jpeg_decode, jpeg_decode_batch
from .png import png_decode, pnm_decode

MEDIA_W, MEDIA_H = 96, 64  # synthetic page-crop size
WORD_W, WORD_H = 80, 24    # synthetic word-region size


def _seed_from_ref(media_ref: str) -> int:
    return int(hashlib.md5(media_ref.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# Deterministic synthetic media payloads (FIXTURES.md F2): grid pattern for
# table docs, blob pattern for diagram docs, plain noise otherwise.
# ---------------------------------------------------------------------------
def synth_media_image(media_ref: str, pattern: str) -> np.ndarray:
    rng = np.random.default_rng(_seed_from_ref(media_ref))
    img = np.full((MEDIA_H, MEDIA_W), 235, dtype=np.uint8)
    img = (img.astype(np.int16) + rng.integers(-8, 8, img.shape)).clip(
        0, 255
    ).astype(np.uint8)
    if pattern == "grid":
        # ruled table: dark horizontal lines every 8 px, vertical every 16 px
        img[4::8, :] = 40
        img[:, 4::16] = 40
    elif pattern == "blob":
        # diagram-ish: one dark filled ellipse, no straight ruling
        yy, xx = np.mgrid[0:MEDIA_H, 0:MEDIA_W]
        cy, cx = MEDIA_H // 2, MEDIA_W // 2
        ry = 6 + int(rng.integers(0, 8))
        rx = 12 + int(rng.integers(0, 16))
        mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img[mask] = 60
    return img


# ---------------------------------------------------------------------------
# Page classifier kernel (M1/M18 stand-in): detect ruled grids via line
# periodicity, blobs via dark-mass without ruling.
# ---------------------------------------------------------------------------
def classify_page_image(
    img: np.ndarray, min_ruled_rows: int = 3, min_ruled_cols: int = 2
) -> tuple[bool, bool]:
    """(is_table, is_diagram) from dark-row/column ruling vs blob mass."""
    dark = img < 100
    row_frac = dark.mean(axis=1)  # fraction of dark pixels per row
    col_frac = dark.mean(axis=0)
    ruled_rows = (row_frac > 0.5).sum()
    ruled_cols = (col_frac > 0.5).sum()
    is_table = ruled_rows >= min_ruled_rows and ruled_cols >= min_ruled_cols
    dark_mass = dark.mean()
    # smallest synthetic blob covers ~3.7% of the page; noise/blank pages
    # have ~0% dark mass, ruled grids are caught by is_table first
    is_diagram = (not is_table) and dark_mass > 0.02
    return is_table, is_diagram


# ---------------------------------------------------------------------------
# Synthetic word-region images + the strikethrough CV kernel (M10).
# Gates mirror the reference exactly (strikethrough_agent.py:96-127):
#   horizontal text: line span > 0.4*w, thickness < 0.25*h,
#   center-y in [0.3, 0.7]*h, fill density >= 0.35.
# ---------------------------------------------------------------------------
STRIKE_MIN_SPAN = 0.4
STRIKE_MAX_THICK = 0.25
STRIKE_CENTER_LO = 0.3
STRIKE_CENTER_HI = 0.7
STRIKE_MIN_DENSITY = 0.35


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (counter-based determinism: every
    derived value is a pure function of its key, independent of batch
    composition — a per-image Generator object costs ~10x more than the
    whole image synthesis)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


_N_STROKE_SLOTS = 8
_PIXEL_CHUNKS = WORD_H * WORD_W // 8  # one u64 of noise per 8 pixels


def synth_word_image_stack(
    doc_ids: np.ndarray, offsets: np.ndarray, struck: np.ndarray
) -> np.ndarray:
    """(n, WORD_H, WORD_W) deterministic word crops, batch-vectorized.

    Light noisy background + dark vertical text strokes; struck rows get a
    horizontal line through the middle band satisfying the CV gates
    (span > 0.4w, thickness < 0.25h, center-y in [0.3, 0.7]h). All
    randomness is splitmix64 of (doc_id, offset, salt) counters."""
    n = len(doc_ids)
    H, W = WORD_H, WORD_W
    base = _mix64(
        doc_ids.astype(np.uint64) * np.uint64(0x100000001B3)
        ^ offsets.astype(np.uint64)
    )
    # background: 240 +- 10 noise, 8 pixels per mixed counter word
    ctr = base[:, None] ^ np.arange(
        1000, 1000 + _PIXEL_CHUNKS, dtype=np.uint64
    )
    nbytes = _mix64(ctr).view(np.uint8).reshape(n, H * W)
    img = (
        (np.int16(240) + (nbytes % 21).astype(np.int16) - 10)
        .clip(0, 255)
        .astype(np.uint8)
        .reshape(n, H, W)
    )
    # text strokes: 4-8 short dark vertical bars. Each stroke lives in its
    # own 9px slot with jitter % 5, guaranteeing >= 3px clearance between
    # strokes — the 3x3 blur then cannot bridge neighboring strokes into a
    # >= k horizontal run, which would merge with a genuine strike line
    # into an over-thick band and fail the thickness gate (false negative).
    n_strokes = 4 + (_mix64(base ^ np.uint64(2001)) % 5).astype(np.int64)
    j = np.arange(_N_STROKE_SLOTS, dtype=np.uint64)
    sx = (
        4
        + 9 * j.astype(np.int64)[None, :]
        + (
            _mix64(base[:, None] ^ (np.uint64(3000) + j)) % np.uint64(5)
        ).astype(np.int64)
    )
    sy = 4 + (
        _mix64(base[:, None] ^ (np.uint64(4000) + j)) % np.uint64(4)
    ).astype(np.int64)
    live = np.arange(_N_STROKE_SLOTS)[None, :] < n_strokes[:, None]
    i_idx, j_idx = np.nonzero(live)
    gidx = (
        i_idx[:, None, None] * (H * W)
        + (sy[i_idx, j_idx][:, None, None] + np.arange(12)[None, :, None]) * W
        + sx[i_idx, j_idx][:, None, None]
        + np.arange(2)[None, None, :]
    )
    flat = img.reshape(-1)
    flat[gidx.ravel()] = 70
    # strike line (struck rows only)
    sidx = np.flatnonzero(struck)
    if len(sidx):
        b = base[sidx]
        u_y = (_mix64(b ^ np.uint64(5001)) % 1024) / 1024.0
        y = (H * (0.42 + 0.16 * u_y)).astype(np.int64)
        x0 = (_mix64(b ^ np.uint64(5002)) % np.uint64(max(1, W // 10))).astype(
            np.int64
        )
        u_l = (_mix64(b ^ np.uint64(5003)) % 1024) / 1024.0
        x1 = np.minimum(x0 + (W * (0.65 + 0.30 * u_l)).astype(np.int64), W)
        cols = np.arange(W)
        m_i, m_c = np.nonzero(
            (cols[None, :] >= x0[:, None]) & (cols[None, :] < x1[:, None])
        )
        g1 = sidx[m_i] * (H * W) + y[m_i] * W + m_c
        flat[g1] = 30
        flat[g1 + W] = 30
    return img


def synth_word_image(doc_id: int, offset: int, struck: bool) -> np.ndarray:
    """Single-image convenience wrapper over synth_word_image_stack."""
    return synth_word_image_stack(
        np.array([doc_id], dtype=np.int64),
        np.array([offset], dtype=np.int64),
        np.array([struck], dtype=bool),
    )[0]


def _box_blur3(img: np.ndarray) -> np.ndarray:
    """3x3 box blur (stand-in for the reference's Gaussian 5x5)."""
    f = img.astype(np.float32)
    p = np.pad(f, 1, mode="edge")
    out = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 9.0
    return out


def _otsu_threshold(img: np.ndarray) -> float:
    hist = np.bincount(img.astype(np.uint8).ravel(), minlength=256).astype(
        np.float64
    )
    total = hist.sum()
    w0 = np.cumsum(hist)
    m = np.cumsum(hist * np.arange(256))
    mean_total = m[-1] / total
    w1 = total - w0
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = m / w0
        mu1 = (m[-1] - m) / w1
        between = w0 * w1 * (mu0 - mu1) ** 2
    between[np.isnan(between)] = 0
    return float(np.argmax(between))


def _window_sums_h(b: np.ndarray, k: int) -> np.ndarray:
    """Centered k-wide horizontal window sums with zero padding: out[c] =
    sum over original cols [c-shift, c+k-1-shift], shift=(k-1)//2."""
    shift = (k - 1) // 2
    p = np.pad(b, ((0, 0), (shift, k - 1 - shift)), constant_values=0)
    cs = np.cumsum(np.pad(p, ((0, 0), (1, 0))), axis=1, dtype=np.int32)
    return cs[:, k:] - cs[:, :-k]


def _open_horizontal(binary: np.ndarray, k: int) -> np.ndarray:
    """Morphological opening with a centered k x 1 horizontal line kernel
    (erode then dilate along rows, zero border) — isolates horizontal
    strokes like the reference's line-kernel open
    (strikethrough_agent.py:85-87). Both halves use the same centered
    windowing; a skewed dilation index here once shifted every opened line
    ~k px right and truncated right-edge strikes."""
    b = binary.astype(np.uint8)
    eroded = (_window_sums_h(b, k) == k).astype(np.uint8)
    return (_window_sums_h(eroded, k) > 0).astype(np.uint8)


def _bands_verdict(lines: np.ndarray, h: int, w: int) -> bool:
    """Geometric gates over the opened line image (shared by the scalar and
    stacked verdict paths)."""
    ys, xs = np.nonzero(lines)
    if len(ys) == 0:
        return False
    # group into bands of adjacent rows
    bands: list[tuple[int, int]] = []
    for y in np.unique(ys):
        if bands and y <= bands[-1][1] + 1:
            bands[-1] = (bands[-1][0], int(y))
        else:
            bands.append((int(y), int(y)))
    for y0, y1 in bands:
        sel = (ys >= y0) & (ys <= y1)
        x_span = xs[sel].max() - xs[sel].min() + 1
        thickness = y1 - y0 + 1
        cy = (y0 + y1) / 2
        if (
            x_span > STRIKE_MIN_SPAN * w
            and thickness < STRIKE_MAX_THICK * h
            and STRIKE_CENTER_LO * h <= cy <= STRIKE_CENTER_HI * h
        ):
            region = lines[y0 : y1 + 1, xs[sel].min() : xs[sel].max() + 1]
            if region.mean() >= STRIKE_MIN_DENSITY:
                return True
    return False


def cv_strike_verdict(img: np.ndarray, orientation_vertical: bool = False) -> bool:
    """Image-space strikethrough decision with the reference's geometric
    gates. Horizontal-text path only is exercised by the synthetic corpus;
    the vertical path transposes and reuses it
    (strikethrough_agent.py:69-127)."""
    if orientation_vertical:
        img = img.T
    h, w = img.shape
    blur = _box_blur3(img)
    t = _otsu_threshold(blur.astype(np.uint8))
    binary = (blur <= t).astype(np.uint8)  # inverse binary: dark -> 1
    k = max(w // 4, 3)
    lines = _open_horizontal(binary, k)
    return _bands_verdict(lines, h, w)


# ---------------------------------------------------------------------------
# Stacked (batch-vectorized) CV path: same math as the scalar kernels but
# over an (n, h, w) stack — one pad/cumsum/argmax per BATCH instead of per
# image. Value-identical to the scalar path (asserted in pytest); the
# residual per-image Python work (band grouping) runs only on the minority
# of images whose opened line image is non-empty.
# ---------------------------------------------------------------------------
def _box_sum9_stack(stack: np.ndarray) -> np.ndarray:
    """(n, h, w) uint16 3x3 box SUMS (edge-padded), separable passes.

    Integer sums instead of the scalar path's float32 mean: the float
    quantities it feeds are recovered exactly — uint8(blur) == sum // 9
    (both exact for sums <= 2295 in float32), and ``blur <= t`` for integer
    t is equivalent to ``sum <= 9 t`` (an integer sum strictly above 9t is
    at least 1/9 above t, far beyond a float32 ulp)."""
    p = np.pad(
        stack.astype(np.uint16), ((0, 0), (1, 1), (1, 1)), mode="edge"
    )
    h3 = p[:, :, :-2] + p[:, :, 1:-1] + p[:, :, 2:]
    return h3[:, :-2, :] + h3[:, 1:-1, :] + h3[:, 2:, :]


def _otsu_threshold_stack(blur_u8: np.ndarray) -> np.ndarray:
    """(n,) Otsu thresholds — identical arithmetic to _otsu_threshold,
    computed row-parallel on an (n, 256) histogram matrix."""
    n = blur_u8.shape[0]
    idx = blur_u8.reshape(n, -1).astype(np.int32)
    idx += (np.arange(n, dtype=np.int32) * 256)[:, None]
    hist = np.bincount(idx.ravel(), minlength=n * 256).reshape(
        n, 256
    ).astype(np.float64)
    total = hist.sum(axis=1, keepdims=True)
    w0 = np.cumsum(hist, axis=1)
    m = np.cumsum(hist * np.arange(256), axis=1)
    w1 = total - w0
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = m / w0
        mu1 = (m[:, -1:] - m) / w1
        between = w0 * w1 * (mu0 - mu1) ** 2
    between[np.isnan(between)] = 0
    return np.argmax(between, axis=1).astype(np.float64)


def _window_sums_h_stack(b: np.ndarray, k: int) -> np.ndarray:
    shift = (k - 1) // 2
    p = np.pad(b, ((0, 0), (0, 0), (shift, k - 1 - shift)),
               constant_values=0)
    cs = np.cumsum(
        np.pad(p, ((0, 0), (0, 0), (1, 0))), axis=2, dtype=np.int32
    )
    return cs[:, :, k:] - cs[:, :, :-k]


def cv_strike_verdict_stack(
    stack: np.ndarray, orientation_vertical: bool = False
) -> np.ndarray:
    """(n,) bool verdicts for an (n, h, w) uniform-size word-image stack."""
    if orientation_vertical:
        stack = stack.transpose(0, 2, 1)
    n, h, w = stack.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    sum9 = _box_sum9_stack(stack)
    t = _otsu_threshold_stack((sum9 // 9).astype(np.uint8))
    # blur <= t  ==  sum9 <= 9t (see _box_sum9_stack)
    binary = (sum9 <= (9 * t).astype(np.uint16)[:, None, None]).astype(
        np.uint8
    )
    k = max(w // 4, 3)
    eroded = (_window_sums_h_stack(binary, k) == k).astype(np.uint8)
    lines = (_window_sums_h_stack(eroded, k) > 0).astype(np.uint8)
    out = np.zeros(n, dtype=bool)
    for i in np.flatnonzero(lines.any(axis=(1, 2))):
        out[i] = _bands_verdict(lines[i], h, w)
    return out


def classify_page_stack(
    stack: np.ndarray, min_ruled_rows: int = 3, min_ruled_cols: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """(is_table, is_diagram) arrays for an (n, h, w) page stack — the
    stacked twin of classify_page_image (bool sums are integer-exact in
    float64, so the means compare identically)."""
    dark = stack < 100
    row_frac = dark.mean(axis=2)
    col_frac = dark.mean(axis=1)
    ruled_rows = (row_frac > 0.5).sum(axis=1)
    ruled_cols = (col_frac > 0.5).sum(axis=1)
    is_table = (ruled_rows >= min_ruled_rows) & (ruled_cols >= min_ruled_cols)
    dark_mass = dark.mean(axis=(1, 2))
    is_diagram = ~is_table & (dark_mass > 0.02)
    return is_table, is_diagram


# ---------------------------------------------------------------------------
# White-out redaction (M14) and bbox scaling (M16).
# ---------------------------------------------------------------------------
def whiteout(img: np.ndarray, bboxes_norm: list[tuple[float, float, float, float]]) -> np.ndarray:
    """Fill normalized (left, top, width, height) boxes with white
    (white_out_manager.py:28-34 semantics)."""
    out = img.copy()
    h, w = out.shape
    for left, top, bw, bh in bboxes_norm:
        x0, y0 = int(left * w), int(top * h)
        x1, y1 = int((left + bw) * w), int((top + bh) * h)
        out[max(0, y0) : min(h, y1), max(0, x0) : min(w, x1)] = 255
    return out


def bbox_norm_to_pixel(
    bbox: tuple[float, float, float, float], w: int, h: int
) -> tuple[int, int, int, int]:
    left, top, bw, bh = bbox
    return int(left * w), int(top * h), int(bw * w), int(bh * h)


def bbox_pixel_to_norm(
    box: tuple[int, int, int, int], w: int, h: int
) -> tuple[float, float, float, float]:
    x, y, bw, bh = box
    return x / w, y / h, bw / w, bh / h


# ---------------------------------------------------------------------------
# Scan-noise augmenter (M19) + compressor (M20) — deterministic, doc-seeded.
# ---------------------------------------------------------------------------
def augment_scan(img: np.ndarray, doc_id: int) -> np.ndarray:
    """fake_scan-style degradation, all parameters seeded by doc_id
    (fake_scan.py:13-51 ScannerParams analog; determinism required for
    resume + equality tests, unlike the reference's unseeded random)."""
    rng = np.random.default_rng(doc_id & 0x7FFFFFFF)
    out = img.astype(np.float32)
    # brightness / contrast jitter
    out = (out - 128.0) * float(rng.uniform(0.9, 1.1)) + 128.0
    out += float(rng.uniform(-12, 12))
    # gaussian noise
    out += rng.normal(0, 6.0, out.shape)
    # dust: a few dark specks
    for _ in range(int(rng.integers(2, 6))):
        y = int(rng.integers(0, out.shape[0]))
        x = int(rng.integers(0, out.shape[1]))
        out[y : y + 2, x : x + 2] = 30
    return out.clip(0, 255).astype(np.uint8)


def compress_quantize(img: np.ndarray, levels: int = 16) -> np.ndarray:
    """JPEG-q40 stand-in: uniform gray-level quantization (deterministic,
    measurable size reduction under RLE-style entropy; fake_scan.py:239-245)."""
    step = 256 // levels
    return ((img // step) * step + step // 2).clip(0, 255).astype(np.uint8)


def have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def have_cv2() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_with_libs(payload: bytes) -> np.ndarray | None:
    """Real-codec path, active only when an imaging library is installed
    (gated like have_lance(), sources/readers.py). Returns a grayscale
    uint8 array, or None when no library is present."""
    if have_pil():
        import io

        import PIL.Image

        try:
            with PIL.Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("L"), dtype=np.uint8)
        except Exception:
            pass  # unidentifiable payload: same fallback as no-lib case
    if have_cv2():
        import cv2

        try:
            arr = cv2.imdecode(
                np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_GRAYSCALE
            )
        except Exception:
            arr = None
        return None if arr is None else arr.astype(np.uint8)
    return None


def decode_external(payload: bytes, codec: str, fake: bool = False) -> np.ndarray:
    """Decode an external media payload. PNG/PGM/PPM are REAL (pure
    numpy/zlib codec in functions/png.py, all five scanline filters) and so
    is baseline JPEG (pure numpy codec in functions/jpeg.py — SOF0
    grayscale/4:4:4/4:2:2/4:2:0, restart markers; it reads the reference's
    committed scan source/Table23-0471_residential_code.jpg end-to-end).
    Progressive JPEG / WebP / etc decode through PIL or cv2 WHEN INSTALLED
    (import-try gate); in this container neither is present, so those fall
    to the deterministic fake (fake=True, for plumbing tests) or raise.
    Video: MJPEG-in-AVI is REAL (RIFF demux in functions/avi.py; this
    entry point returns the decoded FIRST frame as the representative
    raster — full-sequence demux is avi_decode + decode_external_batch);
    mp4/webm stay behind the documented no-AV-libs seam."""
    if codec.lower() in ("avi", "mjpeg", "video") and is_avi(payload):
        try:
            frames, _meta = avi_decode(payload)
            if frames:
                return decode_external(frames[0], "jpeg", fake=fake)
        except (AviError, JpegError):
            pass  # malformed container: fake/raise below
    if codec.lower() == "png":
        return png_decode(payload)
    if codec.lower() in ("pgm", "ppm", "pnm"):
        return pnm_decode(payload)
    if codec.lower() in ("jpeg", "jpg"):
        try:
            img = jpeg_decode(payload)
        except JpegError:
            img = None  # progressive/arithmetic: try PIL/cv2, then fake
        if img is not None:
            if img.ndim == 3:  # BT.601 luma, same convention as encoding
                f = img.astype(np.float64)
                img = np.clip(
                    np.round(
                        0.299 * f[..., 0]
                        + 0.587 * f[..., 1]
                        + 0.114 * f[..., 2]
                    ),
                    0,
                    255,
                ).astype(np.uint8)
            return img
    if codec.lower() not in ("video", "mp4", "webm"):
        decoded = _decode_with_libs(payload)
        if decoded is not None:
            return decoded
    if fake:
        seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (MEDIA_H, MEDIA_W), dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: no imaging libraries in this environment; "
        "PIL/cv2 activate automatically when installed"
    )


def decode_external_batch(
    payloads: list[bytes], codec: str, fake: bool = False
) -> list[np.ndarray]:
    """Batch decode: same contract as [decode_external(p, codec) for p],
    but for baseline JPEG the block-shaped reconstruction (dequantize /
    IDCT / level-shift) is stacked across every image of the batch via
    jpeg_decode_batch — the dominant cost of decoding many small pages.
    Any payload the pure codec rejects falls back to the scalar path
    (PIL/cv2 seam, then fake/raise), exactly as decode_external would."""
    if codec.lower() in ("jpeg", "jpg") and payloads:
        try:
            imgs = jpeg_decode_batch(payloads)
        except JpegError:
            imgs = None  # >=1 malformed payload: scalar path per image
        if imgs is not None:
            out = []
            for img in imgs:
                if img.ndim == 3:  # BT.601 luma, as in decode_external
                    f = img.astype(np.float64)
                    img = np.clip(
                        np.round(
                            0.299 * f[..., 0]
                            + 0.587 * f[..., 1]
                            + 0.114 * f[..., 2]
                        ),
                        0,
                        255,
                    ).astype(np.uint8)
                out.append(img)
            return out
    return [decode_external(p, codec, fake=fake) for p in payloads]


# ---------------------------------------------------------------------------
# Perceptual image hashing (aHash) for image-level near-dup detection.
#
# The synthetic corpus plants duplicate groups the way a web crawl contains
# re-hosted images: every document renders a "page thumbnail" whose block
# structure is one of PHASH_MOTIFS shared motifs (motif = doc_id %
# PHASH_MOTIFS), odd documents carry a 1-2 block local edit (a changed logo
# / banner), and every render adds independent pixel noise. The aHash must
# see through the noise (block means dominate) and the banded-hamming LSH
# must see through the local edits (each edit dirties at most 2 of 8 bands).
#
# Motif band bytes are codewords of the extended Hamming [8,4,4] code, so
# any two motifs differ by >=4 bits in EVERY band: no cross-motif bucket
# collisions (a <=2-bit variant edit cannot reach another motif's byte) and
# verified pairs are exactly the planted groups.
# ---------------------------------------------------------------------------
PHASH_MOTIFS = 16
PHASH_BANDS = 8
PHASH_THRESHOLD = 4          # max hamming within a planted group (2+2 edits)
PHASH_H, PHASH_W = 64, 96    # rendered thumb; 8x8 block grid of 8x12 blocks
_PHASH_DARK, _PHASH_LIGHT = 60, 220


def _ext_hamming_codewords() -> np.ndarray:
    """All 16 codewords of the extended Hamming [8,4,4] code as uint8."""
    words = np.zeros(16, dtype=np.uint8)
    for m in range(16):
        d = [(m >> i) & 1 for i in range(4)]
        p1 = d[0] ^ d[1] ^ d[3]
        p2 = d[0] ^ d[2] ^ d[3]
        p3 = d[1] ^ d[2] ^ d[3]
        bits = [p1, p2, d[0], p3, d[1], d[2], d[3]]
        bits.append(int(np.bitwise_xor.reduce(bits)))  # overall parity
        words[m] = sum(b << i for i, b in enumerate(bits))
    return words


def phash_motif_table() -> np.ndarray:
    """(PHASH_MOTIFS, 64) uint8 bit matrix of the motif block patterns.
    Band b of motif m is codeword[m] XOR a fixed per-band mask (XOR is an
    isometry, so the >=4-bit per-band separation is preserved)."""
    code = _ext_hamming_codewords()
    rng = np.random.default_rng(0x9E3779B9)
    masks = rng.integers(0, 256, PHASH_BANDS, dtype=np.uint8)
    bits = np.zeros((PHASH_MOTIFS, 64), dtype=np.uint8)
    for b in range(PHASH_BANDS):
        band_bytes = code ^ masks[b]
        for bit in range(8):
            bits[:, b * 8 + bit] = (band_bytes >> bit) & 1
    return bits


def phash_variant_bits(doc_ids: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 planted block patterns: motif of doc_id % PHASH_MOTIFS,
    plus <=2 deterministic block edits on odd doc_ids."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    bits = phash_motif_table()[doc_ids % PHASH_MOTIFS].copy()
    odd = (doc_ids % 2 == 1).nonzero()[0]
    f1 = (doc_ids[odd] * 7) % 64
    f2 = (doc_ids[odd] * 13) % 64
    bits[odd, f1] ^= 1
    bits[odd, f2] ^= 1  # may equal f1 (edit undone -> 1 flip); still <=2
    return bits


def render_thumb_stack(doc_ids: np.ndarray) -> np.ndarray:
    """(n, PHASH_H, PHASH_W) uint8 rendered thumbnails: dark/light blocks
    from the planted pattern plus per-render pixel noise. Noise is seeded
    from the batch so renders are not byte-identical across runs — the hash
    must be invariant to it, not the pixels."""
    bits = phash_variant_bits(doc_ids)
    n = len(bits)
    block = np.where(bits == 1, _PHASH_DARK, _PHASH_LIGHT).astype(np.int16)
    grid = block.reshape(n, 8, 8)
    img = np.repeat(
        np.repeat(grid, PHASH_H // 8, axis=1), PHASH_W // 8, axis=2
    )
    seed = int(doc_ids[0]) if n else 0
    rng = np.random.default_rng(seed ^ 0xA5A5A5)
    noise = rng.integers(-8, 9, img.shape, dtype=np.int16)
    return (img + noise).clip(0, 255).astype(np.uint8)


def ahash_stack(imgs: np.ndarray) -> np.ndarray:
    """Average hash of an (n, H, W) stack: 8x8 block means thresholded at
    each image's global mean; bit=1 for darker-than-mean. Returns (n, 64)
    uint8 bits (bit i = block row i//8, col i%8, LSB-first within bytes to
    match phash_variant_bits)."""
    n, h, w = imgs.shape
    bh, bw = h // 8, w // 8
    means = (
        imgs.astype(np.float64)
        .reshape(n, 8, bh, 8, bw)
        .mean(axis=(2, 4))
    )  # (n, 8 rows, 8 cols)
    global_mean = means.mean(axis=(1, 2), keepdims=True)
    bits = (means < global_mean).astype(np.uint8)
    return bits.reshape(n, 64)


def pack_hash_bits(bits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 64) bits -> (hash64 int64, (n, PHASH_BANDS) band bytes int64).
    LSB-first packing within each byte, band b = bits[8b:8b+8]."""
    weights = (1 << np.arange(8, dtype=np.int64))
    bands = (
        bits.reshape(-1, PHASH_BANDS, 8).astype(np.int64) * weights
    ).sum(axis=2)
    byte_w = (1 << (8 * np.arange(PHASH_BANDS, dtype=np.int64)))
    h = (bands * byte_w).sum(axis=1)
    return h, bands


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR over int64 hashes (vectorized, no Python loop)."""
    x = np.bitwise_xor(a, b).view(np.uint64)
    return np.unpackbits(
        x.view(np.uint8).reshape(len(x), 8), axis=1
    ).sum(axis=1).astype(np.int64)
