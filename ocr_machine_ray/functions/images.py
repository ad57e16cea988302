"""Image kernels (pure numpy — no OpenCV/PIL in this environment).

Images are raw 8-bit grayscale arrays carried as Arrow binary columns plus
(width, height) metadata — the engine's media representation (page rasters /
word crops, reference ``table_detector_agent.py:183-191``,
``create_bbox_chunked.py:25-26``).

Real-decoder stages (JPEG/PNG/video frames) are STUBS behind
`decode_external` — the Ray-side plumbing (schema, actor signature, batch
sizing) is real and tested; the codec call raises NotImplementedError
unless a deterministic fake is requested.
"""

from __future__ import annotations

import hashlib

import numpy as np

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


def synth_word_image(doc_id: int, offset: int, struck: bool) -> np.ndarray:
    """Deterministic word crop: light background + text-ish vertical strokes;
    if struck, a horizontal line through the middle satisfying the gates."""
    rng = np.random.default_rng((doc_id * 1_000_003 + offset) & 0x7FFFFFFF)
    img = np.full((WORD_H, WORD_W), 240, dtype=np.uint8)
    img = (img.astype(np.int16) + rng.integers(-10, 10, img.shape)).clip(
        0, 255
    ).astype(np.uint8)
    # text strokes: short dark vertical bars in the middle band
    n_strokes = int(rng.integers(4, 9))
    for _ in range(n_strokes):
        x = int(rng.integers(4, WORD_W - 4))
        y0 = int(rng.integers(4, 8))
        img[y0 : y0 + 12, x : x + 2] = 70
    if struck:
        y = int(WORD_H * float(rng.uniform(0.42, 0.58)))
        x0 = int(rng.integers(0, int(WORD_W * 0.1)))
        x1 = x0 + int(WORD_W * float(rng.uniform(0.65, 0.95)))
        img[y : y + 2, x0 : min(x1, WORD_W)] = 30
    return img


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
    if not lines.any():
        return False
    # connected horizontal components: label by rows of surviving pixels
    ys, xs = np.nonzero(lines)
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


def decode_external(payload: bytes, codec: str, fake: bool = False) -> np.ndarray:
    """STUB: real JPEG/PNG/video decode needs imaging libs absent from this
    container. With fake=True returns a deterministic image derived from the
    payload hash (for plumbing tests); otherwise raises."""
    if fake:
        seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (MEDIA_H, MEDIA_W), dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: no imaging libraries in this environment; "
        "swap in cv2/PIL decode here in production"
    )
