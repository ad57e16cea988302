"""Media-side Ray Data stages: synthesis, classification, strikethrough CV,
redaction, augmentation (SURVEY.md §2 M1/M10/M14/M17/M18/M19/M20).

All stages are actor-pool ``map_batches`` callables over Arrow batches whose
image payloads are raw grayscale bytes + (width, height) columns. Stateful
setup (nothing heavy here, but the pattern stands in for model loads) happens
once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..corpus import struck_mask
from ..functions.avi import avi_decode, avi_encode, is_avi
from ..functions.geometry import rule_and_derived_vertical
from ..functions.images import (
    MEDIA_H,
    MEDIA_W,
    WORD_H,
    WORD_W,
    augment_scan,
    classify_page_image,
    classify_page_stack,
    compress_quantize,
    cv_strike_verdict,
    cv_strike_verdict_stack,
    decode_external_batch,
    synth_media_image,
    synth_word_image_stack,
    whiteout,
)
from ..functions.jpeg import jpeg_encode_batch
from ..functions.malloc_tuning import tune_malloc
from ..stages.strike import token_index_from_offset


def _imgs_from_batch(batch: pa.Table, w_col="width", h_col="height"):
    buf = batch["bytes"].to_pylist()
    ws = batch[w_col].to_pylist()
    hs = batch[h_col].to_pylist()
    return [
        np.frombuffer(b, dtype=np.uint8).reshape(h, w)
        for b, w, h in zip(buf, ws, hs)
    ]


def _stack_from_batch(batch: pa.Table, w_col="width", h_col="height"):
    """(n, h, w) stack when every image in the batch has the same size
    (the common case — fixed-size word crops / page rasters), else None.
    One join + one frombuffer instead of n reshapes."""
    ws = batch[w_col].to_numpy(zero_copy_only=False)
    hs = batch[h_col].to_numpy(zero_copy_only=False)
    if len(ws) == 0 or (ws != ws[0]).any() or (hs != hs[0]).any():
        return None
    buf = b"".join(batch["bytes"].to_pylist())
    n = len(ws)
    expected = n * int(ws[0]) * int(hs[0])
    if len(buf) != expected:
        return None
    return np.frombuffer(buf, dtype=np.uint8).reshape(
        n, int(hs[0]), int(ws[0])
    )


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Flat media spans (media_ref + category) -> media payload rows (F2)."""
    refs = batch["media_ref"].to_pylist()
    cats = batch["category"].to_pylist()
    patterns = [
        "grid" if c == "tables" else ("blob" if c == "diagrams" else "blank")
        for c in cats
    ]
    imgs = [synth_media_image(r, p) for r, p in zip(refs, patterns)]
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "doc_id": batch["doc_id"],
            "bytes": pa.array([i.tobytes() for i in imgs], type=pa.binary()),
            "width": pa.array([MEDIA_W] * len(refs), type=pa.int32()),
            "height": pa.array([MEDIA_H] * len(refs), type=pa.int32()),
            "pattern": pa.array(patterns, type=pa.string()),
        }
    )


class PageClassifier:
    """Actor-pool page classifier (M1/M18 rebuilt): grid-ruling vs blob-mass
    heuristics on the image pixels — the deterministic stand-in for the
    reference's vision-model call (table_detector_agent.py:64-118)."""

    def __init__(self, min_ruled_rows: int = 3):
        # stands in for model load / prompt setup (once per actor)
        self.min_ruled_rows = min_ruled_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        stack = _stack_from_batch(batch)
        if stack is not None:
            is_table, is_diagram = classify_page_stack(
                stack, self.min_ruled_rows
            )
            is_table = is_table.tolist()
            is_diagram = is_diagram.tolist()
        else:  # mixed-size fallback: per-image scalar kernel
            verdicts = [
                classify_page_image(img, self.min_ruled_rows)
                for img in _imgs_from_batch(batch)
            ]
            is_table = [v[0] for v in verdicts]
            is_diagram = [v[1] for v in verdicts]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "is_table": pa.array(is_table),
                "is_diagram": pa.array(is_diagram),
            }
        )


class MediaSummarizer:
    """Deterministic table/diagram summarization stage (the reference's
    planned steps 4.3 + 5, main.py:14-19: per-media summaries written over
    the whited-out areas). The reference routes each table/diagram to a
    GPT summarizer; this engine's stand-in derives the summary text from
    DECODED PIXELS (the grid/blob classification kernels), so the stage
    consumes real image content, stays deterministic, and the SQL oracle
    can mirror it from the category rule. Summary shape:
    ``[<table|diagram|figure> @<off> <W>x<H>]``."""

    def __init__(self, min_ruled_rows: int = 3):
        # stands in for summarizer-model load (once per actor)
        self.min_ruled_rows = min_ruled_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "off": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        stack = _stack_from_batch(batch)
        if stack is not None:
            is_table, is_diagram = classify_page_stack(
                stack, self.min_ruled_rows
            )
        else:  # mixed-size fallback: per-image scalar kernel
            verdicts = [
                classify_page_image(img, self.min_ruled_rows)
                for img in _imgs_from_batch(batch)
            ]
            is_table = np.array([v[0] for v in verdicts], dtype=bool)
            is_diagram = np.array([v[1] for v in verdicts], dtype=bool)
        label = np.where(
            is_table, "table", np.where(is_diagram, "diagram", "figure")
        )
        off = batch["off"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = np.char.add(
            np.char.add(
                np.char.add(np.char.add("[", label), " @"),
                off.astype("U20"),
            ),
            np.char.add(
                np.char.add(np.char.add(" ", w.astype("U10")), "x"),
                np.char.add(h.astype("U10"), "]"),
            ),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "off": pa.array(off, type=pa.int64()),
                "text": pa.array(text.tolist(), type=pa.string()),
            }
        )


def render_word_regions_batch(batch: pa.Table) -> pa.Table:
    """Flat text spans -> word-region rows with synthetic crop images whose
    strike line is drawn iff the corpus rule says struck (F3). The CV kernel
    must recover that bit from pixels alone."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    off = batch["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
    i = token_index_from_offset(off)
    struck = struck_mask(doc, i)
    # page orientation: geometry drawn by the rule, the flag ROUTED
    # downstream comes from the geometry-based derivation (M8 closed loop;
    # per-batch-local like the reference's per-page analysis)
    rule_v, derived_v = rule_and_derived_vertical(doc.astype(np.int64), i)
    stack = synth_word_image_stack(doc.astype(np.int64), off, struck)
    n = len(doc)
    # vertical pages carry transposed crops (H x W swapped)
    flat_px = np.empty((n, WORD_H * WORD_W), dtype=np.uint8)
    flat_px[~rule_v] = stack[~rule_v].reshape(-1, WORD_H * WORD_W)
    if rule_v.any():
        flat_px[rule_v] = stack[rule_v].transpose(0, 2, 1).reshape(
            -1, WORD_H * WORD_W
        )
    # one contiguous buffer + offset vector -> zero-copy Arrow binary column.
    # binary32 offsets are int32: (n+1)*WORD_H*WORD_W must stay < 2^31 or
    # np.arange wraps negative and from_buffers (no validation) silently
    # corrupts the column. Fail loudly instead — callers control batch
    # granularity (actor-pool batch_size / block repartition) and stay
    # ~1000x under this at the documented sizes.
    if (n + 1) * WORD_H * WORD_W >= 2**31:
        raise ValueError(
            f"word-region batch of {n} rows overflows int32 binary offsets; "
            "reduce batch_size / block size"
        )
    values = pa.py_buffer(flat_px.tobytes())
    offsets = pa.array(
        np.arange(0, (n + 1) * WORD_H * WORD_W, WORD_H * WORD_W,
                  dtype=np.int32)
    )
    bytes_col = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], values]
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "offset": batch["offset"],
            "text": batch["text"],
            "bytes": bytes_col,
            "width": pa.array(
                np.where(rule_v, WORD_H, WORD_W).astype(np.int32),
                type=pa.int32(),
            ),
            "height": pa.array(
                np.where(rule_v, WORD_W, WORD_H).astype(np.int32),
                type=pa.int32(),
            ),
            "vertical": pa.array(derived_v),
            "struck_truth": pa.array(struck),
        }
    )


class StrikeCV:
    """Actor-pool CV strikethrough scorer (M10): per word-region image,
    blur -> Otsu inverse binary -> horizontal-line open -> geometric gates
    (exact constants from strikethrough_agent.py:96-127).

    Kernel branch (horizontal vs vertical text) follows the batch's
    per-row ``vertical`` column when present (the M8 orientation enricher,
    strikethrough_agent.py:168-171); else the actor-level default."""

    def __init__(self, vertical: bool = False):
        self.vertical = vertical

    def _verdicts(self, batch: pa.Table, vertical: bool) -> list:
        stack = _stack_from_batch(batch)
        if stack is not None:
            return cv_strike_verdict_stack(stack, vertical).tolist()
        return [  # mixed-size fallback: per-image scalar kernel
            cv_strike_verdict(img, vertical)
            for img in _imgs_from_batch(batch)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "vertical" in batch.column_names:
            # fill_null: a null flag must not leave its verdict
            # uninitialized (np.empty below is only written for rows
            # matching the False/True partition)
            import pyarrow.compute as pc

            flags = (
                pc.fill_null(batch["vertical"], False)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            verdicts = np.empty(len(batch), dtype=bool)
            for flag in (False, True):
                sel = np.flatnonzero(flags == flag)
                if len(sel):
                    sub = batch.take(pa.array(sel))
                    verdicts[sel] = self._verdicts(sub, bool(flag))
            verdicts = verdicts.tolist()
        else:
            verdicts = self._verdicts(batch, self.vertical)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "offset": batch["offset"],
                "struck_cv": pa.array(verdicts),
            }
        )


def redact_batch(batch: pa.Table) -> pa.Table:
    """White-out redaction (M14): fill each row's bbox list with white."""
    imgs = _imgs_from_batch(batch)
    boxes = batch["bboxes"].to_pylist()  # list<struct or list<float4>>
    out = []
    for img, bb in zip(imgs, boxes):
        norm = [
            (b["left"], b["top"], b["width"], b["height"])
            if isinstance(b, dict)
            else tuple(b)
            for b in (bb or [])
        ]
        out.append(whiteout(img, norm).tobytes())
    res = batch.drop_columns(["bytes"]).append_column(
        "bytes", pa.array(out, type=pa.binary())
    )
    return res


def augment_batch(batch: pa.Table) -> pa.Table:
    """Seeded scan-noise augmentation (M19) + quantizing compressor (M20)."""
    imgs = _imgs_from_batch(batch)
    docs = batch["doc_id"].to_pylist()
    out = [
        compress_quantize(augment_scan(img, int(d))).tobytes()
        for img, d in zip(imgs, docs)
    ]
    return batch.drop_columns(["bytes"]).append_column(
        "bytes", pa.array(out, type=pa.binary())
    )


def encode_base64_batch(batch: pa.Table) -> pa.Table:
    """Base64-encode media payloads (M2, table_detector_agent.py:121-123) —
    kept for sinks that need text-safe payloads; vectorized C via binascii."""
    import binascii

    enc = [
        binascii.b2a_base64(b, newline=False).decode("ascii")
        for b in batch["bytes"].to_pylist()
    ]
    return batch.append_column("b64", pa.array(enc, type=pa.string()))


def reassemble_doc_media(g) -> "pd.DataFrame":
    """Document reassembly sink (S7 full form): concatenate each doc's media
    payloads into a single ordered binary artifact plus a manifest — the
    engine's PDF-leaf analog (reference ``fake_scan.py:319-320`` and
    ``white_out_manager.py:40-45`` rebuild page images into documents).

    Runs inside a BUCKETED map_groups (doc_id >> 8, ~256 whole docs per
    group — per-doc dispatch costs ~0.6-3 ms each, BASELINE.md) and
    handles any number of documents per call: one lexsort by (doc, page
    index — the media_ref suffix, monotone in span offset), then per-doc
    segment joins. The manifest lists page refs in artifact order so a
    reader can slice pages back out (page size is uniform per doc here; a
    production manifest would carry per-page byte offsets)."""
    import pandas as pd

    doc = g["doc_id"].to_numpy().astype(np.int64)
    page = (
        g["media_ref"].str.rsplit("-", n=1).str[1].astype(int).to_numpy()
    )
    order = np.lexsort((page, doc))
    d = doc[order]
    refs = g["media_ref"].to_numpy(dtype=object)[order]
    byts = g["bytes"].to_numpy(dtype=object)[order]
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    ends = np.r_[starts[1:], len(d)]
    artifacts = [b"".join(byts[s:e]) for s, e in zip(starts, ends)]
    return pd.DataFrame(
        {
            "doc_id": d[starts],
            "n_pages": (ends - starts).astype(np.int64),
            "total_bytes": np.array(
                [len(a) for a in artifacts], dtype=np.int64
            ),
            "manifest": [
                "|".join(refs[s:e]) for s, e in zip(starts, ends)
            ],
            "artifact": artifacts,
        }
    )


def rle_size(img: np.ndarray) -> int:
    """Run-length byte size — the deterministic stand-in for JPEG size when
    reporting compression ratios (A7, fake_scan.py:256-264)."""
    flat = img.ravel()
    changes = np.count_nonzero(np.diff(flat)) + 1
    return int(changes * 2)


def compression_report_batch(batch: pa.Table) -> pa.Table:
    """Per-media size-reduction accounting for the augment+quantize path."""
    imgs = _imgs_from_batch(batch)
    docs = batch["doc_id"].to_pylist()
    raw = [rle_size(i) for i in imgs]
    comp = [
        rle_size(compress_quantize(augment_scan(i, int(d))))
        for i, d in zip(imgs, docs)
    ]
    return pa.table(
        {
            "media_ref": batch["media_ref"],
            "raw_size": pa.array(raw, type=pa.int64()),
            "compressed_size": pa.array(comp, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Video payloads. Deterministic synthetic "videos" (doc_id % VIDEO_MOD ==
# VIDEO_RESIDUE carries one, with 2 + doc_id % 5 frames of MEDIA_H x
# MEDIA_W grayscale), muxed as a REAL MJPEG-in-AVI container — every frame
# is a baseline JPEG through functions/jpeg.py and the RIFF/AVI wrapper is
# functions/avi.py, so the samplers below exercise an actual demux +
# entropy decode, the reference's rasterize/recompress front end as a video
# format (fake_scan.py:216-272). The samplers stay container-AWARE rather
# than container-only: a payload without the RIFF magic is treated as raw
# concatenated frames via (frame_size, n_frames) metadata — the opaque-
# binary multimodal column shape.
# ---------------------------------------------------------------------------
VIDEO_MOD = 11
VIDEO_RESIDUE = 3
FRAME_BYTES = MEDIA_H * MEDIA_W
VIDEO_JPEG_Q = 90  # frame quality: mean-luma fidelity >> cut threshold


def _mux_avi(frames_u8: list[np.ndarray]) -> bytes:
    """Grayscale frame stack -> MJPEG AVI bytes (one JPEG chunk each)."""
    stack = np.stack(frames_u8)
    jpgs = jpeg_encode_batch(stack, quality=VIDEO_JPEG_Q)
    return avi_encode(jpgs, width=stack.shape[2], height=stack.shape[1])


def synth_video_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> MJPEG-AVI payload rows for docs matching the rule."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.flatnonzero(doc % VIDEO_MOD == VIDEO_RESIDUE)
    refs, payloads, n_frames = [], [], []
    for d in doc[sel]:
        f = int(2 + d % 5)
        frames = [
            synth_media_image(f"v-{d}-{i}", "blank") for i in range(f)
        ]
        refs.append(f"v-{d}")
        payloads.append(_mux_avi(frames))
        n_frames.append(f)
    return pa.table(
        {
            "video_ref": pa.array(refs, type=pa.string()),
            "doc_id": pa.array(doc[sel], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_frames": pa.array(np.array(n_frames, dtype=np.int64)),
        }
    )


def sample_frames_batch(batch: pa.Table) -> pa.Table:
    """Task-map form of FrameSampler: the demux + frame decode is
    STATELESS (the JPEG peek-LUT cache is process-level), so a plain task
    pool gives full-width parallelism with no pool sizing; the class form
    below remains the actor-pool shape for deployments that hold real
    codec state."""
    return FrameSampler(stride=2)(batch)


def detect_shots_batch(batch: pa.Table) -> pa.Table:
    """Task-map form of ShotBoundaryDetector (same rationale as
    sample_frames_batch)."""
    return ShotBoundaryDetector()(batch)


class FrameSampler:
    """Actor-pool frame sampler. RIFF/AVI payloads take the REAL path:
    container demux (functions/avi.py) -> every `stride`-th JPEG frame ->
    batched entropy decode (jpeg_decode_batch), reporting the decoded
    pixel bytes. Non-container payloads are raw concatenated frames
    sliced by (frame_size, n_frames) metadata — the opaque-binary shape."""

    def __init__(self, stride: int = 2, frame_bytes: int = FRAME_BYTES):
        tune_malloc()
        self.stride = stride
        self.frame_bytes = frame_bytes

    def _sample_avi(self, buf: bytes, n: int) -> tuple[int, int]:
        jpgs, meta = avi_decode(buf)
        if meta["n_frames"] != n:
            raise ValueError(
                f"container frame count {meta['n_frames']} != metadata {n}"
            )
        picked = jpgs[:: self.stride]
        imgs = decode_external_batch(picked, "jpeg")
        return len(picked), sum(im.nbytes for im in imgs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        nf = batch["n_frames"].to_numpy(zero_copy_only=False)
        sampled, sampled_bytes = [], []
        for buf, n in zip(payloads, nf):
            if is_avi(buf):
                n_s, n_b = self._sample_avi(buf, int(n))
                sampled.append(n_s)
                sampled_bytes.append(n_b)
                continue
            if len(buf) != int(n) * self.frame_bytes:
                raise ValueError(
                    f"payload size {len(buf)} != {n} x {self.frame_bytes}"
                )
            picks = range(0, int(n), self.stride)
            out = b"".join(
                buf[i * self.frame_bytes:(i + 1) * self.frame_bytes]
                for i in picks
            )
            sampled.append(len(picks))  # range len is O(1)
            sampled_bytes.append(len(out))
        return pa.table(
            {
                "video_ref": batch["video_ref"],
                "doc_id": batch["doc_id"],
                "n_frames": batch["n_frames"],
                "n_sampled": pa.array(
                    np.array(sampled, dtype=np.int64)
                ),
                "sampled_bytes": pa.array(
                    np.array(sampled_bytes, dtype=np.int64)
                ),
            }
        )


# ---------------------------------------------------------------------------
# Deterministic synthetic "audio" (doc_id % AUDIO_MOD == AUDIO_RESIDUE gets
# a clip): unsigned 8-bit PCM at AUDIO_SR Hz, duration 1 + doc_id % 3
# seconds. First half is a square wave of amplitude 32 + (doc_id % 4) * 24
# (midline 128 +- amp must stay inside uint8, so amp <= 127)
# around the 128 midline (period 8 + doc_id % 5 samples), second half is
# silence — so framing / energy / voice-activity outputs are closed-form
# in doc_id and the SQL oracle can value-check the whole decode loop.
# ---------------------------------------------------------------------------
AUDIO_MOD = 7
AUDIO_RESIDUE = 2
AUDIO_SR = 1000
AUDIO_FRAME = 250  # samples per analysis frame (durations are multiples)


def synth_audio_clip(doc_id: int) -> bytes:
    n = AUDIO_SR * (1 + doc_id % 3)
    amp = 32 + (doc_id % 4) * 24
    period = 8 + doc_id % 5
    s = np.full(n, 128, dtype=np.int64)
    half = n // 2
    idx = np.arange(half)
    sign = np.where((idx // period) % 2 == 0, 1, -1)
    s[:half] = 128 + sign * amp
    return s.astype(np.uint8).tobytes()


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> PCM clip rows for docs matching the rule."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.flatnonzero(doc % AUDIO_MOD == AUDIO_RESIDUE)
    return pa.table(
        {
            "audio_ref": pa.array(
                [f"a-{d}" for d in doc[sel]], type=pa.string()
            ),
            "doc_id": pa.array(doc[sel], type=pa.int64()),
            "pcm": pa.array(
                [synth_audio_clip(int(d)) for d in doc[sel]],
                type=pa.binary(),
            ),
        }
    )


class AudioFeatures:
    """Actor-pool audio feature extractor: decode 8-bit PCM, frame it, and
    emit integer per-clip features (sample count, frame count, active-frame
    count via an energy gate, total absolute energy). A real deployment
    swaps the np.frombuffer decode for a codec; the framing / energy /
    gating plumbing — schema, batch size, actor signature — is what this
    stage exercises (multimodal columns are opaque binaries + metadata)."""

    def __init__(self, frame: int = AUDIO_FRAME, gate: int = 0):
        self.frame = frame
        self.gate = gate

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = {"n_samples": [], "n_frames": [], "n_active_frames": [],
                 "total_energy": []}
        for buf in batch["pcm"].to_pylist():
            s = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
            n = len(s)
            nf = n // self.frame
            dev = np.abs(s[: nf * self.frame] - 128).reshape(nf, self.frame)
            energy = dev.sum(axis=1)
            feats["n_samples"].append(n)
            feats["n_frames"].append(nf)
            feats["n_active_frames"].append(int((energy > self.gate).sum()))
            feats["total_energy"].append(int(energy.sum()))
        return pa.table(
            {
                "audio_ref": batch["audio_ref"],
                "doc_id": batch["doc_id"],
                **{
                    k: pa.array(np.array(v, dtype=np.int64))
                    for k, v in feats.items()
                },
            }
        )


# ---------------------------------------------------------------------------
# Shot-boundary detection: multi-scene synthetic videos (each scene a
# distinct base brightness + per-frame noise) and a detector that computes
# mean-abs-luma deltas between consecutive frames from the RAW BYTES and
# thresholds them. Scene cut positions are closed-form in doc_id, so the
# oracle value-checks the detector's output; the noise forces the detector
# to actually read the payload (a copied rule would not survive the
# byte-level pytest).
# ---------------------------------------------------------------------------
SCENE_BASE = (80, 150, 220)     # per-scene base luma, >2x the cut threshold
SCENE_CUT_THRESHOLD = 20        # mean-luma delta that counts as a cut


def scene_layout(doc_id: int) -> tuple[int, list[int]]:
    """(n_frames, cut positions) for a doc's synthetic video: 8-12 frames,
    first cut at 2 + doc_id % 3, second at 5 + doc_id % 2 (always after the
    first). Closed-form — mirrored by the SQL oracle."""
    n_frames = 8 + doc_id % 5
    return n_frames, [2 + doc_id % 3, 5 + doc_id % 2]


def synth_scene_video_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> multi-scene video payloads for the video-rule docs."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.flatnonzero(doc % VIDEO_MOD == VIDEO_RESIDUE)
    refs, payloads, n_frames_out = [], [], []
    for d in doc[sel]:
        n_frames, cuts = scene_layout(int(d))
        scene_of_frame = np.zeros(n_frames, dtype=np.int64)
        for c in cuts:
            scene_of_frame[c:] += 1
        rng = np.random.default_rng(int(d) ^ 0x5CE11E)
        frames = []
        for i in range(n_frames):
            base = SCENE_BASE[int(scene_of_frame[i])]
            img = np.full((MEDIA_H, MEDIA_W), base, dtype=np.int16)
            img += rng.integers(-6, 7, img.shape, dtype=np.int16)
            frames.append(img.clip(0, 255).astype(np.uint8))
        refs.append(f"sv-{d}")
        payloads.append(_mux_avi(frames))
        n_frames_out.append(n_frames)
    return pa.table(
        {
            "video_ref": pa.array(refs, type=pa.string()),
            "doc_id": pa.array(doc[sel], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_frames": pa.array(np.array(n_frames_out, dtype=np.int64)),
        }
    )


class ShotBoundaryDetector:
    """Actor-pool shot detector: per video, frame mean lumas, then
    |delta| > threshold marks a cut. RIFF/AVI payloads take the real
    demux + JPEG decode path (functions/avi.py + jpeg_decode_batch);
    raw payloads reshape by (frame_size, n_frames) metadata. Emits cut
    count and the first two cut positions (-1 when absent) — fixed-width
    columns, no list types."""

    def __init__(self, frame_bytes: int = FRAME_BYTES,
                 threshold: int = SCENE_CUT_THRESHOLD):
        tune_malloc()
        self.frame_bytes = frame_bytes
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        nf = batch["n_frames"].to_numpy(zero_copy_only=False)
        n_cuts, cut1, cut2 = [], [], []
        for buf, n in zip(payloads, nf):
            if is_avi(buf):
                jpgs, meta = avi_decode(buf)
                if meta["n_frames"] != int(n):
                    raise ValueError(
                        f"container frame count {meta['n_frames']} != "
                        f"metadata {int(n)}"
                    )
                imgs = decode_external_batch(jpgs, "jpeg")
                frames = np.stack([im.ravel() for im in imgs])
            else:
                frames = np.frombuffer(buf, dtype=np.uint8).reshape(
                    int(n), self.frame_bytes
                )
            means = frames.mean(axis=1)
            deltas = np.abs(np.diff(means))
            cuts = np.flatnonzero(deltas > self.threshold) + 1
            n_cuts.append(len(cuts))
            cut1.append(int(cuts[0]) if len(cuts) > 0 else -1)
            cut2.append(int(cuts[1]) if len(cuts) > 1 else -1)
        return pa.table(
            {
                "video_ref": batch["video_ref"],
                "doc_id": batch["doc_id"],
                "n_frames": batch["n_frames"],
                "n_cuts": pa.array(np.array(n_cuts, dtype=np.int64)),
                "cut1": pa.array(np.array(cut1, dtype=np.int64)),
                "cut2": pa.array(np.array(cut2, dtype=np.int64)),
            }
        )
