"""Model-based strikethrough scorer (M11) + image normalizer (M12).

The reference scores word crops with a MobileNetV3-small checkpoint loaded
once and a fixed 64x365 single-channel transform
(model_training_pipeline.py:18-45, model_inference_test.py:71-100).
PyTorch is absent from this container, so the MODEL is a deterministic
linear scorer over pooled image features (clearly a stand-in), while all the
Ray-side structure is real and tested: weights loaded once per actor in
``__init__``, batched inference over a stacked float32 tensor, sigmoid +
0.5 threshold, and the exact tile-then-crop normalization geometry.

On the synthetic corpus the stand-in is ORACLE-EXACT, not approximate: its
dark-pixel threshold (raw < 64 after Normalize(0.5, 0.5)) selects exactly
the strike-line pixels (drawn at 30) and never text strokes (70) or
background (>= 230), so verdict == strike rule bit-for-bit — the
``strike_model_verdicts`` query value-checks this against SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NORM_H, NORM_W = 64, 365  # reference transform target (64x365)


def normalize_region(img: np.ndarray) -> np.ndarray:
    """StrikethroughTransform: grayscale -> resize to h=64 preserving aspect
    -> if wider than 365 squeeze to 365, if narrower tile horizontally then
    crop (model_training_pipeline.py:29-43). Nearest-neighbor resize keeps
    this numpy-only and deterministic."""
    h, w = img.shape
    new_w = max(1, round(w * NORM_H / h))
    # nearest-neighbor resample to (NORM_H, new_w)
    ys = (np.arange(NORM_H) * h / NORM_H).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(new_w) * w / new_w).astype(np.int64).clip(0, w - 1)
    r = img[ys][:, xs]
    if new_w > NORM_W:
        xs2 = (np.arange(NORM_W) * new_w / NORM_W).astype(np.int64)
        r = r[:, xs2]
    elif new_w < NORM_W:
        reps = int(np.ceil(NORM_W / new_w))
        r = np.tile(r, (1, reps))[:, :NORM_W]
    out = r.astype(np.float32) / 255.0
    return (out - 0.5) / 0.5  # Normalize(0.5, 0.5)


def normalize_stack(raw: np.ndarray) -> np.ndarray:
    """Vectorized normalize_region over a uniform-size (n, h, w) stack —
    identical output to the per-image path, one fancy-index per batch."""
    n, h, w = raw.shape
    new_w = max(1, round(w * NORM_H / h))
    ys = (np.arange(NORM_H) * h / NORM_H).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(new_w) * w / new_w).astype(np.int64).clip(0, w - 1)
    r = raw[:, ys][:, :, xs]
    if new_w > NORM_W:
        xs2 = (np.arange(NORM_W) * new_w / NORM_W).astype(np.int64)
        r = r[:, :, xs2]
    elif new_w < NORM_W:
        reps = int(np.ceil(NORM_W / new_w))
        r = np.tile(r, (1, 1, reps))[:, :, :NORM_W]
    out = r.astype(np.float32) / 255.0
    return (out - 0.5) / 0.5


def _make_weights(seed: int = 42) -> dict[str, np.ndarray]:
    """Deterministic stand-in checkpoint: a row-pooling linear head that
    fires on a dark horizontal band in the center rows — the same signal the
    real model learns. Swap with a torch load in production (the seed then
    selects the checkpoint variant; the stand-in weights are seed-free)."""
    w_rows = np.zeros(NORM_H, dtype=np.float32)
    lo, hi = int(NORM_H * 0.3), int(NORM_H * 0.7)
    w_rows[lo:hi] = 1.0
    return {"w_rows": w_rows, "bias": np.float32(-0.25)}


def have_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


class ModelScorer:
    """Actor-pool scorer: checkpoint 'loaded' once per actor; batches are
    normalized, stacked, and scored in one vectorized pass; verdict =
    sigmoid(score) >= 0.5 (model_inference_test.py:100).

    Real-model seam: pass ckpt_path (or set $GRAFT_TORCH_CKPT) to load a
    TorchScript checkpoint when torch is installed — the module's forward
    takes the (n, 1, H, W) normalized float32 stack and returns per-image
    probabilities, the same contract as the reference's MobileNetV3 head
    (model_inference_test.py:71-100). Torch is absent from this container,
    so the deterministic linear stand-in remains the default; the gate +
    load run once per ACTOR (__init__), never per batch."""

    def __init__(
        self,
        threshold: float = 0.5,
        seed: int = 42,
        ckpt_path: str | None = None,
    ):
        import os

        self.weights = _make_weights(seed)
        self.threshold = threshold
        self.torch_model = None
        ckpt = ckpt_path or os.environ.get("GRAFT_TORCH_CKPT")
        if ckpt and have_torch():
            import torch

            self.torch_model = torch.jit.load(ckpt, map_location="cpu")
            self.torch_model.eval()

    def _score(self, stack: np.ndarray) -> np.ndarray:
        if self.torch_model is not None:
            import torch

            with torch.no_grad():
                t = torch.from_numpy(
                    stack[:, None, :, :].astype(np.float32)
                )
                return (
                    self.torch_model(t).reshape(-1).cpu().numpy()
                    .astype(np.float64)
                )
        return self._score_standin(stack)

    def _score_standin(self, stack: np.ndarray) -> np.ndarray:
        # stack: (n, H, W) normalized [-1, 1]. Feature: per-row fraction of
        # strongly dark pixels — a strike line is a WIDE dark run in the
        # center band, text strokes are sparse; max over weighted rows.
        dark_frac = (stack < -0.5).mean(axis=2)  # (n, H)
        center = dark_frac * self.weights["w_rows"][None, :]
        peak = center.max(axis=1)
        logits = (peak - 0.45) * 20.0
        return 1.0 / (1.0 + np.exp(-logits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        # orientation-aware deskew: vertical pages carry transposed crops
        # (M8); rotate them back before the fixed 64x365 transform, the way
        # the reference consumes PageOrientationBasedOnWords before its
        # strike analysis (strikethrough_agent.py:168-171)
        if "vertical" in batch.column_names:
            verts = batch["vertical"].to_pylist()
        else:
            verts = [False] * len(bufs)
        # per-image loop measured FASTER than a 3D batched resample here
        # (the tile-to-365 step makes large float32 temporaries per batch)
        stack = np.stack(
            [
                normalize_region(
                    np.frombuffer(b, dtype=np.uint8).reshape(h, w).T
                    if v
                    else np.frombuffer(b, dtype=np.uint8).reshape(h, w)
                )
                for b, w, h, v in zip(bufs, ws, hs, verts)
            ]
        )
        probs = self._score(stack)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "offset": batch["offset"],
                "score": pa.array(probs.astype(np.float32)),
                "struck_model": pa.array(probs >= self.threshold),
            }
        )
