"""Real-codec / real-model integration seams (VERDICT r2 action 4).

The gates (have_pil / have_cv2 / have_torch) activate library-backed paths
automatically when the libraries exist; in this container they do not, so
the tests pin BOTH behaviors: the stand-ins keep working with the gates
closed, and skipif-gated tests exercise the real paths wherever the libs
are installed."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_machine_ray.functions.images import (
    decode_external,
    have_cv2,
    have_pil,
)
from ocr_machine_ray.functions.png import png_encode
from ocr_machine_ray.stages.scorer import ModelScorer, have_torch


class TestGatesClosed:
    def test_png_real_codec_independent_of_gates(self):
        img = (np.arange(64 * 48) % 251).astype(np.uint8).reshape(48, 64)
        assert np.array_equal(decode_external(png_encode(img), "png"), img)

    def test_jpeg_fake_and_raise_without_libs(self):
        if have_pil() or have_cv2():
            pytest.skip("imaging library present: real path active")
        a = decode_external(b"\xff\xd8mock", "jpeg", fake=True)
        b = decode_external(b"\xff\xd8mock", "jpeg", fake=True)
        assert np.array_equal(a, b)  # payload-hash-deterministic
        with pytest.raises(NotImplementedError):
            decode_external(b"\xff\xd8mock", "jpeg")

    def test_scorer_standin_without_torch(self):
        s = ModelScorer()
        assert s.torch_model is None
        stack = np.full((2, 64, 365), 1.0, dtype=np.float32)
        stack[0, 28:36, :] = -1.0  # dark center band = strike
        probs = s._score(stack)
        assert probs[0] >= 0.5 > probs[1]

    def test_scorer_ignores_ckpt_env_without_torch(self, monkeypatch):
        if have_torch():
            pytest.skip("torch present")
        monkeypatch.setenv("GRAFT_TORCH_CKPT", "/nonexistent.pt")
        assert ModelScorer().torch_model is None  # gate short-circuits


@pytest.mark.skipif(not have_pil(), reason="PIL not installed")
class TestPilSeam:
    def test_jpeg_roundtrip_through_decode_external(self, tmp_path):
        import io

        import PIL.Image

        img = (np.arange(64 * 48) % 251).astype(np.uint8).reshape(48, 64)
        buf = io.BytesIO()
        PIL.Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=95)
        got = decode_external(buf.getvalue(), "jpeg")
        assert got.shape == img.shape
        assert np.abs(got.astype(int) - img.astype(int)).mean() < 8


@pytest.mark.skipif(not have_torch(), reason="torch not installed")
class TestTorchSeam:
    def test_torchscript_checkpoint_drives_scorer(self, tmp_path):
        import torch

        class Head(torch.nn.Module):
            def forward(self, x):  # (n,1,H,W) -> (n,)
                dark = (x < -0.5).float().mean(dim=3).squeeze(1)  # (n,H)
                peak = dark[:, 19:44].max(dim=1).values
                return torch.sigmoid((peak - 0.45) * 20.0)

        path = str(tmp_path / "head.pt")
        torch.jit.script(Head()).save(path)
        s = ModelScorer(ckpt_path=path)
        assert s.torch_model is not None
        stack = np.full((2, 64, 365), 1.0, dtype=np.float32)
        stack[0, 28:36, :] = -1.0
        probs = s._score(stack)
        assert probs[0] >= 0.5 > probs[1]
