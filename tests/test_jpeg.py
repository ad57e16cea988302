"""Baseline JPEG codec (functions/jpeg.py): spec-level checks, lossy
roundtrips through our own encoder, and an independent-decode conformance
check on the reference repo's committed scanner-produced JPEG
(`source/Table23-0471_residential_code.jpg` — baseline grayscale SOF0,
3300x2550, encoded by a real scanner pipeline, not by this codec)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_machine_ray.functions.jpeg import (
    _canonical_codes,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _DCT8,
    JpegError,
    jpeg_decode,
    jpeg_encode,
)

REF_JPG = "/root/reference/source/Table23-0471_residential_code.jpg"


def _rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2)))


def _test_image(h=96, w=80) -> np.ndarray:
    rng = np.random.default_rng(0)
    grad = np.linspace(0, 255, h * w).reshape(h, w)
    return (grad + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)


class TestSpecLevel:
    def test_dct_matrix_orthonormal(self):
        assert np.allclose(_DCT8 @ _DCT8.T, np.eye(8), atol=1e-12)

    def test_canonical_dc_luma_codes(self):
        # T.81 Annex K.3.1: DC luma category 0 gets the 2-bit code 00,
        # categories 1-5 the 3-bit codes 010..110, category 6 '1110', etc.
        codes = {
            sym: (code, ln)
            for code, ln, sym in _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
        }
        assert codes[0] == (0b00, 2)
        assert codes[1] == (0b010, 3)
        assert codes[5] == (0b110, 3)
        assert codes[6] == (0b1110, 4)
        assert codes[11] == (0b111111110, 9)

    def test_rejects_non_jpeg(self):
        with pytest.raises(JpegError):
            jpeg_decode(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_rejects_progressive(self):
        # take a valid stream and rewrite its SOF0 marker to SOF2
        enc = bytearray(jpeg_encode(_test_image(16, 16)))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC2
        with pytest.raises(JpegError, match="progressive"):
            jpeg_decode(bytes(enc))


class TestRoundtrip:
    def test_gray_q100_near_lossless(self):
        img = _test_image()
        assert _rmse(jpeg_decode(jpeg_encode(img, quality=100)), img) < 1.0

    def test_gray_quality_ladder(self):
        img = _test_image()
        prev_size = None
        for q in (90, 70, 40):
            enc = jpeg_encode(img, quality=q)
            dec = jpeg_decode(enc)
            assert dec.shape == img.shape
            assert _rmse(dec, img) < 20.0
            if prev_size is not None:
                assert len(enc) < prev_size  # lower quality -> smaller file
            prev_size = len(enc)

    def test_rgb_444_and_420(self):
        g = _test_image()
        rgb = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=-1)
        for sub in ("444", "420"):
            dec = jpeg_decode(jpeg_encode(rgb, quality=90, subsampling=sub))
            assert dec.shape == rgb.shape
            assert _rmse(dec, rgb) < 15.0, sub

    def test_restart_markers_do_not_change_pixels(self):
        img = _test_image()
        plain = jpeg_decode(jpeg_encode(img, quality=80))
        rst = jpeg_decode(jpeg_encode(img, quality=80, restart_interval=5))
        # restarts change only the entropy segmentation, not the
        # quantized coefficients: decoded pixels must be IDENTICAL
        assert np.array_equal(plain, rst)

    def test_non_multiple_of_8_sizes(self):
        img = _test_image(93, 77)
        dec = jpeg_decode(jpeg_encode(img, quality=90))
        assert dec.shape == (93, 77)
        rgb = np.stack([img] * 3, axis=-1)
        dec = jpeg_decode(jpeg_encode(rgb, quality=90, subsampling="420"))
        assert dec.shape == (93, 77, 3)

    def test_flat_image_compresses_tiny(self):
        img = np.full((64, 64), 130, dtype=np.uint8)
        enc = jpeg_encode(img, quality=85)
        assert len(enc) < 1200
        assert _rmse(jpeg_decode(enc), img) < 1.0


class TestReferenceScanConformance:
    """Independent decode: the input was produced by a real scanner/libjpeg
    pipeline, so a clean structured decode of all ~131k blocks with
    document-plausible statistics is evidence against systematic codec
    errors (a huffman/DC-prediction bug corrupts everything downstream)."""

    def test_decodes_with_header_dimensions(self):
        data = open(REF_JPG, "rb").read()
        out = jpeg_decode(data)
        assert out.shape == (2550, 3300)  # from the SOF0 header
        assert out.dtype == np.uint8

    def test_scanned_page_statistics(self):
        out = jpeg_decode(open(REF_JPG, "rb").read())
        # a scanned building-code table: white paper, dark ink
        assert 200 < out.mean() < 255
        assert out.std() > 20
        # page borders are margins: much brighter than the page average
        border = np.concatenate(
            [out[:40].ravel(), out[-40:].ravel(), out[:, :40].ravel()]
        )
        assert border.mean() > out.mean()
        # both ink and paper present
        assert (out < 100).mean() > 0.01
        assert (out > 200).mean() > 0.5

    def test_decode_deterministic(self):
        data = open(REF_JPG, "rb").read()
        a = jpeg_decode(data)
        b = jpeg_decode(data)
        assert np.array_equal(a, b)


class TestDecodeExternalRouting:
    def test_jpeg_codec_routes_to_pure_decoder(self):
        from ocr_machine_ray.functions.images import decode_external

        img = _test_image(32, 48)
        out = decode_external(jpeg_encode(img, quality=95), "jpeg")
        assert out.shape == (32, 48)
        assert _rmse(out, img) < 8.0

    def test_rgb_jpeg_returns_luma(self):
        from ocr_machine_ray.functions.images import decode_external

        rgb = np.zeros((16, 16, 3), dtype=np.uint8)
        rgb[..., 0] = 200  # pure red
        out = decode_external(jpeg_encode(rgb, quality=95), "jpg")
        assert out.ndim == 2
        # BT.601 luma of (200, 0, 0) is ~60
        assert abs(float(out.mean()) - 60) < 8


def test_encode_batch_identical_to_single():
    import numpy as np

    from ocr_machine_ray.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_batch,
    )

    rng = np.random.default_rng(42)
    # mix of flat, structured, and noise pages; odd size exercises padding
    stack = rng.integers(0, 256, (7, 57, 83), dtype=np.uint8)
    stack[0] = 128
    stack[1, ::4, :] = 0
    batch = jpeg_encode_batch(stack, quality=85)
    assert len(batch) == 7
    for i in range(7):
        assert batch[i] == jpeg_encode(stack[i], quality=85)
        assert np.array_equal(jpeg_decode(batch[i]), jpeg_decode(jpeg_encode(stack[i], 85)))
    assert jpeg_encode_batch(np.zeros((0, 8, 8), dtype=np.uint8)) == []


def test_decode_batch_identical_to_single():
    from ocr_machine_ray.functions.jpeg import (
        jpeg_decode,
        jpeg_decode_batch,
        jpeg_encode,
    )

    rng = np.random.default_rng(7)
    # mixed sizes AND mixed quality (different quant tables -> multiple
    # stack groups), plus an RGB payload taking the scalar tail
    payloads = [
        jpeg_encode(rng.integers(0, 256, (41, 67), dtype=np.uint8), 85),
        jpeg_encode(rng.integers(0, 256, (41, 67), dtype=np.uint8), 85),
        jpeg_encode(rng.integers(0, 256, (64, 96), dtype=np.uint8), 85),
        jpeg_encode(rng.integers(0, 256, (16, 16), dtype=np.uint8), 40),
        jpeg_encode(
            rng.integers(0, 256, (24, 24, 3), dtype=np.uint8),
            90,
            subsampling="420",
        ),
    ]
    got = jpeg_decode_batch(payloads)
    assert len(got) == len(payloads)
    for g, p in zip(got, payloads):
        assert np.array_equal(g, jpeg_decode(p))
    assert jpeg_decode_batch([]) == []


def test_decode_batch_reference_scan():
    import os

    if not os.path.exists(REF_JPG):
        pytest.skip("reference scan not present")
    with open(REF_JPG, "rb") as f:
        payload = f.read()
    single = jpeg_decode(payload)
    (batched,) = __import__(
        "ocr_machine_ray.functions.jpeg", fromlist=["jpeg_decode_batch"]
    ).jpeg_decode_batch([payload])
    assert np.array_equal(batched, single)


class TestMalformedRaisesJpegError:
    """decode_external's PIL/cv2/fake fall-through relies on EVERY parse
    failure surfacing as JpegError — not StopIteration/KeyError/IndexError
    from the marker walk or the entropy decoder (ADVICE r3)."""

    def _valid(self) -> bytearray:
        return bytearray(jpeg_encode(_test_image(16, 16)))

    def test_sos_undeclared_component(self):
        enc = self._valid()
        i = enc.find(b"\xff\xda")
        enc[i + 5] = 99  # component id in SOS no SOF0 declared
        with pytest.raises(JpegError, match="undeclared component"):
            jpeg_decode(bytes(enc))

    def test_missing_dht(self):
        enc = self._valid()
        i = enc.find(b"\xff\xc4")
        ln = int.from_bytes(enc[i + 2 : i + 4], "big")
        del enc[i : i + 2 + ln]  # excise the (only) DHT segment
        with pytest.raises(JpegError, match="missing DHT"):
            jpeg_decode(bytes(enc))

    def test_missing_dqt(self):
        enc = self._valid()
        i = enc.find(b"\xff\xdb")
        ln = int.from_bytes(enc[i + 2 : i + 4], "big")
        del enc[i : i + 2 + ln]
        with pytest.raises(JpegError, match="missing DQT"):
            jpeg_decode(bytes(enc))

    def test_truncated_stream(self):
        enc = bytes(self._valid())
        with pytest.raises(JpegError):
            jpeg_decode(enc[: len(enc) // 2])

    def test_garbage_after_soi(self):
        with pytest.raises(JpegError):
            jpeg_decode(b"\xff\xd8" + bytes(range(256)) * 4)

    def test_batch_malformed_falls_back_scalar(self):
        # decode_external_batch must not die on one bad payload: the whole
        # batch falls to the scalar path, where the bad one gets the fake
        from ocr_machine_ray.functions.images import (
            decode_external,
            decode_external_batch,
        )

        good = bytes(self._valid())
        bad = good[:40]
        out = decode_external_batch([good, bad], "jpeg", fake=True)
        assert np.array_equal(out[0], decode_external(good, "jpeg"))
        assert np.array_equal(
            out[1], decode_external(bad, "jpeg", fake=True)
        )


def test_decode_external_batch_matches_scalar():
    from ocr_machine_ray.functions.images import (
        decode_external,
        decode_external_batch,
    )

    rng = np.random.default_rng(3)
    pays = [
        jpeg_encode(rng.integers(0, 256, (32, 48), dtype=np.uint8), 85)
        for _ in range(4)
    ] + [
        jpeg_encode(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), 85
        )
    ]
    got = decode_external_batch(pays, "jpeg")
    for g, p in zip(got, pays):
        assert np.array_equal(g, decode_external(p, "jpeg"))
