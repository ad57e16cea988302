"""MJPEG-in-AVI container codec (functions/avi.py) + the real video demux
path through FrameSampler / ShotBoundaryDetector / decode_external."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocr_machine_ray.functions.avi import (
    AviError,
    avi_decode,
    avi_encode,
    is_avi,
)
from ocr_machine_ray.functions.jpeg import jpeg_decode, jpeg_encode


def _frames(n=4, h=24, w=32, q=90):
    rng = np.random.default_rng(5)
    imgs = [
        (np.full((h, w), 40 * (i + 1), dtype=np.int16)
         + rng.integers(-5, 6, (h, w), dtype=np.int16))
        .clip(0, 255).astype(np.uint8)
        for i in range(n)
    ]
    return imgs, [jpeg_encode(im, quality=q) for im in imgs]


class TestContainer:
    def test_roundtrip_byte_identical(self):
        imgs, jpgs = _frames(5)
        payload = avi_encode(jpgs, width=32, height=24, fps=12)
        assert is_avi(payload)
        out, meta = avi_decode(payload)
        assert out == jpgs  # frame payloads byte-identical through the mux
        assert meta["width"] == 32 and meta["height"] == 24
        assert meta["n_frames"] == 5
        assert meta["fps"] == 12
        assert meta["handler"] == "MJPG"

    def test_frames_decode_back_to_images(self):
        imgs, jpgs = _frames(3)
        out, _ = avi_decode(avi_encode(jpgs, 32, 24))
        for jpg, img in zip(out, imgs):
            dec = jpeg_decode(jpg)
            assert dec.shape == img.shape
            # q90 roundtrip: mean luma within a gray level
            assert abs(float(dec.mean()) - float(img.mean())) < 1.5

    def test_odd_sized_frame_chunks_word_aligned(self):
        # frame payloads of odd byte length force RIFF pad bytes; the
        # walker must still recover every frame byte-exactly
        jpgs = [b"\xff\xd8" + bytes(range(7)), b"\xff\xd8" + bytes(10)]
        payload = avi_encode(jpgs, 8, 8)
        out, meta = avi_decode(payload)
        assert out == jpgs
        assert meta["n_frames"] == 2

    def test_riff_sizes_consistent(self):
        _, jpgs = _frames(2)
        payload = avi_encode(jpgs, 32, 24)
        import struct

        (riff_size,) = struct.unpack_from("<I", payload, 4)
        assert 8 + riff_size == len(payload)


class TestMalformed:
    def test_not_riff(self):
        with pytest.raises(AviError):
            avi_decode(b"\x00" * 64)

    def test_wrong_form(self):
        # a WAV is RIFF but not AVI
        from ocr_machine_ray.functions.wav import wav_encode

        wav = wav_encode(np.zeros(64, dtype=np.int16), 8000)
        with pytest.raises(AviError, match="not an AVI"):
            avi_decode(wav)
        assert not is_avi(wav)

    def test_truncated(self):
        _, jpgs = _frames(3)
        payload = avi_encode(jpgs, 32, 24)
        with pytest.raises(AviError):
            avi_decode(payload[: len(payload) // 2])

    def test_header_count_mismatch(self):
        _, jpgs = _frames(3)
        payload = bytearray(avi_encode(jpgs, 32, 24))
        i = payload.find(b"avih")
        # dwTotalFrames is the 5th dword of the avih payload
        payload[i + 8 + 16 : i + 8 + 20] = (99).to_bytes(4, "little")
        with pytest.raises(AviError, match="frame count"):
            avi_decode(bytes(payload))

    def test_empty_encode_rejected(self):
        with pytest.raises(AviError):
            avi_encode([], 8, 8)


class TestEngineRoute:
    def test_decode_external_first_frame(self):
        from ocr_machine_ray.functions.images import decode_external

        imgs, jpgs = _frames(3)
        payload = avi_encode(jpgs, 32, 24)
        out = decode_external(payload, "video")
        assert np.array_equal(out, jpeg_decode(jpgs[0]))

    def test_decode_external_malformed_video_still_stubs(self):
        from ocr_machine_ray.functions.images import decode_external

        with pytest.raises(NotImplementedError):
            decode_external(b"\x00\x01\x02\x03" * 8, "mp4")

    def test_frame_sampler_demuxes_real_avi(self):
        from ocr_machine_ray.stages.media import (
            FRAME_BYTES,
            MEDIA_H,
            MEDIA_W,
            FrameSampler,
        )

        rng = np.random.default_rng(9)
        frames = [
            rng.integers(0, 256, (MEDIA_H, MEDIA_W), dtype=np.uint8)
            for _ in range(5)
        ]
        jpgs = [jpeg_encode(f, quality=90) for f in frames]
        batch = pa.table(
            {
                "video_ref": pa.array(["v-3"], type=pa.string()),
                "doc_id": pa.array([3], type=pa.int64()),
                "payload": pa.array(
                    [avi_encode(jpgs, MEDIA_W, MEDIA_H)], type=pa.binary()
                ),
                "n_frames": pa.array([5], type=pa.int64()),
            }
        )
        out = FrameSampler(stride=2)(batch)
        assert out["n_sampled"].to_pylist() == [3]  # frames 0, 2, 4
        assert out["sampled_bytes"].to_pylist() == [3 * FRAME_BYTES]

    def test_frame_sampler_rejects_metadata_mismatch(self):
        from ocr_machine_ray.stages.media import FrameSampler

        _, jpgs = _frames(3)
        batch = pa.table(
            {
                "video_ref": pa.array(["v-1"], type=pa.string()),
                "doc_id": pa.array([1], type=pa.int64()),
                "payload": pa.array(
                    [avi_encode(jpgs, 32, 24)], type=pa.binary()
                ),
                "n_frames": pa.array([7], type=pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="container frame count"):
            FrameSampler()(batch)

    def test_shot_detector_recovers_cuts_from_avi(self):
        from ocr_machine_ray.stages.media import (
            ShotBoundaryDetector,
            synth_scene_video_batch,
        )

        ids = np.arange(0, 200, dtype=np.int64)
        batch = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
        vids = synth_scene_video_batch(batch)
        assert all(is_avi(p) for p in vids["payload"].to_pylist())
        out = ShotBoundaryDetector()(vids).to_pandas()
        d = out["doc_id"].to_numpy()
        assert (out["n_cuts"] == 2).all()
        assert (out["cut1"].to_numpy() == 2 + d % 3).all()
        assert (out["cut2"].to_numpy() == 5 + d % 2).all()

    def test_synth_video_is_real_avi(self):
        from ocr_machine_ray.stages.media import synth_video_batch

        batch = pa.table(
            {
                "doc_id": pa.array([3, 14], type=pa.int64()),
                "text": pa.array(["a", "b"]),
            }
        )
        out = synth_video_batch(batch)
        for p, n in zip(
            out["payload"].to_pylist(), out["n_frames"].to_pylist()
        ):
            frames, meta = avi_decode(p)
            assert meta["n_frames"] == n == len(frames)
            for f in frames:
                assert f[:2] == b"\xff\xd8"  # every chunk a real JPEG
