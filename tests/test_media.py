"""Media pipeline tests: synthesis -> classification / CV strike closure,
redaction, augmentation determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_machine_ray.functions import images
from ocr_machine_ray.stages import media as media_stages


class TestSynthAndClassify:
    def test_grid_classified_as_table(self):
        for ref in ["m-1-1", "m-2-3", "m-99-7"]:
            img = images.synth_media_image(ref, "grid")
            is_table, is_diagram = images.classify_page_image(img)
            assert is_table and not is_diagram

    def test_blob_classified_as_diagram(self):
        for ref in ["m-1-1", "m-42-2", "m-7-1"]:
            img = images.synth_media_image(ref, "blob")
            is_table, is_diagram = images.classify_page_image(img)
            assert is_diagram and not is_table

    def test_blank_classified_as_neither(self):
        for ref in ["m-3-1", "m-8-2"]:
            img = images.synth_media_image(ref, "blank")
            assert images.classify_page_image(img) == (False, False)

    def test_synthesis_deterministic(self):
        a = images.synth_media_image("m-5-1", "grid")
        b = images.synth_media_image("m-5-1", "grid")
        assert (a == b).all()


class TestStrikeCV:
    def test_kernel_recovers_truth_exhaustively(self):
        """closed loop: image drawn from the rule -> kernel must recover it."""
        ok = 0
        n = 0
        for doc_id in range(40):
            for off in range(0, 30, 3):
                for struck in (False, True):
                    img = images.synth_word_image(doc_id, off, struck)
                    got = images.cv_strike_verdict(img)
                    assert got == struck, (doc_id, off, struck)
                    ok += 1
                    n += 1
        assert n == ok == 800

    def test_vertical_path_transposes(self):
        img = images.synth_word_image(1, 1, True)
        assert images.cv_strike_verdict(img.T, orientation_vertical=True)


class TestRedaction:
    def test_whiteout_fills_box(self):
        img = images.synth_media_image("m-1-1", "grid")
        out = images.whiteout(img, [(0.25, 0.25, 0.5, 0.5)])
        h, w = img.shape
        assert (out[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] == 255).all()
        # outside the box untouched
        assert (out[0, :] == img[0, :]).all()

    def test_bbox_roundtrip(self):
        px = images.bbox_norm_to_pixel((0.1, 0.2, 0.5, 0.25), 200, 100)
        assert px == (20, 20, 100, 25)
        norm = images.bbox_pixel_to_norm(px, 200, 100)
        assert np.allclose(norm, (0.1, 0.2, 0.5, 0.25))


class TestAugment:
    def test_deterministic_per_doc(self):
        img = images.synth_media_image("m-1-1", "blank")
        a = images.augment_scan(img, 7)
        b = images.augment_scan(img, 7)
        c = images.augment_scan(img, 8)
        assert (a == b).all()
        assert (a != c).any()

    def test_quantizer_reduces_levels(self):
        img = images.synth_media_image("m-1-1", "blank")
        q = images.compress_quantize(img, levels=16)
        assert len(np.unique(q)) <= 16


class TestDecodeStub:
    def test_raises_without_fake(self):
        import pytest

        with pytest.raises(NotImplementedError):
            images.decode_external(b"payload", "jpeg")

    def test_fake_is_deterministic(self):
        a = images.decode_external(b"payload", "jpeg", fake=True)
        b = images.decode_external(b"payload", "jpeg", fake=True)
        assert (a == b).all()


class TestStageBatchForms:
    def _media_batch(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "media_ref": pa.array(["m-1-1", "m-2-1"]),
                "category": pa.array(["tables", "diagrams"]),
            }
        )

    def test_synth_media_batch_schema(self):
        out = media_stages.synth_media_batch(self._media_batch())
        assert out.column_names == [
            "media_ref", "doc_id", "bytes", "width", "height", "pattern",
        ]
        assert out["pattern"].to_pylist() == ["grid", "blob"]

    def test_classifier_stage(self):
        rows = media_stages.synth_media_batch(self._media_batch())
        clf = media_stages.PageClassifier()
        out = clf(rows)
        assert out["is_table"].to_pylist() == [True, False]
        assert out["is_diagram"].to_pylist() == [False, True]

    def test_redact_batch(self):
        rows = media_stages.synth_media_batch(self._media_batch())
        rows = rows.append_column(
            "bboxes",
            pa.array(
                [
                    [{"left": 0.0, "top": 0.0, "width": 1.0, "height": 1.0}],
                    [],
                ]
            ),
        )
        out = media_stages.redact_batch(rows)
        img0 = np.frombuffer(out["bytes"][0].as_py(), dtype=np.uint8)
        assert (img0 == 255).all()


class TestBase64AndCompression:
    def test_base64_roundtrip(self):
        import base64

        rows = media_stages.synth_media_batch(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "media_ref": pa.array(["m-1-1"]),
                    "category": pa.array(["tables"]),
                }
            )
        )
        out = media_stages.encode_base64_batch(rows)
        decoded = base64.b64decode(out["b64"][0].as_py())
        assert decoded == rows["bytes"][0].as_py()

    def test_compression_reduces_rle_size(self):
        rows = media_stages.synth_media_batch(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "media_ref": pa.array(["m-1-1", "m-2-1"]),
                    "category": pa.array(["other", "diagrams"]),
                }
            )
        )
        rep = media_stages.compression_report_batch(rows)
        raw = rep["raw_size"].to_pylist()
        comp = rep["compressed_size"].to_pylist()
        # quantization collapses the noise background -> fewer runs
        assert all(c < r for c, r in zip(comp, raw))

    def test_augment_pipeline_batch(self):
        rows = media_stages.synth_media_batch(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "media_ref": pa.array(["m-1-1"]),
                    "category": pa.array(["other"]),
                }
            )
        )
        out = media_stages.augment_batch(rows)
        img = np.frombuffer(out["bytes"][0].as_py(), dtype=np.uint8)
        assert len(np.unique(img)) <= 16  # quantized


class TestDocArtifacts:
    def test_artifact_byte_order(self):
        import pandas as pd
        from ocr_machine_ray.stages.media import reassemble_doc_media

        pages = {
            "doc_id": [7, 7, 7],
            "media_ref": ["m-7-3", "m-7-1", "m-7-2"],
            "bytes": [b"CC", b"AA", b"BB"],
            "offset": [32, 10, 21],
        }
        out = reassemble_doc_media(pd.DataFrame(pages))
        assert out["artifact"].iloc[0] == b"AABBCC"
        assert out["manifest"].iloc[0] == "m-7-1|m-7-2|m-7-3"
        assert out["n_pages"].iloc[0] == 3
        assert out["total_bytes"].iloc[0] == 6

    def test_page_index_sorts_numerically(self):
        import pandas as pd
        from ocr_machine_ray.stages.media import reassemble_doc_media

        # ref m-7-10 must sort AFTER m-7-9 (numeric, not lexicographic)
        pages = {
            "doc_id": [7, 7],
            "media_ref": ["m-7-10", "m-7-9"],
            "bytes": [b"J", b"I"],
            "offset": [109, 98],
        }
        out = reassemble_doc_media(pd.DataFrame(pages))
        assert out["artifact"].iloc[0] == b"IJ"


class TestFrameSampler:
    def test_slices_every_other_frame_bytes(self):
        import numpy as np
        from ocr_machine_ray.stages import media as M

        fb = M.FRAME_BYTES
        frames = [
            np.full((M.MEDIA_H, M.MEDIA_W), v, dtype=np.uint8)
            for v in (10, 20, 30, 40, 50)
        ]
        batch = pa.table(
            {
                "video_ref": pa.array(["v-3"], type=pa.string()),
                "doc_id": pa.array([3], type=pa.int64()),
                "payload": pa.array(
                    [b"".join(f.tobytes() for f in frames)],
                    type=pa.binary(),
                ),
                "n_frames": pa.array([5], type=pa.int64()),
            }
        )
        out = M.FrameSampler(stride=2)(batch)
        assert out["n_sampled"].to_pylist() == [3]       # frames 0, 2, 4
        assert out["sampled_bytes"].to_pylist() == [3 * fb]

    def test_rejects_size_mismatch(self):
        import pytest
        from ocr_machine_ray.stages import media as M

        batch = pa.table(
            {
                "video_ref": pa.array(["v-1"], type=pa.string()),
                "doc_id": pa.array([1], type=pa.int64()),
                "payload": pa.array([b"short"], type=pa.binary()),
                "n_frames": pa.array([2], type=pa.int64()),
            }
        )
        with pytest.raises(ValueError):
            M.FrameSampler()(batch)

    def test_synth_follows_rule(self):
        from ocr_machine_ray.stages import media as M

        batch = pa.table(
            {
                "doc_id": pa.array(
                    [3, 4, 14, 26], type=pa.int64()
                ),  # 3 and 14 match doc_id % 11 == 3 (26 % 11 == 4)
                "text": pa.array(["a", "b", "c", "d"]),
            }
        )
        out = M.synth_video_batch(batch)
        assert out["doc_id"].to_pylist() == [3, 14]
        assert out["n_frames"].to_pylist() == [2 + 3 % 5, 2 + 14 % 5]


class TestAudio:
    def test_clip_bytes_by_hand(self):
        import numpy as np

        from ocr_machine_ray.stages.media import (
            AUDIO_SR,
            synth_audio_clip,
        )

        # doc_id 2: duration 1 + 2%3 = 3s, amp 32 + 2%4*24 = 80, period 10
        buf = synth_audio_clip(2)
        s = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        assert len(s) == 3 * AUDIO_SR
        half = len(s) // 2
        assert (s[half:] == 128).all()
        assert set(np.unique(s[:half])) == {48, 208}
        # first block of `period` samples is the +amp phase
        assert (s[:10] == 208).all()
        assert (s[10:20] == 48).all()

    def test_features_match_rule(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa

        from ocr_machine_ray.stages.media import (
            AUDIO_FRAME,
            AUDIO_SR,
            AudioFeatures,
            synth_audio_batch,
        )

        ids = [2, 9, 16, 23]  # all % 7 == 2
        batch = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(["x"] * len(ids)),
            }
        )
        clips = synth_audio_batch(batch)
        out = AudioFeatures()(clips).to_pandas()
        for _, r in out.iterrows():
            d = int(r["doc_id"])
            n = AUDIO_SR * (1 + d % 3)
            amp = 32 + (d % 4) * 24
            assert r["n_samples"] == n
            assert r["n_frames"] == n // AUDIO_FRAME
            assert r["n_active_frames"] == n // (2 * AUDIO_FRAME)
            assert r["total_energy"] == amp * (n // 2)

    def test_non_matching_docs_skipped(self):
        import pyarrow as pa

        from ocr_machine_ray.stages.media import synth_audio_batch

        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 3], type=pa.int64()),
                "text": pa.array(["x", "y", "z"]),
            }
        )
        assert len(synth_audio_batch(batch)) == 0


class TestShotBoundary:
    def test_detector_reads_bytes(self):
        """Cuts are recovered from the payload, not the metadata: shifting
        the planted scene boundary in the bytes moves the detected cut."""
        import numpy as np
        import pyarrow as pa

        from ocr_machine_ray.stages.media import (
            FRAME_BYTES,
            MEDIA_H,
            MEDIA_W,
            ShotBoundaryDetector,
        )

        def clip(levels):
            frames = [
                np.full((MEDIA_H, MEDIA_W), v, dtype=np.uint8).tobytes()
                for v in levels
            ]
            return b"".join(frames)

        batch = pa.table(
            {
                "video_ref": pa.array(["a", "b", "c"]),
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "payload": pa.array(
                    [
                        clip([80, 80, 150, 150, 150]),      # cut at 2
                        clip([80, 80, 80, 150, 220]),       # cuts at 3, 4
                        clip([100, 104, 99, 101, 100]),     # no cut
                    ],
                    type=pa.binary(),
                ),
                "n_frames": pa.array([5, 5, 5], type=pa.int64()),
            }
        )
        out = ShotBoundaryDetector(FRAME_BYTES)(batch).to_pandas()
        assert out["n_cuts"].tolist() == [1, 2, 0]
        assert out["cut1"].tolist() == [2, 3, -1]
        assert out["cut2"].tolist() == [-1, 4, -1]

    def test_synth_layout_matches_rule(self):
        import numpy as np
        import pyarrow as pa

        from ocr_machine_ray.stages.media import (
            ShotBoundaryDetector,
            synth_scene_video_batch,
            VIDEO_MOD,
            VIDEO_RESIDUE,
        )

        ids = np.arange(0, 400, dtype=np.int64)
        batch = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
        vids = synth_scene_video_batch(batch)
        assert (
            vids["doc_id"].to_numpy(zero_copy_only=False) % VIDEO_MOD
            == VIDEO_RESIDUE
        ).all()
        out = ShotBoundaryDetector()(vids).to_pandas()
        d = out["doc_id"].to_numpy()
        assert (out["n_cuts"] == 2).all()
        assert (out["cut1"].to_numpy() == 2 + d % 3).all()
        assert (out["cut2"].to_numpy() == 5 + d % 2).all()


def test_page_compress_jpeg_real_codec(ray_session):
    """M20 real form: every scan page shrinks under JPEG q=40
    (compressed_smaller pins the size-reduction property through the real
    encoder), the stream decodes back to the page dimensions, and the
    decoded checksums match the palette mapping the oracle hardcodes."""
    import numpy as np

    from ocr_machine_ray.functions.jpeg import jpeg_decode, jpeg_encode_batch
    from ocr_machine_ray.registry import queries
    from ocr_machine_ray.stages.media import synth_media_image

    out = queries()["page_compress_jpeg"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 2000
    assert (out["compressed_smaller"] == 1).all()
    assert (out["dec_h"] == 64).all() and (out["dec_w"] == 96).all()
    assert (out["raw_bytes"] == 64 * 96).all()
    assert out["dec_checksum"].nunique() > 1  # content-dependent, not const
    # the q40 stream itself round-trips dimensionally on textured pages too
    img = synth_media_image("m-7-1", "grid")
    enc = jpeg_encode_batch(img[np.newaxis], quality=40)[0]
    assert jpeg_decode(enc).shape == img.shape


def test_scan_palette_roundtrip_mapping():
    """The oracle's hardcoded decoded-palette constants ARE the real
    codec's q=40 behavior on 8x8-constant blocks: regenerate the mapping
    from jpeg_encode/jpeg_decode and compare. Also pins that a multi-block
    block-constant page decodes block-constant (DC-only blocks), which is
    what makes the center-pixel sample in the query exact."""
    import numpy as np

    from ocr_machine_ray.functions.jpeg import jpeg_decode, jpeg_encode
    from ocr_machine_ray.pipelines.queries_media import (
        _SCAN_PALETTE,
        _SCAN_PALETTE_DECODED,
        synth_scan_pages,
    )

    for orig, want in zip(_SCAN_PALETTE, _SCAN_PALETTE_DECODED):
        block = np.full((8, 8), orig, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(block, quality=40))
        assert np.unique(dec).tolist() == [want], orig

    page = synth_scan_pages(
        np.array([7], dtype=np.int64), np.array([10], dtype=np.int64)
    )[0]
    dec = jpeg_decode(jpeg_encode(page, quality=40))
    blocks = dec.reshape(8, 8, 12, 8).swapaxes(1, 2).reshape(96, 64)
    pal_map = dict(zip(_SCAN_PALETTE, _SCAN_PALETTE_DECODED))
    src_blocks = page.reshape(8, 8, 12, 8).swapaxes(1, 2).reshape(96, 64)
    for b in range(96):
        assert np.unique(blocks[b]).tolist() == [
            pal_map[int(src_blocks[b][0])]
        ], b
