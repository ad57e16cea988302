"""WAV codec + audio stage tests. The independent reference codec is
Python's stdlib ``wave`` module: our encoder's output must decode there,
and its output must decode here — both directions, bit-exact."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from ocr_machine_ray.functions.wav import WavError, wav_decode, wav_encode
from ocr_machine_ray.stages.audio import (
    AUDIO_FRAME,
    AUDIO_SR,
    SILENCE_THRESH,
    synth_wave,
)


def test_roundtrip_mono():
    rng = np.random.default_rng(1)
    v = rng.integers(-32768, 32768, 1234, dtype=np.int16)
    out, sr = wav_decode(wav_encode(v, 16000))
    assert sr == 16000
    assert np.array_equal(out, v)


def test_roundtrip_stereo():
    rng = np.random.default_rng(2)
    v = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
    out, sr = wav_decode(wav_encode(v, 44100))
    assert sr == 44100
    assert out.shape == (500, 2)
    assert np.array_equal(out, v)


def test_stdlib_wave_reads_our_output():
    rng = np.random.default_rng(3)
    v = rng.integers(-32768, 32768, 777, dtype=np.int16)
    with wave.open(io.BytesIO(wav_encode(v, 8000))) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 777
        back = np.frombuffer(w.readframes(777), dtype="<i2")
    assert np.array_equal(back, v)


def test_we_read_stdlib_wave_output():
    rng = np.random.default_rng(4)
    v = rng.integers(-32768, 32768, (300, 2), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(v.astype("<i2").tobytes())
    out, sr = wav_decode(buf.getvalue())
    assert sr == 22050
    assert np.array_equal(out, v)


def test_unknown_chunks_skipped_and_odd_padding():
    v = np.arange(-50, 50, dtype=np.int16)
    payload = wav_encode(v, 8000)
    # splice a LIST chunk with an ODD body length between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    out, sr = wav_decode(spliced)
    assert np.array_equal(out, v)


def test_pcm8_decode():
    raw = bytes(range(256))
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(raw), b"WAVE", b"fmt ", 16,
        1, 1, 8000, 8000, 1, 8, b"data", len(raw),
    )
    out, sr = wav_decode(hdr + raw)
    assert out.dtype == np.int16
    assert out[0] == -128 and out[255] == 127


def test_rejects():
    with pytest.raises(WavError):
        wav_decode(b"RIFX" + b"\x00" * 40)
    with pytest.raises(WavError):
        wav_encode(np.zeros(4, dtype=np.float32), 8000)
    # mu-law format tag
    v = np.zeros(4, dtype=np.int16)
    payload = bytearray(wav_encode(v, 8000))
    payload[20] = 7  # format tag -> mu-law
    with pytest.raises(WavError):
        wav_decode(bytes(payload))


def test_synth_wave_matches_rule():
    for d in (2, 5, 8, 11, 14):
        v = synth_wave(d)
        n = 800 + (d % 5) * 400
        assert v.shape == (n,) and v.dtype == np.int16
        i = np.arange(n, dtype=np.int64)
        expect = (d * 7919 + i * 104729) % 4096 - 2048
        expect[(i // AUDIO_FRAME) % 5 == d % 5] = 0
        assert np.array_equal(v.astype(np.int64), expect)
        # planted silence frames are genuinely below the VAD gate
        k = n // AUDIO_FRAME
        fmax = np.abs(v[: k * AUDIO_FRAME].astype(np.int64)).reshape(
            k, AUDIO_FRAME
        ).max(axis=1)
        planted = np.arange(k) % 5 == d % 5
        assert (fmax[planted] < SILENCE_THRESH).all()


def test_analyzer_and_resampler_stages():
    import pyarrow as pa

    from ocr_machine_ray.stages.audio import (
        AudioAnalyzer,
        AudioResampler,
        synth_audio_batch,
    )

    batch = pa.table({"doc_id": pa.array([1, 2, 5, 9], type=pa.int64())})
    rows = synth_audio_batch(batch)
    assert rows["doc_id"].to_pylist() == [2, 5]  # doc % 3 == 2 only

    out = AudioAnalyzer()(rows)
    for j, d in enumerate((2, 5)):
        v = synth_wave(d).astype(np.int64)
        assert out["n_samples"][j].as_py() == v.shape[0]
        assert out["sample_rate"][j].as_py() == AUDIO_SR
        assert out["peak"][j].as_py() == int(np.abs(v).max())
        assert out["energy"][j].as_py() == int(np.sum(v * v))
        k = v.shape[0] // AUDIO_FRAME
        fmax = np.abs(v[: k * AUDIO_FRAME]).reshape(k, AUDIO_FRAME).max(
            axis=1
        )
        assert out["silent_frames"][j].as_py() == int(
            (fmax < SILENCE_THRESH).sum()
        )

    res = AudioResampler()(rows)
    for j, d in enumerate((2, 5)):
        v = synth_wave(d).astype(np.int64)[::2]
        assert res["new_n"][j].as_py() == v.shape[0]
        assert res["checksum"][j].as_py() == int(
            np.sum(v * (np.arange(v.shape[0]) + 1))
        )
        assert res["wav_bytes_len"][j].as_py() == 44 + 2 * v.shape[0]


class TestSpectrogram:
    def test_parseval_through_fft(self):
        """spectral_sq recovered through rfft equals the direct
        time-domain integer energy over full frames."""
        import numpy as np
        import pyarrow as pa

        from ocr_machine_ray.functions.wav import wav_encode
        from ocr_machine_ray.stages.audio import (
            AUDIO_FRAME,
            SpectrogramAnalyzer,
        )

        rng = np.random.default_rng(11)
        clips = [
            rng.integers(-2048, 2048, 7 * AUDIO_FRAME + 53).astype(np.int16),
            np.zeros(3 * AUDIO_FRAME, dtype=np.int16),
        ]
        batch = pa.table(
            {
                "audio_ref": pa.array(["a", "b"]),
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "wav": pa.array(
                    [wav_encode(c, 8000) for c in clips], type=pa.binary()
                ),
            }
        )
        out = SpectrogramAnalyzer()(batch).to_pandas()
        for row, clip in zip(out.itertuples(), clips):
            full = (len(clip) // AUDIO_FRAME) * AUDIO_FRAME
            direct = int(np.sum(clip[:full].astype(np.int64) ** 2))
            assert row.spectral_sq == direct
        assert out["dominant_bin"].tolist()[1] == -1  # silent clip

    def test_dominant_bin_vs_textbook_dft(self):
        """The argmax power bin from the rfft path must agree with a
        textbook O(n^2) DFT implemented independently — and for a pure
        sine at an exact bin frequency, with that bin."""
        import numpy as np
        import pyarrow as pa

        from ocr_machine_ray.functions.wav import wav_encode
        from ocr_machine_ray.stages.audio import (
            AUDIO_FRAME,
            SpectrogramAnalyzer,
        )

        F = AUDIO_FRAME
        t = np.arange(4 * F)
        clips = {
            "sine_bin7": (1000 * np.sin(2 * np.pi * 7 * t / F)),
            "sine_bin23": (800 * np.sin(2 * np.pi * 23 * t / F)),
            "noise": np.random.default_rng(3).integers(-500, 500, 4 * F),
        }
        batch = pa.table(
            {
                "audio_ref": pa.array(list(clips)),
                "doc_id": pa.array(
                    range(len(clips)), type=pa.int64()
                ),
                "wav": pa.array(
                    [
                        wav_encode(
                            np.round(c).astype(np.int16), 8000
                        )
                        for c in clips.values()
                    ],
                    type=pa.binary(),
                ),
            }
        )
        out = SpectrogramAnalyzer()(batch).to_pandas()
        got = dict(zip(out["audio_ref"], out["dominant_bin"]))
        assert got["sine_bin7"] == 7
        assert got["sine_bin23"] == 23

        # independent reference: textbook DFT sum, one-sided power,
        # summed over frames, argmax over k >= 1
        def textbook_bin(clip):
            x = np.round(clip).astype(np.int16).astype(np.float64)
            nf = len(x) // F
            band = np.zeros(F // 2)  # k = 1 .. F//2
            for fi in range(nf):
                seg = x[fi * F:(fi + 1) * F]
                for k in range(1, F // 2 + 1):
                    re = np.sum(seg * np.cos(-2 * np.pi * k * np.arange(F) / F))
                    im = np.sum(seg * np.sin(-2 * np.pi * k * np.arange(F) / F))
                    band[k - 1] += re * re + im * im
            return int(band.argmax()) + 1

        for name, clip in clips.items():
            assert got[name] == textbook_bin(clip), name
