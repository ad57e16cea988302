"""Audio modality stages: synthetic PCM waveforms -> real WAV payloads ->
actor-pool decode/analyze/resample.

Relationship to the round-2 audio_features family (stages/media.py:405,
headerless 8-bit PCM at 1 kHz, 'a-' refs, doc_id % 7): THIS module is the
container-format path — int16 through the real RIFF/WAV codec
(functions/wav.py), 'au-' refs, doc_id % 3 — so the engine exercises both
raw-buffer and real-interchange-format audio plumbing. The AUDIO_*
constant names repeat across the two modules deliberately (each family is
self-contained); import from the module whose family you are extending.

Same closed-loop design as the image/video families (stages/media.py): the
waveform is drawn FROM a closed-form integer rule in ``doc_id``, encoded
through the REAL WAV codec (functions/wav.py), and the downstream stages
must recover every output column from the decoded bytes alone — the SQL
oracles recompute the same columns arithmetically from the rule. Any codec
or plumbing defect (byte order, chunk walk, truncation, channel layout)
breaks value-equality.

Scale notes: payloads are opaque ``binary`` column cells (~1.6-4.8 KiB
each here; real audio is MBs — batch_size at the actor boundary is sized
small for that case). Analysis is one pass per payload, vectorized numpy
inside; no shuffle anywhere in the family. At 100 TB the same stages run
unchanged: the decode actor pool scales horizontally and per-doc outputs
are one tiny row each.

Synthesis rule (mirrored in pipelines/queries_audio.py SQL):
  audio docs:  doc_id % AUDIO_MOD == AUDIO_RESIDUE
  n_samples:   800 + (doc_id % 5) * 400            (100-300 ms at 8 kHz)
  sample i:    ((doc_id * 7919 + i * 104729) % 4096) - 2048
  silence:     frames f = i // AUDIO_FRAME with f % 5 == doc_id % 5 are
               zeroed — planted silence for the VAD stage to find.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.wav import wav_decode, wav_encode

AUDIO_MOD = 3
AUDIO_RESIDUE = 2
AUDIO_SR = 8000
AUDIO_FRAME = 160  # 20 ms VAD frames at 8 kHz
SILENCE_THRESH = 64


def synth_wave(doc_id: int) -> np.ndarray:
    """Closed-form int16 waveform for one audio doc."""
    n = 800 + (doc_id % 5) * 400
    i = np.arange(n, dtype=np.int64)
    v = (doc_id * 7919 + i * 104729) % 4096 - 2048
    v[(i // AUDIO_FRAME) % 5 == doc_id % 5] = 0
    return v.astype(np.int16)


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    """doc_id rows -> WAV payload rows for the audio-eligible docs."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = doc[doc % AUDIO_MOD == AUDIO_RESIDUE]
    payloads = [wav_encode(synth_wave(int(d)), AUDIO_SR) for d in sel]
    return pa.table(
        {
            "audio_ref": pa.array(
                [f"au-{int(d)}" for d in sel], type=pa.string()
            ),
            "doc_id": pa.array(sel, type=pa.int64()),
            "wav": pa.array(payloads, type=pa.binary()),
        }
    )


class AudioAnalyzer:
    """Actor-pool audio analysis: decode WAV bytes, emit per-clip stats +
    frame-level VAD counts in one pass. Mirrors the image classifier's
    shape — setup once per actor, vectorized per payload."""

    def __init__(
        self,
        frame: int = AUDIO_FRAME,
        silence_thresh: int = SILENCE_THRESH,
    ):
        self.frame = frame
        self.silence_thresh = silence_thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_s, sr_s, dur, peak, energy, nfr, sil = [], [], [], [], [], [], []
        for payload in batch["wav"].to_pylist():
            v16, sr = wav_decode(payload)
            v = v16.astype(np.int64)
            n = v.shape[0]
            n_s.append(n)
            sr_s.append(sr)
            dur.append(n * 1000 // sr)
            peak.append(int(np.max(np.abs(v))) if n else 0)
            energy.append(int(np.sum(v * v)))
            k = n // self.frame
            nfr.append(k)
            if k:
                fmax = np.abs(v[: k * self.frame]).reshape(
                    k, self.frame
                ).max(axis=1)
                sil.append(int(np.sum(fmax < self.silence_thresh)))
            else:
                sil.append(0)
        return pa.table(
            {
                "audio_ref": batch["audio_ref"],
                "doc_id": batch["doc_id"],
                "n_samples": pa.array(n_s, type=pa.int64()),
                "sample_rate": pa.array(sr_s, type=pa.int64()),
                "duration_ms": pa.array(dur, type=pa.int64()),
                "peak": pa.array(peak, type=pa.int64()),
                "energy": pa.array(energy, type=pa.int64()),
                "n_frames": pa.array(nfr, type=pa.int64()),
                "silent_frames": pa.array(sil, type=pa.int64()),
            }
        )


class AudioResampler:
    """Actor-pool 2:1 decimating resampler: decode, take every other
    sample, re-encode through the real codec, and emit integrity columns
    (position-weighted checksum + exact output payload size) that the SQL
    oracle recomputes — so the WRITE path of the codec is value-checked
    too, not just the read path."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        new_n, checksum, out_len = [], [], []
        for payload in batch["wav"].to_pylist():
            v16, sr = wav_decode(payload)
            dec = v16[:: self.factor]
            enc = wav_encode(dec, sr // self.factor)
            d = dec.astype(np.int64)
            new_n.append(d.shape[0])
            checksum.append(int(np.sum(d * (np.arange(d.shape[0]) + 1))))
            out_len.append(len(enc))
        return pa.table(
            {
                "audio_ref": batch["audio_ref"],
                "doc_id": batch["doc_id"],
                "new_n": pa.array(new_n, type=pa.int64()),
                "checksum": pa.array(checksum, type=pa.int64()),
                "wav_bytes_len": pa.array(out_len, type=pa.int64()),
            }
        )


class SpectrogramAnalyzer:
    """Actor-pool spectral feature extractor: decode WAV, frame to
    AUDIO_FRAME samples, REAL rfft per frame (vectorized across the
    clip's frames), one-sided power spectrum, per-clip totals.

    ``spectral_sq`` is the Parseval-recovered time-domain energy —
    sum(x^2) over full frames computed THROUGH the FFT and rounded to
    int64 (float64 rfft error is ~1e-9 relative at these magnitudes,
    orders under the 0.5 rounding margin) — so the SQL oracle can
    value-check a real DSP kernel with closed-form integer arithmetic.
    ``dominant_bin`` (argmax one-sided power bin >= 1, summed over
    frames; -1 for all-silent clips) is frequency-domain-only and is
    pinned by pytest against a textbook O(n^2) DFT instead."""

    def __init__(self, frame: int = AUDIO_FRAME):
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf_out, sq_out, bin_out = [], [], []
        for payload in batch["wav"].to_pylist():
            v16, _sr = wav_decode(payload)
            nf = v16.shape[0] // self.frame
            frames = (
                v16[: nf * self.frame]
                .astype(np.float64)
                .reshape(nf, self.frame)
            )
            spec = np.fft.rfft(frames, axis=1)
            power = spec.real**2 + spec.imag**2
            # Parseval (one-sided, even frame): x.x = (P0 + 2*Pmid + Pnyq)/F
            mid = power[:, 1:-1].sum()
            total = (power[:, 0].sum() + 2.0 * mid
                     + power[:, -1].sum()) / self.frame
            band = power[:, 1:].sum(axis=0)  # DC excluded
            nf_out.append(nf)
            sq_out.append(int(np.round(total)))
            bin_out.append(int(band.argmax()) + 1 if band.any() else -1)
        return pa.table(
            {
                "audio_ref": batch["audio_ref"],
                "doc_id": batch["doc_id"],
                "n_frames": pa.array(nf_out, type=pa.int64()),
                "spectral_sq": pa.array(sq_out, type=pa.int64()),
                "dominant_bin": pa.array(bin_out, type=pa.int64()),
            }
        )
