"""Driver-checked queries: audio modality (waveform synthesis -> REAL WAV
codec -> actor-pool decode/analyze/resample).

Closed-loop oracles like the image/video families (queries_media.py): the
waveform rule lives in doc_id arithmetic (stages/audio.py:synth_wave), the
Ray side must recover every column from DECODED WAV BYTES alone, and the
SQL recomputes the rule with generate_series. The codec in the middle
(functions/wav.py) is real RIFF/PCM — a byte-order, chunk-walk or
truncation bug anywhere breaks value-equality.

Reference parity: the reference has no audio path (it is an OCR app); this
family is part of the prompt's multimodal contract (binary payload column
+ typed metadata + actor-pool decode stages), built to the same standard
as the reference-derived image path.
"""

from __future__ import annotations

from ..registry import query
from ..stages.audio import (
    AudioAnalyzer,
    AudioResampler,
    synth_audio_batch,
)

# Shared sample-stream CTE: the synthesis rule, mirrored from
# stages/audio.py (AUDIO_MOD=3, AUDIO_RESIDUE=2, n = 800 + (doc%5)*400,
# v_i = ((doc*7919 + i*104729) % 4096) - 2048, frames f%5==doc%5 zeroed).
# generate_series cannot take lateral column args in this DuckDB build, so
# the range is the constant max (2399) filtered per doc.
_SAMPLES_CTE = """
WITH audio_docs AS (
  SELECT doc_id, 800 + (doc_id % 5) * 400 AS n_samples
  FROM documents WHERE doc_id % 3 = 2
),
samples AS (
  SELECT d.doc_id, d.n_samples, t.i,
         CASE WHEN ((t.i // 160) % 5) = (d.doc_id % 5) THEN 0
              ELSE ((d.doc_id * 7919 + t.i * 104729) % 4096) - 2048 END AS v
  FROM audio_docs d CROSS JOIN generate_series(0, 2399) AS t(i)
  WHERE t.i < d.n_samples
)
"""


def _audio_rows(sf_dir: str):
    from .extraction import read_documents

    return read_documents(sf_dir, ["doc_id"]).map_batches(
        synth_audio_batch, batch_format="pyarrow", zero_copy_batch=True
    )


_STATS_SQL = f"""
{_SAMPLES_CTE}
SELECT 'au-' || CAST(doc_id AS VARCHAR) AS audio_ref,
       doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(count(*) * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(v * v) AS BIGINT) AS energy
FROM samples GROUP BY doc_id
"""


@query("audio_stats", _STATS_SQL)
def q_audio_stats(sf_dir: str):
    """Per-clip duration/peak/energy from decoded WAV bytes (one decode
    pass in the analyzer actor pool; binary payloads never shuffle)."""
    return (
        _audio_rows(sf_dir)
        .map_batches(
            AudioAnalyzer,
            batch_format="pyarrow",
            batch_size=256,  # binary payloads: keep actor batches small
            concurrency=(1, 4),
        )
        .select_columns(
            [
                "audio_ref",
                "doc_id",
                "n_samples",
                "sample_rate",
                "duration_ms",
                "peak",
                "energy",
            ]
        )
    )


_VAD_SQL = f"""
{_SAMPLES_CTE},
frames AS (
  SELECT doc_id, t_f AS f, max(abs(v)) AS fmax
  FROM (
    SELECT doc_id, i // 160 AS t_f, v, n_samples FROM samples
    WHERE i < (n_samples // 160) * 160
  ) GROUP BY doc_id, t_f
)
SELECT 'au-' || CAST(doc_id AS VARCHAR) AS audio_ref,
       doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN fmax < 64 THEN 1 ELSE 0 END) AS BIGINT)
         AS silent_frames
FROM frames GROUP BY doc_id
"""


@query("audio_vad", _VAD_SQL)
def q_audio_vad(sf_dir: str):
    """Energy-gate voice-activity detection: 20 ms frames, a frame is
    silent when max |sample| < 64. The planted silence pattern
    (stages/audio.py synthesis rule) must be recovered from pixels' audio
    equivalent — decoded PCM — alone."""
    return (
        _audio_rows(sf_dir)
        .map_batches(
            AudioAnalyzer,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
        )
        .select_columns(["audio_ref", "doc_id", "n_frames", "silent_frames"])
    )


_RESAMPLE_SQL = f"""
{_SAMPLES_CTE}
SELECT 'au-' || CAST(doc_id AS VARCHAR) AS audio_ref,
       doc_id,
       CAST(count(*) AS BIGINT) AS new_n,
       CAST(sum(v * (i // 2 + 1)) AS BIGINT) AS checksum,
       CAST(44 + 2 * count(*) AS BIGINT) AS wav_bytes_len
FROM samples WHERE i % 2 = 0 GROUP BY doc_id
"""


@query("audio_resample", _RESAMPLE_SQL)
def q_audio_resample(sf_dir: str):
    """2:1 decimation through decode -> slice -> RE-ENCODE: the oracle's
    wav_bytes_len (44-byte canonical header + 2 bytes/sample) value-checks
    the codec's write path; the position-weighted checksum pins sample
    order and values."""
    return _audio_rows(sf_dir).map_batches(
        AudioResampler,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Spectrogram features through a REAL FFT: per-frame rfft, one-sided power,
# Parseval-recovered time-domain energy. The oracle value-checks that the
# energy recovered THROUGH the frequency domain equals the closed-form
# integer sum(v^2) over full frames — a genuine end-to-end check of the
# DSP kernel (any fft/windowing/one-sided-weighting bug breaks equality).
# dominant_bin is frequency-domain-only (no SQL form) and is pinned by
# pytest against a textbook O(n^2) DFT.
# ---------------------------------------------------------------------------
_SPECTRO_SQL = f"""
{_SAMPLES_CTE}
SELECT 'au-' || CAST(doc_id AS VARCHAR) AS audio_ref,
       doc_id,
       CAST(count(*) // 160 AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN i < (n_samples // 160) * 160
                     THEN v * v ELSE 0 END) AS BIGINT) AS spectral_sq
FROM samples GROUP BY doc_id
"""


@query("audio_spectrogram", _SPECTRO_SQL)
def q_audio_spectrogram(sf_dir: str):
    from ..stages.audio import SpectrogramAnalyzer

    return (
        _audio_rows(sf_dir)
        .map_batches(
            SpectrogramAnalyzer,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
        )
        .select_columns(
            ["audio_ref", "doc_id", "n_frames", "spectral_sq"]
        )
    )
