"""Text-analysis kernels for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All batch functions are Arrow-in/Arrow-out and vectorized except the
per-document hashing (md5/rolling hash), which is inherently per-row but
C-speed via hashlib / numpy polynomial evaluation.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..corpus import FlatTokens

# ---------------------------------------------------------------------------
# Language ID: tiny n-gram/stopword/charset heuristic (no external models).
# ---------------------------------------------------------------------------
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it was for on are as with".split()),
    "fr": frozenset("le la les de des et un une est dans que pour sur".split()),
    "es": frozenset("el la los las de y un una es en que por para con".split()),
    "de": frozenset("der die das und ein eine ist in den von zu mit".split()),
}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK via unicode ranges, else stopword voting,
    else accent-class tie-breaks. Returns a BCP-47-ish 2-letter code or
    'und' when nothing matches."""
    if not text:
        return "und"
    n_cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if n_cjk >= max(1, len(text) // 20):
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    scores = {
        lang: sum(1 for w in words if w in sw)
        for lang, sw in _LANG_STOPWORDS.items()
    }
    best = max(scores, key=lambda k: scores[k])
    if scores[best] > 0:
        return best
    if any(ch in "äöüß" for ch in text):
        return "de"
    if any(ch in "áéíóúñ¿¡" for ch in text):
        return "es"
    if any(ch in "àâçèêëîïôùûœ" for ch in text):
        return "fr"
    return "und"


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds = [detect_language(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


# ---------------------------------------------------------------------------
# Quality scoring: length / stopword / repetition signals (vectorized).
# Counters are integers so the DuckDB oracle hashes exactly.
# ---------------------------------------------------------------------------
QUALITY_STOPWORDS = ("the", "a")  # present in the synthetic corpus vocabulary


def quality_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc integer quality counters from one tokenization pass."""
    ft = FlatTokens(batch)
    n = len(batch)
    tok_len = np.char.str_len(ft.tokens.astype(str))
    total_len = np.bincount(ft.row_idx, weights=tok_len, minlength=n).astype(
        np.int64
    )
    stop_mask = np.isin(ft.tokens, QUALITY_STOPWORDS)
    n_stop = np.bincount(ft.row_idx[stop_mask], minlength=n).astype(np.int64)
    # repetition: tokens equal to their predecessor within the same doc
    same = np.zeros(len(ft.tokens), dtype=bool)
    if len(ft.tokens) > 1:
        same[1:] = (ft.tokens[1:] == ft.tokens[:-1]) & (
            ft.row_idx[1:] == ft.row_idx[:-1]
        )
    n_repeat = np.bincount(ft.row_idx[same], minlength=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ft.counts.astype(np.int64)),
            "total_token_len": pa.array(total_len),
            "n_stopword": pa.array(n_stop),
            "n_repeat": pa.array(n_repeat),
        }
    )


# ---------------------------------------------------------------------------
# Fingerprinting.
# ---------------------------------------------------------------------------
def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )


ROLL_BASE = 257
ROLL_MOD = (1 << 61) - 1


def rolling_hash(text: str) -> int:
    """Polynomial rolling hash over UTF-8 bytes, mod 2^61-1 (document
    fingerprint; the arbitrary-precision arithmetic keeps it exact)."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * ROLL_BASE + b) % ROLL_MOD
    return h


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [rolling_hash(t or "") for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting: whitespace words further split into sub-tokens by a
# GPT-2-style regex (contractions / letters / digits / punctuation runs).
# ---------------------------------------------------------------------------
_BPEISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d+|[^\s\w]+", re.UNICODE
)


def bpeish_token_count(text: str) -> int:
    return len(_BPEISH_RE.findall(text))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish sub-token counts per document."""
    ft = FlatTokens(batch)
    bpeish = [bpeish_token_count(t or "") for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(ft.counts.astype(np.int64)),
            "n_bpeish_tokens": pa.array(np.asarray(bpeish, dtype=np.int64)),
        }
    )
