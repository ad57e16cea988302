"""Deduplication kernels: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (SURVEY.md §2.7 + training-data-pipeline ops).

Scale notes (100 TB): every kernel below emits per-batch partials or
bucket keys so the wide step is a groupby over keys, never all-pairs.
md5 is used as the hash everywhere because the DuckDB oracle can compute
the identical value (`md5()`); a production run would swap in xxhash via
the same interfaces.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..corpus import FlatTokens

# ---------------------------------------------------------------------------
# MinHash + LSH banding.
# ---------------------------------------------------------------------------
# ASCII-\s tokenizer shared by every Python-side dedup kernel — matches
# the engine's Arrow/RE2 tokenization (FlatTokens) and the DuckDB oracle's
# string_split_regex('\s+'); str.split() would differ on unicode
# whitespace like NBSP.
_TOKEN_RE = re.compile(r"\s+", re.ASCII)


_ASCII_WS = " \t\n\r\v\f"


def tokenize(text: str) -> list[str]:
    t = text.strip(_ASCII_WS)
    return _TOKEN_RE.split(t) if t else [""]


MINHASH_SEEDS = 8
BAND_SIZE = 2
N_BANDS = MINHASH_SEEDS // BAND_SIZE
SHINGLE_N = 3


def word_shingles(tokens: list[str], n: int = SHINGLE_N) -> set[str]:
    """n-word shingles; a doc shorter than n yields its single joined text."""
    return {
        " ".join(tokens[i : i + n]) for i in range(max(1, len(tokens) - n + 1))
    }


def minhash_signature(shingles: set[str], k: int = MINHASH_SEEDS) -> list[str]:
    """k min-hex-md5 values of seed-salted shingles (lexicographic min over
    hex strings — identical to SQL ``min(md5(shingle || '|' || seed))``)."""
    return [
        min(hashlib.md5(f"{s}|{seed}".encode()).hexdigest() for s in shingles)
        for seed in range(k)
    ]


def band_keys(sig: list[str]) -> list[str]:
    return [
        hashlib.md5("|".join(sig[b * BAND_SIZE : (b + 1) * BAND_SIZE]).encode())
        .hexdigest()
        for b in range(N_BANDS)
    ]


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """Per-doc LSH bucket keys: (doc_id, band, band_key). Downstream dedup is
    groupby((band, band_key)) — hash-partitioned, no all-pairs."""
    doc_ids, bands, keys = [], [], []
    for doc_id, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        sig = minhash_signature(word_shingles(tokenize(text or "")))
        for b, key in enumerate(band_keys(sig)):
            doc_ids.append(doc_id)
            bands.append(b)
            keys.append(key)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band": pa.array(bands, type=pa.int64()),
            "band_key": pa.array(keys, type=pa.string()),
        }
    )


def shingle_jaccard(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b) if (a or b) else 1.0


# ---------------------------------------------------------------------------
# SimHash (64-bit, vectorized over the batch with a token-hash cache).
# ---------------------------------------------------------------------------
# NOTE: plain dict cache, not functools.lru_cache — an lru_cache wrapper is
# pickled by reference and breaks pickle-by-value shipping to Ray workers.
_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash64(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        if len(_TOKEN_HASH_CACHE) < (1 << 16):
            _TOKEN_HASH_CACHE[tok] = h
    return h


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over each doc's DISTINCT tokens; emitted as a 16-char
    hex string (uint64-safe for Arrow/pandas/DuckDB alike)."""
    ft = FlatTokens(batch)
    n = len(batch)
    uniq_toks, tok_inv = np.unique(ft.tokens, return_inverse=True)
    hashes = np.array([_token_hash64(t) for t in uniq_toks], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bit_mat = ((hashes[:, None] >> shifts[None, :]) & 1).astype(np.int64)
    bit_mat = 2 * bit_mat - 1  # ±1 votes
    # distinct (row, token) pairs only
    pair_ids = ft.row_idx * len(uniq_toks) + tok_inv
    uniq_pairs = np.unique(pair_ids)
    p_rows = uniq_pairs // len(uniq_toks)
    p_toks = uniq_pairs % len(uniq_toks)
    acc = np.zeros((n, 64), dtype=np.int64)
    np.add.at(acc, p_rows, bit_mat[p_toks])
    bits = (acc > 0).astype(np.uint64)
    vals = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    hexes = [format(int(v), "016x") for v in vals]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(hexes, type=pa.string()),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard within buckets — vectorized incidence matmul.
# ---------------------------------------------------------------------------
def jaccard_pairs_group(
    doc_ids: np.ndarray, token_lists: list[list[str]], threshold: float
) -> tuple[np.ndarray, np.ndarray]:
    """All pairs (a<b) in one bucket with word-SET Jaccard >= threshold.

    |A∩B| via binary incidence matrix matmul — O(docs² · vocab/64-ish),
    no Python pair loop. Buckets are expected to be O(10³) docs; the
    bucketing key (e.g. language, length band) is the scale lever.
    """
    vocab: dict[str, int] = {}
    rows, cols = [], []
    for r, toks in enumerate(token_lists):
        for t in set(toks):
            c = vocab.setdefault(t, len(vocab))
            rows.append(r)
            cols.append(c)
    n, v = len(token_lists), len(vocab)
    # float64: Jaccard at an exact threshold (e.g. 19/20 vs 0.95) must
    # round identically to the SQL oracle's DOUBLE arithmetic
    M = np.zeros((n, v), dtype=np.float64)
    M[rows, cols] = 1.0
    inter = M @ M.T
    sizes = M.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0, inter / union, 1.0)
    ii, jj = np.where(np.triu(jac >= threshold, k=1))
    a, b = doc_ids[ii], doc_ids[jj]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return a2, b2


# ---------------------------------------------------------------------------
# Exact dedup key.
# ---------------------------------------------------------------------------
def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))
