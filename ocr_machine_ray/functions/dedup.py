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

# Universal-hash family for the k MinHash permutations: each shingle is
# md5-hashed ONCE to a uint64 base value h, then permutation i applies
# h_i = (A[i]*h + B[i]) mod 2^64 — a single vectorized numpy op instead of
# k salted md5 calls per shingle. A entries are odd and < 2^32 so the SQL
# oracle can evaluate the identical arithmetic in HUGEINT without overflow.
# Fixed literals (seeded rng(42)) so the SQL oracle embeds the same values.
MINHASH_A = (383329929, 3324115917, 2811363265, 1884968547,
             1859786277, 3687649987, 369133711, 2995172879)
MINHASH_B = (434316358506045562, 4499263958308476131, 3510137321738899740,
             3625081766230566352, 590819848579757124, 2077038532689293147,
             1710004064013894666, 4273949141441111211)
_MH_A = np.array(MINHASH_A, dtype=np.uint64)
_MH_B = np.array(MINHASH_B, dtype=np.uint64)


def word_shingles(tokens: list[str], n: int = SHINGLE_N) -> set[str]:
    """n-word shingles; a doc shorter than n yields its single joined text."""
    return {
        " ".join(tokens[i : i + n]) for i in range(max(1, len(tokens) - n + 1))
    }


def shingle_base_hash(s: str) -> int:
    """uint64 base hash of a shingle: first 8 md5 bytes, big-endian —
    identical to SQL ``('0x' || substr(md5(s), 1, 16))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def minhash_signature(shingles: set[str], k: int = MINHASH_SEEDS) -> list[int]:
    """k MinHash values: min over shingles of (A[i]*md5_64(s) + B[i]) mod
    2^64. Reference implementation kept for tests; the batch path below
    computes the same values vectorized."""
    bases = [shingle_base_hash(s) for s in shingles]
    return [
        min((MINHASH_A[i] * h + MINHASH_B[i]) % (1 << 64) for h in bases)
        for i in range(k)
    ]


def band_keys(sig: list[int]) -> list[str]:
    """Band key = md5 of the band's minhash values joined as decimal strings
    (matches SQL ``md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed))``)."""
    return [
        hashlib.md5(
            "|".join(
                str(v) for v in sig[b * BAND_SIZE : (b + 1) * BAND_SIZE]
            ).encode()
        ).hexdigest()
        for b in range(N_BANDS)
    ]


def _batch_doc_shingles(batch: pa.Table):
    """Distinct word shingles per doc, batch-vectorized.

    Returns ``(p_rows, p_sh, uniq_sh)``: distinct (row, shingle) incidence
    pairs (sorted by row) indexing into the batch-wide unique shingle list.
    Shingle strings are built with Arrow C kernels (three shifted slices of
    the flat token array joined element-wise); only deduplication and the
    short-doc fallback touch Python objects.
    """
    import pyarrow.compute as pc

    ft = FlatTokens(batch)
    rows = ft.row_idx
    n_docs = len(batch)
    total = len(rows)
    arr = ft.tokens_arrow
    sh_strings: list = []
    sh_rows_parts: list[np.ndarray] = []
    if total >= SHINGLE_N:
        win = total - SHINGLE_N + 1
        joined = pc.binary_join_element_wise(
            arr.slice(0, win), arr.slice(1, win), arr.slice(2, win), " "
        )
        valid = rows[: win] == rows[SHINGLE_N - 1 :]
        sh_strings.append(
            np.asarray(joined.to_numpy(zero_copy_only=False))[valid]
        )
        sh_rows_parts.append(rows[:win][valid])
    # docs shorter than SHINGLE_N yield their single joined text
    short = np.flatnonzero(ft.counts < SHINGLE_N)
    if len(short):
        toks = ft.tokens
        starts = np.concatenate(([0], np.cumsum(ft.counts)))
        sh_strings.append(
            np.array(
                [
                    " ".join(toks[starts[r] : starts[r + 1]])
                    for r in short
                ],
                dtype=object,
            )
        )
        sh_rows_parts.append(short.astype(np.int64))
    flat_sh = (
        np.concatenate([np.asarray(p, dtype=object) for p in sh_strings])
        if sh_strings
        else np.array([], dtype=object)
    )
    flat_rows = (
        np.concatenate(sh_rows_parts)
        if sh_rows_parts
        else np.array([], dtype=np.int64)
    )
    uniq_sh, inv = np.unique(flat_sh, return_inverse=True)
    # distinct (row, shingle) pairs, sorted by row then shingle id
    pair_key = flat_rows * max(1, len(uniq_sh)) + inv
    uniq_pairs = np.unique(pair_key)
    p_rows = uniq_pairs // max(1, len(uniq_sh))
    p_sh = uniq_pairs % max(1, len(uniq_sh))
    return p_rows, p_sh, uniq_sh, n_docs


def _signatures_from_pairs(
    p_rows: np.ndarray,
    p_sh: np.ndarray,
    uniq_sh: np.ndarray,
    n_docs: int,
    k: int = MINHASH_SEEDS,
) -> np.ndarray:
    """(n_docs, k) uint64 signature matrix from distinct (row, shingle)
    pairs: ONE md5 per unique shingle (digests decoded by a single
    np.frombuffer), k permutations as one vectorized multiply-add with
    native uint64 wraparound (== mod 2^64), per-doc minima via
    np.minimum.at — no Python per-(doc, shingle, seed) work.
    """
    n_uniq = len(uniq_sh)
    buf = bytearray(n_uniq * 8)
    mv = memoryview(buf)
    for u in range(n_uniq):
        mv[u * 8 : u * 8 + 8] = hashlib.md5(uniq_sh[u].encode()).digest()[:8]
    base = np.frombuffer(buf, dtype=">u8").astype(np.uint64)  # (n_uniq,)
    with np.errstate(over="ignore"):
        vals = base[:, None] * _MH_A[None, :k] + _MH_B[None, :k]  # mod 2^64
    sig = np.full((n_docs, k), np.iinfo(np.uint64).max, dtype=np.uint64)
    np.minimum.at(sig, p_rows, vals[p_sh])
    return sig


def _band_rows(batch: pa.Table, with_shingles: bool):
    """Shared core of the two band emitters: per-doc band keys (and
    optionally the distinct shingle list carried alongside for bucket-local
    verification). NULL-text docs are dropped — identical to the SQL
    oracle, where splitting NULL yields no shingles."""
    import pyarrow.compute as pc

    batch = batch.filter(pc.is_valid(batch["text"]))
    p_rows, p_sh, uniq_sh, n_docs = _batch_doc_shingles(batch)
    sig = _signatures_from_pairs(p_rows, p_sh, uniq_sh, n_docs)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    keys = [
        hashlib.md5(
            "|".join(
                str(int(v))
                for v in sig[r, b * BAND_SIZE : (b + 1) * BAND_SIZE]
            ).encode()
        ).hexdigest()
        for r in range(n_docs)
        for b in range(N_BANDS)
    ]
    out = {
        "doc_id": pa.array(
            np.repeat(doc_ids, N_BANDS).astype(np.int64), type=pa.int64()
        ),
        "band": pa.array(
            np.tile(np.arange(N_BANDS, dtype=np.int64), n_docs),
            type=pa.int64(),
        ),
        "band_key": pa.array(keys, type=pa.string()),
    }
    if with_shingles:
        starts = np.searchsorted(p_rows, np.arange(n_docs + 1))
        per_doc = [
            uniq_sh[p_sh[starts[r] : starts[r + 1]]].tolist()
            for r in range(n_docs)
        ]
        out["shingles"] = pa.array(
            [per_doc[r] for r in range(n_docs) for _ in range(N_BANDS)],
            type=pa.list_(pa.string()),
        )
    return pa.table(out)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """Per-doc LSH bucket keys: (doc_id, band, band_key). Downstream dedup is
    groupby((band, band_key)) — hash-partitioned, no all-pairs."""
    return _band_rows(batch, with_shingles=False)


def minhash_bands_shingles_batch(batch: pa.Table) -> pa.Table:
    """Band rows that CARRY each doc's distinct shingle set (list<string>)
    so candidate verification happens inside the bucket groupby — no
    driver-side shingle index, no second scan of documents. The ×N_BANDS
    duplication of shingle lists is the documented cost of keeping the
    verify stage a single shuffle."""
    return _band_rows(batch, with_shingles=True)


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
# Prefix filtering for the exact set-similarity self-join (AllPairs/PPJoin
# family): under ANY globally consistent total order of the token universe,
# two sets with Jaccard >= t must share a token within each other's first
# |A| - ceil(t*|A|) + 1 tokens. Emitting one row per PREFIX token (carrying
# the doc's distinct token set) and grouping by that token gives bounded
# buckets with exact output — no all-pairs over a coarse key like language.
# The order used is md5-of-token (pseudo-random, so natural-language hot
# tokens don't all rank first), tie-broken by the token string.
# ---------------------------------------------------------------------------
def prefix_rows_batch(
    batch: pa.Table, threshold: float, extra_key: str | None = None
) -> pa.Table:
    """(doc_id[, extra_key], ptok, tokens) rows — one per prefix token.

    ``ptok`` is the md5-prefixed token (hash hex + token, making the bucket
    key order-consistent and collision-safe); ``tokens`` is the doc's full
    distinct-token set carried for in-bucket verification.

    Shuffle-volume bound: each doc ships its token set once per prefix
    token, i.e. ((1-t)|d|+1) x |d| strings — ~0.9x corpus at t=0.95 on
    typical documents (measured), but quadratic in |d| for giant docs.
    Production levers, in order: (1) cap |d| upstream (the skew module's
    span cap exists for exactly this); (2) carry 8-byte token hashes
    instead of strings (10x smaller; trades value-exactness for a ~2^-60
    collision risk, so the oracle-gated build keeps strings); (3) switch
    to join-based verification (prefix rows without payloads -> candidate
    pairs -> hash-join token sets per side), which re-ships the corpus
    only twice but shuffles the unpruned candidate set — the right regime
    when near-dups are sparse and buckets stay small.
    """
    import pyarrow.compute as pc

    batch = batch.filter(pc.is_valid(batch["text"]))
    ft = FlatTokens(batch)
    n_docs = len(batch)
    toks = ft.tokens
    rows = ft.row_idx
    uniq_t, inv = np.unique(toks, return_inverse=True)
    # md5-64 per unique token (cached across batches)
    th = np.array([_token_hash64(t) for t in uniq_t], dtype=np.uint64)
    # global order: (hash, token) — rank is batch-local but the ORDER
    # relation is global, which is all the prefix theorem needs
    rank = np.empty(len(uniq_t), dtype=np.int64)
    rank[np.lexsort((uniq_t.astype(str), th))] = np.arange(len(uniq_t))
    # distinct (row, token) pairs
    key = rows * max(1, len(uniq_t)) + inv
    up = np.unique(key)
    pr = up // max(1, len(uniq_t))
    pt = up % max(1, len(uniq_t))
    order = np.lexsort((rank[pt], pr))
    pr, pt = pr[order], pt[order]
    starts = np.searchsorted(pr, np.arange(n_docs + 1))
    sizes = np.diff(starts)  # distinct tokens per doc
    prefix_len = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
    pos = np.arange(len(pr)) - starts[pr]
    keep = pos < prefix_len[pr]
    kp_rows, kp_toks = pr[keep], pt[keep]
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    token_lists = [
        uniq_t[pt[starts[r] : starts[r + 1]]].tolist() for r in range(n_docs)
    ]
    ptok = [
        format(int(th[t]), "016x") + str(uniq_t[t]) for t in kp_toks
    ]
    out = {
        "doc_id": pa.array(doc_ids[kp_rows].astype(np.int64), pa.int64()),
        "ptok": pa.array(ptok, type=pa.string()),
        "tokens": pa.array(
            [token_lists[r] for r in kp_rows], type=pa.list_(pa.string())
        ),
    }
    if extra_key is not None:
        out[extra_key] = batch[extra_key].take(
            pa.array(kp_rows, type=pa.int64())
        )
    return pa.table(out)


# Scale guard for LSH / prefix buckets: a pathological bucket (boilerplate
# cluster where thousands of docs share a band key or prefix token) would
# otherwise emit O(n^2) pairs. Above the cap the bucket degrades to
# STAR + CHAIN pairing (every member verified against the min-doc anchor,
# plus each consecutive pair in doc_id order) — a linear bound on both
# pairs emitted and verifications run. This is an APPROXIMATION: two
# members similar to each other but not to the anchor or to a doc_id
# neighbor lose their direct edge (homogeneous boilerplate buckets — the
# case that actually triggers the cap — keep their components via the
# anchor; adversarially mixed buckets may split). Exact below the cap;
# the default sits far above anything the correctness-gate corpora hit,
# so oracles compare the exact path. At 10^12 rows the first lever is
# more selective bucket keys (more LSH bits / longer prefixes), not a
# bigger cap.
BUCKET_CAP = 4096


def bucket_pairs(
    doc_ids: np.ndarray,
    member_sets: list[list[str]],
    threshold: float,
    cap: int = BUCKET_CAP,
) -> tuple[np.ndarray, np.ndarray]:
    """Verified similar pairs within one bucket (see BUCKET_CAP)."""
    order = np.argsort(doc_ids)
    doc_ids = doc_ids[order]
    member_sets = [member_sets[i] for i in order]
    if len(doc_ids) > cap:
        sets = [set(s) for s in member_sets]
        a_out, b_out = [], []
        anchor = sets[0]
        for i in range(1, len(sets)):
            if shingle_jaccard(anchor, sets[i]) >= threshold:
                a_out.append(doc_ids[0])
                b_out.append(doc_ids[i])
            if i >= 2 and shingle_jaccard(sets[i - 1], sets[i]) >= threshold:
                a_out.append(doc_ids[i - 1])
                b_out.append(doc_ids[i])
        return (
            np.asarray(a_out, dtype=doc_ids.dtype),
            np.asarray(b_out, dtype=doc_ids.dtype),
        )
    return jaccard_pairs_group(doc_ids, member_sets, threshold)


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


# ---------------------------------------------------------------------------
# Edit-distance (unit-cost Levenshtein) verification kernel.
# ---------------------------------------------------------------------------
def levenshtein_many(
    a_list: list[str], b_list: list[str]
) -> np.ndarray:
    """Unit-cost Levenshtein for P string pairs AT ONCE.

    All pairs' DP rows advance in lockstep: each of the max(len(a)) steps
    is a handful of numpy ops over a (P, maxB+1) matrix instead of a
    per-pair Python DP. The in-row insertion chain (dp[j] needs dp[j-1]
    of the SAME row) is closed without a scalar scan via the running-min
    identity dp[j] = min(dp*[j], j + min_{k<=j}(dp*[k] - k)), one
    ``np.minimum.accumulate`` per row.

    Operates on Unicode code points (utf-32 view), matching DuckDB's
    character-level ``levenshtein``.
    """
    P = len(a_list)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    A, B = int(la.max()), int(lb.max())
    a_pad = np.zeros((P, max(A, 1)), dtype=np.uint32)
    b_pad = np.full((P, max(B, 1)), 0xFFFFFFFF, dtype=np.uint32)
    for p, s in enumerate(a_list):
        if s:
            a_pad[p, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    for p, s in enumerate(b_list):
        if s:
            b_pad[p, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    cols = np.arange(B + 1, dtype=np.int64)
    dp = np.broadcast_to(cols, (P, B + 1)).copy()
    ans = lb.copy()  # answer for pairs with empty a
    rng = np.arange(P)
    for i in range(1, A + 1):
        cost = (a_pad[:, i - 1 : i] != b_pad[:, :B]).astype(np.int64)
        star = np.empty_like(dp)
        star[:, 0] = dp[:, 0] + 1
        star[:, 1:] = np.minimum(dp[:, :B] + cost, dp[:, 1:] + 1)
        run = np.minimum.accumulate(star - cols, axis=1)
        dp = np.minimum(star, run + cols)
        done = la == i
        if done.any():
            ans[done] = dp[rng[done], lb[done]]
    return ans
