"""Hash-bucketed group-apply helpers.

`groupby(k).map_groups(fn)` dispatches the pandas UDF once PER GROUP
(~0.6-3 ms each — BASELINE.md). For group keys that are HASHES or
strings (sparse — a `key >> 8` prefix bucket would not merge anything),
these helpers group on `hash(key) % n_buckets` instead and re-split the
bucket into its per-key frames inside ONE dispatch: the per-key work is
unchanged, the dispatch is amortized over ~`target` keys, and frame
slicing costs ~50 us per key instead of a map_groups round-trip.

Used by the LSH/band pair-generation family, where the per-bucket kernel
(star-pairing, Jaccard verify) is genuinely per-bucket logic over object
payloads — bucketing the DISPATCH is the available lever there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_HASH_A = np.uint64(1099511628211)  # FNV-64 prime


def string_hash64(vals: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string array.

    NOT pandas' hash_array: its categorize=True path factorizes first,
    and pandas' string hashtable compares C strings — keys with embedded
    NUL bytes (the engine's packed band keys) collapse to their prefix,
    making the hash BATCH-ORDER-DEPENDENT (measured: equal bkeys split
    across buckets). This is a plain polynomial hash over the UCS-4 code
    points: fixed-width numpy unicode is zero-padded, pads contribute 0,
    so the value is width-independent and identical in every batch."""
    u = np.asarray(vals).astype("U")
    if len(u) == 0 or u.dtype.itemsize == 0:
        return np.zeros(len(u), dtype=np.uint64)
    w = u.dtype.itemsize // 4
    codes = np.ascontiguousarray(u).view(np.uint32).reshape(len(u), w)
    with np.errstate(over="ignore"):
        pows = np.empty(w, dtype=np.uint64)
        p = np.uint64(1)
        for i in range(w):
            pows[i] = p
            p = p * _HASH_A
        h = (codes.astype(np.uint64) * pows[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def add_hash_bucket(key_col: str, n_buckets: int, out: str = "_gb"):
    """map_batches fn: append `out` = string_hash64(key) % n_buckets —
    deterministic per key value, so every batch agrees."""

    def add(t: pa.Table) -> pa.Table:
        hb = (
            string_hash64(t[key_col].to_numpy(zero_copy_only=False))
            % np.uint64(max(1, n_buckets))
        ).astype(np.int64)
        return t.append_column(out, pa.array(hb))

    return add


def per_key_in_bucket(fn, key_col: str):
    """Wrap a per-GROUP pandas UDF into a per-BUCKET one: sort the bucket
    by the true key, slice each key's frame, apply `fn`, concat."""

    def combiner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        k = g[key_col].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        outs = [fn(g.iloc[s:e]) for s, e in zip(starts, ends)]
        if outs and isinstance(outs[0], pa.Table):
            # preserve the wrapped fn's block type: downstream unions /
            # aggregates assert homogeneous block types
            return pa.concat_tables(outs)
        return pd.concat(outs, ignore_index=True)

    return combiner
