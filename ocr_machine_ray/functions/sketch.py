"""Mergeable sketches for distributed aggregation (SURVEY.md A6 scale path:
"at 10^12 scale exact percentiles become an approximate-quantile
aggregate").

Both sketches follow the partial/combine pattern: one sketch per batch
inside ``map_batches``, merged in a tiny reduce — the only scalable shape
for quantiles/distinct-counts over 10^12 rows.

* `HistogramSketch` — fixed-bin counting sketch. With bin width 1 over an
  integer domain it is EXACT (used by the `doc_length_stats_sketch` query,
  which shares the exact SQL oracle); with wider bins it is the bounded-
  error approximate-quantile sketch (error <= bin_width/2).
* `HLLSketch` — HyperLogLog distinct counter (md5-based, dense 2^p
  registers), standard bias-corrected estimate; mergeable by register max.
"""

from __future__ import annotations

import hashlib

import numpy as np


class HistogramSketch:
    __slots__ = ("lo", "bin_width", "counts")

    def __init__(self, lo: int, hi: int, bin_width: int = 1):
        self.lo = lo
        self.bin_width = bin_width
        n_bins = (hi - lo) // bin_width + 1
        self.counts = np.zeros(n_bins, dtype=np.int64)

    def add(self, values: np.ndarray) -> "HistogramSketch":
        idx = ((values - self.lo) // self.bin_width).astype(np.int64)
        idx = idx.clip(0, len(self.counts) - 1)
        np.add.at(self.counts, idx, 1)
        return self

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        self.counts += other.counts
        return self

    def quantile(self, q: float) -> float:
        """Linear-interpolated quantile over reconstructed values — exact
        (matches numpy.percentile / DuckDB quantile_cont) when bin_width=1
        because every distinct value has its own bin."""
        total = int(self.counts.sum())
        if total == 0:
            return float("nan")
        # reconstruct the sorted multiset implicitly: target rank (0-based)
        rank = q * (total - 1)
        lo_rank = int(np.floor(rank))
        frac = rank - lo_rank
        cum = np.cumsum(self.counts)
        i = int(np.searchsorted(cum, lo_rank + 1))
        v_lo = self.lo + i * self.bin_width
        if frac == 0.0:
            return float(v_lo)
        j = int(np.searchsorted(cum, lo_rank + 2))
        v_hi = self.lo + j * self.bin_width
        return float(v_lo + (v_hi - v_lo) * frac)

    def to_arrays(self):
        return self.lo, self.bin_width, self.counts

    @classmethod
    def from_arrays(cls, lo, bin_width, counts):
        s = cls.__new__(cls)
        s.lo, s.bin_width = lo, bin_width
        s.counts = np.asarray(counts, dtype=np.int64).copy()
        return s


class HLLSketch:
    __slots__ = ("p", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.registers = np.zeros(1 << p, dtype=np.uint8)

    def add(self, values) -> "HLLSketch":
        for v in values:
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "little"
            )
            idx = h & ((1 << self.p) - 1)
            w = h >> self.p
            rho = (64 - self.p - w.bit_length()) + 1
            if rho > self.registers[idx]:
                self.registers[idx] = rho
        return self

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter summary (mergeable by plain addition).
#
# Per-batch: exact unique counts collapsed to <= cap surviving counters by
# subtracting the (cap+1)-th largest count from every counter (the batch
# form of the MG decrement). Guarantee per batch: c'_i >= c_i - N_b/(cap+1).
# Summed across batches via a tiny groupby, any token with global frequency
# f > N/(cap+1) keeps a positive merged weight — so with cap >= K the merged
# table is a SUPERSET of every token with f > N/K. A second exact counting
# pass restricted to these candidates makes the final answer exact (the
# classic two-pass heavy-hitters shape: nothing token-stream-sized is ever
# shuffled; pass 1 moves <= cap rows per block, pass 2 <= |candidates|).
# ---------------------------------------------------------------------------
def misra_gries_counts(
    vals: np.ndarray, counts: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Collapse exact (vals, counts) to <= cap MG counters."""
    if len(vals) <= cap:
        return vals, counts
    # subtract the smallest t making <= cap counters positive
    order = np.argsort(counts)
    t = counts[order[len(counts) - cap - 1]]
    keep = counts > t
    return vals[keep], counts[keep] - t


# ---------------------------------------------------------------------------
# Bloom filter over int64 keys (vectorized build + probe; mergeable by OR).
#
# Sideways information passing for joins: build on the (filtered) small
# side — one bitmap per block, OR-reduced — then prune the big side inside
# map_batches BEFORE the hash-join shuffle. False positives only, so a real
# join on the survivors stays exact; the bitmap is the only thing broadcast.
# Two multiplicative hashes (Knuth / splitmix-style odd constants); m must
# be a power of two.
# ---------------------------------------------------------------------------
_BLOOM_H1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_H2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray, log2_m: int) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.uint64)
    shift = np.uint64(64 - log2_m)
    return (k * _BLOOM_H1) >> shift, (k * _BLOOM_H2) >> shift


def bloom_build(keys: np.ndarray, log2_m: int) -> np.ndarray:
    """Bitmap (uint8[2**log2_m / 8]) with both hash positions of every key set."""
    bits = np.zeros((1 << log2_m) // 8, dtype=np.uint8)
    if len(keys):
        p1, p2 = _bloom_positions(keys, log2_m)
        pos = np.concatenate([p1, p2])
        np.bitwise_or.at(bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, keys: np.ndarray, log2_m: int) -> np.ndarray:
    """Vectorized membership probe; True may be a false positive, False is exact."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    p1, p2 = _bloom_positions(keys, log2_m)
    hit1 = bits[p1 >> np.uint64(3)] & (np.uint8(1) << (p1 & np.uint64(7)).astype(np.uint8))
    hit2 = bits[p2 >> np.uint64(3)] & (np.uint8(1) << (p2 & np.uint64(7)).astype(np.uint8))
    return (hit1 != 0) & (hit2 != 0)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable-by-ADDITION frequency sketch (Cormode &
# Muthukrishnan 2005). The additive merge is what HLL's max-merge is for
# distinct counts: every block reduces to one fixed-size matrix row, the
# combine is elementwise sum, and point estimates never UNDER-count
# (est >= true always; over-count <= e*N/width per row w.h.p., and the
# depth-min tightens it). Deterministic splitmix64 row hashes — no RNG,
# stable across runs and engines.
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 4096
_CMS_SALTS = (
    np.uint64(0x9E3779B97F4A7C15)
    * (np.arange(CMS_DEPTH, dtype=np.uint64) + np.uint64(1))
)


def _cms_mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _cms_cols(keys: np.ndarray, row: int) -> np.ndarray:
    return (
        _cms_mix64(np.asarray(keys, dtype=np.uint64) ^ _CMS_SALTS[row])
        % np.uint64(CMS_WIDTH)
    ).astype(np.int64)


def cms_build(keys: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(depth, width) int64 count-min matrix for weighted uint64 keys."""
    m = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    c = np.asarray(counts, dtype=np.int64)
    for r in range(CMS_DEPTH):
        np.add.at(m[r], _cms_cols(keys, r), c)
    return m


def cms_estimate(m: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Depth-min point estimates for uint64 keys against a merged matrix."""
    ests = np.stack(
        [m[r][_cms_cols(keys, r)] for r in range(CMS_DEPTH)], axis=0
    )
    return ests.min(axis=0)
