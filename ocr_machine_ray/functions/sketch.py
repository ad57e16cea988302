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
