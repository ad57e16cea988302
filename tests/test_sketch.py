"""Mergeable sketch tests: histogram quantiles (exact at bin_width=1,
bounded error otherwise) and HyperLogLog distinct counts."""

from __future__ import annotations

import numpy as np

from ocr_machine_ray.functions.sketch import HistogramSketch, HLLSketch


class TestHistogramSketch:
    def test_exact_at_binwidth_1(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1000, 10_000)
        sk = HistogramSketch(0, 1000).add(vals)
        for q in [0.05, 0.25, 0.5, 0.75, 0.95]:
            assert sk.quantile(q) == np.percentile(vals, q * 100), q

    def test_merge_equals_single_pass(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 500, 5000)
        b = rng.integers(0, 500, 5000)
        merged = HistogramSketch(0, 500).add(a).merge(
            HistogramSketch(0, 500).add(b)
        )
        single = HistogramSketch(0, 500).add(np.concatenate([a, b]))
        assert (merged.counts == single.counts).all()
        assert merged.quantile(0.5) == single.quantile(0.5)

    def test_bounded_error_with_wide_bins(self):
        rng = np.random.default_rng(2)
        vals = rng.integers(0, 10_000, 50_000)
        sk = HistogramSketch(0, 10_000, bin_width=100).add(vals)
        for q in [0.1, 0.5, 0.9]:
            exact = np.percentile(vals, q * 100)
            assert abs(sk.quantile(q) - exact) <= 100, q

    def test_roundtrip_arrays(self):
        sk = HistogramSketch(0, 100).add(np.array([1, 2, 3]))
        sk2 = HistogramSketch.from_arrays(*sk.to_arrays())
        assert (sk.counts == sk2.counts).all()


class TestHLL:
    def test_estimate_within_expected_error(self):
        true_n = 20_000
        sk = HLLSketch(p=12)
        sk.add(range(true_n))
        est = sk.estimate()
        # standard error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5%
        assert abs(est - true_n) / true_n < 0.05, est

    def test_merge_is_union(self):
        a = HLLSketch(p=10).add(range(0, 5000))
        b = HLLSketch(p=10).add(range(2500, 7500))
        a.merge(b)
        est = a.estimate()
        assert abs(est - 7500) / 7500 < 0.1, est

    def test_duplicates_do_not_inflate(self):
        sk = HLLSketch(p=10)
        sk.add([1, 2, 3] * 1000)
        assert sk.estimate() < 10
