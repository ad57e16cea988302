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


class TestMisraGries:
    def test_zipf_superset_guarantee(self):
        """Summing per-partition MG summaries keeps every token with global
        f > N/(cap+1) at strictly positive merged weight — the property
        heavy_hitters' pass 1 relies on."""
        from collections import Counter

        from ocr_machine_ray.functions.sketch import misra_gries_counts

        rng = np.random.default_rng(7)
        stream = rng.zipf(1.3, size=60_000)
        stream = stream[stream < 5000].astype(str)
        parts = np.array_split(stream, 37)
        cap = 64
        merged: Counter = Counter()
        for p in parts:
            vals, counts = np.unique(p, return_counts=True)
            v, w = misra_gries_counts(vals, counts.astype(np.int64), cap)
            assert len(v) <= cap
            for tok, wt in zip(v, w):
                merged[tok] += int(wt)
        true = Counter(stream.tolist())
        n_total = len(stream)
        for tok, f in true.items():
            if f * (cap + 1) > n_total:
                assert merged[tok] > 0, (tok, f)

    def test_all_equal_counts_collapse_to_empty(self):
        from ocr_machine_ray.functions.sketch import misra_gries_counts

        vals = np.array([str(i) for i in range(100)])
        counts = np.full(100, 5, dtype=np.int64)
        v, w = misra_gries_counts(vals, counts, 8)
        assert len(v) == 0  # uniform batch: nothing survives the decrement


class TestBloom:
    def test_no_false_negatives_and_low_fp(self):
        from ocr_machine_ray.functions.sketch import bloom_build, bloom_contains

        rng = np.random.default_rng(3)
        keys = rng.integers(0, 2**62, size=4000, dtype=np.int64)
        bits = bloom_build(keys, 17)
        assert bloom_contains(bits, keys, 17).all()
        probe = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
        fresh = probe[~np.isin(probe, keys)]
        fp = bloom_contains(bits, fresh, 17).mean()
        assert fp < 0.02, fp

    def test_or_merge_is_union(self):
        from ocr_machine_ray.functions.sketch import bloom_build, bloom_contains

        a = np.arange(0, 1000, dtype=np.int64)
        b = np.arange(1000, 2000, dtype=np.int64)
        bits = bloom_build(a, 17) | bloom_build(b, 17)
        assert bloom_contains(bits, np.concatenate([a, b]), 17).all()

    def test_empty_build_rejects_everything_cheaply(self):
        from ocr_machine_ray.functions.sketch import bloom_build, bloom_contains

        bits = bloom_build(np.array([], dtype=np.int64), 17)
        assert not bloom_contains(bits, np.arange(100, dtype=np.int64), 17).any()


class TestHeavyHittersPathological:
    def test_uniform_corpus_forced_rows_keep_total_exact(
        self, ray_session, tmp_path
    ):
        """A perfectly uniform corpus makes every batch's MG summary empty
        (all counts tie at the decrement threshold); the forced zero-weight
        row must still carry the batch token totals so n_total stays exact
        and the K-threshold verdict matches DuckDB."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.registry import queries, oracle_sql

        docs = pa.table(
            {
                "doc_id": pa.array(range(64), type=pa.int64()),
                "text": pa.array(
                    ["aa bb cc dd" for _ in range(64)], type=pa.string()
                ),
                "lang": pa.array(["en"] * 64),
                "source": pa.array(["s"] * 64),
                "n_chars": pa.array([11] * 64, type=pa.int64()),
            }
        )
        d = tmp_path / "uniform"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        out = queries()["heavy_hitters"](str(d))
        got = out.to_pandas() if hasattr(out, "to_pandas") else out
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = con.sql(oracle_sql()["heavy_hitters"]).df()
        assert sorted(got["tok"]) == sorted(want["tok"])
        assert sorted(got["n"]) == sorted(want["n"])


class TestCountMin:
    def test_never_underestimates_and_merge_is_sum(self):
        import numpy as np

        from ocr_machine_ray.functions.sketch import (
            cms_build,
            cms_estimate,
        )

        rng = np.random.default_rng(11)
        # zipf-ish weights over 5000 distinct keys
        keys = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(
            np.uint64
        )
        counts = (5000 / (np.arange(5000) + 1)).astype(np.int64) + 1
        m = cms_build(keys, counts)
        est = cms_estimate(m, keys)
        assert (est >= counts).all()
        # depth-min error bound: overestimate <= 2*N/width for the vast
        # majority; assert the mean overshoot is tiny relative to N
        n_total = counts.sum()
        assert (est - counts).mean() <= 2 * n_total / 4096
        # additive merge == build over the concatenation
        half = 2500
        m2 = cms_build(keys[:half], counts[:half]) + cms_build(
            keys[half:], counts[half:]
        )
        assert np.array_equal(m, m2)

    def test_query_recovers_exact_heavy_set(self, ray_session):
        import duckdb

        from ocr_machine_ray.registry import queries

        sf = "/root/testdata/sf0.001"
        got = queries()["heavy_hitters_cms"](sf).to_pandas()
        exact = duckdb.sql(
            "WITH toks AS (SELECT unnest(string_split_regex(trim(text), "
            "'\\s+')) AS tok FROM "
            f"read_parquet('{sf}/documents.parquet'))"
            "SELECT tok, count(*) AS n FROM toks GROUP BY tok "
            "ORDER BY n DESC, tok LIMIT 10"
        ).df()
        truth = dict(zip(exact["tok"], exact["n"]))
        reported = dict(zip(got["tok"], got["est"]))
        # the true top-10 all surface, and never under-counted
        for tok, n in truth.items():
            assert tok in reported
            assert reported[tok] >= n
            assert reported[tok] - n <= max(64, 0.02 * n + 64)
