"""LIMIT-k queries must not global-sort the whole table: a per-block
partial top-k map_batches stage feeds the final (tiny) Sort. Pinned by plan
inspection (VERDICT r2 action 2)."""

from __future__ import annotations


def _stats_for(ds) -> str:
    return ds.materialize().stats()


class TestPartialTopK:
    def test_top_orders_plan_and_values(self, ray_session, sf_small):
        import duckdb

        from ocr_machine_ray.pipelines.queries_relational import q_top_orders

        ds = q_top_orders(sf_small)
        stats = _stats_for(ds)
        # the partial stage must precede the Sort in the executed plan
        assert "partial_top" in stats
        assert stats.index("partial_top") < stats.index("Sort")
        got = (
            ds.to_pandas()
            .sort_values(
                ["totalprice_cents", "o_orderkey"], ascending=[False, True]
            )
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            f"""
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT)
                       AS totalprice_cents
            FROM read_parquet('{sf_small}/orders.parquet')
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
            """
        ).df()
        assert (got["o_orderkey"].to_numpy()
                == want["o_orderkey"].to_numpy()).all()
        assert (got["totalprice_cents"].to_numpy()
                == want["totalprice_cents"].to_numpy()).all()

    def test_top_bigrams_plan(self, ray_session, sf_small):
        from ocr_machine_ray.pipelines.queries_text import q_top_bigrams

        ds = q_top_bigrams(sf_small)
        stats = _stats_for(ds)
        assert "block_top" in stats
        assert stats.index("block_top") < stats.rindex("Sort")
        assert ds.count() <= 20


class TestSkyline:
    def test_pareto_mask_matches_bruteforce_with_ties(self):
        import numpy as np

        from ocr_machine_ray.pipelines.queries_relational import pareto_mask

        rng = np.random.default_rng(3)
        # small value range forces many ties on both axes
        a = rng.integers(0, 12, 300).astype(np.int64)
        b = rng.integers(0, 12, 300).astype(np.int64)

        def brute(a, b):
            n = len(a)
            out = np.ones(n, dtype=bool)
            for i in range(n):
                for j in range(n):
                    if (
                        a[j] >= a[i] and b[j] >= b[i]
                        and (a[j] > a[i] or b[j] > b[i])
                    ):
                        out[i] = False
                        break
            return out

        assert np.array_equal(pareto_mask(a, b), brute(a, b))

    def test_local_prune_is_lossless(self):
        """Points dominated inside any subset are dominated globally, so
        block-local skyline + merge == direct skyline on the union."""
        import numpy as np

        from ocr_machine_ray.pipelines.queries_relational import pareto_mask

        rng = np.random.default_rng(4)
        a = rng.integers(0, 1000, 500).astype(np.int64)
        b = (1000 - a) + rng.integers(-50, 50, 500)  # anti-correlated
        direct = {(x, y) for x, y in zip(a[pareto_mask(a, b)],
                                         b[pareto_mask(a, b)])}
        merged_a, merged_b = [], []
        for lo in range(0, 500, 77):  # uneven blocks
            sa, sb = a[lo:lo + 77], b[lo:lo + 77]
            m = pareto_mask(sa, sb)
            merged_a.extend(sa[m])
            merged_b.extend(sb[m])
        ma = np.array(merged_a, dtype=np.int64)
        mb = np.array(merged_b, dtype=np.int64)
        final = {(x, y) for x, y in zip(ma[pareto_mask(ma, mb)],
                                        mb[pareto_mask(ma, mb)])}
        assert final == direct
