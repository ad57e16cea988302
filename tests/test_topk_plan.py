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
