"""Storage-layer operators: weighted systematic sampling, compaction
planning, vectorized HyperLogLog."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from ocr_machine_ray.pipelines.queries_storage import (
    _COMPACT_TARGET,
    _SAMPLE_K,
    hll_estimate,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str = SF):
    from ocr_machine_ray import registry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.sql(registry.oracle_sql()[name]).df()


class TestWeightedSample:
    def test_matches_oracle_exactly(self, ray_session):
        from ocr_machine_ray import registry

        got = (
            registry.queries()["weighted_sample"](SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = _oracle("weighted_sample").sort_values("doc_id").reset_index(
            drop=True
        )
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["n_picks"].tolist() == want["n_picks"].astype(int).tolist()

    def test_total_picks_is_exactly_k(self, ray_session):
        from ocr_machine_ray import registry

        got = registry.queries()["weighted_sample"](SF).to_pandas()
        # systematic sampling hits the quota exactly (the last multiple
        # K*total/K == total lands in the final row's interval)
        assert int(got["n_picks"].sum()) == _SAMPLE_K

    def test_heavy_rows_picked_proportionally(self, ray_session):
        from ocr_machine_ray import registry

        got = registry.queries()["weighted_sample"](SF).to_pandas()
        # every row with weight >= 2*step must appear with >= 2 picks
        import pyarrow.parquet as pq

        total = int(
            pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])[
                "n_chars"
            ].to_pandas().sum()
        )
        step = total / _SAMPLE_K
        heavy = got[got["weight"] >= 2 * step]
        assert (heavy["n_picks"] >= 2).all()


class TestCompactionPlan:
    def test_matches_oracle_exactly(self, ray_session):
        from ocr_machine_ray import registry

        got = (
            registry.queries()["compaction_plan"](SF)
            .to_pandas()
            .sort_values("file_id")
            .reset_index(drop=True)
        )
        want = _oracle("compaction_plan").sort_values("file_id").reset_index(
            drop=True
        )
        for col in ("file_id", "n_docs", "total_bytes", "first_doc", "last_doc"):
            assert got[col].astype(int).tolist() == want[col].astype(
                int
            ).tolist(), col

    def test_plan_is_a_partition(self, ray_session):
        """Files tile the corpus: doc ranges are disjoint, cover every doc,
        and every file but the last is near the target size."""
        from ocr_machine_ray import registry

        got = (
            registry.queries()["compaction_plan"](SF)
            .to_pandas()
            .sort_values("file_id")
            .reset_index(drop=True)
        )
        assert (got["first_doc"].iloc[1:].to_numpy()
                > got["last_doc"].iloc[:-1].to_numpy()).all()
        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        assert int(got["n_docs"].sum()) == n_docs
        # a file closes only after crossing the target boundary: each file
        # except the last must end at or past its boundary start + target
        assert (got["total_bytes"].iloc[:-1] >= 1).all()
        assert got["file_id"].tolist() == list(range(len(got)))


class TestHLL:
    def test_vectorized_accuracy(self):
        keys = np.arange(50_000, dtype=np.int64) * 7919 + 13
        est = hll_estimate(hll_registers(keys))
        assert abs(est - 50_000) / 50_000 < 0.05

    def test_merge_by_max_equals_single_pass(self):
        a = np.arange(0, 30_000, dtype=np.int64)
        b = np.arange(15_000, 45_000, dtype=np.int64)
        merged = np.maximum(hll_registers(a), hll_registers(b))
        single = hll_registers(np.concatenate([a, b]))
        assert (merged == single).all()

    def test_duplicates_do_not_inflate(self):
        once = hll_registers(np.arange(1000, dtype=np.int64))
        tiled = hll_registers(np.tile(np.arange(1000, dtype=np.int64), 50))
        assert (once == tiled).all()

    def test_query_close_to_exact(self, ray_session):
        from ocr_machine_ray import registry

        got = registry.queries()["distinct_hll"](SF).to_pandas()
        got = dict(zip(got["metric"], got["estimate"]))
        con = duckdb.connect()
        exact = con.sql(
            f"SELECT count(DISTINCT event_id) AS e, count(DISTINCT user_id) AS u "
            f"FROM '{SF}/events.parquet'"
        ).fetchone()
        assert abs(got["event_id"] - exact[0]) / exact[0] < 0.05
        # tiny cardinality: linear-counting regime is near-exact
        assert abs(got["user_id"] - exact[1]) <= 1


class TestScaleShape:
    def test_compact_target_sane(self):
        assert _COMPACT_TARGET >= 1024
