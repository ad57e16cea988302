"""Checkpoint/resume/lineage tests: idempotent partitioned output, resume
skips done partitions, lineage records are complete."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from ocr_machine_ray.state import checkpoint as cp


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _run(sf_small, out_dir, run_id="r0"):
    from ocr_machine_ray.pipelines.extraction import extract

    return cp.run_resumable(
        extract(sf_small), out_dir, n_parts=8, stage="extract", run_id=run_id
    )


class TestCheckpoint:
    def test_first_run_writes_all_partitions(self, ray_session, sf_small, out_dir):
        lineage = _run(sf_small, out_dir)
        assert len(lineage) == 8
        assert cp.done_partitions(out_dir) == set(range(8))
        for rec in lineage:
            assert rec["n_rows"] > 0
            assert rec["stage"] == "extract"
            assert rec["doc_min"] is not None
            assert rec["wall_ms"] >= 0

    def test_rerun_is_noop(self, ray_session, sf_small, out_dir):
        _run(sf_small, out_dir)
        again = _run(sf_small, out_dir, run_id="r1")
        assert again == []  # nothing recomputed, no duplicate rows

    def test_resume_recomputes_only_missing(self, ray_session, sf_small, out_dir):
        first = _run(sf_small, out_dir)
        # simulate a crash that lost two partitions
        for pid in (2, 5):
            os.remove(os.path.join(out_dir, "_manifest", f"{pid}.json"))
            shutil.rmtree(os.path.join(out_dir, f"part={pid}"))
        resumed = _run(sf_small, out_dir, run_id="r1")
        assert sorted(r["partition_id"] for r in resumed) == [2, 5]
        assert all(r["run_id"] == "r1" for r in resumed)
        # untouched partitions still carry the first run's id
        manifests = {m["partition_id"]: m for m in cp.read_manifests(out_dir)}
        assert manifests[0]["run_id"] == "r0"
        # content equals a fresh full run
        full = (
            cp.read_output(out_dir)
            .to_pandas()
            .sort_values(["doc_id", "ord"])
            .reset_index(drop=True)
        )
        from ocr_machine_ray.pipelines.extraction import extract

        direct = (
            extract(sf_small)
            .to_pandas()
            .sort_values(["doc_id", "ord"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            full[direct.columns], direct, check_dtype=False
        )
        # row counts recorded in first-run lineage match the recomputed ones
        first_by_pid = {r["partition_id"]: r["n_rows"] for r in first}
        for r in resumed:
            assert r["n_rows"] == first_by_pid[r["partition_id"]]

    def test_partition_assignment_deterministic(self):
        import numpy as np

        ids = np.arange(100, dtype=np.int64)
        a = cp.partition_id(ids, 8)
        b = cp.partition_id(ids, 8)
        assert (a == b).all()
        assert set(a) == set(range(8))


class TestSourcePruning:
    def test_pending_docs_filter_skips_done(self, ray_session, sf_small, out_dir):
        import pyarrow.parquet as pq

        _run(sf_small, out_dir)
        # all partitions done -> the source filter drops every doc
        fn = cp.pending_docs_filter(out_dir, n_parts=8)
        batch = pq.read_table(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        assert len(fn(batch)) == 0
        # remove one manifest -> only that partition's docs survive
        os.remove(os.path.join(out_dir, "_manifest", "3.json"))
        fn2 = cp.pending_docs_filter(out_dir, n_parts=8)
        kept = fn2(batch)
        assert len(kept) > 0
        assert (kept["doc_id"].to_numpy(zero_copy_only=False) % 8 == 3).all()

    def test_mismatched_params_refused(self, ray_session, sf_small, out_dir):
        _run(sf_small, out_dir)
        from ocr_machine_ray.pipelines.extraction import extract

        with pytest.raises(ValueError, match="refusing to resume"):
            cp.run_resumable(
                extract(sf_small), out_dir, n_parts=16, stage="extract"
            )
        with pytest.raises(ValueError, match="refusing to resume"):
            cp.run_resumable(
                extract(sf_small), out_dir, n_parts=8, stage="other"
            )
