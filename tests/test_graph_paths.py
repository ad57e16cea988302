"""k-core: the gated driver peel and the BSP marker rounds must agree
exactly (same pattern as connected components' two paths)."""

from __future__ import annotations


class TestKcorePaths:
    def test_driver_and_bsp_paths_agree(
        self, ray_session, sf_small, monkeypatch
    ):
        from ocr_machine_ray.pipelines import queries_graph as qg

        fast = (
            qg.q_kcore_survivors(sf_small)
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        monkeypatch.setattr(qg, "KCORE_DRIVER_EDGE_CAP", 0)
        slow_res = qg.q_kcore_survivors(sf_small)
        slow = (
            slow_res.to_pandas()["doc_id"].sort_values().tolist()
        )
        assert len(fast) > 0  # the rule keeps a real core on this corpus
        assert fast == slow
