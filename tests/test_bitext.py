"""bitext_mine building blocks (the end-to-end mining is oracle-checked)."""

from __future__ import annotations

import numpy as np

from ocr_machine_ray.pipelines.queries_similarity import (
    _BITEXT_K,
    _normed,
    _topk_mean,
)


def test_topk_mean_matches_sorted_reference():
    rng = np.random.default_rng(7)
    S = rng.normal(size=(13, 9))
    got = _topk_mean(S, 4)
    want = np.sort(S, axis=1)[:, -4:].mean(axis=1)
    np.testing.assert_allclose(got, want)


def test_topk_mean_k_clipped_to_width():
    S = np.array([[3.0, 1.0], [2.0, 4.0]])
    np.testing.assert_allclose(_topk_mean(S, 10), S.mean(axis=1))
    np.testing.assert_allclose(_topk_mean(S, 2), S.mean(axis=1))


def test_margin_prefers_isolated_pair_over_hub():
    """A hub vector close to everything must not win a pair over a
    mutually-isolated true match — the point of the ratio margin."""
    rng = np.random.default_rng(3)
    base = _normed(rng.normal(size=(6, 16)))
    x_true = base[0]
    y_true = 0.95 * x_true + 0.05 * base[1]  # near-exact translation
    hub = _normed(base.sum(axis=0, keepdims=True))[0]  # close to all
    X = _normed(np.stack([x_true, base[2], base[3]]))
    Y = _normed(np.stack([y_true, hub, base[4], base[5]]))
    S = X @ Y.T
    ax = _topk_mean(S, _BITEXT_K)
    ay = _topk_mean(S.T, _BITEXT_K)
    M = S / ((ax[:, None] + ay[None, :]) / 2.0)
    assert int(np.argmax(M[0])) == 0  # x_true picks y_true, not the hub
    assert int(np.argmax(M[:, 0])) == 0  # and y_true picks x_true back


def test_above_cap_ivf_branch_end_to_end(ray_session, sf_small, monkeypatch):
    """Lowering the broadcast cap below the corpus size must route
    q_bitext_mine through the distributed IVF candidate branch, which
    must (a) run end-to-end, (b) produce structurally valid mutual-best
    pairs, and (c) recover most of the exact path's pairs (recall is
    bounded by IVF probe recall on this weakly-clustered synthetic
    space — measured 0.76 at nprobe=4 of k=8 cells; the assert leaves
    slack for numeric drift, and the seeded pipeline is deterministic)."""
    import ocr_machine_ray.pipelines.queries_similarity as qs

    exact = qs.q_bitext_mine(sf_small).to_pandas()
    monkeypatch.setattr(qs, "_BITEXT_BCAST_CAP", 100)
    approx = qs.q_bitext_mine(sf_small).to_pandas()

    assert (approx["src_id"].to_numpy() % 2 == 0).all()
    assert (approx["tgt_id"].to_numpy() % 2 == 1).all()
    # mutual best: each src and each tgt appears at most once
    assert approx["src_id"].is_unique
    assert approx["tgt_id"].is_unique

    E = set(map(tuple, exact[["src_id", "tgt_id"]].to_numpy()))
    A = set(map(tuple, approx[["src_id", "tgt_id"]].to_numpy()))
    assert len(E) > 0
    assert len(E & A) / len(E) >= 0.6
