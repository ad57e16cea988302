"""Image perceptual-hash dedup: hash invariants, LSH recall guarantees,
and linear (never quadratic) pair emission."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa

from ocr_machine_ray.functions.images import (
    PHASH_BANDS,
    PHASH_MOTIFS,
    PHASH_THRESHOLD,
    ahash_stack,
    hamming64,
    pack_hash_bits,
    phash_motif_table,
    phash_variant_bits,
    render_thumb_stack,
)
from ocr_machine_ray.pipelines.queries_media import (
    _phash_band_rows,
    _phash_star_pairs,
)


def test_motif_codes_are_separated():
    """Extended-Hamming band codes: >=4 bits apart in EVERY band, so a
    <=2-bit variant edit can never collide with another motif's bucket."""
    M = phash_motif_table()
    for b in range(PHASH_BANDS):
        band = M[:, b * 8 : (b + 1) * 8]
        for i, j in itertools.combinations(range(PHASH_MOTIFS), 2):
            assert int(np.abs(band[i] - band[j]).sum()) >= 4
    # sane dark-block fractions (global-mean threshold must separate)
    pop = M.sum(axis=1)
    assert pop.min() >= 8 and pop.max() <= 56


def test_ahash_sees_through_noise():
    """The hash must equal the planted pattern for any render noise: rerun
    the render (fresh noise draw) and from shifted batch offsets."""
    ids = np.arange(0, 333, dtype=np.int64)
    want = phash_variant_bits(ids)
    got = ahash_stack(render_thumb_stack(ids))
    assert np.array_equal(got, want)
    # different batch boundary -> different noise seed, same hash
    got2 = ahash_stack(render_thumb_stack(ids[7:]))
    assert np.array_equal(got2, want[7:])


def test_variant_distances():
    ids = np.arange(0, 1024, dtype=np.int64)
    h, _ = pack_hash_bits(phash_variant_bits(ids))
    # intra-group: every doc within PHASH_THRESHOLD of its group min
    for m in range(PHASH_MOTIFS):
        grp = h[ids % PHASH_MOTIFS == m]
        d = hamming64(grp, np.full(len(grp), grp[0], dtype=np.int64))
        assert d.max() <= PHASH_THRESHOLD
    # inter-group: far beyond the verify threshold
    reps = h[:PHASH_MOTIFS]
    for i, j in itertools.combinations(range(PHASH_MOTIFS), 2):
        assert hamming64(reps[i : i + 1], reps[j : j + 1])[0] > 2 * PHASH_THRESHOLD


def test_star_pairs_linear_on_pathological_bucket():
    """A 100%-duplicate corpus (one giant bucket) emits O(n) pairs."""
    ids = np.arange(0, 4096, PHASH_MOTIFS, dtype=np.int64)  # all motif 0
    rows = _phash_band_rows(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    ).to_pandas()
    total_pairs = 0
    for _, g in rows.groupby("band_key"):
        out = _phash_star_pairs(g)
        total_pairs += len(out)
        assert len(out) < len(g)  # star, not clique
    # <= bands * docs rows in total, never O(n^2)
    assert total_pairs <= PHASH_BANDS * len(ids)


def test_every_doc_reaches_its_group_min():
    """Recall proof obligation: for every doc there is a band bucket whose
    min is the doc's group min and that verifies within threshold."""
    ids = np.arange(0, 512, dtype=np.int64)
    rows = _phash_band_rows(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    ).to_pandas()
    cand = {int(d): {int(d)} for d in ids}
    for _, g in rows.groupby("band_key"):
        out = _phash_star_pairs(g).to_pandas()
        for d, c in zip(out["doc_id"], out["cand"]):
            cand[int(d)].add(int(c))
    for d in ids:
        assert min(cand[int(d)]) == int(d) % PHASH_MOTIFS
