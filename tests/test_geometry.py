"""Orientation enricher (M8): geometry-only derivation must recover the
corpus orientation rule, and the CV path must route both kernel branches."""

import numpy as np
import pyarrow as pa

from ocr_machine_ray import corpus
from ocr_machine_ray.functions.geometry import (
    derive_vertical,
    rule_and_derived_vertical,
    word_bboxes,
)
from ocr_machine_ray.stages.media import StrikeCV, render_word_regions_batch


def test_derivation_recovers_rule():
    docs = np.repeat(np.arange(40, dtype=np.int64), 25)
    idx1 = np.tile(np.arange(1, 26, dtype=np.int64), 40)
    rule_v, derived_v = rule_and_derived_vertical(docs, idx1)
    assert (rule_v == derived_v).all()
    # the rule marks doc_id % 5 == 2 vertical
    assert derived_v[docs == 2].all() and derived_v[docs == 7].all()
    assert not derived_v[docs == 1].any()


def test_bboxes_transpose():
    docs = np.array([2, 1], dtype=np.int64)
    idx1 = np.array([1, 1], dtype=np.int64)
    v = corpus.vertical_mask(docs)
    bb = word_bboxes(docs, idx1, v)
    assert bb[0, 3] > bb[0, 2]  # vertical: taller than wide
    assert bb[1, 2] > bb[1, 3]  # horizontal: wider than tall


def test_single_word_doc():
    docs = np.array([2], dtype=np.int64)
    idx1 = np.array([1], dtype=np.int64)
    bb = word_bboxes(docs, idx1, np.array([True]))
    assert derive_vertical(bb, np.zeros(1, dtype=np.int64), 1)[0]


def test_cv_routes_both_branches():
    # doc 2 is vertical, doc 1 horizontal; verdicts must equal the strike
    # rule on both (offset 0 -> token 1)
    rows = []
    for doc in (1, 2):
        for i in range(1, 12):
            off = (i - 1) + (i - 1) // corpus.MEDIA_EVERY
            rows.append((doc, off, f"w{i}"))
    batch = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "offset": pa.array([r[1] for r in rows], type=pa.int32()),
            "text": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    regions = render_word_regions_batch(batch)
    # vertical rows exist and carry transposed dimensions
    vert = regions["vertical"].to_numpy(zero_copy_only=False)
    assert vert.any() and not vert.all()
    w = regions["width"].to_numpy(zero_copy_only=False)
    assert (w[vert] != w[~vert]).all()
    out = StrikeCV()(regions)
    got = np.asarray(out["struck_cv"].to_pylist())
    want = regions["struck_truth"].to_numpy(zero_copy_only=False)
    assert (got == want).all()
