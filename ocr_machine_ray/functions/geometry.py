"""Word-region geometry + page-orientation derivation (M8).

Rebuilds the reference's orientation analysis from scratch: the reference
computes ``PageOrientationBasedOnWords`` per page from Textract word
polygons (``textract_agent.py:107-110``) and routes the strikethrough CV
kernel's horizontal/vertical branch from it
(``strikethrough_agent.py:168-171``). Here the synthetic corpus lays word
bboxes out horizontally or vertically per the corpus rule, and
``derive_vertical`` recovers the orientation from the GEOMETRY alone
(tall-vs-wide box majority) — the closed loop the oracle checks.
"""

from __future__ import annotations

import numpy as np

from ..corpus import vertical_mask
from .images import _mix64

# normalized layout constants: a horizontal page packs words left-to-right
# in rows of 10; a vertical page packs top-to-bottom in columns of 10.
_PER_LINE = 10
_WORD_LONG = 0.075   # extent along the text direction
_WORD_SHORT = 0.03   # extent across the text direction
_STEP_LONG = 0.095
_STEP_SHORT = 0.045


def word_bboxes(
    doc_ids: np.ndarray, idx1: np.ndarray, vertical: np.ndarray
) -> np.ndarray:
    """(n, 4) normalized (left, top, width, height) word boxes.

    Deterministic per (doc_id, token index); jitter from splitmix64 so the
    derivation can't cheat on exact constants."""
    j = (idx1 - 1).astype(np.int64)
    along = j % _PER_LINE
    across = j // _PER_LINE
    base = _mix64(
        doc_ids.astype(np.uint64) * np.uint64(0x9E3779B1)
        ^ j.astype(np.uint64)
    )
    jit_a = ((base % 64) / 64.0) * 0.01
    jit_b = (((base >> np.uint64(6)) % 64) / 64.0) * 0.004
    pos_along = 0.02 + along * _STEP_LONG + jit_a
    pos_across = (0.02 + across * _STEP_SHORT + jit_b) % 0.95
    long_ext = _WORD_LONG + jit_a
    short_ext = _WORD_SHORT + jit_b
    out = np.empty((len(j), 4), dtype=np.float64)
    h = ~vertical
    out[h, 0] = pos_along[h]
    out[h, 1] = pos_across[h]
    out[h, 2] = long_ext[h]
    out[h, 3] = short_ext[h]
    v = vertical
    out[v, 0] = pos_across[v]
    out[v, 1] = pos_along[v]
    out[v, 2] = short_ext[v]
    out[v, 3] = long_ext[v]
    return out


def tall_counts(
    bboxes: np.ndarray, group_idx: np.ndarray, n_groups: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group (tall_count, total_count) partials — the mergeable
    aggregate behind orientation derivation (sum across batches, then
    majority-vote)."""
    tall = bboxes[:, 3] > bboxes[:, 2]
    tall_cnt = np.bincount(group_idx, weights=tall, minlength=n_groups)
    total = np.bincount(group_idx, minlength=n_groups)
    return tall_cnt.astype(np.int64), total.astype(np.int64)


def derive_vertical(
    bboxes: np.ndarray, group_idx: np.ndarray, n_groups: int
) -> np.ndarray:
    """Per-group orientation from geometry: vertical iff a majority of the
    group's word boxes are taller than wide."""
    tall_cnt, total = tall_counts(bboxes, group_idx, n_groups)
    return tall_cnt * 2 > total


def rule_and_derived_vertical(doc_ids: np.ndarray, idx1: np.ndarray):
    """(rule_vertical, derived_vertical) per row for a flat word batch whose
    docs are fully contained in the batch (the reference derives per page
    locally the same way). The GEOMETRY is drawn with the rule; the
    returned derived flags come only from that geometry."""
    rule_v = vertical_mask(doc_ids)
    bboxes = word_bboxes(doc_ids, idx1, rule_v)
    uniq, inv = np.unique(doc_ids, return_inverse=True)
    derived = derive_vertical(bboxes, inv, len(uniq))
    return rule_v, derived[inv]
