"""Strikethrough verdict stages.

Two interchangeable implementations of the reference's per-word
strikethrough decision:

* `rule_verdict_*` — the closed-form synthetic rule (corpus.struck_mask),
  used by the driver-checked pipelines because the DuckDB oracle can
  replicate it exactly.
* `cv_verdict` (stages/strike_cv.py) — the real image-space CV kernel with
  the reference's geometric gates (``strikethrough_agent.py:96-127``),
  applied to synthetic word-region images DRAWN FROM the same rule; pytest
  asserts kernel(image) == rule for every region, closing the loop.

Token-index recovery: derivation gives text spans offset = (i-1)+(i-1)//10,
i.e. offset = 11q + r (r<10) for i-1 = 10q + r, so i = offset - offset//11 + 1.
Media spans sit at offset ≡ 10 (mod 11) and are never struck.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import MEDIA_EVERY, struck_mask


def token_index_from_offset(offset: np.ndarray) -> np.ndarray:
    """Invert the interleaving: span offset -> 1-based token index."""
    return offset - offset // (MEDIA_EVERY + 1) + 1


def rule_verdict_flat(batch: pa.Table) -> pa.Table:
    """Append bool ``struck`` to a flat span batch (media spans: False)."""
    off = batch["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    is_text = pc.equal(batch["kind"], "text").to_numpy(zero_copy_only=False)
    i = token_index_from_offset(off)
    struck = struck_mask(doc, i) & is_text
    return batch.append_column("struck", pa.array(struck))


def keep_mask_rule(doc_ids: np.ndarray, flat: pa.StructArray) -> np.ndarray:
    """keep-mask for explode.filter_spans_nested: drop struck text spans."""
    off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    kind = flat.field("kind").to_numpy(zero_copy_only=False)
    i = token_index_from_offset(off)
    struck = struck_mask(doc_ids, i) & (kind == "text")
    return ~struck
