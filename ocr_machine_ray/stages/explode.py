"""Span explode / reassemble-local kernels (vectorized, Arrow-native).

The exploded per-span view is the engine's analog of the reference's
word-crop explosion (one document row -> many word-region rows,
``create_bbox_chunked.py:28-71``) and WORD projection
(``training_textract.py:72-78``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def explode_spans(batch: pa.Table) -> pa.Table:
    """Nested spans rows -> flat (doc_id, kind, text, media_ref, offset).

    Zero Python-per-row work: ListArray offsets drive a single np.repeat.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    doc_id = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), counts)
    cols = {
        "doc_id": pa.array(doc_id, type=pa.int64()),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    if "category" in batch.column_names:
        cat = batch["category"].to_numpy(zero_copy_only=False)
        cols["category"] = pa.array(np.repeat(cat, counts), type=pa.string())
    return pa.table(cols)


def filter_spans_nested(batch: pa.Table, keep_mask_fn) -> pa.Table:
    """Filter spans *inside* each row's list without exploding the dataset.

    ``keep_mask_fn(doc_ids, flat_struct) -> bool ndarray`` over the flattened
    span children. The list is rebuilt with re-densified lengths. This is the
    scale-right path: the whole document stays in one row, so removal +
    reassembly never shuffles (SURVEY.md §7.1 step 5-6, local variant).
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    doc_id = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), counts)
    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)

    keep = keep_mask_fn(doc_id, flat)
    kept_counts = np.bincount(row_idx[keep], minlength=len(batch))
    new_offsets = np.zeros(len(batch) + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=new_offsets[1:])

    kept = flat.filter(pa.array(keep))
    new_spans = pa.ListArray.from_arrays(pa.array(new_offsets), kept)
    out = {name: batch[name] for name in batch.column_names if name != "spans"}
    out["spans"] = new_spans
    return pa.table(out)


def redensify_nested(batch: pa.Table) -> pa.Table:
    """Rewrite each row's span offsets to a dense 0..n-1 sequence, preserving
    order — the order-restoring recombination (``textract_agent.py:153-179``)
    done locally because one row holds one whole document."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    total = int(counts.sum())
    dense = (
        np.arange(total, dtype=np.int32)
        - np.repeat(offsets[:-1].astype(np.int32), counts)
    )
    new_struct = pa.StructArray.from_arrays(
        [
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            pa.array(dense, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    out = {name: batch[name] for name in batch.column_names if name != "spans"}
    out["spans"] = pa.ListArray.from_arrays(spans.offsets, new_struct)
    return pa.table(out)
