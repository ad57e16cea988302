"""Skew handling (SURVEY.md §4.2, north_rule: "partitioning / shuffle /
skew handled explicitly").

Three levers:

* ``cap_spans_per_row`` — the max_pages=3000 analog (run_textract.py:8-31):
  a giant document's span list is split into bounded chunks that flow as
  independent rows (doc_id, chunk_id) and reassemble exactly because spans
  carry absolute offsets.
* ``salted_reassemble`` — two-phase groupby for hot keys: first a
  groupby((doc_id, salt)) partial sort/merge, then a tiny groupby(doc_id)
  final merge; no single task ever holds more than |doc| / n_salt spans in
  phase one.
* ``repartition_by_bytes`` — split blocks so no task sees more than
  ``target_bytes`` of payload (media-heavy rows; byte-size, not row-count,
  is the cost model).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_SPAN_CAP = 3000  # the reference's max work-unit size (pages -> spans)


def cluster_cpus(default: int = 32) -> int:
    """Live cluster CPU count, for sizing repartition widths and fusion
    barriers (~1 block per core). Reads ray.cluster_resources() so a
    256-node deployment widens with the cluster instead of pinning to
    this sandbox's 32; falls back to ``default`` when Ray isn't
    initialized (pure-pandas unit tests, import time)."""
    try:
        import ray

        if ray.is_initialized():
            return max(8, int(ray.cluster_resources().get("CPU", 0)) or default)
    except Exception:
        pass
    return default


def cap_spans_per_row(batch: pa.Table, cap: int = DEFAULT_SPAN_CAP) -> pa.Table:
    """Split rows whose span list exceeds `cap` into chunked rows.

    Output adds ``chunk_id`` (0-based). Chunk boundaries preserve span
    order; downstream reassembly sorts by (doc_id, offset) so chunked and
    unchunked paths converge to identical sequences.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    n_chunks = np.maximum(1, -(-counts // cap))  # ceil-div
    total_out = int(n_chunks.sum())

    flat = spans.flatten()
    out_doc = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False), n_chunks
    )
    chunk_id = (
        np.arange(total_out, dtype=np.int64)
        - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    )
    # per-output-row child start/stop in the flat child array
    row_starts = np.repeat(offsets[:-1], n_chunks) + chunk_id * cap
    row_lens = np.minimum(
        cap, np.repeat(counts, n_chunks) - chunk_id * cap
    )
    new_offsets = np.zeros(total_out + 1, dtype=np.int64)
    np.cumsum(row_lens, out=new_offsets[1:])
    take_idx = (
        np.arange(int(row_lens.sum()), dtype=np.int64)
        - np.repeat(new_offsets[:-1], row_lens)
        + np.repeat(row_starts, row_lens)
    )
    new_flat = flat.take(pa.array(take_idx))
    new_spans = pa.ListArray.from_arrays(
        pa.array(new_offsets.astype(np.int32)), new_flat
    )
    cols = {
        "doc_id": pa.array(out_doc, type=pa.int64()),
        "chunk_id": pa.array(chunk_id, type=pa.int64()),
        "spans": new_spans,
    }
    # every other input column survives, replicated across the doc's chunks
    rep_idx = pa.array(
        np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
    )
    for name in batch.column_names:
        if name in ("doc_id", "spans"):
            continue
        col = batch[name]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        cols[name] = arr.take(rep_idx)
    return pa.table(cols)


def add_salt(batch: pa.Table, n_salt: int) -> pa.Table:
    """Salt exploded span rows by offset bucket for two-phase reassembly."""
    off = batch["offset"].to_numpy(zero_copy_only=False)
    salt = (off.astype(np.int64) // max(1, DEFAULT_SPAN_CAP // n_salt)) % n_salt
    return batch.append_column("salt", pa.array(salt, type=pa.int32()))


def salted_reassemble(flat_ds, n_salt: int = 4):
    """Two-phase order-restoring reassembly for skewed documents.

    Phase 1: groupby((doc_id, salt)) sorts each salt bucket locally and
    emits one packed row per (doc_id, salt) — no phase-1 task ever SORTS
    more than |doc| / n_salt spans, which bounds the quadratic-ish sort
    memory on hot keys. Phase 2: groupby(doc_id) concatenates the n_salt
    pre-sorted runs and merges them; it does hold one whole document's
    packed arrays at once, so for documents too large for any single task,
    cap first with :func:`cap_spans_per_row` and emit per-chunk sequences
    (chunked outputs reassemble by absolute offset downstream).
    """

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("offset", kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": [g["doc_id"].iloc[0]],
                "salt": [g["salt"].iloc[0]],
                "kinds": [list(g["kind"])],
                "texts": [list(g["text"])],
                "media_refs": [list(g["media_ref"])],
                "offsets": [list(g["offset"])],
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("salt")
        kinds = [k for ks in g["kinds"] for k in ks]
        texts = [t for ts in g["texts"] for t in ts]
        refs = [m for ms in g["media_refs"] for m in ms]
        offs = [o for os_ in g["offsets"] for o in os_]
        order = np.argsort(np.asarray(offs), kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].iloc[0],
                "kind": np.asarray(kinds, dtype=object)[order],
                "text": np.asarray(texts, dtype=object)[order],
                "media_ref": np.asarray(refs, dtype=object)[order],
                "ord": np.arange(len(order), dtype=np.int64),
            }
        )

    salted = flat_ds.map_batches(
        lambda t: add_salt(t, n_salt), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    packed = salted.groupby(["doc_id", "salt"]).map_groups(
        pack, batch_format="pandas"
    )
    return packed.groupby("doc_id").map_groups(merge, batch_format="pandas")


def estimate_row_bytes(batch: pa.Table) -> np.ndarray:
    """Per-row payload estimate (string/binary offsets difference +
    fixed-width field sizes) — the cost model for byte-size repartitioning."""
    n = len(batch)
    sizes = np.zeros(n, dtype=np.int64)
    for col in batch.columns:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
            lens = pa.compute.binary_length(arr).to_numpy(zero_copy_only=False)
            sizes += np.where(np.isnan(lens.astype(np.float64)), 0, lens).astype(
                np.int64
            )
        else:
            try:
                sizes += arr.type.bit_width // 8
            except (ValueError, AttributeError):
                # nested list/struct types raise ValueError from bit_width;
                # charge the column's buffer bytes evenly per row — a fair
                # estimate for the media/spans payloads this targets
                sizes += max(1, arr.nbytes // max(1, n))
    return sizes


def repartition_by_bytes(ds, target_bytes: int):
    """Bound the BYTES any downstream batch carries (per-row byte cost
    model, not row count — a handful of media-heavy rows must not ride in
    one giant unit of work).

    Semantics, precisely: the generator yields sub-tables cut at cumulative
    byte boundaries, so each batch handed to the NEXT fused stage is
    bounded by ~target_bytes (+ one row of slack; a single oversized row
    still forms its own cut). Ray's OUTPUT BLOCK sizing is a separate
    knob — the streaming executor re-bundles yielded tables up to
    ``DataContext.target_max_block_size``, so set that too when the goal
    is object-store block bounds rather than per-batch work bounds."""

    def split(batch: pa.Table):
        sizes = estimate_row_bytes(batch)
        if sizes.sum() <= target_bytes or len(batch) <= 1:
            yield batch
            return
        cum = np.cumsum(sizes)
        # bucket boundary whenever cumulative bytes cross a target multiple
        bucket = ((cum - 1) // max(1, target_bytes)).astype(np.int64)
        start = 0
        for b in np.unique(bucket):
            n = int((bucket == b).sum())
            yield batch.slice(start, n)
            start += n

    return ds.map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
