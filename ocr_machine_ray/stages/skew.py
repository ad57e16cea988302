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


def salted_reassemble(flat_ds, n_salt: int = 4, bucket_bits: int = 6):
    """Two-phase order-restoring reassembly for skewed documents.

    Phase 1: group on a BUCKET of (doc_id, salt) cells (packed key
    ``doc_id * n_salt + salt`` shifted by ``bucket_bits``), lexsort the
    whole bucket once, and emit one packed list-row per (doc_id, salt)
    run — no phase-1 task ever SORTS more than
    ``2**bucket_bits / n_salt`` documents' worth of |doc| / n_salt span
    runs, which bounds the sort memory on hot keys, and the per-group
    pandas dispatch (~0.6-3 ms each, BASELINE.md) is paid once per
    bucket, not once per cell. Phase 2: group on a doc_id bucket,
    flatten the pre-sorted runs, and restore order across all the
    bucket's documents with one lexsort + segmented dense ord. Phase 2
    does hold whole documents at once, so for documents too large for
    any single task, cap first with :func:`cap_spans_per_row` and emit
    per-chunk sequences (chunked outputs reassemble by absolute offset
    downstream).
    """

    def pack_bucket(g: pd.DataFrame) -> pa.Table:
        doc = g["doc_id"].to_numpy().astype(np.int64)
        salt = g["salt"].to_numpy().astype(np.int64)
        off = g["offset"].to_numpy().astype(np.int64)
        order = np.lexsort((off, salt, doc))
        d, s, o = doc[order], salt[order], off[order]
        change = np.r_[True, (d[1:] != d[:-1]) | (s[1:] != s[:-1])]
        starts = np.flatnonzero(change)
        offsets = pa.array(
            np.r_[starts, len(d)].astype(np.int32)
        )

        def lst(col: str) -> pa.ListArray:
            vals = pa.array(g[col].to_numpy()[order], type=pa.string())
            return pa.ListArray.from_arrays(offsets, vals)

        return pa.table(
            {
                "doc_id": pa.array(d[starts], type=pa.int64()),
                "salt": pa.array(s[starts], type=pa.int64()),
                "kinds": lst("kind"),
                "texts": lst("text"),
                "media_refs": lst("media_ref"),
                "offsets": pa.ListArray.from_arrays(
                    offsets, pa.array(o, type=pa.int64())
                ),
            }
        )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "salt"], kind="mergesort")
        lens = np.fromiter(
            (len(x) for x in g["offsets"]), dtype=np.int64, count=len(g)
        )
        doc = np.repeat(g["doc_id"].to_numpy().astype(np.int64), lens)
        offs = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in g["offsets"]]
        )
        order = np.lexsort((offs, doc))
        d = doc[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.r_[starts, len(d)])
        ordv = np.arange(len(d), dtype=np.int64) - np.repeat(starts, counts)

        def flat(col: str) -> np.ndarray:
            return np.concatenate(
                [np.asarray(x, dtype=object) for x in g[col]]
            )[order]

        return pd.DataFrame(
            {
                "doc_id": d,
                "kind": flat("kinds"),
                "text": flat("texts"),
                "media_ref": flat("media_refs"),
                "ord": ordv,
            }
        )

    def salt_and_bucket(t: pa.Table) -> pa.Table:
        t = add_salt(t, n_salt)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = t["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_sb", pa.array((doc * n_salt + salt) >> bucket_bits)
        )

    salted = flat_ds.map_batches(
        salt_and_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    packed = salted.groupby("_sb").map_groups(
        pack_bucket, batch_format="pandas"
    )

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_db", pa.array(doc >> bucket_bits))

    return (
        packed.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(merge_bucket, batch_format="pandas")
    )


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
