"""Flagship extraction pipeline (SURVEY.md §7.1 steps 2-6).

Reference semantics being rebuilt: classify pages -> route -> OCR blocks ->
strikethrough removal -> order-restoring reassembly
(``main.py:1-28``; recombination ``textract_agent.py:119-200``; removal
``strikethrough_agent.py:145-210``).

Ray-Data-first design: one row = one whole document (interleaved span
sequence), so removal and reassembly are LOCAL per-batch kernels — no
shuffle anywhere in the flagship path. The object store only ever carries
span text + media_refs; media payload bytes live in a side table
(SURVEY.md §7.3). A shuffle-based variant over the pre-exploded view
(`extract_flat_shuffled`) exists to cover the groupby(doc_id) reassembly
operator for inputs that arrive already exploded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..corpus import derive_spans_batch
from ..stages.explode import explode_spans, filter_spans_nested, redensify_nested
from ..stages.strike import keep_mask_rule, rule_verdict_flat

DOC_COLUMNS = ["doc_id", "text"]


def parquet_num_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — free (no scan). Used to
    short-circuit pipelines on 0-row shards: Ray 2.49's native join /
    multi-stage shuffle paths raise on fully-empty inputs, and a 100 TB
    run WILL contain empty partitions."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def read_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read of the documents table.

    Engine contract: when ``text`` is read, NULL-text rows are dropped at
    the scan (pushed-down predicate) — text pipelines treat textless docs
    as absent, matching the SQL oracles (unnest drops them; the non-unnest
    oracles carry an explicit ``WHERE text IS NOT NULL``)."""
    import pyarrow.compute as pc

    cols = columns or DOC_COLUMNS
    kwargs = {"columns": cols}
    if "text" in cols:
        kwargs["filter"] = pc.field("text").is_valid()
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", **kwargs)


def spans_corpus(sf_dir: str, n_blocks: int | None = None) -> ray.data.Dataset:
    """The interleaved spans corpus (F1 schema) as a lazy Dataset.

    ``n_blocks``: repartition the (small, single-file) documents read before
    deriving. A one-file read yields only a handful of blocks, which caps
    task parallelism for any compute-heavy downstream stage (image render /
    CV / model scoring) — pass e.g. 64 there. Light pipelines skip it: the
    repartition barrier costs more than it buys."""
    docs = read_documents(sf_dir)
    if n_blocks:
        docs = docs.repartition(n_blocks)
    return docs.map_batches(
        derive_spans_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _strike_and_reassemble(batch: pa.Table) -> pa.Table:
    """Local removal + re-densify: one fused kernel, zero shuffle."""
    kept = filter_spans_nested(batch, keep_mask_rule)
    return redensify_nested(kept)


def _to_flat_output(batch: pa.Table) -> pa.Table:
    flat = explode_spans(batch)
    return pa.table(
        {
            "doc_id": flat["doc_id"],
            "kind": flat["kind"],
            "text": flat["text"],
            "media_ref": flat["media_ref"],
            "ord": flat["offset"].cast(pa.int64()),
        }
    )


def extract(sf_dir: str) -> ray.data.Dataset:
    """Flagship: documents -> spans -> strike-filter -> reassembled flat spans.

    Output schema: (doc_id:int64, kind, text, media_ref, ord:int64) — the
    per-row span-sequence invariant (kind, text, media_ref, order).
    """
    return (
        spans_corpus(sf_dir)
        .map_batches(_strike_and_reassemble, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(_to_flat_output, batch_format="pyarrow",
                     zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# Shuffle variant: reassembly as a real groupby for pre-exploded inputs
# (covers operator M15's wide form; SURVEY.md §2.2 M15, §7.2). The groupby
# key is the doc BUCKET (doc_id >> 8), not doc_id: map_groups dispatches
# the UDF once PER GROUP (~0.6-3 ms of pandas overhead each, BASELINE.md),
# so a bucket of ~256 whole documents amortizes that across one vectorized
# lexsort + segmented dense-ord kernel. Bucketing on a doc_id prefix keeps
# the groupby contract intact — every span of a document lands in exactly
# one group.
# ---------------------------------------------------------------------------
_REASSEMBLE_BUCKET_BITS = 8


def _reassemble_bucket(group: pd.DataFrame) -> pd.DataFrame:
    doc = group["doc_id"].to_numpy().astype(np.int64)
    off = group["offset"].to_numpy().astype(np.int64)
    order = np.lexsort((off, doc))
    d = doc[order]
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    counts = np.diff(np.r_[starts, len(d)])
    ordv = np.arange(len(d), dtype=np.int64) - np.repeat(starts, counts)
    return pd.DataFrame(
        {
            "doc_id": d,
            "kind": group["kind"].to_numpy()[order],
            "text": group["text"].to_numpy()[order],
            "media_ref": group["media_ref"].to_numpy()[order],
            "ord": ordv,
        }
    )


def extract_flat_shuffled(sf_dir: str) -> ray.data.Dataset:
    """Same result as `extract`, via explode -> verdict -> filter ->
    doc-bucketed groupby reassembly (an all-to-all shuffle).

    Kept for inputs that arrive as flat span streams; the nested local path
    is the default because it moves ~0 bytes between nodes for this step.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        keep = pa.compute.invert(t["struck"].combine_chunks())
        t = t.filter(keep).drop_columns(["struck"])
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_db", pa.array(doc >> _REASSEMBLE_BUCKET_BITS)
        )

    flat = (
        spans_corpus(sf_dir)
        .map_batches(explode_spans, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(rule_verdict_flat, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow")
    )
    sch = flat.schema()  # None on a fully-empty stream
    if sch is not None and "category" in sch.names:
        flat = flat.drop_columns(["category"])
    return flat.groupby("_db").map_groups(
        _reassemble_bucket, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Image-driven variant: the full reference pipeline shape — word-region
# images rendered, strikethrough decided by the CV KERNEL from pixels (not
# the rule), then removal + order-restoring reassembly. Must produce
# byte-identical output to `extract` because the images are drawn from the
# same rules the kernel recovers (tested in tests/test_extraction_cv.py).
# ---------------------------------------------------------------------------
def extract_via_cv(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.explode import explode_spans
    from ..stages.media import StrikeCV, render_word_regions_batch

    def verdict_and_filter(batch: pa.Table) -> pa.Table:
        """Render word images -> CV verdict -> drop struck text spans.
        Media spans pass through untouched."""
        is_text = pc.equal(batch["kind"], "text")
        words = batch.filter(is_text)
        media = batch.filter(pc.invert(is_text.combine_chunks()))
        if len(words):
            regions = render_word_regions_batch(words)
            cv = StrikeCV()(regions)
            keep = pc.invert(cv["struck_cv"].combine_chunks())
            words = words.filter(keep)
        cols = ["doc_id", "kind", "text", "media_ref", "offset"]
        return pa.concat_tables([words.select(cols), media.select(cols)])

    def reassemble_local(batch: pa.Table) -> pa.Table:
        """Order restoration over a batch known to hold whole documents:
        one stable lexsort by (doc_id, offset) and a per-doc dense ord."""
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        off = batch["offset"].to_numpy(zero_copy_only=False)
        order = np.lexsort((off, doc))
        t = batch.take(pa.array(order))
        d = doc[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.r_[starts, len(d)])
        ordv = np.arange(len(d), dtype=np.int64) - np.repeat(starts, counts)
        return t.select(["doc_id", "kind", "text", "media_ref"]).append_column(
            "ord", pa.array(ordv)
        )

    def cv_extract_batch(batch: pa.Table) -> pa.Table:
        """explode -> CV verdict -> shuffle-free reassembly, composed at the
        PYTHON level over the nested one-row-per-document representation.

        Composing (rather than chaining three map_batches) is what makes
        the batch-local reassembly safe: the input batch has one ROW per
        document, so any batch/block split Ray performs falls on a document
        boundary by construction; exploded spans then never leave this
        function un-reassembled. Chained maps would instead rely on Ray
        never splitting a fused task's intermediate output mid-document
        (dynamic block splitting at target_max_block_size makes that
        assumption false for large blocks). The wide groupby(doc_id)
        reassembly stays covered by extract_flat_shuffled."""
        return reassemble_local(verdict_and_filter(explode_spans(batch)))

    # batch_size=None: one batch per block. A row-count batch_size here
    # counts the FUSED operator's input rows (documents), so Ray bundles
    # many blocks into few tasks and parallelism collapses (observed: 64
    # blocks -> 3 tasks at batch_size=2048). Granularity is controlled by
    # the n_blocks repartition inside spans_corpus instead.
    return spans_corpus(sf_dir, n_blocks=64).map_batches(
        cv_extract_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
