"""Reference end-state sinks (main.py steps 4.3-8, planned-only in the
reference): media-span summarization over the whited-out document, and the
vector-table export the weaviate JSONs would feed.

- ``media_summarize_spans``: the whiteout pipeline (strike removal) with
  every media span replaced by a deterministic summary TEXT span derived
  from decoded pixels (reference steps 3-5 + the step-7 "complete text
  document with summaries" shape; main.py:8-19). The GPT summarizer is
  stood in by the grid/blob classification kernels so the loop
  pixels -> verdict -> summary is real and the oracle mirrors it.
- ``embeddings_export``: step 8's vector-store export as a partitioned
  parquet sink with per-partition manifests (resumable: a partition is
  done iff its manifest exists — same contract as state/checkpoint.py).
  The returned verification table is computed by READING BACK the written
  files, so the oracle value-checks the sink's actual roundtrip, not the
  in-memory stream.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus import SQL_ALL_SPANS, SQL_CATEGORY
from ..functions.images import MEDIA_H, MEDIA_W
from ..registry import query

# ---------------------------------------------------------------------------
# Media-span summarization (steps 4.3 + 5 + 7).
# ---------------------------------------------------------------------------
_SUMMARIZE_SQL = f"""
{SQL_ALL_SPANS}, {SQL_CATEGORY}
SELECT s.doc_id, CAST(s.off AS BIGINT) AS off,
       CASE WHEN s.kind = 'text' THEN s.text
            ELSE '[' || CASE WHEN c.category = 'tables' THEN 'table'
                             WHEN c.category = 'diagrams' THEN 'diagram'
                             ELSE 'figure' END
                 || ' @' || s.off || ' {MEDIA_W}x{MEDIA_H}]'
       END AS text
FROM all_spans s JOIN doc_category c ON c.doc_id = s.doc_id
WHERE s.kind = 'media' OR NOT s.struck
"""


@query("media_summarize_spans", _SUMMARIZE_SQL)
def q_media_summarize_spans(sf_dir: str):
    import pyarrow.compute as pc

    from ..stages.explode import explode_spans
    from ..stages.media import MediaSummarizer, synth_media_batch
    from ..stages.strike import rule_verdict_flat
    from .extraction import spans_corpus

    flat = (
        spans_corpus(sf_dir, n_blocks=64)
        .map_batches(explode_spans, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(rule_verdict_flat, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(
            lambda t: t.filter(
                pa.compute.invert(t["struck"].combine_chunks())
            ).drop_columns(["struck"]),
            batch_format="pyarrow",
        )
    )

    def text_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "text"))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "off": t["offset"].cast(pa.int64()),
                "text": t["text"],
            }
        )

    def media_payloads(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "media"))
        out = synth_media_batch(t)
        # synth keeps row order: the absolute offset rides along for the
        # summarizer's span splice
        return out.append_column("off", t["offset"].cast(pa.int64()))

    texts = flat.map_batches(text_rows, batch_format="pyarrow")
    summaries = (
        flat.map_batches(media_payloads, batch_format="pyarrow")
        .repartition(16)  # barrier: keep the actor pool out of the fused
        # upstream chain (fusion collapse, BASELINE.md)
        .map_batches(
            MediaSummarizer,
            batch_format="pyarrow",
            batch_size=512,
            concurrency=(1, 4),
        )
    )
    return texts.union(summaries)


# ---------------------------------------------------------------------------
# Document outline (step 6: "generate outline of document", planned-only
# in the reference — stood in by a deterministic structural outline).
# Sections are the text runs delimited by media spans in the interleaved
# sequence; the outline is each section's FIRST token in order. Computed
# batch-locally over the nested one-doc-per-row layout (the flagship's
# zero-shuffle locality): section ids are a per-doc cumulative media
# count, section heads are first-occurrence flags — no groupby anywhere.
# ---------------------------------------------------------------------------
_OUTLINE_SQL = f"""
{SQL_ALL_SPANS},
sec AS (
  SELECT doc_id, off, text, kind,
         sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY off) AS s
  FROM all_spans
),
firsts AS (
  SELECT doc_id, s, arg_min(text, off) AS head
  FROM sec WHERE kind = 'text' GROUP BY doc_id, s
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sections,
       string_agg(head, ' > ' ORDER BY s) AS outline
FROM firsts GROUP BY doc_id
"""


@query("doc_outline", _OUTLINE_SQL)
def q_doc_outline(sf_dir: str):
    from .extraction import spans_corpus

    def outline_batch(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
        n_rows = len(batch)
        row = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        is_media = np.asarray(
            pa.compute.equal(flat.field("kind"), "media").to_numpy(
                zero_copy_only=False
            )
        )
        # spans are offset-ordered within each row by construction
        # (corpus.derive_spans_batch scatters to dense positions)
        cum = np.cumsum(is_media.astype(np.int64))
        row_starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=row_starts[1:])
        base = (cum - is_media.astype(np.int64))[row_starts[:-1]]
        sec = cum - base[row]
        is_text = ~is_media
        t_row, t_sec = row[is_text], sec[is_text]
        head_flag = np.r_[
            True, (t_row[1:] != t_row[:-1]) | (t_sec[1:] != t_sec[:-1])
        ] if len(t_row) else np.empty(0, dtype=bool)
        toks = np.asarray(
            flat.field("text").to_pylist(), dtype=object
        )[is_text][head_flag]
        h_row = t_row[head_flag]
        h_starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(h_row, minlength=n_rows), out=h_starts[1:]
        )
        outlines = [
            " > ".join(toks[h_starts[r]: h_starts[r + 1]])
            for r in range(n_rows)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_sections": pa.array(
                    (h_starts[1:] - h_starts[:-1]).astype(np.int64)
                ),
                "outline": pa.array(outlines, type=pa.string()),
            }
        )

    return spans_corpus(sf_dir).map_batches(
        outline_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Vector-table export sink (step 8). Partition key vec_id % _EXPORT_PARTS
# (deterministic, content-independent — identical rows land in identical
# partitions on a re-run). At 100 TB the part count scales with the corpus
# (it is a knob, not a contract); 16 keeps the oracle closed-form.
# ---------------------------------------------------------------------------
_EXPORT_PARTS = 16

_EXPORT_SQL = f"""
WITH flat AS (
  SELECT vec_id, vec_id % {_EXPORT_PARTS} AS part,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
payload AS (
  SELECT part, sum(CAST(floor(x * 1000) AS BIGINT)) AS payload_checksum,
         count(*) AS n_values
  FROM flat GROUP BY part
),
ids AS (
  SELECT vec_id % {_EXPORT_PARTS} AS part, count(*) AS n_vecs,
         sum(vec_id) AS id_sum
  FROM embeddings GROUP BY part
)
SELECT i.part, CAST(i.n_vecs AS BIGINT) AS n_vecs,
       CAST(p.n_values // i.n_vecs AS BIGINT) AS dim,
       CAST(i.id_sum AS BIGINT) AS id_sum,
       CAST(p.payload_checksum AS BIGINT) AS payload_checksum
FROM ids i JOIN payload p ON p.part = i.part
"""


def _export_write_part(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """Per-partition atomic writer (runs inside map_groups on a worker):
    data file first, manifest after — a partition is done iff its manifest
    exists (the resume contract of state/checkpoint.py)."""
    import pyarrow.parquet as pq

    pid = int(g["part"].iloc[0])
    pdir = os.path.join(out_dir, f"part={pid}")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    tmp = os.path.join(pdir, f".data.parquet.tmp.{os.getpid()}")
    final = os.path.join(pdir, "data.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            g[["vec_id", "label", "embedding"]], preserve_index=False
        ),
        tmp,
    )
    os.replace(tmp, final)
    record = {"partition_id": pid, "n_rows": int(len(g)), "path": final}
    mtmp = os.path.join(out_dir, "_manifest", f".{pid}.json.tmp.{os.getpid()}")
    with open(mtmp, "w") as fh:
        json.dump(record, fh)
    os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{pid}.json"))
    return pd.DataFrame([record])


@query("embeddings_export", _EXPORT_SQL)
def q_embeddings_export(sf_dir: str, out_dir: str | None = None):
    import ray.data

    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "part": pa.array([], type=pa.int64()),
            "n_vecs": pa.array([], type=pa.int64()),
            "dim": pa.array([], type=pa.int64()),
            "id_sum": pa.array([], type=pa.int64()),
            "payload_checksum": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "embeddings") == 0:
        return empty
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="emb_export_", dir="/tmp")

    def add_part(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(vid % _EXPORT_PARTS))

    (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "label", "embedding"],
        )
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: _export_write_part(g, out_dir), batch_format="pandas"
        )
        .materialize()  # barrier: every partition + manifest durable
    )

    # verification pass over the WRITTEN FILES: the returned table (and
    # hence the oracle compare) reflects what landed on disk
    from ray.data.aggregate import Count, Sum

    def verify_partial(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        counts = np.diff(emb.offsets.to_numpy(zero_copy_only=False))
        vals = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        qsum = np.floor(vals * 1000.0).astype(np.int64)
        row_q = np.zeros(len(vid), dtype=np.int64)
        np.add.at(
            row_q, np.repeat(np.arange(len(vid)), counts), qsum
        )
        return pa.table(
            {
                "part": pa.array(vid % _EXPORT_PARTS),
                "dim_row": pa.array(counts.astype(np.int64)),
                "vec_id": pa.array(vid),
                "q": pa.array(row_q),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        n = t["n_vecs"].to_numpy(zero_copy_only=False).astype(np.int64)
        dims = t["dim_total"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": t["part"].cast(pa.int64()),
                "n_vecs": pa.array(n),
                "dim": pa.array(dims // n),
                "id_sum": t["id_sum"].cast(pa.int64()),
                "payload_checksum": t["payload_checksum"].cast(pa.int64()),
            }
        )

    # enumerate the written part files from the MANIFESTS (the resume
    # contract: a partition counts iff its manifest exists) — 16 entries,
    # driver-side by construction
    mdir = os.path.join(out_dir, "_manifest")
    part_files = []
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                part_files.append(json.load(fh)["path"])
    return (
        ray.data.read_parquet(part_files)
        .map_batches(verify_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("part")
        .aggregate(
            Count(alias_name="n_vecs"),
            Sum("dim_row", alias_name="dim_total"),
            Sum("vec_id", alias_name="id_sum"),
            Sum("q", alias_name="payload_checksum"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
