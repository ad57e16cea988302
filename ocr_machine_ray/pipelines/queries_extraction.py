"""Driver-checked queries for the extraction pipeline family
(SURVEY.md §2: M1/M3 classify+coerce, M4 summary, M5 route, M9 WORD
projection, M10/M13 strike removal, M15 reassembly, M17 explode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..corpus import (
    SQL_ALL_SPANS,
    SQL_CATEGORY,
    SQL_TOKS,
    CATEGORY_MIN_COUNT,
    DIAGRAM_TOKEN,
    TABLE_TOKEN,
    categories_from_tokens,
    FlatTokens,
)
from ..registry import query
from ..stages.explode import explode_spans
from .extraction import (
    extract,
    extract_flat_shuffled,
    read_documents,
    spans_corpus,
)

# ---------------------------------------------------------------------------
# Flagship: full extraction (explode -> strike-filter -> reassemble).
# Per-row invariant: span-sequence equality (kind, text, media_ref, ord).
# ---------------------------------------------------------------------------
_EXTRACT_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, kind, text, media_ref,
       row_number() OVER (PARTITION BY doc_id ORDER BY off) - 1 AS ord
FROM all_spans WHERE NOT struck
"""


@query("extract_spans", _EXTRACT_SQL)
def q_extract_spans(sf_dir: str):
    return extract(sf_dir)


@query("extract_spans_shuffled", _EXTRACT_SQL)
def q_extract_spans_shuffled(sf_dir: str):
    """Same semantics via explode -> groupby(doc_id) reassembly (M15 wide form)."""
    return extract_flat_shuffled(sf_dir)


# ---------------------------------------------------------------------------
# Raw interleaved corpus (derivation only; M17 explode as the output adapter).
# ---------------------------------------------------------------------------
_SPANS_ALL_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, kind, text, media_ref, CAST(off AS BIGINT) AS off
FROM all_spans
"""


@query("spans_interleaved", _SPANS_ALL_SQL)
def q_spans_interleaved(sf_dir: str):
    def to_flat(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        return pa.table(
            {
                "doc_id": flat["doc_id"],
                "kind": flat["kind"],
                "text": flat["text"],
                "media_ref": flat["media_ref"],
                "off": flat["offset"].cast(pa.int64()),
            }
        )

    return spans_corpus(sf_dir).map_batches(
        to_flat, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Classification + routing (M1 classifier stand-in, M3 coercion, M5 router).
# ---------------------------------------------------------------------------
_CLASSIFY_SQL = f"""
WITH {SQL_TOKS},
flags AS (
  SELECT doc_id,
         sum(CASE WHEN tok = '{TABLE_TOKEN}' THEN 1 ELSE 0 END)
             >= {CATEGORY_MIN_COUNT} AS is_table,
         sum(CASE WHEN tok = '{DIAGRAM_TOKEN}' THEN 1 ELSE 0 END)
             >= {CATEGORY_MIN_COUNT} AS is_diagram
  FROM toks GROUP BY doc_id
)
SELECT doc_id, is_table, is_diagram,
       CASE WHEN is_table THEN 'tables'
            WHEN is_diagram THEN 'diagrams'
            ELSE 'other' END AS route
FROM flags
"""


@query("classify_route", _CLASSIFY_SQL)
def q_classify_route(sf_dir: str):
    from ..corpus import category_flags  # driver-side: closure captures it
                                         # (a batch-fn-body import fails on
                                         # workers under pickle-by-value)

    def classify(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        is_table, is_diagram, route = category_flags(ft, len(batch))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "is_table": pa.array(is_table),
                "is_diagram": pa.array(is_diagram),
                "route": route,
            }
        )

    return read_documents(sf_dir).map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Detection summary (M4 summarizer / A2 aggregation): corpus-level counts
# per route — pre-aggregated per batch, tiny final groupby.
# ---------------------------------------------------------------------------
_SUMMARY_SQL = f"""
WITH {SQL_TOKS}, {SQL_CATEGORY}
SELECT category AS route, CAST(count(*) AS BIGINT) AS n_docs
FROM doc_category GROUP BY category
"""


@query("detection_summary", _SUMMARY_SQL)
def q_detection_summary(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        cats = categories_from_tokens(ft, len(batch)).to_numpy(
            zero_copy_only=False
        )
        vals, cnts = np.unique(cats, return_counts=True)
        return pa.table(
            {
                "route": pa.array(vals, type=pa.string()),
                "n_docs": pa.array(cnts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    partials = read_documents(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("route").aggregate(Sum("n_docs", alias_name="n_docs"))


# ---------------------------------------------------------------------------
# WORD projection (M9): text spans only, container/media columns dropped.
# ---------------------------------------------------------------------------
_WORDS_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, text, CAST(off AS BIGINT) AS off
FROM all_spans WHERE kind = 'text'
"""


@query("word_projection", _WORDS_SQL)
def q_word_projection(sf_dir: str):
    def words_only(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        mask = pa.compute.equal(flat["kind"], "text")
        t = flat.filter(mask)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "off": t["offset"].cast(pa.int64()),
            }
        )

    return spans_corpus(sf_dir).map_batches(
        words_only, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Strike verdict stats (A3: true/false processed counts).
# ---------------------------------------------------------------------------
_STRIKE_STATS_SQL = f"""
{SQL_ALL_SPANS}
SELECT struck, CAST(count(*) AS BIGINT) AS n
FROM all_spans WHERE kind = 'text' GROUP BY struck
"""


@query("strike_stats", _STRIKE_STATS_SQL)
def q_strike_stats(sf_dir: str):
    from ..stages.strike import rule_verdict_flat

    def partial(batch: pa.Table) -> pa.Table:
        v = rule_verdict_flat(batch)
        t = v.filter(pa.compute.equal(v["kind"], "text"))
        s = t["struck"].to_numpy(zero_copy_only=False)
        # emit only classes present in this batch — the SQL GROUP BY has
        # no rows for empty groups, and a zero-count partial would survive
        # the Sum aggregate as a spurious n=0 row
        classes, counts = [], []
        n_true = int(s.sum())
        n_false = int(len(s) - n_true)
        if n_false:
            classes.append(False); counts.append(n_false)
        if n_true:
            classes.append(True); counts.append(n_true)
        return pa.table(
            {
                "struck": pa.array(classes, type=pa.bool_()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    flat = spans_corpus(sf_dir).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = flat.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    return partials.groupby("struck").aggregate(Sum("n", alias_name="n"))


# ---------------------------------------------------------------------------
# Removed-per-doc accounting (M13 block filter bookkeeping: removed ids /
# surviving counts per document, reference strikethrough_agent.py:160-162).
# ---------------------------------------------------------------------------
_REMOVAL_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id,
       CAST(sum(CASE WHEN struck THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN NOT struck THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM all_spans GROUP BY doc_id
"""


@query("removal_accounting", _REMOVAL_SQL)
def q_removal_accounting(sf_dir: str):
    from ..stages.strike import keep_mask_rule

    def per_doc(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
        doc_rep = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), counts
        )
        row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        keep = keep_mask_rule(doc_rep, flat)
        kept = np.bincount(row_idx[keep], minlength=len(batch))
        removed = counts - kept
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_removed": pa.array(removed.astype(np.int64)),
                "n_kept": pa.array(kept.astype(np.int64)),
            }
        )

    return spans_corpus(sf_dir).map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Media inventory (S3/media side: one media span per 10 tokens; the media
# payload itself lives in the side table, SURVEY.md §7.3).
# ---------------------------------------------------------------------------
_MEDIA_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_media
FROM all_spans WHERE kind = 'media' GROUP BY doc_id
"""


@query("media_inventory", _MEDIA_SQL)
def q_media_inventory(sf_dir: str):
    def per_doc(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        m = flat.filter(pa.compute.equal(flat["kind"], "media"))
        docs = m["doc_id"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(docs, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(vals, type=pa.int64()),
                "n_media": pa.array(cnts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    partials = spans_corpus(sf_dir).map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("doc_id").aggregate(Sum("n_media", alias_name="n_media"))


# ---------------------------------------------------------------------------
# Block-graph repair (M13): build Textract-style PAGE/LINE/WORD/TABLE/CELL
# graphs, drop struck WORDs, scrub child_ids, report per-doc graph stats.
# ---------------------------------------------------------------------------
_BLOCK_REPAIR_SQL = f"""
WITH {SQL_TOKS},
per_doc AS (
  SELECT doc_id,
         count(*) AS n,
         sum(CASE WHEN (doc_id*37 + i*101) % 7 = 0 THEN 0 ELSE 1 END) AS kept
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CAST(kept AS BIGINT) AS n_word_blocks,
       CAST((n + 9) // 10 AS BIGINT) AS n_line_blocks,
       CAST(n // 10 AS BIGINT) AS n_table_blocks,
       CAST(1 + (n + 9) // 10 + kept + 5 * (n // 10) AS BIGINT) AS n_blocks,
       CAST(((n + 9) // 10 + n // 10) + kept + 4 * (n // 10) AS BIGINT)
           AS total_child_refs
FROM per_doc
"""


@query("block_repair_stats", _BLOCK_REPAIR_SQL)
def q_block_repair_stats(sf_dir: str):
    """Full graph pipeline: build blocks -> groupby(doc_id).map_groups repair
    -> per-doc structural stats (the driver-checkable projection of the
    byte-level repair asserted in pytest)."""
    import pandas as pd

    from ..stages.blocks import build_blocks_batch, repair_group

    import numpy as np
    import pyarrow as pa

    def add_db(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_db", pa.array(doc >> 8))

    def stats_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 whole docs per group: the graph repair itself is inherently
        # per-document (id-graph surgery), but slicing doc segments out of
        # one sorted frame costs ~50 us each vs ~0.6-3 ms of map_groups
        # dispatch per doc (BASELINE.md)
        g = g.sort_values("doc_id", kind="mergesort")
        doc = g["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        ends = np.r_[starts[1:], len(doc)]
        rows = []
        for s, e in zip(starts, ends):
            fixed = repair_group(g.iloc[s:e])
            bt = fixed["block_type"]
            rows.append(
                (
                    int(doc[s]),
                    int((bt == "WORD").sum()),
                    int((bt == "LINE").sum()),
                    int((bt == "TABLE").sum()),
                    len(fixed),
                    int(fixed["child_ids"].map(len).sum()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_word_blocks", "n_line_blocks",
                "n_table_blocks", "n_blocks", "total_child_refs",
            ],
        )

    blocks = read_documents(sf_dir).map_batches(
        build_blocks_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        blocks.map_batches(add_db, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(stats_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Geometric reading order (O2, order_blocks_by_geo): synthetic scrambled
# bboxes from the token index; rank = position in (top, left) order.
# ---------------------------------------------------------------------------
_GEO_SQL = f"""
WITH {SQL_TOKS},
geo AS (
  SELECT doc_id, i,
         ((i*3) % 5) * 0.2 AS top,
         ((i*7) % 10) * 0.1 AS "left"
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS token_i,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY top, "left", i) AS BIGINT) AS geo_rank
FROM geo
"""


@query("geo_order", _GEO_SQL)
def q_geo_order(sf_dir: str):
    def rank(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        top = ((ft.i * 3) % 5) * 0.2
        left = ((ft.i * 7) % 10) * 0.1
        # rank within each doc by (top, left, i): lexsort then invert
        order = np.lexsort((ft.i, left, top, ft.row_idx))
        rank_arr = np.empty(len(ft.i), dtype=np.int64)
        # position within doc: subtract each doc's start in the sorted order
        sorted_rows = ft.row_idx[order]
        starts = np.searchsorted(sorted_rows, np.arange(len(batch)))
        rank_arr[order] = (
            np.arange(len(ft.i), dtype=np.int64) - starts[sorted_rows] + 1
        )
        return pa.table(
            {
                "doc_id": pa.array(ft.doc_ids, type=pa.int64()),
                "token_i": pa.array(ft.i, type=pa.int64()),
                "geo_rank": pa.array(rank_arr, type=pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(
        rank, batch_format="pyarrow", zero_copy_batch=True
    )


@query("extract_spans_cv", _EXTRACT_SQL)
def q_extract_spans_cv(sf_dir: str):
    """Image-driven flagship: strikethrough decided by the CV kernel from
    rendered pixels, not the rule — same oracle, full-pipeline closure."""
    from .extraction import extract_via_cv

    return extract_via_cv(sf_dir)


# ---------------------------------------------------------------------------
# Checkpointed run + lineage (north_rule: per-partition lineage records).
# Rows-only: the record includes wall-time, inherently non-deterministic.
# ---------------------------------------------------------------------------
@query("lineage_records")
def q_lineage_records(sf_dir: str):
    """Run the flagship through the resumable partitioned sink and return
    the per-partition lineage rows (fresh output dir per invocation so the
    row count is stable across driver runs)."""
    import shutil
    import tempfile

    import pandas as pd

    from ..state.checkpoint import run_resumable
    from .extraction import extract

    out_dir = tempfile.mkdtemp(prefix="ckpt_", dir="/tmp")
    try:
        records = run_resumable(
            extract(sf_dir), out_dir, n_parts=16, stage="extract", run_id="drv"
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return pd.DataFrame(records)


# ---------------------------------------------------------------------------
# trp pipeline-component analogs (reference python_files/other/README.md,
# "Pipeline" section): merge_tables + kv_ocr_confidence. Our block model
# derives tables from media spans (table j at token 10(j+1)) and words from
# text tokens; confidences and column counts come from closed-form rules so
# the DuckDB oracle computes identical values.
# ---------------------------------------------------------------------------
_CONF_RULE = "9000 + (doc_id*31 + (i-1)*17) % 1000"  # WORD k=i-1, basis pts

_KV_CONF_SQL = f"""
WITH {SQL_TOKS}
SELECT doc_id,
       CAST((i-1)//10 AS BIGINT) AS line_idx,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(min({_CONF_RULE}) AS BIGINT) AS conf_min_bp,
       CAST(sum({_CONF_RULE}) AS BIGINT) AS conf_sum_bp
FROM toks GROUP BY doc_id, (i-1)//10
"""


@query("kv_ocr_confidence", _KV_CONF_SQL)
def q_kv_ocr_confidence(sf_dir: str):
    """add_kv_ocr_confidence analog (trp t_pipeline, reference
    python_files/other/README.md "Add OCR confidence score to KEY and
    VALUE"): each container block (our LINE = the KEY_VALUE_SET analog)
    gets min + sum of its WORD children's OCR confidences. Confidence is
    the closed-form integer rule above (basis points) so values are
    hash-exact; sum instead of float mean keeps the compare integral
    (mean = sum / n_words downstream). Batch-local: one doc per row, no
    shuffle."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        k = ft.i - 1
        line = k // 10
        conf = 9000 + (ft.doc_ids * 31 + k * 17) % 1000
        if len(k) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "line_idx": pa.array([], type=pa.int64()),
                    "n_words": pa.array([], type=pa.int64()),
                    "conf_min_bp": pa.array([], type=pa.int64()),
                    "conf_sum_bp": pa.array([], type=pa.int64()),
                }
            )
        # (doc, line) segments are CONTIGUOUS in token order but docs may
        # arrive in any order — delimit segments by boundaries (monotonic
        # by construction, safe for reduceat), never by np.unique indices
        key = ft.doc_ids * (1 << 20) + line
        starts = np.nonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )[0]
        counts = np.diff(np.append(starts, len(key)))
        sums = np.add.reduceat(conf, starts)
        mins = np.minimum.reduceat(conf, starts)
        return pa.table(
            {
                "doc_id": pa.array(ft.doc_ids[starts], type=pa.int64()),
                "line_idx": pa.array(line[starts], type=pa.int64()),
                "n_words": pa.array(counts.astype(np.int64)),
                "conf_min_bp": pa.array(mins.astype(np.int64)),
                "conf_sum_bp": pa.array(sums.astype(np.int64)),
            }
        )

    return read_documents(sf_dir).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


_MERGE_TABLES_SQL = f"""
WITH {SQL_TOKS},
tables AS (
  SELECT doc_id, CAST(i//10 - 1 AS BIGINT) AS tbl,
         2 + (doc_id + i//10 - 1) % 3 AS ncols
  FROM toks WHERE i % 10 = 0
),
runs AS (
  SELECT doc_id, tbl, ncols,
         CASE WHEN lag(ncols) OVER w = ncols THEN 0 ELSE 1 END AS brk
  FROM tables WINDOW w AS (PARTITION BY doc_id ORDER BY tbl)
),
grp AS (
  SELECT doc_id, tbl, ncols,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY tbl) AS g
  FROM runs
)
SELECT doc_id, CAST(min(tbl) AS BIGINT) AS merge_group,
       CAST(count(*) AS BIGINT) AS n_tables,
       CAST(min(ncols) AS BIGINT) AS ncols
FROM grp GROUP BY doc_id, g
"""


@query("merge_tables", _MERGE_TABLES_SQL)
def q_merge_tables(sf_dir: str):
    """pipeline_merge_tables analog (trp t_pipeline, MergeOptions.MERGE;
    reference python_files/other/README.md "Merge or link tables across
    pages"): consecutive tables with the SAME column count merge into one
    logical table; the merge group is the run of equal-ncols neighbors
    (gaps-and-islands). Column count is the closed-form rule
    2 + (doc_id + j) % 3. Batch-local per document — no shuffle."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        m = ft.i % 10 == 0
        doc = ft.doc_ids[m]
        tbl = ft.i[m] // 10 - 1
        ncols = 2 + (doc + tbl) % 3
        if len(doc) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "merge_group": pa.array([], type=pa.int64()),
                    "n_tables": pa.array([], type=pa.int64()),
                    "ncols": pa.array([], type=pa.int64()),
                }
            )
        # run breaks: new doc OR ncols change between consecutive tables
        brk = np.ones(len(doc), dtype=bool)
        same_doc = doc[1:] == doc[:-1]
        brk[1:] = ~(same_doc & (ncols[1:] == ncols[:-1]))
        gid = np.cumsum(brk) - 1
        starts = np.nonzero(brk)[0]
        counts = np.diff(np.append(starts, len(doc)))
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], type=pa.int64()),
                "merge_group": pa.array(tbl[starts], type=pa.int64()),
                "n_tables": pa.array(counts.astype(np.int64)),
                "ncols": pa.array(ncols[starts], type=pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )
