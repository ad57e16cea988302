"""Deterministic interleaved-spans corpus, derived from the driver's flat
``documents`` table.

TESTDATA's ``documents`` is flat text; the engine's input model
(BASELINE.json ``input_hint``) is interleaved text+media span sequences. This
module defines ONE set of arithmetic derivation rules, implemented twice:

* vectorized Arrow/numpy (`derive_spans_batch`, used by the Ray pipelines),
* ANSI SQL fragments (`SQL_*`, used by the DuckDB oracle in __ray_entry__).

Because both sides compute the same closed-form rules from the same input
rows, the driver's value-hash comparison is a genuine end-to-end check of the
Ray pipeline (explode -> strike-filter -> reassemble), not a tautology.

Derivation rules (token index ``i`` is 1-based to match SQL
``generate_subscripts``):

* tokens      = regex-split of trimmed ``text`` on whitespace
* media span  inserted after every 10th token; the j-th media span of doc d
  has ``media_ref = 'm-<d>-<j>'`` (word-crop key pattern, reference
  ``create_bbox_chunked.py:25`` saves crops as ``{block['Id']}.jpeg``)
* offset      (0-based, dense, interleaved): token i -> (i-1) + (i-1)//10,
  media j -> 11*j - 1
* struck(d,i) = ((d*37 + i*101) % 7 == 0)  — the synthetic stand-in for the
  strikethrough verdict (reference ``strikethrough_agent.py:96-127``); the
  image-level CV kernel in stages/strike.py is *drawn from* this rule, so the
  kernel's verdict must reproduce it exactly (tested in pytest)
* category    = 'tables' if count(token=='table') >= 3
                else 'diagrams' if count(token=='vector') >= 3 else 'other'
  — table beats diagram, the reference's routing precedence
  (``table_detector_agent.py:36-41``, ``textract_agent.py:215-222``)

Extraction output = surviving spans (unstruck text spans + all media spans)
in offset order with ``ord`` re-densified per document — the reference's
order-restoring recombination (``textract_agent.py:153-179``).
"""

from __future__ import annotations

import numpy as np

from .functions.malloc_tuning import tune_malloc
import pyarrow as pa
import pyarrow.compute as pc

# --- rule constants (change here and in the SQL below together) -----------
STRIKE_A = 37
STRIKE_B = 101
STRIKE_MOD = 7
MEDIA_EVERY = 10
# Page-orientation rule (M8): synthetic word GEOMETRY is laid out
# vertically for these docs; the orientation enricher must recover the
# label from the bbox geometry alone (reference textract_agent.py:107-110
# derives PageOrientationBasedOnWords from word polygons, consumed by
# strikethrough_agent.py:168-171 to pick the CV kernel branch).
ORIENT_MOD = 5
ORIENT_VERTICAL_RESIDUE = 2
SQL_ORIENTATION = (
    f"CASE WHEN doc_id % {ORIENT_MOD} = {ORIENT_VERTICAL_RESIDUE} "
    "THEN 'vertical' ELSE 'horizontal' END"
)
TABLE_TOKEN = "table"
DIAGRAM_TOKEN = "vector"
CATEGORY_MIN_COUNT = 3

TOKEN_SPLIT_RE = r"\s+"  # RE2 \s is ASCII: [ \t\n\r\v\f]
ASCII_WS = " \t\n\r\v\f"
# DuckDB expression stripping the same ASCII whitespace set from both ends
# (bare trim() strips spaces only; Arrow's utf8_trim_whitespace strips
# Unicode whitespace — both diverge from RE2 \s, so BOTH sides use this
# explicit ASCII set)
SQL_TRIM = ("trim(text, ' ' || chr(9) || chr(10) || chr(13) "
            "|| chr(11) || chr(12))")


# ---------------------------------------------------------------------------
# Vectorized tokenization: documents batch -> flat (doc_id, token, i) arrays.
# ---------------------------------------------------------------------------
class FlatTokens:
    """Flattened tokenization of a documents batch (computed once per batch).

    Pure Arrow kernels: utf8 trim + regex split produce a ListArray whose
    offsets give both the doc mapping and the within-doc index with no
    Python-per-row work. ``tokens_arrow`` stays a zero-copy Arrow string
    array; the numpy object view ``tokens`` is materialized lazily only for
    consumers that truly need Python strings (it is the expensive path).
    """

    __slots__ = ("counts", "doc_ids", "tokens_arrow", "i", "row_idx",
                 "_tokens_np")

    def __init__(self, batch: pa.Table):
        tune_malloc()  # text-family worker entry: keep freed buffers mapped
        toks = pc.split_pattern_regex(
            pc.utf8_trim(batch["text"], characters=ASCII_WS),
            TOKEN_SPLIT_RE,
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        self.counts = np.diff(offsets)                       # tokens per doc
        self.tokens_arrow = toks.flatten()
        self._tokens_np = None
        self.doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), self.counts
        )
        self.row_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64), self.counts
        )
        total = int(self.counts.sum())
        # 1-based token index within each doc (matches SQL generate_subscripts)
        self.i = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offsets[:-1], self.counts)
            + 1
        )

    @property
    def tokens(self) -> np.ndarray:
        if self._tokens_np is None:
            self._tokens_np = self.tokens_arrow.to_numpy(zero_copy_only=False)
        return self._tokens_np


def vertical_mask(doc_ids: np.ndarray) -> np.ndarray:
    """Ground-truth page orientation of the synthetic GEOMETRY (the
    analyzer must re-derive this from bboxes, never read it directly)."""
    return doc_ids % ORIENT_MOD == ORIENT_VERTICAL_RESIDUE


def struck_mask(doc_ids: np.ndarray, i: np.ndarray) -> np.ndarray:
    """Synthetic strikethrough verdict for token i (1-based) of doc_id."""
    return (doc_ids * STRIKE_A + i * STRIKE_B) % STRIKE_MOD == 0


def category_flags(ft: FlatTokens, n_docs: int):
    """(is_table, is_diagram, category) per doc in ONE pass of Arrow-kernel
    equality scans — no Python-string materialization, no double counting."""
    is_tbl = pc.equal(ft.tokens_arrow, TABLE_TOKEN).to_numpy(
        zero_copy_only=False
    )
    is_dia = pc.equal(ft.tokens_arrow, DIAGRAM_TOKEN).to_numpy(
        zero_copy_only=False
    )
    tbl_cnt = np.bincount(ft.row_idx[is_tbl], minlength=n_docs)
    dia_cnt = np.bincount(ft.row_idx[is_dia], minlength=n_docs)
    is_table = tbl_cnt >= CATEGORY_MIN_COUNT
    is_diagram = dia_cnt >= CATEGORY_MIN_COUNT
    cat = np.where(
        is_table, "tables", np.where(is_diagram, "diagrams", "other")
    )
    return is_table, is_diagram, pa.array(cat, type=pa.string())


def categories_from_tokens(ft: FlatTokens, n_docs: int) -> pa.Array:
    """Per-doc routing category (see category_flags)."""
    return category_flags(ft, n_docs)[2]


# ---------------------------------------------------------------------------
# documents batch -> nested spans rows (F1 schema) — the corpus materializer.
# ---------------------------------------------------------------------------
def derive_spans_batch(batch: pa.Table) -> pa.Table:
    """Map a ``documents`` Arrow batch to the F1 spans schema.

    One output row per input document; spans is the full interleaved
    sequence INCLUDING struck text spans (striking happens downstream in the
    extraction pipeline, like the reference's separate strikethrough pass).

    Fully Arrow-native hot path: span offsets ARE dense positions, so the
    interleave is a direct integer scatter (no sort); token text lands via a
    null-masked Arrow ``take`` (no Python-object arrays); media_ref strings
    are built with the vectorized ``binary_join_element_wise`` kernel.
    """
    tune_malloc()  # once per worker: keep freed numpy buffers mapped
    ft = FlatTokens(batch)
    doc_ids, i, counts = ft.doc_ids, ft.i, ft.counts
    n_docs = len(batch)

    # text spans: offset = (i-1) + (i-1)//MEDIA_EVERY
    t_off = (i - 1) + (i - 1) // MEDIA_EVERY

    # media spans: one after every MEDIA_EVERY-th token
    m_sel = i % MEDIA_EVERY == 0
    m_doc = doc_ids[m_sel]
    m_j = i[m_sel] // MEDIA_EVERY
    m_off = (MEDIA_EVERY + 1) * m_j - 1

    m_counts = counts // MEDIA_EVERY
    span_counts = counts + m_counts
    row_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(span_counts, out=row_start[1:])

    # global output positions: row start + within-doc offset (dense by
    # construction), so a scatter replaces the lexsort entirely
    t_pos = np.repeat(row_start[:-1], counts) + t_off
    m_pos = np.repeat(row_start[:-1], m_counts) + m_off
    total = int(row_start[-1])

    # kind: bitmask -> dictionary-free string array built from two constants
    is_media = np.zeros(total, dtype=bool)
    is_media[m_pos] = True
    kind = pc.if_else(
        pa.array(is_media), pa.scalar("media"), pa.scalar("text")
    )

    # text: null-masked take from the flattened token array (zero-copy C)
    t_idx = np.full(total, -1, dtype=np.int64)
    t_idx[t_pos] = np.arange(len(t_off), dtype=np.int64)
    text_vals = ft.tokens_arrow.take(pa.array(t_idx, mask=t_idx < 0))

    # media_ref: vectorized 'm-{doc}-{j}' for media rows, scattered via take
    mref_built = pc.binary_join_element_wise(
        pa.scalar("m-"),
        pc.cast(pa.array(m_doc), pa.string()),
        pa.scalar("-"),
        pc.cast(pa.array(m_j), pa.string()),
        pa.scalar(""),
    )
    m_idx = np.full(total, -1, dtype=np.int64)
    m_idx[m_pos] = np.arange(len(m_off), dtype=np.int64)
    mref = mref_built.take(pa.array(m_idx, mask=m_idx < 0))

    off = np.empty(total, dtype=np.int32)
    off[t_pos] = t_off
    off[m_pos] = m_off

    span_struct = pa.StructArray.from_arrays(
        [kind, text_vals, mref, pa.array(off, type=pa.int32())],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(
        pa.array(row_start.astype(np.int32)), span_struct
    )

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "category": categories_from_tokens(ft, n_docs),
            "spans": spans,
        }
    )


# ---------------------------------------------------------------------------
# SQL fragments for the DuckDB oracle (documents is a pre-registered view).
# ---------------------------------------------------------------------------
SQL_TOKS = f"""
toks AS (
  SELECT doc_id,
         unnest(string_split_regex({SQL_TRIM}, '\\s+')) AS tok,
         generate_subscripts(string_split_regex({SQL_TRIM}, '\\s+'), 1) AS i
  FROM documents
)
"""

SQL_STRUCK = f"((doc_id*{STRIKE_A} + i*{STRIKE_B}) % {STRIKE_MOD} = 0)"

SQL_ALL_SPANS = f"""
WITH {SQL_TOKS},
text_spans AS (
  SELECT doc_id, 'text' AS kind, tok AS text,
         CAST(NULL AS VARCHAR) AS media_ref,
         (i-1) + (i-1)//{MEDIA_EVERY} AS off,
         {SQL_STRUCK} AS struck
  FROM toks
),
media_spans AS (
  SELECT doc_id, 'media' AS kind, CAST(NULL AS VARCHAR) AS text,
         'm-'||doc_id||'-'||(i//{MEDIA_EVERY}) AS media_ref,
         {MEDIA_EVERY + 1}*(i//{MEDIA_EVERY}) - 1 AS off,
         FALSE AS struck
  FROM toks WHERE i % {MEDIA_EVERY} = 0
),
all_spans AS (
  SELECT * FROM text_spans UNION ALL SELECT * FROM media_spans
)
"""

SQL_CATEGORY = f"""
doc_category AS (
  SELECT doc_id,
         CASE
           WHEN sum(CASE WHEN tok = '{TABLE_TOKEN}' THEN 1 ELSE 0 END)
                >= {CATEGORY_MIN_COUNT} THEN 'tables'
           WHEN sum(CASE WHEN tok = '{DIAGRAM_TOKEN}' THEN 1 ELSE 0 END)
                >= {CATEGORY_MIN_COUNT} THEN 'diagrams'
           ELSE 'other'
         END AS category
  FROM toks GROUP BY doc_id
)
"""
