"""Nested-spans-NATIVE queries (VERDICT r2 action 8): the north-star input
shape — one row per document carrying an interleaved span list
(doc_id, spans:list<struct<kind,text,media_ref,offset>>) — exercised under
the oracle gate with `cap_spans_per_row` applied, not just inside the
extraction pytest. Every stage here consumes the NESTED layout: the span
cap splits giant documents into bounded chunk rows (run_textract.py:8-31's
max-work-unit analog), and downstream semantics are chunk-invariant
because spans carry absolute offsets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus import SQL_ALL_SPANS
from ..registry import query
from ..sources.readers import read_spans_corpus
from ..stages.explode import explode_spans
from ..stages.skew import cap_spans_per_row
from ..stages.strike import rule_verdict_flat
from .extraction import _reassemble_group
from .queries_extraction import _EXTRACT_SQL

# small enough to BIND at test scale (docs average ~60 spans), so the
# chunk/reassemble machinery is actually exercised, not a no-op
SPAN_NATIVE_CAP = 32


def _capped_spans(sf_dir: str):
    return read_spans_corpus(sf_dir).map_batches(
        lambda t: cap_spans_per_row(t, SPAN_NATIVE_CAP),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


@query("extract_spans_capped", _EXTRACT_SQL)
def q_extract_spans_capped(sf_dir: str):
    """Flagship extraction over the nested input WITH the span cap: capped
    chunk rows explode, strike-filter, and reassemble by (doc_id, offset)
    to sequences identical to the uncapped path (same oracle as
    extract_spans — chunking must be invisible in the output)."""
    flat = (
        _capped_spans(sf_dir)
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
    sch = flat.schema()
    if sch is not None and "category" in sch.names:
        flat = flat.drop_columns(["category"])
    return flat.groupby("doc_id").map_groups(
        _reassemble_group, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Exact dedup computed FROM the nested spans layout: each chunk row emits a
# mergeable signature partial (sum over its text spans of a 40-bit
# position-salted token hash — addition-combinable, so chunks of one doc
# combine with a Sum aggregate and never re-join their text), then
# first-wins per signature. 40-bit per-token values keep the int64 sum
# exact (< 2^53 for any realistic doc); production widens to 128-bit.
# ---------------------------------------------------------------------------
_SPANS_DEDUP_SQL = f"""
{SQL_ALL_SPANS},
sigs AS (
  SELECT doc_id,
         sum(CAST(('0x' || substr(md5(text || '@' || off), 1, 10))::UBIGINT
                  AS BIGINT)) AS sig
  FROM all_spans WHERE kind = 'text' GROUP BY doc_id
)
SELECT CAST(sig AS BIGINT) AS sig,
       CAST(min(doc_id) AS BIGINT) AS keeper,
       CAST(count(*) AS BIGINT) AS n_copies
FROM sigs GROUP BY sig
"""


def _sig_partial(batch: pa.Table) -> pa.Table:
    """Per-chunk-row signature partial over text spans (kind=='text')."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    doc_id = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False), counts
    )
    kind = flat.field("kind").to_numpy(zero_copy_only=False)
    text = flat.field("text").to_pylist()
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    is_text = kind == "text"
    vals = np.fromiter(
        (
            int(hashlib.md5(f"{t}@{o}".encode()).hexdigest()[:10], 16)
            for t, o, m in zip(text, off, is_text)
            if m
        ),
        dtype=np.int64,
        count=int(is_text.sum()),
    )
    docs = doc_id[is_text]
    # combine within the batch before the shuffle (per-doc partial sums)
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, vals)
    return pa.table(
        {
            "doc_id": pa.array(uniq, type=pa.int64()),
            "sig_part": pa.array(sums, type=pa.int64()),
        }
    )


@query("dedup_exact_spans", _SPANS_DEDUP_SQL)
def q_dedup_exact_spans(sf_dir: str):
    from ray.data.aggregate import Count, Min, Sum

    sigs = (
        _capped_spans(sf_dir)
        .map_batches(_sig_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Sum("sig_part", alias_name="sig"))
        .repartition(4)
    )
    return (
        sigs.groupby("sig")
        .aggregate(
            Min("doc_id", alias_name="keeper"),
            Count(alias_name="n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus token-frequency FROM the nested spans layout — the text family's
# classic skewed-key wide aggregate (hot tokens dominate), now fed by
# capped chunk rows: each chunk row combines its own text spans into
# (tok, partial n) pairs BEFORE the shuffle, so the groupby moves
# per-chunk distinct tokens, not one row per span, and chunking is
# invisible in the result (counts are addition-combinable).
# ---------------------------------------------------------------------------
_SPANS_TOKFREQ_SQL = f"""
{SQL_ALL_SPANS}
SELECT text AS tok, CAST(count(*) AS BIGINT) AS n
FROM all_spans WHERE kind = 'text'
GROUP BY text
"""


def _tok_partial(batch: pa.Table) -> pa.Table:
    """Per-chunk-row (token, count) combiner over text spans."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    kind = flat.field("kind").to_numpy(zero_copy_only=False)
    text = np.asarray(flat.field("text").to_pylist(), dtype=object)
    toks = text[kind == "text"]
    uniq, cnt = np.unique(toks.astype(str), return_counts=True)
    return pa.table(
        {
            "tok": pa.array(uniq.tolist(), type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        }
    )


@query("token_freq_spans", _SPANS_TOKFREQ_SQL)
def q_token_freq_spans(sf_dir: str):
    from ray.data.aggregate import Sum

    return (
        _capped_spans(sf_dir)
        .map_batches(_tok_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .repartition(4)  # hash-aggregate emits schema-less empty blocks
    )
