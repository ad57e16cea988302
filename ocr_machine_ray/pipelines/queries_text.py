"""Driver-checked queries: text analysis (language distribution, quality
scoring, token counting, fingerprinting) over the documents table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import (
    md5_fingerprint_batch,
    quality_stats_batch,
    token_count_batch,
)
from ..registry import query
from .extraction import read_documents

# ---------------------------------------------------------------------------
# Language distribution (A-style aggregate; partial per batch, tiny groupby).
# ---------------------------------------------------------------------------
_LANG_DIST_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


@query("lang_distribution", _LANG_DIST_SQL)
def q_lang_distribution(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(langs, return_inverse=True)
        n = np.bincount(inv)
        tc = np.bincount(inv, weights=chars).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(vals, type=pa.string()),
                "n_docs": pa.array(n.astype(np.int64)),
                "total_chars": pa.array(tc),
            }
        )

    partials = read_documents(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_chars", alias_name="total_chars"),
    )


# ---------------------------------------------------------------------------
# Quality scoring (integer counters; SURVEY.md §2 "text analysis").
# ---------------------------------------------------------------------------
_QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS i
  FROM documents
),
lagged AS (
  SELECT doc_id, tok, i,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM toks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(length(tok)) AS BIGINT) AS total_token_len,
       CAST(sum(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stopword,
       CAST(sum(CASE WHEN tok = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat
FROM lagged GROUP BY doc_id
"""


@query("quality_stats", _QUALITY_SQL)
def q_quality_stats(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        quality_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex sub-tokens).
# The synthetic corpus has no punctuation/digit runs, so the BPE-ish count
# equals the word-regex count; the regex machinery is exercised regardless
# (richer inputs are covered in pytest).
# ---------------------------------------------------------------------------
_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+')) AS BIGINT)
           AS n_bpeish_tokens
FROM documents WHERE text IS NOT NULL
"""


@query("token_counts", _TOKEN_COUNT_SQL)
def q_token_counts(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Fingerprinting (md5 — matches DuckDB's md5()).
# ---------------------------------------------------------------------------
_FPRINT_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
WHERE text IS NOT NULL
"""


@query("fingerprints", _FPRINT_SQL)
def q_fingerprints(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        md5_fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )
