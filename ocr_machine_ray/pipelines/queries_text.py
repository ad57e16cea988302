"""Driver-checked queries: text analysis (language distribution, quality
scoring, token counting, fingerprinting) over the documents table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import SQL_CATEGORY, SQL_TOKS
from ..corpus import FlatTokens as _GopherFlatTokens
from ..functions.text import (
    QUALITY_STOPWORDS as _GOPHER_STOPWORDS,
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
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
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
       CAST(len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS BIGINT)
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


# ---------------------------------------------------------------------------
# Corpus token-frequency table — the classic skewed-key wide aggregate
# (hot tokens like 'the' dominate). Pre-aggregate per batch, shuffle only
# (token, partial_count) rows.
# ---------------------------------------------------------------------------
_TOKEN_FREQ_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
)
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM toks GROUP BY tok
"""


@query("token_frequencies", _TOKEN_FREQ_SQL)
def q_token_frequencies(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..corpus import FlatTokens

    def partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        vals, counts = np.unique(ft.tokens, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(vals, type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = read_documents(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("tok").aggregate(Sum("n", alias_name="n"))


# ---------------------------------------------------------------------------
# Top bigrams by frequency (deterministic tie-break on the bigram text).
# ---------------------------------------------------------------------------
_BIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents
),
bg AS (
  SELECT t1.tok || ' ' || t2.tok AS bigram
  FROM toks t1 JOIN toks t2
    ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
),
cnt AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
SELECT bigram, CAST(n AS BIGINT) AS n
FROM cnt ORDER BY n DESC, bigram LIMIT 20
"""


@query("top_bigrams", _BIGRAM_SQL)
def q_top_bigrams(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..corpus import FlatTokens

    def partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        toks = ft.tokens
        same_doc = ft.row_idx[1:] == ft.row_idx[:-1]
        left = toks[:-1][same_doc]
        right = toks[1:][same_doc]
        bigrams = np.char.add(np.char.add(left.astype(str), " "),
                              right.astype(str))
        vals, counts = np.unique(bigrams, return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(vals, type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = read_documents(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby("bigram").aggregate(Sum("n", alias_name="n"))

    def block_top(batch: pa.Table) -> pa.Table:
        # vocab can be huge at scale: keep each aggregate block's local
        # top-20 so the final Sort sees <=20 rows per block, not the vocab
        if len(batch) == 0 or "bigram" not in batch.column_names:
            # hash-aggregate output can contain empty schema-less blocks
            return pa.table(
                {
                    "bigram": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        bg = batch["bigram"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bg, -n))[:20]
        return pa.table(
            {
                "bigram": pa.array(bg[order], type=pa.string()),
                "n": pa.array(n[order].astype(np.int64)),
            }
        )

    cands = counts.map_batches(
        block_top, batch_format="pyarrow", zero_copy_batch=True
    )
    return cands.sort(["n", "bigram"], descending=[True, False]).limit(20)


# ---------------------------------------------------------------------------
# Text normalization (lowercase, collapse whitespace) + stopword removal —
# standard training-data cleaning maps, value-exact vs SQL string kernels.
# ---------------------------------------------------------------------------
_NORMALIZE_SQL = """
SELECT doc_id,
       lower(regexp_replace(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+', ' ', 'g')) AS norm_text
FROM documents WHERE text IS NOT NULL
"""


@query("normalize_text", _NORMALIZE_SQL)
def q_normalize_text(sf_dir: str):
    import pyarrow.compute as pc

    from ..corpus import ASCII_WS

    def norm(batch: pa.Table) -> pa.Table:
        # explicit ASCII set: utf8_trim_whitespace strips Unicode ws (NBSP)
        # and would diverge from the SQL oracle's ASCII trim on non-ASCII text
        t = pc.utf8_lower(
            pc.replace_substring_regex(
                pc.utf8_trim(batch["text"], characters=ASCII_WS), r"\s+", " "
            )
        )
        return pa.table({"doc_id": batch["doc_id"], "norm_text": t})

    return read_documents(sf_dir).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )


_STOPFILTER_SQL = """
SELECT doc_id,
       array_to_string(
         list_filter(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'),
                     t -> t NOT IN ('the', 'a')), ' ') AS filtered_text
FROM documents WHERE text IS NOT NULL
"""


@query("stopword_filter", _STOPFILTER_SQL)
def q_stopword_filter(sf_dir: str):
    from ..corpus import FlatTokens
    from ..functions.text import QUALITY_STOPWORDS

    def filt(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        keep = ~np.isin(ft.tokens, QUALITY_STOPWORDS)
        out = []
        # per-row join of surviving tokens (boundaries from row_idx)
        kept_rows = ft.row_idx[keep]
        kept_toks = ft.tokens[keep]
        n = len(batch)
        starts = np.searchsorted(kept_rows, np.arange(n + 1))
        for r in range(n):
            out.append(" ".join(kept_toks[starts[r]:starts[r + 1]]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "filtered_text": pa.array(out, type=pa.string()),
            }
        )

    return read_documents(sf_dir).map_batches(
        filt, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (training-data hygiene): flag documents whose
# text shares any word trigram with a designated benchmark subset
# (doc_id % 97 == 0 — the stand-in for an eval-suite document list). The
# benchmark side is the SMALL side by construction (eval suites are tiny
# next to a 100 TB corpus): its distinct grams are collected once and
# broadcast via ray.put; the corpus side streams, testing membership with
# the Arrow is_in kernel per batch — no shuffle touches the big table. If
# the benchmark set ever outgrew a broadcast, the same gram columns
# hash-join instead (the dedup family already implements that shape).
# ---------------------------------------------------------------------------
from ..corpus import FlatTokens as _FlatTokens

_BENCH_MOD = 97


def _grams3(batch: pa.Table):
    """(trigram StringArray, flat row index) for a documents batch — pure
    Arrow kernels (tokenize once, three zero-copy slices, C-level join),
    no Python string loop."""
    import pyarrow.compute as pc

    ft = _FlatTokens(batch)
    toks = ft.tokens_arrow
    n = len(toks)
    if n < 3:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    ok = ft.row_idx[:-2] == ft.row_idx[2:]
    g = pc.binary_join_element_wise(
        toks.slice(0, n - 2), toks.slice(1, n - 2), toks.slice(2, n - 2), " "
    )
    return g.filter(pa.array(ok)), ft.row_idx[:-2][ok]


_DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents
),
g AS (
  SELECT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS gram
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
hits AS (
  SELECT m.doc_id, count(*) AS n
  FROM g m JOIN bench b USING (gram)
  WHERE m.doc_id % {_BENCH_MOD} != 0
  GROUP BY m.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_matched,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_BENCH_MOD} != 0 AND d.text IS NOT NULL
"""


@query("decontaminate", _DECONTAM_SQL)
def q_decontaminate(sf_dir: str):
    import pyarrow.compute as pc
    import ray

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % _BENCH_MOD == 0))
        g, _ = _grams3(sub)
        return pa.table({"gram": pc.unique(g)})

    # small side: per-block distinct grams, final dedup on the driver
    gram_rows = docs.map_batches(
        bench_grams, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    bench = pa.array(
        np.unique(np.array([r["gram"] for r in gram_rows], dtype=object)),
        type=pa.string(),
    )
    ref = ray.put(bench)

    class Flagger:
        def __init__(self):
            self.bench = ray.get(ref)  # once per actor, shared-memory read

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            sub = batch.filter(pa.array(ids % _BENCH_MOD != 0))
            g, ridx = _grams3(sub)
            hit = pc.is_in(g, value_set=self.bench).to_numpy(
                zero_copy_only=False
            )
            n = np.bincount(ridx[hit], minlength=len(sub)).astype(np.int64)
            return pa.table(
                {
                    "doc_id": sub["doc_id"],
                    "n_matched": pa.array(n),
                    "contaminated": pa.array(n > 0),
                }
            )

    return docs.map_batches(
        Flagger, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# Fuzzy decontamination by shingle CONTAINMENT (the FineWeb/Dolma shape):
# where `decontaminate` flags on ANY matched gram, this scores the fraction
# of a document's DISTINCT 3-gram shingles that appear in the benchmark
# shingle set and flags at a threshold — robust to incidental single-gram
# collisions, catches paraphrased/partial inclusions. Same broadcast
# topology: the benchmark set is small by construction (ray.put once, read
# per actor), candidate docs stream; threshold arithmetic is integer so the
# SQL oracle reproduces the flag bit exactly.
# ---------------------------------------------------------------------------
_FUZZY_TAU_NUM, _FUZZY_TAU_DEN = 1, 25  # flag at containment >= 4%

_FUZZY_DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents
),
g AS (
  SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS gram
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
s AS (
  SELECT g.doc_id, count(*) AS n_shingles, count(b.gram) AS n_overlap
  FROM g LEFT JOIN bench b USING (gram)
  WHERE g.doc_id % {_BENCH_MOD} != 0
  GROUP BY g.doc_id
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       (n_overlap * {_FUZZY_TAU_DEN} >= n_shingles * {_FUZZY_TAU_NUM})
         AS flagged
FROM s
"""


@query("fuzzy_decontaminate", _FUZZY_DECONTAM_SQL)
def q_fuzzy_decontaminate(sf_dir: str):
    import pyarrow.compute as pc
    import ray

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % _BENCH_MOD == 0))
        g, _ = _grams3(sub)
        return pa.table({"gram": pc.unique(g)})

    gram_rows = docs.map_batches(
        bench_grams, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    bench = pa.array(
        np.unique(np.array([r["gram"] for r in gram_rows], dtype=object)),
        type=pa.string(),
    )
    ref = ray.put(bench)

    class ContainmentFlagger:
        def __init__(self):
            self.bench = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            sub = batch.filter(pa.array(ids % _BENCH_MOD != 0))
            g, ridx = _grams3(sub)
            # distinct (doc, gram) pairs: dedupe the flat gram stream by a
            # row-salted sort (vectorized; no Python loop over rows)
            gs = g.to_numpy(zero_copy_only=False)
            order = np.lexsort((gs, ridx))
            gs, ridx = gs[order], ridx[order]
            keep = np.ones(len(gs), dtype=bool)
            if len(gs) > 1:
                keep[1:] = (ridx[1:] != ridx[:-1]) | (gs[1:] != gs[:-1])
            gs, ridx = gs[keep], ridx[keep]
            n_sh = np.bincount(ridx, minlength=len(sub)).astype(np.int64)
            hit = pc.is_in(
                pa.array(gs, type=pa.string()), value_set=self.bench
            ).to_numpy(zero_copy_only=False)
            n_ov = np.bincount(
                ridx[hit], minlength=len(sub)
            ).astype(np.int64)
            has = n_sh > 0  # docs with <3 tokens have no shingles: excluded
            return pa.table(
                {
                    "doc_id": sub["doc_id"].filter(pa.array(has)),
                    "n_shingles": pa.array(n_sh[has]),
                    "n_overlap": pa.array(n_ov[has]),
                    "flagged": pa.array(
                        n_ov[has] * _FUZZY_TAU_DEN
                        >= n_sh[has] * _FUZZY_TAU_NUM
                    ),
                }
            )

    return docs.map_batches(
        ContainmentFlagger,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Repetition quality filter (Gopher-style): per-document duplicate-token
# statistics — integer counters only, exactly reproducible in SQL. Entirely
# batch-local (each document's stats depend on that row alone): zero
# shuffle, embarrassingly parallel at any corpus size.
# ---------------------------------------------------------------------------
_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents
),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(max(c) AS BIGINT) AS top_count,
       (max(c) * 5 > sum(c)) AS flagged
FROM cnt GROUP BY doc_id
"""


@query("repetition_stats", _REPETITION_SQL)
def q_repetition_stats(sf_dir: str):
    import pyarrow.compute as pc

    def stats(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        nrows = len(batch)
        # dictionary-encode once (C kernel) -> integer token ids; combine
        # with the row index so one np.unique yields per-(doc, token) counts
        enc = pc.dictionary_encode(ft.tokens_arrow)
        tok_ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        combined = ft.row_idx * max(n_dict, 1) + tok_ids
        pair, pair_c = np.unique(combined, return_counts=True)
        pair_row = pair // max(n_dict, 1)
        n_unique = np.bincount(pair_row, minlength=nrows).astype(np.int64)
        top = np.zeros(nrows, dtype=np.int64)
        np.maximum.at(top, pair_row, pair_c)
        n_tokens = ft.counts.astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens),
                "n_unique": pa.array(n_unique),
                "top_count": pa.array(top),
                "flagged": pa.array(top * 5 > n_tokens),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Stratified (data-mixture) sampling: deterministic per-language sampling
# rates via a Knuth multiplicative hash of doc_id — the mixture-weighting
# step of a training-data pipeline (e.g. upsample en, downsample zh).
# Hash-based selection is reproducible across runs/engines (both sides
# compute the identical integer bucket), needs no shuffle, no RNG state,
# and composes with resumable writes: re-running a partition re-selects
# exactly the same docs.
# ---------------------------------------------------------------------------
_MIX_KNUTH = 2654435761
_MIX_RATES = {"en": 500, "fr": 300, "de": 300, "es": 150, "zh": 100}
_MIX_DEFAULT = 150

# mod-safe hash form: (a*b) % m == ((a%m) * (b%m)) % m, and the reduced
# product maxes at 999*761 — no int64/BIGINT overflow at ANY doc_id
# (the naive doc_id*KNUTH wraps numpy int64 past doc_id ~3.5e9 while
# DuckDB raises, silently desyncing the two sides). CASE arms generated
# from _MIX_RATES so the dict is the single source of truth.
_STRAT_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE ((doc_id % 1000) * {_MIX_KNUTH % 1000}) % 1000 <
      CASE lang
        {' '.join(f"WHEN '{lg}' THEN {r}" for lg, r in sorted(_MIX_RATES.items()))}
        ELSE {_MIX_DEFAULT}
      END
"""


@query("stratified_sample", _STRAT_SQL)
def q_stratified_sample(sf_dir: str):
    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        bucket = ((ids % 1000) * (_MIX_KNUTH % 1000)) % 1000
        rates = np.full(len(ids), _MIX_DEFAULT, dtype=np.int64)
        for lg, r in _MIX_RATES.items():
            rates[langs == lg] = r
        return batch.filter(pa.array(bucket < rates))

    return read_documents(sf_dir, ["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Training-example chunking: every document's token sequence split into
# fixed 32-token windows (last window short) — the example-preparation
# step before packing/batching. Chunk text is materialized with Arrow C
# kernels only: one ListArray over the flat token array (non-overlapping
# windows = monotone offsets) + binary_join. Batch-local, zero shuffle.
# ---------------------------------------------------------------------------
_CHUNK_W = 32

_CHUNK_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(k * {_CHUNK_W} + 1 AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_W}, len(w) - k * {_CHUNK_W}) AS BIGINT) AS n_toks,
       array_to_string(w[k*{_CHUNK_W}+1 : (k+1)*{_CHUNK_W}], ' ')
         AS chunk_text
FROM d, LATERAL (
  SELECT unnest(range(CAST(ceil(len(w) / {_CHUNK_W}.0) AS BIGINT))) AS k
) t
"""


@query("chunk_examples", _CHUNK_SQL)
def q_chunk_examples(sf_dir: str):
    import pyarrow.compute as pc

    W = _CHUNK_W

    def chunks(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        counts = ft.counts.astype(np.int64)
        n_chunks = -(-counts // W)
        doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
        cum = np.concatenate([[0], np.cumsum(n_chunks)])
        k = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1], n_chunks)
        start = k * W
        n_toks = np.minimum(W, counts[doc_rep] - start)
        tok_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # non-overlapping windows over the doc-concatenated flat token
        # array -> one monotone offsets vector, one C-level join
        offsets = np.append(tok_start[doc_rep] + start, counts.sum())
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), ft.tokens_arrow
        )
        texts = pc.binary_join(lists, " ")
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(doc_rep)),
                "chunk_id": pa.array(k),
                "start_tok": pa.array(start + 1),
                "n_toks": pa.array(n_toks),
                "chunk_text": texts,
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Sequence packing: greedy next-fit of example chunks into fixed-capacity
# packs (capacity 4x the chunk window) — the batching-efficiency step
# between chunking and the trainer. Packing is BATCH-LOCAL (next-fit never
# looks back), so the stage streams with zero shuffle and parallelizes per
# block; pack keys are (first doc_id, first chunk_id), globally unique
# because batches partition documents. Rows-only by nature (greedy packing
# is order-path-dependent, not a relational expression); the invariants —
# capacity respected, every chunk packed exactly once, determinism,
# utilization floor — are pytest-checked.
# ---------------------------------------------------------------------------
_PACK_CAP = 4 * _CHUNK_W


@query("pack_examples")
def q_pack_examples(sf_dir: str):
    def pack(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "pack_doc": pa.array([], type=pa.int64()),
                    "pack_chunk": pa.array([], type=pa.int64()),
                    "n_chunks": pa.array([], type=pa.int64()),
                    "n_toks": pa.array([], type=pa.int64()),
                    "util_pct": pa.array([], type=pa.int64()),
                }
            )
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        cid = batch["chunk_id"].to_numpy(zero_copy_only=False)
        nt = batch["n_toks"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cid, doc))
        doc, cid, nt = doc[order], cid[order], nt[order]
        # next-fit: loop over CHUNKS (thousands per block), not tokens —
        # running-sum-with-reset has no closed numpy form
        pack_idx = np.empty(len(nt), dtype=np.int64)
        fill = _PACK_CAP + 1  # force a new pack at the first chunk
        p = -1
        for i, n in enumerate(nt):
            if fill + n > _PACK_CAP:
                p += 1
                fill = 0
            fill += n
            pack_idx[i] = p
        starts = np.flatnonzero(np.r_[True, pack_idx[1:] != pack_idx[:-1]])
        counts = np.diff(np.r_[starts, len(nt)])
        toks = np.add.reduceat(nt, starts)
        return pa.table(
            {
                "pack_doc": pa.array(doc[starts]),
                "pack_chunk": pa.array(cid[starts]),
                "n_chunks": pa.array(counts.astype(np.int64)),
                "n_toks": pa.array(toks.astype(np.int64)),
                "util_pct": pa.array(toks * 100 // _PACK_CAP),
            }
        )

    return q_chunk_examples(sf_dir).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Keyword extraction (integer-exact tf-idf): top-3 tokens per document by
# (term frequency DESC, document frequency ASC, token ASC) — the float
# idf weight is replaced by exact integer ordering so the oracle is
# value-exact. Composition: batch-local tf rows -> partial-agg df table
# (one shuffle over tokens) -> native hash join tf x df -> per-doc top-k.
# ---------------------------------------------------------------------------
_KEYWORDS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
ranked AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC
         ) AS rnk
  FROM tf JOIN df USING (tok)
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok AS keyword,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM ranked WHERE rnk <= 3
"""


@query("keywords_per_doc", _KEYWORDS_SQL)
def q_keywords_per_doc(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    # ray 2.49's hash-join aggregator raises on fully-empty inputs
    if parquet_num_rows(sf_dir, "documents") == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64()),
                "keyword": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
            }
        )

    # Pass 1 — document frequency: per-batch DISTINCT (doc, tok) counts are
    # a mergeable df partial (docs never span batches), so the only shuffle
    # carries vocab-sized (tok, partial) rows. The merged df table is the
    # corpus vocabulary — sublinear in the corpus — and broadcasts once via
    # ray.put. (If the vocabulary ever outgrew a broadcast, the df side
    # hash-joins on tok instead — bm25_topk implements exactly that shape.)
    def df_partial(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        enc = pc.dictionary_encode(ft.tokens_arrow)
        tok_ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = max(len(enc.dictionary), 1)
        pair = np.unique(ft.row_idx * n_dict + tok_ids)
        tid, cnt = np.unique(pair % n_dict, return_counts=True)
        return pa.table(
            {
                "tok": enc.dictionary.take(pa.array(tid)),
                "df": pa.array(cnt.astype(np.int64)),
            }
        )

    df_tbl = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()  # vocab-sized
    )
    if "tok" not in df_tbl.columns or df_tbl.empty:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64()),
                "keyword": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
            }
        )
    vocab_raw = df_tbl["tok"].to_numpy(dtype=object).astype(str)
    order = np.argsort(vocab_raw)
    df_ref = ray.put((vocab_raw[order], df_tbl["df"].to_numpy(np.int64)[order]))

    # Pass 2 — tf + rank, fully batch-local: every doc's tokens live inside
    # one batch of THIS operator (FlatTokens is per-batch; correctness does
    # not depend on block boundaries surviving between operators), so the
    # global top-3 per doc needs no join and no groupby — zero shuffle.
    def topk_fused(batch: pa.Table) -> pa.Table:
        vocab, dfv_tbl = ray.get(df_ref)
        ft = _FlatTokens(batch)
        enc = pc.dictionary_encode(ft.tokens_arrow)
        tok_ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = max(len(enc.dictionary), 1)
        pair, tf = np.unique(ft.row_idx * n_dict + tok_ids, return_counts=True)
        row, tid = pair // n_dict, pair % n_dict
        toks = enc.dictionary.take(pa.array(tid))
        tnp = toks.to_numpy(zero_copy_only=False).astype(str)
        dfv = dfv_tbl[np.searchsorted(vocab, tnp)]
        order = np.lexsort((tnp, dfv, -tf, row))
        r = row[order]
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        pos = np.arange(len(r)) - np.repeat(
            starts, np.diff(np.r_[starts, len(r)])
        )
        keep = pos < 3
        sel = order[keep]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[row[sel]], type=pa.int64()),
                "rnk": pa.array((pos[keep] + 1).astype(np.int64)),
                "keyword": toks.take(pa.array(sel)),
                "tf": pa.array(tf[sel].astype(np.int64)),
                "df": pa.array(dfv[sel].astype(np.int64)),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        topk_fused, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Heavy hitters: every token with global frequency > N/K, exact counts —
# the two-pass Misra-Gries shape (reference analytics family A1/A4 writ
# large). Pass 1 ships <= MG_CAP sketch rows per block (never the token
# stream); the merged sketch is provably a superset of the heavy set
# (cap=64 > K=30, see functions/sketch.py), and the top-96-by-weight cut
# is safe because at most 56 tokens can hold merged weight >= N/56. Pass 2
# exact-counts only those <= 96 candidates, so the answer is value-exact.
# At 10^12 rows both shuffles carry O(blocks * cap) and O(candidates)
# rows respectively — nothing data-sized moves or reaches the driver.
# ---------------------------------------------------------------------------
HEAVY_K = 30
_MG_CAP = 64
_CAND_LIMIT = 96

_HEAVY_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok
  FROM documents
),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT count(*) AS total_n FROM toks)
SELECT tok, CAST(n AS BIGINT) AS n
FROM cnt, tot WHERE n * {HEAVY_K} > total_n
"""


@query("heavy_hitters", _HEAVY_SQL)
def q_heavy_hitters(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..corpus import FlatTokens
    from ..functions.sketch import misra_gries_counts

    def mg_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        nb = len(ft.tokens)
        vals, counts = np.unique(ft.tokens, return_counts=True)
        vals, w = misra_gries_counts(vals, counts.astype(np.int64), _MG_CAP)
        if nb and len(vals) == 0:
            # all counts tied at the decrement threshold: keep one zero-
            # weight row so this batch's token total still reaches the sum
            vals, w = np.array([ft.tokens[0]]), np.zeros(1, dtype=np.int64)
        nb_col = np.zeros(len(vals), dtype=np.int64)
        if len(vals):
            nb_col[0] = nb
        return pa.table(
            {
                "tok": pa.array(vals, type=pa.string()),
                "w": pa.array(np.asarray(w, dtype=np.int64)),
                "nb": pa.array(nb_col),
            }
        )

    merged = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("w", alias_name="w"), Sum("nb", alias_name="nb"))
        .materialize()  # consumed twice (scalar N + top-candidates cut)
    )
    empty = pa.table(
        {"tok": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )
    if merged.count() == 0:
        return empty
    n_total = int(merged.sum("nb"))
    cand = (
        merged.sort(["w", "tok"], descending=[True, False])
        .limit(_CAND_LIMIT)
        .to_pandas()
    )
    cand = cand[cand["w"] > 0]  # heavy => strictly positive merged weight
    if cand.empty:
        return empty
    vs = np.sort(cand["tok"].to_numpy(dtype=object).astype(str))

    def count_cand(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        toks = ft.tokens.astype(str)
        pos = np.searchsorted(vs, toks)
        pos_c = np.minimum(pos, len(vs) - 1)
        hit = vs[pos_c] == toks
        n = np.bincount(pos_c[hit], minlength=len(vs)).astype(np.int64)
        nz = n > 0
        return pa.table(
            {
                "tok": pa.array(vs[nz], type=pa.string()),
                "n": pa.array(n[nz]),
            }
        )

    counts = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(count_cand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= _CAND_LIMIT rows
    )
    heavy = counts[counts["n"] * HEAVY_K > n_total]
    return pa.table(
        {
            "tok": pa.array(heavy["tok"].to_numpy(dtype=object), type=pa.string()),
            "n": pa.array(heavy["n"].to_numpy(dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Tokenizer apply: build the top-V vocabulary (freq desc, token asc) and
# encode every token position to its vocab id (-1 = OOV) — the broadcast-
# vocab encode stage every training-data pipeline runs before packing.
# Vocab build is the token_frequencies partial-agg (only (tok, n) rows
# shuffle); the V-row id table broadcasts in the encode closure and each
# batch encodes via one searchsorted — the token stream itself never
# shuffles. V=16 < |vocab| so the OOV path is exercised end to end.
# ---------------------------------------------------------------------------
VOCAB_V = 16

_VOCAB_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents
),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT) AS tid
  FROM cnt ORDER BY n DESC, tok LIMIT {VOCAB_V}
)
SELECT t.doc_id, CAST(t.i AS BIGINT) AS i,
       COALESCE(v.tid, -1) AS token_id
FROM toks t LEFT JOIN vocab v USING (tok)
"""


@query("vocab_encode", _VOCAB_SQL)
def q_vocab_encode(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..corpus import FlatTokens

    def freq_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        vals, counts = np.unique(ft.tokens, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(vals, type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    vocab = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(freq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "tok"], descending=[True, False])
        .limit(VOCAB_V)
        .to_pandas()  # V rows
    )
    if "tok" not in vocab.columns:  # empty aggregate drops the schema
        toks_sorted = np.array([], dtype=str)
        tids_sorted = np.array([], dtype=np.int64)
    else:
        raw = vocab["tok"].to_numpy(dtype=object).astype(str)
        order = np.argsort(raw)
        toks_sorted = raw[order]
        # tid = rank in (n desc, tok asc) order = the pandas row index
        tids_sorted = vocab.index.to_numpy(dtype=np.int64)[order]

    def encode(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        toks = ft.tokens.astype(str)
        tid = np.full(len(toks), -1, dtype=np.int64)
        if len(toks_sorted):
            pos = np.searchsorted(toks_sorted, toks)
            pos_c = np.minimum(pos, len(toks_sorted) - 1)
            hit = toks_sorted[pos_c] == toks
            tid[hit] = tids_sorted[pos_c[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ft.doc_ids),
                "i": pa.array(ft.i.astype(np.int64)),
                "token_id": pa.array(tid),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixture (mT5/XLM-R-style alpha=0.5 resampling):
# per-source keep rates derived FROM the data — rate_s proportional to
# sqrt(char mass of source s), scaled so the heaviest source keeps 50%.
# Unlike stratified_sample (fixed rates), the rates here come out of a
# global aggregate; the whole op is two stages: a (source -> mass) partial
# agg whose shuffle carries |sources| rows, then an embarrassingly parallel
# hash-threshold filter with the ~20-row rate table broadcast in the
# closure. All arithmetic is exact-integer on both sides: isqrt == floor
# of IEEE correctly-rounded sqrt for m < 2^52, and the keep test reuses the
# Knuth multiplicative hash — no RNG, no float thresholds.
# ---------------------------------------------------------------------------
_TEMP_SCALE = 500  # heaviest source keeps _TEMP_SCALE/1000 of its docs

_TEMP_SQL = f"""
WITH m AS (
  SELECT source, CAST(floor(sqrt(sum(n_chars))) AS BIGINT) AS w
  FROM documents GROUP BY source
),
mx AS (SELECT max(w) AS mw FROM m),
r AS (SELECT source, (w * {_TEMP_SCALE}) // mw AS rate FROM m, mx)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE ((d.doc_id % 1000) * {_MIX_KNUTH % 1000}) % 1000 < r.rate
"""


@query("temperature_sample", _TEMP_SQL)
def q_temperature_sample(sf_dir: str):
    import math

    from ray.data.aggregate import Sum

    def mass_partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(src, return_inverse=True)
        return pa.table(
            {
                "source": pa.array(uk, type=pa.string()),
                "mass": pa.array(
                    np.bincount(inv, weights=chars).astype(np.int64)
                ),
            }
        )

    masses = (
        read_documents(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(mass_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("mass", alias_name="mass"))
        .to_pandas()  # |sources| rows
    )
    if "source" not in masses.columns or masses.empty:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "source": pa.array([], type=pa.string())}
        )
    w = np.array([math.isqrt(int(m)) for m in masses["mass"]], dtype=np.int64)
    rates = (w * _TEMP_SCALE) // int(w.max())
    src_sorted = masses["source"].to_numpy(dtype=object).astype(str)
    order = np.argsort(src_sorted)
    src_sorted, rates_sorted = src_sorted[order], rates[order]

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False).astype(str)
        bucket = ((ids % 1000) * (_MIX_KNUTH % 1000)) % 1000
        pos = np.searchsorted(src_sorted, src)
        pos_c = np.minimum(pos, len(src_sorted) - 1)
        rate = np.where(src_sorted[pos_c] == src, rates_sorted[pos_c], 0)
        return batch.filter(pa.array(bucket < rate))

    return read_documents(sf_dir, ["doc_id", "source"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation (C4/RefinedWeb-style composite): one fused
# quality pass (token count, stopword ratio, immediate-repetition ratio —
# all integer predicates, no floats), then head-dedup on the md5 of each
# surviving doc's first 8 tokens (the cheap prefix fingerprint web
# pipelines use to kill boilerplate-headed near-copies), keeping the
# minimum doc_id per prefix. Stage 1 is embarrassingly parallel and emits
# only survivor rows (doc_id, lang, n_tokens, fp); the only shuffle is the
# groupby on the 128-bit prefix hash — uniformly distributed by
# construction, so no hot keys at any scale. map_groups emits one block
# per group (ray 2.49), so the output is repartitioned before returning.
# Filters: n_tokens >= 20, stopwords <= 20% of tokens, immediate repeats
# < 1/8 of tokens (reference analytics family A1/A4 as gates; thresholds
# pinned by the shared SQL).
# ---------------------------------------------------------------------------
_CURATE_PREFIX = 8

_CURATE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents WHERE text IS NOT NULL
),
lagged AS (
  SELECT doc_id, tok, i,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM toks
),
stats AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) AS n_stop,
         sum(CASE WHEN tok = prev THEN 1 ELSE 0 END) AS n_rep
  FROM lagged GROUP BY doc_id
),
j AS (
  SELECT d.doc_id, d.lang,
         md5(array_to_string(
             string_split_regex(trim(d.text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')[1:{_CURATE_PREFIX}],
             ' ')) AS fp,
         s.n_tokens, s.n_stop, s.n_rep
  FROM documents d JOIN stats s USING (doc_id)
),
q AS (
  SELECT * FROM j
  WHERE n_tokens >= 20 AND n_stop * 5 <= n_tokens AND n_rep * 8 < n_tokens
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM q QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
"""


def _keep_min_bucket(g: "pd.DataFrame", key_col: str, cols: list[str]):
    """First-doc-wins per key inside a HASH BUCKET of ~256 keys (per-key
    map_groups costs ~0.6-3 ms of pandas dispatch each — BASELINE.md):
    one lexsort (key primary, doc_id secondary), segment heads win."""
    key = g[key_col].to_numpy()
    doc = g["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((doc, key))
    k = key[order]
    first = np.r_[True, k[1:] != k[:-1]]
    return g.iloc[order[first]][cols].reset_index(drop=True)


@query("corpus_curate", _CURATE_SQL)
def q_corpus_curate(sf_dir: str):
    import hashlib

    import pandas as pd

    from ..corpus import FlatTokens
    from .extraction import parquet_num_rows

    def survivors(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        n = len(batch)
        n_tokens = ft.counts.astype(np.int64)
        stop_mask = np.isin(ft.tokens, np.array(["the", "a"]))
        n_stop = np.bincount(ft.row_idx[stop_mask], minlength=n).astype(np.int64)
        same = np.zeros(len(ft.tokens), dtype=bool)
        if len(ft.tokens) > 1:
            same[1:] = (ft.tokens[1:] == ft.tokens[:-1]) & (
                ft.row_idx[1:] == ft.row_idx[:-1]
            )
        n_rep = np.bincount(ft.row_idx[same], minlength=n).astype(np.int64)
        keep = (n_tokens >= 20) & (n_stop * 5 <= n_tokens) & (n_rep * 8 < n_tokens)

        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ft.counts, out=starts[1:])
        toks = ft.tokens
        fps = []
        for d in np.flatnonzero(keep):
            head = toks[starts[d]: starts[d] + min(_CURATE_PREFIX, ft.counts[d])]
            fps.append(hashlib.md5(" ".join(head).encode()).hexdigest())
        keep_pa = pa.array(keep)
        # _fpb: hash bucket of the hex fp (~256 fps per map_groups
        # dispatch — hashes are sparse, so bucketing is MODULO a
        # corpus-sized target, not a prefix shift)
        return pa.table(
            {
                "fp": pa.array(fps, type=pa.string()),
                "_fpb": pa.array(
                    [int(f[:15], 16) % n_buckets for f in fps],
                    type=pa.int64(),
                ),
                "doc_id": batch["doc_id"].filter(keep_pa),
                "lang": batch["lang"].filter(keep_pa),
                "n_tokens": pa.array(n_tokens[keep]),
            }
        )

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)
    ds = (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(survivors, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_fpb")
        .map_groups(
            lambda g: _keep_min_bucket(g, "fp", ["doc_id", "lang", "n_tokens"]),
            batch_format="pandas",
        )
        .repartition(8)  # collapse one-block-per-group before returning
    )
    return ds


# ---------------------------------------------------------------------------
# Bigram language-model quality score (CCNet-style perplexity filter): an
# add-one-smoothed bigram LM is trained ON the corpus itself, then every
# document is scored by its total/average per-bigram information content.
# Log-probabilities are fixed-point INTEGER milli-bits — bits(b) =
# floor(-log2((C(w1w2)+1)/(C(w1)+V))*1000 + 0.5) is a deterministic scalar
# function of exact integer counts, so per-doc sums are order-independent
# and the oracle compare is value-exact (the repo's no-floats-in-oracles
# contract).
#
# Distributed shape (nothing corpus-sized leaves the cluster):
#   1. per-batch per-doc bigram pre-agg -> (doc_id, packed bigram, cnt)
#   2. bigram count table  cb = groupby(big).sum   (model "training")
#   3. context count table cu = groupby(w1).sum over cb  (derived, small)
#   4. vocabulary size V  = distinct-token count (scalar on the driver)
#   5. bits table = cb x cu join (derived tables) + the closed-form above
#   6. doc rows hash-join bits on the packed key -> groupby(doc_id) sums.
# The bits table is joined, not broadcast: a web-scale bigram vocabulary is
# corpus-proportional. Keys are packed single strings (w1\0w2) because ray
# 2.49's multi-key aggregate path is pathologically slow on small blocks.
# ---------------------------------------------------------------------------
_LM_SQL = """
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
),
pos AS (
  SELECT doc_id, w[CAST(i AS BIGINT)] AS w1, w[CAST(i + 1 AS BIGINT)] AS w2
  FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
),
db AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM pos GROUP BY doc_id, w1, w2),
cb AS (SELECT w1, w2, sum(cnt) AS cb FROM db GROUP BY w1, w2),
cu AS (SELECT w1, sum(cb) AS cu FROM cb GROUP BY w1),
v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(w) AS tok FROM d)),
bits AS (
  SELECT cb.w1, cb.w2,
         CAST(floor(-log2((cb.cb + 1.0) / (cu.cu + v.v)) * 1000 + 0.5)
              AS BIGINT) AS bits
  FROM cb JOIN cu USING (w1) CROSS JOIN v
)
SELECT db.doc_id,
       CAST(sum(db.cnt) AS BIGINT) AS n_bigrams,
       CAST(sum(db.cnt * bits.bits) AS BIGINT) AS total_bits_milli,
       CAST(sum(db.cnt * bits.bits) // sum(db.cnt) AS BIGINT)
           AS avg_bits_milli
FROM db JOIN bits ON db.w1 = bits.w1 AND db.w2 = bits.w2
GROUP BY db.doc_id
"""


def _doc_bigrams(batch: pa.Table) -> pa.Table:
    """Per-doc bigram counts, batch-local (combiner): (doc_id, big, cnt)
    where ``big`` is the NUL-packed pair key."""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "big": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    ft = _FlatTokens(batch)
    counts = ft.counts.astype(np.int64)
    if counts.sum() == 0:
        return empty
    not_last = ft.i < np.repeat(counts, counts)
    idx = np.flatnonzero(not_last)
    if len(idx) == 0:
        return empty
    take1 = pa.array(idx)
    take2 = pa.array(idx + 1)
    big = pc.binary_join_element_wise(
        ft.tokens_arrow.take(take1), ft.tokens_arrow.take(take2), "\x00"
    )
    t = pa.table(
        {
            "doc_id": pa.array(ft.doc_ids[idx], type=pa.int64()),
            "big": big,
        }
    )
    g = t.group_by(["doc_id", "big"]).aggregate([("doc_id", "count")])
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "big": g["big"],
            "cnt": g["doc_id_count"].cast(pa.int64()),
        }
    )


def _uniq_tokens(batch: pa.Table) -> pa.Table:
    if len(batch) == 0:
        return pa.table({"tok": pa.array([], type=pa.string())})
    ft = _FlatTokens(batch)
    return pa.table({"tok": pc.unique(ft.tokens_arrow)})


# model tables under this row count broadcast to the scoring scan instead
# of hash-joining (a bigram LM at web scale can exceed it; the join path
# then carries the load with zero driver state)
LM_BITS_BROADCAST_CAP = 5_000_000


def _lm_agg(db, docs):
    """Shared LM-scoring pipeline: bigram-count stream ``db`` (key, big,
    cnt — ``key`` is doc_id, or doc_id*64+lang_code for the bucketing
    variant) -> per-key (n_bigrams, total_bits_milli) Dataset, or None if
    the corpus trains an empty model. ``docs`` supplies the vocabulary."""
    from ray.data.aggregate import Count, Sum

    # db feeds BOTH model training (groupby big) and scoring (join on big);
    # un-checkpointed, Ray re-executes the tokenize+gram lineage once per
    # consumer. The pre-aggregated bigram stream is exactly the
    # intermediate a 10^12-doc run would write to the checkpoint table.
    db = db.materialize()

    # model training: global bigram counts (one shuffle of pre-agg rows)
    cbt = (
        db.groupby("big")
        .aggregate(Sum("cnt", alias_name="cb"))
        .map_batches(
            lambda t: pa.table(
                {
                    "big": t["big"],
                    "w1": pc.list_element(
                        pc.split_pattern(t["big"], "\x00"), 0
                    ),
                    "cb": t["cb"],
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(4)
        .materialize()
    )
    if cbt.count() == 0:  # corpus of sub-2-token docs only
        return None

    cut = (
        cbt.groupby("w1")
        .aggregate(Sum("cb", alias_name="cu"))
        .repartition(4)
        .materialize()
    )
    vocab_n = (
        docs.map_batches(
            _uniq_tokens, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("tok")
        .aggregate(Count(alias_name="n"))
        .count()
    )

    def _bits(t: pa.Table) -> pa.Table:
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        cu = t["cu"].to_numpy(zero_copy_only=False).astype(np.float64)
        bits = np.floor(
            -np.log2((cb + 1.0) / (cu + float(vocab_n))) * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table({"big": t["big"], "bits": pa.array(bits)})

    # materialized: two hash joins in one streaming plan mis-resolve key
    # columns on ray 2.49; bits is model-sized, not corpus-sized
    bits_tbl = (
        cbt.join(cut, join_type="inner", num_partitions=4, on=("w1",))
        .map_batches(_bits, batch_format="pyarrow")
        .repartition(4)
        .materialize()
    )

    # scoring: the model table is SMALL relative to the corpus stream —
    # broadcast it (ray.put once, dict lookup per batch) instead of paying
    # a 16-partition hash join's fixed cost; above the cap (giant vocab²
    # models) fall back to the join with zero driver state
    n_bits = bits_tbl.count()
    if n_bits <= LM_BITS_BROADCAST_CAP:
        import ray as _ray

        bt = bits_tbl.to_pandas()  # model-sized by the gate
        ref = _ray.put(
            dict(zip(bt["big"].tolist(), bt["bits"].astype("int64")))
        )

        def score_bcast(t: pa.Table) -> pa.Table:
            import ray

            lut = ray.get(ref)
            bigs = t["big"].to_pylist()
            bits = np.fromiter(
                (lut.get(b, -1) for b in bigs), dtype=np.int64,
                count=len(bigs),
            )
            hit = bits >= 0  # inner-join semantics: unmodeled grams drop
            cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": pa.array(doc[hit]),
                    "cnt": pa.array(cnt[hit]),
                    "contrib": pa.array(cnt[hit] * bits[hit]),
                }
            )

        scored = db.map_batches(
            score_bcast, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        scored = db.join(
            bits_tbl, join_type="inner", num_partitions=16, on=("big",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "cnt": t["cnt"],
                    "contrib": pc.multiply(
                        t["cnt"].cast(pa.int64()), t["bits"].cast(pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    return scored.groupby("doc_id").aggregate(
        Sum("cnt", alias_name="n_bigrams"),
        Sum("contrib", alias_name="total_bits_milli"),
    )


@query("lm_score", _LM_SQL)
def q_lm_score(sf_dir: str):
    from .extraction import parquet_num_rows, read_documents

    out_schema = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_bigrams": pa.array([], type=pa.int64()),
            "total_bits_milli": pa.array([], type=pa.int64()),
            "avg_bits_milli": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return out_schema

    docs = read_documents(sf_dir, ["doc_id", "text"])
    db = docs.map_batches(
        _doc_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = _lm_agg(db, docs)
    if agg is None:
        return out_schema
    return agg.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["n_bigrams"],
                "total_bits_milli": t["total_bits_milli"],
                "avg_bits_milli": pc.divide(
                    t["total_bits_milli"], t["n_bigrams"]
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets: every document is scored by the
# corpus-trained bigram LM above, then assigned head / middle / tail by
# its language's exact discrete avg-bits terciles (CCNet partitions Common
# Crawl into exactly these three perplexity bands per language before
# sampling). Thresholds use the DuckDB quantile_disc index rule
# sorted[ceil(p*n)-1], computed in exact integer arithmetic from merged
# per-language histograms — the same pinned rule as length_outliers.
#
# Scale shape: the doc's language rides INSIDE the scoring key
# (doc_id*64 + lang_code) through the existing LM join+groupby — no extra
# corpus-sized join, and no second hash join in one streaming plan (the
# ray 2.49 key-resolution trap). The per-doc score table is materialized
# once (1 row/doc; at 10^12 docs this is the intermediate you'd write to
# the checkpoint table) and consumed by two cheap passes: per-lang
# histogram partials -> tercile thresholds (K rows, broadcast), then a
# vectorized assign scan.
# ---------------------------------------------------------------------------
_CCNET_SQL = (
    "WITH core AS ("
    + _LM_SQL
    + """),
lang_core AS (
  SELECT core.doc_id, d2.lang, core.avg_bits_milli
  FROM core JOIN documents d2 USING (doc_id)
),
th AS (
  SELECT lang, quantile_disc(avg_bits_milli, 1.0/3) AS t1,
         quantile_disc(avg_bits_milli, 2.0/3) AS t2
  FROM lang_core GROUP BY lang
)
SELECT lc.doc_id, lc.lang, lc.avg_bits_milli,
       CASE WHEN lc.avg_bits_milli <= th.t1 THEN 'head'
            WHEN lc.avg_bits_milli <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lang_core lc JOIN th USING (lang)
"""
)

# avg milli-bits domain cap: 65535 milli-bits = a 2^65 smoothed denominator
_CCNET_BITS_HI = 65535


@query("ccnet_buckets", _CCNET_SQL)
def q_ccnet_buckets(sf_dir: str):
    import pandas as pd
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows, read_documents

    out_schema = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lang": pa.array([], type=pa.string()),
            "avg_bits_milli": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.string()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return out_schema

    docs_l = read_documents(sf_dir, ["doc_id", "text", "lang"])
    lang_df = (
        docs_l.map_batches(
            _lang_doc_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("lang")
        .aggregate(Sum("nd_part", alias_name="nd_part"))
        .to_pandas()
    )
    if len(lang_df) == 0:
        return out_schema
    lang_list = sorted(lang_df["lang"].astype(str).tolist())
    if len(lang_list) > 63:
        raise ValueError("ccnet_buckets packs lang codes into 6 bits")
    code_of = {s: i for i, s in enumerate(lang_list)}
    lang_arr = np.array(lang_list, dtype=object)

    def packed_bigrams(batch: pa.Table) -> pa.Table:
        t = _doc_bigrams(batch)
        if len(t) == 0:
            return t
        codes = np.array(
            [code_of[s] for s in batch["lang"].to_pylist()], dtype=np.int64
        )
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # _doc_bigrams emits rows grouped by source doc; recover each row's
        # batch position by doc_id lookup (doc ids are unique per batch)
        batch_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(
            batch_ids, doc_ids, sorter=np.argsort(batch_ids)
        )
        order = np.argsort(batch_ids)
        packed = doc_ids * 64 + codes[order[pos]]
        return pa.table(
            {"doc_id": pa.array(packed), "big": t["big"], "cnt": t["cnt"]}
        )

    db = docs_l.map_batches(
        packed_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = _lm_agg(db, docs_l)
    if agg is None:
        return out_schema

    def decode(t: pa.Table) -> pa.Table:
        key = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        avg = (
            t["total_bits_milli"].to_numpy(zero_copy_only=False)
            // t["n_bigrams"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(key // 64),
                "lang": pa.array(lang_arr[key % 64], type=pa.string()),
                "avg_bits_milli": pa.array(avg),
            }
        )

    scores = (
        agg.map_batches(decode, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    LO, HI = 0, _CCNET_BITS_HI

    def hist_partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        avg = batch["avg_bits_milli"].to_numpy(zero_copy_only=False)
        if len(avg) and int(avg.max()) > HI:
            raise ValueError(
                f"avg_bits_milli exceeds histogram domain [{LO},{HI}]"
            )
        uk, inv = np.unique(langs, return_inverse=True)
        mat = np.zeros((len(uk), HI - LO + 1), dtype=np.int64)
        if len(avg):
            np.add.at(mat, (inv, avg - LO), 1)
        return pa.table(
            {
                "lang": pa.array(uk, type=pa.string()),
                "counts": pa.array(list(mat), type=pa.list_(pa.int64())),
            }
        )

    def threshold_group(g: pd.DataFrame) -> pd.DataFrame:
        hist = np.zeros(HI - LO + 1, dtype=np.int64)
        for c in g["counts"]:
            hist += np.asarray(c, dtype=np.int64)
        n = int(hist.sum())
        cum = np.cumsum(hist)
        # DuckDB quantile_disc: sorted[ceil(p*n)-1], exact integer form
        i1 = (n + 2) // 3 - 1
        i2 = (2 * n + 2) // 3 - 1
        t1 = LO + int(np.searchsorted(cum, i1 + 1, side="left"))
        t2 = LO + int(np.searchsorted(cum, i2 + 1, side="left"))
        return pd.DataFrame(
            {"lang": [g["lang"].iloc[0]], "t1": [t1], "t2": [t2]}
        )

    th = (
        scores.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("lang")
        .map_groups(threshold_group, batch_format="pandas")
        .to_pandas()  # |langs| rows
    )
    t1_by_code = np.zeros(len(lang_list), dtype=np.int64)
    t2_by_code = np.zeros(len(lang_list), dtype=np.int64)
    for _, row in th.iterrows():
        t1_by_code[code_of[str(row["lang"])]] = int(row["t1"])
        t2_by_code[code_of[str(row["lang"])]] = int(row["t2"])

    buckets = np.array(["head", "middle", "tail"], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema
        codes = np.array(
            [code_of[s] for s in batch["lang"].to_pylist()], dtype=np.int64
        )
        avg = batch["avg_bits_milli"].to_numpy(zero_copy_only=False)
        b = np.where(
            avg <= t1_by_code[codes],
            0,
            np.where(avg <= t2_by_code[codes], 1, 2),
        )
        return batch.append_column(
            "bucket", pa.array(buckets[b], type=pa.string())
        )

    return scores.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Naive-Bayes language classifier, trained ON the corpus (fastText-style
# supervised lang-id, the classical multinomial-NB reduction): per-(lang,
# token) add-one-smoothed counts are the model; every document is then
# scored against all K languages and assigned the argmin total milli-bits
# (= argmax log-likelihood), tie-broken lang-ascending. All log-probs are
# fixed-point INTEGER milli-bits (same contract as lm_score above) so sums
# are order-independent and the oracle compare is value-exact.
#
# Distributed shape (the model is vocabulary-sized, never corpus-sized):
#   train  per-batch (tok x class) one-hot count pre-agg -> groupby(tok)
#          summing K count columns -> WIDE model table (tok, c_0..c_K-1)
#   derive per-class totals + vocab size V (dataset aggregates), per-class
#          priors (tiny groupby) -> K-element driver arrays
#   score  doc-token counts hash-join the K-wide delta table on tok -> one
#          groupby(doc_id) summing K partial columns -> batch-local argmin.
# Seen-token bits enter as DELTAS vs the unseen-token floor so a doc's
# score needs only the tokens it contains: score(d,c) = prior_bits[c] +
# ntoks(d)*unseen_bits[c] + sum_t cnt*(bits[c,t] - unseen_bits[c]).
# ---------------------------------------------------------------------------
_NB_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         string_split_regex({{trim}}, '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
),
tok AS (SELECT doc_id, lang, unnest(w) AS tok FROM d),
dt AS (SELECT doc_id, lang, tok, count(*) AS cnt FROM tok GROUP BY ALL),
clt AS (SELECT lang AS clang, tok, sum(cnt) AS c FROM dt GROUP BY clang, tok),
cl AS (SELECT clang, sum(c) AS cl FROM clt GROUP BY clang),
v AS (SELECT count(DISTINCT tok) AS v FROM tok),
nd AS (SELECT lang AS clang, count(*) AS nd FROM d GROUP BY clang),
ntot AS (SELECT count(*) AS n FROM d),
langs AS (
  SELECT clang, CAST(row_number() OVER (ORDER BY clang) - 1 AS BIGINT) AS code
  FROM (SELECT DISTINCT clang FROM cl)
),
consts AS (
  SELECT langs.clang, langs.code,
         CAST(floor(-log2(nd.nd * 1.0 / ntot.n) * 1000 + 0.5) AS BIGINT)
             AS prior_bits,
         CAST(floor(-log2(1.0 / (cl.cl + v.v)) * 1000 + 0.5) AS BIGINT)
             AS unseen_bits
  FROM langs JOIN cl USING (clang) JOIN nd USING (clang)
  CROSS JOIN v CROSS JOIN ntot
),
delta AS (
  SELECT clt.tok, consts.code,
         CAST(floor(-log2((clt.c + 1.0) / (cl.cl + v.v)) * 1000 + 0.5)
              AS BIGINT) - consts.unseen_bits AS delta
  FROM clt JOIN cl USING (clang) JOIN consts USING (clang) CROSS JOIN v
),
docs_n AS (SELECT doc_id, lang, sum(cnt) AS ntoks FROM dt GROUP BY doc_id, lang),
dsum AS (
  SELECT dt.doc_id, delta.code, sum(dt.cnt * delta.delta) AS ds
  FROM dt JOIN delta USING (tok) GROUP BY dt.doc_id, delta.code
),
score AS (
  SELECT docs_n.doc_id, docs_n.lang, consts.code,
         consts.prior_bits + docs_n.ntoks * consts.unseen_bits
             + coalesce(dsum.ds, 0) AS s
  FROM docs_n CROSS JOIN consts
  LEFT JOIN dsum ON dsum.doc_id = docs_n.doc_id AND dsum.code = consts.code
),
win AS (
  SELECT doc_id, lang, min(s * 64 + code) AS packed
  FROM score GROUP BY doc_id, lang
)
SELECT win.doc_id, win.lang, langs.clang AS pred_lang,
       CAST(win.packed // 64 AS BIGINT) AS best_bits_milli,
       CAST(win.lang = langs.clang AS BIGINT) AS correct
FROM win JOIN langs ON langs.code = win.packed % 64
"""


def _nb_sql() -> str:
    from ..corpus import SQL_TRIM

    return _NB_SQL.format(trim=SQL_TRIM)


def _lang_doc_counts(batch: pa.Table) -> pa.Table:
    """Per-lang doc counts over non-null-text docs. Runs on the DOCS
    dataset (one row per doc), so per-batch partials can never split a
    doc across batches — distinct-doc counting stays exact."""
    mask = pc.is_valid(batch["text"])
    t = batch.filter(mask)
    if len(t) == 0:
        return pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "nd_part": pa.array([], type=pa.int64()),
            }
        )
    g = t.select(["lang"]).group_by("lang").aggregate([([], "count_all")])
    return pa.table(
        {
            "lang": g["lang"],
            "nd_part": g["count_all"].cast(pa.int64()),
        }
    )


def _nb_doc_tok_counts(batch: pa.Table) -> pa.Table:
    """Per-(doc, token) counts with the doc's lang carried: the one
    corpus-sized intermediate both the trainer and the scorer consume."""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lang": pa.array([], type=pa.string()),
            "tok": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    ft = _FlatTokens(batch)
    total = int(ft.counts.sum())
    if total == 0:  # all-null text
        return empty
    uniq, inv = np.unique(ft.tokens, return_inverse=True)
    pair = ft.row_idx * len(uniq) + inv
    pair_ids, pair_inv = np.unique(pair, return_inverse=True)
    cnt = np.bincount(pair_inv, minlength=len(pair_ids)).astype(np.int64)
    rows = pair_ids // len(uniq)
    toks = pair_ids % len(uniq)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    langs = batch["lang"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[rows], type=pa.int64()),
            "lang": pa.array(langs[rows], type=pa.string()),
            "tok": pa.array(uniq[toks], type=pa.string()),
            "cnt": pa.array(cnt),
        }
    )


@query("nb_lang", _nb_sql())
def q_nb_lang(sf_dir: str):
    from ray.data.aggregate import Min, Sum

    from .extraction import parquet_num_rows, read_documents

    out_schema = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lang": pa.array([], type=pa.string()),
            "pred_lang": pa.array([], type=pa.string()),
            "best_bits_milli": pa.array([], type=pa.int64()),
            "correct": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return out_schema

    docs = read_documents(sf_dir, ["doc_id", "text", "lang"])
    dt = docs.map_batches(
        _nb_doc_tok_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    # priors: docs per lang over non-null-text docs (tiny driver table)
    prior_df = (
        docs.map_batches(
            _lang_doc_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("lang")
        .aggregate(Sum("nd_part", alias_name="nd_part"))
        .to_pandas()
    )
    if len(prior_df) == 0:  # every doc had null text
        return out_schema
    lang_list = sorted(prior_df["lang"].astype(str).tolist())
    k = len(lang_list)
    if k > 63:
        raise ValueError("nb_lang packs lang codes into 6 bits (<=63 langs)")
    code_of = {s: i for i, s in enumerate(lang_list)}
    nd = np.array(
        [int(prior_df.set_index("lang")["nd_part"][s]) for s in lang_list],
        dtype=np.int64,
    )
    n_docs_total = int(nd.sum())

    c_cols = [f"c_{i}" for i in range(k)]

    def train_partial(t: pa.Table) -> pa.Table:
        cols = {"tok": pa.array([], type=pa.string())}
        cols.update(
            {c: pa.array([], type=pa.int64()) for c in c_cols}
        )
        if len(t) == 0:
            return pa.table(cols)
        toks = t["tok"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        codes = np.array(
            [code_of[s] for s in t["lang"].to_pylist()], dtype=np.int64
        )
        uniq, inv = np.unique(toks, return_inverse=True)
        acc = np.zeros((len(uniq), k), dtype=np.int64)
        np.add.at(acc, (inv, codes), cnt)
        out = {"tok": pa.array(uniq, type=pa.string())}
        for i, c in enumerate(c_cols):
            out[c] = pa.array(acc[:, i])
        return pa.table(out)

    model = (
        dt.map_batches(train_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(*[Sum(c, alias_name=c) for c in c_cols])
        .repartition(4)
        .materialize()
    )
    vocab_v = model.count()
    if vocab_v == 0:
        return out_schema
    cl_row = model.aggregate(*[Sum(c, alias_name=c) for c in c_cols])
    cl = np.array([int(cl_row[c]) for c in c_cols], dtype=np.int64)

    prior_bits = np.floor(
        -np.log2(nd.astype(np.float64) / float(n_docs_total)) * 1000.0 + 0.5
    ).astype(np.int64)
    unseen_bits = np.floor(
        -np.log2(1.0 / (cl.astype(np.float64) + float(vocab_v))) * 1000.0
        + 0.5
    ).astype(np.int64)

    d_cols = [f"d_{i}" for i in range(k)]

    def to_delta(t: pa.Table) -> pa.Table:
        out = {"tok": t["tok"]}
        for i in range(k):
            c = t[c_cols[i]].to_numpy(zero_copy_only=False).astype(np.float64)
            bits = np.floor(
                -np.log2((c + 1.0) / (float(cl[i]) + float(vocab_v)))
                * 1000.0
                + 0.5
            ).astype(np.int64)
            # unseen cells (c==0) carry delta 0: their bits ARE the floor
            out[d_cols[i]] = pa.array(
                np.where(c > 0, bits - unseen_bits[i], 0)
            )
        return pa.table(out)

    delta_tbl = (
        model.map_batches(to_delta, batch_format="pyarrow")
        .repartition(4)
        .materialize()
    )

    def score_partial(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.array(
            [code_of[s] for s in t["lang"].to_pylist()], dtype=np.int64
        )
        out = {
            "doc_id": t["doc_id"],
            "true_code": pa.array(codes),
            "cnt": pa.array(cnt),
        }
        for i in range(k):
            d = t[d_cols[i]].to_numpy(zero_copy_only=False).astype(np.int64)
            out[f"p_{i}"] = pa.array(cnt * d)
        return pa.table(out)

    # the delta model is vocab-sized — broadcast it under the same cap as
    # the LM bits table (dict lookup per batch) instead of a 16-partition
    # hash join; giant vocabularies keep the join path
    if vocab_v <= LM_BITS_BROADCAST_CAP:
        import ray as _ray

        ddf = delta_tbl.to_pandas()  # model-sized by the gate
        dmat = ddf[d_cols].to_numpy().astype(np.int64)
        lut_ref = _ray.put(
            {t: i for i, t in enumerate(ddf["tok"].tolist())}
        )
        dmat_ref = _ray.put(dmat)

        def attach_delta(t: pa.Table) -> pa.Table:
            import ray

            lut = ray.get(lut_ref)
            dm = ray.get(dmat_ref)
            toks = t["tok"].to_pylist()
            idx = np.fromiter(
                (lut.get(s, -1) for s in toks), dtype=np.int64,
                count=len(toks),
            )
            hit = idx >= 0  # inner-join semantics
            t = t.filter(pa.array(hit))
            rows = dm[idx[hit]]
            out = {c: t[c] for c in t.column_names}
            for i in range(k):
                out[d_cols[i]] = pa.array(rows[:, i])
            return pa.table(out)

        joined = dt.map_batches(
            attach_delta, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        joined = dt.join(
            delta_tbl, join_type="inner", num_partitions=16, on=("tok",)
        )
    scored = (
        joined.map_batches(score_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Min("true_code", alias_name="true_code"),
            Sum("cnt", alias_name="ntoks"),
            *[Sum(f"p_{i}", alias_name=f"p_{i}") for i in range(k)],
        )
    )

    lang_arr = np.array(lang_list, dtype=object)

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lang": pa.array([], type=pa.string()),
                    "pred_lang": pa.array([], type=pa.string()),
                    "best_bits_milli": pa.array([], type=pa.int64()),
                    "correct": pa.array([], type=pa.int64()),
                }
            )
        ntoks = t["ntoks"].to_numpy(zero_copy_only=False).astype(np.int64)
        true_code = (
            t["true_code"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        scores = np.empty((len(t), k), dtype=np.int64)
        for i in range(k):
            scores[:, i] = (
                prior_bits[i]
                + ntoks * unseen_bits[i]
                + t[f"p_{i}"].to_numpy(zero_copy_only=False)
            )
        pred = np.argmin(scores, axis=1)  # first min = lang-asc tie-break
        best = scores[np.arange(len(t)), pred]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": pa.array(lang_arr[true_code], type=pa.string()),
                "pred_lang": pa.array(lang_arr[pred], type=pa.string()),
                "best_bits_milli": pa.array(best),
                "correct": pa.array((pred == true_code).astype(np.int64)),
            }
        )

    return scored.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016): R merge rounds learned
# from corpus word frequencies. The classic distributed factorization: one
# corpus pass builds the (word, count) table — BPE statistics depend ONLY
# on it — then every merge round runs over that (much smaller) table:
# per-batch weighted adjacent-pair partial counts -> groupby(pair).sum ->
# distributed sort for the argmax (count desc, pair asc tie-break) ->
# vectorless greedy left-to-right apply pass. The corpus is never touched
# again after pass 1; the driver holds only the R winning merges.
#
# Merge application is inherently sequential per word (greedy non-
# overlapping), so the semantics are not SQL-expressible — this is a
# rows-only registry entry; exactness is pinned by a pytest against an
# independent single-process BPE reference implementation.
# ---------------------------------------------------------------------------
BPE_ROUNDS = 8


def _word_freq_ds(sf_dir: str):
    """Distributed (word, count) table — the only corpus-sized pass."""
    from ray.data.aggregate import Sum

    from .extraction import read_documents

    def freq_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        ft = _FlatTokens(batch)
        vals, counts = np.unique(ft.tokens, return_counts=True)
        return pa.table(
            {
                "word": pa.array(vals, type=pa.string()),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(freq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .repartition(2)
        .materialize()
    )


def _apply_merge(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right non-overlapping merge of the pair (a, b)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(sf_dir: str, rounds: int = BPE_ROUNDS) -> list[tuple]:
    """Learn ``rounds`` merges; returns [(left, right, pair_count)]."""
    from ray.data.aggregate import Sum

    words = _word_freq_ds(sf_dir)
    if words.count() == 0:
        return []

    def to_syms(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in t["word"].to_pylist()],
                    type=pa.list_(pa.string()),
                ),
                "cnt": t["cnt"],
            }
        )

    tbl = words.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple] = []
    for _ in range(rounds):

        def pair_partial(t: pa.Table) -> pa.Table:
            pairs: dict = {}
            for syms, c in zip(t["syms"].to_pylist(), t["cnt"].to_pylist()):
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    pairs[k] = pairs.get(k, 0) + c
            if not pairs:
                return pa.table(
                    {
                        "pair": pa.array([], type=pa.string()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            ks, vs = zip(*pairs.items())
            return pa.table(
                {
                    "pair": pa.array([a + "\x00" + b for a, b in ks]),
                    "n": pa.array(list(vs), type=pa.int64()),
                }
            )

        top = (
            tbl.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("n", alias_name="n"))
            .sort(["n", "pair"], descending=[True, False])
            .limit(1)
            .take_all()
        )
        if not top:
            break
        a, b = top[0]["pair"].split("\x00")
        merges.append((a, b, int(top[0]["n"])))

        def apply_round(t: pa.Table, a=a, b=b) -> pa.Table:
            return pa.table(
                {
                    "syms": pa.array(
                        [
                            _apply_merge(s, a, b)
                            for s in t["syms"].to_pylist()
                        ],
                        type=pa.list_(pa.string()),
                    ),
                    "cnt": t["cnt"],
                }
            )

        tbl = tbl.map_batches(
            apply_round, batch_format="pyarrow"
        ).materialize()
    return merges


@query("bpe_merges")
def q_bpe_merges(sf_dir: str):
    merges = bpe_train(sf_dir)
    return pa.table(
        {
            "rnk": pa.array(
                np.arange(1, len(merges) + 1, dtype=np.int64)
            ),
            "left": pa.array([m[0] for m in merges], type=pa.string()),
            "right": pa.array([m[1] for m in merges], type=pa.string()),
            "merged": pa.array(
                [m[0] + m[1] for m in merges], type=pa.string()
            ),
            "pair_count": pa.array(
                [m[2] for m in merges], type=pa.int64()
            ),
        }
    )


@query("bpe_token_counts")
def q_bpe_token_counts(sf_dir: str):
    """Apply the learned merges to the corpus: subword count per doc.

    The R merges are a driver-held list (bytes, not data) broadcast into
    an embarrassingly parallel encode scan; per batch, each DISTINCT word
    is encoded once and the per-doc subword count is a vectorized
    gather-sum over word indices."""
    from .extraction import parquet_num_rows, read_documents

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_words": pa.array([], type=pa.int64()),
            "n_subwords": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty
    merges = [(a, b) for a, b, _ in bpe_train(sf_dir)]

    def encode_len(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        return len(syms)

    def per_doc(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        ft = _FlatTokens(batch)
        if int(ft.counts.sum()) == 0:
            return empty
        uniq, inv = np.unique(ft.tokens, return_inverse=True)
        lens = np.array([encode_len(w) for w in uniq], dtype=np.int64)
        n_docs = len(batch)
        n_words = np.zeros(n_docs, dtype=np.int64)
        n_sub = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_words, ft.row_idx, 1)
        np.add.at(n_sub, ft.row_idx, lens[inv])
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_words": pa.array(n_words),
                "n_subwords": pa.array(n_sub),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Fixed-size deterministic per-stratum sample: exactly K docs per language,
# chosen by a Knuth-multiplicative-hash rank (prime modulus, so the
# multiply is a bijection — uniform, seedable, and SQL-exact with zero
# RNG). Complements stratified_sample (rate-based): eval sets and
# per-language probes want exact counts, not rates. Distributed shape:
# per-batch partial top-K per language (only K x |langs| rows leave each
# batch), one tiny groupby(lang) merge — the classic distributed top-k.
# ---------------------------------------------------------------------------
_SAMPLE_K = 20
_SAMPLE_M = 1_000_003  # prime > any (doc_id % M): multiply stays a bijection

_SAMPLE_K_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         ((doc_id % {_SAMPLE_M}) * ({_MIX_KNUTH} % {_SAMPLE_M}))
             % {_SAMPLE_M} AS hk
  FROM documents
),
r AS (
  SELECT doc_id, lang, hk,
         row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rnk
  FROM h
)
SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {_SAMPLE_K}
"""


@query("sample_per_lang", _SAMPLE_K_SQL)
def q_sample_per_lang(sf_dir: str):
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "hk": pa.array([], type=pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hk = ((ids % _SAMPLE_M) * (_MIX_KNUTH % _SAMPLE_M)) % _SAMPLE_M
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(langs, return_inverse=True)
        keep = np.zeros(len(ids), dtype=bool)
        order = np.lexsort((ids, hk, inv))  # by (lang, hk, doc_id)
        pos_in_lang = (
            np.arange(len(ids))
            - np.searchsorted(inv[order], np.arange(len(uk)))[inv[order]]
        )
        keep[order] = pos_in_lang < _SAMPLE_K
        m = pa.array(keep)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "lang": batch["lang"].filter(m),
                "hk": pa.array(hk[keep]),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hk", "doc_id"]).head(_SAMPLE_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "lang": g["lang"],
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    from .extraction import read_documents

    return (
        read_documents(sf_dir, ["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Cross-source contamination audit: how many distinct document
# fingerprints each pair of sources shares (diagonal = distinct docs per
# source). The standard pre-training leakage check between crawls /
# snapshots / curated subsets. Distributed shape: distinct (fp, source)
# pairs via a packed-key count aggregate (strictly smaller than the
# corpus), then ONE self-hash-join on fp — per-fp fanout is bounded by
# |sources|, and only |sources|^2 packed pair counts leave the final
# aggregate.
# ---------------------------------------------------------------------------
_SRC_OVERLAP_SQL = """
WITH p AS (
  SELECT DISTINCT md5(text) AS fp, source
  FROM documents WHERE text IS NOT NULL
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM p a JOIN p b ON a.fp = b.fp AND a.source <= b.source
GROUP BY source_a, source_b
"""


@query("source_overlap", _SRC_OVERLAP_SQL)
def q_source_overlap(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from .extraction import parquet_num_rows, read_documents

    empty = pa.table(
        {
            "source_a": pa.array([], type=pa.string()),
            "source_b": pa.array([], type=pa.string()),
            "n_shared": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    def fp_src(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))
        if len(batch) == 0:
            return pa.table({"k": pa.array([], type=pa.string())})
        t = md5_fingerprint_batch(batch)
        return pa.table(
            {
                "k": pc.binary_join_element_wise(
                    t["fingerprint"], batch["source"], "\x00"
                )
            }
        )

    dp = (
        read_documents(sf_dir, ["doc_id", "text", "source"])
        .map_batches(fp_src, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "fp": pc.list_element(
                        pc.split_pattern(t["k"], "\x00"), 0
                    ),
                    "source": pc.list_element(
                        pc.split_pattern(t["k"], "\x00"), 1
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        # collapse hash-aggregate's empty schema-less blocks before the
        # self-join; materialized so both join sides share one execution
        .repartition(8)
        .materialize()
    )

    joined = dp.join(
        dp.map_batches(
            lambda t: pa.table({"fp": t["fp"], "source_b": t["source"]}),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=8,
        on=("fp",),
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        m = pc.less_equal(t["source"], t["source_b"])
        t = t.filter(m)
        if len(t) == 0:
            return pa.table(
                {
                    "pk": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        pk = pc.binary_join_element_wise(
            t["source"], t["source_b"], "\x00"
        )
        g = pa.table({"pk": pk}).group_by("pk").aggregate([([], "count_all")])
        return pa.table(
            {"pk": g["pk"], "n": g["count_all"].cast(pa.int64())}
        )

    agg = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("n", alias_name="n_shared"))
    )

    def decode(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        parts = pc.split_pattern(t["pk"], "\x00")
        return pa.table(
            {
                "source_a": pc.list_element(parts, 0),
                "source_b": pc.list_element(parts, 1),
                "n_shared": t["n_shared"],
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PMI collocations (classic corpus-linguistics phrase mining; the phrase
# detector behind word2vec-style "new_york" merging): pointwise mutual
# information over the corpus bigram distribution with slot marginals,
# pmi(a,b) = log2(c(ab) * N / (c(a·) * c(·b))), reported as fixed-point
# integer milli-bits (same contract as lm_score) and top-K'd with a fully
# deterministic (pmi desc, w1, w2) order. Reuses the lm_score bigram
# stream: global counts via one shuffle, marginals as two derived
# model-sized tables joined back (materialized between — the ray 2.49
# two-joins-per-plan trap), a scalar N, then a tiny sort+limit.
# ---------------------------------------------------------------------------
_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20

_PMI_SQL = """
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
),
pos AS (
  SELECT w[CAST(i AS BIGINT)] AS w1, w[CAST(i + 1 AS BIGINT)] AS w2
  FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
),
cb AS (SELECT w1, w2, count(*) AS cab FROM pos GROUP BY w1, w2),
cu AS (SELECT w1, sum(cab) AS ca FROM cb GROUP BY w1),
cv AS (SELECT w2, sum(cab) AS cbm FROM cb GROUP BY w2),
n AS (SELECT sum(cab) AS n FROM cb),
pmi AS (
  SELECT cb.w1, cb.w2, cb.cab,
         CAST(floor(log2((cb.cab * 1.0 * n.n) / (cu.ca * 1.0 * cv.cbm))
                    * 1000 + 0.5) AS BIGINT) AS pmi_milli
  FROM cb JOIN cu USING (w1) JOIN cv USING (w2) CROSS JOIN n
  WHERE cb.cab >= {mc}
)
SELECT w1, w2, CAST(cab AS BIGINT) AS cab, pmi_milli
FROM pmi ORDER BY pmi_milli DESC, w1, w2 LIMIT {k}
""".format(mc=_PMI_MIN_COUNT, k=_PMI_TOP_K)


@query("pmi_collocations", _PMI_SQL)
def q_pmi_collocations(sf_dir: str):
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows, read_documents

    empty = pa.table(
        {
            "w1": pa.array([], type=pa.string()),
            "w2": pa.array([], type=pa.string()),
            "cab": pa.array([], type=pa.int64()),
            "pmi_milli": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    docs = read_documents(sf_dir, ["doc_id", "text"])
    db = docs.map_batches(
        _doc_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    cbt = (
        db.map_batches(
            lambda t: pa.table({"big": t["big"], "cnt": t["cnt"]}),
            batch_format="pyarrow",
        )
        .groupby("big")
        .aggregate(Sum("cnt", alias_name="cab"))
        .map_batches(
            lambda t: pa.table(
                {
                    "big": t["big"],
                    "w1": pc.list_element(
                        pc.split_pattern(t["big"], "\x00"), 0
                    ),
                    "w2": pc.list_element(
                        pc.split_pattern(t["big"], "\x00"), 1
                    ),
                    "cab": t["cab"],
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(4)
        .materialize()
    )
    if cbt.count() == 0:
        return empty
    n_total = int(cbt.aggregate(Sum("cab", alias_name="s"))["s"])

    # marginals and the min-count pre-filter all derive lazily from the
    # one materialized count table; each join still runs in its own plan
    # (materialized between) for the ray 2.49 two-joins-per-plan trap
    # repartition collapses the hash-aggregate's empty schema-less blocks
    # before each table becomes a join side (FieldRef trap)
    cu = (
        cbt.groupby("w1")
        .aggregate(Sum("cab", alias_name="ca"))
        .repartition(4)
    )
    cv = (
        cbt.groupby("w2")
        .aggregate(Sum("cab", alias_name="cbm"))
        .repartition(4)
    )

    # pre-filter on min count BEFORE joining marginals: the joined table
    # shrinks from |bigram vocab| to |candidate collocations|
    cand = (
        cbt.map_batches(
            lambda t: t.filter(pc.greater_equal(t["cab"], _PMI_MIN_COUNT)),
            batch_format="pyarrow",
        )
        .repartition(4)
        .materialize()
    )
    if cand.count() == 0:  # no bigram reaches the support floor
        return empty
    j1 = (
        cand.join(cu, join_type="inner", num_partitions=4, on=("w1",))
        .repartition(4)
        .materialize()
    )

    def score(t: pa.Table) -> pa.Table:
        cab = t["cab"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.float64)
        cbm = t["cbm"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.floor(
            np.log2((cab * float(n_total)) / (ca * cbm)) * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "cab": t["cab"].cast(pa.int64()),
                "pmi_milli": pa.array(pmi),
            }
        )

    return (
        j1.join(cv, join_type="inner", num_partitions=4, on=("w2",))
        .map_batches(score, batch_format="pyarrow")
        .sort(["pmi_milli", "w1", "w2"], descending=[True, False, False])
        .limit(_PMI_TOP_K)
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC for corpus refreshes): classify every doc as added /
# removed / changed / same between two deterministic corpus views (old =
# doc_id%10 < 8, new = doc_id%10 >= 2, with text revised in the new
# snapshot for doc_id%10 == 5) by comparing content fingerprints through
# ONE full-outer hash join on doc_id. The incremental-ingestion audit
# every recurring crawl pipeline runs; at 10^12 docs the join is the only
# all-to-all and both inputs are (id, fp) projections, never the text.
# ---------------------------------------------------------------------------
_SNAP_SQL = """
WITH old AS (
  SELECT doc_id, md5(text) AS fp FROM documents
  WHERE text IS NOT NULL AND doc_id % 10 < 8
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END)
             AS fp
  FROM documents WHERE text IS NOT NULL AND doc_id % 10 >= 2
)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            WHEN old.fp = new.fp THEN 'same'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


@query("snapshot_diff", _SNAP_SQL)
def q_snapshot_diff(sf_dir: str):
    import hashlib

    from .extraction import parquet_num_rows, read_documents

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "status": pa.array([], type=pa.string()),
        }
    )
    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs == 0:
        return empty

    def snap(batch: pa.Table, which: str) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if which == "old":
            m = ids % 10 < 8
        else:
            m = ids % 10 >= 2
        batch = batch.filter(pa.array(m))
        ids = ids[m]
        texts = batch["text"].to_pylist()
        if which == "new":
            texts = [
                t + " v2" if i % 10 == 5 else t
                for i, t in zip(ids, texts)
            ]
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "fp": pa.array(fps, type=pa.string()),
            }
        )

    def snap_new(b: pa.Table) -> pa.Table:
        t = snap(b, "new")
        return pa.table({"doc_id_n": t["doc_id"], "fp_n": t["fp"]})

    if n_docs < 32:
        # degenerate-corpus fast path: a snapshot side that comes out
        # fully empty reaches ray's full_outer hash shuffle as
        # schema-less blocks and the acero join loses its key column
        # (1-row sweep). Tiny corpora diff on the driver instead; at
        # real scale neither side is ever empty.
        import pyarrow.parquet as pq_mod

        tbl = pq_mod.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        o = snap(tbl, "old").to_pandas().set_index("doc_id")["fp"]
        n = snap(tbl, "new").to_pandas().set_index("doc_id")["fp"]
        ids = sorted(set(o.index) | set(n.index))
        status = [
            "added" if i not in o.index
            else "removed" if i not in n.index
            else "same" if o[i] == n[i]
            else "changed"
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "status": pa.array(status, type=pa.string()),
            }
        )

    docs = read_documents(sf_dir, ["doc_id", "text"])
    old = docs.map_batches(
        lambda b: snap(b, "old"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    new = docs.map_batches(
        snap_new, batch_format="pyarrow", zero_copy_batch=True
    )

    joined = old.join(
        new,
        join_type="full_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("doc_id_n",),
    )

    def classify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        # ray's full_outer join coalesces the key: doc_id is never null;
        # side presence is carried by each side's fingerprint nullity.
        # A fully-empty side can drop its column from the joined schema
        # (observed on 1-row corpora) — treat a missing column as absent.
        nulls = pa.nulls(len(t), type=pa.string())
        fp_col = t["fp"] if "fp" in t.column_names else nulls
        fpn_col = t["fp_n"] if "fp_n" in t.column_names else nulls
        has_old = pc.is_valid(fp_col).to_numpy(zero_copy_only=False)
        has_new = pc.is_valid(fpn_col).to_numpy(zero_copy_only=False)
        fp_o = fp_col.to_numpy(zero_copy_only=False)
        fp_n = fpn_col.to_numpy(zero_copy_only=False)
        status = np.where(
            ~has_old,
            "added",
            np.where(
                ~has_new,
                "removed",
                np.where(fp_o == fp_n, "same", "changed"),
            ),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "status": pa.array(status.astype(object), type=pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Novelty scoring (memorization-risk / boilerplate audit): per document,
# how many of its distinct word trigrams occur in NO other document
# (global df == 1). One doc per row keeps per-doc gram distinct batch-local;
# the single big shuffle is the gram-frequency aggregate. The join-back is
# avoided by the df==1 CARRIER trick: a unique gram's only doc_id IS
# min(doc_id) in its gram group, so unique counts flow back as a tiny
# (doc_id, n) aggregate instead of re-shipping the gram stream through a
# second all-to-all.
# ---------------------------------------------------------------------------
_NOVELTY_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents
),
g AS (
  SELECT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS gram
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
),
dg AS (SELECT DISTINCT doc_id, gram FROM g),
df AS (SELECT gram, count(*) AS df, min(doc_id) AS only_doc
       FROM dg GROUP BY gram),
uniq AS (SELECT only_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_unique
         FROM df WHERE df = 1 GROUP BY only_doc),
per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
            FROM dg GROUP BY doc_id)
SELECT p.doc_id, p.n_grams, CAST(coalesce(u.n_unique, 0) AS BIGINT)
           AS n_unique
FROM per_doc p LEFT JOIN uniq u USING (doc_id)
"""


@query("novelty_scores", _NOVELTY_SQL)
def q_novelty_scores(sf_dir: str):
    from ray.data.aggregate import Count, Min, Sum

    from .extraction import parquet_num_rows, read_documents

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_grams": pa.array([], type=pa.int64()),
            "n_unique": pa.array([], type=pa.int64()),
        }
    )
    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs == 0:
        return empty

    def doc_grams(batch: pa.Table) -> pa.Table:
        """Distinct (doc_id, gram) pairs — batch-local exact because each
        document is one row and blocks split only at row boundaries."""
        g, ridx = _grams3(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"doc_id": ids[ridx], "gram": g.to_pandas()}
        ).drop_duplicates()
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()),
                "gram": pa.array(df["gram"], type=pa.string()),
            }
        )

    if n_docs < 32:
        # degenerate shards: an empty join side reaches the hash join as
        # schema-less blocks (1-row sweep); compute on the driver instead
        import pyarrow.parquet as pq_mod

        raw = pq_mod.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        raw = raw.filter(pc.is_valid(raw["text"]))
        df = doc_grams(raw).to_pandas()
        if len(df) == 0:
            return empty
        per_doc = df.groupby("doc_id").size()
        dfreq = df.groupby("gram").agg(
            df=("doc_id", "size"), only_doc=("doc_id", "min")
        )
        uniq = (
            dfreq[dfreq["df"] == 1].groupby("only_doc").size()
        )
        return pa.table(
            {
                "doc_id": pa.array(per_doc.index.to_numpy(), type=pa.int64()),
                "n_grams": pa.array(
                    per_doc.to_numpy().astype(np.int64)
                ),
                "n_unique": pa.array(
                    np.array(
                        [int(uniq.get(d, 0)) for d in per_doc.index],
                        dtype=np.int64,
                    )
                ),
            }
        )

    pairs = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        doc_grams, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_doc_counts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(vals),
                "n_grams": pa.array(cnt.astype(np.int64)),
            }
        )

    per_doc = (
        pairs.map_batches(per_doc_counts, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_grams", alias_name="n_grams"))
        .repartition(8)
    )

    uniq = (
        pairs.groupby("gram")
        .aggregate(
            Count(alias_name="df"), Min("doc_id", alias_name="only_doc")
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "udoc": t.filter(pc.equal(t["df"], 1))["only_doc"]
                    .cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def uniq_counts(batch: pa.Table) -> pa.Table:
        ids = batch["udoc"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "udoc": pa.array(vals.astype(np.int64)),
                "n_unique": pa.array(cnt.astype(np.int64)),
            }
        )

    uniq_per_doc = (
        uniq.map_batches(uniq_counts, batch_format="pyarrow")
        .groupby("udoc")
        .aggregate(Sum("n_unique", alias_name="n_unique"))
        .repartition(4)
    )

    joined = per_doc.join(
        uniq_per_doc,
        join_type="left_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("udoc",),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = len(t)
        nu = (
            t["n_unique"]
            if "n_unique" in t.column_names
            else pa.nulls(n, type=pa.int64())
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_grams": t["n_grams"].cast(pa.int64()),
                "n_unique": pc.fill_null(nu, 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher-style quality-rule battery (Rae et al. 2021 "Scaling Language
# Models" §A.2 repetition/quality filters, adapted to the synthetic corpus):
# five named per-document rules evaluated in ONE vectorized tokenization
# pass, each emitted as an explicit 0/1 flag plus the composite verdict.
# Unlike quality_stats (raw counters) this is the *decision* operator a
# training-data pipeline applies before mixing. All comparisons are integer
# cross-multiplications so the DuckDB oracle hashes exactly. Embarrassingly
# parallel: no shuffle, one map_batches over a column-pruned read.
# ---------------------------------------------------------------------------
_GOPHER_SQL = """
WITH w AS (
  SELECT doc_id,
    string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS ws
  FROM documents
),
s AS (
  SELECT doc_id, len(ws) AS n_words,
    (SELECT coalesce(sum(strlen(x)), 0) FROM unnest(ws) AS t(x)) AS total_len,
    (SELECT count(*) FROM unnest(ws) AS t(x) WHERE x IN ('the','a')) AS n_stop,
    (SELECT count(*) FROM unnest(ws) AS t(x) WHERE strlen(x) <= 3) AS n_short,
    (SELECT coalesce(max(c), 0) FROM
       (SELECT count(*) c FROM unnest(ws) AS t(x) GROUP BY x)) AS mode_cnt
  FROM w
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(CASE WHEN n_words BETWEEN 30 AND 80 THEN 1 ELSE 0 END AS BIGINT)
    AS len_ok,
  CAST(CASE WHEN 10 * total_len >= 43 * n_words
             AND 10 * total_len <= 48 * n_words THEN 1 ELSE 0 END AS BIGINT)
    AS mean_len_ok,
  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS stop_ok,
  CAST(CASE WHEN 100 * n_short <= 25 * n_words THEN 1 ELSE 0 END AS BIGINT)
    AS short_ok,
  CAST(CASE WHEN 100 * mode_cnt <= 10 * n_words THEN 1 ELSE 0 END AS BIGINT)
    AS mode_ok,
  CAST(CASE WHEN n_words BETWEEN 30 AND 80
             AND 10 * total_len >= 43 * n_words
             AND 10 * total_len <= 48 * n_words
             AND n_stop >= 2
             AND 100 * n_short <= 25 * n_words
             AND 100 * mode_cnt <= 10 * n_words THEN 1 ELSE 0 END AS BIGINT)
    AS passes
FROM s
"""


def gopher_rules_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher rule flags (module-level so domain_quality reuses it;
    imports resolved at module scope — body imports break worker pickling)."""
    ft = _GopherFlatTokens(batch)
    n = len(batch)
    n_words = ft.counts.astype(np.int64)
    tok_lens = pc.utf8_length(ft.tokens_arrow).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    total_len = np.bincount(
        ft.row_idx, weights=tok_lens, minlength=n
    ).astype(np.int64)
    stop_mask = np.isin(
        ft.tokens_arrow.to_numpy(zero_copy_only=False),
        _GOPHER_STOPWORDS,
    )
    n_stop = np.bincount(ft.row_idx[stop_mask], minlength=n).astype(np.int64)
    n_short = np.bincount(
        ft.row_idx[tok_lens <= 3], minlength=n
    ).astype(np.int64)
    # mode (most-frequent-token) count per doc: dictionary-encode the
    # flat token stream, pack (row, token) into one int64 key, count,
    # then scatter-max back to rows — no per-doc Python loop
    enc = pc.dictionary_encode(ft.tokens_arrow)
    tok_idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = int(len(enc.dictionary)) or 1
    key = ft.row_idx * vocab + tok_idx
    key_vals, cnt_per_key = np.unique(key, return_counts=True)
    key_rows = key_vals // vocab
    mode_cnt = np.zeros(n, dtype=np.int64)
    np.maximum.at(mode_cnt, key_rows, cnt_per_key.astype(np.int64))
    len_ok = (n_words >= 30) & (n_words <= 80)
    mean_ok = (10 * total_len >= 43 * n_words) & (
        10 * total_len <= 48 * n_words
    )
    stop_ok = n_stop >= 2
    short_ok = 100 * n_short <= 25 * n_words
    mode_ok = 100 * mode_cnt <= 10 * n_words
    passes = len_ok & mean_ok & stop_ok & short_ok & mode_ok
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "len_ok": pa.array(len_ok.astype(np.int64)),
            "mean_len_ok": pa.array(mean_ok.astype(np.int64)),
            "stop_ok": pa.array(stop_ok.astype(np.int64)),
            "short_ok": pa.array(short_ok.astype(np.int64)),
            "mode_ok": pa.array(mode_ok.astype(np.int64)),
            "passes": pa.array(passes.astype(np.int64)),
        }
    )


@query("gopher_rules", _GOPHER_SQL)
def q_gopher_rules(sf_dir: str):
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        gopher_rules_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# End-to-end curation composite — the full training-data recipe in ONE
# streaming plan: Gopher rule gate -> exact content dedup (min-doc keeper
# per md5 group) -> deterministic mixture sampling -> per-(lang, source)
# accounting. What a curation run actually ships to the tokenizer, with
# the mixture report a data lead would read. Two shuffles total: the
# content-hash groupby (uniform key) and a tiny packed-key aggregate over
# (lang, source) partials.
# ---------------------------------------------------------------------------
_CURATION_SQL = f"""
WITH w AS (
  SELECT doc_id,
    string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS ws
  FROM documents
),
s AS (
  SELECT doc_id, len(ws) AS n_words,
    (SELECT coalesce(sum(strlen(x)), 0) FROM unnest(ws) AS t(x)) AS total_len,
    (SELECT count(*) FROM unnest(ws) AS t(x) WHERE x IN ('the','a')) AS n_stop,
    (SELECT count(*) FROM unnest(ws) AS t(x) WHERE strlen(x) <= 3) AS n_short,
    (SELECT coalesce(max(c), 0) FROM
       (SELECT count(*) c FROM unnest(ws) AS t(x) GROUP BY x)) AS mode_cnt
  FROM w
),
pass AS (
  SELECT doc_id, n_words FROM s
  WHERE n_words BETWEEN 30 AND 80
    AND 10 * total_len >= 43 * n_words AND 10 * total_len <= 48 * n_words
    AND n_stop >= 2
    AND 100 * n_short <= 25 * n_words
    AND 100 * mode_cnt <= 10 * n_words
),
surv AS (
  SELECT d.doc_id, d.lang, d.source, d.text, p.n_words
  FROM documents d JOIN pass p USING (doc_id)
),
kept AS (SELECT min(doc_id) AS doc_id FROM surv GROUP BY md5(text)),
samp AS (
  SELECT s.lang, s.source, s.n_words FROM surv s JOIN kept k USING (doc_id)
  WHERE ((s.doc_id % 1000) * {_MIX_KNUTH % 1000}) % 1000 <
        CASE s.lang
          {' '.join(f"WHEN '{lg}' THEN {r}" for lg, r in sorted(_MIX_RATES.items()))}
          ELSE {_MIX_DEFAULT}
        END
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words
FROM samp GROUP BY lang, source
"""


@query("curation_pipeline", _CURATION_SQL)
def q_curation_pipeline(sf_dir: str):
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    def gate(batch: pa.Table) -> pa.Table:
        """Gopher gate + content hash for the survivors only."""
        flags = gopher_rules_batch(batch.select(["doc_id", "text"]))
        keep = pc.equal(flags["passes"], 1)
        kept = batch.filter(keep)
        n_words = flags.filter(keep)["n_words"]
        h = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in kept["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "lang": kept["lang"],
                "source": kept["source"],
                "n_words": n_words,
                "content_hash": pa.array(h, type=pa.string()),
                # hash bucket (~256 hashes per map_groups dispatch)
                "_hb": pa.array(
                    [int(x[:15], 16) % n_buckets for x in h],
                    type=pa.int64(),
                ),
            }
        )

    def sample_and_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        bucket = ((ids % 1000) * (_MIX_KNUTH % 1000)) % 1000
        rates = np.full(len(ids), _MIX_DEFAULT, dtype=np.int64)
        for lg, r in _MIX_RATES.items():
            rates[langs == lg] = r
        sel = bucket < rates
        langs = langs[sel]
        srcs = batch["source"].to_numpy(zero_copy_only=False)[sel]
        words = batch["n_words"].to_numpy(zero_copy_only=False)[sel]
        # numpy U-dtype strings drop embedded NULs — use a printable
        # separator that cannot appear in lang/source
        key = np.char.add(np.char.add(langs.astype(str), "|"),
                          srcs.astype(str))
        vals, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(vals, type=pa.string()),
                "n_docs": pa.array(
                    np.bincount(inv, minlength=len(vals)).astype(np.int64)
                ),
                "total_words": pa.array(
                    np.bincount(
                        inv, weights=words, minlength=len(vals)
                    ).astype(np.int64)
                ),
            }
        )

    def split_key(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # hash-aggregate emits empty schema-less blocks
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "source": pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "total_words": pa.array([], type=pa.int64()),
                }
            )
        parts = pc.split_pattern(batch["key"], "|")
        return pa.table(
            {
                "lang": pc.list_element(parts, 0),
                "source": pc.list_element(parts, 1),
                "n_docs": batch["n_docs"],
                "total_words": batch["total_words"],
            }
        )

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)
    return (
        read_documents(sf_dir, ["doc_id", "text", "lang", "source"])
        .map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_hb")
        .map_groups(
            lambda g: _keep_min_bucket(
                g, "content_hash", ["doc_id", "lang", "source", "n_words"]
            ),
            batch_format="pandas",
        )
        .repartition(8)  # collapse per-group tiny blocks pre-shuffle
        .map_batches(sample_and_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_words", alias_name="total_words"),
        )
        .map_batches(split_key, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Repeated-substring dedup stats (ExactSubstr, Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better"): every 8-token window that
# already occurred earlier in the corpus (global first-occurrence-wins, order
# = (doc_id, position)) counts as duplicated text. Per doc: total windows and
# duplicated windows — the removal accounting an ExactSubstr pass reports.
#
# Shape: window stream -> per-batch (gram, min pos-key) combiner -> ONE
# Min-aggregate keyed by gram -> the carrier-doc trick (novelty_scores):
# each gram's FIRST occurrence attributes to min_key // 2^20, so
# n_dup(doc) = n_windows(doc) - n_first(doc) with no join-back of the gram
# stream. One small doc-keyed join at the end.
# ---------------------------------------------------------------------------
_SUBSTR_K = 8
_SUBSTR_POS = 1 << 20  # position packing: doc_id * 2^20 + i (i < 2^20)

_SUBSTR_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
),
wins AS (
  SELECT doc_id, k + 1 AS i,
         array_to_string(w[k+1:k+{_SUBSTR_K}], ' ') AS gram
  FROM d, LATERAL (
    SELECT unnest(range(CAST(greatest(len(w) - {_SUBSTR_K - 1}, 0) AS BIGINT))) AS k
  ) t
),
firsts AS (
  SELECT gram, min(doc_id * {_SUBSTR_POS} + i) AS first_key
  FROM wins GROUP BY gram
),
n_first AS (
  SELECT first_key // {_SUBSTR_POS} AS doc_id,
         CAST(count(*) AS BIGINT) AS n
  FROM firsts GROUP BY 1
),
n_win AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
  FROM wins GROUP BY doc_id
)
SELECT w.doc_id, w.n_windows,
       CAST(w.n_windows - coalesce(f.n, 0) AS BIGINT) AS n_dup
FROM n_win w LEFT JOIN n_first f USING (doc_id)
"""


def _windows8(batch: pa.Table):
    """(gram StringArray, packed pos key) for 8-token windows — tokenize
    once, eight zero-copy slices, one C-level join."""
    K = _SUBSTR_K
    ft = _FlatTokens(batch)
    toks = ft.tokens_arrow
    n = len(toks)
    if n < K:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    ok = ft.row_idx[: n - K + 1] == ft.row_idx[K - 1:]
    parts = [toks.slice(j, n - K + 1) for j in range(K)]
    g = pc.binary_join_element_wise(*parts, " ")
    doc = ft.doc_ids[: n - K + 1][ok]
    i = ft.i[: n - K + 1][ok]
    return g.filter(pa.array(ok)), doc * _SUBSTR_POS + i


@query("substring_dedup", _SUBSTR_SQL)
def q_substring_dedup(sf_dir: str):
    from ray.data.aggregate import Min, Sum

    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_windows": pa.array([], type=pa.int64()),
            "n_dup": pa.array([], type=pa.int64()),
        }
    )
    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs == 0:
        return empty

    def gram_minkeys(batch: pa.Table) -> pa.Table:
        """Per-batch combiner: (gram, local min key) — the shuffle carries
        one row per distinct gram per batch, not one per occurrence."""
        g, key = _windows8(batch)
        if len(g) == 0:
            return pa.table(
                {
                    "gram": pa.array([], type=pa.string()),
                    "k": pa.array([], type=pa.int64()),
                }
            )
        df = pd.DataFrame({"gram": g.to_pandas(), "k": key})
        m = df.groupby("gram", sort=False)["k"].min().reset_index()
        return pa.table(
            {
                "gram": pa.array(m["gram"], type=pa.string()),
                "k": pa.array(m["k"].to_numpy().astype(np.int64)),
            }
        )

    def win_counts(batch: pa.Table) -> pa.Table:
        """Window counts need only token counts — building the gram strings
        again here would double the tokenize+join cost of the whole query:
        n_windows(doc) = max(n_tokens - K + 1, 0)."""
        ft = _FlatTokens(batch)
        nw = np.maximum(
            ft.counts.astype(np.int64) - (_SUBSTR_K - 1), 0
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nw > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_windows": pa.array(nw[keep]),
            }
        )

    if n_docs < 32:
        # degenerate shards: empty join sides reach Ray's hash join as
        # schema-less blocks — run the identical algorithm on the driver
        import pyarrow.parquet as pq_mod

        raw = pq_mod.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        raw = raw.filter(pc.is_valid(raw["text"]))
        g, key = _windows8(raw)
        if len(key) == 0:
            return empty
        df = pd.DataFrame({"gram": g.to_pandas(), "k": key})
        firsts = df.groupby("gram")["k"].min() // _SUBSTR_POS
        n_first = firsts.value_counts()
        docs = df["k"].to_numpy() // _SUBSTR_POS
        vals, cnt = np.unique(docs, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(vals.astype(np.int64)),
                "n_windows": pa.array(cnt.astype(np.int64)),
                "n_dup": pa.array(
                    np.array(
                        [
                            int(c) - int(n_first.get(d, 0))
                            for d, c in zip(vals, cnt)
                        ],
                        dtype=np.int64,
                    )
                ),
            }
        )

    docs_ds = read_documents(sf_dir, ["doc_id", "text"])
    firsts = (
        docs_ds.map_batches(
            gram_minkeys, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("gram")
        .aggregate(Min("k", alias_name="k"))
    )

    def first_doc_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "fdoc": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        d = batch["k"].to_numpy(zero_copy_only=False) // _SUBSTR_POS
        vals, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "fdoc": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    n_first = (
        firsts.map_batches(first_doc_counts, batch_format="pyarrow")
        .groupby("fdoc")
        .aggregate(Sum("n", alias_name="n"))
        .repartition(4)
    )
    n_win = (
        docs_ds.map_batches(
            win_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("doc_id")
        .aggregate(Sum("n_windows", alias_name="n_windows"))
        .repartition(8)
    )
    joined = n_win.join(
        n_first,
        join_type="left_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("fdoc",),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = len(t)
        nf = (
            t["n"] if "n" in t.column_names else pa.nulls(n, type=pa.int64())
        )
        nw = t["n_windows"].cast(pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_windows": nw,
                "n_dup": pc.subtract(
                    nw, pc.fill_null(nf, 0).cast(pa.int64())
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Span-corruption training-example builder (T5/UL2-style denoising prep):
# deterministically mask tokens ((doc_id*31 + i*17) % 10 == 0), emit the
# corrupted input (masked slots -> '<M>') and the target stream (the masked
# tokens, in order). Pure Arrow construction: one tokenization, a flat
# if_else over the token stream, two ListArray re-wraps from offsets + one
# C-level join each — zero Python-per-token work, zero shuffle. The oracle
# value-checks the exact corrupted/target STRINGS per document.
# ---------------------------------------------------------------------------
_T5_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i
  FROM documents WHERE text IS NOT NULL
),
m AS (
  SELECT doc_id, i, tok,
         ((doc_id * 31 + i * 17) % 10 = 0) AS masked
  FROM toks
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
  string_agg(CASE WHEN masked THEN '<M>' ELSE tok END, ' ' ORDER BY i)
    AS corrupted,
  coalesce(string_agg(CASE WHEN masked THEN tok END, ' ' ORDER BY i), '')
    AS targets
FROM m GROUP BY doc_id
"""


@query("t5_span_corruption", _T5_SQL)
def q_t5_span_corruption(sf_dir: str):
    def build(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        n = len(batch)
        total = int(ft.counts.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "n_masked": pa.array([], type=pa.int64()),
                    "corrupted": pa.array([], type=pa.string()),
                    "targets": pa.array([], type=pa.string()),
                }
            )
        masked = ((ft.doc_ids * 31 + ft.i * 17) % 10) == 0
        corrupted_flat = pc.if_else(
            pa.array(masked), pa.scalar("<M>"), ft.tokens_arrow
        )
        offsets = np.concatenate(
            [[0], np.cumsum(ft.counts)]
        ).astype(np.int32)
        corrupted = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), corrupted_flat),
            " ",
        )
        # targets: masked tokens only, re-wrapped by per-doc masked counts
        tgt_flat = ft.tokens_arrow.filter(pa.array(masked))
        tgt_counts = np.bincount(ft.row_idx[masked], minlength=n)
        tgt_offsets = np.concatenate(
            [[0], np.cumsum(tgt_counts)]
        ).astype(np.int32)
        targets = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(tgt_offsets), tgt_flat), " "
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(ft.counts.astype(np.int64)),
                "n_masked": pa.array(tgt_counts.astype(np.int64)),
                "corrupted": corrupted,
                "targets": targets,
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Overlapping sliding-window chunking (RAG / retrieval indexing prep):
# window 32, stride 16 — each token lands in up to two chunks so retrieval
# never loses a boundary-straddling passage. Overlap means windows can't
# share one monotone offsets vector over the flat token array (the
# non-overlapping chunk_examples trick); the window token indices are
# gathered once (one C-level take, ~2x tokens) and re-wrapped.
# ---------------------------------------------------------------------------
_CHUNK_S = 16

_CHUNK_OVERLAP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(k * {_CHUNK_S} + 1 AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_W}, len(w) - k * {_CHUNK_S}) AS BIGINT) AS n_toks,
       array_to_string(w[k*{_CHUNK_S}+1 : k*{_CHUNK_S}+{_CHUNK_W}], ' ')
         AS chunk_text
FROM d, LATERAL (
  SELECT unnest(range(CAST(ceil(len(w) / {_CHUNK_S}.0) AS BIGINT))) AS k
) t
"""


@query("chunk_overlap", _CHUNK_OVERLAP_SQL)
def q_chunk_overlap(sf_dir: str):
    W, S = _CHUNK_W, _CHUNK_S

    def chunks(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        counts = ft.counts.astype(np.int64)
        n_chunks = -(-counts // S)
        doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
        cum = np.concatenate([[0], np.cumsum(n_chunks)])
        k = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1], n_chunks)
        start = k * S
        n_toks = np.minimum(W, counts[doc_rep] - start)
        tok_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # gather every window's token indices once (overlap-safe)
        win_off = np.concatenate(
            [[0], np.cumsum(n_toks)]
        ).astype(np.int64)
        idx = (
            np.repeat(tok_start[doc_rep] + start, n_toks)
            + np.arange(int(win_off[-1]), dtype=np.int64)
            - np.repeat(win_off[:-1], n_toks)
        )
        gathered = ft.tokens_arrow.take(pa.array(idx))
        lists = pa.ListArray.from_arrays(
            pa.array(win_off, type=pa.int32()), gathered
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(doc_rep)),
                "chunk_id": pa.array(k),
                "start_tok": pa.array(start + 1),
                "n_toks": pa.array(n_toks),
                "chunk_text": pc.binary_join(lists, " "),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Contrastive pair construction (SimCSE/DPR-style in-document positives):
# anchor = first 32-token window, positive = the next non-overlapping
# window — the (query, passage) pairs an embedding trainer consumes with
# in-batch negatives. Only docs long enough for a non-empty positive.
# ---------------------------------------------------------------------------
_CONTRASTIVE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       array_to_string(w[1 : {_CHUNK_W}], ' ') AS anchor_text,
       array_to_string(w[{_CHUNK_W}+1 : 2*{_CHUNK_W}], ' ') AS positive_text
FROM d WHERE len(w) > {_CHUNK_W}
"""


@query("contrastive_pairs", _CONTRASTIVE_SQL)
def q_contrastive_pairs(sf_dir: str):
    W = _CHUNK_W

    def pairs(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        counts = ft.counts.astype(np.int64)
        keep = counts > W
        idx_keep = np.nonzero(keep)[0]
        tok_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        n = len(idx_keep)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "anchor_text": pa.array([], type=pa.string()),
                    "positive_text": pa.array([], type=pa.string()),
                }
            )
        a_len = np.full(n, W, dtype=np.int64)
        p_len = np.minimum(counts[idx_keep] - W, W)
        starts = tok_start[idx_keep]

        def window_join(offs, lens):
            total = int(lens.sum())
            woff = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            idx = (
                np.repeat(offs, lens)
                + np.arange(total, dtype=np.int64)
                - np.repeat(woff[:-1], lens)
            )
            gathered = ft.tokens_arrow.take(pa.array(idx))
            return pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(woff, type=pa.int32()), gathered
                ),
                " ",
            )

        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(idx_keep)).cast(
                    pa.int64()
                ),
                "anchor_text": window_join(starts, a_len),
                "positive_text": window_join(starts + W, p_len),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Token co-occurrence mining (A-Priori 2-itemsets over per-document token
# SETS — the market-basket classic, and the raw counts behind GloVe-style
# co-occurrence statistics). Closed vocabulary means the pair space is
# bounded (~V^2/2): each batch bincounts packed pair codes over per-doc
# distinct-token incidence, so only (pair, partial-count) rows shuffle —
# the corpus-sized token stream never does. Top-20 by support with
# lexicographic ties.
# ---------------------------------------------------------------------------
_COOCCUR_TOPK = 20

_COOCCUR_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS support
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
)
SELECT tok_a, tok_b, CAST(support AS BIGINT) AS support
FROM pairs ORDER BY support DESC, tok_a, tok_b LIMIT {_COOCCUR_TOPK}
"""


@query("cooccur_pairs", _COOCCUR_SQL)
def q_cooccur_pairs(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        if len(batch) == 0 or ft.counts.sum() == 0:
            return pa.table(
                {
                    "pair": pa.array([], type=pa.string()),
                    "support": pa.array([], type=pa.int64()),
                }
            )
        enc = pc.dictionary_encode(ft.tokens_arrow)
        tok_idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary)
        V = len(vocab)
        # per-doc distinct (row, token) incidence
        inc = np.unique(ft.row_idx * V + tok_idx)
        rows, toks_of = inc // V, inc % V
        # vocabulary must pair in STRING order to match tok_a < tok_b
        order = np.argsort(vocab.astype(str), kind="mergesort")
        rank_of = np.empty(V, dtype=np.int64)
        rank_of[order] = np.arange(V)
        ranks = rank_of[toks_of]
        # pairs within each doc: expand per-doc sorted rank lists
        counts = np.bincount(rows, minlength=int(rows.max()) + 1)
        pair_codes = []
        start = 0
        for c in counts:
            if c >= 2:
                r = np.sort(ranks[start:start + c])
                i, j = np.triu_indices(c, k=1)
                pair_codes.append(r[i] * V + r[j])
            start += c
        if not pair_codes:
            return pa.table(
                {
                    "pair": pa.array([], type=pa.string()),
                    "support": pa.array([], type=pa.int64()),
                }
            )
        codes = np.concatenate(pair_codes)
        vals, cnt = np.unique(codes, return_counts=True)
        inv_order = vocab.astype(str)[order]
        names = np.char.add(
            np.char.add(inv_order[vals // V].astype(str), "\x01"),
            inv_order[vals % V].astype(str),
        )
        return pa.table(
            {
                "pair": pa.array(names, type=pa.string()),
                "support": pa.array(cnt.astype(np.int64)),
            }
        )

    agg = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair")
        .aggregate(Sum("support", alias_name="support"))
        .to_pandas()
    )
    if agg.empty:
        return pa.table(
            {
                "tok_a": pa.array([], type=pa.string()),
                "tok_b": pa.array([], type=pa.string()),
                "support": pa.array([], type=pa.int64()),
            }
        )
    split = agg["pair"].str.split("\x01", expand=True)
    agg["tok_a"], agg["tok_b"] = split[0], split[1]
    agg = agg.sort_values(
        ["support", "tok_a", "tok_b"], ascending=[False, True, True]
    ).head(_COOCCUR_TOPK)
    return pa.table(
        {
            "tok_a": pa.array(agg["tok_a"], type=pa.string()),
            "tok_b": pa.array(agg["tok_b"], type=pa.string()),
            "support": pa.array(
                agg["support"].to_numpy().astype(np.int64)
            ),
        }
    )


# ---------------------------------------------------------------------------
# ML feature-matrix assembly (quality-classifier training prep — the
# fastText/DSIR-style feature table a curation team fits its quality model
# on): per-doc integer quality counters + corpus-trained LM perplexity +
# language one-hots, assembled with ONE doc-keyed hash join between the
# counter scan and the (materialized) LM score table. The join key is the
# uniform doc_id; everything else is batch-local.
# ---------------------------------------------------------------------------
_FEATURE_LANGS = ("de", "en", "es", "fr", "zh")

_FEATURE_SQL = (
    "WITH core AS ("
    + _LM_SQL
    + """),
q AS (
"""
    + _QUALITY_SQL.replace("WITH toks AS", "  SELECT * FROM (WITH toks AS")
    + """) )
SELECT q.doc_id, q.n_tokens, q.total_token_len, q.n_stopword, q.n_repeat,
       core.avg_bits_milli,
"""
    + ",\n".join(
        f"       CAST(CASE WHEN d.lang = '{lg}' THEN 1 ELSE 0 END AS BIGINT)"
        f" AS is_{lg}"
        for lg in _FEATURE_LANGS
    )
    + """
FROM q
JOIN core USING (doc_id)
JOIN documents d USING (doc_id)
"""
)


@query("feature_matrix", _FEATURE_SQL)
def q_feature_matrix(sf_dir: str):
    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "total_token_len": pa.array([], type=pa.int64()),
            "n_stopword": pa.array([], type=pa.int64()),
            "n_repeat": pa.array([], type=pa.int64()),
            "avg_bits_milli": pa.array([], type=pa.int64()),
        }
        | {f"is_{lg}": pa.array([], type=pa.int64())
           for lg in _FEATURE_LANGS}
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty
    lm = q_lm_score(sf_dir)
    if isinstance(lm, pa.Table) and len(lm) == 0:
        return empty
    lm = lm.select_columns(["doc_id", "avg_bits_milli"]).repartition(4)

    def counters(batch: pa.Table) -> pa.Table:
        stats = quality_stats_batch(batch.select(["doc_id", "text"]))
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        out = {name: stats[name] for name in stats.column_names}
        for lg in _FEATURE_LANGS:
            out[f"is_{lg}"] = pa.array(
                (lang == lg).astype(np.int64)
            )
        return pa.table(out)

    feats = (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(counters, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
    )
    joined = feats.join(
        lm,
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
    )
    cols = list(empty.column_names)
    return joined.map_batches(
        lambda t: pa.table({c: t[c].cast(pa.int64()) for c in cols}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Mixture quota apportionment (largest-remainder / Hare method): split a
# fixed training budget across sources proportionally to their doc counts
# with EXACT integer quotas that sum to the budget — the planning step
# before temperature_sample executes a mixture. Distributed part is the
# per-source count aggregate; the K-row apportionment runs on the driver
# (K = source universe), same size-class as every final top-k merge.
# ---------------------------------------------------------------------------
_QUOTA_BUDGET = 10_000

_QUOTA_SQL = f"""
WITH s AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
t AS (SELECT sum(c) AS tot FROM s),
base AS (
  SELECT source, c,
         (c * {_QUOTA_BUDGET}) // (SELECT tot FROM t) AS fl,
         (c * {_QUOTA_BUDGET}) % (SELECT tot FROM t) AS rem
  FROM s
),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM base),
g AS (SELECT {_QUOTA_BUDGET} - sum(fl) AS extra FROM base)
SELECT source, CAST(c AS BIGINT) AS n_docs,
       CAST(fl + CASE WHEN rk <= (SELECT extra FROM g) THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r
"""


@query("source_quotas", _QUOTA_SQL)
def q_source_quotas(sf_dir: str):
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "source": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "quota": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(src, return_counts=True)
        return pa.table(
            {
                "source": pa.array(vals.astype(str), type=pa.string()),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        read_documents(sf_dir, ["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # K rows, K = source universe
    )
    if counts.empty:
        return empty
    counts = counts.sort_values("source").reset_index(drop=True)
    c = counts["c"].to_numpy().astype(np.int64)
    tot = int(c.sum())
    fl = (c * _QUOTA_BUDGET) // tot
    rem = (c * _QUOTA_BUDGET) % tot
    extra = _QUOTA_BUDGET - int(fl.sum())
    # rank by remainder DESC, source ASC (counts already source-sorted)
    order = np.lexsort((np.arange(len(c)), -rem))
    quota = fl.copy()
    quota[order[:extra]] += 1
    assert int(quota.sum()) == _QUOTA_BUDGET
    return pa.table(
        {
            "source": pa.array(counts["source"], type=pa.string()),
            "n_docs": pa.array(c),
            "quota": pa.array(quota.astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Shard-skew audit (the pre-run balance report an operator reads before
# launching a 100 TB job): row and byte counts per hash partition
# (doc_id % P), plus each partition's share of the corpus in basis points
# — the number that says whether the planned partitioning key is safe or
# needs salting. One pass of per-batch bincounts, one P-row aggregate.
# ---------------------------------------------------------------------------
_SKEW_PARTS = 16

_SKEW_SQL = f"""
WITH p AS (
  SELECT doc_id % {_SKEW_PARTS} AS partition_id,
         n_chars
  FROM documents
),
tot AS (SELECT count(*) AS n FROM p)
SELECT partition_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST((count(*) * 10000) // (SELECT n FROM tot) AS BIGINT)
         AS share_bp
FROM p GROUP BY partition_id
"""


@query("shard_skew_report", _SKEW_SQL)
def q_shard_skew_report(sf_dir: str):
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "partition_id": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "total_chars": pa.array([], type=pa.int64()),
            "share_bp": pa.array([], type=pa.int64()),
        }
    )
    n_total = parquet_num_rows(sf_dir, "documents")
    if n_total == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        part = ids % _SKEW_PARTS
        n = np.bincount(part, minlength=_SKEW_PARTS).astype(np.int64)
        ch = np.bincount(
            part, weights=nch, minlength=_SKEW_PARTS
        ).astype(np.int64)
        keep = n > 0
        return pa.table(
            {
                "partition_id": pa.array(
                    np.arange(_SKEW_PARTS, dtype=np.int64)[keep]
                ),
                "n_docs": pa.array(n[keep]),
                "total_chars": pa.array(ch[keep]),
            }
        )

    agg = (
        read_documents(sf_dir, ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("partition_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "partition_id": t["partition_id"].cast(pa.int64()),
                "n_docs": pa.array(nd),
                "total_chars": t["total_chars"].cast(pa.int64()),
                "share_bp": pa.array((nd * 10000) // n_total),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece's second algorithm; Kudo 2018,
# arXiv:1804.10959): the OTHER major subword family next to BPE above.
# Training is EM over the segmentation lattice — E-step accumulates
# expected piece counts with forward/backward over each word, M-step
# re-normalizes, then low-utility pieces are pruned toward the target
# vocab. Like bpe_train, the only corpus-sized pass is the distributed
# (word, count) aggregate (_word_freq_ds); EM runs on that vocab-sized
# table on the driver (at real scale: capped to the top-M words by
# frequency, same sample-bounded policy as BPE_ROUNDS). Encoding is a
# Viterbi pass per word, distributed via the tiny piece table captured in
# the batch closure. Segmentation semantics are not SQL-expressible —
# rows-only entry; optimality/monotonicity/determinism pinned by pytest.
# ---------------------------------------------------------------------------
UNIGRAM_VOCAB = 48
UNIGRAM_EM_ROUNDS = 4
UNIGRAM_MAX_PIECE = 6
_UNI_FLOOR = 1e-10


def _uni_lattice_expect(word: str, probs: dict[str, float]):
    """Forward/backward expected counts + marginal likelihood of a word."""
    import math

    n = len(word)
    fwd = [0.0] * (n + 1)
    fwd[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for j in range(max(0, i - UNIGRAM_MAX_PIECE), i):
            p = probs.get(word[j:i])
            if p:
                s += fwd[j] * p
        fwd[i] = s
    if fwd[n] <= 0.0:
        return {}, -math.inf
    bwd = [0.0] * (n + 1)
    bwd[n] = 1.0
    for i in range(n - 1, -1, -1):
        s = 0.0
        for j in range(i + 1, min(n, i + UNIGRAM_MAX_PIECE) + 1):
            p = probs.get(word[i:j])
            if p:
                s += p * bwd[j]
        bwd[i] = s
    z = fwd[n]
    exp: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + UNIGRAM_MAX_PIECE) + 1):
            piece = word[i:j]
            p = probs.get(piece)
            if p:
                exp[piece] = exp.get(piece, 0.0) + fwd[i] * p * bwd[j] / z
    return exp, math.log(z)


def unigram_train(
    word_counts: list[tuple[str, int]],
    vocab_size: int = UNIGRAM_VOCAB,
    rounds: int = UNIGRAM_EM_ROUNDS,
) -> dict[str, float]:
    """EM-train unigram piece probabilities from a (word, count) table."""
    seeds: dict[str, float] = {}
    for w, c in word_counts:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + UNIGRAM_MAX_PIECE) + 1):
                seeds[w[i:j]] = seeds.get(w[i:j], 0.0) + c
    if not seeds:
        return {}
    total = sum(seeds.values())
    probs = {k: v / total for k, v in seeds.items()}
    singles = {w[i] for w, _ in word_counts for i in range(len(w))}
    for r in range(rounds):
        expected: dict[str, float] = {}
        for w, c in word_counts:
            exp, _ = _uni_lattice_expect(w, probs)
            for k, v in exp.items():
                expected[k] = expected.get(k, 0.0) + c * v
        z = sum(expected.values())
        if z <= 0:
            break
        probs = {k: max(v / z, _UNI_FLOOR) for k, v in expected.items()}
        # prune toward the target vocab, but single chars are never cut
        # (they guarantee full coverage / no OOV)
        if len(probs) > vocab_size:
            multi = sorted(
                ((k, v) for k, v in probs.items() if len(k) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )
            keep = dict(multi[: max(0, vocab_size - len(singles))])
            keep.update(
                {s: probs.get(s, _UNI_FLOOR) for s in singles}
            )
            z2 = sum(keep.values())
            probs = {k: v / z2 for k, v in keep.items()}
    return probs


def unigram_viterbi(word: str, probs: dict[str, float]):
    """Max-probability segmentation -> (pieces, total_logprob)."""
    import math

    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - UNIGRAM_MAX_PIECE), i):
            p = probs.get(word[j:i])
            if p and best[j] + math.log(p) > best[i]:
                best[i] = best[j] + math.log(p)
                back[i] = j
    if best[n] == -math.inf:
        return [], -math.inf
    pieces, i = [], n
    while i > 0:
        pieces.append(word[back[i]:i])
        i = back[i]
    return pieces[::-1], best[n]


@query("unigram_tokenize")
def q_unigram_tokenize(sf_dir: str):
    """Per-doc unigram tokenization accounting: piece count and total
    negative log-likelihood (milli-nats, integer) under the EM-trained
    piece model. One distributed word-count pass + one distributed encode
    pass; the model table is vocab-sized."""
    from .extraction import read_documents

    wc_rows = _word_freq_ds(sf_dir).take_all()  # vocab-sized by design
    word_counts = sorted((r["word"], int(r["cnt"])) for r in wc_rows)
    probs = unigram_train(word_counts)
    # per-word encode memo: vocab-sized, computed once on the driver,
    # shipped inside the closure (tiny) — the corpus pass stays vectorized
    # over the memo
    memo = {}
    for w, _ in word_counts:
        pieces, lp = unigram_viterbi(w, probs)
        memo[w] = (len(pieces), int(round(-lp * 1000)))

    def encode(batch: pa.Table) -> pa.Table:
        ft = _FlatTokens(batch)
        if not len(ft.tokens):
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_pieces": pa.array([], type=pa.int64()),
                    "nll_millinat": pa.array([], type=pa.int64()),
                }
            )
        # memo lookups are the only per-token Python; doc rollup rides
        # reduceat over the contiguous flat-token layout
        uniq_t, inv = np.unique(np.asarray(ft.tokens), return_inverse=True)
        pc_u = np.array(
            [memo.get(t, (0, 0))[0] for t in uniq_t], dtype=np.int64
        )
        cost_u = np.array(
            [memo.get(t, (0, 0))[1] for t in uniq_t], dtype=np.int64
        )
        counts, costs = pc_u[inv], cost_u[inv]
        starts = np.cumsum(ft.counts) - ft.counts
        valid = ft.counts > 0
        row_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[valid]
        return pa.table(
            {
                "doc_id": pa.array(
                    row_ids.astype(np.int64), type=pa.int64()
                ),
                "n_pieces": pa.array(
                    np.add.reduceat(counts, starts[valid])
                ),
                "nll_millinat": pa.array(
                    np.add.reduceat(costs, starts[valid])
                ),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public method): score every
# document by hashed-unigram importance toward a TARGET domain (here the
# corpus rule's 'tables' category stands in for the curated target set),
# then keep the top 20%. Weights are fixed-point integer milli-bits
# (the lm_score pattern) so engine and oracle agree bit-exactly:
#   lambda_b = floor((log2((tgt_b+1)/(tgt_tot+B)) -
#                     log2((raw_b+1)/(raw_tot+B))) * 1000 + 0.5)
# Distribution shape: ONE counting scan pre-aggregated per batch into B=64
# bucket rows (driver collects O(B)); the 64-entry lambda table rides into
# the scoring scan as a closure broadcast; selection is per-block partial
# top-K before the final tiny sort (top_orders pattern) — no stage moves
# more than K x n_blocks candidate rows at any corpus size.
# ---------------------------------------------------------------------------
_DSIR_B = 64
_DSIR_FRAC = 0.2

_DSIR_SQL = f"""
WITH {SQL_TOKS},
{SQL_CATEGORY.strip().rstrip()},
buck AS (
  SELECT t.doc_id,
         CAST(('0x' || substr(md5(t.tok), 1, 8))::UBIGINT % {_DSIR_B}
              AS BIGINT) AS b
  FROM toks t
),
raw AS (SELECT b, count(*) AS rn FROM buck GROUP BY b),
tgt AS (
  SELECT bu.b, count(*) AS tn
  FROM buck bu JOIN doc_category c
    ON c.doc_id = bu.doc_id AND c.category = 'tables'
  GROUP BY bu.b
),
tot AS (
  SELECT (SELECT count(*) FROM buck) AS rtot,
         (SELECT coalesce(sum(tn), 0) FROM tgt) AS ttot
),
lam AS (
  SELECT r.b,
         CAST(floor((log2((coalesce(t.tn, 0) + 1.0) / (tot.ttot + {_DSIR_B}.0))
                     - log2((r.rn + 1.0) / (tot.rtot + {_DSIR_B}.0)))
                    * 1000 + 0.5) AS BIGINT) AS lam
  FROM raw r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot
),
scores AS (
  SELECT bu.doc_id, CAST(sum(l.lam) AS BIGINT) AS dsir_score_milli
  FROM buck bu JOIN lam l ON l.b = bu.b
  GROUP BY bu.doc_id
),
k AS (
  SELECT CAST(ceil({_DSIR_FRAC} * count(*)) AS BIGINT) AS k
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, dsir_score_milli
FROM (
  SELECT s.*,
         row_number() OVER (ORDER BY dsir_score_milli DESC, doc_id) AS rk
  FROM scores s
)
WHERE rk <= (SELECT k FROM k)
"""


def _dsir_buckets(ft) -> np.ndarray:
    """Hashed-unigram bucket per token (md5 prefix, vocab-level LUT)."""
    import hashlib

    toks = ft.tokens
    uniq, inv = np.unique(toks.astype(str), return_inverse=True)
    lut = np.fromiter(
        (
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % _DSIR_B
            for t in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return lut[inv]


@query("dsir_resample", _DSIR_SQL)
def q_dsir_resample(sf_dir: str):
    from ..corpus import FlatTokens, category_flags
    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "dsir_score_milli": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    from ray.data.aggregate import Sum

    def counts_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        is_table, _, _ = category_flags(ft, len(batch))
        b = _dsir_buckets(ft)
        raw = np.bincount(b, minlength=_DSIR_B)
        tgt = np.bincount(b[is_table[ft.row_idx]], minlength=_DSIR_B)
        docs_n = np.zeros(_DSIR_B, dtype=np.int64)
        docs_n[0] = len(batch)  # candidate-doc count rides bucket 0's row
        return pa.table(
            {
                "b": pa.array(np.arange(_DSIR_B, dtype=np.int64)),
                "raw_n": pa.array(raw.astype(np.int64)),
                "tgt_n": pa.array(tgt.astype(np.int64)),
                "docs_n": pa.array(docs_n),
            }
        )

    counts = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(
            counts_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("b")
        .aggregate(
            Sum("raw_n", alias_name="raw_n"),
            Sum("tgt_n", alias_name="tgt_n"),
            Sum("docs_n", alias_name="docs_n"),
        )
        .to_pandas()  # O(B) rows by construction
    )
    raw = np.zeros(_DSIR_B, dtype=np.int64)
    tgt = np.zeros(_DSIR_B, dtype=np.int64)
    if len(counts):
        bb = counts["b"].to_numpy().astype(np.int64)
        raw[bb] = counts["raw_n"].to_numpy().astype(np.int64)
        tgt[bb] = counts["tgt_n"].to_numpy().astype(np.int64)
    n_docs = int(counts["docs_n"].sum()) if len(counts) else 0
    k = int(np.ceil(_DSIR_FRAC * n_docs))
    if k == 0:
        return empty
    rtot, ttot = int(raw.sum()), int(tgt.sum())
    lam = np.floor(
        (
            np.log2((tgt + 1.0) / (ttot + float(_DSIR_B)))
            - np.log2((raw + 1.0) / (rtot + float(_DSIR_B)))
        )
        * 1000
        + 0.5
    ).astype(np.int64)

    def score(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        contrib = lam[_dsir_buckets(ft)]
        sums = np.zeros(len(batch), dtype=np.int64)
        np.add.at(sums, ft.row_idx, contrib)
        has_tok = ft.counts > 0  # tokenless docs: absent (SQL unnest drops)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(
                    pa.array(has_tok)
                ),
                "dsir_score_milli": pa.array(sums[has_tok]),
            }
        )

    def partial_top(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["dsir_score_milli"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s))[:k]
        return pa.table(
            {
                "doc_id": pa.array(d[order].astype(np.int64)),
                "dsir_score_milli": pa.array(s[order].astype(np.int64)),
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            partial_top, batch_format="pyarrow", zero_copy_batch=True
        )
        .sort(
            ["dsir_score_milli", "doc_id"], descending=[True, False]
        )
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Distribution-drift monitoring between crawl snapshots (the PSI /
# population-stability-index check every recurring ingestion pipeline
# runs): length-bucket distributions of the OLD vs NEW snapshot (same
# deterministic snapshot rule as snapshot_diff), add-one smoothed,
# per-bin PSI contribution in fixed-point integer micro-nats —
#   psi_micro_b = floor((pn - po) * ln(pn / po) * 1e6 + 0.5)
# — so engine and oracle agree bit-exactly (the lm_score milli-bits
# pattern). ONE counting scan pre-aggregated per batch into <=10 bin
# rows; the final PSI map runs on the single 10-row block.
# ---------------------------------------------------------------------------
_PSI_BINS = 10

_PSI_SQL = f"""
WITH base AS (
  SELECT doc_id, least(length(text) // 100, {_PSI_BINS - 1}) AS bin
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT bin,
         sum(CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END) AS n_old,
         sum(CASE WHEN doc_id % 10 >= 2 THEN 1 ELSE 0 END) AS n_new
  FROM base GROUP BY bin
),
tot AS (SELECT sum(n_old) AS so, sum(n_new) AS sn FROM counts)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(floor(
         (((n_new + 1.0) / (sn + {_PSI_BINS}.0))
          - ((n_old + 1.0) / (so + {_PSI_BINS}.0)))
         * ln(((n_new + 1.0) / (sn + {_PSI_BINS}.0))
              / ((n_old + 1.0) / (so + {_PSI_BINS}.0)))
         * 1000000 + 0.5) AS BIGINT) AS psi_micro
FROM counts CROSS JOIN tot
"""


@query("psi_drift", _PSI_SQL)
def q_psi_drift(sf_dir: str):
    from ray.data.aggregate import Sum

    def bin_partial(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ln = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        b = np.minimum(ln // 100, _PSI_BINS - 1).astype(np.int64)
        r = doc % 10
        old_n = np.bincount(b[r < 8], minlength=_PSI_BINS)
        new_n = np.bincount(b[r >= 2], minlength=_PSI_BINS)
        present = (old_n > 0) | (new_n > 0)
        # only bins any doc in THIS BATCH fell into (bins nobody hits
        # anywhere must not appear, matching the SQL GROUP BY)
        idx = np.flatnonzero(present)
        return pa.table(
            {
                "bin": pa.array(idx.astype(np.int64)),
                "n_old": pa.array(old_n[idx].astype(np.int64)),
                "n_new": pa.array(new_n[idx].astype(np.int64)),
            }
        )

    def psi_final(batch: pa.Table) -> pa.Table:
        n_old = batch["n_old"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n_new = batch["n_new"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        so, sn = n_old.sum(), n_new.sum()
        po = (n_old + 1.0) / (so + float(_PSI_BINS))
        pn = (n_new + 1.0) / (sn + float(_PSI_BINS))
        psi = np.floor((pn - po) * np.log(pn / po) * 1000000 + 0.5)
        return pa.table(
            {
                "bin": batch["bin"],
                "n_old": batch["n_old"],
                "n_new": batch["n_new"],
                "psi_micro": pa.array(psi.astype(np.int64)),
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(
            bin_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bin")
        .aggregate(
            Sum("n_old", alias_name="n_old"),
            Sum("n_new", alias_name="n_new"),
        )
        .repartition(1)  # <=10 rows; PSI needs the whole bin table
        .map_batches(
            psi_final, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )
