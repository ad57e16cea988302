"""Driver-checked queries: corpus retrieval / indexing family.

Three operators a training-data pipeline runs over a web corpus before and
after extraction (reference analog: the WORD projection + token accounting
side of ``textract_agent.py`` — this engine generalizes them into a search
stack):

* ``oov_rate``        — per-doc out-of-vocabulary rate against a corpus-derived
                        top-K vocabulary (quality filter).
* ``inverted_index``  — token -> (df, capped sorted postings) index build.
* ``bm25_topk``       — integer-deterministic BM25-style retrieval for a fixed
                        query term set (tf x (N // df) weighting).

Scale notes (100 TB): every pass is a column-pruned read + vectorized
partial aggregation; the only data that ever reaches the driver is
vocabulary-sized (top-K terms / per-query-term df counts), re-broadcast into
the scoring pass. Postings lists are CAPPED per token (hot tokens in a web
corpus appear in nearly every doc — an uncapped posting list is a scale
bug); df stays exact because each doc_id occurs on exactly one input row,
so per-batch distinct counts sum without overlap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..corpus import SQL_TOKS, FlatTokens
from ..registry import query
from .extraction import read_documents

# Vocabulary size for the OOV quality filter (top-K by corpus frequency).
VOCAB_K = 10
# Posting-list cap per token (keeps hot-token groups bounded at scale).
POSTINGS_CAP = 64
# Fixed query-term set for the retrieval benchmark: one rare high-idf term
# ('dup' marks the synthetic near-duplicate docs) + common low-idf terms.
QUERY_TERMS = ("dup", "vector", "table")
TOPK_DOCS = 20


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate (two-pass: tiny vocab to driver, broadcast back).
# ---------------------------------------------------------------------------
_OOV_SQL = f"""
WITH {SQL_TOKS},
freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok LIMIT {VOCAB_K})
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN t.tok NOT IN (SELECT tok FROM vocab)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM toks t GROUP BY doc_id
"""


def _token_freqs(sf_dir: str):
    """Distributed token-frequency partial-agg -> tiny (tok, n) Dataset."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        toks, counts = np.unique(ft.tokens, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(toks, type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("tok").aggregate(Sum("n", alias_name="n"))


@query("oov_rate", _OOV_SQL)
def q_oov_rate(sf_dir: str):
    freq = _token_freqs(sf_dir).to_pandas()  # vocabulary-sized: tiny
    if freq.empty:  # empty shard: aggregate output may be schema-less
        vocab = frozenset()
    else:
        freq = freq.sort_values(["n", "tok"], ascending=[False, True])
        vocab = frozenset(freq["tok"].head(VOCAB_K))

    def score(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        oov = ~np.isin(ft.tokens, list(vocab))
        n_docs = len(batch)
        n_tok = np.zeros(n_docs, dtype=np.int64)
        n_oov = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_tok, ft.row_idx, 1)
        np.add.at(n_oov, ft.row_idx, oov.astype(np.int64))
        keep = n_tok > 0  # docs with no tokens don't appear in the unnest oracle
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "n_tokens": pa.array(n_tok[keep]),
                "n_oov": pa.array(n_oov[keep]),
            }
        )

    # vocab is ~K strings — closure capture is fine (ray.put broadcast is
    # reserved for sides that are big enough to matter)
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Inverted index (capped postings; df exact via disjoint per-batch partials).
# ---------------------------------------------------------------------------
_INVIDX_SQL = f"""
WITH {SQL_TOKS},
pairs AS (SELECT DISTINCT tok, doc_id FROM toks),
ranked AS (SELECT tok, doc_id,
                  row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
           FROM pairs)
SELECT tok, CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= {POSTINGS_CAP}
                       THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM ranked GROUP BY tok
"""


@query("inverted_index", _INVIDX_SQL)
def q_inverted_index(sf_dir: str):
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        """Per-batch: (tok, partial df, first-CAP sorted postings)."""
        ft = FlatTokens(batch)
        toks, tok_code = np.unique(ft.tokens, return_inverse=True)
        # sort pairs by (token, doc_id); dedupe adjacent equal pairs
        order = np.lexsort((ft.doc_ids, tok_code))
        tc, dc = tok_code[order], ft.doc_ids[order]
        first = np.ones(len(tc), dtype=bool)
        first[1:] = (tc[1:] != tc[:-1]) | (dc[1:] != dc[:-1])
        tc, dc = tc[first], dc[first]
        dfp = np.bincount(tc, minlength=len(toks))
        starts = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(dfp, out=starts[1:])
        # leading CAP doc_ids per token (already doc-sorted by the lexsort)
        post = [
            dc[starts[i]:min(starts[i + 1], starts[i] + POSTINGS_CAP)].tolist()
            for i in range(len(toks))
        ]
        return pa.table(
            {
                "tok": pa.array(toks, type=pa.string()),
                "df_part": pa.array(dfp.astype(np.int64)),
                "postings_part": pa.array(post, type=pa.list_(pa.int64())),
            }
        )

    from .extraction import parquet_num_rows

    # vocab-keyed merge: per-token map_groups pays ~0.6-3 ms of pandas
    # dispatch per TOKEN (BASELINE.md) — group on a hash bucket of ~256
    # tokens and merge segmented instead
    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)

    from ..stages.buckets import add_hash_bucket

    add_tb = add_hash_bucket("tok", n_buckets, out="_tb")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        toks = g["tok"].to_numpy(dtype=object)
        utoks, code = np.unique(toks, return_inverse=True)
        dfs = np.zeros(len(utoks), dtype=np.int64)
        np.add.at(dfs, code, g["df_part"].to_numpy().astype(np.int64))
        lens = np.fromiter(
            (len(p) for p in g["postings_part"]), np.int64, len(g)
        )
        pair_tok = np.repeat(code, lens)
        pair_doc = (
            np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in g["postings_part"]]
            )
            if int(lens.sum())
            else np.empty(0, dtype=np.int64)
        )
        # unique (tok, doc) pairs sorted by doc within token, head CAP
        order = np.lexsort((pair_doc, pair_tok))
        pt, pd_ = pair_tok[order], pair_doc[order]
        first = np.r_[True, (pt[1:] != pt[:-1]) | (pd_[1:] != pd_[:-1])]
        pt, pd_ = pt[first], pd_[first]
        starts = np.zeros(len(utoks) + 1, dtype=np.int64)
        np.cumsum(np.bincount(pt, minlength=len(utoks)), out=starts[1:])
        postings = [
            ",".join(
                str(i)
                for i in pd_[starts[c]: min(starts[c + 1],
                                            starts[c] + POSTINGS_CAP)]
            )
            for c in range(len(utoks))
        ]
        return pd.DataFrame(
            {"tok": utoks, "df": dfs, "postings": postings}
        )

    partials = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        partials.map_batches(add_tb, batch_format="pyarrow")
        .groupby("_tb")
        .map_groups(merge_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Integer-deterministic BM25-style retrieval. Classic BM25 idf is a float
# log; engines disagree in the last ulp, so the value-exact variant uses
# weight(t) = N // df(t) (integer division — monotone in idf, deterministic
# on both sides). Two passes: (1) per-term df + corpus N (k+1 tiny rows to
# the driver), (2) broadcast weights, per-batch tf x weight scoring with a
# partial top-k, final top-k on the (tiny) candidate set.
# ---------------------------------------------------------------------------
_BM25_SQL = f"""
WITH {SQL_TOKS},
n_total AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
       WHERE tok IN {QUERY_TERMS!r} GROUP BY tok),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
       WHERE tok IN {QUERY_TERMS!r} GROUP BY doc_id, tok),
scored AS (
  SELECT tf.doc_id,
         sum(tf.tf * ((SELECT n FROM n_total) // df.df)) AS score
  FROM tf JOIN df USING (tok) GROUP BY tf.doc_id
)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {TOPK_DOCS}
"""


@query("bm25_topk", _BM25_SQL)
def q_bm25_topk(sf_dir: str):
    from ray.data.aggregate import Sum

    terms = list(QUERY_TERMS)

    def df_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        rows_t, rows_n = ["\x00total"], [len(batch)]
        for t in terms:
            hit_rows = np.unique(ft.row_idx[ft.tokens == t])
            rows_t.append(t)
            rows_n.append(len(hit_rows))
        return pa.table(
            {
                "tok": pa.array(rows_t, type=pa.string()),
                "n": pa.array(np.asarray(rows_n, dtype=np.int64)),
            }
        )

    stats = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # k+1 rows
    )
    lookup = (
        {} if stats.empty else dict(zip(stats["tok"], stats["n"]))
    )  # empty shard: aggregate output may be schema-less
    n_total = int(lookup.pop("\x00total", 0))
    weights = {t: n_total // int(df) for t, df in lookup.items() if df}
    if not weights:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.int64()),
            }
        )

    def score_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        score = np.zeros(len(batch), dtype=np.int64)
        for t, w in weights.items():
            tf = np.zeros(len(batch), dtype=np.int64)
            np.add.at(tf, ft.row_idx[ft.tokens == t], 1)
            score += tf * w
        hit = score > 0
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[hit]
        sc = score[hit]
        # partial top-k inside the batch: only TOPK_DOCS candidate rows leave
        order = np.lexsort((doc, -sc))[:TOPK_DOCS]
        return pa.table(
            {
                "doc_id": pa.array(doc[order]),
                "score": pa.array(sc[order]),
            }
        )

    cands = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return cands.sort(["score", "doc_id"], descending=[True, False]).limit(
        TOPK_DOCS
    )


# ---------------------------------------------------------------------------
# Passage-level BM25 (RAG retrieval): score every overlapping 32-token
# window (stride 16 — chunk_overlap's geometry) instead of whole documents,
# so a hit inside a long document surfaces as the right passage. Same
# two-pass integer scheme as bm25_topk with passage-granular df/N; per-term
# tf over every window comes from ONE prefix-sum per term (windows overlap,
# so per-window recount would be 2x work). Per-batch partial top-k, tiny
# final sort.
# ---------------------------------------------------------------------------
_PASSAGE_W, _PASSAGE_S = 32, 16
_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + "]"

_BM25_PASSAGE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
),
p AS (
  SELECT doc_id, k, w[k*{_PASSAGE_S}+1 : k*{_PASSAGE_S}+{_PASSAGE_W}] AS pw
  FROM d, LATERAL (
    SELECT unnest(range(CAST(ceil(len(w) / {_PASSAGE_S}.0) AS BIGINT))) AS k
  ) t
),
n_total AS (SELECT count(*) AS n FROM p),
tf AS (
  SELECT doc_id, k, t.term,
         len(list_filter(pw, x -> x = t.term)) AS tf
  FROM p, unnest({_TERMS_SQL}) AS t(term)
),
df AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.k,
         sum(tf.tf * ((SELECT n FROM n_total) // df.df)) AS score
  FROM tf JOIN df USING (term) WHERE tf.tf > 0
  GROUP BY tf.doc_id, tf.k
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id, CAST(score AS BIGINT) AS score
FROM scored ORDER BY score DESC, doc_id, k LIMIT {TOPK_DOCS}
"""


@query("bm25_passages", _BM25_PASSAGE_SQL)
def q_bm25_passages(sf_dir: str):
    from ray.data.aggregate import Sum

    terms = list(QUERY_TERMS)
    W, S = _PASSAGE_W, _PASSAGE_S

    def windows(ft):
        """(window start offsets into the flat token array, window lengths,
        doc row index, within-doc k) for the batch."""
        counts = ft.counts.astype(np.int64)
        n_chunks = -(-counts // S)
        doc_rep = np.repeat(
            np.arange(len(counts), dtype=np.int64), n_chunks
        )
        cum = np.concatenate([[0], np.cumsum(n_chunks)])
        k = np.arange(cum[-1], dtype=np.int64) - np.repeat(
            cum[:-1], n_chunks
        )
        start = k * S
        lens = np.minimum(W, counts[doc_rep] - start)
        tok_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        return tok_start[doc_rep] + start, lens, doc_rep, k

    def term_tf(ft, offs, lens, term):
        """Per-window term counts via one prefix sum over the flat mask."""
        mask = (
            ft.tokens_arrow.to_numpy(zero_copy_only=False) == term
        ).astype(np.int64)
        pre = np.concatenate([[0], np.cumsum(mask)])
        return pre[offs + lens] - pre[offs]

    def df_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        offs, lens, _, _ = windows(ft)
        rows_t, rows_n = ["\x00total"], [len(offs)]
        for t in terms:
            rows_t.append(t)
            rows_n.append(int((term_tf(ft, offs, lens, t) > 0).sum()))
        return pa.table(
            {
                "tok": pa.array(rows_t, type=pa.string()),
                "n": pa.array(np.asarray(rows_n, dtype=np.int64)),
            }
        )

    stats = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    lookup = {} if stats.empty else dict(zip(stats["tok"], stats["n"]))
    n_total = int(lookup.pop("\x00total", 0))
    weights = {t: n_total // int(df) for t, df in lookup.items() if df}
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "chunk_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.int64()),
        }
    )
    if not weights:
        return empty

    def score_partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        offs, lens, doc_rep, k = windows(ft)
        if len(offs) == 0:
            return empty
        score = np.zeros(len(offs), dtype=np.int64)
        for t, w in weights.items():
            score += term_tf(ft, offs, lens, t) * w
        hit = score > 0
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[doc_rep[hit]]
        kk = k[hit]
        sc = score[hit]
        order = np.lexsort((kk, doc, -sc))[:TOPK_DOCS]
        return pa.table(
            {
                "doc_id": pa.array(doc[order].astype(np.int64)),
                "chunk_id": pa.array(kk[order]),
                "score": pa.array(sc[order]),
            }
        )

    cands = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_merge(df: "pd.DataFrame") -> pa.Table:
        import pandas as pd  # noqa: F401

        df = df.sort_values(
            ["score", "doc_id", "chunk_id"],
            ascending=[False, True, True],
        ).head(TOPK_DOCS)
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy().astype(np.int64)
                ),
                "chunk_id": pa.array(
                    df["chunk_id"].to_numpy().astype(np.int64)
                ),
                "score": pa.array(
                    df["score"].to_numpy().astype(np.int64)
                ),
            }
        )

    return final_merge(cands.to_pandas())
