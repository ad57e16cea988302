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

from ..corpus import (
    CATEGORY_MIN_COUNT,
    DIAGRAM_TOKEN,
    SQL_ALL_SPANS,
    SQL_CATEGORY,
    TABLE_TOKEN,
)
from ..functions.dedup import (
    _MH_A,
    _MH_B,
    BAND_SIZE,
    MINHASH_SEEDS,
    N_BANDS,
    SHINGLE_N,
)
from ..functions.malloc_tuning import tune_malloc
from ..functions.text import QUALITY_STOPWORDS
from ..registry import query
from ..sources.readers import read_spans_corpus
from ..stages.explode import explode_spans
from ..stages.skew import cap_spans_per_row, cluster_cpus
from ..stages.strike import rule_verdict_flat
from .extraction import _REASSEMBLE_BUCKET_BITS, _reassemble_bucket
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


def _drop_struck_add_bucket(t: pa.Table) -> pa.Table:
    """Drop struck spans and key the survivors by doc bucket for the
    amortized groupby reassembly (see extraction._reassemble_bucket)."""
    t = t.filter(
        pa.compute.invert(t["struck"].combine_chunks())
    ).drop_columns(["struck"])
    doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return t.append_column(
        "_db", pa.array(doc >> _REASSEMBLE_BUCKET_BITS)
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
        .map_batches(_drop_struck_add_bucket, batch_format="pyarrow")
    )
    sch = flat.schema()
    if sch is not None and "category" in sch.names:
        flat = flat.drop_columns(["category"])
    return flat.groupby("_db").map_groups(
        _reassemble_bucket, batch_format="pandas"
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
    """Per-chunk-row (token, count) combiner over text spans — pure Arrow
    (filter + value_counts), no Python-object round-trip of the token
    column (the old to_pylist/np.unique path allocated one PyObject per
    span on the hottest text path)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    toks = flat.field("text").filter(
        pa.compute.equal(flat.field("kind"), "text")
    )
    vc = pa.compute.value_counts(toks)
    return pa.table(
        {
            "tok": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
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


# ---------------------------------------------------------------------------
# MinHash LSH bands computed FROM the nested spans layout, chunk-EXACT for
# word 3-shingles (dedup family joins the spans-native set). The cap splits
# a document's token stream mid-shingle, so per-chunk minima alone would
# miss every shingle that straddles a chunk boundary. Pattern: boundary-
# token exchange — each chunk row emits (a) per-seed minima over its
# INTERNAL shingles (windows fully inside the chunk, vectorized exactly
# like the flat path's one-md5-per-unique-shingle kernel) and (b) its first
# two / last two tokens. A per-doc map_groups over the chunk PARTIAL rows
# (O(chunks per doc), never the text itself) reconstructs the <=2 shingles
# per boundary from the exchanged tokens, folds their hashes into the
# minima, and emits band keys. Result is byte-identical to the flat
# `minhash_bands` query, so it reuses that oracle verbatim.
# ---------------------------------------------------------------------------


def _chunk_text_tokens(batch: pa.Table):
    """Flatten a capped-spans batch to per-chunk-row text-token segments.

    Returns (doc_id_per_row, chunk_off_per_row, tokens object array,
    row_starts, n_toks, keep, t_off) where row_starts[k]..row_starts[k+1]
    indexes row k's text tokens in offset order (the nested layout is
    offset-ordered by construction — corpus.derive_spans_batch scatters to
    dense positions) and ``t_off`` carries each token's absolute span
    offset. Rows with zero text spans are flagged false in ``keep`` (they
    carry no token adjacency: the corpus emits at least one text span per
    non-null document, so a zero-text chunk can only be a media-only tail
    slice).
    """
    tune_malloc()  # token/shingle hot path: keep freed numpy buffers mapped
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    row_of_span = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    is_text = np.asarray(
        pa.compute.equal(flat.field("kind"), "text").to_numpy(
            zero_copy_only=False
        )
    )
    toks = np.asarray(flat.field("text").to_pylist(), dtype=object)[is_text]
    t_rows = row_of_span[is_text]
    t_off = flat.field("offset").to_numpy(zero_copy_only=False)[is_text]
    n_rows = len(batch)
    n_toks = np.bincount(t_rows, minlength=n_rows).astype(np.int64)
    row_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_toks, out=row_starts[1:])
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    chunk_off = np.full(n_rows, np.iinfo(np.int64).max, dtype=np.int64)
    if len(t_off):
        np.minimum.at(chunk_off, t_rows, t_off)
    keep = n_toks > 0
    return doc_ids, chunk_off, toks, row_starts, n_toks, keep, t_off


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """(n, MINHASH_SEEDS) uint64 permuted hashes — identical arithmetic to
    functions/dedup._signatures_from_pairs and the HUGEINT SQL."""
    n = len(shingles)
    buf = bytearray(n * 8)
    mv = memoryview(buf)
    for u, sh in enumerate(shingles):
        mv[u * 8 : u * 8 + 8] = hashlib.md5(sh.encode()).digest()[:8]
    base = np.frombuffer(buf, dtype=">u8").astype(np.uint64)
    with np.errstate(over="ignore"):
        return base[:, None] * _MH_A[None, :] + _MH_B[None, :]


_U64_MAX = np.iinfo(np.uint64).max


def _unique_window_strings(toks: np.ndarray, valid: np.ndarray):
    """(unique joined 3-gram strings, inverse) for window starts ``valid``
    over the flat token buffer — no per-window Python f-strings: tokens
    factorize once, the ID TRIPLES dedupe with integer ops, and np.char
    joins only the unique triples (the md5 input the SQL oracles mirror)."""
    utoks, tok_id = np.unique(toks.astype(str), return_inverse=True)
    m = len(utoks)
    i0, i1, i2 = tok_id[valid], tok_id[valid + 1], tok_id[valid + 2]
    if m ** 3 < 2 ** 62:
        packed = (i0 * m + i1) * m + i2
        utrip, inv = np.unique(packed, return_inverse=True)
        u0, u1, u2 = utrip // (m * m), (utrip // m) % m, utrip % m
    else:  # overflow guard: lexsort-based row unique
        trip = np.stack([i0, i1, i2], axis=1)
        urows, inv = np.unique(trip, axis=0, return_inverse=True)
        u0, u1, u2 = urows[:, 0], urows[:, 1], urows[:, 2]
    uniq = np.char.add(
        np.char.add(np.char.add(np.char.add(utoks[u0], " "), utoks[u1]), " "),
        utoks[u2],
    )
    return uniq, inv


def _mh_chunk_partial(batch: pa.Table) -> pa.Table:
    """Per-chunk-row MinHash partial: internal-window per-seed minima +
    boundary tokens (all tokens when the chunk holds <= 4)."""
    doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = _chunk_text_tokens(
        batch
    )
    n_rows = len(n_toks)
    # internal windows: token triples not crossing a row boundary
    # (vectorized: a window starting at flat position g stays inside its
    # row iff tokens g and g+2 belong to the same row)
    tok_rows = np.repeat(np.arange(n_rows, dtype=np.int64), n_toks)
    minima = np.full((n_rows, MINHASH_SEEDS), _U64_MAX, dtype=np.uint64)
    if len(toks) >= SHINGLE_N:
        valid = np.flatnonzero(tok_rows[: -(SHINGLE_N - 1)]
                               == tok_rows[SHINGLE_N - 1 :])
        if len(valid):
            uniq, inv = _unique_window_strings(toks, valid)
            vals = _hash_shingles(uniq.tolist())
            np.minimum.at(minima, tok_rows[valid], vals[inv])
    btoks = []
    for r in range(n_rows):
        lo, hi = row_starts[r], row_starts[r + 1]
        n = hi - lo
        if n <= 4:
            btoks.append(toks[lo:hi].tolist())
        else:
            btoks.append([toks[lo], toks[lo + 1], toks[hi - 2], toks[hi - 1]])
    k = np.flatnonzero(keep)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[k], type=pa.int64()),
            "chunk_off": pa.array(chunk_off[k], type=pa.int64()),
            "n_toks": pa.array(n_toks[k], type=pa.int64()),
            "btoks": pa.array([btoks[r] for r in k], type=pa.list_(pa.string())),
            "minima": pa.array(
                [minima[r].tolist() for r in k], type=pa.list_(pa.uint64())
            ),
        }
    )


def _doc_boundary_state(df: pd.DataFrame):
    """Shared combine-side machinery: from a doc's sorted chunk partials
    (n_toks, btoks) reconstruct total token count ``n``, chunk base
    positions, and the sparse global-position -> token map of exchanged
    boundary tokens (every token within SHINGLE_N-1 of a chunk edge is in
    the map by construction)."""
    ns = df["n_toks"].to_numpy().astype(np.int64)
    base = np.zeros(len(ns) + 1, dtype=np.int64)
    np.cumsum(ns, out=base[1:])
    n = int(base[-1])
    gpos: dict[int, str] = {}
    for c, (nt, bt) in enumerate(zip(ns, df["btoks"])):
        bt = list(bt)
        pos = range(nt) if nt <= 4 else (0, 1, nt - 2, nt - 1)
        for p, t in zip(pos, bt):
            gpos[int(base[c]) + p] = t
    return n, base, gpos


def _straddle_shingles(n: int, base: np.ndarray, gpos: dict) -> list[str]:
    """The shingles whose 3-token window crosses a chunk boundary: window
    start j sees boundary p iff j in {p-2, p-1} (clipped to valid starts);
    all needed tokens are in the exchanged-boundary map."""
    js = sorted(
        {
            j
            for p in base[1:-1]
            for j in (int(p) - 2, int(p) - 1)
            if 0 <= j <= n - SHINGLE_N
        }
    )
    return [" ".join(gpos[j + k] for k in range(SHINGLE_N)) for j in js]


def _mh_combine_doc(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc combine of chunk partials: min over chunk minima, plus the
    hashes of boundary-straddling shingles rebuilt from exchanged tokens
    (and the whole-text fallback shingle when the doc has < SHINGLE_N
    tokens, matching the flat path / SQL)."""
    df = df.sort_values("chunk_off")
    n, base, gpos = _doc_boundary_state(df)
    sig = np.full(MINHASH_SEEDS, _U64_MAX, dtype=np.uint64)
    if n < SHINGLE_N:
        extra = [" ".join(gpos[g] for g in range(n))]
    else:
        mins = np.stack(
            [np.asarray(m, dtype=np.uint64) for m in df["minima"]]
        )
        sig = mins.min(axis=0)
        extra = _straddle_shingles(n, base, gpos)
    if extra:
        sig = np.minimum(sig, _hash_shingles(extra).min(axis=0))
    keys = [
        hashlib.md5(
            "|".join(
                str(int(v)) for v in sig[b * BAND_SIZE : (b + 1) * BAND_SIZE]
            ).encode()
        ).hexdigest()
        for b in range(N_BANDS)
    ]
    return pd.DataFrame(
        {
            "doc_id": np.repeat(df["doc_id"].iloc[0], N_BANDS).astype(np.int64),
            "band": np.arange(N_BANDS, dtype=np.int64),
            "band_key": keys,
        }
    )


# Doc-bucketed combine: Ray's map_groups calls the UDF once PER GROUP,
# and a per-doc pandas call costs ~0.6 ms single-process (measured 3 ms
# under 32-way concurrency — 243 s of remote time for an 80k-doc stress).
# Grouping on doc_id // _COMBINE_BUCKET instead hands the combiner a
# bucket of complete documents at once and the whole bucket vectorizes:
# per-doc reductions are np.minimum/add.reduceat over rows sorted by
# (doc_id, chunk_off), boundary windows batch across docs, and only the
# unique straddle shingles are hashed.
_COMBINE_BUCKET = 256


class _BucketLayout:
    """Shared multi-doc combine machinery over a bucket's chunk partials
    (rows pre-sorted by (doc_id, chunk_off)): doc segmentation for
    np.*.reduceat, per-row token base positions, the exchanged boundary
    token map, and the boundary-straddling shingles — all per BUCKET, so
    per-doc Python overhead never scales with corpus size."""

    __slots__ = ("df", "doc", "ns", "change", "starts", "d_of_row",
                 "docs", "n_per_doc", "base")

    def __init__(self, df: pd.DataFrame):
        df = df.sort_values(["doc_id", "chunk_off"])
        self.df = df
        self.doc = df["doc_id"].to_numpy()
        self.ns = df["n_toks"].to_numpy().astype(np.int64)
        self.change = np.concatenate(
            [[True], self.doc[1:] != self.doc[:-1]]
        )
        self.starts = np.flatnonzero(self.change)
        self.d_of_row = np.cumsum(self.change) - 1
        self.docs = self.doc[self.starts].astype(np.int64)
        self.n_per_doc = np.add.reduceat(self.ns, self.starts)
        cum = np.cumsum(self.ns) - self.ns
        self.base = cum - cum[self.starts][self.d_of_row]

    def gpos(self) -> dict:
        """(doc index, global token pos) -> token, from boundary tokens."""
        out: dict[tuple[int, int], str] = {}
        btoks_col = self.df["btoks"].to_numpy()
        for r in range(len(self.df)):
            nt = int(self.ns[r])
            pos = range(nt) if nt <= 4 else (0, 1, nt - 2, nt - 1)
            b, d = int(self.base[r]), int(self.d_of_row[r])
            for p, t in zip(pos, btoks_col[r]):
                out[(d, b + p)] = t
        return out

    def straddles(self, gpos: dict):
        """(doc index list, shingle list) for windows crossing any chunk
        boundary: starts p-2, p-1 around each boundary p."""
        sh_doc: list[int] = []
        sh_str: list[str] = []
        # dedup (doc, window-start): adjacent boundaries around a 1-token
        # interior chunk both generate j = p - 1, and additive consumers
        # (decon_combine_bucket's np.add.at) would double-count it
        seen: set[tuple[int, int]] = set()
        for r in np.flatnonzero(~self.change):
            d = int(self.d_of_row[r])
            n = int(self.n_per_doc[d])
            if n < SHINGLE_N:
                continue
            p = int(self.base[r])
            for j in (p - 2, p - 1):
                if 0 <= j <= n - SHINGLE_N and (d, j) not in seen:
                    seen.add((d, j))
                    sh_doc.append(d)
                    sh_str.append(
                        " ".join(gpos[(d, j + k)] for k in range(SHINGLE_N))
                    )
        return sh_doc, sh_str


def _mh_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    lay = _BucketLayout(df)
    df, starts, n_docs = lay.df, lay.starts, len(lay.starts)
    docs, n_per_doc = lay.docs, lay.n_per_doc
    mins = np.stack(list(df["minima"])).astype(np.uint64)
    sig = np.minimum.reduceat(mins, starts, axis=0)
    gpos = lay.gpos()
    sh_doc, sh_str = lay.straddles(gpos)
    # whole-text fallback for docs below the shingle width
    for d in np.flatnonzero(n_per_doc < SHINGLE_N):
        d = int(d)
        sh_doc.append(d)
        sh_str.append(
            " ".join(gpos[(d, g)] for g in range(int(n_per_doc[d])))
        )
    if sh_str:
        uniq, inv = np.unique(np.asarray(sh_str, dtype=object),
                              return_inverse=True)
        vals = _hash_shingles(uniq.tolist())
        np.minimum.at(sig, np.asarray(sh_doc), vals[inv])
    keys = [
        hashlib.md5(
            "|".join(
                str(int(v)) for v in sig[d, b * BAND_SIZE : (b + 1) * BAND_SIZE]
            ).encode()
        ).hexdigest()
        for d in range(n_docs)
        for b in range(N_BANDS)
    ]
    return pd.DataFrame(
        {
            "doc_id": np.repeat(docs, N_BANDS),
            "band": np.tile(np.arange(N_BANDS, dtype=np.int64), n_docs),
            "band_key": keys,
        }
    )


def _with_bucket(t: pa.Table) -> pa.Table:
    b = t["doc_id"].to_numpy(zero_copy_only=False) // _COMBINE_BUCKET
    return t.append_column("bucket", pa.array(b, type=pa.int64()))


_REDUCE_BLOCKS = 32  # single-node fallback (this sandbox's core count)


def _reduce_blocks() -> int:
    """Consolidation width for pre-groupby partial blocks: ~1 per core.

    Ray 2.49's all-to-all pays a fixed per-(input x output)-block cost;
    256 tiny partial blocks cost ~12 s of pure overhead at the 80k-doc
    stress (measured: partials-only 4.5 s, +groupby 17.4 s,
    +repartition(~cores) 5.0 s). Sized from live cluster resources so a
    256-node deployment consolidates to ~total-cores blocks, not to this
    sandbox's 32 — the block count must scale with the cluster or the
    shuffle re-serializes through too few, too-large blocks."""
    return cluster_cpus(_REDUCE_BLOCKS)


def q_minhash_bands_spans(sf_dir: str):
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_mh_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _mh_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style quality counters FROM the nested spans layout. Sums
# (n_tokens, total_token_len, n_stopword) are addition-combinable; the
# immediate-repetition counter is NOT (a repeat pair can straddle a chunk
# boundary), so each chunk also exchanges its first/last token and the
# per-doc combine counts boundary repeats between consecutive chunks.
# Reuses the flat quality_stats oracle verbatim.
# ---------------------------------------------------------------------------


def _quality_chunk_partial(batch: pa.Table) -> pa.Table:
    doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = _chunk_text_tokens(
        batch
    )
    n_rows = len(n_toks)
    tok_rows = np.repeat(np.arange(n_rows, dtype=np.int64), n_toks)
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                       count=len(toks))
    total_len = np.bincount(tok_rows, weights=lens, minlength=n_rows).astype(
        np.int64
    )
    stop = np.isin(toks.astype(str), QUALITY_STOPWORDS)
    n_stop = np.bincount(tok_rows[stop], minlength=n_rows).astype(np.int64)
    # internal immediate repeats (token == predecessor within the chunk)
    rep = np.zeros(n_rows, dtype=np.int64)
    if len(toks) > 1:
        same = (toks[1:] == toks[:-1]) & (tok_rows[1:] == tok_rows[:-1])
        np.add.at(rep, tok_rows[1:][same], 1)
    first = np.empty(n_rows, dtype=object)
    last = np.empty(n_rows, dtype=object)
    for r in range(n_rows):
        lo, hi = row_starts[r], row_starts[r + 1]
        if hi > lo:
            first[r], last[r] = toks[lo], toks[hi - 1]
    k = np.flatnonzero(keep)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[k], type=pa.int64()),
            "chunk_off": pa.array(chunk_off[k], type=pa.int64()),
            "n_tokens": pa.array(n_toks[k], type=pa.int64()),
            "total_token_len": pa.array(total_len[k], type=pa.int64()),
            "n_stopword": pa.array(n_stop[k], type=pa.int64()),
            "n_repeat": pa.array(rep[k], type=pa.int64()),
            "first_tok": pa.array(first[k].tolist(), type=pa.string()),
            "last_tok": pa.array(last[k].tolist(), type=pa.string()),
        }
    )


def _quality_combine_doc(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("chunk_off")
    n_rep = int(df["n_repeat"].sum())
    lasts = df["last_tok"].to_numpy()
    firsts = df["first_tok"].to_numpy()
    if len(df) > 1:
        n_rep += int((lasts[:-1] == firsts[1:]).sum())
    return pd.DataFrame(
        {
            "doc_id": [int(df["doc_id"].iloc[0])],
            "n_tokens": [int(df["n_tokens"].sum())],
            "total_token_len": [int(df["total_token_len"].sum())],
            "n_stopword": [int(df["n_stopword"].sum())],
            "n_repeat": [n_rep],
        }
    )


def _quality_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized multi-doc combine (same bucket trick as minhash): sums
    reduce with np.add.reduceat; boundary repeats are the rows that are
    not first-of-doc whose first token equals the previous row's last."""
    df = df.sort_values(["doc_id", "chunk_off"])
    doc = df["doc_id"].to_numpy()
    change = np.concatenate([[True], doc[1:] != doc[:-1]])
    starts = np.flatnonzero(change)
    firsts = df["first_tok"].to_numpy()
    lasts = df["last_tok"].to_numpy()
    brep = np.zeros(len(df), dtype=np.int64)
    if len(df) > 1:
        brep[1:] = (~change[1:] & (firsts[1:] == lasts[:-1])).astype(
            np.int64
        )
    out = {"doc_id": doc[starts].astype(np.int64)}
    for col in ("n_tokens", "total_token_len", "n_stopword"):
        out[col] = np.add.reduceat(
            df[col].to_numpy().astype(np.int64), starts
        )
    out["n_repeat"] = np.add.reduceat(
        df["n_repeat"].to_numpy().astype(np.int64) + brep, starts
    )
    return pd.DataFrame(out)


def q_quality_stats_spans(sf_dir: str):
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_quality_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _quality_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


def _register_shared_oracle_variants() -> None:
    """Register the two chunk-exact spans-native queries under the SAME
    oracles as their flat counterparts (imported lazily to avoid a module
    cycle at registry load time)."""
    from .queries_dedup import _MINHASH_BANDS_SQL
    from .queries_text import _QUALITY_SQL

    query("minhash_bands_spans", _MINHASH_BANDS_SQL)(q_minhash_bands_spans)
    query("quality_stats_spans", _QUALITY_SQL)(q_quality_stats_spans)


_register_shared_oracle_variants()


# ---------------------------------------------------------------------------
# Decontamination FROM the nested spans layout — third family on the
# boundary-exchange pattern. The flat `decontaminate` counts every 3-gram
# OCCURRENCE of a training doc that appears in the benchmark gram set;
# occurrence counts are addition-combinable, so each chunk row counts its
# INTERNAL matched windows against the broadcast benchmark set and
# exchanges boundary tokens; the per-doc combine rebuilds the (<= 2 per
# boundary) straddling grams, and a final vectorized stage scores them
# against the same broadcast set — no chunk text ever re-joins. The
# benchmark side (1/_BENCH_MOD of docs) is itself assembled chunk-exactly:
# per-chunk internal grams + straddle grams from the same combine
# machinery. Reuses the flat oracle verbatim.
# ---------------------------------------------------------------------------


def _internal_grams(toks: np.ndarray, n_toks: np.ndarray):
    """(grams array, owning row array) for windows fully inside a chunk.

    Joined-string construction runs only over UNIQUE token-id triples
    (np.char over factorized tokens) and scatters back via the inverse —
    no per-window Python f-string on the hot path."""
    n_rows = len(n_toks)
    tok_rows = np.repeat(np.arange(n_rows, dtype=np.int64), n_toks)
    if len(toks) < SHINGLE_N:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    valid = np.flatnonzero(
        tok_rows[: -(SHINGLE_N - 1)] == tok_rows[SHINGLE_N - 1 :]
    )
    if not len(valid):
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    uniq, inv = _unique_window_strings(toks, valid)
    return uniq[inv].astype(object), tok_rows[valid]


def _boundary_cols(toks: np.ndarray, row_starts: np.ndarray) -> list:
    """Per-chunk exchanged boundary tokens (all when the chunk has <= 4)."""
    out = []
    for r in range(len(row_starts) - 1):
        lo, hi = row_starts[r], row_starts[r + 1]
        n = hi - lo
        if n <= 4:
            out.append(toks[lo:hi].tolist())
        else:
            out.append([toks[lo], toks[lo + 1], toks[hi - 2], toks[hi - 1]])
    return out


def q_decontaminate_spans(sf_dir: str):
    import pyarrow.compute as pc
    import ray

    from .queries_text import _BENCH_MOD

    bench_mod = _BENCH_MOD
    capped = _capped_spans(sf_dir)

    def bench_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % bench_mod == 0))
        doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = (
            _chunk_text_tokens(sub)
        )
        grams, gram_rows = _internal_grams(toks, n_toks)
        per_row = [[] for _ in range(len(n_toks))]
        for g, r in zip(grams, gram_rows):
            per_row[r].append(g)
        k = np.flatnonzero(keep)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[k], type=pa.int64()),
                "chunk_off": pa.array(chunk_off[k], type=pa.int64()),
                "n_toks": pa.array(n_toks[k], type=pa.int64()),
                "btoks": pa.array(
                    _boundary_cols(toks, row_starts), type=pa.list_(pa.string())
                ).take(pa.array(k)),
                "grams": pa.array(
                    [per_row[r] for r in k], type=pa.list_(pa.string())
                ),
            }
        )

    def bench_combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("chunk_off")
        n, base, gpos = _doc_boundary_state(df)
        grams: set[str] = set()
        for g in df["grams"]:
            grams.update(list(g))
        if n >= SHINGLE_N:
            grams.update(_straddle_shingles(n, base, gpos))
        return pd.DataFrame({"gram": sorted(grams)})

    # small side (1/bench_mod of the corpus): distinct grams, chunk-exact,
    # deduped per doc then once on the driver before the broadcast. The
    # per-doc combine (gpos-dict straddle rebuild) is inherently per-doc;
    # its DISPATCH rides a doc-prefix bucket (stages/buckets pattern)
    from ..stages.buckets import per_key_in_bucket

    gram_rows = (
        capped.map_batches(bench_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .map_batches(
            lambda t: t.append_column(
                "_db",
                pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                    >> 8
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("_db")
        .map_groups(
            per_key_in_bucket(bench_combine, "doc_id"),
            batch_format="pandas",
        )
        .take_all()
    )
    bench = pa.array(
        np.unique(np.array([r["gram"] for r in gram_rows], dtype=object)),
        type=pa.string(),
    )
    ref = ray.put(bench)

    # plain task fns closing over the broadcast ref (ray.get per task is a
    # zero-copy plasma read): an actor pool here would swallow the fused
    # synthesis chain at pool width — the fusion-collapse trap — while a
    # task map keeps the whole chain at session width
    def internal_hits(batch: pa.Table) -> pa.Table:
        bench_set = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % bench_mod != 0))
        doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = (
            _chunk_text_tokens(sub)
        )
        grams, gram_rows = _internal_grams(toks, n_toks)
        hits = np.zeros(len(n_toks), dtype=np.int64)
        if len(grams):
            hit = pc.is_in(
                pa.array(grams, type=pa.string()), value_set=bench_set
            ).to_numpy(zero_copy_only=False)
            np.add.at(hits, gram_rows[hit], 1)
        # token-bearing chunk rows only: the corpus guarantees >=1 token
        # per doc, so every doc keeps at least one row (LEFT-JOIN shape)
        k = np.flatnonzero(keep)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[k], type=pa.int64()),
                "chunk_off": pa.array(chunk_off[k], type=pa.int64()),
                "n_toks": pa.array(n_toks[k], type=pa.int64()),
                "btoks": pa.array(
                    _boundary_cols(toks, row_starts),
                    type=pa.list_(pa.string()),
                ).take(pa.array(k)),
                "n_internal": pa.array(hits[k], type=pa.int64()),
            }
        )

    def decon_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Bucket-vectorized combine that also folds in the straddle-gram
        hits (bench set read once per bucket from plasma), so the combine
        IS the final stage."""
        lay = _BucketLayout(df)
        n_internal = np.add.reduceat(
            lay.df["n_internal"].to_numpy().astype(np.int64), lay.starts
        )
        sh_doc, sh_str = lay.straddles(lay.gpos())
        extra = np.zeros(len(lay.starts), dtype=np.int64)
        if sh_str:
            bench_set = ray.get(ref)
            hit = pc.is_in(
                pa.array(sh_str, type=pa.string()), value_set=bench_set
            ).to_numpy(zero_copy_only=False)
            np.add.at(extra, np.asarray(sh_doc)[hit], 1)
        n = n_internal + extra
        return pd.DataFrame(
            {
                "doc_id": lay.docs,
                "n_matched": n,
                "contaminated": n > 0,
            }
        )

    return (
        capped.map_batches(
            lambda t: _with_bucket(internal_hits(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: decon_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


def _register_decontaminate_spans() -> None:
    from .queries_text import _DECONTAM_SQL

    query("decontaminate_spans", _DECONTAM_SQL)(q_decontaminate_spans)


_register_decontaminate_spans()


# ---------------------------------------------------------------------------
# End-to-end curation over the NESTED layout — the composite recipe
# (Gopher quality gate -> exact content dedup -> per-category accounting)
# computed entirely from capped chunk rows, every gate chunk-exact:
# counters and the position-salted dedup signature are sums, the
# most-frequent-token rule merges per-chunk token histograms (O(doc
# vocab) rows through the combine, never the text), and the M5 routing
# category falls out of the same histograms. Three shuffles total:
# doc-combine, signature groupby, category aggregate.
# ---------------------------------------------------------------------------
_STOP_SQL = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

_CURATION_SPANS_SQL = f"""
{SQL_ALL_SPANS},
{SQL_CATEGORY},
tok_stats AS (
  SELECT doc_id,
         count(*) AS n_words,
         sum(strlen(text)) AS total_len,
         sum(CASE WHEN text IN ({_STOP_SQL}) THEN 1 ELSE 0 END) AS n_stop,
         sum(CASE WHEN strlen(text) <= 3 THEN 1 ELSE 0 END) AS n_short,
         sum(CAST(('0x' || substr(md5(text || '@' || off), 1, 10))::UBIGINT
                  AS BIGINT)) AS sig
  FROM all_spans WHERE kind = 'text' GROUP BY doc_id
),
modes AS (
  SELECT doc_id, max(c) AS mode_cnt FROM (
    SELECT doc_id, text, count(*) AS c
    FROM all_spans WHERE kind = 'text' GROUP BY doc_id, text
  ) t GROUP BY doc_id
),
pass AS (
  SELECT s.doc_id, s.n_words, s.sig
  FROM tok_stats s JOIN modes m USING (doc_id)
  WHERE s.n_words BETWEEN 30 AND 80
    AND 10 * s.total_len >= 43 * s.n_words
    AND 10 * s.total_len <= 48 * s.n_words
    AND s.n_stop >= 2
    AND 100 * s.n_short <= 25 * s.n_words
    AND 100 * m.mode_cnt <= 10 * s.n_words
),
kept AS (SELECT min(doc_id) AS doc_id FROM pass GROUP BY sig)
SELECT c.category, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.n_words) AS BIGINT) AS total_words
FROM kept k JOIN pass p USING (doc_id) JOIN doc_category c USING (doc_id)
GROUP BY c.category
"""


def _curation_chunk_partial(batch: pa.Table) -> pa.Table:
    doc_ids, chunk_off, toks, row_starts, n_toks, keep, t_off = (
        _chunk_text_tokens(batch)
    )
    n_rows = len(n_toks)
    tok_rows = np.repeat(np.arange(n_rows, dtype=np.int64), n_toks)
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                       count=len(toks))
    total_len = np.bincount(tok_rows, weights=lens, minlength=n_rows).astype(
        np.int64
    )
    stop = np.isin(toks.astype(str), QUALITY_STOPWORDS)
    n_stop = np.bincount(tok_rows[stop], minlength=n_rows).astype(np.int64)
    n_short = np.bincount(
        tok_rows[lens <= 3], minlength=n_rows
    ).astype(np.int64)
    sig_vals = np.fromiter(
        (
            int(hashlib.md5(f"{t}@{o}".encode()).hexdigest()[:10], 16)
            for t, o in zip(toks, t_off)
        ),
        dtype=np.int64,
        count=len(toks),
    )
    sig_part = np.zeros(n_rows, dtype=np.int64)
    np.add.at(sig_part, tok_rows, sig_vals)
    # per-chunk token histogram (mode rule + routing category both merge
    # from these in the per-doc combine)
    hist_toks, hist_counts = [], []
    for r in range(n_rows):
        lo, hi = row_starts[r], row_starts[r + 1]
        u, c = np.unique(toks[lo:hi].astype(str), return_counts=True)
        hist_toks.append(u.tolist())
        hist_counts.append(c.astype(np.int64).tolist())
    k = np.flatnonzero(keep)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[k], type=pa.int64()),
            "chunk_off": pa.array(chunk_off[k], type=pa.int64()),
            "n_words": pa.array(n_toks[k], type=pa.int64()),
            "total_len": pa.array(total_len[k], type=pa.int64()),
            "n_stop": pa.array(n_stop[k], type=pa.int64()),
            "n_short": pa.array(n_short[k], type=pa.int64()),
            "sig_part": pa.array(sig_part[k], type=pa.int64()),
            "hist_toks": pa.array(
                [hist_toks[r] for r in k], type=pa.list_(pa.string())
            ),
            "hist_counts": pa.array(
                [hist_counts[r] for r in k], type=pa.list_(pa.int64())
            ),
        }
    )


def _curation_combine_doc(df: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "sig": pd.Series([], dtype=np.int64),
            "category": pd.Series([], dtype=object),
            "n_words": pd.Series([], dtype=np.int64),
        }
    )
    n_words = int(df["n_words"].sum())
    total_len = int(df["total_len"].sum())
    n_stop = int(df["n_stop"].sum())
    n_short = int(df["n_short"].sum())
    sig = int(df["sig_part"].sum())
    hist: dict[str, int] = {}
    for ts, cs in zip(df["hist_toks"], df["hist_counts"]):
        for t, c in zip(ts, cs):
            hist[t] = hist.get(t, 0) + int(c)
    mode_cnt = max(hist.values()) if hist else 0
    if not (
        30 <= n_words <= 80
        and 43 * n_words <= 10 * total_len <= 48 * n_words
        and n_stop >= 2
        and 100 * n_short <= 25 * n_words
        and 100 * mode_cnt <= 10 * n_words
    ):
        return empty
    if hist.get(TABLE_TOKEN, 0) >= CATEGORY_MIN_COUNT:
        category = "tables"
    elif hist.get(DIAGRAM_TOKEN, 0) >= CATEGORY_MIN_COUNT:
        category = "diagrams"
    else:
        category = "other"
    return pd.DataFrame(
        {
            "doc_id": [int(df["doc_id"].iloc[0])],
            "sig": [sig],
            "category": [category],
            "n_words": [n_words],
        }
    )


def _curation_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Bucket-vectorized curation combine: counter sums reduce with
    np.add.reduceat; the per-doc token histograms merge by factorizing the
    exploded (doc, token) pairs to integer keys — mode count, stopword
    routing and the table/diagram counts all read off the merged
    histogram without per-doc Python."""
    lay = _BucketLayout(df.rename(columns={"n_words": "n_toks"}))
    df = lay.df
    starts, docs = lay.starts, lay.docs
    n_docs = len(starts)
    n_words = lay.n_per_doc
    total_len = np.add.reduceat(
        df["total_len"].to_numpy().astype(np.int64), starts
    )
    n_stop = np.add.reduceat(df["n_stop"].to_numpy().astype(np.int64),
                             starts)
    n_short = np.add.reduceat(df["n_short"].to_numpy().astype(np.int64),
                              starts)
    sig = np.add.reduceat(df["sig_part"].to_numpy().astype(np.int64),
                          starts)
    # merged histograms: explode list columns, factorize tokens, pack
    # (doc, token id) into one int64 key, sum counts per key
    item_lens = np.fromiter(
        (len(x) for x in df["hist_toks"]), dtype=np.int64, count=len(df)
    )
    d_item = np.repeat(lay.d_of_row, item_lens)
    toks_flat = np.concatenate(
        [np.asarray(list(x), dtype=object) for x in df["hist_toks"]]
    ) if len(df) else np.empty(0, dtype=object)
    cnts_flat = np.concatenate(
        [np.asarray(list(x), dtype=np.int64) for x in df["hist_counts"]]
    ) if len(df) else np.empty(0, dtype=np.int64)
    uniq_toks, tok_ids = np.unique(toks_flat.astype(str),
                                   return_inverse=True)
    v = max(1, len(uniq_toks))
    key = d_item * v + tok_ids
    ukey, inv = np.unique(key, return_inverse=True)
    merged = np.zeros(len(ukey), dtype=np.int64)
    np.add.at(merged, inv, cnts_flat)
    kd = ukey // v
    kt = ukey % v
    mode_cnt = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(mode_cnt, kd, merged)
    n_table = np.zeros(n_docs, dtype=np.int64)
    n_vector = np.zeros(n_docs, dtype=np.int64)
    t_idx = np.searchsorted(uniq_toks, TABLE_TOKEN)
    if t_idx < len(uniq_toks) and uniq_toks[t_idx] == TABLE_TOKEN:
        m = kt == t_idx
        n_table[kd[m]] = merged[m]
    d_idx = np.searchsorted(uniq_toks, DIAGRAM_TOKEN)
    if d_idx < len(uniq_toks) and uniq_toks[d_idx] == DIAGRAM_TOKEN:
        m = kt == d_idx
        n_vector[kd[m]] = merged[m]
    passes = (
        (n_words >= 30) & (n_words <= 80)
        & (10 * total_len >= 43 * n_words)
        & (10 * total_len <= 48 * n_words)
        & (n_stop >= 2)
        & (100 * n_short <= 25 * n_words)
        & (100 * mode_cnt <= 10 * n_words)
    )
    category = np.where(
        n_table >= CATEGORY_MIN_COUNT,
        "tables",
        np.where(n_vector >= CATEGORY_MIN_COUNT, "diagrams", "other"),
    )
    k = np.flatnonzero(passes)
    return pd.DataFrame(
        {
            "doc_id": docs[k],
            "sig": sig[k],
            "category": category[k],
            "n_words": n_words[k],
        }
    )


def _sig_keeper(g: pd.DataFrame) -> pd.DataFrame:
    """First-doc-wins per signature over a HASH BUCKET of sigs (sig is a
    sparse int64 hash — bucketed via sig % n, see the caller): one lexsort
    (sig, doc), segment heads win."""
    sig = g["sig"].to_numpy().astype(np.int64)
    doc = g["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((doc, sig))
    s = sig[order]
    first = order[np.r_[True, s[1:] != s[:-1]]]
    return g.iloc[first][["category", "n_words"]].reset_index(drop=True)


@query("curation_pipeline_spans", _CURATION_SPANS_SQL)
def q_curation_pipeline_spans(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "documents") == 0:
        return pa.table(
            {
                "category": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "total_words": pa.array([], type=pa.int64()),
            }
        )
    n_sig_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_curation_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _curation_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
        .map_batches(
            lambda t: t.append_column(
                "_sb",
                pa.array(
                    t["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
                    % np.int64(n_sig_buckets)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("_sb")
        .map_groups(_sig_keeper, batch_format="pandas")
        .groupby("category")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_words", alias_name="total_words"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints FROM the nested spans layout — fingerprint family
# joins the spans-native set. SimHash is a vote over each doc's DISTINCT
# tokens, and distinctness is NOT addition-combinable across chunks, so
# each chunk row exchanges its distinct-token list (bounded by chunk
# vocab) and the bucket combine unions them per doc by factorizing the
# exploded (doc, token) pairs — the same integer-key machinery as the
# curation histograms, presence-only. One md5 per bucket-unique token;
# votes, bit packing and hex emission fully vectorized. Reuses the flat
# dedup_simhash oracle verbatim.
# ---------------------------------------------------------------------------


def _simhash_chunk_partial(batch: pa.Table) -> pa.Table:
    doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = (
        _chunk_text_tokens(batch)
    )
    n_rows = len(n_toks)
    dtoks = []
    for r in range(n_rows):
        lo, hi = row_starts[r], row_starts[r + 1]
        dtoks.append(np.unique(toks[lo:hi].astype(str)).tolist())
    k = np.flatnonzero(keep)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[k], type=pa.int64()),
            "chunk_off": pa.array(chunk_off[k], type=pa.int64()),
            "n_toks": pa.array(n_toks[k], type=pa.int64()),
            "dtoks": pa.array(
                [dtoks[r] for r in k], type=pa.list_(pa.string())
            ),
        }
    )


def _simhash_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    lay = _BucketLayout(df)
    df = lay.df
    n_docs = len(lay.starts)
    item_lens = np.fromiter(
        (len(x) for x in df["dtoks"]), dtype=np.int64, count=len(df)
    )
    d_item = np.repeat(lay.d_of_row, item_lens)
    toks_flat = (
        np.concatenate(
            [np.asarray(list(x), dtype=object) for x in df["dtoks"]]
        )
        if len(df)
        else np.empty(0, dtype=object)
    )
    uniq_toks, tok_ids = np.unique(toks_flat.astype(str),
                                   return_inverse=True)
    # one md5 per bucket-unique token: base hash identical to the SQL's
    # ('0x' || substr(md5(tok), 1, 16))::UBIGINT
    hashes = np.fromiter(
        (
            int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for t in uniq_toks
        ),
        dtype=np.uint64,
        count=len(uniq_toks),
    )
    shifts = np.arange(64, dtype=np.uint64)
    bit_mat = (
        2 * ((hashes[:, None] >> shifts[None, :]) & 1).astype(np.int64) - 1
    )
    v = max(1, len(uniq_toks))
    pair = np.unique(d_item * v + tok_ids)
    acc = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(acc, pair // v, bit_mat[pair % v])
    bits = (acc > 0).astype(np.uint64)
    vals = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return pd.DataFrame(
        {
            "doc_id": lay.docs,
            "simhash": [format(int(x), "016x") for x in vals],
        }
    )


def q_simhash_spans(sf_dir: str):
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_simhash_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _simhash_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


def _register_simhash_spans() -> None:
    from .queries_dedup import _SIMHASH_SQL

    query("simhash_spans", _SIMHASH_SQL)(q_simhash_spans)


_register_simhash_spans()


# ---------------------------------------------------------------------------
# Interleaving-layout stats FROM the nested spans layout — the first
# spans-native query over the text x media INTERLEAVING itself (the
# north-star payload is interleaved text+media spans; every other query
# in this module consumes only the text stream). Per document: media and
# text span counts, the number of kind transitions in offset order, and
# the first media offset. Counts and the media-offset min are
# addition/min-combinable across chunks; transitions are NOT — a
# text|media boundary can fall exactly on a chunk split — so each chunk
# row exchanges its first/last span kind and the bucket combine adds one
# transition per adjacent chunk pair whose kinds differ. Reference
# anchor: the reference interleaves OCR text with media refs per page
# (fake_scan.py's page assembly); this measures that interleaving.
# ---------------------------------------------------------------------------
_MEDIA_LAYOUT_SQL = f"""
{SQL_ALL_SPANS},
seq AS (
  SELECT doc_id, kind, off,
         lag(kind) OVER (PARTITION BY doc_id ORDER BY off) AS pk
  FROM all_spans
)
SELECT doc_id,
       count(*) FILTER (WHERE kind = 'media') AS n_media,
       count(*) FILTER (WHERE kind = 'text') AS n_text,
       count(*) FILTER (WHERE pk IS NOT NULL AND pk <> kind)
           AS n_transitions,
       coalesce(min(off) FILTER (WHERE kind = 'media'), CAST(-1 AS BIGINT))
           AS first_media_off
FROM seq GROUP BY doc_id
"""

_NO_MEDIA = np.iinfo(np.int64).max  # min-identity sentinel, -1 on emit


def _layout_chunk_partial(batch: pa.Table) -> pa.Table:
    """Per-chunk-row interleaving partial over ALL spans (both kinds)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    n_spans = np.diff(spans.offsets.to_numpy(zero_copy_only=False)).astype(
        np.int64
    )
    n_rows = len(batch)
    row_of_span = np.repeat(np.arange(n_rows, dtype=np.int64), n_spans)
    is_media = np.asarray(
        pa.compute.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
    )
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    n_media = np.bincount(
        row_of_span[is_media], minlength=n_rows
    ).astype(np.int64)
    # internal transitions: adjacent spans in the SAME chunk row whose
    # kinds differ (span lists are offset-ordered by construction)
    adj = (is_media[1:] != is_media[:-1]) & (
        row_of_span[1:] == row_of_span[:-1]
    )
    n_trans = np.bincount(
        row_of_span[1:][adj], minlength=n_rows
    ).astype(np.int64)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_spans, out=starts[1:])
    first_media = np.full(n_rows, _NO_MEDIA, dtype=np.int64)
    if is_media.any():
        np.minimum.at(first_media, row_of_span[is_media], off[is_media])
    keep = n_spans > 0
    k = np.flatnonzero(keep)
    # exchanged boundary state: this chunk's first/last span kind, and
    # its first span's absolute offset as the chunk ordering key
    return pa.table(
        {
            "doc_id": pa.array(
                batch["doc_id"].to_numpy(zero_copy_only=False)[k],
                type=pa.int64(),
            ),
            "chunk_key": pa.array(off[starts[:-1]][k], type=pa.int64()),
            "n_spans": pa.array(n_spans[k], type=pa.int64()),
            "n_media": pa.array(n_media[k], type=pa.int64()),
            "n_trans": pa.array(n_trans[k], type=pa.int64()),
            "first_media": pa.array(first_media[k], type=pa.int64()),
            "first_is_media": pa.array(
                is_media[starts[:-1]][k], type=pa.bool_()
            ),
            "last_is_media": pa.array(
                is_media[starts[1:] - 1][k], type=pa.bool_()
            ),
        }
    )


def _layout_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["doc_id", "chunk_key"])
    doc = df["doc_id"].to_numpy()
    change = np.concatenate([[True], doc[1:] != doc[:-1]])
    starts = np.flatnonzero(change)
    d_of_row = np.cumsum(change) - 1
    n_spans = np.add.reduceat(df["n_spans"].to_numpy(), starts)
    n_media = np.add.reduceat(df["n_media"].to_numpy(), starts)
    n_trans = np.add.reduceat(df["n_trans"].to_numpy(), starts)
    fm = np.minimum.reduceat(df["first_media"].to_numpy(), starts)
    # one extra transition per adjacent chunk pair whose edge kinds differ
    first_k = df["first_is_media"].to_numpy()
    last_k = df["last_is_media"].to_numpy()
    joins = np.flatnonzero(~change)
    bt = joins[last_k[joins - 1] != first_k[joins]]
    np.add.at(n_trans, d_of_row[bt], 1)
    return pd.DataFrame(
        {
            "doc_id": doc[starts],
            "n_media": n_media,
            "n_text": n_spans - n_media,
            "n_transitions": n_trans,
            "first_media_off": np.where(fm == _NO_MEDIA, -1, fm),
        }
    )


@query("media_layout_spans", _MEDIA_LAYOUT_SQL)
def q_media_layout_spans(sf_dir: str):
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_layout_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _layout_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# Media-context (caption-candidate) mining FROM the nested spans layout:
# for every media span, the nearest preceding and following TEXT token in
# document offset order — the alt-text/caption association step of an
# OCR+media pipeline (the reference interleaves media refs between OCR
# text runs; pairing each ref with its surrounding words is how captions
# / figure labels get mined). Chunk-exact: a media span at a chunk edge
# (or inside a media-only chunk under a tiny cap) resolves against
# NEIGHBORING chunks' text, so each chunk row exchanges its first/last
# text token and the bucket combine runs a per-doc segmented
# forward/backward fill over the chunk sequence to resolve the
# unresolved edges. Everything vectorized: searchsorted for in-chunk
# resolution, maximum/minimum.accumulate for the cross-chunk fills.
# ---------------------------------------------------------------------------
_MEDIA_CONTEXT_SQL = f"""
{SQL_ALL_SPANS},
seq AS (
  SELECT doc_id, kind, media_ref, off,
         lag(text IGNORE NULLS) OVER w AS prev_tok,
         lead(text IGNORE NULLS) OVER w AS next_tok
  FROM all_spans
  WINDOW w AS (PARTITION BY doc_id ORDER BY off)
)
SELECT doc_id, media_ref, off AS media_off,
       coalesce(prev_tok, '') AS prev_tok,
       coalesce(next_tok, '') AS next_tok
FROM seq WHERE kind = 'media'
"""

_CTX_COLS = [
    "doc_id", "chunk_key", "is_chunk", "has_text", "first_tok",
    "last_tok", "media_ref", "media_off", "prev_tok", "next_tok",
    "prev_ok", "next_ok",
]


def _context_chunk_partial(batch: pa.Table) -> pa.Table:
    """One CHUNK row per non-empty chunk (exchanged first/last text
    token) plus one MEDIA row per media span (in-chunk-resolved context,
    unresolved edges flagged for the combine)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    n_spans = np.diff(spans.offsets.to_numpy(zero_copy_only=False)).astype(
        np.int64
    )
    n_rows = len(batch)
    row_of_span = np.repeat(np.arange(n_rows, dtype=np.int64), n_spans)
    is_media = np.asarray(
        pa.compute.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
    )
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    toks = np.asarray(flat.field("text").to_pylist(), dtype=object)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_spans, out=starts[1:])
    chunk_key_row = np.where(n_spans > 0, off[starts[:-1]], 0)

    tg = np.flatnonzero(~is_media)  # global text-span positions, ordered
    mg = np.flatnonzero(is_media)
    n_text = np.bincount(row_of_span[tg], minlength=n_rows).astype(np.int64)
    t_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_text, out=t_starts[1:])
    has_text = n_text > 0
    first_tok = np.full(n_rows, None, dtype=object)
    last_tok = np.full(n_rows, None, dtype=object)
    ht = np.flatnonzero(has_text)
    first_tok[ht] = toks[tg][t_starts[ht]]
    last_tok[ht] = toks[tg][t_starts[ht + 1] - 1]

    # in-chunk resolution: nearest text span before/after each media span
    # within the SAME chunk row
    ins = np.searchsorted(tg, mg)
    m_row = row_of_span[mg]
    p_idx = ins - 1
    prev_ok = (p_idx >= 0) & (
        row_of_span[tg[np.clip(p_idx, 0, None)]] == m_row
    )
    n_idx = np.clip(ins, None, max(len(tg) - 1, 0))
    next_ok = (
        (ins < len(tg)) & (row_of_span[tg[n_idx]] == m_row)
        if len(tg)
        else np.zeros(len(mg), dtype=bool)
    )
    prev_tok = np.full(len(mg), None, dtype=object)
    next_tok = np.full(len(mg), None, dtype=object)
    prev_tok[prev_ok] = toks[tg[p_idx[prev_ok]]]
    next_tok[next_ok] = toks[tg[n_idx[next_ok]]]

    k = np.flatnonzero(n_spans > 0)
    none_k = np.full(len(k), None, dtype=object)
    chunk_rows = {
        "doc_id": doc_ids[k].astype(np.int64),
        "chunk_key": chunk_key_row[k],
        "is_chunk": np.ones(len(k), dtype=bool),
        "has_text": has_text[k],
        "first_tok": first_tok[k],
        "last_tok": last_tok[k],
        "media_ref": none_k,
        "media_off": np.zeros(len(k), dtype=np.int64),
        "prev_tok": none_k,
        "next_tok": none_k,
        "prev_ok": np.zeros(len(k), dtype=bool),
        "next_ok": np.zeros(len(k), dtype=bool),
    }
    none_m = np.full(len(mg), None, dtype=object)
    media_rows = {
        "doc_id": doc_ids[m_row].astype(np.int64),
        "chunk_key": chunk_key_row[m_row],
        "is_chunk": np.zeros(len(mg), dtype=bool),
        "has_text": np.zeros(len(mg), dtype=bool),
        "first_tok": none_m,
        "last_tok": none_m,
        "media_ref": np.asarray(
            flat.field("media_ref").to_pylist(), dtype=object
        )[mg],
        "media_off": off[mg].astype(np.int64),
        "prev_tok": prev_tok,
        "next_tok": next_tok,
        "prev_ok": prev_ok,
        "next_ok": next_ok,
    }
    return pa.table(
        {
            c: pa.array(
                np.concatenate([chunk_rows[c], media_rows[c]]),
                type=(
                    pa.string()
                    if c in ("first_tok", "last_tok", "media_ref",
                             "prev_tok", "next_tok")
                    else None
                ),
            )
            for c in _CTX_COLS
        }
    )


def _context_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    ch = df[df["is_chunk"]].sort_values(["doc_id", "chunk_key"])
    me = df[~df["is_chunk"]].sort_values(
        ["doc_id", "chunk_key", "media_off"]
    )
    cols = ["doc_id", "media_ref", "media_off", "prev_tok", "next_tok"]
    if not len(me):
        # typed empty: default float64/object columns would disagree with
        # the int64/string blocks from non-empty groups
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "media_ref": pd.Series([], dtype=object),
                "media_off": pd.Series([], dtype=np.int64),
                "prev_tok": pd.Series([], dtype=object),
                "next_tok": pd.Series([], dtype=object),
            }
        )[cols]
    doc = ch["doc_id"].to_numpy().astype(np.int64)
    n = len(ch)
    idx = np.arange(n, dtype=np.int64)
    has = ch["has_text"].to_numpy().astype(bool)
    # segmented ffill/bfill over the chunk sequence: nearest EARLIER chunk
    # with text (excluding self), nearest LATER chunk with text
    run_f = np.maximum.accumulate(np.where(has, idx, -1))
    prev_idx = np.concatenate([[-1], run_f[:-1]])
    ok_p = (prev_idx >= 0) & (doc[np.clip(prev_idx, 0, None)] == doc)
    run_b = np.minimum.accumulate(np.where(has, idx, n)[::-1])[::-1]
    next_idx = np.concatenate([run_b[1:], [n]])
    ok_n = (next_idx < n) & (doc[np.clip(next_idx, None, n - 1)] == doc)
    last_tok = ch["last_tok"].to_numpy()
    first_tok = ch["first_tok"].to_numpy()
    prev_fill = np.where(ok_p, last_tok[np.clip(prev_idx, 0, None)], "")
    next_fill = np.where(
        ok_n, first_tok[np.clip(next_idx, None, n - 1)], ""
    )
    key_ch = doc * (1 << 32) + ch["chunk_key"].to_numpy()
    key_me = (
        me["doc_id"].to_numpy().astype(np.int64) * (1 << 32)
        + me["chunk_key"].to_numpy()
    )
    pos = np.searchsorted(key_ch, key_me)
    prev = np.asarray(me["prev_tok"].to_numpy(), dtype=object)
    nxt = np.asarray(me["next_tok"].to_numpy(), dtype=object)
    pok = me["prev_ok"].to_numpy().astype(bool)
    nok = me["next_ok"].to_numpy().astype(bool)
    prev[~pok] = prev_fill[pos[~pok]]
    nxt[~nok] = next_fill[pos[~nok]]
    return pd.DataFrame(
        {
            "doc_id": me["doc_id"].to_numpy(),
            "media_ref": me["media_ref"].to_numpy(),
            "media_off": me["media_off"].to_numpy(),
            "prev_tok": prev,
            "next_tok": nxt,
        }
    )


@query("media_context_spans", _MEDIA_CONTEXT_SQL)
def q_media_context_spans(sf_dir: str):
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_context_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _context_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# Section (text-run) statistics FROM the nested spans layout: a "section"
# is a maximal run of consecutive TEXT spans in offset order, delimited by
# media spans — the unit a Readability-style extractor scores (the
# reference's main-content strip rates contiguous text blocks between
# figures; fake_scan.py interleaves a media ref every MEDIA_EVERY tokens).
# Per document: number of sections, longest section (in text spans), and
# the length of the trailing section (0 when the doc ends with media).
#
# Chunk-exactness needs a RUN-MERGE exchange, strictly stronger than the
# first/last-kind exchange of media_layout_spans: a section can straddle
# MANY chunk rows (every interior chunk being all-text), so each chunk
# emits (prefix_run, suffix_run, all_text, closed-run count/max) and the
# combine stitches runs through arbitrarily long all-text chunk chains —
# a segmented scan, fully vectorized via cumsums over the sorted chunk
# sequence (no per-doc Python loop).
# ---------------------------------------------------------------------------
_SECTION_STATS_SQL = f"""
{SQL_ALL_SPANS},
sec AS (
  SELECT doc_id, kind, off,
         count(*) FILTER (WHERE kind = 'media')
             OVER (PARTITION BY doc_id ORDER BY off
                   ROWS UNBOUNDED PRECEDING) AS sec_id
  FROM all_spans
),
runs AS (
  SELECT doc_id, sec_id, count(*) AS run_len
  FROM sec WHERE kind = 'text' GROUP BY doc_id, sec_id
),
ends AS (
  SELECT doc_id, max_by(kind, off) AS last_kind
  FROM all_spans GROUP BY doc_id
),
agg AS (
  SELECT doc_id, count(*) AS n_sections, max(run_len) AS max_section,
         max_by(run_len, sec_id) AS last_run
  FROM runs GROUP BY doc_id
)
SELECT a.doc_id,
       CAST(a.n_sections AS BIGINT) AS n_sections,
       CAST(a.max_section AS BIGINT) AS max_section,
       CAST(CASE WHEN e.last_kind = 'text' THEN a.last_run ELSE 0 END
            AS BIGINT) AS last_section
FROM agg a JOIN ends e USING (doc_id)
"""


def _section_chunk_partial(batch: pa.Table) -> pa.Table:
    """Per-chunk-row text-run partial: prefix/suffix run lengths, whether
    the whole chunk is one text run, and count/max of runs CLOSED strictly
    inside the chunk (touching neither chunk edge)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    n_spans = np.diff(spans.offsets.to_numpy(zero_copy_only=False)).astype(
        np.int64
    )
    n_rows = len(batch)
    row_of_span = np.repeat(np.arange(n_rows, dtype=np.int64), n_spans)
    is_text = np.asarray(
        pa.compute.equal(flat.field("kind"), "text").to_numpy(
            zero_copy_only=False
        )
    )
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_spans, out=starts[1:])
    # run-length encode (kind, row): a run breaks on kind change OR row
    # change (span lists are offset-ordered by construction)
    m = len(is_text)
    if m:
        chg = (is_text[1:] != is_text[:-1]) | (
            row_of_span[1:] != row_of_span[:-1]
        )
        run_start = np.concatenate(
            [[0], np.flatnonzero(chg) + 1]
        ).astype(np.int64)
    else:
        run_start = np.zeros(0, dtype=np.int64)
    run_end = np.concatenate([run_start[1:], [m]]).astype(np.int64)
    run_len = run_end - run_start
    run_row = row_of_span[run_start] if m else np.zeros(0, dtype=np.int64)
    run_text = is_text[run_start] if m else np.zeros(0, dtype=bool)
    touch_start = run_start == starts[:-1][run_row]
    touch_end = run_end == starts[1:][run_row]
    prefix = np.zeros(n_rows, dtype=np.int64)
    sel = run_text & touch_start
    prefix[run_row[sel]] = run_len[sel]
    suffix = np.zeros(n_rows, dtype=np.int64)
    sel = run_text & touch_end
    suffix[run_row[sel]] = run_len[sel]
    closed = run_text & ~touch_start & ~touch_end
    n_closed = np.bincount(run_row[closed], minlength=n_rows).astype(
        np.int64
    )
    max_closed = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(max_closed, run_row[closed], run_len[closed])
    all_text = prefix == n_spans  # single text run spanning the whole chunk
    keep = n_spans > 0
    k = np.flatnonzero(keep)
    return pa.table(
        {
            "doc_id": pa.array(
                batch["doc_id"].to_numpy(zero_copy_only=False)[k],
                type=pa.int64(),
            ),
            "chunk_key": pa.array(off[starts[:-1]][k], type=pa.int64()),
            "n_spans": pa.array(n_spans[k], type=pa.int64()),
            "all_text": pa.array(all_text[k], type=pa.bool_()),
            "prefix_run": pa.array(prefix[k], type=pa.int64()),
            "suffix_run": pa.array(suffix[k], type=pa.int64()),
            "n_closed": pa.array(n_closed[k], type=pa.int64()),
            "max_closed": pa.array(max_closed[k], type=pa.int64()),
        }
    )


def _section_combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized multi-doc run-merge: anchors are non-all-text chunks;
    all-text chunks between anchors extend the open run via a cumsum of
    their span counts (so one section can flow through any number of
    chunks). No per-doc Python loop."""
    df = df.sort_values(["doc_id", "chunk_key"])
    doc = df["doc_id"].to_numpy()
    n = len(doc)
    change = np.concatenate([[True], doc[1:] != doc[:-1]])
    dstarts = np.flatnonzero(change)
    dends = np.concatenate([dstarts[1:], [n]]) - 1
    d_of_row = np.cumsum(change) - 1
    ndocs = len(dstarts)
    at = df["all_text"].to_numpy()
    ns = df["n_spans"].to_numpy().astype(np.int64)
    pre = df["prefix_run"].to_numpy().astype(np.int64)
    suf = df["suffix_run"].to_numpy().astype(np.int64)
    ncl = df["n_closed"].to_numpy().astype(np.int64)
    mxc = df["max_closed"].to_numpy().astype(np.int64)
    # cumulative all-text span mass; anchors contribute 0, so the mass of
    # the all-text chain strictly between two rows i<j is cat[j]-cat[i]
    cat = np.cumsum(np.where(at, ns, 0)).astype(np.int64)
    catm1 = np.concatenate([[0], cat[:-1]])
    n_sec = np.zeros(ndocs, dtype=np.int64)
    mx = np.zeros(ndocs, dtype=np.int64)
    a_idx = np.flatnonzero(~at)
    if len(a_idx):
        a_doc = d_of_row[a_idx]
        a_first = np.concatenate([[True], a_doc[1:] != a_doc[:-1]])
        prev_idx = np.empty(len(a_idx), dtype=np.int64)
        prev_idx[1:] = a_idx[:-1]
        prev_idx[0] = 0
        prev_suf = np.where(a_first, 0, suf[prev_idx])
        prev_cat = np.where(
            a_first, catm1[dstarts[a_doc]], cat[prev_idx]
        )
        first_run = prev_suf + (cat[a_idx] - prev_cat) + pre[a_idx]
        np.add.at(n_sec, a_doc, (first_run > 0).astype(np.int64) + ncl[a_idx])
        np.maximum.at(mx, a_doc, np.maximum(first_run, mxc[a_idx]))
    # trailing carry per doc: last anchor's suffix plus the all-text tail
    last_anchor = np.full(ndocs, -1, dtype=np.int64)
    if len(a_idx):
        last_anchor[d_of_row[a_idx]] = a_idx  # ordered -> last write wins
    has_anchor = last_anchor >= 0
    carry = np.where(
        has_anchor,
        suf[np.maximum(last_anchor, 0)]
        + cat[dends] - cat[np.maximum(last_anchor, 0)],
        cat[dends] - catm1[dstarts],
    )
    n_sec += (carry > 0).astype(np.int64)
    np.maximum.at(mx, np.arange(ndocs), carry)
    out = pd.DataFrame(
        {
            "doc_id": doc[dstarts].astype(np.int64),
            "n_sections": n_sec,
            "max_section": mx,
            "last_section": carry.astype(np.int64),
        }
    )
    # the oracle emits only docs with >=1 nonempty text run
    return out[out["n_sections"] > 0].reset_index(drop=True)


@query("section_stats_spans", _SECTION_STATS_SQL)
def q_section_stats_spans(sf_dir: str):
    return (
        _capped_spans(sf_dir)
        .map_batches(
            lambda t: _with_bucket(_section_chunk_partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(_reduce_blocks())
        .groupby("bucket")
        .map_groups(
            lambda g: _section_combine_bucket(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )
