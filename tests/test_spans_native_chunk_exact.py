"""Chunk-exactness of the spans-native MinHash / quality queries.

The claim under test: for ANY span cap (including pathological caps that
slice documents into 1-2-token chunks, where a 3-shingle can straddle three
chunks), the boundary-token exchange reconstructs EXACTLY the shingle /
adjacency universe of the unchunked document — per-seed minima, band keys,
and repeat counters are byte-identical to the flat path's.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_machine_ray.corpus import derive_spans_batch
from ocr_machine_ray.functions.dedup import minhash_bands_batch
from ocr_machine_ray.functions.text import quality_stats_batch
from ocr_machine_ray.pipelines.queries_spans_native import (
    _mh_chunk_partial,
    _mh_combine_doc,
    _quality_chunk_partial,
    _quality_combine_doc,
)
from ocr_machine_ray.stages.skew import cap_spans_per_row

# token streams chosen to hit every boundary case: repeats at chunk edges,
# docs below the 3-token shingle fallback, stopwords, single-char tokens,
# and streams long enough to cross the media-span interleave (every 10th)
# 40 tokens, mean len 4.8, 2 stopwords, 2 short tokens, mode count 2 —
# passes every Gopher curation gate (boundary-exact on the mean-length
# upper bound: 10*192 == 48*40)
_PASSING = ("the the " + " ".join(
    f"tok{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(34)
) + " wrda wrdb wrdc wrdd")

_DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the lazy dog again and again",
            "a a a a a a a a a a a a a a",  # all-repeat, media span mid-run
            "one two",  # below SHINGLE_N: whole-text fallback shingle
            "solo",  # single token
            "x y z",  # exactly SHINGLE_N
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon",
            "edge edge mid mid mid edge edge",  # repeats at cap boundaries
            "the a the a the a the a the a the",  # stopwords everywhere
            _PASSING,  # survives the curation gate
            _PASSING,  # exact duplicate: exercises the sig keeper
        ],
    }
)


def _spans_table() -> pa.Table:
    return derive_spans_batch(pa.Table.from_pandas(_DOCS))


def _combine(partial: pa.Table, combiner) -> pd.DataFrame:
    df = partial.to_pandas()
    out = pd.concat(
        [combiner(g) for _, g in df.groupby("doc_id", sort=True)],
        ignore_index=True,
    )
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 7, 1000])
def test_minhash_bands_chunk_exact(cap):
    capped = cap_spans_per_row(_spans_table(), cap)
    got = _combine(_mh_chunk_partial(capped), _mh_combine_doc)
    want = (
        minhash_bands_batch(pa.Table.from_pandas(_DOCS))
        .to_pandas()
        .sort_values(["doc_id", "band", "band_key"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["doc_id", "band", "band_key"]).reset_index(
            drop=True
        ),
        want,
        check_dtype=False,
    )


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 7, 1000])
def test_quality_stats_chunk_exact(cap):
    capped = cap_spans_per_row(_spans_table(), cap)
    got = _combine(_quality_chunk_partial(capped), _quality_combine_doc)
    want = (
        quality_stats_batch(pa.Table.from_pandas(_DOCS))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True)[want.columns],
        want,
        check_dtype=False,
    )


def test_partial_batch_splits_do_not_matter():
    """Partials computed from ONE batch of all chunk rows equal partials
    from per-row batches (the map_batches boundary is invisible)."""
    capped = cap_spans_per_row(_spans_table(), 3)
    whole = _mh_chunk_partial(capped).to_pandas()
    pieces = pd.concat(
        [
            _mh_chunk_partial(capped.slice(i, 1)).to_pandas()
            for i in range(capped.num_rows)
        ],
        ignore_index=True,
    )
    key = ["doc_id", "chunk_off"]
    pd.testing.assert_frame_equal(
        whole.sort_values(key).reset_index(drop=True),
        pieces.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_window_partition_invariant(cap):
    """Internal windows + boundary-straddling windows partition the doc's
    full 3-gram window set exactly (no loss, no double count) — the
    invariant decontaminate_spans' occurrence accounting rests on."""
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _boundary_cols,
        _chunk_text_tokens,
        _doc_boundary_state,
        _internal_grams,
        _straddle_shingles,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = _chunk_text_tokens(
        capped
    )
    grams, gram_rows = _internal_grams(toks, n_toks)
    k = np.flatnonzero(keep)
    bcols = _boundary_cols(toks, row_starts)
    df = pd.DataFrame(
        {
            "doc_id": doc_ids[k],
            "chunk_off": chunk_off[k],
            "n_toks": n_toks[k],
            "btoks": [bcols[r] for r in k],
        }
    )
    internal_by_doc: dict[int, list] = {}
    for g, r in zip(grams, gram_rows):
        internal_by_doc.setdefault(int(doc_ids[r]), []).append(g)

    from ocr_machine_ray.corpus import FlatTokens

    ft = FlatTokens(pa.Table.from_pandas(_DOCS))
    all_toks = np.asarray(ft.tokens_arrow.to_pylist(), dtype=object)
    for doc_id, g in df.groupby("doc_id", sort=True):
        g = g.sort_values("chunk_off")
        n, base, gpos = _doc_boundary_state(g)
        straddle = _straddle_shingles(n, base, gpos) if n >= 3 else []
        got = sorted(internal_by_doc.get(int(doc_id), []) + straddle)
        dtoks = all_toks[ft.doc_ids == doc_id]
        want = sorted(
            f"{dtoks[j]} {dtoks[j + 1]} {dtoks[j + 2]}"
            for j in range(len(dtoks) - 2)
        )
        assert got == want, (doc_id, cap)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_bucket_straddles_partition_invariant(cap):
    """The PRODUCTION bucket combiner's straddle path (_BucketLayout
    .straddles) also partitions the window set exactly — as a MULTISET,
    not just a set: adjacent boundaries around a 1-token interior chunk
    both generate window start p-1, and additive consumers
    (decon_combine_bucket's np.add.at) would double-count it."""
    from collections import Counter

    from ocr_machine_ray.pipelines.queries_spans_native import (
        _boundary_cols,
        _BucketLayout,
        _chunk_text_tokens,
        _internal_grams,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    doc_ids, chunk_off, toks, row_starts, n_toks, keep, _ = _chunk_text_tokens(
        capped
    )
    grams, gram_rows = _internal_grams(toks, n_toks)
    k = np.flatnonzero(keep)
    bcols = _boundary_cols(toks, row_starts)
    df = pd.DataFrame(
        {
            "doc_id": doc_ids[k],
            "chunk_off": chunk_off[k],
            "n_toks": n_toks[k],
            "btoks": [bcols[r] for r in k],
        }
    )
    lay = _BucketLayout(df)
    sh_doc, sh_str = lay.straddles(lay.gpos())
    straddle_by_doc: dict[int, list] = {}
    for d, s in zip(sh_doc, sh_str):
        straddle_by_doc.setdefault(int(lay.docs[d]), []).append(s)
    internal_by_doc: dict[int, list] = {}
    for g, r in zip(grams, gram_rows):
        internal_by_doc.setdefault(int(doc_ids[r]), []).append(g)

    from ocr_machine_ray.corpus import FlatTokens

    ft = FlatTokens(pa.Table.from_pandas(_DOCS))
    all_toks = np.asarray(ft.tokens_arrow.to_pylist(), dtype=object)
    for doc_id in np.unique(doc_ids):
        doc_id = int(doc_id)
        got = Counter(
            internal_by_doc.get(doc_id, [])
            + straddle_by_doc.get(doc_id, [])
        )
        dtoks = all_toks[ft.doc_ids == doc_id]
        want = Counter(
            f"{dtoks[j]} {dtoks[j + 1]} {dtoks[j + 2]}"
            for j in range(len(dtoks) - 2)
        )
        assert got == want, (doc_id, cap)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 7, 1000])
def test_minhash_bucket_combine_matches_doc_combine(cap):
    """The vectorized multi-doc bucket combiner is byte-identical to the
    per-doc reference combiner (and hence to the flat path)."""
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _mh_combine_bucket,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    part = _mh_chunk_partial(capped).to_pandas()
    got = (
        _mh_combine_bucket(part)
        .sort_values(["doc_id", "band"])
        .reset_index(drop=True)
    )
    want = _combine(_mh_chunk_partial(capped), _mh_combine_doc).sort_values(
        ["doc_id", "band"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_quality_bucket_combine_matches_doc_combine(cap):
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _quality_combine_bucket,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    part = _quality_chunk_partial(capped).to_pandas()
    got = (
        _quality_combine_bucket(part)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _combine(
        _quality_chunk_partial(capped), _quality_combine_doc
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_curation_bucket_combine_matches_doc_combine(cap):
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _curation_chunk_partial,
        _curation_combine_bucket,
        _curation_combine_doc,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    part = _curation_chunk_partial(capped).to_pandas()
    got = (
        _curation_combine_bucket(part)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _combine(_curation_chunk_partial(capped), _curation_combine_doc)
    if len(want):
        want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    if len(got):
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_simhash_spans_matches_flat(cap):
    """Chunk-split distinct-token union reproduces the flat SimHash."""
    from ocr_machine_ray.functions.dedup import simhash_batch
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _simhash_chunk_partial,
        _simhash_combine_bucket,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    got = (
        _simhash_combine_bucket(_simhash_chunk_partial(capped).to_pandas())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        simhash_batch(pa.Table.from_pandas(_DOCS))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def _expected_layout() -> pd.DataFrame:
    """Independent per-doc interleaving stats: python loop over the flat
    offset-ordered span stream (no shared code with the query's partials)."""
    t = _spans_table()
    spans = t["spans"].combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), counts)
    kind = np.asarray(flat.field("kind").to_pylist())
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    rows = []
    for d in np.unique(doc):
        m = doc == d
        k = kind[m][np.argsort(off[m])]
        mo = np.sort(off[m][kind[m] == "media"])
        rows.append(
            {
                "doc_id": int(d),
                "n_media": int((k == "media").sum()),
                "n_text": int((k == "text").sum()),
                "n_transitions": int((k[1:] != k[:-1]).sum()),
                "first_media_off": int(mo[0]) if len(mo) else -1,
            }
        )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_media_layout_spans_chunk_exact(cap):
    """Kind-transition counts survive ANY chunk split via the first/last
    kind exchange; counts and the media-offset min combine trivially."""
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _layout_chunk_partial,
        _layout_combine_bucket,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    got = (
        _layout_combine_bucket(_layout_chunk_partial(capped).to_pandas())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _expected_layout().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def _expected_context() -> pd.DataFrame:
    """Independent media-context truth: python scan over each doc's
    offset-ordered span stream."""
    t = _spans_table()
    spans = t["spans"].combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), counts)
    kind = np.asarray(flat.field("kind").to_pylist())
    text = flat.field("text").to_pylist()
    ref = flat.field("media_ref").to_pylist()
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    rows = []
    for d in np.unique(doc):
        m = np.flatnonzero(doc == d)
        order = m[np.argsort(off[m])]
        seq = [(kind[i], text[i], ref[i], int(off[i])) for i in order]
        for j, (k, _, r, o) in enumerate(seq):
            if k != "media":
                continue
            prev = next(
                (s[1] for s in reversed(seq[:j]) if s[0] == "text"), ""
            )
            nxt = next((s[1] for s in seq[j + 1 :] if s[0] == "text"), "")
            rows.append(
                {
                    "doc_id": int(d),
                    "media_ref": r,
                    "media_off": o,
                    "prev_tok": prev,
                    "next_tok": nxt,
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_media_context_spans_chunk_exact(cap):
    """Media-span caption context survives ANY chunk split — including
    media-only chunks at cap=1 — via the first/last-text-token exchange
    and the segmented cross-chunk fill."""
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _context_chunk_partial,
        _context_combine_bucket,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    got = (
        _context_combine_bucket(_context_chunk_partial(capped).to_pandas())
        .sort_values(["doc_id", "media_off"])
        .reset_index(drop=True)
    )
    want = (
        _expected_context()
        .sort_values(["doc_id", "media_off"])
        .reset_index(drop=True)
    )
    if not len(want):
        assert not len(got)
        return
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def _expected_sections() -> pd.DataFrame:
    """Independent section truth: python scan over each doc's
    offset-ordered kind stream (no shared code with the query)."""
    t = _spans_table()
    spans = t["spans"].combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), counts)
    kind = np.asarray(flat.field("kind").to_pylist())
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    rows = []
    for d in np.unique(doc):
        m = doc == d
        k = kind[m][np.argsort(off[m])]
        runs, cur = [], 0
        for x in k:
            if x == "text":
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        last = cur
        if cur:
            runs.append(cur)
        if not runs:
            continue
        rows.append(
            {
                "doc_id": int(d),
                "n_sections": len(runs),
                "max_section": max(runs),
                "last_section": last,
            }
        )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("cap", [1, 2, 3, 5, 1000])
def test_section_stats_spans_chunk_exact(cap):
    """Section (text-run) stats survive ANY chunk split via the run-merge
    exchange — at cap=1 every section straddles chunk rows and the
    all-text chain stitch is load-bearing."""
    from ocr_machine_ray.pipelines.queries_spans_native import (
        _section_chunk_partial,
        _section_combine_bucket,
    )

    capped = cap_spans_per_row(_spans_table(), cap)
    got = (
        _section_combine_bucket(_section_chunk_partial(capped).to_pandas())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _expected_sections().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
