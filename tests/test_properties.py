"""Property-based tests (hypothesis): derivation/extraction invariants on
arbitrary texts, span-cap roundtrips, HTML stripper robustness."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ocr_machine_ray import corpus
from ocr_machine_ray.functions.html import extract_main_content, render_html
from ocr_machine_ray.stages.explode import filter_spans_nested, redensify_nested
from ocr_machine_ray.stages.skew import cap_spans_per_row
from ocr_machine_ray.stages.strike import keep_mask_rule

WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)
TEXT = st.lists(WORD, min_size=1, max_size=120).map(" ".join)
DOC_ID = st.integers(min_value=0, max_value=10**9)


def _batch(doc_id: int, text: str) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([doc_id], type=pa.int64()),
            "text": pa.array([text], type=pa.string()),
        }
    )


class TestDerivationProperties:
    @settings(max_examples=60, deadline=None)
    @given(DOC_ID, TEXT)
    def test_offsets_dense_and_interleaving_invariant(self, doc_id, text):
        out = corpus.derive_spans_batch(_batch(doc_id, text))
        spans = out.to_pylist()[0]["spans"]
        offs = [s["offset"] for s in spans]
        assert offs == list(range(len(spans)))
        # exactly one media span after every 10 text spans
        n_text = sum(1 for s in spans if s["kind"] == "text")
        n_media = sum(1 for s in spans if s["kind"] == "media")
        assert n_media == n_text // corpus.MEDIA_EVERY

    @settings(max_examples=60, deadline=None)
    @given(DOC_ID, TEXT)
    def test_extraction_preserves_relative_order(self, doc_id, text):
        nested = corpus.derive_spans_batch(_batch(doc_id, text))
        kept = redensify_nested(filter_spans_nested(nested, keep_mask_rule))
        spans = kept.to_pylist()[0]["spans"]
        # surviving text spans appear in original token order
        toks = re.split(r"\s+", text.strip())
        surv = [s["text"] for s in spans if s["kind"] == "text"]
        it = iter(toks)
        for s in surv:
            for t in it:
                if t == s:
                    break
            else:
                raise AssertionError(f"{s} out of order")
        # offsets re-densified
        assert [s["offset"] for s in spans] == list(range(len(spans)))

    @settings(max_examples=40, deadline=None)
    @given(DOC_ID, TEXT, st.integers(min_value=1, max_value=25))
    def test_span_cap_roundtrip(self, doc_id, text, cap):
        nested = corpus.derive_spans_batch(_batch(doc_id, text))
        capped = cap_spans_per_row(nested, cap=cap)
        # chunks cover the original spans exactly, in order
        flat = []
        for row in capped.to_pylist():
            assert len(row["spans"]) <= cap
            flat.extend(row["spans"])
        assert flat == nested.to_pylist()[0]["spans"]


class TestHtmlProperties:
    @settings(max_examples=60, deadline=None)
    @given(DOC_ID, TEXT)
    def test_render_strip_roundtrip(self, doc_id, text):
        expect = re.sub(r"\s+", " ", text.strip())
        got = extract_main_content(render_html(doc_id, text))
        assert got == expect

    @settings(max_examples=60, deadline=None)
    @given(st.text(max_size=400))
    def test_stripper_never_crashes(self, junk):
        # arbitrary junk (broken tags, partial entities) must not raise
        extract_main_content(junk)
        extract_main_content("<div>" + junk)
        extract_main_content(junk + "</p>")


class TestStrikeRuleProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(DOC_ID, min_size=1, max_size=50, unique=True))
    def test_rule_deterministic_and_batch_independent(self, doc_ids):
        i = np.arange(1, 30, dtype=np.int64)
        for d in doc_ids:
            a = corpus.struck_mask(np.full(len(i), d, dtype=np.int64), i)
            b = corpus.struck_mask(np.full(len(i), d, dtype=np.int64), i)
            assert (a == b).all()


class TestCodecProperties:
    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        rgb=st.booleans(),
    )
    def test_pnm_roundtrip_any_image(self, w, h, seed, rgb):
        from ocr_machine_ray.functions.png import pnm_decode, pnm_encode

        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(pnm_decode(pnm_encode(img)), img)

    @settings(max_examples=15, deadline=None)
    @given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
    def test_png_roundtrip_any_grayscale(self, w, h, seed):
        from ocr_machine_ray.functions.png import png_decode, png_encode

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)


class TestChunkPackProperties:
    @settings(max_examples=30, deadline=None)
    @given(
        sizes=st.lists(st.integers(1, 32), min_size=1, max_size=200),
    )
    def test_next_fit_capacity_and_conservation(self, sizes):
        # mirror the pack loop's invariants on arbitrary chunk sizes
        cap = 128
        packs, fill = [], cap + 1
        for n in sizes:
            if fill + n > cap:
                packs.append(0)
                fill = 0
            fill += n
            packs[-1] += n
        assert all(p <= cap for p in packs)
        assert sum(p for p in packs) == sum(sizes)

    @settings(max_examples=20, deadline=None)
    @given(text=st.text(alphabet="ab \t", min_size=0, max_size=200))
    def test_chunks_reconstruct_normalized_text(self, text, ray_session, tmp_path_factory):
        import pyarrow.parquet as pq

        from ocr_machine_ray.pipelines.queries_text import q_chunk_examples

        d = tmp_path_factory.mktemp("chunkprop")
        t = pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": pa.array([text], type=pa.string()),
            }
        )
        pq.write_table(t, str(d / "documents.parquet"))
        out = (
            q_chunk_examples(str(d))
            .to_pandas()
            .sort_values("chunk_id")
        )
        rebuilt = " ".join(out["chunk_text"])
        expected = " ".join(
            re.split(r"\s+", text.strip(" \t\n\r\v\f"), flags=re.ASCII)
        )
        assert rebuilt == expected


class TestNewKernelProperties:
    """Continuation-session kernels: URL canonicalization, 8-gram windows,
    perceptual hashing, PQ codes, Gopher flags — on arbitrary inputs."""

    @settings(max_examples=60, deadline=None)
    @given(st.lists(DOC_ID, min_size=1, max_size=50, unique=True))
    def test_phash_recovers_plant_for_any_doc_ids(self, ids):
        from ocr_machine_ray.functions.images import (
            ahash_stack,
            phash_variant_bits,
            render_thumb_stack,
        )

        arr = np.array(ids, dtype=np.int64)
        assert np.array_equal(
            ahash_stack(render_thumb_stack(arr)), phash_variant_bits(arr)
        )

    @settings(max_examples=60, deadline=None)
    @given(DOC_ID, TEXT)
    def test_windows8_counts(self, doc_id, text):
        from ocr_machine_ray.pipelines.queries_text import (
            _SUBSTR_K,
            _SUBSTR_POS,
            _windows8,
        )

        g, key = _windows8(_batch(doc_id, text))
        n_tok = len(text.split())
        want = max(n_tok - _SUBSTR_K + 1, 0)
        assert len(g) == want
        assert len(key) == want
        if want:
            # packed keys are (doc_id, position) in order
            assert (key // _SUBSTR_POS == doc_id).all()
            assert list(key % _SUBSTR_POS) == list(range(1, want + 1))
            # every window is K space-joined tokens of the source
            toks = text.split()
            for j, gram in enumerate(g.to_pylist()[:5]):
                assert gram == " ".join(toks[j:j + _SUBSTR_K])

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Nd"),
                whitelist_characters="./-",
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_canonicalize_idempotent(self, path):
        from ocr_machine_ray.pipelines.queries_scrub import canonicalize_urls

        raw = pa.array([f"https://Host.Example.com/{path}?q=1#f"])
        once = canonicalize_urls(raw)
        twice = canonicalize_urls(once)
        assert once.to_pylist() == twice.to_pylist()
        c = once.to_pylist()[0]
        assert c == c.lower() and "?" not in c and "#" not in c
        assert not (c.endswith("/") and len(c) > len("https://"))

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=2, max_value=64),
        st.integers(min_value=0, max_value=2**31),
    )
    def test_pq_roundtrip_shapes(self, n, seed):
        from ocr_machine_ray.pipelines.queries_similarity import (
            PQ_SUBSPACES,
            pq_decode,
            pq_encode_batch,
            pq_train_codebooks,
        )

        rng = np.random.default_rng(seed)
        V = rng.standard_normal((n, 64))
        books = pq_train_codebooks(V, n_iter=2)
        packed = pq_encode_batch(V, books)
        assert packed.shape == (n,)
        assert (packed >= 0).all()
        rec = pq_decode(packed, books)
        assert rec.shape == V.shape
        # encoding the reconstruction is a fixed point
        assert np.array_equal(pq_encode_batch(rec, books), packed)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(DOC_ID, TEXT), min_size=1, max_size=8))
    def test_gopher_flags_are_booleans_and_consistent(self, docs):
        from ocr_machine_ray.pipelines.queries_text import gopher_rules_batch

        ids = list({d for d, _ in docs})
        batch = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(
                    [dict(docs)[i] for i in ids], type=pa.string()
                ),
            }
        )
        out = gopher_rules_batch(batch).to_pandas()
        flags = ["len_ok", "mean_len_ok", "stop_ok", "short_ok", "mode_ok"]
        for f in flags + ["passes"]:
            assert set(out[f]) <= {0, 1}
        want = out[flags].min(axis=1)
        assert (out["passes"] == want).all()


# ---------------------------------------------------------------------------
# Codec properties: arbitrary image shapes / sample streams through the
# real JPEG and WAV codecs.
# ---------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=1, max_value=100),
)
def test_jpeg_any_shape_roundtrips(h, w, seed, quality):
    from ocr_machine_ray.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_batch,
    )

    img = np.random.default_rng(seed).integers(
        0, 256, (h, w), dtype=np.uint8
    )
    enc = jpeg_encode(img, quality=quality)
    dec = jpeg_decode(enc)
    assert dec.shape == (h, w)
    assert dec.dtype == np.uint8
    # lossy but sane: random pixels are the adversarial case for a DCT
    # codec (all energy in high frequencies), so only a loose mean-error
    # bound holds; value fidelity is pinned elsewhere on structured pages
    # (tests/test_jpeg.py) where the classifier loop stays oracle-exact
    if quality >= 85:
        err = np.abs(dec.astype(np.int64) - img.astype(np.int64))
        assert err.mean() < 90
    # the batched encoder is byte-identical for any shape
    assert jpeg_encode_batch(img[np.newaxis], quality=quality)[0] == enc


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=3000),
    ch=st.integers(min_value=1, max_value=4),
    sr=st.integers(min_value=1, max_value=192000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_any_stream_roundtrips(n, ch, sr, seed):
    from ocr_machine_ray.functions.wav import wav_decode, wav_encode

    rng = np.random.default_rng(seed)
    shape = (n,) if ch == 1 else (n, ch)
    v = rng.integers(-32768, 32768, shape, dtype=np.int16)
    out, got_sr = wav_decode(wav_encode(v, sr))
    assert got_sr == sr
    assert out.shape == shape
    assert np.array_equal(out, v)


@settings(max_examples=40, deadline=None)
@given(
    text=st.text(max_size=2000),  # arbitrary unicode incl. astral planes
)
def test_cdc_spans_partition_any_unicode(text):
    from ocr_machine_ray.pipelines.queries_dedup import cdc_chunk_spans

    spans = cdc_chunk_spans(text)
    # spans exactly partition the text (character-indexed, so astral
    # codepoints must count as ONE position — the utf-32 view guarantee)
    assert "".join(text[a:b] for a, b in spans) == text
    if text:
        assert spans[0][0] == 0 and spans[-1][1] == len(text)
        assert all(b > a for a, b in spans)
        assert [a for a, _ in spans[1:]] == [b for _, b in spans[:-1]]
    else:
        assert spans == []


class TestBoundaryExchangeProperties:
    """Chunk-exactness of the spans-native boundary-exchange machinery on
    ARBITRARY texts and caps: minhash bands and quality counters from
    capped chunk rows must equal the flat single-pass reference."""

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(TEXT, min_size=1, max_size=5),
        st.integers(min_value=1, max_value=40),
    )
    def test_minhash_bands_chunk_exact_arbitrary(self, texts, cap):
        import pandas as pd

        from ocr_machine_ray.functions.dedup import minhash_bands_batch
        from ocr_machine_ray.pipelines.queries_spans_native import (
            _mh_chunk_partial,
            _mh_combine_bucket,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        capped = cap_spans_per_row(corpus.derive_spans_batch(docs), cap)
        got = (
            _mh_combine_bucket(_mh_chunk_partial(capped).to_pandas())
            .sort_values(["doc_id", "band"])
            .reset_index(drop=True)
        )
        want = (
            minhash_bands_batch(docs)
            .to_pandas()
            .sort_values(["doc_id", "band"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(TEXT, min_size=1, max_size=5),
        st.integers(min_value=1, max_value=40),
    )
    def test_quality_chunk_exact_arbitrary(self, texts, cap):
        import pandas as pd

        from ocr_machine_ray.functions.text import quality_stats_batch
        from ocr_machine_ray.pipelines.queries_spans_native import (
            _quality_chunk_partial,
            _quality_combine_bucket,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        capped = cap_spans_per_row(corpus.derive_spans_batch(docs), cap)
        got = (
            _quality_combine_bucket(_quality_chunk_partial(capped).to_pandas())
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            quality_stats_batch(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )


def _flat_interleave(docs: pa.Table):
    """Independent offset-ordered (kind, text, ref, off) stream per doc."""
    t = corpus.derive_spans_batch(docs)
    spans = t["spans"].combine_chunks()
    flat = spans.flatten()
    counts = np.diff(spans.offsets.to_numpy(zero_copy_only=False))
    doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), counts)
    kind = np.asarray(flat.field("kind").to_pylist())
    text = flat.field("text").to_pylist()
    ref = flat.field("media_ref").to_pylist()
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    out = {}
    for d in np.unique(doc):
        m = np.flatnonzero(doc == d)
        order = m[np.argsort(off[m])]
        out[int(d)] = [
            (kind[i], text[i], ref[i], int(off[i])) for i in order
        ]
    return out, t


class TestInterleaveExchangeProperties:
    """Chunk-exactness of the INTERLEAVING boundary exchanges (kind
    transitions; media prev/next text context) on arbitrary texts/caps."""

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(TEXT, min_size=1, max_size=5),
        st.integers(min_value=1, max_value=40),
    )
    def test_media_layout_chunk_exact_arbitrary(self, texts, cap):
        import pandas as pd

        from ocr_machine_ray.pipelines.queries_spans_native import (
            _layout_chunk_partial,
            _layout_combine_bucket,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        seqs, spans_t = _flat_interleave(docs)
        capped = cap_spans_per_row(spans_t, cap)
        got = (
            _layout_combine_bucket(
                _layout_chunk_partial(capped).to_pandas()
            )
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        rows = []
        for d, seq in sorted(seqs.items()):
            k = [s[0] for s in seq]
            mo = sorted(s[3] for s in seq if s[0] == "media")
            rows.append(
                {
                    "doc_id": d,
                    "n_media": sum(x == "media" for x in k),
                    "n_text": sum(x == "text" for x in k),
                    "n_transitions": sum(
                        a != b for a, b in zip(k, k[1:])
                    ),
                    "first_media_off": mo[0] if mo else -1,
                }
            )
        want = pd.DataFrame(rows)
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(TEXT, min_size=1, max_size=5),
        st.integers(min_value=1, max_value=40),
    )
    def test_media_context_chunk_exact_arbitrary(self, texts, cap):
        import pandas as pd

        from ocr_machine_ray.pipelines.queries_spans_native import (
            _context_chunk_partial,
            _context_combine_bucket,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        seqs, spans_t = _flat_interleave(docs)
        capped = cap_spans_per_row(spans_t, cap)
        got = (
            _context_combine_bucket(
                _context_chunk_partial(capped).to_pandas()
            )
            .sort_values(["doc_id", "media_off"])
            .reset_index(drop=True)
        )
        rows = []
        for d, seq in sorted(seqs.items()):
            for j, (k, _, r, o) in enumerate(seq):
                if k != "media":
                    continue
                prev = next(
                    (s[1] for s in reversed(seq[:j]) if s[0] == "text"),
                    "",
                )
                nxt = next(
                    (s[1] for s in seq[j + 1 :] if s[0] == "text"), ""
                )
                rows.append(
                    {
                        "doc_id": d,
                        "media_ref": r,
                        "media_off": o,
                        "prev_tok": prev,
                        "next_tok": nxt,
                    }
                )
        want = (
            pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "media_off", "prev_tok",
                    "next_tok",
                ],
            )
            .sort_values(["doc_id", "media_off"])
            .reset_index(drop=True)
        )
        if not len(want):
            assert not len(got)
            return
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(TEXT, min_size=1, max_size=5),
        st.integers(min_value=1, max_value=40),
    )
    def test_section_stats_chunk_exact_arbitrary(self, texts, cap):
        import pandas as pd

        from ocr_machine_ray.pipelines.queries_spans_native import (
            _section_chunk_partial,
            _section_combine_bucket,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        seqs, spans_t = _flat_interleave(docs)
        capped = cap_spans_per_row(spans_t, cap)
        got = (
            _section_combine_bucket(
                _section_chunk_partial(capped).to_pandas()
            )
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        rows = []
        for d, seq in sorted(seqs.items()):
            runs, cur = [], 0
            for k, _, _, _ in seq:
                if k == "text":
                    cur += 1
                elif cur:
                    runs.append(cur)
                    cur = 0
            if cur:
                runs.append(cur)
            if not runs:
                continue
            rows.append(
                {
                    "doc_id": d,
                    "n_sections": len(runs),
                    "max_section": max(runs),
                    "last_section": cur,
                }
            )
        want = pd.DataFrame(
            rows,
            columns=["doc_id", "n_sections", "max_section", "last_section"],
        )
        if not len(want):
            assert not len(got)
            return
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )
