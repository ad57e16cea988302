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
