"""Extraction pipeline unit + end-to-end tests.

The per-row invariant (BASELINE.json input_hint): span-sequence equality
(kind, text, media_ref, order) vs the single-process oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_machine_ray import corpus
from ocr_machine_ray.stages.explode import (
    explode_spans,
    filter_spans_nested,
    redensify_nested,
)
from ocr_machine_ray.stages.strike import (
    keep_mask_rule,
    rule_verdict_flat,
    token_index_from_offset,
)


def _docs_table(n=50) -> pa.Table:
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    return t.slice(0, n)


def oracle_extract(doc_id: int, text: str) -> list[tuple]:
    """Single-process reference-semantics oracle: pure-Python, row-at-a-time
    re-implementation of derivation + strike + reassembly (SURVEY.md §5)."""
    import re

    toks = re.split(r"\s+", text.strip())
    seq = []  # (kind, text, media_ref, offset)
    for i, tok in enumerate(toks, start=1):
        off = (i - 1) + (i - 1) // corpus.MEDIA_EVERY
        struck = (
            doc_id * corpus.STRIKE_A + i * corpus.STRIKE_B
        ) % corpus.STRIKE_MOD == 0
        if not struck:
            seq.append(("text", tok, None, off))
        if i % corpus.MEDIA_EVERY == 0:
            j = i // corpus.MEDIA_EVERY
            seq.append(
                ("media", None, f"m-{doc_id}-{j}",
                 (corpus.MEDIA_EVERY + 1) * j - 1)
            )
    seq.sort(key=lambda s: s[3])
    return [(k, t, m, order) for order, (k, t, m, _) in enumerate(seq)]


class TestDerivation:
    def test_offsets_dense_and_increasing(self):
        out = corpus.derive_spans_batch(_docs_table())
        for row in out.to_pylist():
            offs = [s["offset"] for s in row["spans"]]
            assert offs == list(range(len(offs)))

    def test_kind_field_consistency(self):
        out = corpus.derive_spans_batch(_docs_table())
        for row in out.to_pylist():
            for s in row["spans"]:
                if s["kind"] == "text":
                    assert s["text"] is not None and s["media_ref"] is None
                else:
                    assert s["text"] is None and s["media_ref"] is not None

    def test_token_index_roundtrip(self):
        i = np.arange(1, 10_000, dtype=np.int64)
        off = (i - 1) + (i - 1) // corpus.MEDIA_EVERY
        assert (token_index_from_offset(off) == i).all()


class TestLocalKernels:
    def test_filter_and_redensify_matches_oracle(self):
        docs = _docs_table()
        nested = corpus.derive_spans_batch(docs)
        kept = redensify_nested(filter_spans_nested(nested, keep_mask_rule))
        result = {
            row["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in row["spans"]
            ]
            for row in kept.to_pylist()
        }
        for doc_id, text in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        ):
            assert result[doc_id] == oracle_extract(doc_id, text), doc_id

    def test_explode_roundtrip_counts(self):
        nested = corpus.derive_spans_batch(_docs_table())
        flat = explode_spans(nested)
        n_spans = sum(len(r["spans"]) for r in nested.to_pylist())
        assert len(flat) == n_spans

    def test_rule_verdict_media_never_struck(self):
        flat = explode_spans(corpus.derive_spans_batch(_docs_table()))
        v = rule_verdict_flat(flat)
        media = v.filter(pa.compute.equal(v["kind"], "media"))
        assert not pa.compute.any(media["struck"]).as_py()


class TestEndToEnd:
    def test_flagship_matches_oracle(self, ray_session, sf_small):
        from ocr_machine_ray.pipelines.extraction import extract

        out = extract(sf_small).to_pandas()
        docs = pq.read_table(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        expected_rows = []
        for doc_id, text in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        ):
            for k, t, m, o in oracle_extract(doc_id, text):
                expected_rows.append((doc_id, k, t, m, o))
        exp = pd.DataFrame(
            expected_rows, columns=["doc_id", "kind", "text", "media_ref", "ord"]
        )
        got = out.sort_values(["doc_id", "ord"]).reset_index(drop=True)
        exp = exp.sort_values(["doc_id", "ord"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_shuffled_variant_equals_local(self, ray_session, sf_small):
        from ocr_machine_ray.pipelines.extraction import (
            extract,
            extract_flat_shuffled,
        )

        a = (
            extract(sf_small)
            .to_pandas()
            .sort_values(["doc_id", "ord"])
            .reset_index(drop=True)
        )
        b = (
            extract_flat_shuffled(sf_small)
            .to_pandas()
            .sort_values(["doc_id", "ord"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


class TestSchema:
    def test_spans_schema_validates(self):
        from ocr_machine_ray import schema

        nested = corpus.derive_spans_batch(_docs_table())
        schema.validate(nested, schema.SPANS_SCHEMA, "derive")

    def test_validate_raises_on_mismatch(self):
        from ocr_machine_ray import schema

        bad = pa.table({"doc_id": pa.array(["x"]), "spans": pa.array([1])})
        with pytest.raises(ValueError):
            schema.validate(bad, schema.SPANS_SCHEMA, "derive")
