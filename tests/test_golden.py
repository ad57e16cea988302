"""Golden span-sequence fixture: guards the derivation + strike + reassembly
rules against accidental drift (the rules are mirrored in SQL oracles AND
the image renderers — changing them silently would desynchronize all
three; this fixture fails loudly instead)."""

from __future__ import annotations

import json
import pathlib

import pyarrow.parquet as pq

from ocr_machine_ray import corpus
from ocr_machine_ray.stages.explode import filter_spans_nested, redensify_nested
from ocr_machine_ray.stages.strike import keep_mask_rule

GOLDEN = pathlib.Path(__file__).parent / "golden" / "extract_sf0001_head.json"


def test_extraction_matches_golden():
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 5)
    kept = redensify_nested(
        filter_spans_nested(corpus.derive_spans_batch(t), keep_mask_rule)
    )
    got = {
        str(r["doc_id"]): [
            [s["kind"], s["text"], s["media_ref"], s["offset"]]
            for s in r["spans"]
        ]
        for r in kept.to_pylist()
    }
    golden = json.loads(GOLDEN.read_text())
    assert got == golden
