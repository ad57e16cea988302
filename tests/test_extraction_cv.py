"""End-to-end closure: the image-driven pipeline (CV verdicts from pixels)
must equal the rule-based flagship output exactly."""

from __future__ import annotations

import pandas as pd


def test_cv_pipeline_equals_flagship(ray_session, sf_small):
    from ocr_machine_ray.pipelines.extraction import extract, extract_via_cv

    a = (
        extract(sf_small)
        .to_pandas()
        .sort_values(["doc_id", "ord"])
        .reset_index(drop=True)
    )
    b = (
        extract_via_cv(sf_small)
        .to_pandas()
        .sort_values(["doc_id", "ord"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)
