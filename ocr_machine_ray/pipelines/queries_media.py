"""Driver-checked queries: media pipeline (image synthesis -> actor-pool
classification / CV strikethrough). The oracles are closed-loop: images are
drawn FROM the corpus rules, the image stages must recover those labels from
pixels alone, and the SQL recomputes the labels arithmetically.
"""

from __future__ import annotations


import pyarrow.compute as pc

from ..corpus import SQL_ALL_SPANS, SQL_CATEGORY
from ..registry import query
from ..stages.explode import explode_spans
from ..stages.media import (
    PageClassifier,
    StrikeCV,
    render_word_regions_batch,
    synth_media_batch,
)
from .extraction import spans_corpus


def _media_rows(sf_dir: str):
    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    media = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")),
        batch_format="pyarrow", batch_size=None,
    )
    return media.map_batches(
        synth_media_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# Image classification round-trip: classifier(image) must equal the
# category-derived pattern for every media span.
# ---------------------------------------------------------------------------
_MEDIA_CLASSIFY_SQL = f"""
{SQL_ALL_SPANS}, {SQL_CATEGORY}
SELECT s.doc_id, s.media_ref,
       (c.category = 'tables') AS is_table,
       (c.category = 'diagrams') AS is_diagram
FROM all_spans s JOIN doc_category c ON c.doc_id = s.doc_id
WHERE s.kind = 'media'
"""


@query("media_classify", _MEDIA_CLASSIFY_SQL)
def q_media_classify(sf_dir: str):
    """Synthesize every media payload, classify with the actor pool, emit
    per-media verdicts. Value-equality vs the SQL category proves the
    pixels -> verdict loop end-to-end."""
    return _media_rows(sf_dir).map_batches(
        PageClassifier,
        batch_format="pyarrow",
        batch_size=512,  # actor-pool boundary: input rows are media spans
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# CV strikethrough round-trip: kernel(image) must equal the strike rule.
# ---------------------------------------------------------------------------
_STRIKE_CV_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, CAST(off AS INT) AS "offset", struck AS struck_cv
FROM all_spans WHERE kind = 'text'
"""


@query("strike_cv_verdicts", _STRIKE_CV_SQL)
def q_strike_cv(sf_dir: str):
    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    words = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "text")),
        batch_format="pyarrow",
    )
    regions = words.map_batches(
        render_word_regions_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return regions.map_batches(
        StrikeCV,
        batch_format="pyarrow",
        batch_size=1024,  # actor-pool boundary: input rows here ARE words
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Model-based strikethrough scoring (M11/M12): actor pool holding the
# checkpoint, batched normalized inference. Rows-only check (a learned-model
# stand-in is not bit-exact by contract); agreement with the CV kernel and
# the rule is asserted in pytest (>=95%).
# ---------------------------------------------------------------------------
@query("strike_model_verdicts")
def q_strike_model(sf_dir: str):
    from ..stages.scorer import ModelScorer

    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    words = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "text")),
        batch_format="pyarrow",
    )
    regions = words.map_batches(
        render_word_regions_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return regions.map_batches(
        ModelScorer,
        batch_format="pyarrow",
        batch_size=512,  # actor-pool boundary: input rows here ARE words
        concurrency=(1, 4),
    )
