"""Arrow schemas for the engine's tables (FIXTURES.md F1-F5).

The primary data model comes from BASELINE.json ``input_hint``: a table of
interleaved text + media documents,

    (doc_id, spans: list<struct<kind, text, media_ref, offset:int32>>)

mirroring the reference's ordered block sequences (consolidated per-page block
lists, reference ``python_files/textract_agent.py:153-179``) where text-bearing
blocks (WORD/LINE) interleave with media regions (page rasters / table crops,
``table_detector_agent.py:183-191``).

All stage boundaries are validated against these fixed schemas — the engine's
answer to the reference's two "schema islands" (the strict GPT JSON schema
``table_detector_agent.py:83-114`` and the marshmallow TDocument round-trip
``textract_agent.py:107-110``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# F1: spans table — one row per document, interleaved ordered span sequence.
# ---------------------------------------------------------------------------
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "media"
        ("text", pa.string()),       # non-null iff kind == "text"
        ("media_ref", pa.string()),  # non-null iff kind == "media" (key into MEDIA)
        ("offset", pa.int32()),      # 0-based, dense, strictly increasing per doc
    ]
)

SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("category", pa.string()),   # "tables" | "diagrams" | "other" (routing label)
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Exploded (flat) span view — one row per span. Output schema of the flagship
# extraction pipeline; ``ord`` is the re-densified order after removals
# (per-row invariant: span-sequence equality on (kind, text, media_ref, ord)).
FLAT_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("ord", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# F2: media side table. Payload bytes never travel through shuffles; spans
# carry only ``media_ref`` (SURVEY.md §7.3 "wide records").
# ---------------------------------------------------------------------------
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("bytes", pa.binary()),      # raw 8-bit grayscale pixels, row-major
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("pattern", pa.string()),    # "grid" | "blob" | "blank" (ground truth)
    ]
)

# ---------------------------------------------------------------------------
# F3: exploded word-region view (strikethrough evaluation unit,
# reference ``strikethrough_agent.py:9-142``).
# ---------------------------------------------------------------------------
BBOX_STRUCT = pa.struct(
    [
        ("left", pa.float64()),
        ("top", pa.float64()),
        ("width", pa.float64()),
        ("height", pa.float64()),
    ]
)

WORD_REGION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("block_id", pa.string()),
        ("page", pa.int32()),        # 1-based (reference convention)
        ("offset", pa.int32()),
        ("text", pa.string()),
        ("bbox", BBOX_STRUCT),
        ("orientation", pa.float32()),  # degrees; |o| > 45 => vertical text
        ("confidence", pa.float32()),
        ("struck", pa.bool_()),      # synthetic ground truth
    ]
)

# ---------------------------------------------------------------------------
# F4: Textract-style block graph (relationship-repair tests,
# reference ``strikethrough_agent.py:145-210``).
# ---------------------------------------------------------------------------
BLOCK_TYPES = [
    "PAGE", "LINE", "WORD", "TABLE", "CELL", "MERGED_CELL", "TABLE_TITLE",
    "TABLE_FOOTER", "LAYOUT_TEXT", "LAYOUT_TABLE", "LAYOUT_LIST",
    "LAYOUT_FOOTER",
]

BLOCKS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("block_id", pa.string()),
        ("block_type", pa.string()),
        ("page", pa.int32()),
        ("text", pa.string()),
        ("bbox", BBOX_STRUCT),
        ("child_ids", pa.list_(pa.string())),
        ("row_index", pa.int32()),
        ("col_index", pa.int32()),
        ("row_span", pa.int32()),
        ("col_span", pa.int32()),
        ("entity_types", pa.list_(pa.string())),
    ]
)

# ---------------------------------------------------------------------------
# F5: page-label / routing table (reference ``table_detector_agent.py:126-137``
# verdicts after "True"/"False" -> bool coercion, route precedence
# ``textract_agent.py:215-222``).
# ---------------------------------------------------------------------------
PAGE_LABELS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("page", pa.int32()),
        ("table", pa.bool_()),
        ("table_certainty", pa.string()),
        ("diagram", pa.bool_()),
        ("diagram_certainty", pa.string()),
        ("route", pa.string()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, stage: str) -> pa.Table:
    """Stage-boundary schema check (cast-or-raise), the engine's analog of the
    reference's strict structured-output schema enforcement."""
    try:
        return table.cast(schema)
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError) as exc:
        raise ValueError(f"stage {stage!r}: schema mismatch: {exc}") from exc
