"""Textract-style block graph: construction + strikethrough repair (M13).

Rebuilds the reference's block model (PAGE/LINE/WORD/TABLE/CELL with
parent->child id lists, ``full_response_output.json`` shape) from the spans
corpus, then reproduces ``clean_response_with_strikethrough``
(strikethrough_agent.py:145-210): drop struck WORD blocks, scrub their ids
from every surviving ``child_ids`` list, leave all other fields intact.

Deterministic layout per document:
  PAGE (1)            children: all LINE ids + all TABLE ids
  LINE (per 10 words) children: its WORD ids (token idx 10i+1..10i+10)
  WORD (per text span)
  TABLE (per media span) children: its 4 CELL ids
  CELL (4 per table, row/col indexed)
Block ids are "{doc_id}:{TYPE}:{ordinal}" so tests and SQL can recompute
them arithmetically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus import MEDIA_EVERY, FlatTokens, struck_mask


def build_blocks_for_doc(doc_id: int, tokens: list[str]) -> list[dict]:
    """Single-doc block-graph builder (the unit the batch fn vectorizes over;
    also the oracle for tests)."""
    n = len(tokens)
    n_lines = (n + MEDIA_EVERY - 1) // MEDIA_EVERY
    n_tables = n // MEDIA_EVERY
    blocks: list[dict] = []
    line_ids = [f"{doc_id}:LINE:{i}" for i in range(n_lines)]
    table_ids = [f"{doc_id}:TABLE:{j}" for j in range(n_tables)]
    blocks.append(
        {
            "doc_id": doc_id,
            "block_id": f"{doc_id}:PAGE:0",
            "block_type": "PAGE",
            "page": 1,
            "text": None,
            "child_ids": line_ids + table_ids,
            "row_index": None,
            "col_index": None,
        }
    )
    for i in range(n_lines):
        lo, hi = i * MEDIA_EVERY, min((i + 1) * MEDIA_EVERY, n)
        word_ids = [f"{doc_id}:WORD:{k}" for k in range(lo, hi)]
        blocks.append(
            {
                "doc_id": doc_id,
                "block_id": line_ids[i],
                "block_type": "LINE",
                "page": 1,
                "text": " ".join(tokens[lo:hi]),
                "child_ids": word_ids,
                "row_index": None,
                "col_index": None,
            }
        )
    for k, tok in enumerate(tokens):
        blocks.append(
            {
                "doc_id": doc_id,
                "block_id": f"{doc_id}:WORD:{k}",
                "block_type": "WORD",
                "page": 1,
                "text": tok,
                "child_ids": [],
                "row_index": None,
                "col_index": None,
            }
        )
    for j in range(n_tables):
        cell_ids = [f"{doc_id}:CELL:{j}-{c}" for c in range(4)]
        blocks.append(
            {
                "doc_id": doc_id,
                "block_id": table_ids[j],
                "block_type": "TABLE",
                "page": 1,
                "text": None,
                "child_ids": cell_ids,
                "row_index": None,
                "col_index": None,
            }
        )
        for c in range(4):
            blocks.append(
                {
                    "doc_id": doc_id,
                    "block_id": cell_ids[c],
                    "block_type": "CELL",
                    "page": 1,
                    "text": None,
                    "child_ids": [],
                    "row_index": c // 2 + 1,
                    "col_index": c % 2 + 1,
                }
            )
    return blocks


def build_blocks_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> exploded block rows (one row per block).

    NOTE: no function-body imports of ocr_machine_ray here — batch fns run
    on workers where only pickle-by-value ships the code, and a runtime
    import of the package would fail."""
    ft = FlatTokens(batch)
    rows: list[dict] = []
    doc_ids = batch["doc_id"].to_pylist()
    start = 0
    for r, doc_id in enumerate(doc_ids):
        cnt = int(ft.counts[r])
        toks = ft.tokens[start : start + cnt].tolist()
        start += cnt
        rows.extend(build_blocks_for_doc(doc_id, toks))
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("block_id", pa.string()),
                ("block_type", pa.string()),
                ("page", pa.int32()),
                ("text", pa.string()),
                ("child_ids", pa.list_(pa.string())),
                ("row_index", pa.int32()),
                ("col_index", pa.int32()),
            ]
        ),
    )


def struck_word_ids(doc_id: int, n_tokens: int) -> set[str]:
    """WORD block ids removed by the strike rule (word k <-> token i=k+1)."""
    i = np.arange(1, n_tokens + 1, dtype=np.int64)
    mask = struck_mask(np.full(n_tokens, doc_id, dtype=np.int64), i)
    return {f"{doc_id}:WORD:{k}" for k in np.nonzero(mask)[0]}


# ---------------------------------------------------------------------------
# Real Textract-response ingestion + scrub + reassembly (conformance path).
#
# The synthetic block model above pins M13 semantics arithmetically; the
# functions below run the SAME scrub/reassemble semantics over an actual
# reference response dict (full_response_output.json: 474 blocks, 12 block
# types, shared WORD children between LINE and CELL, non-CHILD relationship
# types MERGED_CELL / TABLE_TITLE / TABLE_FOOTER). Semantics reproduced from
# strikethrough_agent.py:145-210 (`clean_response_with_strikethrough`):
# only WORD blocks are removed, only CHILD relationship id-lists are
# filtered, every other field and the Blocks-list order survive intact.
# ---------------------------------------------------------------------------
TEXTRACT_BLOCK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("block_id", pa.string()),
        ("block_type", pa.string()),
        ("page", pa.int32()),
        ("text", pa.string()),
        (
            "rels",
            pa.list_(
                pa.struct(
                    [("rel_type", pa.string()), ("ids", pa.list_(pa.string()))]
                )
            ),
        ),
        ("ord", pa.int64()),  # position in the response's Blocks list
        ("removed", pa.bool_()),  # strikethrough verdict for WORD blocks
    ]
)


def blocks_from_textract(
    response: dict, doc_id: int, removed_ids: set[str] | None = None
) -> pa.Table:
    """Flatten a Textract response dict into one block row per Blocks entry
    (the F3 layout), preserving list order and the full relationship graph.
    `removed_ids` plays the role of the CV strikethrough verdicts — in
    production it comes from the M10/M11 scorer stages."""
    removed_ids = removed_ids or set()
    rows = []
    for i, b in enumerate(response.get("Blocks", [])):
        rows.append(
            {
                "doc_id": doc_id,
                "block_id": b["Id"],
                "block_type": b["BlockType"],
                "page": b.get("Page", 1),
                "text": b.get("Text"),
                "rels": [
                    {"rel_type": r["Type"], "ids": list(r["Ids"])}
                    for r in b.get("Relationships", [])
                ],
                "ord": i,
                "removed": b["Id"] in removed_ids,
            }
        )
    return pa.Table.from_pylist(rows, schema=TEXTRACT_BLOCK_SCHEMA)


def scrub_textract_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-document scrub (groupby(doc_id).map_groups), the distributed
    form of clean_response_with_strikethrough: drop removed WORD rows, strip
    their ids from CHILD relationship lists ONLY (strikethrough_agent.py:
    193-205 filters just Type == "CHILD"; MERGED_CELL / TABLE_TITLE /
    TABLE_FOOTER id-lists pass through untouched)."""
    removed = set(
        g.loc[(g["removed"]) & (g["block_type"] == "WORD"), "block_id"]
    )
    out = g[~g["block_id"].isin(removed)].copy()

    def fix(rels):
        return [
            {
                "rel_type": r["rel_type"],
                "ids": [i for i in r["ids"] if i not in removed]
                if r["rel_type"] == "CHILD"
                else list(r["ids"]),
            }
            for r in rels
        ]

    out["rels"] = out["rels"].map(fix)
    return out.sort_values("ord", kind="mergesort")


def reassemble_textract_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-document span reassembly over the (scrubbed) real block graph:
    walk the PAGE's CHILD list in order; each LINE emits a text span (its
    surviving WORD children joined in CHILD order), each TABLE emits a
    media_ref span. LAYOUT_* containers reference the same LINEs the PAGE
    already lists, so they are not re-emitted (no span duplication). Output
    is the engine's span-sequence invariant (doc_id, kind, text, media_ref,
    ord)."""
    by_id = {
        r.block_id: r for r in g.itertuples(index=False)
    }
    doc_id = int(g["doc_id"].iloc[0])
    pages = sorted(
        (r for r in g.itertuples(index=False) if r.block_type == "PAGE"),
        key=lambda r: r.ord,
    )
    rows = []
    order = 0
    for page in pages:
        child_ids = [
            i
            for rel in page.rels
            if rel["rel_type"] == "CHILD"
            for i in rel["ids"]
        ]
        for cid in child_ids:
            blk = by_id.get(cid)
            if blk is None:
                continue
            if blk.block_type == "LINE":
                words = [
                    by_id[w].text
                    for rel in blk.rels
                    if rel["rel_type"] == "CHILD"
                    for w in rel["ids"]
                    if w in by_id and by_id[w].text is not None
                ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "kind": "text",
                        "text": " ".join(words),
                        "media_ref": None,
                        "ord": order,
                    }
                )
                order += 1
            elif blk.block_type == "TABLE":
                rows.append(
                    {
                        "doc_id": doc_id,
                        "kind": "media",
                        "text": None,
                        "media_ref": blk.block_id,
                        "ord": order,
                    }
                )
                order += 1
    return pd.DataFrame(
        rows,
        columns=["doc_id", "kind", "text", "media_ref", "ord"],
    ).astype({"doc_id": "int64", "ord": "int64"})


def repair_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-document repair (groupby(doc_id).map_groups): drop struck WORDs,
    scrub their ids from surviving child_ids — the anti-join stays local
    because the id set is per-document (strikethrough_agent.py:162,186-205)."""
    doc_id = int(g["doc_id"].iloc[0])
    n_tokens = int((g["block_type"] == "WORD").sum())
    removed = struck_word_ids(doc_id, n_tokens)
    keep = ~g["block_id"].isin(removed)
    out = g[keep].copy()
    out["child_ids"] = out["child_ids"].map(
        lambda ids: [i for i in ids if i not in removed]
    )
    return out
