"""Reference end-state sinks: media-span summarization + vector export."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq


def test_media_summarize_replaces_each_media_span(ray_session, sf_small):
    """Every media span of the whited-out document is replaced by a
    pixel-derived summary text span at the same absolute offset, and the
    label agrees with the doc's category rule (the stand-in for the
    reference's GPT table/diagram summaries, main.py steps 4.3+5)."""
    import duckdb

    from ocr_machine_ray.corpus import SQL_ALL_SPANS, SQL_CATEGORY
    from ocr_machine_ray.registry import queries

    out = queries()["media_summarize_spans"](sf_small).to_pandas()
    assert len(out) > 0
    summaries = out[out["text"].str.startswith("[")]
    assert len(summaries) > 0
    # offsets of summary spans == offsets of media spans per the corpus rule
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    want = con.execute(
        f"{SQL_ALL_SPANS}, {SQL_CATEGORY} "
        "SELECT s.doc_id, s.off, c.category FROM all_spans s "
        "JOIN doc_category c ON c.doc_id = s.doc_id WHERE s.kind='media'"
    ).df()
    got = summaries[["doc_id", "off"]].sort_values(["doc_id", "off"])
    exp = want[["doc_id", "off"]].sort_values(["doc_id", "off"])
    assert got.to_numpy().tolist() == exp.astype(np.int64).to_numpy().tolist()
    # pixel-derived label == category rule
    merged = summaries.merge(want, on=["doc_id", "off"])
    lab = merged["text"].str.split(" ").str[0].str.lstrip("[")
    expect = merged["category"].map(
        {"tables": "table", "diagrams": "diagram", "other": "figure"}
    )
    assert (lab == expect).all()


def test_embeddings_export_layout_and_resume_contract(ray_session, sf_small, tmp_path):
    """The sink writes one atomic parquet per partition plus a manifest
    (partition done iff manifest exists); the written files hold exactly
    the embeddings table, partitioned by vec_id % 16."""
    from ocr_machine_ray.pipelines.queries_export import (
        _EXPORT_PARTS,
        q_embeddings_export,
    )

    out_dir = str(tmp_path / "export")
    os.makedirs(out_dir)
    verif = q_embeddings_export(sf_small, out_dir=out_dir).to_pandas()
    src = pq.read_table(f"{sf_small}/embeddings.parquet")
    n_src = len(src)

    manifests = sorted(os.listdir(os.path.join(out_dir, "_manifest")))
    parts_seen = {int(f.split(".")[0]) for f in manifests}
    assert parts_seen == set(verif["part"].tolist())
    total = 0
    for f in manifests:
        with open(os.path.join(out_dir, "_manifest", f)) as fh:
            rec = json.load(fh)
        t = pq.read_table(rec["path"])
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        assert (vid % _EXPORT_PARTS == rec["partition_id"]).all()
        total += len(t)
    assert total == n_src
    assert int(verif["n_vecs"].sum()) == n_src
    assert (verif["dim"] == 64).all()
