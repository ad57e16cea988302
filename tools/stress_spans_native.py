"""Scale stress for the chunk-exact spans-native family.

Amplifies the documents table (bench.py's shifted-doc_id scheme), derives
the nested interleaved layout, applies the binding span cap, and runs the
chunk-exact MinHash banding end-to-end (partials -> doc groupby ->
boundary combine). Usage:

    python tools/stress_spans_native.py [sf_dir] [amp]

Prints one JSON line with wall time, docs, chunk rows and band rows.
An optional third arg picks the family: minhash (default, boundary-token
shingle exchange), layout (kind-transition exchange), sections
(text-run-merge exchange), context (media prev/next text-token
exchange) — the structurally distinct combines over the nested
interleaved layout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    family = sys.argv[3] if len(sys.argv) > 3 else "minhash"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from bench import N_BLOCKS, amplified_documents, host_probe
    from ocr_machine_ray.corpus import derive_spans_batch
    from ocr_machine_ray.pipelines import queries_spans_native as qsn
    from ocr_machine_ray.pipelines.queries_spans_native import (
        SPAN_NATIVE_CAP,
        _with_bucket,
    )
    from ocr_machine_ray.stages.skew import cap_spans_per_row

    partial, combine = {
        "minhash": (qsn._mh_chunk_partial, qsn._mh_combine_bucket),
        "layout": (qsn._layout_chunk_partial, qsn._layout_combine_bucket),
        "context": (qsn._context_chunk_partial, qsn._context_combine_bucket),
        "sections": (qsn._section_chunk_partial, qsn._section_combine_bucket),
    }[family]

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * amp
    p0 = host_probe()
    t0 = time.time()
    bands = (
        amplified_documents(sf_dir, amp, N_BLOCKS)
        .map_batches(derive_spans_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(
            lambda t: cap_spans_per_row(t, SPAN_NATIVE_CAP),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .map_batches(
            lambda t: _with_bucket(partial(t)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(32)
        .groupby("bucket")
        .map_groups(
            lambda g: combine(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )
    # stream-consume: per-block counts only, nothing materializes
    n_rows = 0
    for b in bands.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += len(b)
    wall = time.time() - t0
    p1 = host_probe()
    print(
        json.dumps(
            {
                "metric": f"spans_native_{family}_stress",
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "n_docs": n_docs,
                "out_rows": n_rows,
                "amp": amp,
                "sf_dir": sf_dir,
                "probes": [round(p0, 3), round(p1, 3)],
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
