"""Cluster job entrypoint for the flagship extraction pipeline.

This is the script the `north_rule` submits to a fixed-size multi-node
cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo -- \
        python tools/ray_job_entry.py --input <spans-or-sf-dir> \
        --out /data/extract_out --n-parts 4096 --run-id r1

and re-submitting after a failure resumes: finished partitions are read
from the output manifests and filtered out BEFORE the shuffle+write
(`state/checkpoint.py:run_resumable`), so a rerun pays only for the
remaining work. Locally (this sandbox) it runs the same path on
`ray.init(address="local")` — tests/test_job_entry.py drives it twice and
asserts the second run writes nothing new.

Exit contract: prints ONE JSON line with rows written, partitions
finished/skipped, and wall seconds — the lineage a scheduler scrapes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir (documents.parquet) or spans table dir")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--n-parts", type=int, default=64)
    ap.add_argument("--run-id", default="job")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; ignored under ray job submit")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime pre-initializes; this branch
        # is the local / standalone path
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    sys.path.insert(0, "/root/repo")
    from ocr_machine_ray.pipelines.extraction import extract
    from ocr_machine_ray.state.checkpoint import (
        done_partitions,
        run_resumable,
    )

    t0 = time.time()
    already = len(done_partitions(args.out))
    flat = extract(args.input)
    records = run_resumable(
        flat, args.out, n_parts=args.n_parts, stage="extract",
        run_id=args.run_id,
    )
    # run_resumable returns the lineage rows as a list of dicts
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "partitions_written": len(records),
                "partitions_skipped": already,
                "rows_written": sum(r["n_rows"] for r in records),
                "wall_sec": round(time.time() - t0, 3),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
