"""Checkpoint / resume / lineage (SURVEY.md §4.2, north_rule).

Output layout (resumable, idempotent):

    out_dir/
      part=<pid>/data.parquet     # one atomic file per hash partition
      _manifest/<pid>.json        # lineage record, written AFTER the data

A partition is "done" iff its manifest exists. Resume = anti-join the
pending partition set against the manifest directory — reprocessing skips
finished partitions entirely (the engine's answer to the reference's
milestone JSON dumps, ``main.py:25``, which have no partition-level resume).

Partitioning is ``doc_id % n_parts`` (deterministic, content-independent) so
a re-run assigns identical rows to identical partitions; writes go to a tmp
path then ``os.replace`` (atomic on POSIX), so a crash mid-write never
leaves a partition half-visible.

Each manifest is a per-partition lineage record: inputs (doc range, count),
outputs (row count), wall time, stage name, run id.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def partition_id(doc_ids, n_parts: int):
    return doc_ids % n_parts


def done_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    return {
        int(f[: -len(".json")])
        for f in os.listdir(mdir)
        if f.endswith(".json")
    }


def read_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifest")
    out = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
    return out


def _write_partition(g: pd.DataFrame, out_dir: str, stage: str, run_id: str,
                     n_parts: int) -> pd.DataFrame:
    """Per-group writer (runs inside map_groups on a worker): atomic data
    write, then the manifest. Returns the lineage row."""
    t0 = time.time()
    pid = int(g["_pid"].iloc[0])
    g = g.drop(columns=["_pid"])
    pdir = os.path.join(out_dir, f"part={pid}")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    tmp = os.path.join(pdir, f".data.parquet.tmp.{os.getpid()}")
    final = os.path.join(pdir, "data.parquet")
    pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
    os.replace(tmp, final)
    record = {
        "partition_id": pid,
        "stage": stage,
        "run_id": run_id,
        "n_parts": n_parts,
        "n_rows": int(len(g)),
        "doc_min": int(g["doc_id"].min()) if len(g) else None,
        "doc_max": int(g["doc_id"].max()) if len(g) else None,
        "n_docs": int(g["doc_id"].nunique()) if len(g) else 0,
        "wall_ms": round((time.time() - t0) * 1000, 1),
    }
    mtmp = os.path.join(out_dir, "_manifest", f".{pid}.json.tmp.{os.getpid()}")
    with open(mtmp, "w") as fh:
        json.dump(record, fh)
    os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{pid}.json"))
    return pd.DataFrame([record])


def run_resumable(
    flat_ds,
    out_dir: str,
    n_parts: int,
    stage: str = "extract",
    run_id: str = "r0",
):
    """Write a flat (doc_id, ...) Dataset to a resumable partitioned layout.

    Already-done partitions are filtered before the SHUFFLE + WRITE, so a
    resume skips the expensive wide stages — but the caller's upstream map
    stages on ``flat_ds`` still execute (Ray does not hoist this filter
    above user transforms). For resume cost proportional to remaining
    work, prune at the SOURCE with :func:`pending_docs_filter` applied to
    the input read, then run the pipeline on the pruned docs. Returns the
    lineage records written by this invocation (empty if all done).
    """
    import pyarrow.compute as pc

    # refuse to resume against manifests written with different parameters:
    # a changed n_parts or stage silently remixes partition membership and
    # duplicates/loses rows
    for m in read_manifests(out_dir):
        if m.get("n_parts", n_parts) != n_parts or m.get("stage", stage) != stage:
            raise ValueError(
                f"out_dir {out_dir!r} holds manifests for "
                f"stage={m.get('stage')!r} n_parts={m.get('n_parts')} — "
                f"refusing to resume with stage={stage!r} n_parts={n_parts}; "
                "use a fresh out_dir"
            )

    done = done_partitions(out_dir)

    def tag_and_filter(batch: pa.Table) -> pa.Table:
        import numpy as np

        pid = (
            batch["doc_id"].to_numpy(zero_copy_only=False) % n_parts
        ).astype(np.int32)
        batch = batch.append_column("_pid", pa.array(pid, type=pa.int32()))
        if done:
            mask = pc.invert(
                pc.is_in(
                    batch["_pid"],
                    value_set=pa.array(sorted(done), type=pa.int32()),
                )
            )
            batch = batch.filter(mask)
        return batch

    pending = flat_ds.map_batches(
        tag_and_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    lineage = pending.groupby("_pid").map_groups(
        lambda g: _write_partition(g, out_dir, stage, run_id, n_parts),
        batch_format="pandas",
    )
    return lineage.to_pandas().to_dict("records")


def pending_docs_filter(out_dir: str, n_parts: int):
    """Batch fn for the INPUT documents read: drop docs whose partition is
    already done, so resume skips upstream compute too (apply as the first
    map_batches after the scan)."""
    import numpy as np
    import pyarrow.compute as pc

    done = done_partitions(out_dir)
    done_arr = pa.array(sorted(done), type=pa.int32()) if done else None

    def fn(batch: pa.Table) -> pa.Table:
        if done_arr is None:
            return batch
        pid = (
            batch["doc_id"].to_numpy(zero_copy_only=False) % n_parts
        ).astype(np.int32)
        mask = pc.invert(
            pc.is_in(pa.array(pid, type=pa.int32()), value_set=done_arr)
        )
        return batch.filter(mask)

    return fn


def read_output(out_dir: str):
    """Read the full partitioned output back as a Dataset."""
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return ray.data.read_parquet(files)
