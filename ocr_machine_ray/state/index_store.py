"""Persisted ANN index artifacts (IVF coarse centroids, PQ codebooks).

At 100 TB an index build is a JOB, not a per-query step: the quantizer /
codebook fit happens once, is written as an artifact, and every subsequent
query run loads it instead of re-sampling and re-fitting the corpus
(VERDICT r2 action 7). Storage follows state/checkpoint.py's atomic
protocol: arrays to a tmp .npz then os.replace, manifest json written
AFTER the data — a crash mid-write never leaves a half-visible artifact,
and "artifact exists" == "manifest exists".

Artifacts are keyed by (name, fingerprint); the fingerprint covers the
input table's parquet row count + byte size and every fit parameter, so a
changed corpus or changed hyperparameters refit instead of silently
serving a stale index.

Enabled by setting $GRAFT_INDEX_DIR (or passing index_dir). With it unset
(the oracle-gate default) every call is a miss and behavior is identical
to the fit-per-query path.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def default_index_dir() -> str | None:
    return os.environ.get("GRAFT_INDEX_DIR") or None


def table_fingerprint(sf_dir: str, table: str, params: dict) -> str:
    """Input-identity hash: parquet physical identity + fit parameters."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    md = pq.read_metadata(path)
    ident = {
        "path": os.path.abspath(path),
        "num_rows": md.num_rows,
        "size": os.path.getsize(path),
        "params": {k: params[k] for k in sorted(params)},
    }
    return hashlib.sha1(
        json.dumps(ident, sort_keys=True).encode()
    ).hexdigest()


def _paths(index_dir: str, name: str, fp: str) -> tuple[str, str]:
    base = os.path.join(index_dir, name)
    return (
        os.path.join(base, f"{fp}.npz"),
        os.path.join(base, "_manifest", f"{fp}.json"),
    )


def save_index(
    index_dir: str, name: str, fp: str, arrays: dict[str, np.ndarray],
    meta: dict | None = None,
) -> None:
    data_path, man_path = _paths(index_dir, name, fp)
    os.makedirs(os.path.dirname(data_path), exist_ok=True)
    os.makedirs(os.path.dirname(man_path), exist_ok=True)
    tmp = f"{data_path}.tmp.{os.getpid()}"
    np.savez(tmp, **arrays)
    # np.savez appends .npz to paths without it; tmp keeps the suffixless
    # name only if it already ends differently — normalize explicitly
    produced = tmp if os.path.exists(tmp) else f"{tmp}.npz"
    os.replace(produced, data_path)
    record = {
        "name": name,
        "fingerprint": fp,
        "arrays": sorted(arrays),
        "meta": meta or {},
    }
    mtmp = f"{man_path}.tmp.{os.getpid()}"
    with open(mtmp, "w") as f:
        json.dump(record, f)
    os.replace(mtmp, man_path)


def load_index(
    index_dir: str, name: str, fp: str
) -> dict[str, np.ndarray] | None:
    """None on miss (no manifest) — the caller fits and saves."""
    data_path, man_path = _paths(index_dir, name, fp)
    if not (os.path.exists(man_path) and os.path.exists(data_path)):
        return None
    with np.load(data_path) as z:
        return {k: z[k] for k in z.files}


def fit_or_load(
    name: str,
    sf_dir: str,
    table: str,
    params: dict,
    fit_fn,
    index_dir: str | None = None,
) -> dict[str, np.ndarray]:
    """The one call sites use: artifact hit -> load (fit_fn NOT called);
    miss -> fit_fn() -> save -> return. fit_fn returns {array_name: np
    array}."""
    index_dir = index_dir or default_index_dir()
    if index_dir is None:
        return fit_fn()
    fp = table_fingerprint(sf_dir, table, params)
    cached = load_index(index_dir, name, fp)
    if cached is not None:
        return cached
    arrays = fit_fn()
    save_index(index_dir, name, fp, arrays, meta={"params": params})
    return arrays
