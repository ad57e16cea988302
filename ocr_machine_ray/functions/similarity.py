"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every batch does one float64 matmul against it; per-batch
partial top-k rows are merged by a tiny groupby. Scale path: a random-
hyperplane LSH bucketer (sign-bit codes) that prunes the candidate set
before the exact rerank — same top-k contract, bucket-sized matmuls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False)
    if len(vals) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(vals).astype(np.float64)


def _sq_dists(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """||v - c||^2 matrix, (n, k); clamped at 0 (the expansion can go
    slightly negative from cancellation, which breaks probability use)."""
    d2 = (
        (V * V).sum(axis=1, keepdims=True)
        - 2 * V @ C.T
        + (C * C).sum(axis=1)[None, :]
    )
    return np.maximum(d2, 0.0)


class BruteForceTopK:
    """map_batches actor: cosine of each batch vector against the broadcast
    query matrix; emits per-batch candidate rows (query_id, neighbor_id, cos).

    The broadcast happens ONCE per actor (__init__), not per batch."""

    def __init__(self, query_ref, k: int):
        import ray

        q_ids, Q = ray.get(query_ref)
        self.q_ids = q_ids
        norms = np.linalg.norm(Q, axis=1, keepdims=True)
        self.Qn = Q / np.where(norms == 0, 1.0, norms)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        V = _as_matrix(batch["embedding"])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.where(norms == 0, 1.0, norms)
        S = self.Qn @ Vn.T  # (n_queries, n_batch)
        # self-matches removed downstream by vec_id != query_id
        k = min(self.k + 1, S.shape[1])
        part = np.argpartition(-S, k - 1, axis=1)[:, :k]
        qi = np.repeat(np.arange(len(self.q_ids)), k)
        ni = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(self.q_ids[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[ni], type=pa.int64()),
                "cos": pa.array(S[qi, ni], type=pa.float64()),
            }
        )


def merge_topk_group(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final top-k merge over a BUCKET of queries (query_id >> 8 — per-key
    map_groups costs ~0.6-3 ms of pandas dispatch each; today's query sets
    are tiny, but the bucketed shape holds if n_queries ever grows): one
    lexsort by (query, cos desc, neighbor), segment positions < k win."""
    g = g[g["neighbor_id"] != g["query_id"]]
    qid = g["query_id"].to_numpy().astype(np.int64)
    nid = g["neighbor_id"].to_numpy().astype(np.int64)
    cos = g["cos"].to_numpy().astype(np.float64)
    order = np.lexsort((nid, -cos, qid))
    q, n_ = qid[order], nid[order]
    change = np.r_[True, q[1:] != q[:-1]]
    starts = np.flatnonzero(change)
    pos = np.arange(len(q)) - starts[np.cumsum(change) - 1]
    keep = pos < k
    return pd.DataFrame(
        {
            "query_id": q[keep],
            "neighbor_id": n_[keep],
            "rnk": (pos[keep] + 1).astype(np.int64),
        }
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplane) bucketing — the 100 TB path: candidates share a
# sign-bit code with the query under >=1 of `n_tables` codings.
# ---------------------------------------------------------------------------
def hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_codes(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_tables, n_vecs) integer bucket codes from sign bits."""
    n_tables, n_bits, _ = planes.shape
    codes = np.zeros((n_tables, V.shape[0]), dtype=np.int64)
    for t in range(n_tables):
        bits = (planes[t] @ V.T) > 0  # (n_bits, n)
        codes[t] = np.packbits(
            bits, axis=0, bitorder="little"
        ).view(np.uint8)[: (n_bits + 7) // 8].astype(np.int64).T @ (
            256 ** np.arange((n_bits + 7) // 8, dtype=np.int64)
        )
    return codes


class LshTopK:
    """Bucketed ANN: score only batch vectors whose code matches a query's
    code in any table; exact cosine rerank on the surviving candidates."""

    def __init__(self, query_ref, planes: np.ndarray, k: int):
        import ray

        q_ids, Q = ray.get(query_ref)
        self.q_ids = q_ids
        norms = np.linalg.norm(Q, axis=1, keepdims=True)
        self.Qn = Q / np.where(norms == 0, 1.0, norms)
        self.planes = planes
        self.q_codes = lsh_codes(Q, planes)  # (T, nq)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        V = _as_matrix(batch["embedding"])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.where(norms == 0, 1.0, norms)
        v_codes = lsh_codes(V, self.planes)  # (T, nv)
        # candidate mask (nq, nv): any-table code equality
        cand = np.zeros((len(self.q_ids), len(ids)), dtype=bool)
        for t in range(self.planes.shape[0]):
            cand |= self.q_codes[t][:, None] == v_codes[t][None, :]
        qi, vi = np.where(cand)
        if len(qi) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        cos = np.einsum("ij,ij->i", self.Qn[qi], Vn[vi])
        return pa.table(
            {
                "query_id": pa.array(self.q_ids[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[vi], type=pa.int64()),
                "cos": pa.array(cos, type=pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# Distributed k-means (the iterative-algorithm pattern: per-batch partial
# sums against broadcast centroids, tiny driver-side reduce per round) —
# the coarse quantizer an IVF ANN index builds on.
# ---------------------------------------------------------------------------
def kmeans_fit(ds, k: int, n_iter: int = 10, seed: int = 42,
               vec_col: str = "embedding"):
    """Lloyd's k-means over a Dataset embedding column.

    Each round: broadcast centroids (ray.put), one map_batches computing
    per-batch (cluster-sum, cluster-count) partials, sum the k×d partials
    on the driver, recompute centroids. Data crosses the wire once per
    round as k×d floats per batch — never the vectors themselves.
    Init: k seeded-sampled DATA points (a gaussian init is scale-mismatched
    to e.g. unit-norm embeddings and strands most clusters empty); empty
    clusters are reseeded each round to the farthest-assigned point's batch
    mean stand-in (a fresh seeded sample).
    """
    import ray

    # init from data: seeded Bernoulli sample across the WHOLE dataset
    # (ds.take() is order-biased — with blob-ordered rows it returns one
    # blob and k-means collapses into a local minimum)
    n = ds.count()
    frac = min(1.0, max(k * 40, 200) / max(1, n))
    sample = ds.random_sample(frac, seed=seed).take(max(k * 40, 200))
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [np.asarray(s[vec_col], dtype=np.float64) for s in sample]
    )
    # k-means++ seeding over the sample: distance-weighted picks avoid the
    # uniform-pick failure where two seeds land in one blob and Lloyd
    # merges two true clusters into one centroid
    # tiny datasets: can't seed more distinct centroids than sample points;
    # shrink k rather than silently duplicating points (duplicate centroids
    # tie on every assignment and one side starves forever)
    k = min(k, len(pts))
    chosen = [pts[int(rng.integers(len(pts)))]]
    while len(chosen) < k:
        d2 = _sq_dists(pts, np.stack(chosen)).min(axis=1)
        total = d2.sum()
        if total <= 0:
            chosen.append(pts[int(rng.integers(len(pts)))])
            continue
        chosen.append(pts[int(rng.choice(len(pts), p=d2 / total))])
    centroids = np.stack(chosen)

    for _ in range(n_iter):
        ref = ray.put(centroids)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            import ray as _ray

            C = _ray.get(_ref)  # (k, d)
            V = _as_matrix(batch[vec_col])
            if V.shape[0] == 0:
                return pa.table(
                    {
                        "sums": pa.array([np.zeros(C.size).tolist()]),
                        "counts": pa.array([np.zeros(C.shape[0]).tolist()]),
                    }
                )
            assign = _sq_dists(V, C).argmin(axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, V)
            counts = np.bincount(assign, minlength=C.shape[0]).astype(
                np.float64
            )
            return pa.table(
                {
                    "sums": pa.array([sums.ravel().tolist()]),
                    "counts": pa.array([counts.tolist()]),
                }
            )

        total_sums = np.zeros_like(centroids)
        total_counts = np.zeros(k)
        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            for s, c in zip(b["sums"].to_pylist(), b["counts"].to_pylist()):
                total_sums += np.asarray(s).reshape(centroids.shape)
                total_counts += np.asarray(c)
        nonempty = total_counts > 0
        centroids[nonempty] = (
            total_sums[nonempty] / total_counts[nonempty, None]
        )
        # reseed empty clusters from fresh seeded data samples so no
        # bucket is stranded at its init forever
        n_empty = int((~nonempty).sum())
        if n_empty:
            # replace=False raises when n_empty > sample size (tiny data)
            ridx = rng.choice(
                len(sample),
                size=n_empty,
                replace=n_empty > len(sample),
            )
            centroids[~nonempty] = np.stack(
                [np.asarray(sample[i][vec_col], dtype=np.float64)
                 for i in ridx]
            )
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Assign every vector to its nearest centroid (IVF bucket column)."""
    import ray

    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(ref)
        V = _as_matrix(batch[vec_col])
        if V.shape[0] == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(
                    _sq_dists(V, C).argmin(axis=1).astype(np.int64)
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


class IvfTopK:
    """IVF-probed ANN: batch vectors are assigned to their nearest coarse
    centroid; a query scores only vectors whose cell is among its `nprobe`
    closest cells, with exact cosine rerank on the survivors. The scale
    path complement to LshTopK — at 10^12 rows the index would be built
    once (kmeans_fit on a capped sample) and vectors stored partitioned by
    cell so a probe reads only nprobe/k of the corpus."""

    def __init__(self, query_ref, centroids: np.ndarray, nprobe: int, k: int):
        import ray

        q_ids, Q = ray.get(query_ref)
        self.q_ids = q_ids
        norms = np.linalg.norm(Q, axis=1, keepdims=True)
        self.Qn = Q / np.where(norms == 0, 1.0, norms)
        self.C = centroids.astype(np.float64)
        # (nq, nprobe) nearest cells per query
        d = _sq_dists(Q, self.C)
        self.q_cells = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "cos": pa.array([], type=pa.float64()),
            }
        )
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return empty
        V = _as_matrix(batch["embedding"])
        v_cell = np.argmin(_sq_dists(V, self.C), axis=1)
        cand = (self.q_cells[:, :, None] == v_cell[None, None, :]).any(axis=1)
        qi, vi = np.where(cand)
        if len(qi) == 0:
            return empty
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.where(norms == 0, 1.0, norms)
        cos = np.einsum("ij,ij->i", self.Qn[qi], Vn[vi])
        # per-batch partial top-k: with nprobe/k cells probed, the raw
        # candidate set is a large fraction of the batch per query —
        # uncapped emission would make the final merge groupby shuffle a
        # multiple of the corpus. Cap at k+1 rows per query per batch
        # (+1 because the self-match is dropped downstream), identical
        # result, merge input bounded at (k+1) x n_queries x n_blocks.
        order = np.lexsort((-cos, qi))
        qi, vi, cos = qi[order], vi[order], cos[order]
        starts = np.flatnonzero(np.r_[True, qi[1:] != qi[:-1]])
        pos = np.arange(len(qi)) - np.repeat(
            starts, np.diff(np.r_[starts, len(qi)])
        )
        keep = pos < self.k + 1
        qi, vi, cos = qi[keep], vi[keep], cos[keep]
        return pa.table(
            {
                "query_id": pa.array(self.q_ids[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[vi], type=pa.int64()),
                "cos": pa.array(cos, type=pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# Distributed PCA: one pass of mergeable (n, sum, gram) partials, a d x d
# driver-side eigendecomposition (d is the embedding width, never the
# corpus), then a second streaming pass projecting every vector. The only
# driver-materialized object is block-count x (d + d^2) floats.
# ---------------------------------------------------------------------------
def pca_partials_batch(batch, vec_col: str = "embedding"):
    import pyarrow as pa

    V = _as_matrix(batch[vec_col])
    if V.size == 0:
        return pa.table(
            {
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.list_(pa.float64())),
                "g": pa.array([], type=pa.list_(pa.float64())),
            }
        )
    V = V.astype(np.float64)
    return pa.table(
        {
            "n": pa.array([len(V)], type=pa.int64()),
            "s": pa.array([V.sum(axis=0).tolist()],
                          type=pa.list_(pa.float64())),
            "g": pa.array([(V.T @ V).ravel().tolist()],
                          type=pa.list_(pa.float64())),
        }
    )


def pca_fit(ds, n_components: int, vec_col: str = "embedding"):
    """Fit PCA over a Dataset of vectors.

    Returns (mean, components[k, d], explained_var[k]). Component signs are
    fixed deterministically (largest-|coefficient| entry positive); the
    driver-side partial reduce sums in a content-sorted order so the
    covariance matrix is bit-stable regardless of block arrival order.
    """
    rows = ds.map_batches(
        lambda b: pca_partials_batch(b, vec_col), batch_format="pyarrow"
    ).take_all()
    if not rows:
        raise ValueError("pca_fit: empty input")
    parts = sorted(
        ((int(r["n"]), np.asarray(r["s"]), np.asarray(r["g"])) for r in rows),
        key=lambda t: (t[0], t[1].tobytes()),
    )
    n = sum(p[0] for p in parts)
    d = parts[0][1].shape[0]
    s = np.zeros(d)
    g = np.zeros(d * d)
    for pn, ps, pg in parts:
        s += ps
        g += pg
    mu = s / n
    G = g.reshape(d, d)
    denom = max(n - 1, 1)
    cov = (G - n * np.outer(mu, mu)) / denom
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T  # (k, d)
    var = w[order]
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, var


def pca_project_batch(batch, mean, comps, vec_col: str = "embedding"):
    import pyarrow as pa

    V = _as_matrix(batch[vec_col])
    if V.size == 0:
        k = comps.shape[0]
        return pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "proj": pa.array([], type=pa.list_(pa.float64(), k)),
            }
        )
    P = (V.astype(np.float64) - mean) @ comps.T
    return pa.table(
        {
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "proj": pa.FixedSizeListArray.from_arrays(
                pa.array(P.ravel(), type=pa.float64()), P.shape[1]
            ),
        }
    )
