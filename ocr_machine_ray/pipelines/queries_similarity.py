"""Driver-checked queries: similarity search over the embeddings table."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.similarity import BruteForceTopK, hyperplanes, merge_topk_group
from ..registry import query

N_QUERIES = 32  # query set = vec_id < N_QUERIES
TOP_K = 5
EMB_DIM = 64


def _empty_topk() -> "pa.Table":
    import pyarrow as pa

    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "rnk": pa.array([], type=pa.int64()),
        }
    )


def _load_queries(sf_dir: str):
    """Small side: read the query vectors once on the driver, broadcast."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    # row-group predicate pushed into the read: only the query rows are
    # decoded, not the whole embeddings table
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        filters=[("vec_id", "<", N_QUERIES)],
    )
    t = t.filter(pc.less(t["vec_id"], N_QUERIES))
    if len(t) == 0:  # 0-row shard: no query vectors
        return np.empty(0, dtype=np.int64), np.empty(
            (0, EMB_DIM), dtype=np.float64
        )
    q_ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    return q_ids, Q


_ANN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS c
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {TOP_K}
"""


@query("ann_topk", _ANN_SQL)
def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: broadcast query matrix (ray.put once, read
    in each actor __init__), per-batch matmul + partial top-k, tiny final
    per-query merge."""
    import ray
    import ray.data

    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "embeddings") == 0:
        return _empty_topk()
    ref = ray.put(_load_queries(sf_dir))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    partials = emb.map_batches(
        BruteForceTopK,
        fn_constructor_args=(ref, TOP_K),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: merge_topk_group(g, TOP_K), batch_format="pandas"
    )


@query("ann_topk_lsh")
def q_ann_topk_lsh(sf_dir: str):
    """LSH-bucketed ANN (rows-only check: approximate by construction).

    Random-hyperplane sign codes, 8 bits x 4 tables; exact rerank on the
    candidates. Recall vs brute force is asserted in pytest, not here."""
    import ray
    import ray.data

    from ..functions.similarity import LshTopK
    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "embeddings") == 0:
        return _empty_topk()
    ref = ray.put(_load_queries(sf_dir))
    planes = hyperplanes(dim=64, n_bits=8, n_tables=4)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    partials = emb.map_batches(
        LshTopK,
        fn_constructor_args=(ref, planes, TOP_K),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: merge_topk_group(g, TOP_K), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# kNN label classification: majority label of the top-k neighbors (ties
# break to the smallest label). Labels join via a broadcast lookup.
# ---------------------------------------------------------------------------
_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS c
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rnk
  FROM s
),
lab AS (
  SELECT r.query_id, e.label FROM r
  JOIN embeddings e ON e.vec_id = r.neighbor_id
  WHERE r.rnk <= {TOP_K}
),
cnt AS (SELECT query_id, label, count(*) AS c FROM lab GROUP BY query_id, label)
SELECT query_id, CAST(label AS BIGINT) AS pred_label
FROM (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, label) AS rn
  FROM cnt
) WHERE rn = 1
"""


def _vote(g: pd.DataFrame) -> pd.DataFrame:
    counts = g.groupby("label").size().reset_index(name="c")
    counts = counts.sort_values(["c", "label"], ascending=[False, True])
    return pd.DataFrame(
        {
            "query_id": [np.int64(g["query_id"].iloc[0])],
            "pred_label": [np.int64(counts["label"].iloc[0])],
        }
    )


@query("knn_classify", _KNN_SQL)
def q_knn_classify(sf_dir: str):
    """Majority label of the top-k neighbors: hash join of the top-k result
    against a pruned (vec_id, label) read, then a per-query vote — no
    driver-side label dictionary, no full-table read."""
    import ray.data
    import pyarrow as pa

    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "embeddings") == 0:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "pred_label": pa.array([], type=pa.int64()),
            }
        )
    # topk is tiny by construction (<= n_queries x k rows): materialize so
    # the empty case can bail before ray 2.49's join (raises on empty side)
    topk = q_ann_topk(sf_dir).materialize()
    if topk.count() == 0:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "pred_label": pa.array([], type=pa.int64()),
            }
        )
    labels = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    joined = topk.join(
        labels,
        join_type="inner",
        num_partitions=4,
        on=("neighbor_id",),
        right_on=("vec_id",),
    )
    return joined.groupby("query_id").map_groups(
        _vote, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# IVF coarse quantizer: k-means fit + bucket assignment over the embedding
# column (rows-only: learned clustering has no SQL oracle; convergence and
# blob-separation are asserted in pytest).
# ---------------------------------------------------------------------------
def _fit_quantizer(emb):
    """k-means coarse quantizer fit on a hard-capped materialized sample
    (bounded object-store footprint at any corpus size); falls back to the
    head of the table when the proportional sample of a tiny shard comes
    up empty."""
    from ..functions.similarity import kmeans_fit

    fit_ds = emb.random_sample(0.5, seed=42).limit(100_000).materialize()
    if fit_ds.count() == 0:
        fit_ds = emb.limit(100_000).materialize()
    return kmeans_fit(fit_ds, k=8, n_iter=5)


@query("ivf_clusters")
def q_ivf_clusters(sf_dir: str):
    import ray.data
    import pyarrow as pa

    from ..functions.similarity import kmeans_assign
    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "embeddings") == 0:
        return pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
            }
        )
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # fit on the capped sample (see _fit_quantizer); assignment then
    # streams once over the lazy full read
    return kmeans_assign(emb, _fit_quantizer(emb))


@query("ann_topk_ivf")
def q_ann_topk_ivf(sf_dir: str):
    """IVF-probed ANN (rows-only: approximate by construction; recall vs
    brute force asserted in pytest). Coarse quantizer fit on a hard-capped
    sample; queries probe their 4 nearest of 8 cells (2x pruning at ~0.74
    recall on this weakly-clustered synthetic space — real embedding
    spaces cluster far better, so production raises k and lowers
    nprobe/k); exact cosine rerank inside probed cells."""
    import ray
    import ray.data

    from ..functions.similarity import IvfTopK
    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "embeddings") == 0:
        return _empty_topk()
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    centroids = _fit_quantizer(emb)
    ref = ray.put(_load_queries(sf_dir))
    partials = emb.map_batches(
        IvfTopK,
        fn_constructor_args=(ref, centroids, 4, TOP_K),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: merge_topk_group(g, TOP_K), batch_format="pandas"
    )
