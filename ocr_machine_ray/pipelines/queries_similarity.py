"""Driver-checked queries: similarity search over the embeddings table."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.similarity import BruteForceTopK, hyperplanes, merge_topk_group
from ..registry import query

N_QUERIES = 32  # query set = vec_id < N_QUERIES
TOP_K = 5


def _load_queries(sf_dir: str):
    """Small side: read the query vectors once on the driver, broadcast."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    t = t.filter(pc.less(t["vec_id"], N_QUERIES))
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


@query("knn_classify", _KNN_SQL)
def q_knn_classify(sf_dir: str):
    import collections

    import pyarrow.parquet as pq

    topk = q_ann_topk(sf_dir).to_pandas()
    lab_t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    labels = dict(
        zip(lab_t["vec_id"].to_pylist(), lab_t["label"].to_pylist())
    )
    rows = []
    for qid, g in topk.groupby("query_id"):
        votes = collections.Counter(labels[n] for n in g["neighbor_id"])
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        rows.append((int(qid), int(best)))
    import pandas as pd

    return pd.DataFrame(rows, columns=["query_id", "pred_label"])


# ---------------------------------------------------------------------------
# IVF coarse quantizer: k-means fit + bucket assignment over the embedding
# column (rows-only: learned clustering has no SQL oracle; convergence and
# blob-separation are asserted in pytest).
# ---------------------------------------------------------------------------
@query("ivf_clusters")
def q_ivf_clusters(sf_dir: str):
    import ray.data

    from ..functions.similarity import kmeans_assign, kmeans_fit

    # materialize once: the iterative fit scans the dataset every round,
    # and a lazy read would re-read + re-decode the parquet each time
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    centroids = kmeans_fit(emb, k=8, n_iter=5)
    return kmeans_assign(emb, centroids)
