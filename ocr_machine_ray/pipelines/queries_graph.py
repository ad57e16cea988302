"""Link-graph analytics over the documents table: PageRank.

Web-corpus curation ranks pages by link centrality (the original PageRank
use case; modern pipelines use it — or harmonic centrality, cf. Common
Crawl's cc-pagerank releases — as a quality prior for sampling). The
corpus has no stored hyperlinks, so the link graph is DERIVED
deterministically from doc ids (each doc links to 3 arithmetic neighbors
mod N); the same closed form is evaluated by the DuckDB oracle, which
makes the iterative distributed computation value-exact checkable.

Arithmetic is fixed-point INTEGER micro-units throughout — contribution
per out-edge is (r*17)//60, i.e. damping 0.85 split over out-degree 3 —
so per-round sums are order-independent and the oracle compare is exact
(the repo's no-floats-in-oracles contract).

Scale shape: each round is one map_batches (emit 3 contribution rows +
one presence-marker row per node) feeding one groupby(dst).sum — a
synchronous BSP round, exactly how Pregel-style PageRank shards. All 5
rounds chain into ONE lazy streaming plan (shuffle barriers between
rounds, no driver-side state, no per-round materialization). Presence
markers replace the nodes-side left join: a real node with no in-edges
keeps its base rank, contributions to ids outside the node set are
dropped by the marker filter. Reference parity: the reference engine has
no graph stage; this extends the §2.7 set-ops family the same way
dedup_clusters (connected components) does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..registry import query
from .extraction import parquet_num_rows, read_documents

N_ROUNDS = 5
BASE_MICRO = 150_000  # (1 - 0.85) * 1e6
INIT_MICRO = 1_000_000
OUT_DEG = 3
# per-edge damped share: r * 0.85 / 3 == r * 17 / 60, exact in integers
C_NUM, C_DEN = 17, 60
EDGE_A, EDGE_B = 7, 13  # dst_k = (v*7 + 13*k) % N, k = 1..3


def _pagerank_sql() -> str:
    rounds = []
    prev = "r0"
    for t in range(1, N_ROUNDS + 1):
        rounds.append(
            f"""c{t} AS (
  SELECT dst AS v, sum(contrib) AS s FROM (
    SELECT ({prev}.v*{EDGE_A} + {EDGE_B}*k.k) % n.n AS dst,
           ({prev}.r*{C_NUM})//{C_DEN} AS contrib
    FROM {prev} CROSS JOIN n CROSS JOIN ks k
  ) GROUP BY dst
),
r{t} AS (
  SELECT nodes.v, CAST({BASE_MICRO} + coalesce(c{t}.s, 0) AS BIGINT) AS r
  FROM nodes LEFT JOIN c{t} USING (v)
)"""
        )
        prev = f"r{t}"
    body = ",\n".join(rounds)
    return f"""
WITH nodes AS (SELECT doc_id AS v FROM documents),
n AS (SELECT count(*) AS n FROM documents),
ks AS (SELECT unnest([{", ".join(str(k + 1) for k in range(OUT_DEG))}]) AS k),
r0 AS (SELECT v, CAST({INIT_MICRO} AS BIGINT) AS r FROM nodes),
{body}
SELECT v AS doc_id, r AS rank_micro FROM {prev}
"""


@query("pagerank", _pagerank_sql())
def q_pagerank(sf_dir: str):
    from ray.data.aggregate import Sum

    n_nodes = parquet_num_rows(sf_dir, "documents")
    if n_nodes == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "rank_micro": pa.array([], type=pa.int64()),
            }
        )

    ranks = read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: pa.table(
            {
                "v": t["doc_id"].cast(pa.int64()),
                "r": pa.array(
                    np.full(len(t), INIT_MICRO, dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def emit(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        contrib = (r * C_NUM) // C_DEN
        dsts = [
            (v * EDGE_A + EDGE_B * k) % n_nodes
            for k in range(1, OUT_DEG + 1)
        ]
        out_v = np.concatenate([v] + dsts)
        out_c = np.concatenate(
            [np.zeros(len(v), dtype=np.int64)] + [contrib] * OUT_DEG
        )
        out_m = np.concatenate(
            [
                np.ones(len(v), dtype=np.int64),
                np.zeros(len(v) * OUT_DEG, dtype=np.int64),
            ]
        )
        return pa.table(
            {
                "v": pa.array(out_v),
                "contrib": pa.array(out_c),
                "is_node": pa.array(out_m),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(
            np.asarray(
                t["is_node"].to_numpy(zero_copy_only=False) > 0
            )
        )
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": t["v"],
                "r": pa.array(BASE_MICRO + s),
            }
        )

    for _ in range(N_ROUNDS):
        ranks = (
            ranks.map_batches(
                emit, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("v")
            .aggregate(
                Sum("contrib", alias_name="s"),
                Sum("is_node", alias_name="is_node"),
            )
            .map_batches(finish, batch_format="pyarrow")
        )

    return ranks.map_batches(
        lambda t: pa.table(
            {"doc_id": t["v"], "rank_micro": t["r"]}
        ),
        batch_format="pyarrow",
    )
