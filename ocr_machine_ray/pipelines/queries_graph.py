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


# ---------------------------------------------------------------------------
# Per-node triangle counts (graph clustering-coefficient numerator; the
# standard wedge-join formulation every distributed graph engine ships).
# Edge rule here is the consecutive-neighbor ring u -> (u+k) % N, k=1..3 —
# triangle-rich by construction, same closed form on both sides. Shape:
# normalized distinct undirected edges (packed-key groupby), ONE
# single-key hash join builds wedges (a-b-c via b), one more closes them
# against the edge set on a packed (a, c) key (each join in its own plan;
# packed keys keep every shuffle single-key). Per-node counts come from a
# flat 3-row emit per triangle + one groupby — no node ever sees more
# than its neighborhood.
# ---------------------------------------------------------------------------
_TRI_SQL = f"""
WITH n AS (SELECT count(*) AS n FROM documents),
ks AS (SELECT unnest([{", ".join(str(k + 1) for k in range(OUT_DEG))}]) AS kk),
raw AS (
  SELECT d.doc_id AS s, (d.doc_id + ks.kk) % n.n AS t
  FROM documents d CROSS JOIN n CROSS JOIN ks
),
e AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
  FROM raw WHERE s != t
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT x AS v FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY v
"""


@query("triangle_counts", _TRI_SQL)
def q_triangle_counts(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_triangles": pa.array([], type=pa.int64()),
        }
    )
    n_nodes = parquet_num_rows(sf_dir, "documents")
    if n_nodes == 0:
        return empty

    def emit_edges(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.concatenate([v, v, v])
        dst = np.concatenate(
            [(v + k) % n_nodes for k in range(1, OUT_DEG + 1)]
        )
        keep = s != dst
        s, dst = s[keep], dst[keep]
        a = np.minimum(s, dst)
        b = np.maximum(s, dst)
        return pa.table(
            {
                "ek": pc.binary_join_element_wise(
                    pa.array(a.astype("U"), type=pa.string()),
                    pa.array(b.astype("U"), type=pa.string()),
                    "\x00",
                )
            }
        )

    def decode_edges(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                }
            )
        parts = pc.split_pattern(t["ek"], "\x00")
        return pa.table(
            {
                "a": pc.list_element(parts, 0).cast(pa.int64()),
                "b": pc.list_element(parts, 1).cast(pa.int64()),
            }
        )

    edges = (
        read_documents(sf_dir, ["doc_id"])
        .map_batches(
            emit_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("ek")
        .aggregate(Count(alias_name="_n"))
        .map_batches(decode_edges, batch_format="pyarrow")
        .repartition(4)
        .materialize()
    )
    if edges.count() == 0:
        return empty

    # wedges a-b-c: e1.(a,b) joined to e2.(a2=b, b2=c)
    wedges = (
        edges.join(
            edges.map_batches(
                lambda t: pa.table({"a2": t["a"], "b2": t["b"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=8,
            on=("b",),
            right_on=("a2",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "wa": t["a"],
                    "wb": t["b"],
                    "wc": t["b2"],
                    "wk": pc.binary_join_element_wise(
                        pc.cast(t["a"], pa.string()),
                        pc.cast(t["b2"], pa.string()),
                        "\x00",
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(8)
        .materialize()
    )

    closing = edges.map_batches(
        lambda t: pa.table(
            {
                "wk": pc.binary_join_element_wise(
                    pc.cast(t["a"], pa.string()),
                    pc.cast(t["b"], pa.string()),
                    "\x00",
                )
            }
        ),
        batch_format="pyarrow",
    )

    tri = wedges.join(
        closing, join_type="left_semi", num_partitions=8, on=("wk",)
    )

    def per_node(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "v": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        vs = np.concatenate(
            [
                t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ("wa", "wb", "wc")
            ]
        )
        uv, cnt = np.unique(vs, return_counts=True)
        return pa.table(
            {"v": pa.array(uv), "c": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        tri.map_batches(per_node, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="n_triangles"))
        .map_batches(
            lambda t: pa.table(
                {"doc_id": t["v"], "n_triangles": t["n_triangles"]}
            ),
            batch_format="pyarrow",
        )
    )
