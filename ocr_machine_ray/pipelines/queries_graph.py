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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# k-core peeling (graph degeneracy — the standard web-graph pruning that
# strips low-connectivity tendrils before community/quality analysis):
# R synchronized rounds of "drop every node with fewer than K surviving
# neighbors" over a degree-VARIED derived graph (ring + halving tree, so
# peeling actually cascades — the pagerank graph is 6-regular and would be
# a no-op). Each round is ONE hash join (edges alive from the far side)
# plus one groupby with the pagerank presence-marker trick standing in for
# the second join; survivor tables are materialized per round (the ray
# 2.49 two-joins-per-plan rule). Both sides unroll the same R rounds.
# ---------------------------------------------------------------------------
KCORE_K = 4
KCORE_ROUNDS = 3
# same gate + rationale as connected_components' driver path
# (queries_dedup.CC_DRIVER_EDGE_CAP); tests force the BSP path by
# monkeypatching this to 0
KCORE_DRIVER_EDGE_CAP = 4_000_000


def _kcore_sql() -> str:
    dir_edges = ("(SELECT a AS u, b AS w FROM edges "
                 "UNION ALL SELECT b, a FROM edges)")
    rounds = []
    prev = "s0"
    for t in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""d{t} AS (
  SELECT u, count(*) AS deg FROM {dir_edges} e
  JOIN {prev} x ON e.w = x.v JOIN {prev} y ON e.u = y.v GROUP BY u
),
s{t} AS (SELECT u AS v FROM d{t} WHERE deg >= {KCORE_K})"""
        )
        prev = f"s{t}"
    body = ",\n".join(rounds)
    return f"""
WITH nodes AS (SELECT doc_id AS v FROM documents),
n AS (SELECT count(*) AS n FROM nodes),
raw AS (
  SELECT v AS a, (v + 1) % (SELECT n FROM n) AS b FROM nodes
  UNION ALL
  SELECT v AS a, v // 2 AS b FROM nodes WHERE v > 0
),
edges AS (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
  FROM raw WHERE a <> b
),
s0 AS (SELECT v FROM nodes),
{body}
SELECT v AS doc_id FROM {prev}
"""


@query("kcore_survivors", _kcore_sql())
def q_kcore_survivors(sf_dir: str):
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    empty = pa.table({"doc_id": pa.array([], type=pa.int64())})
    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs == 0:
        return empty
    if n_docs < 32:
        # degenerate shards: tiny graphs hit the empty-join-side trap;
        # identical algorithm on the driver
        import pyarrow.parquet as pq_mod

        ids = pq_mod.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = set(int(v) for v in ids)
        N = len(ids)
        edges = set()
        for v in nodes:
            for b in ((v + 1) % N, v // 2 if v > 0 else None):
                if b is not None and b != v:
                    edges.add((min(v, b), max(v, b)))
        surv = set(nodes)
        for _ in range(KCORE_ROUNDS):
            deg: dict[int, int] = {}
            for a, b in edges:
                if a in surv and b in surv:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
            surv = {v for v in surv if deg.get(v, 0) >= KCORE_K}
        return pa.table(
            {"doc_id": pa.array(sorted(surv), type=pa.int64())}
        )

    docs = read_documents(sf_dir, ["doc_id"])
    N = n_docs

    def raw_edges(batch: pa.Table) -> pa.Table:
        v = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_b = (v + 1) % N
        tree_v = v[v > 0]
        a = np.concatenate([v, tree_v])
        b = np.concatenate([ring_b, tree_v // 2])
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table(
            {
                "doc_a": pa.array(lo[keep]),
                "doc_b": pa.array(hi[keep]),
            }
        )

    from .queries_dedup import _distinct_pairs

    edges = (
        _distinct_pairs(
            docs.map_batches(
                raw_edges, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .map_batches(
            lambda t: pa.table({"u": t["doc_a"], "w": t["doc_b"]}),
            batch_format="pyarrow",
        )
        .repartition(8)
        .materialize()
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, w])),
                "w": pa.array(np.concatenate([w, u])),
            }
        )

    # small/medium graphs: peel on the driver over the streamed distinct
    # edge list — vectorized np.bincount rounds, no per-round join fixed
    # cost (same gate + rationale as connected_components' driver path,
    # queries_dedup.py CC_DRIVER_EDGE_CAP). Above the cap the BSP
    # marker-trick rounds below carry the load with zero driver state.
    n_edges = edges.count()
    if n_edges <= KCORE_DRIVER_EDGE_CAP:
        us, ws = [], []
        for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
            us.append(b["u"].to_numpy(zero_copy_only=False))
            ws.append(b["w"].to_numpy(zero_copy_only=False))
        u = np.concatenate(us) if us else np.empty(0, dtype=np.int64)
        w = np.concatenate(ws) if ws else np.empty(0, dtype=np.int64)
        nodes = np.unique(np.concatenate([u, w]))
        iu = np.searchsorted(nodes, u)
        iw = np.searchsorted(nodes, w)
        surv = np.ones(len(nodes), dtype=bool)
        for _ in range(KCORE_ROUNDS):
            live = surv[iu] & surv[iw]
            deg = np.bincount(iu[live], minlength=len(nodes))
            deg += np.bincount(iw[live], minlength=len(nodes))
            surv = surv & (deg >= KCORE_K)
        return pa.table(
            {"doc_id": pa.array(nodes[surv], type=pa.int64())}
        )

    dir_edges = edges.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(8).materialize()

    survivors = docs.map_batches(
        lambda t: pa.table({"v": t["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow",
    ).repartition(4).materialize()

    for _ in range(KCORE_ROUNDS):
        alive = dir_edges.join(
            survivors,
            join_type="inner",
            num_partitions=8,
            on=("w",),
            right_on=("v",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"].cast(pa.int64()),
                    "deg": pa.array(
                        np.ones(len(t), dtype=np.int64)
                    ),
                    "marker": pa.array(np.zeros(len(t), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        markers = survivors.map_batches(
            lambda t: pa.table(
                {
                    "u": t["v"].cast(pa.int64()),
                    "deg": pa.array(np.zeros(len(t), dtype=np.int64)),
                    "marker": pa.array(np.ones(len(t), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        survivors = (
            alive.union(markers)
            .groupby("u")
            .aggregate(
                Sum("deg", alias_name="deg"),
                Max("marker", alias_name="marker"),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "v": t.filter(
                            pc.and_(
                                pc.equal(t["marker"], 1),
                                pc.greater_equal(t["deg"], KCORE_K),
                            )
                        )["u"].cast(pa.int64())
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(4)
            .materialize()
        )

    return survivors.map_batches(
        lambda t: pa.table({"doc_id": t["v"]}), batch_format="pyarrow"
    )
