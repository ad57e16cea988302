"""Driver-checked queries: dedup family (exact, MinHash+LSH, SimHash,
n-gram Jaccard via prefix filtering, embedding-cosine near-dup via sign-bit
LSH buckets, connected-component duplicate clusters).

Every pipeline here is fully distributed: candidate generation is a
groupby over bucket keys (band keys, prefix tokens, sign codes), candidate
verification happens INSIDE the bucket groups (the member sets ride along
with the bucket rows), and nothing materializes the corpus — or the pair
set — on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import FlatTokens
from ..functions.dedup import (
    BAND_SIZE,
    BUCKET_CAP,
    MINHASH_A,
    MINHASH_B,
    MINHASH_SEEDS,
    SHINGLE_N,
    bucket_pairs,
    content_hash_batch,
    minhash_bands_batch,
    minhash_bands_shingles_batch,
    prefix_rows_batch,
    shingle_jaccard,
    simhash_batch,
)
from ..registry import query
from .extraction import read_documents

# ---------------------------------------------------------------------------
# Exact dedup: hash-partition on content hash, keep min(doc_id) per group.
# ---------------------------------------------------------------------------
_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       CAST(min(doc_id) AS BIGINT) AS keeper,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
"""


@query("dedup_exact", _EXACT_SQL)
def q_dedup_exact(sf_dir: str):
    from ray.data.aggregate import Count, Min

    hashed = read_documents(sf_dir).map_batches(
        content_hash_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keeper"), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash signatures -> LSH band keys (the shuffle key for near-dedup).
# Hash family: one md5 per shingle -> uint64 base h, then permutation i is
# (A[i]*h + B[i]) mod 2^64 (universal hashing — vectorizes to one numpy
# multiply-add instead of k salted digests per shingle). The SQL below
# evaluates the identical arithmetic in HUGEINT.
# ---------------------------------------------------------------------------
_SEED_VALUES = ", ".join(
    f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]})" for i in range(MINHASH_SEEDS)
)

_SHINGLE_CTE = f"""
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), 1) AS i,
         len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS n
  FROM documents
),
shingles AS (
  SELECT DISTINCT t1.doc_id,
         t1.tok || ' ' || t2.tok || ' ' || t3.tok AS sh
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
  UNION
  SELECT doc_id,
         array_to_string(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+'), ' ') AS sh
  FROM documents
  WHERE text IS NOT NULL
    AND len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) < {SHINGLE_N}
),
seeds AS (SELECT * FROM (VALUES {_SEED_VALUES}) AS t(seed, a, b)),
minhashes AS (
  SELECT doc_id, seed,
         min(CAST((CAST(a AS HUGEINT)
                   * CAST(('0x' || substr(md5(sh), 1, 16))::UBIGINT AS HUGEINT)
                   + CAST(b AS HUGEINT)) % 18446744073709551616
                  AS UBIGINT)) AS mh
  FROM shingles CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // {BAND_SIZE} AS band,
         md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_key
  FROM minhashes GROUP BY doc_id, seed // {BAND_SIZE}
)
"""

_MINHASH_BANDS_SQL = f"""
WITH {_SHINGLE_CTE}
SELECT doc_id, CAST(band AS BIGINT) AS band, band_key FROM bands
"""


@query("minhash_bands", _MINHASH_BANDS_SQL)
def q_minhash_bands(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        minhash_bands_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# MinHash LSH dedup end-to-end: band groupby -> bucket-local verify (exact
# shingle Jaccard >= 0.5) -> distinct pairs. The shingle sets travel WITH
# the band rows into the bucket groupby, so verification needs no driver
# index and no second scan of documents.
# ---------------------------------------------------------------------------
MINHASH_VERIFY_T = 0.5

_MINHASH_PAIRS_SQL = f"""
WITH {_SHINGLE_CTE},
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         (SELECT count(*) FROM shingles sa
          JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
          WHERE sa.doc_id = c.doc_a) AS inter,
         (SELECT count(*) FROM shingles WHERE doc_id = c.doc_a) AS na,
         (SELECT count(*) FROM shingles WHERE doc_id = c.doc_b) AS nb
  FROM cands c
)
SELECT doc_a, doc_b FROM verified
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {MINHASH_VERIFY_T}
"""


def _distinct_pairs(pair_ds, a: str = "doc_a", b: str = "doc_b"):
    """Distinct key pairs — a pair can surface in several buckets.

    Pack the (int64, int64) pair into ONE fixed-width binary key (big-
    endian, order-preserving), pre-dedup per batch, then a single-key
    groupby + Count and unpack — arbitrary int64 ids supported, no range
    precondition a bad shard could trip. Measured at sf0.1 (92k pair
    rows, 32 cpus): packed single-key 3.1 s vs 5.2 s for per-pair
    map_groups(head) vs 38.7 s for a two-key groupby().aggregate()
    (ray 2.49's multi-key aggregate path is pathologically slow on many
    small blocks)."""
    from ray.data.aggregate import Count

    def pack(t: pa.Table) -> pa.Table:
        av = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        # two big-endian int64 -> 16-byte rows; np.unique over a void view
        # dedups per batch without Python pairs
        # astype AFTER stacking: column_stack silently reverts per-column
        # big-endian inputs to native order
        raw = np.column_stack([av, bv]).astype(">i8").view(
            np.dtype((np.void, 16))
        )
        uniq = np.unique(raw.ravel())
        return pa.table(
            {"_k": pa.array([bytes(x) for x in uniq], type=pa.binary(16))}
        )

    def unpack(t: pa.Table) -> pa.Table:
        buf = b"".join(t["_k"].to_pylist())
        pairs = np.frombuffer(buf, dtype=">i8").reshape(-1, 2)
        return pa.table(
            {
                a: pa.array(pairs[:, 0].astype(np.int64), type=pa.int64()),
                b: pa.array(pairs[:, 1].astype(np.int64), type=pa.int64()),
            }
        )

    # repartition BEFORE the shuffle: the upstream map_groups emits one
    # tiny block per bucket, and the groupby's per-partition fixed cost is
    # then paid x n_buckets (measured 11.1 s -> 2.5 s at sf0.1 by
    # collapsing 64 tiny blocks to 8). Partition count should track pair
    # VOLUME, not bucket count; 8 is right for the deduped-pair sizes the
    # gate corpora produce — raise alongside cluster size.
    uniq = (
        pair_ds.map_batches(pack, batch_format="pyarrow")
        .repartition(8)
        .groupby("_k")
        .aggregate(Count(alias_name="_n"))
    )
    return uniq.map_batches(unpack, batch_format="pyarrow")


def _verified_shingle_pairs(g: pd.DataFrame) -> pd.DataFrame:
    a, b = bucket_pairs(
        g["doc_id"].to_numpy(), list(g["shingles"]), MINHASH_VERIFY_T
    )
    return pd.DataFrame(
        {"doc_a": a.astype(np.int64), "doc_b": b.astype(np.int64)}
    )


@query("dedup_minhash", _MINHASH_PAIRS_SQL)
def q_dedup_minhash(sf_dir: str):
    """LSH candidates via groupby on (band, band_key), verified with exact
    shingle Jaccard INSIDE the bucket groups (sets carried on the band
    rows) — the full near-dedup pipeline with no driver-side state."""
    def band_rows_packed(batch: pa.Table) -> pa.Table:
        t = minhash_bands_shingles_batch(batch)
        # single packed bucket key (see _jaccard_prefix_rows)
        return pa.table(
            {
                "bkey": pc.binary_join_element_wise(
                    pc.cast(t["band"], pa.string()), t["band_key"], "\x00"
                ),
                "doc_id": t["doc_id"],
                "shingles": t["shingles"],
            }
        )

    from ..stages.buckets import add_hash_bucket, per_key_in_bucket
    from .extraction import parquet_num_rows

    # band buckets are corpus-sized (N_BANDS keys per doc): amortize the
    # per-bucket pandas dispatch over ~256 band keys per group
    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") * 4 // 256)
    bands = read_documents(sf_dir).map_batches(
        band_rows_packed, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = (
        bands.map_batches(
            add_hash_bucket("bkey", n_buckets), batch_format="pyarrow"
        )
        .groupby("_gb")
        .map_groups(
            per_key_in_bucket(_verified_shingle_pairs, "bkey"),
            batch_format="pandas",
        )
    )
    return _distinct_pairs(pairs)


# ---------------------------------------------------------------------------
# SimHash fingerprints.
# ---------------------------------------------------------------------------
_SIMHASH_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> CAST(j AS UBIGINT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS j)
  GROUP BY doc_id, j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0
                       THEN CAST(1 AS HUGEINT) << j
                       ELSE 0 END) AS UBIGINT) AS v
  FROM bits GROUP BY doc_id
)
SELECT doc_id, lower(lpad(to_hex(v), 16, '0')) AS simhash FROM sh
"""


@query("dedup_simhash", _SIMHASH_SQL)
def q_dedup_simhash(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard near-dup pairs — EXACT self-join via prefix
# filtering (AllPairs/PPJoin): each doc emits one row per token in its
# md5-ordered prefix (|A| - ceil(t|A|) + 1 tokens); two sets with
# Jaccard >= t provably share a prefix token, so grouping on
# (lang, prefix-token) yields bounded buckets with exact output — no
# all-pairs over a 5-value language key.
# ---------------------------------------------------------------------------
JACCARD_T = 0.95

_JACCARD_SQL = f"""
WITH ws AS (
  SELECT doc_id, lang,
         list_distinct(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS s
  FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM ws a JOIN ws b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {JACCARD_T}
"""


def _jaccard_prefix_rows(batch: pa.Table) -> pa.Table:
    t = prefix_rows_batch(batch, JACCARD_T, extra_key="lang")
    # pack (lang, ptok) into ONE bucket key: ray 2.49's multi-key
    # groupby/sort path is pathologically slower than single-key on many
    # small blocks (same trap as _distinct_pairs' packed aggregate)
    return pa.table(
        {
            "bkey": pc.binary_join_element_wise(
                t["lang"], t["ptok"], "\x00"
            ),
            "doc_id": t["doc_id"],
            "tokens": t["tokens"],
        }
    )


def _verified_token_pairs(g: pd.DataFrame) -> pd.DataFrame:
    a, b = bucket_pairs(g["doc_id"].to_numpy(), list(g["tokens"]), JACCARD_T)
    return pd.DataFrame(
        {"doc_a": a.astype(np.int64), "doc_b": b.astype(np.int64)}
    )


@query("dedup_ngram_jaccard", _JACCARD_SQL)
def q_dedup_jaccard(sf_dir: str):
    from ..stages.buckets import add_hash_bucket, per_key_in_bucket
    from .extraction import parquet_num_rows

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") * 4 // 256)
    rows = read_documents(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        _jaccard_prefix_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = (
        rows.map_batches(
            add_hash_bucket("bkey", n_buckets), batch_format="pyarrow"
        )
        .groupby("_gb")
        .map_groups(
            per_key_in_bucket(_verified_token_pairs, "bkey"),
            batch_format="pandas",
        )
    )
    return _distinct_pairs(pairs)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: sign-bit LSH buckets (the coordinate signs of
# dimension block t*B..t*B+B-1 form table t's bucket code — deterministic
# and SQL-expressible), exact cosine verification inside each bucket,
# distinct across tables. Candidacy-by-bucket is part of the QUERY
# semantics — both sides compute it identically, so the check is
# value-exact. More bits per table = smaller buckets and lower recall:
# that's the documented scale lever (at 10^12 rows you raise EMB_LSH_BITS,
# not the bucket cap).
# ---------------------------------------------------------------------------
COSINE_T = 0.35
EMB_LSH_BITS = 4
EMB_LSH_TABLES = 4

_EMB_CODE_TERMS = " + ".join(
    f"{1 << i}*(CASE WHEN embedding[t*{EMB_LSH_BITS}+{i + 1}] > 0 "
    "THEN 1 ELSE 0 END)"
    for i in range(EMB_LSH_BITS)
)

_EMB_DUP_SQL = f"""
WITH codes AS (
  SELECT vec_id, embedding, t, {_EMB_CODE_TERMS} AS code
  FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_LSH_TABLES})) AS t)
)
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM codes a JOIN codes b
  ON a.t = b.t AND a.code = b.code AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {COSINE_T}
"""


def _emb_code_rows(batch: pa.Table) -> pa.Table:
    """One row per (vector, table): (t, code, vec_id, embedding)."""
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return pa.table(
            {
                "t": pa.array([], type=pa.int64()),
                "code": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array(
                    [], type=batch.schema.field("embedding").type
                ),
            }
        )
    V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
    weights = (1 << np.arange(EMB_LSH_BITS)).astype(np.int64)
    ts, codes = [], []
    for t in range(EMB_LSH_TABLES):
        block = V[:, t * EMB_LSH_BITS : (t + 1) * EMB_LSH_BITS] > 0
        codes.append(block.astype(np.int64) @ weights)
        ts.append(np.full(len(ids), t, dtype=np.int64))
    emb_col = batch["embedding"]
    if isinstance(emb_col, pa.ChunkedArray):
        emb_col = emb_col.combine_chunks()
    return pa.table(
        {
            "t": pa.array(np.concatenate(ts)),
            "code": pa.array(np.concatenate(codes)),
            "vec_id": pa.array(np.tile(ids, EMB_LSH_TABLES)),
            "embedding": pa.concat_arrays(
                [emb_col] * EMB_LSH_TABLES
            ),
        }
    )


def _verified_cosine_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = g["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    V = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    if len(ids) > BUCKET_CAP:
        # scale guard: degrade to star pairing against the min vec_id
        sims = Vn[1:] @ Vn[0]
        others = ids[1:][sims >= COSINE_T]
        return pd.DataFrame(
            {
                "vec_a": np.full(len(others), ids[0], dtype=np.int64),
                "vec_b": others.astype(np.int64),
            }
        )
    S = Vn @ Vn.T
    ii, jj = np.where(np.triu(S >= COSINE_T, k=1))
    return pd.DataFrame(
        {"vec_a": ids[ii].astype(np.int64), "vec_b": ids[jj].astype(np.int64)}
    )


@query("dedup_embedding", _EMB_DUP_SQL)
def q_dedup_embedding(sf_dir: str):
    import ray.data

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = emb.map_batches(
        _emb_code_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = rows.groupby(["t", "code"]).map_groups(
        _verified_cosine_pairs, batch_format="pandas"
    )
    return _distinct_pairs(pairs, a="vec_a", b="vec_b")


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over near-dup pairs, computed
# entirely as Dataset joins/groupbys — min-label propagation with path
# compression (label doubling), so rounds grow with log(diameter), and the
# only thing the driver ever holds is one convergence scalar per round.
# ---------------------------------------------------------------------------
_CLUSTERS_SQL = f"""
WITH RECURSIVE ws AS (
  SELECT doc_id, lang,
         list_distinct(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS s
  FROM documents WHERE text IS NOT NULL
),
pairs AS (
  SELECT a.doc_id AS pa, b.doc_id AS pb
  FROM ws a JOIN ws b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {JACCARD_T}
),
edges AS (SELECT pa AS a, pb AS b FROM pairs UNION SELECT pb, pa FROM pairs),
nodes AS (SELECT DISTINCT a AS n FROM edges),
cc(n, lbl) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.n WHERE cc.lbl < e.b
)
SELECT n AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
FROM cc GROUP BY n
"""


def _edges_both_dirs(t: pa.Table) -> pa.Table:
    a = t["doc_a"].combine_chunks() if isinstance(t["doc_a"], pa.ChunkedArray) else t["doc_a"]
    b = t["doc_b"].combine_chunks() if isinstance(t["doc_b"], pa.ChunkedArray) else t["doc_b"]
    return pa.table(
        {
            "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
            "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
        }
    )


# Below this many (directed) edges the contracted star partials are small
# enough for a driver-side union-find combine — the same mergeable-partial
# pattern as kmeans_fit's k*d sums. Above it, the join-based label
# propagation below carries the load with no driver state.
CC_DRIVER_EDGE_CAP = 4_000_000


def _local_star_edges(t: pa.Table) -> pa.Table:
    """Block-local CC contraction: vectorized min-label propagation over
    the block's edges (pointer jumping, O(log local-diameter) numpy
    rounds), emitting one (n, lbl) star edge per node. Spanning forests
    are mergeable: the union of per-block stars has exactly the components
    of the union of block edge sets, and each block's output is bounded by
    its distinct-node count, never its edge count."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return pa.table(
            {
                "n": pa.array([], type=pa.int64()),
                "lbl": pa.array([], type=pa.int64()),
            }
        )
    # edges are emitted both-directions globally, but repartition may split
    # the two directions of one pair across blocks: the node universe of
    # THIS block is src ∪ dst, and propagation must run both ways locally
    nodes = np.unique(np.concatenate([src, dst]))
    isrc = np.searchsorted(nodes, src)
    idst = np.searchsorted(nodes, dst)
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        cand = lbl.copy()
        np.minimum.at(cand, idst, lbl[isrc])
        np.minimum.at(cand, isrc, lbl[idst])
        cand = np.minimum(cand, cand[cand])  # pointer jump
        if (cand == lbl).all():
            break
        lbl = cand
    return pa.table(
        {
            "n": pa.array(nodes, type=pa.int64()),
            "lbl": pa.array(nodes[lbl], type=pa.int64()),
        }
    )


def _driver_union_find(star_batches) -> pd.DataFrame:
    """Combine per-block star edges with a union-by-min union-find. Driver
    state is O(nodes in the dup graph) — gated by CC_DRIVER_EDGE_CAP, and
    the dup graph is orders of magnitude smaller than the corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    nodes: set[int] = set()
    for b in star_batches:
        ns = b["n"].to_numpy(zero_copy_only=False)
        ls = b["lbl"].to_numpy(zero_copy_only=False)
        nodes.update(ns.tolist())
        for a, c in zip(ns.tolist(), ls.tolist()):
            if a == c:
                continue
            ra, rc = find(a), find(c)
            if ra != rc:
                # attach the larger root under the smaller: the root IS
                # the component's min id, matching the SQL oracle's label
                if ra < rc:
                    parent[rc] = ra
                else:
                    parent[ra] = rc
    out = sorted(nodes)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out, dtype="int64"),
            "cluster": pd.Series([find(n) for n in out], dtype="int64"),
        }
    )


def connected_components(
    pair_ds, max_rounds: int = 50, driver_edge_cap: int = CC_DRIVER_EDGE_CAP
):
    """Distributed connected components over a (doc_a, doc_b) pair Dataset.

    Small/medium dup graphs (directed edge count <= driver_edge_cap) take
    the ONE-PASS path: each block contracts its edges to star edges
    (`_local_star_edges`, a mergeable spanning-forest partial), and the
    driver folds the streamed stars with a union-find — no join rounds at
    all, so the ray 2.49 per-join fixed cost (~2.5 s/round measured) never
    applies. Above the cap, the iterative join-based label propagation
    below runs with zero driver state.

    Min-label propagation with pointer jumping, ONE hash join per round:
    the label table is re-emitted as synthetic edges (lbl(n) -> n) and
    unioned with the real edges before a single join against the labels,
    so one pass yields both the neighbor candidates (edge u->v gives
    lbl(u) for v) and the path-compression candidates (synthetic edge
    lbl(n)->n gives lbl(lbl(n)) for n). The candidate set is identical to
    the classic propagate+compress pair of joins — it just rides one join
    operator instead of two, which matters because each ray join carries a
    fixed per-operator/per-partition cost that dominates on the (small)
    dup-graph tables. Labels only decrease, so sum(label) is a strictly
    decreasing convergence witness; the driver holds that single scalar
    and never sees the node table. Rounds: O(log diameter).
    """
    from ray.data.aggregate import Min, Sum

    # repartition: pair_ds usually arrives as many tiny bucket blocks, and
    # every round's join/groupby would pay per-partition fixed costs per
    # block (same pathology fixed in _distinct_pairs)
    edges = pair_ds.map_batches(
        _edges_both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(8).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster": pd.Series([], dtype="int64")}
        )
    if n_edges <= driver_edge_cap:
        stars = edges.map_batches(
            _local_star_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        return _driver_union_find(
            stars.iter_batches(batch_size=None, batch_format="pyarrow")
        )
    # shuffle width follows the data: tiny dup graphs shouldn't pay 8
    # partitions of fixed join cost, 10^10-edge graphs shouldn't squeeze
    # through 8 either
    n_parts = int(max(2, min(64, n_edges // 200_000 + 2)))

    def _init_lbl(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "n": t["src"],
                "lbl": pc.min_element_wise(t["src"], t["nbr_min"]),
            }
        )

    # repartition before materializing: hash-aggregate output contains
    # EMPTY schema-less blocks for idle partitions, and a schema-less block
    # on the probe side of a later hash join fails FieldRef resolution
    # inside pyarrow (observed on ray 2.49); repartition concatenates them
    # into schema-bearing blocks. The label table is O(nodes in the dup
    # graph), far smaller than the corpus, so this shuffle is cheap.
    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="nbr_min"))
        .map_batches(_init_lbl, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(4)
        .materialize()
    )
    prev_total = None
    for _ in range(max_rounds):
        # synthetic compression edges lbl(n) -> n: joining them below
        # propagates lbl(lbl(n)) to n (pointer jumping) through the SAME
        # join that propagates neighbor labels over real edges
        lbl_edges = labels.map_batches(
            lambda t: pa.table({"src": t["lbl"], "dst": t["n"]}),
            batch_format="pyarrow",
        )
        cand = (
            edges.union(lbl_edges)
            .join(
                labels,
                join_type="inner",
                num_partitions=n_parts,
                on=("src",),
                right_on=("n",),
            )
            .map_batches(
                lambda t: pa.table({"n": t["dst"], "cand": t["lbl"]}),
                batch_format="pyarrow",
            )
        )
        current = labels.map_batches(
            lambda t: pa.table({"n": t["n"], "cand": t["lbl"]}),
            batch_format="pyarrow",
        )
        # one plan per round: the single join keeps ray 2.49's
        # two-hash-joins-per-plan key-resolution bug out of reach
        labels = (
            current.union(cand)
            .groupby("n")
            .aggregate(Min("cand", alias_name="lbl"))
            .repartition(min(4, n_parts))
            .materialize()
        )
        total = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        if total == prev_total:
            break
        prev_total = total
    return labels


@query("dedup_clusters", _CLUSTERS_SQL)
def q_dedup_clusters(sf_dir: str):
    """Cluster near-duplicate documents: exact Jaccard pairs (prefix-filter
    join) -> Dataset-native connected components."""
    labels = connected_components(q_dedup_jaccard(sf_dir))
    if isinstance(labels, pd.DataFrame):
        return labels
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["n"], "cluster": t["lbl"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new docs (doc_id % 10 >= 8) checked against the
# already-ingested partition's 8-token-prefix fingerprints — the "seen-set"
# gate every incremental ingestion pipeline runs. The seen set is a Bloom
# bitmap (built distributed, one fixed-size bitmap per block, OR-reduced);
# a bloom MISS is definitely-new and short-circuits straight to the output
# with no further work — only bloom HITS (true dups + the fp rate) need an
# exact check. The exact check is a groupby-anti where BOTH sides are
# bloom-pruned first: old fingerprints are filtered through a second bloom
# built over the candidates, so the anti-join shuffle carries only the
# collision neighborhood, never the corpus. At 10^12 docs the full seen
# set never moves — two bitmaps and the (tiny) collision slice do.
# ---------------------------------------------------------------------------
_INC_PREFIX = 8
_INC_LOG2_M = 20

_INC_SQL = f"""
WITH p AS (
  SELECT doc_id,
         md5(array_to_string(
             string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')[1:{_INC_PREFIX}],
             ' ')) AS fp
  FROM documents WHERE text IS NOT NULL
),
old AS (SELECT DISTINCT fp FROM p WHERE doc_id % 10 < 8)
SELECT n.doc_id, n.fp
FROM p n
WHERE n.doc_id % 10 >= 8
  AND NOT EXISTS (SELECT 1 FROM old o WHERE o.fp = n.fp)
"""


@query("incremental_dedup", _INC_SQL)
def q_incremental_dedup(sf_dir: str):
    import hashlib

    import ray

    from ..corpus import FlatTokens
    from ..functions.sketch import bloom_build, bloom_contains
    from .extraction import parquet_num_rows

    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "fp": pa.array([], type=pa.string())}
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    def fp_rows(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        n = len(batch)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ft.counts, out=starts[1:])
        toks = ft.tokens
        fps, keys = [], np.empty(n, dtype=np.uint64)
        for d in range(n):
            head = toks[starts[d]: starts[d] + min(_INC_PREFIX, ft.counts[d])]
            dig = hashlib.md5(" ".join(head).encode()).digest()
            fps.append(dig.hex())
            keys[d] = int.from_bytes(dig[:8], "big")
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp": pa.array(fps, type=pa.string()),
                "key": pa.array(keys.view(np.int64)),
                "is_new": pa.array(ids % 10 >= 8),
            }
        )

    # fp stream is a fixed few dozen bytes/doc — far smaller than the text
    # it derives from; pin it once, consume it four times (at 10^12 scale
    # the alternative is three cheap re-scans — both shapes stream)
    fp_all = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def bloom_of(ds, mask_fn):
        def partial(batch: pa.Table) -> pa.Table:
            b = mask_fn(batch)
            keys = b["key"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"bloom": pa.array([bloom_build(keys, _INC_LOG2_M).tobytes()],
                                   type=pa.binary())}
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        bits = np.zeros((1 << _INC_LOG2_M) // 8, dtype=np.uint8)
        for row in parts:
            bits |= np.frombuffer(row["bloom"], dtype=np.uint8)
        return bits

    old_mask = lambda b: b.filter(pc.invert(b["is_new"]))  # noqa: E731
    seen_ref = ray.put(bloom_of(fp_all, old_mask))

    def probe(batch: pa.Table, want_hit: bool) -> pa.Table:
        bits = ray.get(seen_ref)
        new = batch.filter(batch["is_new"])
        hit = bloom_contains(
            bits, new["key"].to_numpy(zero_copy_only=False), _INC_LOG2_M
        )
        sel = new.filter(pa.array(hit if want_hit else ~hit))
        return sel.select(["doc_id", "fp", "key"])

    definite_new = fp_all.map_batches(
        lambda b: probe(b, False).select(["doc_id", "fp"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cand = fp_all.map_batches(
        lambda b: probe(b, True), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # collision slice: true dups + bloom fp rate
    if cand.count() == 0:
        return definite_new

    cand_ref = ray.put(bloom_of(cand, lambda b: b))

    def old_pruned(batch: pa.Table) -> pa.Table:
        bits = ray.get(cand_ref)
        old = batch.filter(pc.invert(batch["is_new"]))
        hit = bloom_contains(
            bits, old["key"].to_numpy(zero_copy_only=False), _INC_LOG2_M
        )
        sel = old.filter(pa.array(hit))
        return pa.table(
            {
                "doc_id": sel["doc_id"],
                "fp": sel["fp"],
                "side": pa.array(np.zeros(len(sel), dtype=np.int64)),
            }
        )

    old_side = fp_all.map_batches(
        old_pruned, batch_format="pyarrow", zero_copy_batch=True
    )
    new_side = cand.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "fp": b["fp"],
             "side": pa.array(np.ones(len(b), dtype=np.int64))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)

    from ..stages.buckets import add_hash_bucket

    add_fb = add_hash_bucket("fp", n_buckets, out="_fb")

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # per-fp anti-join across the bucket: a segment with ANY old-side
        # row emits nothing, else its new-side rows survive
        fp = g["fp"].to_numpy(dtype=object)
        side = g["side"].to_numpy().astype(np.int64)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc, fp))
        f, s, d = fp[order], side[order], doc[order]
        change = np.r_[True, f[1:] != f[:-1]]
        seg = np.cumsum(change) - 1
        has_old = np.zeros(int(seg[-1]) + 1 if len(seg) else 0, dtype=bool)
        np.logical_or.at(has_old, seg, s == 0)
        keep = (s == 1) & ~has_old[seg]
        return pd.DataFrame(
            {"doc_id": d[keep], "fp": pd.Series(f[keep], dtype="string")}
        )

    survivors = (
        new_side.union(old_side)
        .map_batches(add_fb, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(anti_bucket, batch_format="pandas")
        .repartition(4)  # collapse one-block-per-group before the union
    )
    return definite_new.union(survivors)


# ---------------------------------------------------------------------------
# Segment-level (line-level) corpus dedup — the RefinedWeb / CCNet "remove
# exactly-duplicated lines across documents" pass. The synthetic corpus has
# no newlines, so a "line" is a fixed W-token segment (the repo's chunking
# convention, reference analog: `fake_scan.py` page chunking). Any segment
# occurring in >= _SEG_MIN_DOCS distinct documents is removed from every
# document, and each document's text is rebuilt from its surviving
# segments in order.
#
# Fully distributed shape (nothing corpus-sized on the driver):
#   1. per-batch partial distinct-doc counts per segment  -> groupby(seg)
#   2. dup set = segments with nd >= K   (small vs corpus, stays a Dataset)
#   3. exploded (doc_id, seg_no, seg) LEFT-SEMI join dup  -> removed pairs
#   4. removed pairs -> per-doc removed seg_no list (groupby, tiny groups)
#   5. documents LEFT-OUTER hash join removed lists; batch-local vectorized
#      rebuild (ListArray offsets + one binary_join) emits clean text.
# The dup-segment set is joined, never broadcast: on a real web corpus
# (boilerplate lines) it is proportional to the corpus, so a ray.put
# broadcast would be the scale mistake.
# ---------------------------------------------------------------------------
_SEG_W = 4
_SEG_MIN_DOCS = 2
# duplicated-segment tables below this row count broadcast as a filter set
# (ray.put once) instead of a corpus-wide semi join
SEG_DUP_BROADCAST_CAP = 5_000_000

_SEG_TRIM = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"

_SEG_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text, {_SEG_TRIM}), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
),
seg AS (
  SELECT doc_id, CAST(k AS BIGINT) AS seg_no,
         array_to_string(w[k*{_SEG_W}+1 : (k+1)*{_SEG_W}], ' ') AS seg
  FROM d, LATERAL (
    SELECT unnest(range(CAST(ceil(len(w) / {_SEG_W}.0) AS BIGINT))) AS k
  ) t
),
dup AS (
  SELECT seg FROM seg GROUP BY seg
  HAVING count(DISTINCT doc_id) >= {_SEG_MIN_DOCS}
)
SELECT s.doc_id,
       COALESCE(
         string_agg(s.seg, ' ' ORDER BY s.seg_no)
           FILTER (WHERE dup.seg IS NULL),
         '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(count(dup.seg) AS BIGINT) AS n_removed
FROM seg s LEFT JOIN dup ON s.seg = dup.seg
GROUP BY s.doc_id
"""


def _segment_table(batch: pa.Table) -> pa.Table:
    """Explode a documents batch into (doc_id, seg_no, seg) rows.

    One monotone offsets vector over the flat token array -> a single
    C-level binary_join builds every segment string (no Python per row).
    """
    ft = FlatTokens(batch)
    counts = ft.counts.astype(np.int64)
    n_segs = -(-counts // _SEG_W)
    doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_segs)
    cum = np.concatenate([[0], np.cumsum(n_segs)])
    k = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1], n_segs)
    tok_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    offsets = np.append(tok_start[doc_rep] + k * _SEG_W, counts.sum())
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), ft.tokens_arrow
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(doc_rep)),
            "seg_no": pa.array(k),
            "seg": pc.binary_join(lists, " "),
        }
    )


def _seg_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial distinct-doc counts per segment (combiner step:
    only (seg, nd_part) rows reach the shuffle). Exact because one row is
    one whole document, so a doc never spans batches."""
    segs = _segment_table(batch)
    pairs = segs.group_by(["doc_id", "seg"]).aggregate([])  # distinct pairs
    out = pairs.group_by("seg").aggregate([("doc_id", "count")])
    return pa.table(
        {
            "seg": out["seg"],
            "nd_part": out["doc_id_count"].cast(pa.int64()),
        }
    )


def _max_nchars_stat(sf_dir: str) -> int | None:
    """Corpus-wide n_chars max from parquet row-group statistics — a
    metadata read, no data scan. None when stats are absent."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        md = pq.read_metadata(path)
        idx = md.schema.to_arrow_schema().get_field_index("n_chars")
        if idx < 0 or md.num_row_groups == 0:
            return None
        vals = []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            vals.append(int(st.max))
        return max(vals)
    except Exception:
        return None


def _seg_rebuild(batch: pa.Table) -> pa.Table:
    """Batch-local text rebuild: drop tokens of removed segments, one
    binary_join per batch. The removed-set arrives either as ``m_<w>``
    int64 bitmask columns (63 seg bits per word; fully vectorized decode)
    or as a comma-joined ``removed`` string list (fallback for corpora
    whose docs exceed the mask budget); null for untouched docs."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "clean_text": pa.array([], type=pa.string()),
                "n_segs": pa.array([], type=pa.int64()),
                "n_removed": pa.array([], type=pa.int64()),
            }
        )
    ft = FlatTokens(batch)
    counts = ft.counts.astype(np.int64)
    seg_idx = (ft.i - 1) // _SEG_W
    row_off = np.concatenate([[0], np.cumsum(counts)])
    keep = np.ones(int(counts.sum()), dtype=bool)
    n_removed = np.zeros(len(batch), dtype=np.int64)
    mask_cols = sorted(
        (c for c in batch.column_names if c.startswith("m_")),
        key=lambda c: int(c[2:]),
    )
    if mask_cols:
        # vectorized: token kept unless its segment's bit is set in the
        # owning doc's mask word
        masks = np.stack(
            [
                np.nan_to_num(
                    batch[c].to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                ).astype(np.int64)
                for c in mask_cols
            ],
            axis=1,
        )  # (n_docs, n_words); nulls (untouched docs) -> 0
        word = seg_idx // 63
        bit = seg_idx - word * 63
        tok_mask = masks[ft.row_idx, word]
        keep = ((tok_mask >> bit) & 1) == 0
        # popcount per doc for the removed-count accounting
        for w in range(masks.shape[1]):
            m = masks[:, w].copy()
            while m.any():
                n_removed += m & 1
                m >>= 1
    else:
        removed = (
            batch["removed"].to_pylist()
            if "removed" in batch.column_names
            else [None] * len(batch)
        )
        for r, rem in enumerate(removed):
            if rem is None or rem == "":
                continue
            nos = np.fromiter(
                (int(x) for x in rem.split(",")), dtype=np.int64
            )
            n_removed[r] = len(nos)
            sl = slice(row_off[r], row_off[r + 1])
            keep[sl] = ~np.isin(seg_idx[sl], nos)
    kept_counts = np.bincount(
        ft.row_idx[keep], minlength=len(batch)
    ).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        ft.tokens_arrow.filter(pa.array(keep)),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": pc.binary_join(lists, " "),
            "n_segs": pa.array(-(-counts // _SEG_W)),
            "n_removed": pa.array(n_removed),
        }
    )


@query("segment_dedup", _SEG_DEDUP_SQL)
def q_segment_dedup(sf_dir: str):
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "documents") == 0:
        return _seg_rebuild(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )

    docs = read_documents(sf_dir, ["doc_id", "text"])

    dup = (
        docs.map_batches(
            _seg_count_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("seg")
        .aggregate(Sum("nd_part", alias_name="nd"))
        .map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["nd"], _SEG_MIN_DOCS)
            ).select(["seg"]),
            batch_format="pyarrow",
        )
        # hash-aggregate emits empty schema-less blocks for idle partitions;
        # collapse them before this table becomes a join side
        .repartition(4)
        .materialize()
    )

    n_dup = dup.count()
    if n_dup == 0:
        # no duplicated segment anywhere: rebuild is a pure normalization
        return docs.map_batches(
            _seg_rebuild, batch_format="pyarrow", zero_copy_batch=True
        )

    seg_stream = docs.map_batches(
        _segment_table, batch_format="pyarrow", zero_copy_batch=True
    )
    if n_dup <= SEG_DUP_BROADCAST_CAP:
        # the duplicated-segment table is SMALL (segments shared by >=
        # _SEG_MIN_DOCS docs): broadcast it as a filter set instead of
        # pushing the whole corpus segment stream through a semi join
        import ray as _ray

        dup_ref = _ray.put(set(dup.to_pandas()["seg"].tolist()))

        def semi_filter(t: pa.Table) -> pa.Table:
            import ray

            s = ray.get(dup_ref)
            keep = np.fromiter(
                (x in s for x in t["seg"].to_pylist()), dtype=bool,
                count=len(t),
            )
            return t.filter(pa.array(keep))

        removed_pairs = seg_stream.map_batches(
            semi_filter, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        removed_pairs = seg_stream.join(
            dup, join_type="left_semi", num_partitions=16, on=("seg",)
        )

    # removed-set packing: multi-word int64 bitmask when the parquet
    # n_chars stats bound the per-doc segment count (tokens <=
    # (n_chars+1)/2), else the string-list map_groups fallback. The mask
    # path replaces a per-doc map_groups (one block per group + pandas
    # per group) with a plain Sum aggregate — segment rows are positional,
    # hence distinct, so bit sums never double-set.
    mx_chars = _max_nchars_stat(sf_dir)
    n_words = (
        ((((mx_chars + 1) // 2) + _SEG_W - 1) // _SEG_W) // 63 + 1
        if mx_chars is not None
        else None
    )
    if n_words is not None and n_words <= 8:
        m_cols = [f"m_{w}" for w in range(n_words)]

        def to_bits(t: pa.Table) -> pa.Table:
            seg_no = t["seg_no"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            word = seg_no // 63
            bits = np.zeros((len(t), n_words), dtype=np.int64)
            rows = np.arange(len(t))
            bits[rows, word] = np.int64(1) << (seg_no - word * 63)
            out = {"doc_id": t["doc_id"]}
            for w, c in enumerate(m_cols):
                out[c] = pa.array(bits[:, w])
            return pa.table(out)

        # materialized: two hash joins in one streaming plan mis-resolve
        # key columns on ray 2.49; this table is O(affected docs)
        removed_lists = (
            removed_pairs.map_batches(to_bits, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(*[Sum(c, alias_name=c) for c in m_cols])
            .repartition(4)
            .materialize()
        )
    else:

        def _removed_lists_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # per-doc sorted seg lists across a doc-prefix bucket: one
            # lexsort, per-segment joins (join is inherent; the ~0.6-3 ms
            # per-doc map_groups dispatch is not)
            doc = g["doc_id"].to_numpy().astype(np.int64)
            seg_no = g["seg_no"].to_numpy().astype(np.int64)
            order = np.lexsort((seg_no, doc))
            d, s = doc[order], seg_no[order]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            ends = np.r_[starts[1:], len(d)]
            return pd.DataFrame(
                {
                    "doc_id": d[starts],
                    "removed": [
                        ",".join(map(str, s[a:b]))
                        for a, b in zip(starts, ends)
                    ],
                }
            )

        removed_lists = (
            removed_pairs.map_batches(
                lambda t: t.append_column(
                    "_db",
                    pa.array(
                        t["doc_id"]
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                        >> 8
                    ),
                ),
                batch_format="pyarrow",
            )
            .groupby("_db")
            .map_groups(_removed_lists_bucket, batch_format="pandas")
            .repartition(4)
            .materialize()
        )

    # join width follows corpus size: a 5k-doc gate corpus shouldn't pay
    # 16 partitions of fixed join cost, a 10^12-doc one shouldn't get 2
    n_docs = parquet_num_rows(sf_dir, "documents")
    out = docs.join(
        removed_lists,
        join_type="left_outer",
        num_partitions=int(max(2, min(64, n_docs // 100_000 + 2))),
        on=("doc_id",),
    )
    return out.map_batches(
        _seg_rebuild, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup (record-linkage style): block on the 8-char text
# prefix, length-band inside the block, verify candidates with a unit-cost
# Levenshtein over the 64-char head. Blocking + banding keep the pair set
# linear-ish in corpus size; verification is the all-pairs-in-lockstep
# numpy DP (functions/dedup.py:levenshtein_many). At web scale a hot
# prefix block degrades via the same BUCKET_CAP star-pairing defense the
# MinHash path uses; this query keeps every pair so the SQL oracle (same
# blocking predicates, DuckDB levenshtein) is value-exact.
# ---------------------------------------------------------------------------
_EDIT_PREFIX = 8
_EDIT_HEAD = 64
_EDIT_MAX_DIST = 16
_EDIT_LEN_BAND = 16

_EDIT_SQL = f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {_EDIT_HEAD}) AS t64,
         substr(text, 1, {_EDIT_PREFIX}) AS p8, length(text) AS n
  FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.t64, b.t64) AS BIGINT) AS dist
FROM d a JOIN d b
  ON a.p8 = b.p8 AND a.doc_id < b.doc_id
 AND abs(a.n - b.n) <= {_EDIT_LEN_BAND}
WHERE levenshtein(a.t64, b.t64) <= {_EDIT_MAX_DIST}
"""


@query("dedup_edit_distance", _EDIT_SQL)
def q_dedup_edit_distance(sf_dir: str):
    from ..functions.dedup import levenshtein_many
    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    def project(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        # corpus contract: ASCII text, so codeunit slices == char slices
        # == DuckDB substr; utf8_length is char length == len(text)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "p8": pc.utf8_slice_codeunits(text, 0, _EDIT_PREFIX),
                "n": pc.utf8_length(text).cast(pa.int64()),
                "t64": pc.utf8_slice_codeunits(text, 0, _EDIT_HEAD),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        n = g["n"].to_numpy()
        heads = g["t64"].tolist()
        ii, jj = np.triu_indices(len(g), k=1)
        keep = np.abs(n[ii] - n[jj]) <= _EDIT_LEN_BAND
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return pd.DataFrame(
                {
                    "doc_a": np.zeros(0, dtype=np.int64),
                    "doc_b": np.zeros(0, dtype=np.int64),
                    "dist": np.zeros(0, dtype=np.int64),
                }
            )
        d = levenshtein_many(
            [heads[i] for i in ii], [heads[j] for j in jj]
        )
        m = d <= _EDIT_MAX_DIST
        return pd.DataFrame(
            {
                "doc_a": ids[ii[m]],
                "doc_b": ids[jj[m]],
                "dist": d[m].astype(np.int64),
            }
        )

    from ..stages.buckets import add_hash_bucket, per_key_in_bucket
    from .extraction import parquet_num_rows

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)
    return (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_hash_bucket("p8", n_buckets), batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(per_key_in_bucket(pairs, "p8"), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Incremental NEAR-dup across snapshots (the cross-dump dedup RefinedWeb
# runs between CommonCrawl dumps): the "seen" corpus is docs with even
# doc_id, the new dump is the odd docs, and each new doc is flagged when
# any band bucket holds a seen doc whose exact shingle Jaccard clears the
# MinHash verify threshold. Complements incremental_dedup (exact seen-set
# Bloom gate) with the near-dup variant: same band shuffle as
# dedup_minhash, but verification is CROSS-partition only (new x seen —
# never seen x seen or new x new), with early exit per new doc and the
# BUCKET_CAP anchor degradation above the cap. One band groupby + one
# Max-union groupby; no joins.
# ---------------------------------------------------------------------------
_INC_NEARDUP_SQL = f"""
WITH {_SHINGLE_CTE},
cands AS (
  SELECT DISTINCT b.doc_id AS new_doc, a.doc_id AS seen_doc
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
),
verified AS (
  SELECT c.new_doc,
         (SELECT count(*) FROM shingles sa
          JOIN shingles sb ON sb.doc_id = c.new_doc AND sb.sh = sa.sh
          WHERE sa.doc_id = c.seen_doc) AS inter,
         (SELECT count(*) FROM shingles WHERE doc_id = c.seen_doc) AS na,
         (SELECT count(*) FROM shingles WHERE doc_id = c.new_doc) AS nb
  FROM cands c
),
dups AS (
  SELECT DISTINCT new_doc FROM verified
  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {MINHASH_VERIFY_T}
)
SELECT d.doc_id,
       CAST(CASE WHEN dups.new_doc IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS is_dup
FROM documents d LEFT JOIN dups ON dups.new_doc = d.doc_id
WHERE d.doc_id % 2 = 1 AND d.text IS NOT NULL
"""


def _cross_dup_hits(g: pd.DataFrame) -> pd.DataFrame:
    """One band bucket -> new docs with a verified seen partner. Early exit
    per new doc; above BUCKET_CAP only the min-id seen doc anchors the
    verification (same degradation contract as bucket_pairs)."""
    ids = g["doc_id"].to_numpy().astype(np.int64)
    seen_mask = ids % 2 == 0
    new_ids = ids[~seen_mask]
    if len(new_ids) == 0 or not seen_mask.any():
        return pd.DataFrame({"doc_id": np.empty(0, dtype=np.int64)})
    sets = [set(s) for s in g["shingles"]]
    seen_sets = [s for s, m in zip(sets, seen_mask) if m]
    new_sets = [s for s, m in zip(sets, seen_mask) if not m]
    if len(ids) > BUCKET_CAP:
        anchor_i = int(np.argmin(ids[seen_mask]))
        seen_sets = [seen_sets[anchor_i]]
    hits = [
        d
        for d, s in zip(new_ids, new_sets)
        if any(shingle_jaccard(s, ss) >= MINHASH_VERIFY_T for ss in seen_sets)
    ]
    return pd.DataFrame({"doc_id": np.asarray(hits, dtype=np.int64)})


@query("incremental_neardup", _INC_NEARDUP_SQL)
def q_incremental_neardup(sf_dir: str):
    from ray.data.aggregate import Max

    from .extraction import parquet_num_rows

    def band_rows_packed(batch: pa.Table) -> pa.Table:
        t = minhash_bands_shingles_batch(batch)
        return pa.table(
            {
                "bkey": pc.binary_join_element_wise(
                    pc.cast(t["band"], pa.string()), t["band_key"], "\x00"
                ),
                "doc_id": t["doc_id"],
                "shingles": t["shingles"],
            }
        )

    docs = read_documents(sf_dir)
    bands = docs.map_batches(
        band_rows_packed, batch_format="pyarrow", zero_copy_batch=True
    )

    def hit_rows(g: pd.DataFrame) -> pa.Table:
        out = _cross_dup_hits(g)
        return pa.table(
            {
                "doc_id": pa.array(
                    out["doc_id"].to_numpy().astype(np.int64)
                ),
                "is_dup": pa.array(
                    np.ones(len(out), dtype=np.int64)
                ),
            }
        )

    from ..stages.buckets import add_hash_bucket, per_key_in_bucket

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") * 4 // 256)
    hits = (
        bands.map_batches(
            add_hash_bucket("bkey", n_buckets), batch_format="pyarrow"
        )
        .groupby("_gb")
        .map_groups(
            per_key_in_bucket(hit_rows, "bkey"), batch_format="pandas"
        )
        .repartition(8)
    )

    def new_doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        new = ids[ids % 2 == 1]
        return pa.table(
            {
                "doc_id": pa.array(new),
                "is_dup": pa.array(np.zeros(len(new), dtype=np.int64)),
            }
        )

    base = docs.map_batches(
        new_doc_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        hits.union(base)
        .groupby("doc_id")
        .aggregate(Max("is_dup", alias_name="is_dup"))
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram (the one-slide dedup report: how much
# of the corpus is singletons vs 2x vs heavy clusters). Rides the exact
# dedup aggregate and adds one tiny histogram aggregate over its
# (hash, n_copies) output — cluster sizes are the only thing that
# shuffles twice, and the second key space is the histogram support.
# ---------------------------------------------------------------------------
_DUP_HIST_SQL = """
WITH groups AS (
  SELECT md5(text) AS h, count(*) AS n_copies
  FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
)
SELECT CAST(n_copies AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(n_copies) AS BIGINT) AS n_docs
FROM groups GROUP BY n_copies
"""


@query("dup_size_histogram", _DUP_HIST_SQL)
def q_dup_size_histogram(sf_dir: str):
    """Does NOT ride q_dedup_exact's plan (r3 regression: re-using that
    query's lineage re-executed its full keeper aggregate for a histogram
    that needs neither doc_id nor the Min): a text-only pruned read, a
    per-batch (hash, count) pre-aggregate BEFORE the shuffle, one Sum
    groupby per content hash, then the tiny histogram aggregate."""
    from ray.data.aggregate import Sum

    def hash_counts(batch: pa.Table) -> pa.Table:
        hashed = content_hash_batch(batch)
        # '|' separator convention not needed: md5 hexdigests are NUL-free
        h = np.asarray(hashed["content_hash"].to_pylist())
        vals, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "content_hash": pa.array(vals.tolist(), type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    groups = (
        read_documents(sf_dir, ["text"])
        .map_batches(
            hash_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("content_hash")
        .aggregate(Sum("n", alias_name="n_copies"))
    )

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "cluster_size": pa.array([], type=pa.int64()),
                    "n_clusters": pa.array([], type=pa.int64()),
                    "n_docs": pa.array([], type=pa.int64()),
                }
            )
        n = batch["n_copies"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(vals),
                "n_clusters": pa.array(cnt.astype(np.int64)),
                "n_docs": pa.array((vals * cnt).astype(np.int64)),
            }
        )

    return (
        groups.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(
            Sum("n_clusters", alias_name="n_clusters"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split: duplicate CLUSTERS are the split
# unit, not documents. A naive per-doc hash split leaks training text into
# the eval sets whenever a duplicate pair straddles the boundary — the
# classic train/test contamination path in web-scale corpora. Here every
# doc inherits its exact-dup cluster keeper (min doc_id per content hash)
# and the split is a Knuth-hash of the KEEPER, so a cluster lands in one
# split atomically. Same mod-safe hash form as stratified_sample
# (queries_text.py:600) — no int64/BIGINT overflow at any doc_id.
# One aggregate shuffle + one hash join; nothing touches the driver.
# ---------------------------------------------------------------------------
_LEAK_KNUTH_RED = 2654435761 % 1000  # 761
LEAK_BCAST_CAP = 5_000_000  # distinct hashes above this: join, not broadcast

_LEAK_SPLIT_SQL = f"""
WITH hashed AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE text IS NOT NULL
),
keepers AS (
  SELECT h, min(doc_id) AS keeper_doc FROM hashed GROUP BY h
)
SELECT hd.doc_id,
       CAST(k.keeper_doc AS BIGINT) AS keeper_doc,
       CASE WHEN ((k.keeper_doc % 1000) * {_LEAK_KNUTH_RED}) % 1000 < 700
              THEN 'train'
            WHEN ((k.keeper_doc % 1000) * {_LEAK_KNUTH_RED}) % 1000 < 850
              THEN 'val'
            ELSE 'test' END AS split
FROM hashed hd JOIN keepers k ON hd.h = k.h
"""


@query("leakage_safe_split", _LEAK_SPLIT_SQL)
def q_leakage_safe_split(sf_dir: str):
    from ray.data.aggregate import Min

    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "documents") == 0:
        # empty input would put schema-less blocks on the join probe side
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "keeper_doc": pa.array([], type=pa.int64()),
                "split": pa.array([], type=pa.string()),
            }
        )

    hashed = read_documents(sf_dir).map_batches(
        content_hash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "content_hash"])
    keepers = (
        hashed.groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keeper_doc"))
        # hash-aggregate emits empty schema-less blocks that break FieldRef
        # on the join probe side (ray 2.49) — collapse them first
        .repartition(8)
        .materialize()  # consumed twice (size gate + rows/probe side)
    )

    def _splits(k: np.ndarray) -> np.ndarray:
        bucket = ((k % 1000) * _LEAK_KNUTH_RED) % 1000
        return np.where(
            bucket < 700, "train", np.where(bucket < 850, "val", "test")
        )

    if keepers.count() <= LEAK_BCAST_CAP:
        # keeper map fits the broadcast gate: ship it once and skip the
        # hash join (the join path carries larger corpora unchanged)
        import ray as _ray

        kp = keepers.to_pandas()
        ref = _ray.put(
            dict(zip(kp["content_hash"], kp["keeper_doc"].astype("int64")))
        )

        def assign_bcast(batch: pa.Table) -> pa.Table:
            import ray

            lut = ray.get(ref)
            k = np.fromiter(
                (lut[h] for h in batch["content_hash"].to_pylist()),
                dtype=np.int64, count=batch.num_rows,
            )
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "keeper_doc": pa.array(k, type=pa.int64()),
                    "split": pa.array(
                        _splits(k).tolist(), type=pa.string()
                    ),
                }
            )

        return hashed.map_batches(
            assign_bcast, batch_format="pyarrow", zero_copy_batch=True
        )

    joined = hashed.join(
        keepers,
        join_type="inner",
        num_partitions=8,
        on=("content_hash",),
    )

    def assign(batch: pa.Table) -> pa.Table:
        k = batch["keeper_doc"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "keeper_doc": pa.array(k, type=pa.int64()),
                "split": pa.array(
                    _splits(k).tolist(), type=pa.string()
                ),
            }
        )

    return joined.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup accounting: chunk boundaries from a
# gear-style rolling hash over the text, so an insertion/deletion only
# perturbs boundaries NEAR the edit and every downstream chunk re-aligns —
# the property that makes CDC the storage-layer dedup primitive (LBFS,
# restic, borg; FastCDC 2016). This variant keeps the window NON-resetting
# across boundaries, which makes boundaries purely content-local AND the
# whole rule SQL-expressible: with boundary condition (w & 63) == 0 where
# w = sum_{j=0..5} gear(c[i-j]) << j, the low 6 bits carry no influence
# from chars older than the 6-window (left shifts only move bits UP), so
# the oracle recomputes w with five LAG window functions. Dup accounting
# is chunk-level exact dedup: global count per chunk string, per-doc
# rollup of duplicated chunks/chars. Two shuffles + one join; the chunk
# stream never reaches the driver. Shift-robustness is pinned by pytest
# (tests/test_dedup_scale.py).
# ---------------------------------------------------------------------------
_CDC_A, _CDC_B = 167, 13
_CDC_WIN = 6
# Oracle generate_series bound. The ENGINE chunks full text regardless of
# length; only the SQL oracle needs a finite series bound, so q_cdc_dedup
# verifies max(n_chars) <= _CDC_MAXLEN up front (parquet stats, metadata
# read) and fails LOUDLY on a longer corpus instead of letting the oracle
# silently truncate and diverge.
_CDC_MAXLEN = 4096
CDC_BCAST_CAP = 5_000_000  # distinct chunks above this: join, not broadcast

_CDC_SQL = f"""
WITH pos AS (
  SELECT d.doc_id, t.i,
         unicode(substr(d.text, CAST(t.i AS INT), 1)) AS c
  FROM documents d CROSS JOIN generate_series(1, {_CDC_MAXLEN}) t(i)
  WHERE d.text IS NOT NULL AND t.i <= len(d.text)
),
g AS (SELECT doc_id, i, c, (c * {_CDC_A} + {_CDC_B}) % 64 AS gv FROM pos),
w AS (
  SELECT doc_id, i, c,
         (gv
          + COALESCE(lag(gv, 1) OVER win, 0) * 2
          + COALESCE(lag(gv, 2) OVER win, 0) * 4
          + COALESCE(lag(gv, 3) OVER win, 0) * 8
          + COALESCE(lag(gv, 4) OVER win, 0) * 16
          + COALESCE(lag(gv, 5) OVER win, 0) * 32) % 64 AS wv
  FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY i)
),
cid AS (
  SELECT doc_id, i, c,
         COALESCE(sum(CASE WHEN i >= {_CDC_WIN} AND wv = 0 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS chunk_id
  FROM w
),
chunks AS (
  SELECT doc_id, chunk_id,
         string_agg(chr(c), '' ORDER BY i) AS chunk,
         count(*) AS n_chars
  FROM cid GROUP BY doc_id, chunk_id
),
marked AS (
  SELECT doc_id, n_chars, count(*) OVER (PARTITION BY chunk) AS cnt
  FROM chunks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_chunks,
       CAST(sum(CASE WHEN cnt > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS dup_chars
FROM marked GROUP BY doc_id
"""


def cdc_chunk_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) character spans of the CDC chunks of ``text``.

    Vectorized: gear values for all codepoints at once, the 6-char window
    sum via shifted adds, boundaries = zeros of the low-6-bit window.
    """
    n = len(text)
    if n == 0:
        return []
    cp = np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    g = (cp * _CDC_A + _CDC_B) % 64
    w = g.copy()
    for j in range(1, _CDC_WIN):
        w[j:] += g[:-j] << j
    w &= 63
    w[: _CDC_WIN - 1] = 1  # 1-based i >= 6 gate, as in the SQL
    cut = (np.flatnonzero(w == 0) + 1).tolist()  # next-chunk start offsets
    starts = [0] + [c for c in cut if c < n]
    ends = starts[1:] + [n]
    return list(zip(starts, ends))


@query("cdc_dedup", _CDC_SQL)
def q_cdc_dedup(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from .extraction import parquet_num_rows

    max_len = _max_nchars_stat(sf_dir)
    if max_len is not None and max_len > _CDC_MAXLEN:
        raise ValueError(
            f"cdc_dedup oracle bound exceeded: corpus max n_chars "
            f"{max_len} > _CDC_MAXLEN {_CDC_MAXLEN}; the SQL oracle's "
            f"generate_series would truncate documents while the engine "
            f"chunks full text — raise _CDC_MAXLEN before comparing"
        )

    if parquet_num_rows(sf_dir, "documents") == 0:
        # empty input: the chunk stream would emit schema-less blocks
        # that break FieldRef resolution on the join probe side
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_chunks": pa.array([], type=pa.int64()),
                "dup_chunks": pa.array([], type=pa.int64()),
                "dup_chars": pa.array([], type=pa.int64()),
            }
        )

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids, chunks, sizes = [], [], []
        for d, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for a, b in cdc_chunk_spans(t or ""):
                ids.append(d)
                chunks.append(t[a:b])
                sizes.append(b - a)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "chunk": pa.array(chunks, type=pa.string()),
                "n_chars": pa.array(sizes, type=pa.int64()),
            }
        )

    chunks = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        chunk_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        chunks.groupby("chunk")
        .aggregate(Count(alias_name="cnt"))
        .repartition(8)  # collapse empty hash-aggregate blocks pre-join
        .materialize()  # consumed twice below (size gate + rows)
    )

    def doc_rollup(marked):
        return (
            marked.groupby("doc_id")
            .aggregate(
                Sum("one", alias_name="n_chunks"),
                Sum("dup", alias_name="dup_chunks"),
                Sum("dupc", alias_name="dup_chars"),
            )
        )

    if counts.count() <= CDC_BCAST_CAP:
        # the DUP subset (cnt > 1) is far smaller than the chunk stream:
        # broadcast it and skip the hash join entirely (same gate policy
        # as LM_BITS_BROADCAST_CAP — the join path carries web-scale
        # chunk vocabularies with zero driver state)
        import ray as _ray

        cp = counts.to_pandas()
        dup_ref = _ray.put(frozenset(cp.loc[cp["cnt"] > 1, "chunk"]))

        def mark_bcast(batch: pa.Table) -> pa.Table:
            import ray

            dups = ray.get(dup_ref)
            dup_i = np.fromiter(
                (1 if c in dups else 0 for c in batch["chunk"].to_pylist()),
                dtype=np.int64, count=batch.num_rows,
            )
            nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                    "dup": pa.array(dup_i),
                    "dupc": pa.array(dup_i * nch),
                }
            )

        return doc_rollup(
            chunks.map_batches(
                mark_bcast, batch_format="pyarrow", zero_copy_batch=True
            )
        )

    joined = chunks.join(
        counts, join_type="inner", num_partitions=8, on=("chunk",)
    )

    def partial(batch: pa.Table) -> pa.Table:
        dup = pc.greater(batch["cnt"], 1)
        dup_i = dup.cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "one": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
                "dup": dup_i,
                "dupc": pc.multiply(
                    dup_i, batch["n_chars"].cast(pa.int64())
                ),
            }
        )

    return doc_rollup(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
