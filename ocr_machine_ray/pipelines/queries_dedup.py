"""Driver-checked queries: dedup family (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.dedup import (
    tokenize as dedup_tokenize,
    BAND_SIZE,
    MINHASH_SEEDS,
    SHINGLE_N,
    content_hash_batch,
    jaccard_pairs_group,
    minhash_bands_batch,
    simhash_batch,
    word_shingles,
    shingle_jaccard,
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
# ---------------------------------------------------------------------------
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
seeds AS (SELECT unnest(range({MINHASH_SEEDS})) AS seed),
minhashes AS (
  SELECT doc_id, seed, min(md5(sh || '|' || seed)) AS mh
  FROM shingles CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // {BAND_SIZE} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
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
# MinHash LSH dedup end-to-end: band groupby -> candidate pairs -> verify
# exact shingle Jaccard >= 0.5.
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


@query("dedup_minhash", _MINHASH_PAIRS_SQL)
def q_dedup_minhash(sf_dir: str):
    """LSH candidates via groupby on (band, band_key), verified with exact
    shingle Jaccard inside map_groups — the full near-dedup pipeline."""

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    class VerifyJaccard:
        """Actor holding doc_id -> shingle set (broadcast via ray.put once),
        verifying candidate pairs per batch."""

        def __init__(self, shingle_ref):
            import ray

            self.shingles = ray.get(shingle_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["doc_a"].to_pylist()
            b = batch["doc_b"].to_pylist()
            keep = [
                shingle_jaccard(self.shingles[x], self.shingles[y])
                >= MINHASH_VERIFY_T
                for x, y in zip(a, b)
            ]
            return batch.filter(pa.array(keep))

    import ray

    docs = read_documents(sf_dir)
    bands = docs.map_batches(
        minhash_bands_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = (
        bands.groupby(["band", "band_key"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    # distinct pairs (a doc pair can collide in several bands)
    cand = cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    # broadcast the shingle-set index (small side: one set per doc; at scale
    # this would be a bucketed join — documented partitioning assumption)
    docs_df = docs.to_pandas()
    shingle_map = {
        d: word_shingles(dedup_tokenize(t or ""))
        for d, t in zip(docs_df["doc_id"], docs_df["text"])
    }
    ref = ray.put(shingle_map)
    return cand.map_batches(
        VerifyJaccard,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


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
# n-gram (word-set) Jaccard near-dup pairs, bucketed by language.
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


@query("dedup_ngram_jaccard", _JACCARD_SQL)
def q_dedup_jaccard(sf_dir: str):
    def pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        a, b = jaccard_pairs_group(
            g["doc_id"].to_numpy(),
            [dedup_tokenize(t) for t in g["text"]],
            JACCARD_T,
        )
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    return (
        read_documents(sf_dir, ["doc_id", "lang", "text"])
        .groupby("lang")
        .map_groups(pairs_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup, bucketed by label (coarse-quantizer stand-in).
# ---------------------------------------------------------------------------
COSINE_T = 0.35

_EMB_DUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {COSINE_T}
"""


@query("dedup_embedding", _EMB_DUP_SQL)
def q_dedup_embedding(sf_dir: str):
    import ray.data

    def pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        V = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        ii, jj = np.where(np.triu(S >= COSINE_T, k=1))
        a, b = ids[ii], ids[jj]
        swap = a > b
        return pd.DataFrame(
            {
                "vec_a": np.where(swap, b, a),
                "vec_b": np.where(swap, a, b),
            }
        )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return emb.groupby("label").map_groups(pairs_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over near-dup pairs (min-label
# propagation with a groupby per round — the distributed-friendly CC; the
# oracle recomputes components with a recursive CTE).
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


@query("dedup_clusters", _CLUSTERS_SQL)
def q_dedup_clusters(sf_dir: str):
    """Cluster near-duplicate documents: jaccard pairs (bucketed by lang) ->
    iterative min-label propagation. Each round is one groupby over edge
    endpoints (hash-partitioned by node) — the standard distributed CC;
    rounds = graph diameter, tiny for dup clusters."""
    import ray.data
    from ray.data.aggregate import Min

    pair_ds = q_dedup_jaccard(sf_dir)
    pairs = pair_ds.to_pandas()  # candidate pairs are small by construction
    if len(pairs) == 0:
        return pd.DataFrame({"doc_id": [], "cluster": []}).astype("int64")

    edges = pd.concat(
        [
            pairs.rename(columns={"doc_a": "a", "doc_b": "b"}),
            pairs.rename(columns={"doc_b": "a", "doc_a": "b"})[["a", "b"]],
        ],
        ignore_index=True,
    )
    nodes = np.unique(edges[["a", "b"]].to_numpy())
    labels = pd.DataFrame({"n": nodes, "lbl": nodes})
    edges_ds = ray.data.from_pandas(edges)
    # iterate to convergence: rounds needed = graph diameter; the node
    # count is an absolute upper bound (a fixed small cap silently
    # returned unconverged labels on long similarity chains)
    for _ in range(max(2, len(nodes))):
        lbl_map = dict(zip(labels["n"], labels["lbl"]))

        def relabel(batch: pd.DataFrame, m=lbl_map) -> pd.DataFrame:
            return pd.DataFrame(
                {"n": batch["b"], "cand": batch["a"].map(m)}
            )

        prop = (
            edges_ds.map_batches(relabel, batch_format="pandas")
            .groupby("n")
            .aggregate(Min("cand", alias_name="cand"))
            .to_pandas()
        )
        merged = labels.merge(prop, on="n", how="left")
        new_lbl = np.minimum(
            merged["lbl"], merged["cand"].fillna(merged["lbl"])
        ).astype(np.int64)
        if (new_lbl == labels["lbl"]).all():
            break
        labels["lbl"] = new_lbl
    return pd.DataFrame(
        {"doc_id": labels["n"].astype(np.int64),
         "cluster": labels["lbl"].astype(np.int64)}
    )
