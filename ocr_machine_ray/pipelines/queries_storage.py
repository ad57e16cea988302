"""Storage-layer and sampling operators: exact weighted systematic
sampling, compaction planning (small-file bin-packing), and HyperLogLog
approximate-distinct — the lakehouse/table-maintenance surface a 100 TB
corpus needs around the query engine proper.

The two prefix-sum queries share one distributed mechanism (the TeraSort
shape already used by ``global_rank_orders``): pass 1 reduces each block to
per-bucket weight partials (mergeable sums, driver holds only the bucket
histogram); pass 2 shuffles ONCE on the bucket key and every group resolves
its rows against the bucket's cumulative offset. Nothing corpus-sized ever
reaches the driver. At 10^12 rows the fixed bucket width becomes sampled
split points (exactly like Ray's own sort) and the histogram a tree-reduce;
the arithmetic — and therefore the selected rows — stays integer-exact
either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..registry import query


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Shared prefix-sum machinery: per-bucket weight offsets.
# ---------------------------------------------------------------------------
_BUCKET_W = 4096  # doc_ids per bucket (becomes sampled split points at scale)


def _with_bucket(batch: pa.Table) -> pa.Table:
    d = batch["doc_id"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "bucket", pa.array((d // _BUCKET_W).astype(np.int64))
    )


def _bucket_weight_partial(batch: pa.Table) -> pa.Table:
    b = batch["bucket"].to_numpy(zero_copy_only=False)
    w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals, inv = np.unique(b, return_inverse=True)
    acc = np.zeros(len(vals), dtype=np.int64)
    np.add.at(acc, inv, w)
    return pa.table({"bucket": pa.array(vals), "w": pa.array(acc)})


def _bucket_offsets(ds) -> tuple[dict[int, int], int]:
    """Cumulative weight BEFORE each bucket (doc_id ascending) and the grand
    total. Driver traffic: blocks x buckets tiny rows, never corpus rows."""
    hist: dict[int, int] = {}
    for row in ds.map_batches(
        _bucket_weight_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        hist[int(row["bucket"])] = hist.get(int(row["bucket"]), 0) + int(row["w"])
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(hist):
        offsets[b] = acc
        acc += hist[b]
    return offsets, acc


# ---------------------------------------------------------------------------
# Exact weighted systematic sampling: K evenly spaced picks over the
# cumulative-weight axis (weight = n_chars), doc_id order. The training-data
# "sample by length/quality weight, exactly to quota" op — deterministic,
# integer-exact, no RNG, so the SQL oracle reproduces it bit-for-bit.
# A row is selected iff a multiple of total/K lands inside its cumulative
# interval; n_picks is its with-replacement multiplicity. Integer-overflow
# bound: cum * K < 2^63 -> fine up to ~9e16 total weight at K=100.
# ---------------------------------------------------------------------------
_SAMPLE_K = 100

_WEIGHTED_SQL = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n_chars) OVER () AS total
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       CAST((cum * {_SAMPLE_K}) // total
            - ((cum - n_chars) * {_SAMPLE_K}) // total AS BIGINT) AS n_picks
FROM c
WHERE (cum * {_SAMPLE_K}) // total > ((cum - n_chars) * {_SAMPLE_K}) // total
"""


@query("weighted_sample", _WEIGHTED_SQL)
def q_weighted_sample(sf_dir: str):
    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "weight": pa.array([], type=pa.int64()),
            "n_picks": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _with_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    offsets, total = _bucket_offsets(ds)
    if total <= 0:
        return empty

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        w = g["n_chars"].to_numpy(np.int64)
        cum = int(offsets[int(g["bucket"].iloc[0])]) + np.cumsum(w)
        hi = (cum * _SAMPLE_K) // total
        lo = ((cum - w) * _SAMPLE_K) // total
        sel = hi > lo
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64)[sel],
                "weight": w[sel],
                "n_picks": (hi - lo)[sel],
            }
        )

    return ds.groupby("bucket").map_groups(classify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Compaction plan: bin-pack doc_id-ordered rows into target-size output
# files by global cumulative bytes (a row belongs to the file its first
# byte lands in). This is the "small-file compaction / file-size balancing"
# maintenance op; the plan itself is what a rewrite job would execute.
# Two-level aggregate: bucket groups emit per-(file_id) partials, a final
# tiny groupby merges files that straddle bucket boundaries.
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 8192  # target file size (chars as the byte proxy)

_COMPACT_SQL = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT CAST((cum - n_chars) // {_COMPACT_TARGET} AS BIGINT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_bytes,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1
"""


@query("compaction_plan", _COMPACT_SQL)
def q_compaction_plan(sf_dir: str):
    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "file_id": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "total_bytes": pa.array([], type=pa.int64()),
            "first_doc": pa.array([], type=pa.int64()),
            "last_doc": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "documents") == 0:
        return empty

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _with_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    offsets, _total = _bucket_offsets(ds)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        d = g["doc_id"].to_numpy(np.int64)
        w = g["n_chars"].to_numpy(np.int64)
        cum = int(offsets[int(g["bucket"].iloc[0])]) + np.cumsum(w)
        fid = (cum - w) // _COMPACT_TARGET
        vals, inv = np.unique(fid, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        tb = np.zeros(len(vals), dtype=np.int64)
        np.add.at(tb, inv, w)
        first = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, inv, d)
        last = np.zeros(len(vals), dtype=np.int64)
        np.maximum.at(last, inv, d)
        return pd.DataFrame(
            {
                "file_id": vals,
                "n_docs": n,
                "total_bytes": tb,
                "first_doc": first,
                "last_doc": last,
            }
        )

    partials = ds.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    ).repartition(4)

    def add_fb(t: pa.Table) -> pa.Table:
        fid = t["file_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_fb", pa.array(fid >> 8))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 file_ids per group (file_id is dense — prefix bucket):
        # segmented sum/min/max over rows sorted by file_id
        fid = g["file_id"].to_numpy().astype(np.int64)
        order = np.argsort(fid, kind="mergesort")
        fid = fid[order]
        starts = np.flatnonzero(np.r_[True, fid[1:] != fid[:-1]])
        nd = g["n_docs"].to_numpy().astype(np.int64)[order]
        tb = g["total_bytes"].to_numpy().astype(np.int64)[order]
        fd = g["first_doc"].to_numpy().astype(np.int64)[order]
        ld = g["last_doc"].to_numpy().astype(np.int64)[order]
        return pd.DataFrame(
            {
                "file_id": fid[starts],
                "n_docs": np.add.reduceat(nd, starts),
                "total_bytes": np.add.reduceat(tb, starts),
                "first_doc": np.minimum.reduceat(fd, starts),
                "last_doc": np.maximum.reduceat(ld, starts),
            }
        )

    return (
        partials.map_batches(add_fb, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(merge_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct count (p=12, 4096 registers, ~1.6%
# standard error). Mergeable-by-max register arrays: each block reduces to
# ONE 4 KiB row per metric regardless of block size, the driver max-merges
# a handful of rows — the sketch shape that replaces an exact-distinct
# shuffle when the answer may be approximate. Deterministic (splitmix64
# finalizer, no RNG), so the estimate is stable run-to-run; accuracy is
# pinned by pytest against exact distinct (no SQL oracle by nature).
# ---------------------------------------------------------------------------
_HLL_P = 12
# exact bit_length of the (64-p)-bit suffix via searchsorted over powers of
# two — no float log2, so rho is integer-exact for every input
_HLL_POW2 = (np.uint64(1) << np.arange(0, 64 - _HLL_P, dtype=np.uint64))


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def hll_registers(keys: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    """Vectorized HLL register array for int64 keys (uint8[2^p])."""
    h = _mix64(np.asarray(keys))
    idx = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    bl = np.searchsorted(_HLL_POW2, w, side="right")  # bit_length(w)
    rho = ((64 - p) - bl + 1).astype(np.uint8)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    m = float(len(regs))
    est = 0.7213 / (1 + 1.079 / m) * m * m / np.sum(
        2.0 ** -regs.astype(np.float64)
    )
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear-counting small-range correction
    return int(round(est))


@query("distinct_hll")  # approximate by nature: rows-only + accuracy pytest
def q_distinct_hll(sf_dir: str):
    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "events") == 0:
        return pa.table(
            {
                "metric": pa.array([], type=pa.string()),
                "estimate": pa.array([], type=pa.int64()),
            }
        )
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for col in ("event_id", "user_id"):
            keys = batch[col].to_numpy(zero_copy_only=False)
            rows.append(
                {"metric": col, "regs": hll_registers(keys).tobytes()}
            )
        return pa.table(
            {
                "metric": pa.array([r["metric"] for r in rows]),
                "regs": pa.array(
                    [r["regs"] for r in rows], type=pa.binary()
                ),
            }
        )

    def pre_merge(batch: pa.Table) -> pa.Table:
        """Partition-level register-max combine (same tree level as the
        CMS reduce below): the driver sees O(partitions) rows, not one
        per block — 4 KiB x 10^6 blocks would be driver-hostile."""
        if batch.num_rows == 0:
            return batch
        acc: dict[str, np.ndarray] = {}
        for metric, regs in zip(
            batch["metric"].to_pylist(), batch["regs"].to_pylist()
        ):
            r = np.frombuffer(regs, dtype=np.uint8)
            if metric in acc:
                np.maximum(acc[metric], r, out=acc[metric])
            else:
                acc[metric] = r.copy()
        keys = sorted(acc)
        return pa.table(
            {
                "metric": pa.array(keys),
                "regs": pa.array(
                    [acc[k].tobytes() for k in keys], type=pa.binary()
                ),
            }
        )

    merged: dict[str, np.ndarray] = {
        "event_id": np.zeros(1 << _HLL_P, dtype=np.uint8),
        "user_id": np.zeros(1 << _HLL_P, dtype=np.uint8),
    }
    for row in (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .map_batches(
            pre_merge, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .take_all()
    ):  # O(partitions) register rows: driver-safe at any corpus size
        np.maximum(
            merged[row["metric"]],
            np.frombuffer(row["regs"], dtype=np.uint8),
            out=merged[row["metric"]],
        )
    return pa.table(
        {
            "metric": pa.array(sorted(merged)),
            "estimate": pa.array(
                [hll_estimate(merged[k]) for k in sorted(merged)],
                type=pa.int64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters: the one-pass approximate sibling of the
# exact two-pass Misra-Gries pipeline (queries_text.py heavy_hitters).
# Each block ships ONE fixed-size CMS matrix (128 KiB) plus its top-64
# local candidate tokens; the driver sums the matrices (additive merge),
# unions the candidates, and reads depth-min estimates for them from the
# merged sketch. One pass over the corpus, no token-stream shuffle at all
# — at 10^12 tokens the reduce carries O(blocks) fixed-size rows. CMS
# guarantees est >= true, so the true heavy set is always a subset of the
# candidates-by-estimate cut (accuracy pinned by pytest; approximate by
# nature, no SQL oracle).
# ---------------------------------------------------------------------------
_CMS_TOPK = 30
_CMS_CAND_PER_BLOCK = 64


@query("heavy_hitters_cms")
def q_heavy_hitters_cms(sf_dir: str):
    from ..corpus import FlatTokens
    from ..functions.dedup import _token_hash64
    from ..functions.sketch import cms_build, cms_estimate
    from .extraction import read_documents

    def partial(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        if not len(ft.tokens):
            return pa.table(
                {
                    "kind": pa.array([], type=pa.string()),
                    "tok": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "payload": pa.array([], type=pa.binary()),
                }
            )
        vals, counts = np.unique(ft.tokens, return_counts=True)
        keys = np.array(
            [_token_hash64(t) for t in vals], dtype=np.uint64
        )
        m = cms_build(keys, counts.astype(np.int64))
        top = np.argsort(-counts, kind="stable")[:_CMS_CAND_PER_BLOCK]
        kinds = ["cms"] + ["cand"] * len(top)
        toks = [""] + [str(vals[i]) for i in top]
        ns = [int(counts.sum())] + [int(counts[i]) for i in top]
        payloads = [m.tobytes()] + [None] * len(top)
        return pa.table(
            {
                "kind": pa.array(kinds, type=pa.string()),
                "tok": pa.array(toks, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    from ..functions.sketch import CMS_DEPTH as _D
    from ..functions.sketch import CMS_WIDTH as _W

    def pre_merge(batch: pa.Table) -> pa.Table:
        """Partition-level combine: sum the CMS matrices and keep the
        top candidates by local count, so the driver sees O(partitions)
        rows — at 10^6 blocks the per-block matrices alone would be
        ~128 GB driver-side without this tree level."""
        if batch.num_rows == 0:
            return batch
        acc = np.zeros((_D, _W), dtype=np.int64)
        cand_rows: dict[str, int] = {}
        n_cms = 0
        for kind, tok, n, payload in zip(
            batch["kind"].to_pylist(),
            batch["tok"].to_pylist(),
            batch["n"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind == "cms":
                acc += np.frombuffer(payload, dtype=np.int64).reshape(
                    _D, _W
                )
                n_cms += 1
            else:
                cand_rows[tok] = cand_rows.get(tok, 0) + n
        top = sorted(cand_rows.items(), key=lambda kv: (-kv[1], kv[0]))[
            : 4 * _CMS_CAND_PER_BLOCK
        ]
        kinds = (["cms"] if n_cms else []) + ["cand"] * len(top)
        toks = ([""] if n_cms else []) + [t for t, _ in top]
        ns = ([0] if n_cms else []) + [c for _, c in top]
        payloads = ([acc.tobytes()] if n_cms else []) + [None] * len(top)
        return pa.table(
            {
                "kind": pa.array(kinds, type=pa.string()),
                "tok": pa.array(toks, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    rows = (
        read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)  # tree level: 8 partition-combined sketch rows
        .map_batches(
            pre_merge, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .take_all()
    )  # O(partitions) matrices + capped candidates: driver-safe at scale

    from ..functions.sketch import CMS_DEPTH, CMS_WIDTH

    merged = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    cands: set[str] = set()
    for row in rows:
        if row["kind"] == "cms":
            merged += np.frombuffer(
                row["payload"], dtype=np.int64
            ).reshape(CMS_DEPTH, CMS_WIDTH)
        else:
            cands.add(row["tok"])
    if not cands:
        return pa.table(
            {
                "tok": pa.array([], type=pa.string()),
                "est": pa.array([], type=pa.int64()),
            }
        )
    cand_list = sorted(cands)
    keys = np.array(
        [_token_hash64(t) for t in cand_list], dtype=np.uint64
    )
    est = cms_estimate(merged, keys)
    order = np.lexsort((np.array(cand_list), -est))[:_CMS_TOPK]
    return pa.table(
        {
            "tok": pa.array([cand_list[i] for i in order]),
            "est": pa.array(est[order], type=pa.int64()),
        }
    )
