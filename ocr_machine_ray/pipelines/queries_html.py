"""Driver-checked queries: HTML boilerplate strip + remaining operator
coverage (union, deterministic splits, corpus length stats).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.html import extract_main_content, render_html, strip_batch
from ..registry import query
from .extraction import read_documents


# ---------------------------------------------------------------------------
# HTML boilerplate strip (north_star: Readability-style DOM scoring).
# Closed loop: real text wrapped in deterministic furniture; the stripper
# must recover exactly the whitespace-normalized original.
# ---------------------------------------------------------------------------
_HTML_SQL = """
SELECT doc_id,
       regexp_replace(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+', ' ', 'g') AS main_text
FROM documents WHERE text IS NOT NULL
"""


@query("html_main_content", _HTML_SQL)
def q_html_main_content(sf_dir: str):
    class HtmlExtract:
        """Actor pool: parser tables + compiled regexes held per actor.

        NOTE: references module-level imports (pickled by value with the
        class); a function-body package import would fail on workers."""

        def __init__(self):
            self.render = render_html
            self.extract = extract_main_content

        def __call__(self, batch: pa.Table) -> pa.Table:
            htmls = [
                self.render(d, t)
                for d, t in zip(
                    batch["doc_id"].to_pylist(), batch["text"].to_pylist()
                )
            ]
            rendered = batch.append_column(
                "html", pa.array(htmls, type=pa.string())
            )
            return strip_batch(rendered)

    return read_documents(sf_dir).map_batches(
        HtmlExtract, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# Union (§2.7): two filtered reads unioned, counted per language.
# ---------------------------------------------------------------------------
_UNION_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
WHERE lang IN ('en', 'fr') GROUP BY lang
"""


@query("union_sources", _UNION_SQL)
def q_union_sources(sf_dir: str):
    import pyarrow.compute as pc

    import ray.data
    from ray.data.aggregate import Count

    def read_lang(lang: str):
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang"],
            filter=(pc.field("lang") == lang),
        )

    both = read_lang("en").union(read_lang("fr"))
    return both.groupby("lang").aggregate(Count(alias_name="n_docs"))


# ---------------------------------------------------------------------------
# Deterministic 70/15/15 split sizes (O3) + seeded shuffle determinism (O4).
# The driver-checkable projection is split SIZES (exact); membership
# stability is asserted in pytest.
# ---------------------------------------------------------------------------
# mirrors Ray split_proportionately's CUMULATIVE int indices:
# train_end = int(c*0.7), val_end = int(c*0.85) — floor(c*0.15) would
# disagree whenever the fractional parts of 0.7c and 0.15c sum past 1
_SPLIT_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents)
SELECT 'test' AS split,
       CAST(c - CAST(floor(c*0.85) AS BIGINT) AS BIGINT) AS n_docs FROM n
UNION ALL
SELECT 'train', CAST(floor(c*0.7) AS BIGINT) FROM n
UNION ALL
SELECT 'val', CAST(floor(c*0.85) AS BIGINT)
              - CAST(floor(c*0.7) AS BIGINT) FROM n
"""


@query("train_val_test_split", _SPLIT_SQL)
def q_split(sf_dir: str):
    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "documents") == 0:
        # split_proportionately refuses empty input; SQL yields 3 zero rows
        return pa.table(
            {
                "split": pa.array(["train", "val", "test"]),
                "n_docs": pa.array([0, 0, 0], type=pa.int64()),
            }
        )
    ds = read_documents(sf_dir, ["doc_id"]).random_shuffle(seed=42)
    try:
        train, val, test = ds.split_proportionately([0.7, 0.15])
        sizes = [train.count(), val.count(), test.count()]
    except ValueError:
        # Ray refuses splits that would come up empty (tiny shards);
        # report the same cumulative-index sizes it would have produced
        c = ds.count()
        t_end, v_end = int(c * 0.7), int(c * 0.85)
        sizes = [t_end, v_end - t_end, c - v_end]
    return pa.table(
        {
            "split": pa.array(["train", "val", "test"]),
            "n_docs": pa.array(sizes, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Corpus length stats with percentiles (A6 analog; exact at this scale,
# approximate-sketch at 10^12 — see docstring).
# ---------------------------------------------------------------------------
_LEN_STATS_SQL = """
SELECT CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       quantile_cont(n_chars, 0.05) AS p5,
       quantile_cont(n_chars, 0.25) AS p25,
       quantile_cont(n_chars, 0.75) AS p75,
       quantile_cont(n_chars, 0.95) AS p95
FROM documents
"""


@query("doc_length_stats", _LEN_STATS_SQL)
def q_doc_length_stats(sf_dir: str):
    """min/max/sum stream as partial aggregates; the percentiles here are
    exact over the collected column (small at test scale). At 10^12 rows
    the same query plugs a mergeable quantile sketch (KLL/t-digest) into
    the partial-aggregate slot — the reference's exact in-memory
    percentiles (study_images.py:30-43) do not scale."""
    ds = read_documents(sf_dir, ["n_chars"])
    vals = np.sort(
        np.concatenate(
            [
                b["n_chars"].to_numpy(zero_copy_only=False)
                for b in ds.iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    if len(vals) == 0:
        # SQL global aggregate over an empty table: one all-NULL row
        null_i = pa.array([None], type=pa.int64())
        null_f = pa.array([None], type=pa.float64())
        return pa.table(
            {
                "min_chars": null_i, "max_chars": null_i,
                "total_chars": null_i,
                "p5": null_f, "p25": null_f, "p75": null_f, "p95": null_f,
            }
        )
    p5, p25, p75, p95 = np.percentile(vals, [5, 25, 75, 95])
    return pa.table(
        {
            "min_chars": pa.array([int(vals[0])], type=pa.int64()),
            "max_chars": pa.array([int(vals[-1])], type=pa.int64()),
            "total_chars": pa.array([int(vals.sum())], type=pa.int64()),
            "p5": pa.array([p5], type=pa.float64()),
            "p25": pa.array([p25], type=pa.float64()),
            "p75": pa.array([p75], type=pa.float64()),
            "p95": pa.array([p95], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Sketch-based percentiles (A6 scale path): one HistogramSketch per batch,
# merged on the driver. With bin_width=1 over the integer n_chars domain
# the sketch is EXACT, so it shares doc_length_stats' value-exact oracle —
# proving the mergeable-partial pattern without giving up the gate.
# ---------------------------------------------------------------------------
# n_chars sketch domain bound, shared by every sketch query in this file
# (sf corpora max ~600; raise HERE if the corpus ceiling ever grows —
# clipping would silently skew percentiles, so partials fail loudly)
N_CHARS_LO, N_CHARS_HI = 0, 4096


@query("doc_length_stats_sketch", _LEN_STATS_SQL)
def q_doc_length_stats_sketch(sf_dir: str):
    from ..functions.sketch import HistogramSketch

    LO, HI = N_CHARS_LO, N_CHARS_HI

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch["n_chars"].to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return pa.table(
                {
                    "counts": pa.array([], type=pa.list_(pa.int64())),
                    "min_v": pa.array([], type=pa.int64()),
                    "max_v": pa.array([], type=pa.int64()),
                    "total": pa.array([], type=pa.int64()),
                }
            )
        if int(vals.max()) > HI:
            raise ValueError(
                f"n_chars {int(vals.max())} exceeds sketch domain [{LO},{HI}]"
                " — raise HI (clipping would silently skew the percentiles)"
            )
        sk = HistogramSketch(LO, HI).add(vals)
        _, _, counts = sk.to_arrays()
        return pa.table(
            {
                "counts": pa.array([counts.tolist()]),
                "min_v": pa.array([int(vals.min())], type=pa.int64()),
                "max_v": pa.array([int(vals.max())], type=pa.int64()),
                "total": pa.array([int(vals.sum())], type=pa.int64()),
            }
        )

    from ..functions.sketch import HistogramSketch as HS

    merged = HS(LO, HI)
    min_v, max_v, total = None, None, 0
    partials = read_documents(sf_dir, ["n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row_counts, mn, mx, tot in zip(
            b["counts"].to_pylist(), b["min_v"].to_pylist(),
            b["max_v"].to_pylist(), b["total"].to_pylist(),
        ):
            merged.merge(HS.from_arrays(LO, 1, row_counts))
            min_v = mn if min_v is None else min(min_v, mn)
            max_v = mx if max_v is None else max(max_v, mx)
            total += tot
    return pa.table(
        {
            "min_chars": pa.array([min_v], type=pa.int64()),
            "max_chars": pa.array([max_v], type=pa.int64()),
            "total_chars": pa.array([total], type=pa.int64()),
            "p5": pa.array([merged.quantile(0.05)], type=pa.float64()),
            "p25": pa.array([merged.quantile(0.25)], type=pa.float64()),
            "p75": pa.array([merged.quantile(0.75)], type=pa.float64()),
            "p95": pa.array([merged.quantile(0.95)], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Per-GROUP sketch quantiles: the distributed form of the sketch pattern —
# one histogram partial per (batch, lang), merged INSIDE groupby(lang)
# rather than on the driver. Exact at bin_width=1, so the oracle is
# value-exact; at 10^12 rows the same shape holds with a KLL/t-digest in
# the partial slot and only (lang, sketch) rows ever shuffle.
# ---------------------------------------------------------------------------
_GRP_QUANT_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       quantile_cont(n_chars, 0.5) AS median_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars
FROM documents GROUP BY lang
"""


@query("group_length_quantiles", _GRP_QUANT_SQL)
def q_group_length_quantiles(sf_dir: str):
    import pandas as pd

    from ..functions.sketch import HistogramSketch

    LO, HI = N_CHARS_LO, N_CHARS_HI

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        if int(chars.max(initial=0)) > HI:
            raise ValueError(f"n_chars exceeds sketch domain [{LO},{HI}]")
        uk, inv = np.unique(langs, return_inverse=True)
        # every per-lang histogram in ONE vectorized sweep (an (L, bins)
        # matrix) instead of a masked rescan per language
        mat = np.zeros((len(uk), HI - LO + 1), dtype=np.int64)
        if len(chars):
            np.add.at(mat, (inv, (chars - LO).clip(0, HI - LO)), 1)
        return pa.table(
            {
                "lang": pa.array(uk, type=pa.string()),
                "counts": pa.array(
                    list(mat), type=pa.list_(pa.int64())
                ),
                "n_docs": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        sk = HistogramSketch(LO, HI)
        for c in g["counts"]:
            sk.merge(HistogramSketch.from_arrays(LO, 1, c))
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_docs": [int(g["n_docs"].sum())],
                "median_chars": [sk.quantile(0.5)],
                "p90_chars": [sk.quantile(0.9)],
            }
        )

    partials = read_documents(sf_dir, ["lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("lang").map_groups(
        merge_group, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Per-lang length-outlier filter: docs longer than their language's exact
# discrete p95. Two passes: (1) per-(batch, lang) integer histograms merged
# inside groupby(lang) into a 5-row threshold table (DuckDB quantile_disc
# index rule ceil(0.95*n)-1, computed in exact integer arithmetic and
# pinned by an empirical pytest vs DuckDB), (2) broadcast the thresholds
# into a vectorized filter pass. At 10^12 rows pass 1's shuffle carries
# only (lang, histogram) partials and pass 2 is an embarrassingly parallel
# scan — nothing data-sized ever reaches the driver.
# ---------------------------------------------------------------------------
_OUTLIER_SQL = """
WITH th AS (
  SELECT lang, quantile_disc(n_chars, 0.95) AS p95
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN th USING (lang)
WHERE d.n_chars > th.p95
"""


@query("length_outliers", _OUTLIER_SQL)
def q_length_outliers(sf_dir: str):
    import pandas as pd

    LO, HI = N_CHARS_LO, N_CHARS_HI

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        if int(chars.max(initial=0)) > HI:
            raise ValueError(f"n_chars exceeds histogram domain [{LO},{HI}]")
        uk, inv = np.unique(langs, return_inverse=True)
        mat = np.zeros((len(uk), HI - LO + 1), dtype=np.int64)
        if len(chars):
            np.add.at(mat, (inv, (chars - LO).clip(0, HI - LO)), 1)
        return pa.table(
            {
                "lang": pa.array(uk, type=pa.string()),
                "counts": pa.array(list(mat), type=pa.list_(pa.int64())),
            }
        )

    def threshold_group(g: pd.DataFrame) -> pd.DataFrame:
        hist = np.zeros(HI - LO + 1, dtype=np.int64)
        for c in g["counts"]:
            hist += np.asarray(c, dtype=np.int64)
        n = int(hist.sum())
        # DuckDB quantile_disc(x, 0.95): sorted[ceil(0.95*n) - 1], exact
        # integer form (19n + 19) // 20 - 1
        idx = (19 * n + 19) // 20 - 1
        cum = np.cumsum(hist)
        p95 = LO + int(np.searchsorted(cum, idx + 1, side="left"))
        return pd.DataFrame({"lang": [g["lang"].iloc[0]], "p95": [p95]})

    th = (
        read_documents(sf_dir, ["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(threshold_group, batch_format="pandas")
        .to_pandas()  # |langs| rows
    )
    if th.empty:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
    langs_sorted = np.sort(th["lang"].to_numpy())
    thr_sorted = th.set_index("lang").loc[langs_sorted, "p95"].to_numpy()

    def flag(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(langs_sorted, langs)
        keep = chars > thr_sorted[pos]
        m = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(m),
                "lang": batch["lang"].filter(m),
                "n_chars": batch["n_chars"].filter(m),  # already int64
            }
        )

    return read_documents(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )
