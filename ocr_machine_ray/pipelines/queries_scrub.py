"""Driver-checked queries: web-corpus scrubbing family (PII redaction,
URL/domain analysis).

A 100 TB web crawl needs a PII scrub pass (emails, phone numbers) and
per-domain accounting before training-data selection. TESTDATA's synthetic
``documents`` contains no organic PII/URLs, so each query derives a
PII/URL-bearing view of the corpus with ONE closed-form rule implemented on
both sides (the corpus.py pattern — the derivation is shared, so the
value-hash gate genuinely checks the regex/redaction engine, not a
tautology on clean text).

Scale notes: both ops are single-pass column-pruned `map_batches` with
Arrow RE2 C kernels (replace_substring_regex / count_substring_regex /
extract_regex) — no Python-per-row work, no shuffle except the tiny domain
groupby whose key cardinality is the domain universe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import query
from .extraction import read_documents

# RE2 on the Arrow side, and DuckDB also uses RE2 — identical dialect.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"

# One shared synthesis rule: doc k gains a contact line
#   " contact user<k>@mail.example.com or 555-<k%10000 zero-padded>"
_SQL_PII_TEXT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@mail.example.com or 555-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

_PII_SQL = (
    "WITH pii AS (SELECT doc_id, " + _SQL_PII_TEXT + " AS t FROM documents "
    "WHERE text IS NOT NULL)\n"
    "SELECT doc_id,\n"
    "       regexp_replace(regexp_replace(t, '" + EMAIL_RE + "', '[EMAIL]', 'g'),\n"
    "                      '" + PHONE_RE + "', '[PHONE]', 'g') AS clean_text,\n"
    "       CAST(len(regexp_extract_all(t, '" + EMAIL_RE + "')) AS BIGINT) AS n_emails,\n"
    "       CAST(len(regexp_extract_all(t, '" + PHONE_RE + "')) AS BIGINT) AS n_phones\n"
    "FROM pii"
)


def _pii_text(batch: pa.Table) -> pa.ChunkedArray:
    doc_str = pc.cast(batch["doc_id"], pa.string())
    phone = pc.utf8_lpad(
        pc.cast(
            pa.array(batch["doc_id"].to_numpy(zero_copy_only=False) % 10000),
            pa.string(),
        ),
        4,
        "0",
    )
    return pc.binary_join_element_wise(
        batch["text"],
        " contact user",
        doc_str,
        "@mail.example.com or 555-",
        phone,
        "",
    )


@query("pii_redact", _PII_SQL)
def q_pii_redact(sf_dir: str):
    def scrub(batch: pa.Table) -> pa.Table:
        t = _pii_text(batch)
        n_emails = pc.count_substring_regex(t, EMAIL_RE)
        n_phones = pc.count_substring_regex(t, PHONE_RE)
        clean = pc.replace_substring_regex(
            pc.replace_substring_regex(t, EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# URL/domain accounting: synthesize a per-doc URL, parse the host back out
# with a capture-group regex, aggregate per domain.
# ---------------------------------------------------------------------------
_URL_SQL = """
WITH urls AS (
  SELECT doc_id, source,
         'https://' || lang || '.example.com/' || source || '/'
            || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
parsed AS (
  SELECT doc_id, source,
         regexp_extract(url, 'https://([a-z0-9.-]+)/', 1) AS domain
  FROM urls
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM parsed GROUP BY domain
"""

_HOST_RE = r"https://(?P<host>[a-z0-9.-]+)/"


@query("url_domains", _URL_SQL)
def q_url_domains(sf_dir: str):
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            "https://",
            batch["lang"],
            ".example.com/",
            batch["source"],
            "/",
            pc.cast(batch["doc_id"], pa.string()),
            "",
        )
        host = pc.struct_field(pc.extract_regex(url, _HOST_RE), "host")
        dom = host.to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        # distinct (domain, source) pairs + per-domain doc counts, one sweep
        # over integer codes (no per-row Python string work)
        doms, inv = np.unique(dom, return_inverse=True)
        n_docs = np.bincount(inv, minlength=len(doms))
        srcs, sinv = np.unique(src, return_inverse=True)
        pair_codes = np.unique(inv.astype(np.int64) * max(len(srcs), 1) + sinv)
        pd_dom = doms[pair_codes // max(len(srcs), 1)]
        pd_src = srcs[pair_codes % max(len(srcs), 1)] if len(srcs) else srcs
        counts = pa.table(
            {
                "domain": pa.array(doms, type=pa.string()),
                "n_docs_part": pa.array(n_docs.astype(np.int64)),
                "source": pa.array([None] * len(doms), type=pa.string()),
            }
        )
        pairs = pa.table(
            {
                "domain": pa.array(pd_dom, type=pa.string()),
                "n_docs_part": pa.array(np.zeros(len(pd_dom), dtype=np.int64)),
                "source": pa.array(pd_src, type=pa.string()),
            }
        )
        return pa.concat_tables([counts, pairs])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "domain": [g["domain"].iloc[0]],
                "n_docs": [int(g["n_docs_part"].sum())],
                "n_sources": [int(g["source"].dropna().nunique())],
            }
        )

    partials = read_documents(
        sf_dir, ["doc_id", "lang", "source"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("domain").map_groups(
        merge_group, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Per-domain quality audit (CCNet/RefinedWeb-style domain filtering input):
# aggregate the Gopher rule verdicts per source domain so a curation run can
# drop or down-weight whole domains. One tokenization pass per batch (the
# shared gopher_rules_batch kernel), per-batch partial sums keyed by the
# 5-cardinality domain, then a tiny groupby — only (domain, partials) rows
# shuffle, never documents.
# ---------------------------------------------------------------------------
_DOMAIN_QUALITY_SQL = """
WITH w AS (
  SELECT doc_id, lang || '.example.com' AS domain,
    string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') AS ws
  FROM documents
),
s AS (
  SELECT doc_id, domain, len(ws) AS n_words,
    (SELECT coalesce(sum(strlen(x)), 0) FROM unnest(ws) AS t(x)) AS total_len,
    (SELECT count(*) FROM unnest(ws) AS t(x) WHERE x IN ('the','a')) AS n_stop,
    (SELECT count(*) FROM unnest(ws) AS t(x) WHERE strlen(x) <= 3) AS n_short,
    (SELECT coalesce(max(c), 0) FROM
       (SELECT count(*) c FROM unnest(ws) AS t(x) GROUP BY x)) AS mode_cnt
  FROM w
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN n_words BETWEEN 30 AND 80
             AND 10 * total_len >= 43 * n_words
             AND 10 * total_len <= 48 * n_words
             AND n_stop >= 2
             AND 100 * n_short <= 25 * n_words
             AND 100 * mode_cnt <= 10 * n_words THEN 1 ELSE 0 END) AS BIGINT)
    AS n_pass,
  CAST(sum(n_words) AS BIGINT) AS total_words
FROM s GROUP BY domain
"""


@query("domain_quality", _DOMAIN_QUALITY_SQL)
def q_domain_quality(sf_dir: str):
    from ray.data.aggregate import Sum

    from .queries_text import gopher_rules_batch

    def partial(batch: pa.Table) -> pa.Table:
        flags = gopher_rules_batch(
            batch.select(["doc_id", "text"])
        )
        domain = pc.binary_join_element_wise(
            batch["lang"], ".example.com", ""
        ).to_numpy(zero_copy_only=False)
        doms, inv = np.unique(domain, return_inverse=True)
        n = len(doms)
        passes = flags["passes"].to_numpy(zero_copy_only=False)
        n_words = flags["n_words"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "domain": pa.array(doms, type=pa.string()),
                "n_docs": pa.array(
                    np.bincount(inv, minlength=n).astype(np.int64)
                ),
                "n_pass": pa.array(
                    np.bincount(
                        inv, weights=passes, minlength=n
                    ).astype(np.int64)
                ),
                "total_words": pa.array(
                    np.bincount(
                        inv, weights=n_words, minlength=n
                    ).astype(np.int64)
                ),
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("domain")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_pass", alias_name="n_pass"),
            Sum("total_words", alias_name="total_words"),
        )
    )


# ---------------------------------------------------------------------------
# URL-canonicalization dedup (crawl-side exact dedup): raw URLs arrive
# messy (host case, trailing slash, tracking query params — planted
# deterministically by doc_id % 4), the canonicalizer normalizes with REAL
# string kernels (Arrow C regex/lower, not the closed form), and one
# groupby on the canonical key resolves keeper + group size. The shuffle
# key is the canonical URL — uniformly hash-distributed, no hot key.
# ---------------------------------------------------------------------------
_URL_DEDUP_SQL = """
WITH c AS (
  SELECT doc_id,
         'https://' || lang || '.example.com/' || source || '/'
            || CAST(doc_id % 50 AS VARCHAR) AS canonical_url
  FROM documents
)
SELECT doc_id, canonical_url,
       min(doc_id) OVER (PARTITION BY canonical_url) AS keeper_doc,
       CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT)
         AS group_size
FROM c
"""


def _messy_urls(batch: pa.Table) -> "pa.ChunkedArray":
    """Deterministic messy raw URLs: base path shared by doc_id % 50 within
    (lang, source), plus a doc_id % 4 defect (uppercase host / trailing
    slash / tracking params / clean)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    residue = pc.cast(
        pa.array(ids % 50), pa.string()
    )
    host = pc.binary_join_element_wise(
        batch["lang"], ".example.com", ""
    )
    variant = ids % 4
    host = pa.array(
        np.where(
            variant == 1,
            pc.utf8_upper(host).to_numpy(zero_copy_only=False),
            host.to_numpy(zero_copy_only=False),
        ),
        type=pa.string(),
    )
    suffix = pa.array(
        np.where(
            variant == 2,
            "/",
            np.where(variant == 3, "?utm_source=feed&ref=crawler", ""),
        ),
        type=pa.string(),
    )
    return pc.binary_join_element_wise(
        "https://", host, "/", batch["source"], "/", residue, suffix, ""
    )


def canonicalize_urls(raw: "pa.Array") -> "pa.Array":
    """Real canonicalization kernels: strip query/fragment, strip the
    trailing slash RUN (idempotent — '//' tails collapse in one pass; the
    [^:/] guard leaves the scheme's '://' alone), lowercase."""
    no_query = pc.replace_substring_regex(raw, r"[?#].*$", "")
    no_slash = pc.replace_substring_regex(
        no_query, r"(?P<keep>[^:/])/+$", "\\1"
    )
    return pc.utf8_lower(no_slash)


@query("url_dedup", _URL_DEDUP_SQL)
def q_url_dedup(sf_dir: str):
    import pandas as pd

    from ..stages.buckets import string_hash64
    from .extraction import parquet_num_rows

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") // 256)

    def canon(batch: pa.Table) -> pa.Table:
        urls = canonicalize_urls(_messy_urls(batch))
        # hash bucket (~256 urls per map_groups dispatch): vectorized
        # deterministic string hash (stages/buckets.string_hash64)
        hb = (
            string_hash64(urls.to_numpy(zero_copy_only=False))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canonical_url": urls,
                "_ub": pa.array(hb),
            }
        )

    def resolve_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # per-url keeper/size across the bucket: one lexsort (url primary,
        # doc secondary), segment heads are keepers, lengths are sizes
        url = g["canonical_url"].to_numpy()
        doc = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc, url))
        u, d = url[order], doc[order]
        change = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        sizes = np.diff(np.r_[starts, len(u)]).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": d,
                "canonical_url": u,
                "keeper_doc": d[starts][seg],
                "group_size": sizes[seg],
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "lang", "source"])
        .map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(resolve_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Z-order layout clustering (data-layout optimization for scan pruning):
# interleave the bits of (lang code, length bucket) into a Morton key,
# derive the storage partition from the key prefix, and report per-partition
# locality stats — the min/max ranges a format like Lance/Iceberg would
# store as zone maps. Two-level aggregate: packed (partition, lang) partials
# per batch, one single-key groupby, then a tiny per-partition merge.
# ---------------------------------------------------------------------------
_ZORDER_SQL = """
WITH m AS (
  SELECT doc_id, n_chars,
    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
              WHEN 'fr' THEN 3 ELSE 4 END AS lc,
    least(n_chars // 128, 7) AS lb
  FROM documents
),
z AS (
  SELECT lc, n_chars,
    (lc % 2) + 2 * (lb % 2) + 4 * ((lc // 2) % 2) + 8 * ((lb // 2) % 2)
      + 16 * ((lc // 4) % 2) + 32 * ((lb // 4) % 2) AS zkey
  FROM m
)
SELECT CAST(zkey // 4 AS BIGINT) AS partition_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT lc) AS BIGINT) AS n_langs,
  CAST(min(n_chars) AS BIGINT) AS min_chars,
  CAST(max(n_chars) AS BIGINT) AS max_chars
FROM z GROUP BY partition_id
"""

_ZORDER_LANGS = ("de", "en", "es", "fr")  # others -> code 4


@query("zorder_layout", _ZORDER_SQL)
def q_zorder_layout(sf_dir: str):
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lc = np.full(len(lang), 4, dtype=np.int64)
        for code, l in enumerate(_ZORDER_LANGS):
            lc[lang == l] = code
        lb = np.minimum(nch // 128, 7)
        zkey = (
            (lc % 2)
            + 2 * (lb % 2)
            + 4 * ((lc // 2) % 2)
            + 8 * ((lb // 2) % 2)
            + 16 * ((lc // 4) % 2)
            + 32 * ((lb // 4) % 2)
        )
        part = zkey // 4
        pkey = part * 8 + lc  # packed single groupby key (perf: multi-key
        # hash aggregates are pathological on many small blocks)
        vals, inv = np.unique(pkey, return_inverse=True)
        n = np.bincount(inv)
        mn = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(vals), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, nch)
        np.maximum.at(mx, inv, nch)
        return pa.table(
            {
                "pkey": pa.array(vals),
                "n": pa.array(n.astype(np.int64)),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
            }
        )

    per_lang = (
        read_documents(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
        )
        .repartition(4)
    )

    def to_partition(batch: pa.Table) -> pa.Table:
        pk = batch["pkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "partition_id", pa.array((pk // 8).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "partition_id": [int(g["partition_id"].iloc[0])],
                "n_docs": [int(g["n"].sum())],
                "n_langs": [int(len(g))],
                "min_chars": [int(g["mn"].min())],
                "max_chars": [int(g["mx"].max())],
            }
        )

    return (
        per_lang.map_batches(to_partition, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Data-quality constraint validation (the assertions a 100 TB ingest runs
# before accepting a dump): per-rule violation counts over the documents
# table. Row-local rules are one vectorized pass + a 6-row aggregate; the
# uniqueness rule is the one genuinely global check (distinct-count
# shuffle on doc_id).
# ---------------------------------------------------------------------------
_VALIDATE_SQL = """
SELECT 'dup_doc_id' AS rule,
       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS n_violations
FROM documents
UNION ALL
SELECT 'n_chars_mismatch',
       CAST(sum(CASE WHEN text IS NULL OR n_chars <> strlen(text)
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'bad_lang',
       CAST(sum(CASE WHEN lang IS NULL
                      OR lang NOT IN ('de','en','es','fr','zh')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'bad_source',
       CAST(sum(CASE WHEN source IS NULL OR source NOT LIKE 'src%'
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'null_text',
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
"""

_VALID_LANGS = ("de", "en", "es", "fr", "zh")


@query("validate_documents", _VALIDATE_SQL)
def q_validate_documents(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    n_rows = ds.count()
    _RULES = ["dup_doc_id", "n_chars_mismatch", "bad_lang", "bad_source",
              "null_text"]
    if n_rows == 0:
        return pa.table(
            {
                "rule": pa.array(_RULES, type=pa.string()),
                "n_violations": pa.array(np.zeros(5, dtype=np.int64)),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        tl = pc.fill_null(pc.utf8_length(text), -1).to_numpy(
            zero_copy_only=False
        )
        null_text = int(pc.sum(pc.is_null(text)).as_py() or 0)
        mism = int((tl != nch).sum())
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        bad_lang = int(
            (~np.isin(lang.astype(str), _VALID_LANGS)).sum()
        )
        src = batch["source"]
        bad_src = int(
            pc.sum(
                pc.invert(
                    pc.fill_null(pc.starts_with(src, "src"), False)
                )
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "rule": pa.array(
                    ["n_chars_mismatch", "bad_lang", "bad_source",
                     "null_text"],
                    type=pa.string(),
                ),
                "n_violations": pa.array(
                    np.array([mism, bad_lang, bad_src, null_text],
                             dtype=np.int64)
                ),
            }
        )

    row_rules = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("rule")
        .aggregate(Sum("n_violations", alias_name="n_violations"))
        .to_pandas()
    )
    # global uniqueness: exact distinct-count shuffle
    n_distinct = (
        ds.select_columns(["doc_id"]).groupby("doc_id").count().count()
        if n_rows
        else 0
    )
    rules = dict(zip(row_rules["rule"], row_rules["n_violations"]))
    order = ["dup_doc_id", "n_chars_mismatch", "bad_lang", "bad_source",
             "null_text"]
    vals = [n_rows - n_distinct] + [int(rules.get(r, 0)) for r in order[1:]]
    return pa.table(
        {
            "rule": pa.array(order, type=pa.string()),
            "n_violations": pa.array(np.array(vals, dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Column profiler (the stats pass a lakehouse ingest records per column):
# null count, exact distinct count, lexicographic min/max per column —
# null/min/max from one vectorized pass + a 5-row merge; distinct counts
# are per-column groupby shuffles (exact, the profiler's honest cost).
# ---------------------------------------------------------------------------
_PROFILE_COLS = ("doc_id", "lang", "n_chars", "source", "text")

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM documents"""
    for c in _PROFILE_COLS
)


@query("profile_columns", _PROFILE_SQL)
def q_profile_columns(sf_dir: str):
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    n_rows = ds.count()

    def null_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "col": pa.array(list(_PROFILE_COLS), type=pa.string()),
                "n_null": pa.array(
                    np.array(
                        [
                            int(pc.sum(pc.is_null(batch[c])).as_py() or 0)
                            for c in _PROFILE_COLS
                        ],
                        dtype=np.int64,
                    )
                ),
            }
        )

    if n_rows == 0:
        return pa.table(
            {
                "col": pa.array(list(_PROFILE_COLS), type=pa.string()),
                "n_null": pa.array(np.zeros(5, dtype=np.int64)),
                "n_distinct": pa.array(np.zeros(5, dtype=np.int64)),
                "min_val": pa.array([None] * 5, type=pa.string()),
                "max_val": pa.array([None] * 5, type=pa.string()),
            }
        )

    nulls_df = (
        ds.map_batches(
            null_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("col")
        .aggregate(Sum("n_null", alias_name="n_null"))
        .to_pandas()
        .set_index("col")
    )
    # min/max in NATIVE types in one distributed aggregate pass (merging
    # stringified numeric partials would compare lexicographically:
    # '95' > '499'), stringified only at the very end
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(Min(c, alias_name=f"min_{c}"))
        aggs.append(Max(c, alias_name=f"max_{c}"))
    mm = ds.aggregate(*aggs)

    # distinct counts for ALL profiled columns in ONE shuffle: per-batch
    # distinct (col, tagged-value) keys (type tag keeps int/str exact, no
    # lexicographic aliasing), one groupby over the unified key stream,
    # then a per-block combiner + tiny Sum per column — replaces one
    # corpus-wide groupby PER COLUMN (5 all-to-alls -> 1)
    from ray.data.aggregate import Count

    def distinct_partial(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        for ci, c in enumerate(_PROFILE_COLS):
            col = batch[c]
            vals = pc.unique(col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col)
            for v in vals.to_pylist():
                if v is None:
                    continue  # count(DISTINCT) is non-null only
                keys.append(f"{ci}\x01{type(v).__name__}\x01{v}")
        return pa.table({"key": pa.array(keys, type=pa.string())})

    def col_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0 or "key" not in batch.column_names:
            return pa.table(
                {
                    "col": pa.array([], type=pa.string()),
                    "nd_part": pa.array([], type=pa.int64()),
                }
            )
        ks = batch["key"].to_pylist()
        cnt = np.zeros(len(_PROFILE_COLS), dtype=np.int64)
        for s in ks:
            cnt[int(s.split("\x01", 1)[0])] += 1
        return pa.table(
            {
                "col": pa.array(list(_PROFILE_COLS), type=pa.string()),
                "nd_part": pa.array(cnt),
            }
        )

    ddf = (
        ds.map_batches(
            distinct_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("key")
        .aggregate(Count(alias_name="n"))
        .map_batches(col_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("nd_part", alias_name="nd"))
        .to_pandas()
        .set_index("col")
    )
    distinct = {
        c: int(ddf.loc[c, "nd"]) if c in ddf.index else 0
        for c in _PROFILE_COLS
    }
    return pa.table(
        {
            "col": pa.array(list(_PROFILE_COLS), type=pa.string()),
            "n_null": pa.array(
                np.array(
                    [int(nulls_df.loc[c, "n_null"]) for c in _PROFILE_COLS],
                    dtype=np.int64,
                )
            ),
            "n_distinct": pa.array(
                np.array([distinct[c] for c in _PROFILE_COLS], dtype=np.int64)
            ),
            "min_val": pa.array(
                [
                    None if mm[f"min_{c}"] is None else str(mm[f"min_{c}"])
                    for c in _PROFILE_COLS
                ],
                type=pa.string(),
            ),
            "max_val": pa.array(
                [
                    None if mm[f"max_{c}"] is None else str(mm[f"max_{c}"])
                    for c in _PROFILE_COLS
                ],
                type=pa.string(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Poison-row quarantine, oracle-checked end to end: a scoring kernel that
# (deterministically) blows up on planted poison docs runs wrapped in the
# bisecting quarantine stage; poison rows land in the error channel with
# their doc_id preserved, clean rows keep their computed value. The planted
# rule is closed-form, so WHICH rows were quarantined — not just how many —
# is value-checked by SQL.
# ---------------------------------------------------------------------------
_POISON_MOD, _POISON_RESIDUE = 97, 13

_QUARANTINE_SQL = f"""
SELECT doc_id,
       CAST(CASE WHEN doc_id % {_POISON_MOD} = {_POISON_RESIDUE}
                 THEN 1 ELSE 0 END AS BIGINT) AS quarantined,
       CAST(CASE WHEN doc_id % {_POISON_MOD} = {_POISON_RESIDUE}
                 THEN NULL ELSE n_chars * 2 END AS BIGINT) AS score
FROM documents WHERE text IS NOT NULL
"""


def _poison_score_kernel(batch: pa.Table) -> pa.Table:
    """Doubles n_chars; raises on planted poison rows (stands in for a
    kernel hitting corrupt payloads — the bisection must isolate them)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if ((ids % _POISON_MOD) == _POISON_RESIDUE).any():
        raise ValueError("corrupt payload")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "score": pc.multiply(
                batch["n_chars"].cast(pa.int64()), pa.scalar(2)
            ),
        }
    )


@query("extract_quarantined", _QUARANTINE_SQL)
def q_extract_quarantined(sf_dir: str):
    from ..stages.quarantine import quarantine_batch_fn

    safe = quarantine_batch_fn(_poison_score_kernel)

    def finish(batch: pa.Table) -> pa.Table:
        quarantined = pc.cast(
            pc.is_valid(batch["_error"]), pa.int64()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "quarantined": quarantined,
                "score": batch["score"].cast(pa.int64()),
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(
            lambda t: t.drop_columns(["text"]),
            batch_format="pyarrow", batch_size=None,
        )
        .map_batches(safe, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Zone-map pruned scan — the consumer side of zorder_layout: a predicate
# (lang = 'en' AND n_chars BETWEEN 200 AND 400) is answered by first
# checking each Z-order partition's zone maps (min/max chars + lang
# presence) and scanning only surviving partitions. The oracle recomputes
# the zone maps AND the exact per-partition match counts, so the output
# proves the pruning is SOUND (pruned partitions hold zero matches) and
# reports the skip ratio a Lance/Iceberg reader would realize. One scan,
# one packed-key aggregate, partition-level (tiny) finish.
# ---------------------------------------------------------------------------
_PRUNE_LO, _PRUNE_HI = 200, 400

_ZONE_PRUNE_SQL = f"""
WITH m AS (
  SELECT doc_id, n_chars,
    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
              WHEN 'fr' THEN 3 ELSE 4 END AS lc,
    least(n_chars // 128, 7) AS lb
  FROM documents
),
z AS (
  SELECT lc, n_chars,
    (lc % 2) + 2 * (lb % 2) + 4 * ((lc // 2) % 2) + 8 * ((lb // 2) % 2)
      + 16 * ((lc // 4) % 2) + 32 * ((lb // 4) % 2) AS zkey
  FROM m
),
part AS (SELECT zkey // 4 AS pid, lc, n_chars FROM z),
zone AS (
  SELECT pid, min(n_chars) AS mn, max(n_chars) AS mx,
         max(CASE WHEN lc = 1 THEN 1 ELSE 0 END) AS has_en,
         count(*) AS nrows,
         sum(CASE WHEN lc = 1 AND n_chars BETWEEN {_PRUNE_LO} AND {_PRUNE_HI}
                  THEN 1 ELSE 0 END) AS nmatch
  FROM part GROUP BY pid
)
SELECT CAST(pid AS BIGINT) AS partition_id,
       (NOT (mx < {_PRUNE_LO} OR mn > {_PRUNE_HI} OR has_en = 0))
         AS scanned,
       CAST(nrows AS BIGINT) AS rows_in_partition,
       CAST(nmatch AS BIGINT) AS rows_matched
FROM zone
"""


@query("zone_map_prune_scan", _ZONE_PRUNE_SQL)
def q_zone_map_prune_scan(sf_dir: str):
    from ray.data.aggregate import Max, Min, Sum

    from .extraction import read_documents

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lc = np.full(len(lang), 4, dtype=np.int64)
        for code, l in enumerate(("de", "en", "es", "fr")):
            lc[lang == l] = code
        lb = np.minimum(nch // 128, 7)
        zkey = (
            (lc % 2) + 2 * (lb % 2) + 4 * ((lc // 2) % 2)
            + 8 * ((lb // 2) % 2) + 16 * ((lc // 4) % 2)
            + 32 * ((lb // 4) % 2)
        )
        pid = zkey // 4
        vals, inv = np.unique(pid, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mn = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(vals), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, nch)
        np.maximum.at(mx, inv, nch)
        en = np.zeros(len(vals), dtype=np.int64)
        np.maximum.at(en, inv, (lc == 1).astype(np.int64))
        match = (
            (lc == 1) & (nch >= _PRUNE_LO) & (nch <= _PRUNE_HI)
        ).astype(np.int64)
        nm = np.zeros(len(vals), dtype=np.int64)
        np.add.at(nm, inv, match)
        return pa.table(
            {
                "pid": pa.array(vals),
                "n": pa.array(n),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
                "has_en": pa.array(en),
                "nmatch": pa.array(nm),
            }
        )

    zones = (
        read_documents(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pid")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Max("has_en", alias_name="has_en"),
            Sum("nmatch", alias_name="nmatch"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        mn = batch["mn"].to_numpy(zero_copy_only=False)
        mx = batch["mx"].to_numpy(zero_copy_only=False)
        en = batch["has_en"].to_numpy(zero_copy_only=False)
        scanned = ~((mx < _PRUNE_LO) | (mn > _PRUNE_HI) | (en == 0))
        return pa.table(
            {
                "partition_id": batch["pid"].cast(pa.int64()),
                "scanned": pa.array(scanned),
                "rows_in_partition": batch["n"].cast(pa.int64()),
                "rows_matched": batch["nmatch"].cast(pa.int64()),
            }
        )

    return zones.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
