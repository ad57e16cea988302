"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Headline: flagship extraction throughput (docs/sec) over a deterministic
amplification of the sf documents table (replicated with shifted doc_ids so
content, strike patterns, and span mixes vary per replica). Also times a
representative subset of the query registry.

Usage:
  python bench.py                 # sf dir from $GRAFT_SF_DIR (default sf0.1),
                                  # cpus from $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling       # same pipeline at N vs 4N cpus (default
                                  # 4 vs 16) in fresh processes; prints
                                  # scaling efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("GRAFT_AMPLIFY", "2048"))
N_BLOCKS = int(os.environ.get("GRAFT_BLOCKS", "256"))

BENCH_QUERIES = [
    "extract_spans",
    "extract_spans_shuffled",
    "dedup_exact",
    "minhash_bands",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_topk",
    "q1_pricing",
    "revenue_by_nation",
    "events_window",
    "sessionize",
    "media_classify",
    "extract_spans_cv",
    # round-4 additions
    "token_freq_spans",
    "dsir_resample",
    "audio_spectrogram",
    "interleaved_pairs",
    "merge_upsert",
    "psi_drift",
    # round-2 additions
    "page_orientation",
    "decontaminate",
    "repetition_stats",
    "stratified_sample",
    "chunk_examples",
    "pack_examples",
    "keywords_per_doc",
    "video_frame_sample",
    # round-2 late additions (retrieval / scrub / sketch-join family)
    "bm25_topk",
    "pii_redact",
    "heavy_hitters",
    "vocab_encode",
    "bloom_join_revenue",
    "length_outliers",
    "segment_dedup",
    # round-2 final additions (corpus-trained models / graph / quantization)
    "lm_score",
    "nb_lang",
    "ccnet_buckets",
    "pagerank",
    "dedup_clusters",
    "embedding_quantize",
    "label_centroids",
    # round-2 closing additions (CDC / event analytics / edit-distance /
    # PCA+SemDeDup / global rank / audio / JSON)
    "snapshot_diff",
    "cohort_retention",
    "rolling_event_sum",
    "dedup_edit_distance",
    "pca_project",
    "semdedup",
    "global_rank_orders",
    "audio_features",
    "props_json_stats",
    # round-2 continuation (curation + image dedup + hard negatives)
    "gopher_rules",
    "domain_quality",
    "hard_negatives",
    "image_phash_dedup",
    "curation_pipeline",
    "substring_dedup",
    "ann_filtered",
    "incremental_neardup",
    "scd2_history",
    "video_shot_detect",
    "url_dedup",
    "zorder_layout",
    "validate_documents",
    "profile_columns",
    "extract_quarantined",
    "t5_span_corruption",
    "chunk_overlap",
    "contrastive_pairs",
    "pq_encode",
    "ann_topk_pq",
    "bm25_passages",
    "cooccur_pairs",
    "kcore_survivors",
    "daily_active_users",
    "feature_matrix",
    "recency_scores",
    "rate_changepoint",
    "source_quotas",
    "shard_skew_report",
    "weekly_active_users",
    "dup_size_histogram",
    # round-3 additions (nested-spans-native inputs + trp analogs + top-k)
    "extract_spans_capped",
    "dedup_exact_spans",
    "merge_tables",
    "kv_ocr_confidence",
    "top_orders",
    # round-3 continuation (storage layer: sampling / compaction / sketch)
    "weighted_sample",
    "compaction_plan",
    "distinct_hll",
    "fuzzy_decontaminate",
    # round-3 late additions (real codecs / WAV family / split / CMS)
    "media_decode_classify_jpeg",
    "audio_stats",
    "audio_vad",
    "leakage_safe_split",
    "heavy_hitters_cms",
    "cdc_dedup",
    "doc_skyline",
    "unigram_tokenize",
    "page_compress_jpeg",
    "zone_map_prune_scan",
    # round-4 continuation (chunk-exact spans-native variants + mining)
    "minhash_bands_spans",
    "quality_stats_spans",
    "decontaminate_spans",
    "bitext_mine",
    "curation_pipeline_spans",
    "simhash_spans",
    "media_layout_spans",
    "media_context_spans",
    "section_stats_spans",
    # round-5 additions (reference end-state sinks + outline)
    "media_summarize_spans",
    "embeddings_export",
    "doc_outline",
    # round-5 bucket-combine rewrites not previously tracked
    "event_gap_stats",
    "dedup_minhash",
    "inverted_index",
    "topk_per_customer",
    "asof_purchase_click",
    "range_join_counts",
    "latest_event_per_user",
    "running_totals",
    "sliding_window",
    "corpus_curate",
    "doc_artifacts",
    "block_repair_stats",
    "funnel_counts",
    "knn_classify",
]


def host_probe() -> float:
    """Fixed single-thread memory+ALU workload, timed. This sandbox is a VM
    whose hypervisor host is sometimes heavily contended (measured: the SAME
    probe ranges 0.3 s idle to >12 s throttled), which inflates every
    wall-clock number in this file uniformly. The probe is reported in the
    bench JSON so round-over-round deltas can be normalized: compare
    docs_per_sec only between runs with similar host_probe_sec, or scale by
    the probe ratio as a first-order correction."""
    import numpy as np

    x = (np.arange(50_000_000, dtype=np.int64) % 251).astype(np.uint8)
    t0 = time.time()
    acc = 0.0
    for _ in range(2):
        acc += float(x.astype(np.float64).sum())
    assert acc > 0
    return time.time() - t0


def amplified_documents(sf_dir: str, replicas: int, n_blocks: int):
    """documents table replicated `replicas` times with shifted doc_ids —
    deterministic, derived only from the driver-provided testdata.

    The small source file is repartitioned to `n_blocks` BEFORE amplifying so
    the pipeline has real task parallelism (a single-file read is one block;
    a union of single-block branches schedules one task per branch — both
    starve the CPU pool)."""
    import pyarrow as pa
    import ray.data

    from ocr_machine_ray.pipelines.extraction import DOC_COLUMNS

    def amplify(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = len(batch)
        idx = np.tile(np.arange(n, dtype=np.int64), replicas)
        out = batch.take(pa.array(idx))  # one C-level gather, no table loop
        shift = np.repeat(
            np.arange(replicas, dtype=np.int64) * 10_000_000, n
        )
        ids = out["doc_id"].to_numpy(zero_copy_only=False) + shift
        return out.set_column(
            out.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(ids, type=pa.int64()),
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=DOC_COLUMNS
    )
    return ds.repartition(n_blocks).map_batches(
        amplify, batch_format="pyarrow"
    )


def run_headline(sf_dir: str, replicas: int) -> dict:
    """Extraction pipeline over the amplified corpus, consumed streaming."""
    import pyarrow as pa

    from ocr_machine_ray.corpus import derive_spans_batch
    from ocr_machine_ray.pipelines.extraction import (
        _strike_and_reassemble,
        _to_flat_output,
    )

    import numpy as np

    import pyarrow.parquet as pq

    docs = amplified_documents(sf_dir, replicas, N_BLOCKS)
    # row count from parquet metadata — a full count() would execute the
    # whole amplify chain once more for a number we already know
    n_docs = (
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * replicas
    )

    def summarize(batch: pa.Table) -> pa.Table:
        """Per-block accounting row (the lineage-record pattern): the span
        payloads stay inside the fused task instead of flooding the object
        store — the same reason production sinks write partitioned files
        from within the task."""
        return pa.table(
            {
                "n_spans": pa.array([len(batch)], type=pa.int64()),
                "n_docs": pa.array(
                    [
                        len(
                            np.unique(
                                batch["doc_id"].to_numpy(zero_copy_only=False)
                            )
                        )
                    ],
                    type=pa.int64(),
                ),
            }
        )

    t0 = time.time()
    out = (
        docs.map_batches(derive_spans_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
        .map_batches(_strike_and_reassemble, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(_to_flat_output, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)
    )
    # consume the tiny summary rows on the driver: iter_batches avoids the
    # Aggregate all-to-all, which costs ~9s of fixed overhead on 256
    # single-row blocks (measured via ds.stats())
    n_spans = 0
    for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_spans += int(b["n_spans"].to_numpy(zero_copy_only=False).sum())
    wall = time.time() - t0
    return {
        "wall_sec": wall,
        "n_docs": n_docs,
        "n_spans": n_spans,
        "docs_per_sec": n_docs / wall if wall > 0 else 0.0,
    }


QUERY_BUDGET_SEC = float(os.environ.get("GRAFT_QUERY_BUDGET_SEC", "1800"))


def light_probe() -> float:
    """1/5-size host_probe (~0.06 s clean) cheap enough to run before EVERY
    timed query: per-query contention stamps make an outlier adjudicable
    (the round-3 90 s JPEG reading was undiagnosable because only the whole
    run was probe-bracketed)."""
    import numpy as np

    x = (np.arange(10_000_000, dtype=np.int64) % 251).astype(np.uint8)
    t0 = time.time()
    acc = 0.0
    for _ in range(2):
        acc += float(x.astype(np.float64).sum())
    assert acc > 0
    return time.time() - t0


def run_queries(sf_dir: str):
    """Times the registry subset, min-of-2 per query, under a soft wall
    budget: under a hypervisor storm every number inflates ~10x and an
    unbounded loop can outlive the caller's timeout — dying mid-run loses
    the WHOLE metric line. When the budget trips, remaining names land in
    the separate ``untimed`` list (NOT mixed into the timings dict, where
    a sentinel would poison any consumer summing/averaging/min-ing).

    Returns (times, meta, untimed): ``meta[name]`` carries the query's
    start offset within the loop (``ts``) and a light host-contention
    probe taken immediately before it (``probe``), so any per-query
    outlier is attributable to a burst without re-running the bench."""
    from ocr_machine_ray import registry

    qs = registry.queries()
    times: dict[str, float] = {}
    meta: dict[str, dict] = {}
    untimed: list[str] = []
    start = time.time()
    for name in BENCH_QUERIES:
        if time.time() - start > QUERY_BUDGET_SEC:
            untimed.append(name)  # budget exhausted: untimed, not slow
            continue
        probe = round(light_probe(), 3)
        ts = round(time.time() - start, 1)
        best = None
        for _ in range(2):  # min-of-2: same burst defense as the headline
            t0 = time.time()
            res = qs[name](sf_dir)
            if hasattr(res, "count"):
                res.count()  # consume without driver materialization
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
            if time.time() - start > QUERY_BUDGET_SEC:
                break
        times[name] = round(best, 3)
        meta[name] = {"ts": ts, "probe": probe}
        if best > 4.0:
            # slow entry: bracket it so a burst INSIDE the query is
            # attributable (the pre-probe alone missed r3's 90 s outlier)
            meta[name]["probe_post"] = round(light_probe(), 3)
    return times, meta, untimed


def main_single() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__  # noqa: F401  (registers pickle-by-value)

    # wait out hypervisor contention bursts (bounded): a burst can triple
    # every wall-clock number; probing before starting costs seconds and
    # saves an uninterpretable round record
    probe_pre = round(host_probe(), 3)
    for _ in range(4):
        if probe_pre <= 0.5:
            break
        time.sleep(45)
        probe_pre = round(host_probe(), 3)

    # warm page cache, worker pool (spawn + imports), and allocator pools
    # with one UNTIMED full-scale pass — a reduced-scale warm leaves the
    # first timed run ~30% slower (measured)
    run_headline(SF_DIR, AMPLIFY)

    # Every timed headline leg is probe-BRACKETED so the round record can
    # adjudicate a burst per leg, not per run (the r4 driver window read
    # 44.7 s at probes 0.32/0.34 and was unadjudicable leg-by-leg). A leg
    # is clean when both its probes are < 0.35 AND they agree within 20%
    # (skew = a burst started/ended inside the leg). If neither of the two
    # standard legs is clean, wait out the burst (bounded) and retry up to
    # two extra legs — the goal is ONE clean-window number on the record.
    def timed_leg() -> dict:
        p0 = round(host_probe(), 3)
        h = run_headline(SF_DIR, AMPLIFY)
        h["probe_pre"] = p0
        h["probe_post"] = round(host_probe(), 3)
        return h

    def leg_clean(leg: dict) -> bool:
        hi = max(leg["probe_pre"], leg["probe_post"])
        lo = min(leg["probe_pre"], leg["probe_post"])
        return hi < 0.35 and (hi - lo) <= 0.2 * lo

    legs = [timed_leg(), timed_leg()]
    for _ in range(2):
        if any(leg_clean(l) for l in legs):
            break
        for _ in range(4):  # bounded burst wait between retries
            if host_probe() <= 0.5:
                break
            time.sleep(45)
        legs.append(timed_leg())
    clean_legs = [l for l in legs if leg_clean(l)]
    head = min(clean_legs or legs, key=lambda l: l["wall_sec"])
    # first-order probe correction (committed clean-window probe ~0.27;
    # inflation is super-linear in probe, so this UNDER-corrects — it is
    # an adjudication aid, never the headline value)
    leg_probe = (head["probe_pre"] + head["probe_post"]) / 2.0
    probe_corrected = round(
        head["wall_sec"] * min(1.0, 0.27 / max(leg_probe, 1e-6)), 3
    )
    if os.environ.get("GRAFT_SKIP_QUERIES"):
        queries, query_meta, untimed = {}, {}, []
    else:
        # a burst that inflated a headline run is often still live when
        # the query loop starts (r3: head_b 44 s -> the first queries
        # recorded 8 s for 0.7 s pipelines); wait it out, bounded
        walls = [l["wall_sec"] for l in legs]
        if max(walls) > 2 * head["wall_sec"]:
            for _ in range(4):
                if host_probe() <= 0.5:
                    break
                time.sleep(45)
        queries, query_meta, untimed = run_queries(SF_DIR)
    result = {
        "metric": "extraction wall sec (amplified corpus)",
        "value": round(head["wall_sec"], 3),
        "unit": "sec",
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "n_docs": head["n_docs"],
        "n_spans": head["n_spans"],
        "queries": queries,
        "query_meta": query_meta,
        "untimed": untimed,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "amplify": AMPLIFY,
        # pre/post bracket: a burst INSIDE the run shows as pre/post skew
        # (a single sample can miss it entirely)
        "host_probe_sec": round(host_probe(), 3),
        "host_probe_pre_sec": probe_pre,
        "runs_sec": [round(l["wall_sec"], 3) for l in legs],
        # per-leg brackets: [probe_pre, wall, probe_post] for each timed
        # headline leg, in run order — the adjudication record
        "headline_legs": [
            [l["probe_pre"], round(l["wall_sec"], 3), l["probe_post"]]
            for l in legs
        ],
        "headline_leg_clean": bool(clean_legs),
        # first-order contention normalization of the chosen leg (see
        # comment at computation; raw wall stays the official value)
        "probe_corrected_sec": probe_corrected,
    }
    # BENCH contract (VERDICT r2 action 5): the driver keeps only a tail of
    # stdout and json-parses the last line — the full 70+-query dict
    # overflowed its window in r2 ("parsed": null). Emit a COMPACT headline
    # line LAST (guaranteed parseable), with the full per-query detail on an
    # earlier line and mirrored to BENCH_LOCAL.json for humans.
    full = dict(result)
    compact = {
        k: v for k, v in result.items() if k not in ("queries", "query_meta")
    }
    # keep per-query timings in the parsed line but cap its byte size: emit
    # the slowest entries first and stop before the driver's tail window
    qitems = sorted(queries.items(), key=lambda kv: -kv[1])
    kept: dict[str, float] = {}
    budget = 1800  # bytes for the queries dict inside the compact line
    used = 0
    for k, v in qitems:
        cost = len(k) + 12
        if used + cost > budget:
            break
        kept[k] = v
        used += cost
    compact["queries"] = kept
    compact["n_queries_timed"] = len(queries)
    compact["n_queries_untimed"] = len(untimed)
    # headline-only runs (GRAFT_SKIP_QUERIES — e.g. the --scaling legs)
    # must not clobber the last FULL per-query record
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LOCAL.json"), "w"
            ) as f:
                json.dump(full, f, indent=1, sort_keys=True)
        except OSError:
            pass
    print(json.dumps(full, separators=(",", ":")))
    print(json.dumps(compact, separators=(",", ":")))
    ray.shutdown()


def main_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SKIP_QUERIES="1")
        env.setdefault("GRAFT_AMPLIFY", "1024")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N parallelism, default 4 vs 16. Clean single-box ladder
    # (docs/s): 2->65.7k, 4->124k, 8->231.7k, 16->487k, 32->726.6k; the
    # 32-cpu point EQUALS the raw-multiprocessing hardware ceiling, i.e.
    # Ray adds ~no overhead. Efficiency: 4->16 = 0.98, 2->8 = 0.88,
    # 8->32 = 0.78 (per-core decline beyond ~16 procs is shared-DRAM
    # bandwidth + turbo-clock roll-off of this one box — a real 4N-node
    # cluster adds memory bandwidth with every node). Benches MUST run
    # with an otherwise idle machine; concurrent work skews legs.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
                f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "n_docs": r_hi["n_docs"],
                "sf": SF_DIR,
                "host_probe_sec": [
                    r_lo.get("host_probe_sec"),
                    r_hi.get("host_probe_sec"),
                ],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_single()
