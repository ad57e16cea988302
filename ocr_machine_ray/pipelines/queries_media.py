"""Driver-checked queries: media pipeline (image synthesis -> actor-pool
classification / CV strikethrough). The oracles are closed-loop: images are
drawn FROM the corpus rules, the image stages must recover those labels from
pixels alone, and the SQL recomputes the labels arithmetically.
"""

from __future__ import annotations


import pyarrow.compute as pc

from ..corpus import SQL_ALL_SPANS, SQL_CATEGORY, SQL_ORIENTATION
from ..functions.images import (
    PHASH_BANDS,
    PHASH_THRESHOLD,
    ahash_stack,
    hamming64,
    pack_hash_bits,
    render_thumb_stack,
)
from ..registry import query
from ..stages.explode import explode_spans
from ..stages.skew import cluster_cpus
from ..stages.media import (
    PageClassifier,
    StrikeCV,
    render_word_regions_batch,
    synth_media_batch,
)
from .extraction import spans_corpus


def _media_rows(sf_dir: str, n_blocks_out: int = 16):
    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    media = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")),
        batch_format="pyarrow", batch_size=None,
    )
    synthed = media.map_batches(
        synth_media_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    # Barrier before any downstream actor pool: without it Ray fuses the
    # whole derive->synth chain INTO the actor operator, whose batch_size
    # then counts DOCUMENT input rows (500 < 512 -> one serial bundle,
    # measured 3.5s -> 1.1s for media_classify at sf0.01/32cpu). Codec
    # queries pass a higher n_blocks_out for task parallelism of the
    # encode/decode maps.
    return synthed.repartition(n_blocks_out)


# ---------------------------------------------------------------------------
# Image classification round-trip: classifier(image) must equal the
# category-derived pattern for every media span.
# ---------------------------------------------------------------------------
_MEDIA_CLASSIFY_SQL = f"""
{SQL_ALL_SPANS}, {SQL_CATEGORY}
SELECT s.doc_id, s.media_ref,
       (c.category = 'tables') AS is_table,
       (c.category = 'diagrams') AS is_diagram
FROM all_spans s JOIN doc_category c ON c.doc_id = s.doc_id
WHERE s.kind = 'media'
"""


@query("media_classify", _MEDIA_CLASSIFY_SQL)
def q_media_classify(sf_dir: str):
    """Synthesize every media payload, classify with the actor pool, emit
    per-media verdicts. Value-equality vs the SQL category proves the
    pixels -> verdict loop end-to-end."""
    return _media_rows(sf_dir).map_batches(
        PageClassifier,
        batch_format="pyarrow",
        batch_size=512,  # actor-pool boundary: input rows are media spans
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Document reassembly sink (S7 full form): every doc's media pages glued
# into ONE ordered binary artifact + manifest (fake_scan.py:319-320,
# white_out_manager.py:40-45). The artifact bytes are pytest-checked
# (SQL cannot draw pixels); the oracle value-checks the structural
# columns: page count, artifact size, ordered manifest.
# ---------------------------------------------------------------------------
from ..functions.images import MEDIA_H, MEDIA_W

_ARTIFACT_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(*) * {MEDIA_W * MEDIA_H} AS BIGINT) AS total_bytes,
       string_agg(media_ref, '|' ORDER BY off) AS manifest
FROM all_spans WHERE kind = 'media'
GROUP BY doc_id
"""


@query("doc_artifacts", _ARTIFACT_SQL)
def q_doc_artifacts(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from ..stages.media import reassemble_doc_media

    def add_db(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_db", pa.array(doc >> 8))

    artifacts = (
        _media_rows(sf_dir)
        .map_batches(add_db, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(reassemble_doc_media, batch_format="pandas")
    )
    return artifacts.map_batches(
        lambda t: t.select(
            ["doc_id", "n_pages", "total_bytes", "manifest"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Real-codec round trip: media payloads PNG-encoded (pure numpy/zlib
# codec), decoded back, then classified — same closed-loop oracle as
# media_classify, now with an actual interchange format in the middle.
# The encode/decode stages are the actor-pool shape real pipelines use
# for codec work (decode state per actor, batched byte columns).
# ---------------------------------------------------------------------------
@query("media_decode_classify", _MEDIA_CLASSIFY_SQL)
def q_media_decode_classify(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from ..functions.images import decode_external
    from ..functions.png import png_encode

    def encode(batch: pa.Table) -> pa.Table:
        enc = []
        for b, w, h in zip(
            batch["bytes"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = np.frombuffer(b, dtype=np.uint8).reshape(h, w)
            enc.append(png_encode(img))
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "png": pa.array(enc, type=pa.binary()),
            }
        )

    def decode(batch: pa.Table) -> pa.Table:
        imgs = [
            decode_external(b, "png") for b in batch["png"].to_pylist()
        ]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "bytes": pa.array(
                    [i.tobytes() for i in imgs], type=pa.binary()
                ),
                "width": pa.array(
                    [i.shape[1] for i in imgs], type=pa.int32()
                ),
                "height": pa.array(
                    [i.shape[0] for i in imgs], type=pa.int32()
                ),
            }
        )

    encoded = _media_rows(sf_dir, n_blocks_out=64).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    decoded = encoded.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    # second barrier: keep the codec task maps OUT of the actor operator
    # (fused, they'd run inside <=5 oversized actor bundles)
    return decoded.repartition(16).map_batches(
        PageClassifier,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# LOSSY-codec round trip: same closed loop, baseline JPEG (pure numpy codec,
# functions/jpeg.py) in the middle — the reference's actual interchange
# format (fake_scan.py:239-245 re-encodes scanned pages as JPEG). The
# verdicts survive the oracle because the classifier's ruling/blob gates
# have wide margins vs q-85 quantization noise (measured: 0 verdict flips
# across the full sf0.01 media table at q80 and q90).
# ---------------------------------------------------------------------------
@query("media_decode_classify_jpeg", _MEDIA_CLASSIFY_SQL)
def q_media_decode_classify_jpeg(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from ..functions.images import decode_external_batch
    from ..functions.jpeg import jpeg_encode, jpeg_encode_batch

    def encode(batch: pa.Table) -> pa.Table:
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        raw = batch["bytes"].to_pylist()
        if len(set(ws)) <= 1 and len(set(hs)) <= 1 and raw:
            # uniform page size: ONE vectorized pass over the whole stack
            # (byte-identical to per-image encode, ~5x faster)
            stack = np.stack(
                [
                    np.frombuffer(b, dtype=np.uint8).reshape(hs[0], ws[0])
                    for b in raw
                ]
            )
            enc = jpeg_encode_batch(stack, quality=85)
        else:
            enc = [
                jpeg_encode(
                    np.frombuffer(b, dtype=np.uint8).reshape(h, w),
                    quality=85,
                )
                for b, w, h in zip(raw, ws, hs)
            ]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "jpg": pa.array(enc, type=pa.binary()),
            }
        )

    def decode(batch: pa.Table) -> pa.Table:
        # stacked reconstruction across the whole page batch (the per-image
        # list-comprehension decode was the registry's worst bench entry)
        imgs = decode_external_batch(batch["jpg"].to_pylist(), "jpeg")
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "doc_id": batch["doc_id"],
                "bytes": pa.array(
                    [i.tobytes() for i in imgs], type=pa.binary()
                ),
                "width": pa.array(
                    [i.shape[1] for i in imgs], type=pa.int32()
                ),
                "height": pa.array(
                    [i.shape[0] for i in imgs], type=pa.int32()
                ),
            }
        )

    encoded = _media_rows(sf_dir, n_blocks_out=64).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    decoded = encoded.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    # second barrier: keep the codec task maps OUT of the actor operator
    # (fused, they'd run inside <=5 oversized actor bundles — measured
    # 22s -> 5.2s for this query at sf0.01/32cpu with the two barriers)
    return decoded.repartition(16).map_batches(
        PageClassifier,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Page orientation derived from word GEOMETRY (M8): word bboxes are laid
# out by the corpus orientation rule; the enricher recovers the label from
# tall-vs-wide box majority via mergeable per-batch partials + a groupby —
# the fully distributed form of the per-page derivation the CV path does
# batch-locally (reference textract_agent.py:107-110).
# ---------------------------------------------------------------------------
_ORIENT_SQL = f"""
SELECT doc_id, {SQL_ORIENTATION} AS orientation
FROM documents WHERE text IS NOT NULL
"""


@query("page_orientation", _ORIENT_SQL)
def q_page_orientation(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..corpus import FlatTokens, vertical_mask
    from ..functions.geometry import tall_counts, word_bboxes
    from .extraction import read_documents

    def partials(batch: pa.Table) -> pa.Table:
        ft = FlatTokens(batch)
        rule_v = vertical_mask(ft.doc_ids)
        bboxes = word_bboxes(ft.doc_ids.astype(np.int64), ft.i, rule_v)
        tall, total = tall_counts(bboxes, ft.row_idx, len(batch))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "tall": pa.array(tall, type=pa.int64()),
                "total": pa.array(total, type=pa.int64()),
            }
        )

    def majority(batch: pa.Table) -> pa.Table:
        tall = batch["tall"].to_numpy(zero_copy_only=False)
        total = batch["total"].to_numpy(zero_copy_only=False)
        lab = np.where(tall * 2 > total, "vertical", "horizontal")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "orientation": pa.array(lab.tolist(), type=pa.string()),
            }
        )

    return (
        read_documents(sf_dir)
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(
            Sum("tall", alias_name="tall"), Sum("total", alias_name="total")
        )
        .map_batches(majority, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# CV strikethrough round-trip: kernel(image) must equal the strike rule.
# ---------------------------------------------------------------------------
_STRIKE_CV_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, CAST(off AS INT) AS "offset", struck AS struck_cv
FROM all_spans WHERE kind = 'text'
"""


@query("strike_cv_verdicts", _STRIKE_CV_SQL)
def q_strike_cv(sf_dir: str):
    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    words = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "text")),
        batch_format="pyarrow",
    )
    regions = words.map_batches(
        render_word_regions_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # barrier: without it Ray fuses derive->render INTO the actor operator
    # and batch_size counts DOCUMENT input rows (serial-bundle collapse,
    # same trap as _media_rows — measured 14.5s -> 7.9s cold at sf0.01)
    return regions.repartition(cluster_cpus()).map_batches(
        StrikeCV,
        batch_format="pyarrow",
        batch_size=1024,  # actor-pool boundary: input rows here ARE words
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Model-based strikethrough scoring (M11/M12): actor pool holding the
# checkpoint, batched normalized inference. ORACLE-EXACT on the synthetic
# corpus: the scorer's dark-pixel threshold (raw < 64) selects exactly the
# strike-line pixels (drawn at 30; text strokes 70, background >= 230), so
# the verdict equals the strike rule bit-for-bit — checked value-exact
# against SQL. The float score column stays out of the oracle-compared
# output (pytest covers it).
# ---------------------------------------------------------------------------
_STRIKE_MODEL_SQL = f"""
{SQL_ALL_SPANS}
SELECT doc_id, CAST(off AS INT) AS "offset", struck AS struck_model
FROM all_spans WHERE kind = 'text'
"""


@query("strike_model_verdicts", _STRIKE_MODEL_SQL)
def q_strike_model(sf_dir: str):
    from ..stages.scorer import ModelScorer

    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    words = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "text")),
        batch_format="pyarrow",
    )
    regions = words.map_batches(
        render_word_regions_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    scored = regions.repartition(cluster_cpus()).map_batches(
        ModelScorer,
        batch_format="pyarrow",
        batch_size=512,  # actor-pool boundary: input rows here ARE words
        concurrency=(1, 4),
    )
    return scored.map_batches(
        lambda t: t.select(["doc_id", "offset", "struck_model"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Video frame sampling: synthetic multi-frame binaries -> every-2nd-frame
# sampler (stages/media.py:FrameSampler). The oracle value-checks the
# structural output (frame counts and byte sizes follow the corpus rule);
# the byte-level slicing is pytest-checked.
# ---------------------------------------------------------------------------
from ..stages.media import FRAME_BYTES, VIDEO_MOD, VIDEO_RESIDUE

_FRAME_SQL = f"""
SELECT 'v-' || CAST(doc_id AS VARCHAR) AS video_ref,
       doc_id,
       CAST(2 + doc_id % 5 AS BIGINT) AS n_frames,
       CAST((2 + doc_id % 5 + 1) // 2 AS BIGINT) AS n_sampled,
       CAST(((2 + doc_id % 5 + 1) // 2) * {FRAME_BYTES} AS BIGINT)
         AS sampled_bytes
FROM documents
WHERE doc_id % {VIDEO_MOD} = {VIDEO_RESIDUE} AND text IS NOT NULL
"""


@query("video_frame_sample", _FRAME_SQL)
def q_video_frame_sample(sf_dir: str):
    from ..stages.media import sample_frames_batch, synth_video_batch
    from .extraction import read_documents

    # Both legs are codec-heavy: frames are ENCODED in the synth map and
    # entropy-DECODED in the sampler, so both run as WIDE task maps with a
    # repartition barrier between (documents parquet reads as few blocks;
    # without the pre-synth barrier all encoding lands in one task, and
    # without separation Ray fuses the chain into whatever pool is last).
    videos = (
        read_documents(sf_dir, ["doc_id", "text"])
        .repartition(64)
        .map_batches(
            synth_video_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return videos.repartition(cluster_cpus()).map_batches(
        sample_frames_batch, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Audio features: synthetic PCM clips -> actor-pool decode/frame/energy
# (stages/media.py:AudioFeatures). Like the video path, the synthesis rule
# is closed-form in doc_id, so the oracle value-checks every integer
# feature the decode loop computes from the actual BYTES; byte-level
# slicing is pytest-checked (tests/test_media.py).
# ---------------------------------------------------------------------------
from ..stages.media import (  # noqa: E402
    AUDIO_FRAME,
    AUDIO_MOD,
    AUDIO_RESIDUE,
    AUDIO_SR,
)

_AUDIO_SQL = f"""
SELECT 'a-' || CAST(doc_id AS VARCHAR) AS audio_ref, doc_id,
       CAST({AUDIO_SR} * (1 + doc_id % 3) AS BIGINT) AS n_samples,
       CAST({AUDIO_SR} * (1 + doc_id % 3) / {AUDIO_FRAME} AS BIGINT)
           AS n_frames,
       CAST({AUDIO_SR} * (1 + doc_id % 3) / (2 * {AUDIO_FRAME}) AS BIGINT)
           AS n_active_frames,
       CAST((32 + (doc_id % 4) * 24)
            * ({AUDIO_SR} * (1 + doc_id % 3) / 2) AS BIGINT)
           AS total_energy
FROM documents
WHERE doc_id % {AUDIO_MOD} = {AUDIO_RESIDUE} AND text IS NOT NULL
"""


@query("audio_features", _AUDIO_SQL)
def q_audio_features(sf_dir: str):
    from ..stages.media import AudioFeatures, synth_audio_batch
    from .extraction import read_documents

    clips = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        synth_audio_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return clips.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=256,  # binary payloads: bounded batches
        concurrency=(1, 4),
    ).map_batches(
        lambda t: t.drop_columns([c for c in ("pcm",) if c in t.column_names]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Image perceptual-hash near-dup dedup: render a thumbnail per document,
# aHash it (8x8 block means vs global mean), band the 64 bits into 8
# 8-bit LSH keys, star-pair each band bucket against its min-doc
# representative, verify candidates at hamming <= PHASH_THRESHOLD, and
# resolve keepers with one min-aggregate. Linear end-to-end: a bucket of
# n near-identical images emits n star pairs, never n^2 — the hot-bucket
# shape VERDICT r1 flagged in the text dedups is designed out here.
#
# The oracle closes the loop arithmetically: planted motif groups are
# doc_id % PHASH_MOTIFS (functions/images.py, Hamming-[8,4,4] band codes
# guarantee recovery is exact), so keeper/cluster-size are pure SQL.
# ---------------------------------------------------------------------------
_PHASH_SQL = """
SELECT doc_id,
  CAST(min(doc_id) OVER (PARTITION BY doc_id % 16) AS BIGINT) AS keeper_doc,
  CAST(count(*) OVER (PARTITION BY doc_id % 16) AS BIGINT) AS cluster_size
FROM documents
"""


def _phash_band_rows(batch):
    """doc batch -> 8 band rows per doc: (doc_id, band_key, hash64).
    Rendering + hashing is one vectorized pass over the whole stack."""
    import numpy as np
    import pyarrow as pa

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "band_key": pa.array([], type=pa.int64()),
                "hash64": pa.array([], type=pa.int64()),
            }
        )
    h, bands = pack_hash_bits(ahash_stack(render_thumb_stack(ids)))
    n = len(ids)
    band_idx = np.tile(np.arange(PHASH_BANDS, dtype=np.int64), n)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, PHASH_BANDS)),
            "band_key": pa.array(band_idx * 256 + bands.ravel()),
            "hash64": pa.array(np.repeat(h, PHASH_BANDS)),
        }
    )


def _phash_star_pairs(g):
    """One band bucket -> star pairs against the bucket-min doc, verified at
    hamming <= PHASH_THRESHOLD. O(bucket) rows out, never O(bucket^2)."""
    import numpy as np
    import pandas as pd  # noqa: F401 (driver fallback path groups in pandas)
    import pyarrow as pa

    ids = g["doc_id"].to_numpy().astype(np.int64)
    hs = g["hash64"].to_numpy().astype(np.int64)
    i_min = int(np.argmin(ids))
    d = hamming64(hs, np.full(len(hs), hs[i_min], dtype=np.int64))
    keep = (d <= PHASH_THRESHOLD) & (ids != ids[i_min])
    # arrow out so the downstream union with the arrow self-rows stream
    # stays one block type
    return pa.table(
        {
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "cand": pa.array(
                np.full(int(keep.sum()), ids[i_min]), type=pa.int64()
            ),
        }
    )


@query("image_phash_dedup", _PHASH_SQL)
def q_image_phash_dedup(sf_dir: str):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Min, Sum

    from .extraction import parquet_num_rows, read_documents

    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs < 32:
        # degenerate shards: empty hash-join sides reach Ray's joiner as
        # schema-less blocks; run the identical algorithm on the driver
        import pyarrow.parquet as pq_mod

        ids_tbl = pq_mod.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )
        rows = _phash_band_rows(ids_tbl).to_pandas()
        parts = [
            _phash_star_pairs(g).to_pandas()
            for _, g in rows.groupby("band_key")
        ]
        pairs = (
            pd.concat(parts)
            if parts
            else pd.DataFrame({"doc_id": [], "cand": []})
        )
        ids = ids_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        selfs = pd.DataFrame({"doc_id": ids, "cand": ids})
        keeper = (
            pd.concat([pairs, selfs])
            .groupby("doc_id")["cand"]
            .min()
            .rename("keeper_doc")
            .reset_index()
        )
        sizes = keeper.groupby("keeper_doc").size().rename("cluster_size")
        out = keeper.join(sizes, on="keeper_doc")
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "keeper_doc": pa.array(
                    out["keeper_doc"].to_numpy(), pa.int64()
                ),
                "cluster_size": pa.array(
                    out["cluster_size"].to_numpy(), pa.int64()
                ),
            }
        )

    docs = read_documents(sf_dir, ["doc_id"])
    band_rows = docs.map_batches(
        _phash_band_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    from ..stages.buckets import add_hash_bucket, per_key_in_bucket
    from .extraction import parquet_num_rows

    n_buckets = max(8, parquet_num_rows(sf_dir, "documents") * 4 // 256)
    pairs = (
        band_rows.map_batches(
            add_hash_bucket("band_key", n_buckets), batch_format="pyarrow"
        )
        .groupby("_gb")
        .map_groups(
            per_key_in_bucket(_phash_star_pairs, "band_key"),
            batch_format="pandas",
        )
        .repartition(8)  # collapse per-bucket tiny blocks pre-shuffle
    )

    def self_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids), "cand": pa.array(ids)})

    selfs = docs.map_batches(
        self_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    keeper = (
        pairs.union(selfs)
        .groupby("doc_id")
        .aggregate(Min("cand", alias_name="keeper_doc"))
        .repartition(8)
        # keeper feeds BOTH the size aggregate and the final join probe;
        # without a checkpoint Ray re-executes the whole union+aggregate
        # lineage once per consumer (measured 2x on ds.stats())
        .materialize()
    )

    def size_partial(batch: pa.Table) -> pa.Table:
        k = batch["keeper_doc"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    sizes = (
        keeper.map_batches(size_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="cluster_size"))
        .repartition(4)
    )
    joined = keeper.join(
        sizes,
        join_type="inner",
        num_partitions=8,
        on=("keeper_doc",),
        right_on=("k",),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "keeper_doc": t["keeper_doc"].cast(pa.int64()),
                "cluster_size": t["cluster_size"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Shot-boundary detection over multi-scene videos: the detector reads raw
# frame bytes (mean-luma deltas, actor pool); the planted scene cuts are
# closed-form in doc_id so every output column is oracle-exact.
# ---------------------------------------------------------------------------
_SHOT_SQL = f"""
SELECT 'sv-' || CAST(doc_id AS VARCHAR) AS video_ref,
       doc_id,
       CAST(8 + doc_id % 5 AS BIGINT) AS n_frames,
       CAST(2 AS BIGINT) AS n_cuts,
       CAST(2 + doc_id % 3 AS BIGINT) AS cut1,
       CAST(5 + doc_id % 2 AS BIGINT) AS cut2
FROM documents
WHERE doc_id % {VIDEO_MOD} = {VIDEO_RESIDUE} AND text IS NOT NULL
"""


@query("video_shot_detect", _SHOT_SQL)
def q_video_shot_detect(sf_dir: str):
    from ..stages.media import detect_shots_batch, synth_scene_video_batch
    from .extraction import read_documents

    # same two-wide-task-map shape as video_frame_sample (encode in the
    # synth leg, entropy decode in the detector leg)
    videos = (
        read_documents(sf_dir, ["doc_id", "text"])
        .repartition(64)
        .map_batches(
            synth_scene_video_batch, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return videos.repartition(cluster_cpus()).map_batches(
        detect_shots_batch, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# M20 real form — page compressor with the ACTUAL codec the reference uses
# (fake_scan.py:216-272 re-encodes pages as JPEG q=40 and reports the size
# reduction; the earlier quantize+RLE accounting stands in functions/
# images.py:436). The compressed BYTE LENGTH is codec-internal (Huffman),
# so the oracle value-checks the full encode->decode ROUNDTRIP instead:
# scan pages are synthesized 8x8-BLOCK-CONSTANT (a legitimate flat-scan
# test pattern), where baseline JPEG is DC-only per block and the q=40
# quantization maps each palette gray to ONE exact decoded gray —
# {0->0, 64->63, 128->128, 192->193, 255->255}, regenerated from the real
# codec by tests/test_jpeg.py::test_scan_palette_roundtrip_mapping. The
# position-weighted checksum of decoded block values pins quant tables,
# Huffman coding, block order and the decode path end-to-end; a wrong
# coefficient anywhere breaks value-equality. compressed_smaller asserts
# the size-reduction property itself (458 vs 6144 bytes on this pattern).
# ---------------------------------------------------------------------------
_SCAN_PALETTE_DECODED = (0, 63, 128, 193, 255)  # q=40 roundtrip of the synth
_SCAN_PALETTE = (0, 64, 128, 192, 255)
_SCAN_N_BLOCKS = (MEDIA_H // 8) * (MEDIA_W // 8)  # 8 x 12 = 96

_COMPRESS_SQL = f"""
{SQL_ALL_SPANS},
media AS (
  SELECT doc_id, media_ref, off FROM all_spans WHERE kind = 'media'
),
blocks AS (
  SELECT m.doc_id, m.media_ref, b.b,
         CASE CAST((m.doc_id * 31 + m.off * 7 + b.b) % 5 AS BIGINT)
           WHEN 0 THEN {_SCAN_PALETTE_DECODED[0]}
           WHEN 1 THEN {_SCAN_PALETTE_DECODED[1]}
           WHEN 2 THEN {_SCAN_PALETTE_DECODED[2]}
           WHEN 3 THEN {_SCAN_PALETTE_DECODED[3]}
           WHEN 4 THEN {_SCAN_PALETTE_DECODED[4]}
         END AS dv
  FROM media m CROSS JOIN generate_series(0, {_SCAN_N_BLOCKS - 1}) AS b(b)
)
SELECT doc_id, media_ref,
       CAST({MEDIA_H * MEDIA_W} AS BIGINT) AS raw_bytes,
       CAST({MEDIA_H} AS BIGINT) AS dec_h,
       CAST({MEDIA_W} AS BIGINT) AS dec_w,
       CAST(sum(dv * (b + 1)) AS BIGINT) AS dec_checksum,
       CAST(1 AS BIGINT) AS compressed_smaller
FROM blocks GROUP BY doc_id, media_ref
"""


def synth_scan_pages(doc_id: "np.ndarray", off: "np.ndarray") -> "np.ndarray":
    """Block-constant scan pages (n, MEDIA_H, MEDIA_W): block b (row-major
    over the 8x8 grid cells) holds _SCAN_PALETTE[(doc*31 + off*7 + b) % 5]."""
    import numpy as np

    pal = np.asarray(_SCAN_PALETTE, dtype=np.uint8)
    b = np.arange(_SCAN_N_BLOCKS, dtype=np.int64)
    idx = (doc_id[:, None] * 31 + off[:, None] * 7 + b[None, :]) % 5
    bv = pal[idx].reshape(-1, MEDIA_H // 8, MEDIA_W // 8)
    return np.repeat(np.repeat(bv, 8, axis=1), 8, axis=2)


@query("page_compress_jpeg", _COMPRESS_SQL)
def q_page_compress_jpeg(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from ..functions.jpeg import jpeg_decode_batch, jpeg_encode_batch

    def compress_roundtrip(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = batch["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(doc)
        if n:
            stack = synth_scan_pages(doc, off)
            enc = jpeg_encode_batch(stack, quality=40)
            dec = jpeg_decode_batch(enc)
            # block-constant decode: the center pixel IS the block value
            centers = np.stack(dec)[:, 4::8, 4::8].reshape(n, -1)
            w = np.arange(1, _SCAN_N_BLOCKS + 1, dtype=np.int64)
            checksum = (centers.astype(np.int64) * w[None, :]).sum(axis=1)
            smaller = np.array(
                [len(e) < MEDIA_H * MEDIA_W for e in enc], dtype=np.int64
            )
            dec_h = np.array([d.shape[0] for d in dec], dtype=np.int64)
            dec_w = np.array([d.shape[1] for d in dec], dtype=np.int64)
        else:
            checksum = smaller = dec_h = dec_w = np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "media_ref": batch["media_ref"],
                "raw_bytes": pa.array(
                    np.full(n, MEDIA_H * MEDIA_W, dtype=np.int64)
                ),
                "dec_h": pa.array(dec_h),
                "dec_w": pa.array(dec_w),
                "dec_checksum": pa.array(checksum),
                "compressed_smaller": pa.array(smaller),
            }
        )

    flat = spans_corpus(sf_dir, n_blocks=64).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    media = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")),
        batch_format="pyarrow", batch_size=None,
    ).repartition(64)
    return media.map_batches(
        compress_roundtrip, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# Interleaved image-text training pairs (the MMC4/OBELICS assembly shape —
# public multimodal-corpus construction): for every media span, gather the
# text spans within +-CTX_WINDOW offsets of it in the SAME document as
# before/after context strings. Offsets are dense positions, so context
# lookup is pure index arithmetic inside the document's own span list —
# batch-local, zero shuffle, exactly the flagship's one-doc-per-row
# locality (media spacing is 11 > CTX_WINDOW, so a window never contains
# another media span).
# ---------------------------------------------------------------------------
CTX_WINDOW = 8

_INTERLEAVED_SQL = f"""
{SQL_ALL_SPANS}
SELECT m.doc_id, m.media_ref, CAST(m.off AS BIGINT) AS off,
       coalesce(string_agg(t.text, ' ' ORDER BY t.off)
                FILTER (WHERE t.off < m.off), '') AS ctx_before,
       coalesce(string_agg(t.text, ' ' ORDER BY t.off)
                FILTER (WHERE t.off > m.off), '') AS ctx_after,
       CAST(count(t.text) AS BIGINT) AS n_ctx
FROM (SELECT * FROM all_spans WHERE kind = 'media') m
LEFT JOIN (SELECT * FROM all_spans WHERE kind = 'text') t
  ON t.doc_id = m.doc_id
 AND t.off BETWEEN m.off - {CTX_WINDOW} AND m.off + {CTX_WINDOW}
GROUP BY m.doc_id, m.media_ref, m.off
"""


def _interleaved_pairs_batch(batch):
    """Nested spans rows -> (media, ctx_before, ctx_after) pair rows.

    Spans arrive offset-ordered and offsets are dense, so a span's offset
    IS its index in the document's span list — context gathering is two
    list slices per media span, no search."""
    import pyarrow as pa

    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    counts = __import__("numpy").diff(
        spans.offsets.to_numpy(zero_copy_only=False)
    )
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    doc_ids = batch["doc_id"].to_pylist()

    out = {"doc_id": [], "media_ref": [], "off": [],
           "ctx_before": [], "ctx_after": [], "n_ctx": []}
    pos = 0
    for d, n in zip(doc_ids, counts):
        n = int(n)
        dk = kinds[pos:pos + n]
        dt = texts[pos:pos + n]
        dr = refs[pos:pos + n]
        pos += n
        for m in range(n):
            if dk[m] != "media":
                continue
            lo = max(0, m - CTX_WINDOW)
            hi = min(n, m + CTX_WINDOW + 1)
            before = [dt[j] for j in range(lo, m) if dk[j] == "text"]
            after = [dt[j] for j in range(m + 1, hi) if dk[j] == "text"]
            out["doc_id"].append(d)
            out["media_ref"].append(dr[m])
            out["off"].append(m)
            out["ctx_before"].append(" ".join(before))
            out["ctx_after"].append(" ".join(after))
            out["n_ctx"].append(len(before) + len(after))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "media_ref": pa.array(out["media_ref"], type=pa.string()),
            "off": pa.array(out["off"], type=pa.int64()),
            "ctx_before": pa.array(out["ctx_before"], type=pa.string()),
            "ctx_after": pa.array(out["ctx_after"], type=pa.string()),
            "n_ctx": pa.array(out["n_ctx"], type=pa.int64()),
        }
    )


@query("interleaved_pairs", _INTERLEAVED_SQL)
def q_interleaved_pairs(sf_dir: str):
    return spans_corpus(sf_dir).map_batches(
        _interleaved_pairs_batch, batch_format="pyarrow",
        zero_copy_batch=True,
    )
