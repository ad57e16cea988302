"""Scale-guard behavior of the dedup family: bounded buckets under a
pathological 100%-duplicate corpus, star-degradation preserving connected
components, and Dataset-native connected components on long chains."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_machine_ray.functions import dedup


class TestBucketCap:
    def test_allpairs_below_cap(self):
        ids = np.arange(6, dtype=np.int64)
        sets = [["a", "b", "c"]] * 6
        a, b = dedup.bucket_pairs(ids, sets, 0.5, cap=100)
        assert len(a) == 6 * 5 // 2  # full quadratic pairing

    def test_star_chain_above_cap_is_linear(self):
        n = 500  # pathological: every doc identical -> one giant bucket
        ids = np.arange(n, dtype=np.int64)
        sets = [["a", "b", "c"]] * n
        a, b = dedup.bucket_pairs(ids, sets, 0.5, cap=8)
        # star (n-1) + chain (n-2) pairs: linear, never quadratic
        assert len(a) == 2 * n - 3
        assert set(a[b - a > 1]) == {0}  # non-adjacent pairs all anchored

    def test_star_chain_keeps_boilerplate_connected(self):
        # a homogeneous boilerplate bucket (the case that triggers the
        # cap) must come out fully connected through the anchor
        ids = np.arange(20, dtype=np.int64)
        sets = [["x", "y", "z"]] * 20
        a, b = dedup.bucket_pairs(ids, sets, 0.9, cap=4)
        reached = set(a) | set(b)
        assert reached == set(range(20))

    def test_star_still_verifies(self):
        # non-duplicate members of a hot bucket are NOT paired
        ids = np.arange(10, dtype=np.int64)
        sets = [["a", "b", "c"]] * 9 + [["q", "r", "s"]]
        a, b = dedup.bucket_pairs(ids, sets, 0.9, cap=4)
        assert 9 not in set(b)

    def test_chain_catches_adjacent_non_anchor_pairs(self):
        # B and C similar to each other, dissimilar to the anchor: the
        # chain edge keeps them paired even though the star misses them
        ids = np.arange(6, dtype=np.int64)
        sets = [["a", "b", "c"]] * 4 + [["q", "r", "s"], ["q", "r", "s"]]
        a, b = dedup.bucket_pairs(ids, sets, 0.9, cap=3)
        assert (4, 5) in set(zip(a.tolist(), b.tolist()))

    def test_capped_path_is_documented_approximation(self):
        # non-adjacent similar pair dissimilar to the anchor is MISSED
        # above the cap (recall trade documented at BUCKET_CAP) but kept
        # by the exact path below the cap
        ids = np.arange(6, dtype=np.int64)
        sets = (
            [["a", "b", "c"]] * 2
            + [["q", "r", "s"]]
            + [["a", "b", "c"]]
            + [["q", "r", "s"]]
            + [["a", "b", "c"]]
        )
        exact_a, exact_b = dedup.bucket_pairs(ids, sets, 0.9, cap=100)
        capped_a, capped_b = dedup.bucket_pairs(ids, sets, 0.9, cap=3)
        exact = set(zip(exact_a.tolist(), exact_b.tolist()))
        capped = set(zip(capped_a.tolist(), capped_b.tolist()))
        assert (2, 4) in exact and (2, 4) not in capped
        assert capped <= exact  # never invents pairs


class TestConnectedComponents:
    def _run(self, pairs_df, ray_session):
        import ray.data

        from ocr_machine_ray.pipelines.queries_dedup import (
            connected_components,
        )

        res = connected_components(ray.data.from_pandas(pairs_df))
        if isinstance(res, pd.DataFrame):
            return res
        return res.to_pandas().rename(columns={"n": "doc_id", "lbl": "cluster"})

    def test_long_chain_converges(self, ray_session):
        # a 40-node path graph: min label must reach the far end; the naive
        # one-hop propagation needs 40 rounds, path compression O(log n)
        n = 40
        pairs = pd.DataFrame(
            {"doc_a": np.arange(n - 1), "doc_b": np.arange(1, n)}
        )
        out = self._run(pairs, ray_session).sort_values("doc_id")
        assert len(out) == n
        assert (out["cluster"] == 0).all()

    def test_two_components(self, ray_session):
        pairs = pd.DataFrame(
            {"doc_a": [0, 1, 10, 11], "doc_b": [1, 2, 11, 12]}
        )
        out = self._run(pairs, ray_session)
        lbl = dict(zip(out["doc_id"], out["cluster"]))
        assert lbl[0] == lbl[1] == lbl[2] == 0
        assert lbl[10] == lbl[11] == lbl[12] == 10

    def test_empty_pairs(self, ray_session):
        pairs = pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64")}
        )
        out = self._run(pairs, ray_session)
        assert len(out) == 0

    def test_join_path_matches_driver_path(self, ray_session):
        """Both CC paths (one-pass star-contraction + driver union-find vs
        iterative join-based label propagation) must agree label-for-label
        on a graph with chains, a cycle, and singleton-adjacent parts."""
        import ray.data

        from ocr_machine_ray.pipelines.queries_dedup import (
            connected_components,
        )

        rng = np.random.default_rng(5)
        # random forest-ish pairs over 200 nodes plus a cycle
        a = rng.integers(0, 200, size=150)
        b = rng.integers(0, 200, size=150)
        keep = a != b
        pairs = pd.DataFrame(
            {
                "doc_a": np.concatenate([a[keep], [300, 301, 302]]),
                "doc_b": np.concatenate([b[keep], [301, 302, 300]]),
            }
        ).astype("int64")
        fast = connected_components(ray.data.from_pandas(pairs))
        assert isinstance(fast, pd.DataFrame)  # took the driver path
        slow = connected_components(
            ray.data.from_pandas(pairs), driver_edge_cap=0
        )
        if not isinstance(slow, pd.DataFrame):
            slow = slow.to_pandas().rename(
                columns={"n": "doc_id", "lbl": "cluster"}
            )
        f = fast.sort_values("doc_id").reset_index(drop=True)
        s = slow.sort_values("doc_id").reset_index(drop=True)
        assert (f["doc_id"].to_numpy() == s["doc_id"].to_numpy()).all()
        assert (f["cluster"].to_numpy() == s["cluster"].to_numpy()).all()

    def test_local_star_edges_contraction(self):
        from ocr_machine_ray.pipelines.queries_dedup import (
            _local_star_edges,
        )

        # path 0-1-2-3 both dirs in one block: all collapse to label 0
        t = pa.table(
            {
                "src": pa.array([0, 1, 1, 2, 2, 3], type=pa.int64()),
                "dst": pa.array([1, 0, 2, 1, 3, 2], type=pa.int64()),
            }
        )
        out = _local_star_edges(t).to_pandas().sort_values("n")
        assert out["n"].tolist() == [0, 1, 2, 3]
        assert out["lbl"].tolist() == [0, 0, 0, 0]


class TestPrefixFilter:
    def test_prefix_rows_cover_all_similar_pairs(self):
        # exactness property: any pair with Jaccard >= t must share a
        # bucket (prefix token), for random sets near the threshold
        rng = np.random.default_rng(7)
        vocab = np.array([f"w{i}" for i in range(40)], dtype=object)
        docs = []
        base = list(vocab[:20])
        for i in range(30):
            d = list(base)
            for _ in range(int(rng.integers(0, 2))):
                d[int(rng.integers(len(d)))] = str(
                    vocab[int(rng.integers(len(vocab)))]
                )
            docs.append(" ".join(d))
        t = 0.9
        batch = pa.table(
            {
                "doc_id": list(range(len(docs))),
                "lang": ["en"] * len(docs),
                "text": docs,
            }
        )
        rows = prefix_tbl = dedup.prefix_rows_batch(batch, t, "lang").to_pandas()
        buckets: dict[str, set[int]] = {}
        for d, p in zip(prefix_tbl["doc_id"], prefix_tbl["ptok"]):
            buckets.setdefault(p, set()).add(d)
        tok_sets = [set(dedup.tokenize(x)) for x in docs]
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                jac = dedup.shingle_jaccard(tok_sets[i], tok_sets[j])
                if jac >= t:
                    assert any(
                        i in m and j in m for m in buckets.values()
                    ), (i, j, jac)

    def test_prefix_length_formula(self):
        batch = pa.table(
            {"doc_id": [1], "lang": ["en"],
             "text": [" ".join(f"t{i}" for i in range(20))]}
        )
        rows = dedup.prefix_rows_batch(batch, 0.95, "lang").to_pandas()
        # 20 distinct tokens at t=0.95 -> prefix of 20 - 19 + 1 = 2 tokens
        assert len(rows) == 2


class TestIncrementalDedup:
    def test_seen_gate_and_anti_join(self, ray_session, tmp_path):
        """New docs: one sharing its 8-token head with an old doc (bloom
        hit -> anti-join kills it), one genuinely fresh (bloom miss ->
        definite-new fast path), plus two new docs sharing a head with
        each other but not with any old doc (both kept — the gate only
        checks the seen set)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.registry import oracle_sql, queries

        head_old = "one two three four five six seven eight"
        head_new = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
        texts = {
            3: f"{head_old} old tail content here",
            5: "other old document with different head tokens entirely",
            8: f"{head_old} brand new tail",         # dup of old head -> dropped
            9: "completely fresh text never seen before now",  # kept
            18: f"{head_new} first twin",            # kept (no old match)
            28: f"{head_new} second twin",           # kept too
        }
        ids = sorted(texts)
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(texts[i]) for i in ids], type=pa.int64()),
            }
        )
        d = tmp_path / "inc"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        got = queries()["incremental_dedup"](str(d)).to_pandas()
        assert sorted(got["doc_id"]) == [9, 18, 28]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = con.sql(oracle_sql()["incremental_dedup"]).df()
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        assert sorted(got["fp"]) == sorted(want["fp"])


class TestSegmentDedup:
    def test_crafted_corpus(self, ray_session, tmp_path):
        """W=4 segments, dup threshold 2 docs: a shared head removed from
        every holder, a fully-duplicated doc collapsing to '', a within-doc
        triple repeat kept (one distinct doc), a partial tail segment."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.registry import oracle_sql, queries

        texts = {
            1: "a b c d e f g h w x y z",   # [abcd][efgh][wxyz]
            2: "a b c d p q r s",           # [abcd] dup with 1,3
            3: "a b c d e f g h",           # both segs dup -> ''
            4: "m m m m m m m m m m m m",   # repeats only within itself
            5: "u v",                       # short partial segment, unique
        }
        ids = sorted(texts)
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], type=pa.int64()
                ),
            }
        )
        d = tmp_path / "segdup"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        got = (
            queries()["segment_dedup"](str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["clean_text"].tolist() == [
            "w x y z", "p q r s", "", texts[4], "u v",
        ]
        assert got["n_segs"].tolist() == [3, 2, 2, 3, 1]
        assert got["n_removed"].tolist() == [2, 1, 2, 0, 0]

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = (
            con.execute(oracle_sql()["segment_dedup"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "clean_text", "n_segs", "n_removed"]],
            want[["doc_id", "clean_text", "n_segs", "n_removed"]],
        )

    def test_no_duplicates_fast_path(self, ray_session, tmp_path):
        """Disjoint corpus: the dup set is empty, the join stages are
        skipped, and the rebuild is a pure whitespace normalization."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.registry import queries

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["alpha  beta gamma", "delta epsilon"]),
                "lang": pa.array(["en"] * 2),
                "source": pa.array(["s"] * 2),
                "n_chars": pa.array([17, 13], type=pa.int64()),
            }
        )
        d = tmp_path / "segnone"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        got = (
            queries()["segment_dedup"](str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["clean_text"].tolist() == [
            "alpha beta gamma", "delta epsilon",
        ]
        assert got["n_removed"].tolist() == [0, 0]


def test_segment_dedup_fallback_matches_mask_path(
    ray_session, monkeypatch
):
    """The string-list fallback (stats missing / doc too long for the mask
    budget) must produce byte-identical output to the bitmask fast path."""
    from ocr_machine_ray.pipelines import queries_dedup as qd
    from ocr_machine_ray.registry import queries

    sf = "/root/testdata/sf0.001"
    fast = (
        queries()["segment_dedup"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(qd, "_max_nchars_stat", lambda _: None)
    slow = (
        queries()["segment_dedup"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert fast.equals(slow)


class TestLeakageSafeSplit:
    def test_clusters_never_straddle_splits(self, ray_session, tmp_path):
        """Planted exact-dup clusters whose members' NAIVE per-doc hash
        buckets fall in different splits: the cluster-keeper split must
        put every member on the keeper's side (no train/test leakage)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.registry import oracle_sql, queries

        # doc 1 -> bucket (1*761)%1000 = 761 ('val'); doc 430 -> 230
        # ('train'): same text, so a per-doc split would leak.
        texts = {
            1: "shared dup text alpha",
            430: "shared dup text alpha",
            7: "shared dup text beta",
            12: "shared dup text beta",
            999: "shared dup text beta",
            3: "unique text gamma",
            8: "unique text delta",
        }
        ids = sorted(texts)
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], type=pa.int64()
                ),
            }
        )
        d = tmp_path / "leak"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        got = (
            queries()["leakage_safe_split"](str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        by_doc = dict(zip(got["doc_id"], got["split"]))
        keep = dict(zip(got["doc_id"], got["keeper_doc"]))
        # cluster atomicity + keeper = min member
        assert keep[1] == 1 and keep[430] == 1
        assert by_doc[430] == by_doc[1]
        assert keep[7] == keep[12] == keep[999] == 7
        assert by_doc[12] == by_doc[7] and by_doc[999] == by_doc[7]
        # the naive per-doc buckets genuinely disagree for cluster {1,430}
        assert ((1 % 1000) * 761) % 1000 // 700 != (
            ((430 % 1000) * 761) % 1000 // 700
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = (
            con.execute(oracle_sql()["leakage_safe_split"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "keeper_doc", "split"]],
            want[["doc_id", "keeper_doc", "split"]],
        )

    def test_split_broadcast_and_join_paths_agree(
        self, ray_session, monkeypatch
    ):
        import pandas as pd

        from ocr_machine_ray.pipelines import queries_dedup as qd

        sf = "/root/testdata/sf0.001"
        bcast = (
            qd.q_leakage_safe_split(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        monkeypatch.setattr(qd, "LEAK_BCAST_CAP", 0)
        join = (
            qd.q_leakage_safe_split(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bcast, join)



class TestCdcChunking:
    def test_concat_identity_and_determinism(self):
        from ocr_machine_ray.pipelines.queries_dedup import cdc_chunk_spans

        text = "the quick brown fox jumps over the lazy dog " * 20
        spans = cdc_chunk_spans(text)
        assert spans == cdc_chunk_spans(text)
        assert "".join(text[a:b] for a, b in spans) == text
        assert [a for a, _ in spans[1:]] == [b for _, b in spans[:-1]]
        assert len(spans) > 3  # the rule genuinely cuts

    @staticmethod
    def _entropy_text(n: int, seed: int = 5) -> str:
        # high 6-gram diversity so the 1/64 boundary rate holds; a short
        # PERIODIC text has only ~period distinct 6-grams and may contain
        # no zero window at all (content-defined means exactly that)
        import numpy as np

        rng = np.random.default_rng(seed)
        chars = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789 "))
        return "".join(rng.choice(chars, n))

    def test_shift_robustness(self):
        """An insertion at the FRONT only perturbs chunks near the edit:
        the non-resetting rolling window re-synchronizes within 6 chars,
        so almost every original chunk string survives — the property
        fixed-window chunking (segment_dedup) fundamentally lacks."""
        from ocr_machine_ray.pipelines.queries_dedup import cdc_chunk_spans

        base = self._entropy_text(4000)
        shifted = "INSERTED PREFIX >>> " + base
        c_base = {base[a:b] for a, b in cdc_chunk_spans(base)}
        assert len(c_base) > 20
        c_shift = {shifted[a:b] for a, b in cdc_chunk_spans(shifted)}
        common = c_base & c_shift
        assert len(common) >= 0.9 * len(c_base)

        # fixed windows (stride 40) lose nearly everything under a
        # 20-char shift — the contrast that motivates CDC
        f_base = {base[i:i + 40] for i in range(0, len(base), 40)}
        f_shift = {shifted[i:i + 40] for i in range(0, len(shifted), 40)}
        assert len(f_base & f_shift) < 0.2 * len(f_base)

    def test_window_locality_matches_sql_gate(self):
        """Boundary decision at position i depends ONLY on chars
        i-5..i: mutate a char 6+ positions earlier and the boundary
        stays."""
        from ocr_machine_ray.pipelines.queries_dedup import cdc_chunk_spans

        text = self._entropy_text(2000, seed=9)
        spans = cdc_chunk_spans(text)
        cuts = [b for _, b in spans[:-1] if b > 20]
        assert cuts
        cut = cuts[0]
        mutated = text[: cut - 10] + "@" + text[cut - 9:]
        assert cut in [b for _, b in cdc_chunk_spans(mutated)]


    def test_broadcast_and_join_paths_agree(self, ray_session, monkeypatch):
        import pandas as pd

        from ocr_machine_ray.pipelines import queries_dedup as qd

        sf = "/root/testdata/sf0.001"
        bcast = (
            qd.q_cdc_dedup(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        monkeypatch.setattr(qd, "CDC_BCAST_CAP", 0)  # force the join path
        join = (
            qd.q_cdc_dedup(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bcast, join)
