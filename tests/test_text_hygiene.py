"""Decontamination + repetition quality filters (training-data hygiene)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_machine_ray.pipelines.queries_text import _grams3, q_repetition_stats


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


class TestGrams3:
    def test_basic_trigrams(self):
        g, ridx = _grams3(_docs(["a b c d"]))
        assert g.to_pylist() == ["a b c", "b c d"]
        assert ridx.tolist() == [0, 0]

    def test_no_cross_document_grams(self):
        g, ridx = _grams3(_docs(["a b", "c d e f"]))
        # "a b" has no trigram; nothing spans the doc boundary
        assert g.to_pylist() == ["c d e", "d e f"]
        assert ridx.tolist() == [1, 1]

    def test_short_and_empty_docs(self):
        g, ridx = _grams3(_docs(["", "x", "x y"]))
        assert len(g) == 0 and len(ridx) == 0

    def test_whitespace_variants_tokenize_identically(self):
        a, _ = _grams3(_docs(["a\tb\nc"]))
        b, _ = _grams3(_docs(["a b c"]))
        assert a.to_pylist() == b.to_pylist() == ["a b c"]


class TestRepetitionStats:
    def test_counts_by_hand(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        t = _docs(["a a a a b", "a b c d e", "x x x x x x"])
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = (
            q_repetition_stats(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_tokens"].tolist() == [5, 5, 6]
        assert out["n_unique"].tolist() == [2, 5, 1]
        assert out["top_count"].tolist() == [4, 1, 6]
        # flagged iff top_count*5 > n_tokens
        assert out["flagged"].tolist() == [True, False, True]

class TestDecontaminate:
    def test_flags_benchmark_overlap(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ocr_machine_ray.pipelines.queries_text import q_decontaminate

        t = _docs(
            [
                "alpha beta gamma delta",   # doc 0: benchmark (0 % 97 == 0)
                "x alpha beta gamma y",     # shares trigram "alpha beta gamma"
                "x alpha zeta beta gamma",  # benchmark words, no shared trigram
                "p q r s t",                # clean
            ],
            ids=[0, 5, 6, 7],
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = (
            q_decontaminate(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # benchmark doc excluded from the output universe
        assert out["doc_id"].tolist() == [5, 6, 7]
        assert out["n_matched"].tolist() == [1, 0, 0]
        assert out["contaminated"].tolist() == [True, False, False]


class TestFuzzyDecontaminate:
    def test_containment_threshold_by_hand(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ocr_machine_ray.pipelines.queries_text import (
            q_fuzzy_decontaminate,
        )

        bench = "alpha beta gamma delta epsilon"  # 3 distinct shingles
        t = _docs(
            [
                bench,                              # doc 0: benchmark
                # 6 distinct shingles, 3 from the benchmark: containment 0.5
                "alpha beta gamma delta epsilon x y z w",
                # 9 shingles, 1 shared ("alpha beta gamma"): 1/9 ≈ 0.11 > 4%
                "alpha beta gamma q r s t u v w x",
                # duplicated shingles count ONCE (distinct semantics):
                # "p q r" repeated gives 3 distinct shingles, 0 overlap
                "p q r p q r",
                "lone",                             # <3 tokens: no output row
            ],
            ids=[0, 5, 6, 7, 8],
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = (
            q_fuzzy_decontaminate(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [5, 6, 7]
        assert out["n_shingles"].tolist() == [7, 9, 3]
        assert out["n_overlap"].tolist() == [3, 1, 0]
        assert out["flagged"].tolist() == [True, True, False]


class TestChunkExamples:
    def test_windows_by_hand(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ocr_machine_ray.pipelines.queries_text import q_chunk_examples

        toks66 = " ".join(f"t{i}" for i in range(66))   # 32 + 32 + 2
        toks32 = " ".join(f"s{i}" for i in range(32))   # exact multiple
        t = _docs([toks66, toks32, "one", ""], ids=[0, 1, 2, 3])
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = (
            q_chunk_examples(str(tmp_path))
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        assert out.groupby("doc_id")["chunk_id"].count().tolist() == [3, 1, 1, 1]
        d0 = out[out.doc_id == 0]
        assert d0["n_toks"].tolist() == [32, 32, 2]
        assert d0["start_tok"].tolist() == [1, 33, 65]
        assert d0["chunk_text"].iloc[2] == "t64 t65"
        # reconstruction: joining a doc's chunks restores the token stream
        assert " ".join(d0["chunk_text"]) == toks66
        # empty text tokenizes to one empty token -> one chunk
        d3 = out[out.doc_id == 3]
        assert d3["n_toks"].tolist() == [1] and d3["chunk_text"].iloc[0] == ""


class TestStratifiedSample:
    def test_deterministic_and_rate_shaped(self, ray_session):
        from ocr_machine_ray.pipelines.queries_text import q_stratified_sample

        a = q_stratified_sample("/root/testdata/sf0.001").to_pandas()
        b = q_stratified_sample("/root/testdata/sf0.001").to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)  # hash-based: rerun-stable
        counts = a.groupby("lang")["doc_id"].count()
        # en sampled at 5x the zh rate — the mixture must reflect it
        if "en" in counts and "zh" in counts:
            assert counts["en"] > counts["zh"]


class TestPackExamples:
    def test_invariants(self, ray_session):
        from ocr_machine_ray.pipelines.queries_text import (
            _PACK_CAP,
            q_chunk_examples,
            q_pack_examples,
        )

        sf = "/root/testdata/sf0.001"
        packs = q_pack_examples(sf).to_pandas()
        chunks = q_chunk_examples(sf).to_pandas()
        # capacity respected, every chunk packed exactly once
        assert (packs["n_toks"] <= _PACK_CAP).all()
        assert packs["n_chunks"].sum() == len(chunks)
        assert packs["n_toks"].sum() == chunks["n_toks"].sum()
        # pack keys globally unique
        assert not packs.duplicated(["pack_doc", "pack_chunk"]).any()
        # next-fit over >=32-token chunks cannot leave a pack below half
        # capacity unless it is a block's trailing pack
        assert (packs["util_pct"] >= 50).mean() > 0.9
        # deterministic
        again = q_pack_examples(sf).to_pandas()
        key = ["pack_doc", "pack_chunk", "n_chunks", "n_toks"]
        assert sorted(map(tuple, packs[key].values.tolist())) == sorted(
            map(tuple, again[key].values.tolist())
        )


class TestKeywords:
    def test_rank_order_by_hand(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ocr_machine_ray.pipelines.queries_text import q_keywords_per_doc

        t = _docs(
            [
                "apple apple apple rare banana banana",  # tf: apple 3, banana 2, rare 1
                "apple banana zebra",                    # all tf=1 -> df then token breaks ties
            ],
            ids=[0, 1],
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = (
            q_keywords_per_doc(str(tmp_path))
            .to_pandas()
            .sort_values(["doc_id", "rnk"])
            .reset_index(drop=True)
        )
        d0 = out[out.doc_id == 0]
        assert d0["keyword"].tolist() == ["apple", "banana", "rare"]
        assert d0["tf"].tolist() == [3, 2, 1]
        # doc 1: tf all 1; df: apple 2, banana 2, zebra 1 -> zebra first,
        # then apple/banana by token order
        d1 = out[out.doc_id == 1]
        assert d1["keyword"].tolist() == ["zebra", "apple", "banana"]
        assert d1["df"].tolist() == [1, 2, 2]


class TestCorpusCurate:
    def test_filters_and_head_dedup_bite(self, ray_session, tmp_path):
        """Corpus with a short doc, a stopword-stuffed doc, a stutterer,
        and two docs sharing an 8-token head: exactly one survivor from
        the dup pair, and each bad doc dropped for its own reason."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.registry import oracle_sql, queries

        base = "alpha beta gamma delta epsilon zeta eta theta"
        good_tail = " ".join(f"w{i}" for i in range(20))
        docs = {
            0: f"{base} {good_tail}",                      # keeper of dup pair
            1: f"{base} completely different tail {good_tail}",  # same head
            2: "too short",                                # fails n_tokens
            3: "the a " * 20 + good_tail,                  # stopword-stuffed
            4: ("rep rep " * 30 + good_tail),              # stutterer
            5: "unique head tokens here all different now yes " + good_tail,
        }
        tbl = pa.table(
            {
                "doc_id": pa.array(sorted(docs), type=pa.int64()),
                "text": pa.array([docs[k] for k in sorted(docs)]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array(
                    [len(docs[k]) for k in sorted(docs)], type=pa.int64()
                ),
            }
        )
        d = tmp_path / "curate"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        got = queries()["corpus_curate"](str(d)).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = con.sql(oracle_sql()["corpus_curate"]).df()
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        kept = set(got["doc_id"])
        assert 0 in kept and 1 not in kept      # head-dedup kept min doc_id
        assert {2, 3, 4}.isdisjoint(kept)       # each filter fired
        assert 5 in kept
