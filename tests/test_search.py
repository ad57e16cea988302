"""Retrieval family: OOV quality filter, inverted index, integer BM25."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_machine_ray.pipelines import queries_search as qs


def _write_docs(tmp_path, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestOovRate:
    def test_by_hand(self, ray_session, tmp_path):
        # vocab is top-10 by frequency; with <10 distinct tokens everything
        # present is in-vocab
        d = _write_docs(tmp_path, ["a a b zz", "b b c"])
        out = (
            qs.q_oov_rate(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["n_tokens"].tolist() == [4, 3]
        assert out["n_oov"].tolist() == [0, 0]

    def test_rare_tokens_flagged(self, ray_session, tmp_path):
        # 11 distinct tokens: the 10 common ones are vocab, the 1 rare one
        # (lexicographically last on the count tie-break) is OOV
        common = " ".join(f"t{i:02d} t{i:02d}" for i in range(10))
        d = _write_docs(tmp_path, [common, "t00 zz"])
        out = (
            qs.q_oov_rate(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["n_oov"].tolist() == [0, 1]


class TestInvertedIndex:
    def test_postings_sorted_and_df_exact(self, ray_session, tmp_path):
        d = _write_docs(tmp_path, ["w x", "x y", "x"], ids=[7, 3, 5])
        out = qs.q_inverted_index(d).to_pandas().set_index("tok")
        assert out.loc["x", "df"] == 3
        assert out.loc["x", "postings"] == "3,5,7"
        assert out.loc["w", "postings"] == "7"
        assert out.loc["y", "df"] == 1

    def test_postings_capped_df_uncapped(self, ray_session, tmp_path):
        n = qs.POSTINGS_CAP + 20
        d = _write_docs(tmp_path, ["hot"] * n, ids=list(range(n)))
        out = qs.q_inverted_index(d).to_pandas().set_index("tok")
        assert out.loc["hot", "df"] == n
        ids = out.loc["hot", "postings"].split(",")
        assert len(ids) == qs.POSTINGS_CAP
        assert ids == [str(i) for i in range(qs.POSTINGS_CAP)]


class TestBm25TopK:
    def test_rare_term_dominates(self, ray_session, tmp_path):
        # one doc holds the rare query term 'dup'; common term 'table'
        # appears everywhere with weight N//N == 1
        texts = ["table dup"] + ["table"] * 9
        d = _write_docs(tmp_path, texts)
        out = qs.q_bm25_topk(d).to_pandas()
        assert out.iloc[0]["doc_id"] == 0
        # weight(dup) = 10 // 1 = 10, tf(table)=1 weight 1 -> 11
        assert out.iloc[0]["score"] == 11
        # everything else scores 1, tie-broken by doc_id ascending
        assert out["doc_id"].tolist()[1:] == list(range(1, 10))

    def test_no_query_terms_in_corpus(self, ray_session, tmp_path):
        d = _write_docs(tmp_path, ["alpha beta", "gamma"])
        out = qs.q_bm25_topk(d)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) == 0


class TestPca:
    @staticmethod
    def _write_emb(tmp_path, V, dim):
        import numpy as np

        t = pa.table(
            {
                "vec_id": pa.array(range(len(V)), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.asarray(V, dtype=np.float32).ravel()), dim
                ).cast(pa.list_(pa.float32())),
                "label": pa.array([0] * len(V), type=pa.int32()),
            }
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_matches_direct_numpy_pca(self, ray_session, tmp_path):
        import numpy as np
        import ray.data

        from ocr_machine_ray.functions.similarity import pca_fit

        rng = np.random.default_rng(3)
        # anisotropic cloud so the spectrum is well separated
        base = rng.normal(size=(200, 6)) * np.array([5, 3, 2, 1, 0.5, 0.1])
        V = base @ rng.normal(size=(6, 6))
        d = self._write_emb(tmp_path, V, 6)
        ds = ray.data.read_parquet(f"{d}/embeddings.parquet")
        mean, comps, var = pca_fit(ds, 3)

        Vf = V.astype(np.float32).astype(np.float64)  # storage roundtrip
        assert np.allclose(mean, Vf.mean(axis=0), atol=1e-9)
        cov = np.cov(Vf, rowvar=False)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:3]
        want = v[:, order].T
        for i in range(3):
            j = int(np.abs(want[i]).argmax())
            if want[i, j] < 0:
                want[i] = -want[i]
        assert np.allclose(comps, want, atol=1e-7)
        assert np.allclose(var, w[order], atol=1e-7)
        # invariants: orthonormal basis, descending explained variance
        assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
        assert (np.diff(var) <= 1e-12).all()

    def test_projection_shape_and_centering(self, ray_session, tmp_path):
        import numpy as np

        from ocr_machine_ray.pipelines.queries_similarity import q_pca_project

        rng = np.random.default_rng(4)
        V = rng.normal(size=(64, 64))
        d = self._write_emb(tmp_path, V, 64)
        out = q_pca_project(d).to_pandas().sort_values("vec_id")
        P = np.stack(out["proj"].to_numpy())
        assert P.shape == (64, 8)
        # projections of centered data are centered
        assert np.allclose(P.mean(axis=0), 0, atol=1e-9)


class TestSemDedup:
    def test_pruning_semantics(self, ray_session, tmp_path):
        import numpy as np

        from ocr_machine_ray.pipelines.queries_similarity import q_semdedup

        rng = np.random.default_rng(9)
        # two far-apart blobs; inside each, exact triplicates + one loner
        a = rng.normal(size=64)
        b = rng.normal(size=64) + 40.0
        V = np.stack(
            [a, a * 1.0001, a * 0.9999, a + rng.normal(size=64) * 20,
             b, b * 1.0002, b + rng.normal(size=64) * 20]
        )
        d = TestPca._write_emb(tmp_path, V, 64)
        out = q_semdedup(d).to_pandas().sort_values("vec_id")
        assert len(out) == 7
        removed = dict(zip(out["vec_id"], out["removed"]))
        # scaled copies of a keep only vec 0; scaled copy of b keeps vec 4
        assert not removed[0] and removed[1] and removed[2]
        assert not removed[4] and removed[5]
        # every removed vec has a cosine witness with a smaller id
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        for vid, r in removed.items():
            if r:
                assert (S[vid, :vid] >= 0.5).any()

    def test_determinism(self, ray_session, tmp_path):
        import numpy as np

        from ocr_machine_ray.pipelines.queries_similarity import q_semdedup

        rng = np.random.default_rng(10)
        V = rng.normal(size=(50, 16))
        d = TestPca._write_emb(tmp_path, V, 16)
        one = q_semdedup(d).to_pandas().sort_values("vec_id").reset_index(drop=True)
        two = q_semdedup(d).to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert one.equals(two)

    def test_k_scales_with_corpus(self):
        from ocr_machine_ray.pipelines.queries_similarity import (
            SEMDEDUP_TARGET,
            _semdedup_k,
        )

        # tiny corpora keep the historical n//8 partition
        assert _semdedup_k(16) == 2
        assert _semdedup_k(64) == 8
        # mid scale: flat at 8
        assert _semdedup_k(10_000) == 8
        # large scale: k grows so mean cluster size stays bounded
        for n in (100_000, 10_000_000, 1_000_000_000):
            k = _semdedup_k(n)
            assert n / k <= 2 * SEMDEDUP_TARGET, (n, k)

    def test_hot_cluster_star_degradation(self):
        """Pathological all-near-duplicate cluster above SEMDEDUP_CAP: the
        prune must NOT build an m x m matrix — it degrades to star pruning
        against the min-id keeper and still removes every duplicate."""
        import numpy as np
        import pandas as pd

        from ocr_machine_ray.pipelines import queries_similarity as qs

        m = qs.SEMDEDUP_CAP + 64
        base = np.ones(16)
        V = np.tile(base, (m, 1)) * np.linspace(
            1.0, 2.0, m
        ).reshape(-1, 1)  # all colinear => cosine 1.0 pairwise
        g = pd.DataFrame(
            {
                "vec_id": np.arange(m, dtype=np.int64),
                "cluster": np.zeros(m, dtype=np.int64),
                "embedding": list(V),
            }
        )
        out = qs._semdedup_prune(g)
        removed = out.sort_values("vec_id")["removed"].to_numpy()
        assert not removed[0] and removed[1:].all()

    def test_chunked_exact_matches_full_matrix(self):
        """Below the cap the row-chunked prune must equal the naive full
        Vn@Vn.T tril rule exactly (chunk boundary crossing included)."""
        import numpy as np
        import pandas as pd

        from ocr_machine_ray.pipelines import queries_similarity as qs

        rng = np.random.default_rng(77)
        m = qs._PRUNE_CHUNK + 37  # force a chunk-boundary crossing
        V = rng.normal(size=(m, 8))
        # plant duplicates at positions straddling the chunk boundary
        V[qs._PRUNE_CHUNK + 5] = V[3] * 1.0001
        V[10] = V[2] * 0.999
        g = pd.DataFrame(
            {
                "vec_id": np.arange(m, dtype=np.int64),
                "cluster": np.zeros(m, dtype=np.int64),
                "embedding": list(V),
            }
        )
        out = qs._semdedup_prune(g).sort_values("vec_id")
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        want = np.tril(S >= qs.SEMDEDUP_TAU, k=-1).any(axis=1)
        assert (out["removed"].to_numpy() == want).all()
