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
