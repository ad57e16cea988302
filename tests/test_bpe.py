"""BPE trainer exactness vs an independent single-process reference.

bpe_merges has no SQL oracle (greedy sequential merge application is not
SQL-expressible), so the distributed trainer is pinned here against a
from-scratch reference BPE (Sennrich-style: word-frequency table, argmax
pair by (count desc, pair asc), greedy left-to-right apply).
"""

from __future__ import annotations

import collections
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_machine_ray.corpus import ASCII_WS
from ocr_machine_ray.pipelines.queries_text import (
    BPE_ROUNDS,
    _apply_merge,
    bpe_train,
)


def _reference_bpe(texts, rounds):
    """Independent reference: dict-based, no numpy, no ray."""
    import re

    # the engine tokenizer: regex \s+ over ASCII-trimmed text (note this
    # yields [''] — one empty token — for empty/whitespace-only text)
    freq = collections.Counter()
    for t in texts:
        if t is None:
            continue
        for w in re.split(r"\s+", t.strip(ASCII_WS)):
            freq[w] += 1

    words = {w: list(w) for w in freq}
    merges = []
    for _ in range(rounds):
        pairs = collections.Counter()
        for w, syms in words.items():
            c = freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((a, b, n))
        words = {w: _apply_merge(s, a, b) for w, s in words.items()}
    return merges


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_sf")
    texts = [
        "low low low lower lowest",
        "new newer newest newest",
        "wide wider widest",
        "low newer  wide",
        "",
        "   ",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d), texts


def test_bpe_matches_reference(ray_session, bpe_dir):
    d, texts = bpe_dir
    got = bpe_train(d, rounds=6)
    want = _reference_bpe(texts, rounds=6)
    assert got == want


def test_bpe_on_gate_corpus_matches_reference(ray_session):
    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    got = bpe_train(sf, rounds=BPE_ROUNDS)
    want = _reference_bpe(texts, rounds=BPE_ROUNDS)
    assert got == want


def test_apply_merge_greedy_non_overlapping():
    assert _apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _apply_merge(list("abab"), "a", "b") == ["ab", "ab"]
    assert _apply_merge(["ab", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _apply_merge([], "a", "b") == []


def test_bpe_token_counts_consistency(ray_session):
    """Subword counts: merges only ever reduce symbol count, and a word of
    length L encodes to between 1 and L symbols."""
    from ocr_machine_ray import registry

    df = (
        registry.queries()["bpe_token_counts"]("/root/testdata/sf0.001")
        .to_pandas()
    )
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    assert len(df) == len(docs)
    assert (df["n_subwords"] >= df["n_words"]).all()
    merged = df.merge(docs, on="doc_id")
    max_chars = merged["text"].str.len()
    assert (merged["n_subwords"] <= max_chars + 1).all()


class TestUnigramLM:
    def test_viterbi_matches_bruteforce(self):
        import itertools
        import math

        from ocr_machine_ray.pipelines.queries_text import (
            UNIGRAM_MAX_PIECE,
            unigram_viterbi,
        )

        probs = {
            "a": 0.08, "b": 0.05, "c": 0.04, "ab": 0.2, "bc": 0.18,
            "abc": 0.1, "cab": 0.12, "abca": 0.02,
        }

        def brute(word):
            best, bl = None, -math.inf
            n = len(word)
            for cuts in itertools.product([0, 1], repeat=n - 1):
                pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
                pieces = [word[a:b] for a, b in zip(pos, pos[1:])]
                if any(
                    p not in probs or len(p) > UNIGRAM_MAX_PIECE
                    for p in pieces
                ):
                    continue
                lp = sum(math.log(probs[p]) for p in pieces)
                if lp > bl:
                    best, bl = pieces, lp
            return best, bl

        for word in ("abc", "abcab", "cababc", "abcabca"):
            vp, vl = unigram_viterbi(word, probs)
            bp, bl = brute(word)
            assert vp == bp
            assert abs(vl - bl) < 1e-9

    def test_em_monotone_likelihood_and_coverage(self):
        from ocr_machine_ray.pipelines.queries_text import (
            _uni_lattice_expect,
            unigram_train,
            unigram_viterbi,
        )

        wc = [("banana", 10), ("bandana", 6), ("ananas", 4), ("nab", 8)]

        def corpus_ll(probs):
            return sum(
                c * _uni_lattice_expect(w, probs)[1] for w, c in wc
            )

        lls = []
        for r in range(1, 5):
            probs = unigram_train(wc, rounds=r)
            lls.append(corpus_ll(probs))
        # EM on the full lattice is monotone in likelihood (pruning may
        # dip it, so compare only while vocab is uncut: vocab_size large)
        big = [
            corpus_ll(unigram_train(wc, vocab_size=10_000, rounds=r))
            for r in range(1, 5)
        ]
        assert all(b2 >= b1 - 1e-9 for b1, b2 in zip(big, big[1:]))
        # single-char coverage: every word still segmentable after prune
        probs = unigram_train(wc, vocab_size=8)
        for w, _ in wc:
            pieces, lp = unigram_viterbi(w, probs)
            assert "".join(pieces) == w

    def test_query_runs_and_is_deterministic(self, ray_session):
        from ocr_machine_ray.registry import queries

        a = (
            queries()["unigram_tokenize"]("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            queries()["unigram_tokenize"]("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(a) == 500
        assert (a["n_pieces"] > 0).all()
        assert (a["nll_millinat"] > 0).all()
        assert a.equals(b)
