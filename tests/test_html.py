"""HTML boilerplate stripping tests."""

from __future__ import annotations

import re

import pyarrow.parquet as pq
import pytest

from ocr_machine_ray.functions.html import (
    extract_main_content,
    render_html,
    strip_batch,
)


class TestStripper:
    def test_closed_loop_on_corpus(self):
        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        ).to_pandas()
        for r in t.head(100).itertuples():
            expect = re.sub(r"\s+", " ", r.text.strip())
            got = extract_main_content(render_html(r.doc_id, r.text))
            assert got == expect, r.doc_id

    @pytest.mark.parametrize(
        "html,expected",
        [
            ("<p>hello <a href='x'>world</a> and plenty more text</p>",
             "hello world and plenty more text"),
            ("<div><a href='x'>click click click</a></div><p>real text stays</p>",
             "real text stays"),
            ("<nav><p>menu item</p></nav><p>content</p>", "content"),
            ("plain text no tags at all", "plain text no tags at all"),
            ("<p>unclosed paragraph content", "unclosed paragraph content"),
            ("<footer>about us contact</footer>", ""),
            ("<script>var x = 'not content';</script><p>yes</p>", "yes"),
            ("<aside><li><a href='/r'>related</a></li></aside><p>body text</p>",
             "body text"),
            ("", ""),
        ],
    )
    def test_adversarial(self, html, expected):
        assert extract_main_content(html) == expected

    def test_anchor_stub_dropped_long_anchor_para_kept(self):
        # a short anchor-only block is furniture; a long mixed block is not
        assert extract_main_content("<p><a href='x'>more</a></p>") == ""
        long_mixed = (
            "<p>This sentence has a <a href='x'>link</a> but is mostly "
            "real prose so it must be kept intact</p>"
        )
        assert "mostly real prose" in extract_main_content(long_mixed)

    def test_nested_furniture_marks_inner_blocks(self):
        html = "<footer><div><p>deep boilerplate</p></div></footer><p>keep</p>"
        assert extract_main_content(html) == "keep"

    def test_batch_kernel(self):
        import pyarrow as pa

        batch = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "html": pa.array(["<nav>x</nav><p>kept words</p>"]),
            }
        )
        out = strip_batch(batch)
        assert out["main_text"].to_pylist() == ["kept words"]


class TestSplitDeterminism:
    def test_seeded_shuffle_split_is_stable(self, ray_session, sf_small):
        from ocr_machine_ray.pipelines.extraction import read_documents

        def membership():
            ds = read_documents(sf_small, ["doc_id"]).random_shuffle(seed=42)
            train, val, test = ds.split_proportionately([0.7, 0.15])
            return (
                set(train.to_pandas()["doc_id"]),
                set(val.to_pandas()["doc_id"]),
            )

        t1, v1 = membership()
        t2, v2 = membership()
        assert t1 == t2 and v1 == v2
        assert not (t1 & v1)


class TestStripperRobustness:
    """Regression tests for real-world HTML failure modes (each previously
    dropped or leaked content)."""

    @pytest.mark.parametrize(
        "html,expected",
        [
            # unclosed <a>: later paragraphs must survive
            ("<p><a href=x>link</p><p>this long real content paragraph "
             "should survive easily</p>",
             "this long real content paragraph should survive easily"),
            # trailing data buffered until close
            ("<p>text ending with entity", "text ending with entity"),
            # inline script must not taint sibling text
            ("<div>Main article body text that is definitely long enough "
             "<script>var x=1;</script></div>",
             "Main article body text that is definitely long enough"),
            # stray close tag must not destroy furniture context
            ("<nav><a href=x>l</a></b><div>nav leftovers long enough "
             "here</div></nav><p>real content</p>", "real content"),
            # pretty-printed anchor: whitespace must not inflate density
            ("<p>Some real content here <a href=x>\n     link text\n  "
             "</a> tail</p>", "Some real content here link text tail"),
            # head/title text is furniture
            ("<head><title>Site Title Words</title></head><p>body</p>",
             "body"),
        ],
    )
    def test_cases(self, html, expected):
        assert extract_main_content(html) == expected

    def test_metachar_roundtrip(self):
        text = "alpha <beta> gamma & delta epsilon"
        assert extract_main_content(render_html(3, text)) == text


class TestCVEdgeStrikes:
    def test_right_edge_strike_detected(self):
        import numpy as np

        from ocr_machine_ray.functions.images import (
            WORD_H,
            WORD_W,
            cv_strike_verdict,
        )

        img = np.full((WORD_H, WORD_W), 240, dtype=np.uint8)
        img[12:14, 40:WORD_W] = 30  # line touching the right edge
        assert cv_strike_verdict(img)
        img2 = np.full((WORD_H, WORD_W), 240, dtype=np.uint8)
        img2[12:14, 0:40] = 30  # line touching the left edge
        assert cv_strike_verdict(img2)


class TestLengthOutliers:
    """Pin the exact-integer discrete-p95 index rule to DuckDB.

    q_length_outliers computes quantile_disc(n_chars, 0.95) from merged
    integer histograms using idx = (19*n + 19)//20 - 1; DuckDB is the
    authority for which sorted element quantile_disc picks.
    """

    @pytest.mark.parametrize("n", [1, 2, 3, 19, 20, 21, 39, 40, 100, 101])
    def test_disc_p95_index_matches_duckdb(self, n):
        import duckdb
        import numpy as np

        rng = np.random.default_rng(n)
        vals = np.sort(rng.integers(0, 4096, size=n))
        got = vals[(19 * n + 19) // 20 - 1]
        want = duckdb.sql(
            "SELECT quantile_disc(v, 0.95) FROM (SELECT unnest(?::BIGINT[]) v)",
            params=[vals.tolist()],
        ).fetchone()[0]
        assert int(got) == int(want)
