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
