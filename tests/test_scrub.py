"""PII redaction + URL/domain accounting (web-corpus scrubbing)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_machine_ray.pipelines import queries_scrub as qsc


def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "source": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestPiiRedact:
    def test_synthesized_pii_is_scrubbed(self, ray_session, tmp_path):
        d = _write_docs(tmp_path, [(12345, "hello world", "en", "s0")])
        out = qsc.q_pii_redact(d).to_pandas()
        row = out.iloc[0]
        # doc 12345 -> user12345@mail.example.com + 555-2345
        assert row["n_emails"] == 1 and row["n_phones"] == 1
        assert row["clean_text"] == "hello world contact [EMAIL] or [PHONE]"

    def test_organic_pii_in_text_also_caught(self, ray_session, tmp_path):
        d = _write_docs(
            tmp_path, [(7, "mail a.b+c@x.co.uk and 555-0000 now", "en", "s0")]
        )
        row = qsc.q_pii_redact(d).to_pandas().iloc[0]
        assert row["n_emails"] == 2  # organic + synthesized
        assert row["n_phones"] == 2
        assert "@" not in row["clean_text"]
        assert "555-" not in row["clean_text"]

    def test_phone_padding(self, ray_session, tmp_path):
        d = _write_docs(tmp_path, [(3, "x", "en", "s0")])
        row = qsc.q_pii_redact(d).to_pandas().iloc[0]
        # 555-0003 matches the 4-digit pattern only if zero-padded
        assert row["n_phones"] == 1


class TestUrlDomains:
    def test_domain_rollup(self, ray_session, tmp_path):
        d = _write_docs(
            tmp_path,
            [
                (1, "x", "en", "s0"),
                (2, "x", "en", "s1"),
                (3, "x", "en", "s0"),
                (4, "x", "de", "s0"),
            ],
        )
        out = qsc.q_url_domains(d).to_pandas().set_index("domain")
        assert out.loc["en.example.com", "n_docs"] == 3
        assert out.loc["en.example.com", "n_sources"] == 2
        assert out.loc["de.example.com", "n_docs"] == 1
        assert out.loc["de.example.com", "n_sources"] == 1


class TestUrlCanonicalize:
    def test_each_defect_class(self):
        import pyarrow as pa

        from ocr_machine_ray.pipelines.queries_scrub import canonicalize_urls

        raw = pa.array(
            [
                "https://EN.EXAMPLE.COM/src1/7",          # host case
                "https://en.example.com/src1/7/",          # trailing slash
                "https://en.example.com/src1/7?utm_source=feed&ref=x",
                "https://en.example.com/src1/7#frag",
                "https://en.example.com/src1/7",           # already clean
            ]
        )
        got = canonicalize_urls(raw).to_pylist()
        assert got == ["https://en.example.com/src1/7"] * 5
        # the scheme's own slashes survive
        assert canonicalize_urls(pa.array(["https://a.b/"])).to_pylist() == [
            "https://a.b"
        ]

    def test_messy_urls_are_actually_messy(self):
        import numpy as np
        import pyarrow as pa

        from ocr_machine_ray.pipelines.queries_scrub import (
            _messy_urls,
            canonicalize_urls,
        )

        batch = pa.table(
            {
                "doc_id": pa.array(np.arange(8), type=pa.int64()),
                "lang": pa.array(["en"] * 8),
                "source": pa.array(["src1"] * 8),
            }
        )
        raw = _messy_urls(batch).to_pylist()
        canon = canonicalize_urls(_messy_urls(batch)).to_pylist()
        # at least three defect classes planted
        assert any(u != c for u, c in zip(raw, canon))
        assert any("?" in u for u in raw)
        assert any(u.endswith("/") for u in raw)
        assert any(u != u.lower() for u in raw)
        # canonical forms follow the closed form the oracle uses
        for i, c in enumerate(canon):
            assert c == f"https://en.example.com/src1/{i % 50}"


def test_zone_map_pruning_is_sound_and_useful(ray_session):
    """Pruned partitions must hold ZERO matches (soundness), and the
    layout must actually skip data for this predicate (usefulness)."""
    from ocr_machine_ray.registry import queries

    out = (
        queries()["zone_map_prune_scan"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("partition_id")
    )
    pruned = out[~out["scanned"]]
    assert (pruned["rows_matched"] == 0).all()
    assert len(pruned) > 0  # the predicate genuinely skips partitions
    assert out["rows_matched"].sum() > 0  # and genuinely matches rows
    skipped_rows = pruned["rows_in_partition"].sum()
    assert skipped_rows > 0.2 * out["rows_in_partition"].sum()
