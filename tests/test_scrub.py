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
