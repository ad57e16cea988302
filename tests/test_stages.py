"""Stage protocol / pipeline builder / sources tests."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_machine_ray.sources import readers
from ocr_machine_ray.stages.base import FnStage, Pipeline


class TestStageProtocol:
    def test_fn_stage_composes_and_emits_metrics(self, ray_session, sf_small):
        import ray.data

        def double(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(
                batch.schema.get_field_index("doc_id"),
                "doc_id",
                pc.multiply(batch["doc_id"], 2),
            )

        ds = ray.data.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id"]
        )
        pipe = Pipeline([FnStage("double", double), FnStage("again", double)])
        out, ctx = pipe.run(ds)
        vals = sorted(out.to_pandas()["doc_id"])
        assert vals[0] == 0 and vals[1] == 4  # 1*2*2
        assert [m["stage"] for m in ctx.metrics] == ["double", "again"]

    def test_output_schema_enforced(self, ray_session, sf_small):
        import ray.data

        wrong = pa.schema([("nope", pa.int64())])
        ds = ray.data.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id"]
        )
        pipe = Pipeline(
            [FnStage("id", lambda b: b, output_schema=wrong)]
        )
        out, _ = pipe.run(ds)
        with pytest.raises(Exception):
            out.to_pandas()


class TestReaders:
    def test_parquet_pruned_read(self, ray_session, sf_small):
        ds = readers.read_table(
            f"{sf_small}/documents.parquet", columns=["doc_id", "lang"]
        )
        assert set(ds.schema().names) == {"doc_id", "lang"}

    def test_lance_gated(self):
        if readers.have_lance():
            pytest.skip("lance present")
        with pytest.raises(ImportError):
            readers.read_table("/tmp/nonexistent.lance")

    def test_row_filter_pushdown(self, ray_session, sf_small):
        import pyarrow.compute as pc

        ds = readers.read_table(
            f"{sf_small}/documents.parquet",
            columns=["doc_id", "lang"],
            row_filter=(pc.field("lang") == "en"),
        )
        df = ds.to_pandas()
        assert (df["lang"] == "en").all() and len(df) > 0


class TestHarmonizedReader:
    def test_schema_drift_union(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_machine_ray.sources.readers import read_harmonized

        target = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        )
        # v1 shard: no lang column yet, doc_id was int32
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int32()),
                    "text": pa.array(["a", "b"]),
                }
            ),
            str(tmp_path / "v1.parquet"),
        )
        # v2 shard: full schema plus an extra column to drop
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([3], type=pa.int64()),
                    "text": pa.array(["c"]),
                    "lang": pa.array(["en"]),
                    "debug_notes": pa.array(["x"]),
                }
            ),
            str(tmp_path / "v2.parquet"),
        )
        ds = read_harmonized(
            [str(tmp_path / "v1.parquet"), str(tmp_path / "v2.parquet")],
            target,
        )
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(df.columns) == ["doc_id", "text", "lang"]
        assert df["doc_id"].tolist() == [1, 2, 3]
        assert df["lang"].isna().tolist() == [True, True, False]
