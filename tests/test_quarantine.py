"""Poison-row quarantine tests."""

from __future__ import annotations

import pyarrow as pa
from ocr_machine_ray.stages.quarantine import quarantine_batch_fn, split_errors


def _kernel(batch: pa.Table) -> pa.Table:
    """Fails on doc_id == 13 (the poison row)."""
    ids = batch["doc_id"].to_pylist()
    if 13 in ids:
        raise ValueError("poison payload")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "double_id": pa.array([i * 2 for i in ids], type=pa.int64()),
        }
    )


class TestQuarantine:
    def test_clean_batch_passes_through(self):
        safe = quarantine_batch_fn(_kernel)
        out = safe(pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64())}))
        assert out["double_id"].to_pylist() == [2, 4, 6]
        assert out["_error"].null_count == 3

    def test_poison_row_isolated(self):
        safe = quarantine_batch_fn(_kernel)
        out = safe(
            pa.table({"doc_id": pa.array(list(range(10, 20)), type=pa.int64())})
        )
        df = out.to_pandas()
        bad = df[df["_error"].notna()]
        good = df[df["_error"].isna()]
        assert bad["doc_id"].tolist() == [13]
        assert "ValueError: poison payload" in bad["_error"].iloc[0]
        assert sorted(good["doc_id"]) == [10, 11, 12, 14, 15, 16, 17, 18, 19]
        assert (good["double_id"] == good["doc_id"] * 2).all()

    def test_all_rows_poison(self):
        safe = quarantine_batch_fn(
            _kernel, error_schema=pa.schema([("doc_id", pa.int64())])
        )
        out = safe(pa.table({"doc_id": pa.array([13], type=pa.int64())}))
        assert out["_error"].null_count == 0
        assert len(out) == 1

    def test_dataset_split(self, ray_session):
        import ray.data

        # defined inline: a nested function pickles by value, so workers
        # don't need the tests package on their sys.path
        def kernel(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            if 13 in ids:
                raise ValueError("poison payload")
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "double_id": pa.array(
                        [i * 2 for i in ids], type=pa.int64()
                    ),
                }
            )

        ds = ray.data.from_items(
            [{"doc_id": i} for i in range(10, 20)]
        ).map_batches(
            quarantine_batch_fn(kernel), batch_format="pyarrow"
        )
        clean, errors = split_errors(ds)
        assert clean.count() == 9
        err = errors.to_pandas()
        assert err["doc_id"].tolist() == [13]
