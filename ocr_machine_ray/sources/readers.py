"""Sources (SURVEY.md §2.1): columnar readers with pruning, Lance gated
behind an import-try (the north-star input format; parquet is the portable
fallback in this environment).
"""

from __future__ import annotations

from typing import Any


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(
    path: str,
    columns: list[str] | None = None,
    row_filter: Any = None,
):
    """Read a Lance dataset or parquet file/dir as a ray.data.Dataset with
    column pruning and (for parquet) row-group predicate pushdown.

    Lance path: ``ray.data.read_lance`` when the lance package is present
    (the 10^12-row corpus lives in Lance per BASELINE.json); otherwise a
    parquet file of the same schema.
    """
    import ray.data

    if path.endswith(".lance"):
        if not have_lance():
            raise ImportError(
                "lance is not installed in this environment; "
                "use the parquet mirror of the table"
            )
        return ray.data.read_lance(path, columns=columns)
    kwargs: dict[str, Any] = {}
    if columns is not None:
        kwargs["columns"] = columns
    if row_filter is not None:
        kwargs["filter"] = row_filter
    return ray.data.read_parquet(path, **kwargs)


def read_spans_corpus(sf_dir: str):
    """The engine's canonical input: interleaved spans rows (F1). Derived
    lazily from the flat documents table in this sandbox; a production
    deployment reads the Lance spans table directly via read_table()."""
    from ..pipelines.extraction import spans_corpus

    return spans_corpus(sf_dir)


def read_jsonl(path: str):
    import ray.data

    return ray.data.read_json(path)


def read_binary_media(path: str):
    """Binary payload reader (page images / crops) with per-file paths."""
    import ray.data

    return ray.data.read_binary_files(path, include_paths=True)


def read_harmonized(paths: list[str], target_schema):
    """Schema-evolution-tolerant multi-shard read: every shard is
    normalized to ``target_schema`` (missing columns filled with nulls,
    extra columns dropped, types cast) BEFORE the union, so shards written
    by different pipeline versions stream through one Dataset. A 100 TB
    corpus accumulated over months WILL contain schema drift; a reader
    that crashes on the first old shard cannot backfill.

    Normalization happens inside map_batches on the workers — the driver
    never touches shard data."""
    import pyarrow as pa
    import ray.data

    def normalize(batch: pa.Table) -> pa.Table:
        cols = []
        for field in target_schema:
            if field.name in batch.column_names:
                col = batch[field.name]
                if col.type != field.type:
                    col = col.cast(field.type)
            else:
                col = pa.nulls(len(batch), type=field.type)
            cols.append(col)
        return pa.Table.from_arrays(cols, schema=target_schema)

    parts = [
        ray.data.read_parquet(p).map_batches(
            normalize, batch_format="pyarrow", zero_copy_batch=True
        )
        for p in paths
    ]
    ds = parts[0]
    return ds.union(*parts[1:]) if len(parts) > 1 else ds
