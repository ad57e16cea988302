"""Poison-row quarantine (SURVEY.md §4.2: "retries: none — failures are
caught, logged, and the item is skipped with an error record",
``table_detector_agent.py:205-206``, ``textract_agent.py:246-252``).

The engine's version: wrap any per-batch kernel so a failing batch is
bisected down to the poison rows, which flow to an error side-channel
(``_error`` column) instead of killing the task. Ray's task retries handle
transient failures; this handles deterministic per-row poison (corrupt
payloads, pathological inputs) that retries would just replay.
"""

from __future__ import annotations


from typing import Callable

import pyarrow as pa


def quarantine_batch_fn(
    fn: Callable[[pa.Table], pa.Table],
    error_schema: pa.Schema | None = None,
):
    """Wrap ``fn`` (Table -> Table) into a kernel that never raises.

    Returns a batch function producing ``fn(batch)`` rows augmented with a
    null ``_error`` column; rows that make ``fn`` raise are emitted with
    ``_error`` set to the exception summary and all OUTPUT columns null
    (the input's ``doc_id`` is preserved for the error record). Bisection
    costs O(log n) extra ``fn`` calls per poison row, only on failure.
    """

    def safe(batch: pa.Table) -> pa.Table:
        ok_parts: list[pa.Table] = []
        err_doc: list = []
        err_msg: list[str] = []

        def attempt(tbl: pa.Table) -> None:
            if len(tbl) == 0:
                return
            try:
                out = fn(tbl)
                ok_parts.append(out)
            except Exception as exc:
                if len(tbl) == 1:
                    err_doc.append(tbl["doc_id"][0].as_py())
                    err_msg.append(
                        f"{type(exc).__name__}: {exc}"[:500]
                    )
                else:
                    mid = len(tbl) // 2
                    attempt(tbl.slice(0, mid))
                    attempt(tbl.slice(mid))

        attempt(batch)
        if ok_parts:
            good = pa.concat_tables(ok_parts)
        else:
            good = None
        if not err_doc:
            assert good is not None
            return good.append_column(
                "_error", pa.nulls(len(good), type=pa.string())
            )
        # build error rows: doc_id + _error, other columns null
        out_schema = (
            good.schema if good is not None else
            (error_schema or pa.schema([("doc_id", pa.int64())]))
        )
        cols = {}
        n_err = len(err_doc)
        for field in out_schema:
            if field.name == "doc_id":
                cols["doc_id"] = pa.array(err_doc, type=field.type)
            else:
                cols[field.name] = pa.nulls(n_err, type=field.type)
        err_tbl = pa.table(cols).append_column(
            "_error", pa.array(err_msg, type=pa.string())
        )
        if good is None:
            return err_tbl
        good = good.append_column(
            "_error", pa.nulls(len(good), type=pa.string())
        )
        return pa.concat_tables([good, err_tbl])

    safe.__name__ = f"quarantined_{getattr(fn, '__name__', 'fn')}"
    return safe


def split_errors(ds):
    """Split a quarantined Dataset into (clean, errors) — clean rows with
    ``_error`` dropped, error records kept for the lineage/metrics table."""
    import pyarrow.compute as pc

    clean = ds.map_batches(
        lambda t: t.filter(
            pc.is_null(t["_error"].combine_chunks())
        ).drop_columns(["_error"]),
        batch_format="pyarrow",
    )
    errors = ds.map_batches(
        lambda t: t.filter(
            pc.is_valid(t["_error"].combine_chunks())
        ),
        batch_format="pyarrow",
    )
    return clean, errors
