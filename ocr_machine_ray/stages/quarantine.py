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

    The output schema is kept CONSISTENT across batches even when every
    row of a batch is poison: the schema is probed with ``fn`` on an empty
    slice first, falling back to ``error_schema`` and finally to
    ``(doc_id)`` — so mixed clean/poison datasets never emit blocks with
    diverging schemas.
    """

    def _probe_schema(batch: pa.Table) -> pa.Schema:
        try:
            return fn(batch.slice(0, 0)).schema
        except Exception:
            return error_schema or pa.schema([("doc_id", pa.int64())])

    def safe(batch: pa.Table) -> pa.Table:
        out_schema = _probe_schema(batch)
        if len(batch) == 0:
            return pa.table(
                {f.name: pa.nulls(0, type=f.type) for f in out_schema}
            ).append_column("_error", pa.nulls(0, type=pa.string()))

        ok_parts: list[pa.Table] = []
        err_doc: list = []
        err_msg: list[str] = []

        def attempt(tbl: pa.Table) -> None:
            if len(tbl) == 0:
                return
            try:
                out = fn(tbl)
            except Exception as exc:
                if len(tbl) == 1:
                    err_doc.append(tbl["doc_id"][0].as_py())
                    err_msg.append(f"{type(exc).__name__}: {exc}"[:500])
                else:
                    mid = len(tbl) // 2
                    attempt(tbl.slice(0, mid))
                    attempt(tbl.slice(mid))
                return
            # cast OUTSIDE the try: a schema mismatch between fn's row-path
            # output and the probed/declared out_schema is an engine bug, not
            # per-row poison — quarantining it would silently route every
            # healthy row into the error channel (false poison / data loss)
            ok_parts.append(
                out.cast(out_schema) if out.schema != out_schema else out
            )

        attempt(batch)
        good = pa.concat_tables(ok_parts) if ok_parts else None
        if not err_doc:
            assert good is not None
            return good.append_column(
                "_error", pa.nulls(len(good), type=pa.string())
            )
        n_err = len(err_doc)
        cols = {}
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


def split_errors(ds, materialize: bool = True):
    """Split a quarantined Dataset into (clean, errors) — clean rows with
    ``_error`` dropped, error records kept for the lineage/metrics table.

    ``materialize=True`` (default) pins the quarantined dataset once so the
    two consumers don't re-execute the whole upstream pipeline (including
    per-poison-row bisection) twice. Pass ``materialize=False`` only when
    the caller consumes just one side, or plumbs both sides through a
    single pass (e.g. two write sinks inside one map)."""
    import pyarrow.compute as pc

    if materialize:
        ds = ds.materialize()
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
