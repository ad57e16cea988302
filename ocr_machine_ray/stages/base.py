"""Stage protocol + pipeline builder (SURVEY.md §2.10).

The reference's extension surface is a numbered-STEP contract of
module-level functions with JSON-on-disk interfaces (``main.py:1-28``) and
the trp schema-preserving doc->doc transformer chain. The engine equivalent:
a Stage is ``(Dataset, ctx) -> Dataset`` with declared Arrow schemas; a
Pipeline composes stages and validates every boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

import pyarrow as pa


@dataclass
class StageContext:
    """Per-run context passed to every stage: configuration + metric sink."""

    config: dict[str, Any] = field(default_factory=dict)
    metrics: list[dict[str, Any]] = field(default_factory=list)

    def emit_metric(self, stage: str, **kv: Any) -> None:
        self.metrics.append({"stage": stage, **kv})


class Stage(Protocol):
    name: str
    input_schema: pa.Schema | None
    output_schema: pa.Schema | None

    def __call__(self, ds, ctx: StageContext):
        ...


@dataclass
class FnStage:
    """Wrap a batch function (or actor class) as a schema-checked stage."""

    name: str
    fn: Callable | type
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: int | None = None
    input_schema: pa.Schema | None = None
    output_schema: pa.Schema | None = None
    fn_constructor_args: tuple = ()

    def __call__(self, ds, ctx: StageContext):
        kwargs: dict[str, Any] = {"batch_format": self.batch_format}
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if isinstance(self.fn, type):
            kwargs["concurrency"] = self.concurrency or 2
            if self.fn_constructor_args:
                kwargs["fn_constructor_args"] = self.fn_constructor_args
        if self.batch_format == "pyarrow":
            kwargs["zero_copy_batch"] = True
        out = ds.map_batches(self.fn, **kwargs)
        if self.output_schema is not None:
            from ..schema import validate

            schema = self.output_schema
            name = self.name

            def check(batch: pa.Table) -> pa.Table:
                return validate(batch, schema, name)

            out = out.map_batches(check, batch_format="pyarrow",
                                  zero_copy_batch=True)
        ctx.emit_metric(self.name, kind="map_batches")
        return out


@dataclass
class Pipeline:
    """Compose stages left-to-right over a Dataset."""

    stages: list[Stage]

    def run(self, ds, ctx: StageContext | None = None):
        ctx = ctx or StageContext()
        for stage in self.stages:
            ds = stage(ds, ctx)
        return ds, ctx
