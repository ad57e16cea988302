"""ocr_machine_ray — a Ray-Data-native document extraction engine.

Public API (stable surface for pipeline users):

    from ocr_machine_ray import (
        extract, spans_corpus, read_documents,   # flagship pipeline
        queries, oracle_sql,                      # query registry
    )
"""

# Ray pickles map_batches callables by reference; worker processes may not
# have this repo on sys.path (the driver controls cwd/PYTHONPATH, not us).
# Registering the package for pickle-by-value with Ray's VENDORED cloudpickle
# makes every stage function self-contained in the task payload regardless of
# worker environment — and doing it here (not only in __ray_entry__) covers
# drivers that import the library directly.
import sys as _sys

from ray import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

from .pipelines.extraction import (  # noqa: F401
    extract,
    extract_flat_shuffled,
    extract_via_cv,
    read_documents,
    spans_corpus,
)
from .registry import oracle_sql, queries  # noqa: F401
