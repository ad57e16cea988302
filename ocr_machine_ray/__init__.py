"""ocr_machine_ray — a Ray-Data-native document extraction engine.

Public API (stable surface for pipeline users):

    from ocr_machine_ray import (
        extract, spans_corpus, read_documents,   # flagship pipeline
        queries, oracle_sql,                      # query registry
    )
"""

from .pipelines.extraction import (  # noqa: F401
    extract,
    extract_flat_shuffled,
    extract_via_cv,
    read_documents,
    spans_corpus,
)
from .registry import oracle_sql, queries  # noqa: F401
