"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

No ray.init()/ray.shutdown() here or in the library (driver owns the
session); bench.py and tests/conftest.py own their own sessions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Importing the package registers it for pickle-by-value with Ray's
# vendored cloudpickle (see ocr_machine_ray/__init__.py) so workers can run
# stage functions without this repo on their sys.path.
import ocr_machine_ray  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship extraction pipeline on sf0.001 (see pipelines/extraction.py)."""
    from ocr_machine_ray.pipelines.extraction import extract

    return extract(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_machine_ray import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from ocr_machine_ray import registry

    return registry.oracle_sql()
