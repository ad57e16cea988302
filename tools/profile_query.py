"""Profile one registry query: wall time + Ray Dataset stats.

Usage:  python tools/profile_query.py <query> [sf_dir] [num_cpus]

Prints the host-contention probe (see BASELINE.md), executes the query,
and dumps `ds.stats()` so per-operator wall time, task counts, and block
sizes are visible — the feedback loop for "is wall-time dominated by
useful compute".
"""

from __future__ import annotations

import sys
import time


def host_probe() -> float:
    import numpy as np

    x = (np.arange(50_000_000, dtype=np.int64) % 251).astype(np.uint8)
    t0 = time.time()
    acc = 0.0
    for _ in range(2):
        acc += float(x.astype(np.float64).sum())
    assert acc > 0
    return time.time() - t0


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    print(f"host_probe {host_probe():.3f}s")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    from ocr_machine_ray import registry

    fn = registry.queries()[name]
    t0 = time.time()
    out = fn(sf_dir)
    if hasattr(out, "materialize"):
        out = out.materialize()
        n = out.count()
        print(f"\n=== {name}: {time.time() - t0:.2f}s, {n} rows ===")
        print(out.stats())
    else:
        n = len(out)
        print(f"\n=== {name}: {time.time() - t0:.2f}s, {n} rows "
              "(driver-side result; no dataset stats) ===")
    print(f"host_probe_post {host_probe():.3f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
