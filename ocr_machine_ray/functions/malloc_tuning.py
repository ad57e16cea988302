"""Once-per-process glibc malloc tuning for numpy-heavy worker stages.

numpy allocates every array > 128 KiB through malloc's mmap path, and
glibc munmaps those blocks the moment they're freed. A vectorized codec
batch makes dozens of MB-scale allocations per call, so every call pays
the full mmap + page-fault + kernel-zeroing cost again — and with 32
concurrent worker processes the zero-page storms compound: the FIRST
388-page JPEG encode per worker measured 25.0 s at 32-way concurrency vs
1.5 s warm, and 4.1 s with the thresholds raised (same host, same data).

Raising M_MMAP_THRESHOLD keeps those buffers on the brk heap and raising
M_TRIM_THRESHOLD stops glibc returning the freed heap to the kernel, so
batch N+1 reuses batch N's already-faulted pages. Cost: worker RSS holds
its high-water mark (bounded by the largest batch working set, tens of
MB per worker here) — the right trade for long-lived Ray actor/worker
processes.
"""

from __future__ import annotations

import ctypes
import sys

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1
_THRESHOLD_BYTES = 256 << 20

_done = False


def tune_malloc() -> None:
    """Idempotent; safe anywhere (no-op off Linux/glibc or on failure)."""
    global _done
    if _done:
        return
    _done = True
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(
            ctypes.c_int(_M_MMAP_THRESHOLD), ctypes.c_int(_THRESHOLD_BYTES)
        )
        libc.mallopt(
            ctypes.c_int(_M_TRIM_THRESHOLD), ctypes.c_int(_THRESHOLD_BYTES)
        )
    except Exception:
        pass  # non-glibc libc: defaults stand
