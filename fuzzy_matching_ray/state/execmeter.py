"""Execution-barrier meter.

Every Dataset *execution* (a ``materialize()``, a ``count()``/iterate
on a lazy plan, a ``to_pandas()``) pays a fixed scheduling + actor
spin-up cost (~1s on the sandbox) that is independent of CPU count —
at small inputs this constant, multiplied by the number of barriers,
bounds scaling efficiency.  The flagship pipeline tags every barrier
site through :func:`record` and reports ``metrics['executions']`` /
``metrics['execution_sites']`` so an accidentally re-introduced
barrier shows up as a counter regression, not a wall-clock mystery.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_counts: dict[str, int] = {}


def record(site: str) -> None:
    """Count one Dataset execution at the named barrier site."""
    with _lock:
        _counts[site] = _counts.get(site, 0) + 1


def reset() -> None:
    with _lock:
        _counts.clear()


def snapshot() -> dict[str, int]:
    with _lock:
        return dict(_counts)
