"""Shared helpers for the examples (reference examples/utils.py)."""

from __future__ import annotations

import os


def ensure_ray(num_cpus: int = 4) -> bool:
    """Init a local Ray session if none exists.  Returns True when THIS
    call owns the session (caller should shut it down)."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return True


def finish_ray(owned: bool) -> None:
    import ray

    if owned and ray.is_initialized():
        ray.shutdown()


def print_table(rows: list[dict], limit: int = 5, title: str | None = None) -> None:
    """Tiny fixed-width table printer (reference examples/utils.py
    print_table — dependency-free)."""
    if title:
        print(f"\n--- {title} ---")
    if not rows:
        print("(empty)")
        return
    cols = list(rows[0].keys())
    widths = {
        c: max(len(str(c)), *(len(str(r.get(c, ""))) for r in rows[:limit]))
        for c in cols
    }
    print(" | ".join(str(c).ljust(widths[c]) for c in cols))
    print("-+-".join("-" * widths[c] for c in cols))
    for r in rows[:limit]:
        print(" | ".join(str(r.get(c, "")).ljust(widths[c]) for c in cols))
    if len(rows) > limit:
        print(f"... ({len(rows)} rows total)")


def scratch_dir(name: str) -> str:
    d = os.path.join("/tmp/fmr_examples", name)
    os.makedirs(d, exist_ok=True)
    return d
