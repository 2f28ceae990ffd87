from __future__ import annotations

import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per build brief)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts(tmp_path_factory):
    """Deterministic tiny transcript corpus + dup truth (seed 42)."""
    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts

    root = str(tmp_path_factory.mktemp("transcripts"))
    cfg = TranscriptGenConfig(n_convs=80, seed=42)
    turns_dir = write_transcripts(root, cfg)
    return {"root": root, "turns_dir": turns_dir, "cfg": cfg}
