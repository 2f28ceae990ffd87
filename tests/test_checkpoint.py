"""Checkpoint/lineage + resume semantics (SURVEY.md §4): completed
stages are not recomputed, config changes refuse stale lineage,
partition-level resume skips finished partitions."""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts
from fuzzy_matching_ray.state.checkpoint import CheckpointManager


def test_stage_checkpoint_reuse(ray_session, tiny_transcripts, tmp_path):
    cfg = PipelineConfig(num_partitions=4, workdir=str(tmp_path / "ck"))
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])

    r1 = dedup_transcripts(turns, cfg)
    manifest = tmp_path / "ck" / "stage=docs" / "_manifest.json"
    mtime1 = manifest.stat().st_mtime

    r2 = dedup_transcripts(turns, cfg)
    assert r2.metrics["docs_reused"] is True
    assert manifest.stat().st_mtime == mtime1  # not recomputed

    a = r1.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = r2.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_config_change_invalidates(ray_session, tiny_transcripts, tmp_path):
    wd = str(tmp_path / "ck2")
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    dedup_transcripts(turns, PipelineConfig(num_partitions=4, workdir=wd))
    r = dedup_transcripts(turns, PipelineConfig(num_partitions=4, workdir=wd, shingle_k=4))
    assert r.metrics["docs_reused"] is False


def test_partitioned_resume_skips_done(ray_session, tmp_path):
    ck = CheckpointManager(str(tmp_path / "pk"), "cfg0")
    calls: list[str] = []

    def make(part: str):
        calls.append(part)
        return rd.from_pandas(pd.DataFrame({"part": [part], "v": [1]}))

    parts = ["p0", "p1", "p2"]
    ck.run_partitioned_stage("sig", parts, make)
    assert calls == parts

    # simulate a killed run: wipe one partition from the done-list
    state_path = os.path.join(str(tmp_path / "pk"), "stage=sig", "_partitions.json")
    with open(state_path) as f:
        state = json.load(f)
    state["done"] = ["p0", "p1"]
    with open(state_path, "w") as f:
        json.dump(state, f)
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path / "pk"), "stage=sig", "part=p2"))

    done_dir = os.path.join(str(tmp_path / "pk"), "stage=sig", "part=p0")
    mtime_before = os.path.getmtime(done_dir)
    time.sleep(0.05)

    calls.clear()
    res = ck.run_partitioned_stage("sig", parts, make)
    assert calls == ["p2"]  # only the incomplete partition recomputed
    assert os.path.getmtime(done_dir) == mtime_before
    assert res.rows == 3


def test_filelist_fast_path_kill_after_signatures_resumes(
    ray_session, tiny_transcripts, tmp_path
):
    """Round-4's shuffle-free file-local assembly bypasses the generic
    read — resume must cover it too.  Simulate a run killed after the
    signature stage on the FILE-LIST input: only the docs checkpoint
    survives; the rerun must reuse it (manifest mtime unchanged, no
    assembly recompute) and land byte-identical clusters."""
    import glob
    import shutil

    wd = str(tmp_path / "ckfl")
    files = sorted(glob.glob(os.path.join(tiny_transcripts["turns_dir"], "*.parquet")))
    assert len(files) >= 2  # conv-sharded layout precondition
    cfg = PipelineConfig(num_partitions=4, workdir=wd)

    r1 = dedup_transcripts(files, cfg)
    full = r1.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    docs_manifest = os.path.join(wd, "stage=docs", "_manifest.json")
    mtime_docs = os.path.getmtime(docs_manifest)

    # kill-after-signatures state: docs checkpoint exists, nothing
    # downstream does (signatures themselves are recomputed by design)
    for stage in ("pairs", "edges", "clusters"):
        shutil.rmtree(os.path.join(wd, f"stage={stage}"), ignore_errors=True)
    time.sleep(0.05)

    r2 = dedup_transcripts(files, cfg)
    assert r2.metrics["docs_reused"] is True
    assert os.path.getmtime(docs_manifest) == mtime_docs  # no assembly recompute
    resumed = r2.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed, full)

    # and the file-list path must agree with the Dataset path exactly
    r3 = dedup_transcripts(
        rd.read_parquet(tiny_transcripts["turns_dir"]),
        PipelineConfig(num_partitions=4),
    )
    via_ds = r3.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_ds, full)
