"""Per-stage checkpointing with lineage manifests (SURVEY.md §4).

Every checkpointed stage writes its output Parquet to a temp directory,
then atomically renames it into place and records a manifest
(``_manifest.json``: stage name, config hash, input fingerprint, row
count, wall time).  On resume, a stage whose manifest matches the
current config hash + input fingerprint is *not recomputed* — its
output is simply ``read_parquet``-ed.  A changed config or input
refuses to reuse the lineage.

For the embarrassingly-parallel stages the runner also supports
*partition-level* lineage: the work list is split by a partition key
and each partition writes its own sub-directory + manifest entry, so a
killed run resumes at the first incomplete partition (the resume test
kills between partitions and asserts completed ones keep their mtime).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable

import ray.data

MANIFEST = "_manifest.json"


@dataclass
class StageResult:
    ds: ray.data.Dataset
    path: str
    reused: bool
    rows: int


class CheckpointManager:
    """Owns a pipeline work directory and its stage manifests."""

    def __init__(self, workdir: str, config_hash: str):
        self.workdir = workdir
        self.config_hash = config_hash
        os.makedirs(workdir, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, f"stage={stage}")

    def _load_manifest(self, stage: str) -> dict | None:
        p = os.path.join(self._stage_dir(stage), MANIFEST)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def completed(self, stage: str, input_fingerprint: str = "") -> bool:
        m = self._load_manifest(stage)
        return bool(
            m
            and m.get("config_hash") == self.config_hash
            and m.get("input_fingerprint") == input_fingerprint
            and m.get("complete")
        )

    def run_stage(
        self,
        stage: str,
        fn: Callable[[], ray.data.Dataset],
        *,
        input_fingerprint: str = "",
    ) -> StageResult:
        """Execute ``fn`` (returning a Dataset) unless a valid
        checkpoint exists; either way return the checkpointed Dataset."""
        out_dir = self._stage_dir(stage)
        if self.completed(stage, input_fingerprint):
            m = self._load_manifest(stage)
            # partitioning=None: the checkpoint layout's own hive-style
            # dir names (stage=X/part=Y) must not be inferred back as
            # extra columns — resumed schemas must equal computed ones
            ds = ray.data.read_parquet(out_dir, file_extensions=["parquet"], partitioning=None)
            return StageResult(ds=ds, path=out_dir, reused=True, rows=m.get("rows", -1))

        t0 = time.time()
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        ds = fn()
        ds.write_parquet(tmp_dir)
        rows = _parquet_rows(tmp_dir)
        manifest = {
            "stage": stage,
            "config_hash": self.config_hash,
            "input_fingerprint": input_fingerprint,
            "rows": rows,
            "wall_sec": round(time.time() - t0, 3),
            "complete": True,
        }
        with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp_dir, out_dir)
        out = ray.data.read_parquet(out_dir, file_extensions=["parquet"], partitioning=None)
        return StageResult(ds=out, path=out_dir, reused=False, rows=rows)

    def run_partitioned_stage(
        self,
        stage: str,
        partitions: list[str],
        fn: Callable[[str], ray.data.Dataset],
        *,
        input_fingerprint: str = "",
    ) -> StageResult:
        """Partition-level lineage: ``fn(partition)`` computes one
        partition's output; completed partitions are skipped on
        resume."""
        out_dir = self._stage_dir(stage)
        os.makedirs(out_dir, exist_ok=True)
        state_path = os.path.join(out_dir, "_partitions.json")
        state: dict = {"config_hash": self.config_hash, "input_fingerprint": input_fingerprint, "done": []}
        if os.path.exists(state_path):
            try:
                with open(state_path) as f:
                    prev = json.load(f)
                if (
                    prev.get("config_hash") == self.config_hash
                    and prev.get("input_fingerprint") == input_fingerprint
                ):
                    state = prev
            except (json.JSONDecodeError, OSError):
                pass

        for part in partitions:
            if part in state["done"]:
                continue
            part_dir = os.path.join(out_dir, f"part={part}")
            tmp = part_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(part_dir, ignore_errors=True)
            ds = fn(part)
            ds.write_parquet(tmp)
            os.rename(tmp, part_dir)
            state["done"].append(part)
            with open(state_path, "w") as f:
                json.dump(state, f)

        rows = _parquet_rows(out_dir)
        with open(os.path.join(out_dir, MANIFEST), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "config_hash": self.config_hash,
                    "input_fingerprint": input_fingerprint,
                    "rows": rows,
                    "complete": True,
                    "partitions": state["done"],
                },
                f,
                indent=2,
            )
        ds = ray.data.read_parquet(out_dir, file_extensions=["parquet"], partitioning=None)
        return StageResult(ds=ds, path=out_dir, reused=False, rows=rows)


def _parquet_rows(root: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(dirpath, fn)).num_rows
    return total


def input_fingerprint(paths: list[str] | str) -> str:
    """Cheap input fingerprint: file names + sizes (not content —
    re-reading 100 TB to fingerprint it would defeat the purpose)."""
    import hashlib

    if isinstance(paths, str):
        paths = [paths]
    h = hashlib.sha256()
    for p in sorted(paths):
        if os.path.isdir(p):
            for dirpath, _d, files in sorted(os.walk(p)):
                for fn in sorted(files):
                    if fn.endswith(".parquet"):
                        fp = os.path.join(dirpath, fn)
                        h.update(fn.encode())
                        h.update(str(os.path.getsize(fp)).encode())
        elif os.path.exists(p):
            h.update(os.path.basename(p).encode())
            h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()[:16]
