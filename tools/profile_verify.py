"""Single-process section profile of the verify kernel on real data.

Builds the flagship state (docs → exact dedup → signatures → candidate
pairs → broadcast store) at a conversation-sharded fixture dir, pulls a
sample of pair blocks to the driver, and drives ``VerifierPool``
in-process with ``stages.verify.PROF`` section timers (and optionally
cProfile) — so kernel changes can be A/B'd on the exact production
store + pair stream without a 32-way distributed run in the loop.

Usage:
    python tools/profile_verify.py [scale_dir] [--frac 0.1] [--cprofile]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray


def build_state(scale_dir: str):
    """Replicate the flagship glue up to (attached pairs, store_ref)."""
    import glob

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    cfg = PipelineConfig(num_partitions=64)
    files = sorted(glob.glob(f"{scale_dir}/turns/*.parquet"))
    if not files:
        raise SystemExit(f"no shards under {scale_dir}/turns")

    # run the real pipeline but capture (pairs, store_ref) by hooking
    # verify_pairs' executor: easiest faithful capture is to re-run the
    # pre-verify stages exactly as dedup_transcripts does — instead we
    # hook the scoring map_batches via a monkeypatch-free env: rerun
    # pre-verify stages here with the same calls.
    from fuzzy_matching_ray.stages.assemble import assemble_documents_from_files
    from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
    from fuzzy_matching_ray.stages.exact_dedup import (
        add_text_hash,
        drop_exact_dups_broadcast,
        exact_dup_edges,
    )
    from fuzzy_matching_ray.stages.blocks import gather_column
    from fuzzy_matching_ray.stages.minhash import compute_signatures, dedup_pairs
    from fuzzy_matching_ray.stages.channels import get_channel
    from fuzzy_matching_ray.stages.verify import attach_texts_broadcast

    docs = assemble_documents_from_files(files, separator=cfg.turn_separator)
    docs = canonicalize_documents(docs, cfg)
    docs = docs.map_batches(add_text_hash, batch_format="pyarrow").materialize()
    exact_edges = exact_dup_edges(docs, cfg.num_partitions).materialize()
    n_dup = exact_edges.count()
    if n_dup:
        dup_ids_ref = ray.put(pa.array(gather_column(exact_edges, "dst"), pa.string()))
        uniq_docs = drop_exact_dups_broadcast(docs, dup_ids_ref)
    else:
        uniq_docs = docs
    n_docs = docs.count() - n_dup
    sigs = compute_signatures(uniq_docs, cfg, with_shingles=True, n_docs=n_docs).materialize()
    pairs = get_channel("minhash")(uniq_docs, sigs, cfg)
    pairs = dedup_pairs(pairs, cfg.num_partitions).materialize()
    pairs, store_ref = attach_texts_broadcast(pairs, docs, cfg, sigs=sigs)
    return cfg, pairs, store_ref


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/tmp/fmr_cache/scale72000"
    frac = 0.1
    if "--frac" in sys.argv:
        frac = float(sys.argv[sys.argv.index("--frac") + 1])
    use_cprofile = "--cprofile" in sys.argv

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    cfg, pairs, store_ref = build_state(scale_dir)
    n_pairs = pairs.count()
    print(f"state built in {time.perf_counter()-t0:.1f}s: {n_pairs} pairs")

    # pull a deterministic sample of pair blocks to the driver
    refs = [r for b in pairs.iter_internal_ref_bundles() for r in b.block_refs]
    step = max(1, int(round(1 / frac)))
    sample_refs = refs[::step]
    tables = [ray.get(r) for r in sample_refs]
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t) for t in tables]
    n_sample = sum(t.num_rows for t in tables)
    print(f"sampled {len(tables)}/{len(refs)} blocks = {n_sample} pairs")

    from fuzzy_matching_ray.stages import verify as V

    pool = V.VerifierPool(cfg, store_ref, emit_gate_sentinels=False)
    bs = cfg.verify_batch_size
    batches = []
    for t in tables:
        for off in range(0, t.num_rows, bs):
            batches.append(t.slice(off, bs))

    V.PROF = prof = {}
    prof_obj = None
    if use_cprofile:
        import cProfile

        prof_obj = cProfile.Profile()
        prof_obj.enable()
    t0 = time.perf_counter()
    n_edges = 0
    for b in batches:
        out = pool(b)
        sc = np.maximum(out["jaccard"].to_numpy(), out["edit_sim"].to_numpy())
        n_edges += int(
            np.count_nonzero(
                (sc >= min(cfg.jaccard_threshold, cfg.edit_accept_threshold))
            )
        )
    wall = time.perf_counter() - t0
    if prof_obj is not None:
        prof_obj.disable()
        import pstats

        pstats.Stats(prof_obj).sort_stats("cumulative").print_stats(25)
    V.PROF = None
    print(f"scored {n_sample} pairs in {wall:.2f}s = {n_sample/wall/1000:.1f}k pairs/s, edges≈{n_edges}")
    total = sum(prof.values())
    for k, v in sorted(prof.items(), key=lambda kv: -kv[1]):
        print(f"  {k:>14}: {v:7.2f}s  {100*v/total:5.1f}%")
    print(f"  (sections sum {total:.2f}s of {wall:.2f}s wall)")
    ray.shutdown()


if __name__ == "__main__":
    main()
