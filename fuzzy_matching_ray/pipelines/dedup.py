"""The flagship near-duplicate detection + clustering pipeline.

End-to-end flow (SURVEY.md §3.4):

    read_parquet(transcripts)
      → assemble (groupby conv_id, sort turn_idx)        [shuffle 1]
      → canonicalize (map_batches, Arrow)                [tasks]
      → exact-dup pre-pass (sha256 groupby)              [shuffle 0]
      → channel A: MinHash/LSH band rows → buckets       [shuffle 2]
      → channel B: SimHash band rows → buckets           [shuffle 2']
      → pair dedup (groupby (src,dst))                   [shuffle 3]
      → verify (actor pool, exact Jaccard)               [actor pool]
      → union-find label propagation                     [shuffle 4 × r]
      → clusters + representatives → write_parquet

Each checkpointable stage goes through ``CheckpointManager`` when a
``workdir`` is configured, so a killed run resumes from the last
completed stage (and per-partition for signatures).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.stages.assemble import assemble_documents
from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
from fuzzy_matching_ray.stages.exact_dedup import (
    BROADCAST_DROP_MAX,
    add_text_hash,
    drop_exact_dups,
    drop_exact_dups_broadcast,
    exact_dup_edges,
)
from fuzzy_matching_ray.state import execmeter
from fuzzy_matching_ray.stages.minhash import compute_signatures, dedup_pairs
from fuzzy_matching_ray.stages.union_find import (
    cluster_representatives,
    connected_components,
)
from fuzzy_matching_ray.stages.verify import verify_pairs
from fuzzy_matching_ray.state.checkpoint import CheckpointManager


@dataclass
class DedupResult:
    docs: ray.data.Dataset        # assembled+canonicalized documents
    edges: ray.data.Dataset       # verified similarity edges
    clusters: ray.data.Dataset    # (conv_id, cluster_id)
    representatives: ray.data.Dataset
    metrics: dict


def dedup_transcripts(
    turns: "ray.data.Dataset | list[str]",
    cfg: PipelineConfig | None = None,
    *,
    channels: tuple[str, ...] = ("minhash",),
    keep_docs: bool = True,
    attach: str = "auto",
) -> DedupResult:
    """Run the full pipeline on a transcripts Dataset — or, for
    conversation-partitioned parquet shards, a LIST OF FILE PATHS,
    which takes the shuffle-free read+assemble fast path
    (``stages/assemble.py`` ``assemble_documents_from_files``; the
    documented partitioning assumption lives there).

    ``attach`` selects the verify payload path: ``'broadcast'`` (doc
    store shipped once via ``ray.put``; signatures carry shingle sets)
    or ``'shuffle'`` (bucketed join attach; the signature dataset stays
    narrow and shingles are recomputed from attached text — the >2M-doc
    mode).  ``'auto'`` picks by unique-doc count."""
    import time as _time

    cfg = cfg or PipelineConfig()
    metrics: dict = {}
    timings: dict = {}
    metrics["stage_seconds"] = timings
    execmeter.reset()
    _t0 = _time.perf_counter()

    def _lap(name: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        timings[name] = round(now - _t0, 2)
        _t0 = now

    ckpt = CheckpointManager(cfg.workdir, cfg.config_hash()) if cfg.workdir else None

    def _docs() -> ray.data.Dataset:
        if isinstance(turns, (list, tuple)):
            from fuzzy_matching_ray.stages.assemble import assemble_documents_from_files

            docs = assemble_documents_from_files(
                list(turns), separator=cfg.turn_separator
            )
        else:
            docs = assemble_documents(
                turns, separator=cfg.turn_separator, num_partitions=cfg.num_partitions
            )
        docs = canonicalize_documents(docs, cfg)
        docs = docs.map_batches(add_text_hash, batch_format="pyarrow")
        return docs

    if ckpt:
        res = ckpt.run_stage("docs", _docs)
        docs, metrics["docs_rows"] = res.ds, res.rows
        metrics["docs_reused"] = res.reused
    else:
        execmeter.record("docs")
        docs = _docs().materialize()
        metrics["docs_rows"] = docs.count()
    _lap("docs")

    # exact-dup pre-pass: ONE narrow shuffle (text_sha256 + conv_id)
    # yields the dup edges AND, by broadcast of its dst column, the
    # unique-doc filter — the document payload never rides a dedup
    # shuffle, and nothing downstream re-executes this stage (the lazy
    # edge set used to re-run the hash shuffle inside the edge
    # materialize).
    execmeter.record("exact_edges")
    exact_edges = exact_dup_edges(docs, cfg.num_partitions).materialize()
    n_dup = exact_edges.count()
    metrics["exact_dup_docs"] = n_dup
    metrics["unique_docs"] = metrics["docs_rows"] - n_dup
    from ray.data.dataset import MaterializedDataset

    if isinstance(docs, MaterializedDataset):
        try:
            metrics["docs_bytes"] = int(docs.size_bytes())
        except Exception:
            pass

    if n_dup == 0:
        uniq_docs = docs
    elif n_dup <= BROADCAST_DROP_MAX:
        import ray as _ray

        from fuzzy_matching_ray.stages.blocks import gather_column

        dup_ids_ref = _ray.put(pa.array(gather_column(exact_edges, "dst"), pa.string()))
        uniq_docs = drop_exact_dups_broadcast(docs, dup_ids_ref)
        # minhash consumes uniq_docs exactly once (inside the signature
        # materialize, where the filter fuses for free); other channels
        # iterate it repeatedly, so give them a materialized copy
        if any(ch != "minhash" for ch in channels):
            execmeter.record("uniq_docs")
            uniq_docs = uniq_docs.materialize()
    else:
        # dup-id set too big to broadcast: full shuffle formulation
        execmeter.record("uniq_docs")
        uniq_docs = drop_exact_dups(docs, cfg.num_partitions).materialize()
    _lap("exact_dedup")

    # payload-attach mode decided up front: it gates whether shingle
    # sets (an ~4×-corpus payload) are carried on the signature dataset
    # at all — they are only useful to the broadcast store
    if attach == "auto":
        attach = "broadcast" if metrics["unique_docs"] <= 2_000_000 else "shuffle"
    metrics["attach_mode"] = attach

    # MinHash signatures are computed exactly once (narrow conv_id+sig
    # dataset) and reused by band generation AND the verifier's
    # estimate gate — recomputing them per verifier actor would
    # dominate the verify stage
    if "minhash" in channels:
        execmeter.record("signatures")
        sigs = compute_signatures(
            uniq_docs,
            cfg,
            with_shingles=(attach == "broadcast"),
            n_docs=metrics["unique_docs"],
        ).materialize()
    else:
        sigs = None
    if sigs is not None:
        try:
            metrics["sigs_bytes"] = int(sigs.size_bytes())
        except Exception:
            pass
    _lap("signatures")

    # candidate generation channels over unique docs, resolved through
    # the channel registry (user-pluggable — stages/channels.py)
    from fuzzy_matching_ray.stages.channels import get_channel

    pair_sets = [get_channel(name)(uniq_docs, sigs, cfg) for name in channels]
    if not pair_sets:
        raise ValueError("at least one channel required")

    # broadcast-store build overlaps the candidate-pair shuffle: the
    # store reads only the already-materialized docs + sigs blocks, so
    # its pack/assemble tasks run while the LSH bucket shuffle is in
    # flight instead of as a serial segment inside the verify stage.
    # Skipped when a checkpointed edge set will be reused (the build
    # would be pure waste).
    prebuilt_store = None
    if attach == "broadcast" and not (ckpt and ckpt.completed("edges")):
        from fuzzy_matching_ray.stages.verify import start_store_build

        prebuilt_store = start_store_build(docs, cfg, sigs)
    pairs = pair_sets[0]
    for extra in pair_sets[1:]:
        pairs = pairs.union(extra)

    def _pairs() -> ray.data.Dataset:
        return dedup_pairs(pairs, cfg.num_partitions)

    if ckpt:
        res = ckpt.run_stage("pairs", _pairs)
        uniq_pairs = res.ds
        metrics["candidate_pairs"] = res.rows
    else:
        execmeter.record("pairs")
        uniq_pairs = _pairs().materialize()
        metrics["candidate_pairs"] = uniq_pairs.count()
    try:
        metrics["pairs_bytes"] = int(uniq_pairs.size_bytes())
    except Exception:
        pass

    # skew accounting: exact dropped-cross-pair total carried by the
    # __skew sentinel rows.  The sentinels flow INTO verify unfiltered
    # (the verifier marks them dead, so they can never become edges).
    # Summed with per-block Ray tasks over the already-materialized
    # pair blocks — NOT one more Dataset execution.
    metrics["dropped_pairs_hot_buckets"] = _dropped_pairs(uniq_pairs)
    if cfg.hot_bucket_mode == "resalt":
        from fuzzy_matching_ray.stages.minhash import RESALT_CHANNEL

        metrics["resalted_pairs_hot_buckets"] = _dropped_pairs(
            uniq_pairs, channel=RESALT_CHANNEL
        )
    _lap("candidate_pairs")

    # verification.  The payload side (broadcast store / shuffle
    # attach / id→conv_id reverse map) reads the FULL materialized doc
    # corpus: dup nids never occur in candidate pairs, so the superset
    # is harmless, and gathering from an already-materialized dataset
    # costs zero extra executions (vs re-filtering uniq_docs per
    # consumer).
    def _edges() -> ray.data.Dataset:
        from fuzzy_matching_ray.stages.verify import edges_to_conv_ids

        verified = verify_pairs(
            uniq_pairs,
            docs,
            cfg,
            attach=attach,
            doc_count=metrics["unique_docs"],
            sigs=sigs,
            metrics=metrics,
            prebuilt_store=prebuilt_store,
        )
        # verified pairs travel as uint64 node ids; conv_id strings
        # reappear only here, on the (small) surviving edge set
        verified = edges_to_conv_ids(
            verified, docs, doc_count=metrics["unique_docs"],
            num_partitions=cfg.num_partitions,
        )
        return verified.union(exact_edges) if n_dup else verified

    if ckpt:
        res = ckpt.run_stage("edges", _edges)
        edges = res.ds
        metrics["edges"] = res.rows
    else:
        execmeter.record("edges")
        edges = _edges().materialize()
        metrics["edges"] = edges.count()
    _lap("verify")

    # clustering
    nodes = docs.select_columns(["conv_id"])

    def _clusters() -> ray.data.Dataset:
        return connected_components(nodes, edges, num_partitions=cfg.num_partitions)

    if ckpt:
        res = ckpt.run_stage("clusters", _clusters)
        clusters = res.ds
        metrics["nodes"] = res.rows
    else:
        execmeter.record("clusters")
        clusters = _clusters().materialize()
        metrics["nodes"] = clusters.count()
    _lap("union_find")

    reps = cluster_representatives(clusters, cfg.num_partitions)
    _lap("representatives")

    sites = execmeter.snapshot()
    metrics["execution_sites"] = sites
    metrics["executions"] = sum(sites.values())

    return DedupResult(
        docs=docs if keep_docs else uniq_docs,
        edges=edges,
        clusters=clusters,
        representatives=reps,
        metrics=metrics,
    )


def _dropped_pairs(uniq_pairs: ray.data.Dataset, channel: str | None = None) -> int:
    """Exact count of cross pairs skipped by the per-bucket budget
    (``channel=None`` → __skew sentinels) or separated by hot-bucket
    re-salting (``channel='__resalt'``): the sentinel rows (one per
    coarse bucket per kind, unique keys that survive pair dedup) carry
    the per-bucket totals computed at emission time — summed with
    per-block Ray tasks over the materialized pair blocks (no extra
    Dataset execution)."""
    from fuzzy_matching_ray.stages.blocks import sum_where
    from fuzzy_matching_ray.stages.minhash import CHANNEL_CODES, SKEW_CHANNEL

    code = CHANNEL_CODES[channel or SKEW_CHANNEL]
    try:
        return sum_where(uniq_pairs, "dropped", "channel", code)
    except Exception as exc:
        print(f"[dedup] block-level skew sum failed ({exc!r}); dataset fallback")
        execmeter.record("skew_metrics_fallback")
        import pyarrow.compute as pc

        def _sum(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch["channel"], code)
            total = pc.sum(batch["dropped"].filter(mask))
            return pa.table({"d": pa.array([total.as_py() or 0], pa.int64())})

        parts = (
            uniq_pairs.select_columns(["channel", "dropped"])
            .map_batches(_sum, batch_format="pyarrow")
            .to_pandas()
        )
        return int(parts["d"].sum()) if not parts.empty else 0
