"""Distributed connected components over the edge Dataset
(replaces the reference's greedy 1:1 match + consolidation,
``core/data_matcher.py:412-499`` — generalized to transitive clusters
per north_rule, with deterministic min-``conv_id`` representatives).

Algorithm: iterative min-label propagation ("hash-to-min" family, cf.
Rastogi et al. 2013): every node starts labeled with itself; each
round every node sends its current label to itself and its neighbors,
then takes the min of what it received.  State lives entirely in
Datasets (no driver-held index).  Each round is exactly two bucketed
shuffles:

1. *join bucket* (key = hash(node) % P): labels meet the adjacency
   rows of their node; a vectorized pandas merge emits
   ``(target, label)`` messages.
2. *reduce bucket* (key = hash(target) % P): vectorized
   ``groupby(target).min`` produces the new labels, and — because the
   node's previous label rides along as a self-message — the
   changed-label count is computed in the same pass (``changed``
   column summed on the driver), so convergence detection costs no
   extra shuffle.

Converges in O(component diameter) rounds; LSH dup clusters are
near-cliques, so 2-4 rounds in practice.  ``max_rounds`` caps the
worst case (a path graph).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

CLUSTER_SCHEMA = pa.schema([("conv_id", pa.string()), ("cluster_id", pa.string())])


def _sym_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    def _sym(batch: pa.Table) -> pa.Table:
        src = batch["src"].combine_chunks() if isinstance(batch["src"], pa.ChunkedArray) else batch["src"]
        dst = batch["dst"].combine_chunks() if isinstance(batch["dst"], pa.ChunkedArray) else batch["dst"]
        return pa.table(
            {
                "node": pa.concat_arrays([src, dst]),
                "nbr": pa.concat_arrays([dst, src]),
            }
        )

    return edges.select_columns(["src", "dst"]).map_batches(_sym, batch_format="pyarrow")


_SMALL_GRAPH_EDGES = 5_000_000

# per-WORKER-PROCESS cache of the reassembled roots table (the attach
# map runs as stateless tasks; concatenating the broadcast blocks once
# per worker instead of once per batch)
_ROOTS_CACHE: dict = {}


def _uf_edge_batch(batch: pa.Table) -> pa.Table:
    """Single-task union-find over one (gathered) edge batch → one
    ``(node, label)`` row per edge-touched node, label = component min."""
    src = batch["src"].to_pylist()
    dst = batch["dst"].to_pylist()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the root the lexicographic minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
        parent.setdefault(ra, ra)
    out_nodes = list(parent.keys())
    labels = [find(x) for x in out_nodes]
    t = batch["src"].type  # node ids: string conv_ids or int64 vec_ids
    return pa.table(
        {"node": pa.array(out_nodes, t), "label": pa.array(labels, t)}
    )


def connected_components(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 12,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``nodes(conv_id)`` + ``edges(src,dst)`` → ``(conv_id, cluster_id)``
    with cluster_id = min conv_id of the component.

    Size-aware strategy: after near-dup verification the edge set is
    orders of magnitude smaller than the corpus (the dedup invariant —
    a few % of docs have a dup partner), so below
    ``_SMALL_GRAPH_EDGES`` the whole component structure is solved by
    ONE union-find task over the gathered edges (3 executions total);
    the iterative min-label-propagation rounds remain the path for
    genuinely huge edge sets, where they run with data-clamped
    partitioning."""
    # materialize once: lazy callers would otherwise re-execute the
    # entire upstream verify lineage for the count AND again for the
    # solve (skipped when the caller already materialized)
    from ray.data.dataset import MaterializedDataset

    if not isinstance(edges, MaterializedDataset):
        from fuzzy_matching_ray.state import execmeter

        execmeter.record("union_find_edges_mat")
        edges = edges.materialize()
    n_edges = edges.count()

    from fuzzy_matching_ray.stages.grouped import sized_partitions

    if n_edges == 0:
        # no edges → every node is its own cluster; no UF, no shuffle
        return nodes.map_batches(
            lambda b: pa.table({"conv_id": b["conv_id"], "cluster_id": b["conv_id"]}),
            batch_format="pyarrow",
        )

    if n_edges <= _SMALL_GRAPH_EDGES:
        # coerce to one block type first: edges are a union of Arrow
        # (verify) and pandas (bucketed exact-dedup) blocks, which
        # repartition refuses to merge
        from fuzzy_matching_ray.state import execmeter

        execmeter.record("uf_roots")
        roots = (
            edges.select_columns(["src", "dst"])
            .map_batches(lambda b: b, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_uf_edge_batch, batch_size=None, batch_format="pyarrow")
            .materialize()
        )
        # label attach by BROADCAST, not shuffle: the root table is at
        # most one row per edge endpoint (≤ _SMALL_GRAPH_EDGES·2, in
        # practice a few % of the corpus), so shipping its block refs
        # to a stateless map over the node blocks replaces the old
        # union+sort exchange — which cost ~7s of pure shuffle/barrier
        # overhead for a 160k-row attach at scale72000.  ALL refs ride
        # along: Ray's dynamic block splitting slices map_batches
        # output past target_max_block_size, so a near-cap roots table
        # arrives as several blocks — probing only the first would
        # silently label the rest as singletons.  pc.index_in's hash
        # probe is type-generic (string conv_ids and int64 vec_ids).
        roots_refs = tuple(
            r for bundle in roots.iter_internal_ref_bundles() for r in bundle.block_refs
        )

        def _attach(b: pa.Table, roots_refs=roots_refs) -> pa.Table:
            import pyarrow.compute as pc
            import ray as _ray

            key = tuple(r.hex() for r in roots_refs)
            rt = _ROOTS_CACHE.get(key)
            if rt is None:
                parts = [
                    pa.Table.from_pandas(t, preserve_index=False)
                    if isinstance(t, pd.DataFrame)
                    else t
                    for t in _ray.get(list(roots_refs))
                ]
                _ROOTS_CACHE.clear()
                rt = _ROOTS_CACHE[key] = pa.concat_tables(parts).combine_chunks()
            own = b["conv_id"]
            if isinstance(own, pa.ChunkedArray):
                own = own.combine_chunks()
            idx = pc.index_in(own, value_set=rt["node"].combine_chunks())
            lab = pc.take(rt["label"].combine_chunks(), idx)
            return pa.table(
                {"conv_id": own, "cluster_id": pc.coalesce(lab, own)}
            )

        return nodes.map_batches(_attach, batch_format="pyarrow")

    # Verified edge sets are orders of magnitude smaller than the doc
    # corpus, so clamp the partition count to the data: oversized P
    # makes every round pay sort/task overhead proportional to P, which
    # dominated wall time (56s → 6s at 27k edges when P dropped 64 → 8).
    p = sized_partitions(num_partitions, n_edges)

    # bound the block count before iterating: upstream stages (verify
    # over millions of candidate pairs) can leave `edges` as hundreds of
    # tiny blocks, and per-round cost is dominated by task-per-block
    # overhead, not data volume
    sym = _sym_edges(edges).repartition(p).materialize()

    # initial labels stay lazy: they are consumed exactly once, by the
    # first round's materialize — a separate materialize here would be
    # one more full execution of pure overhead
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["conv_id"], "label": b["conv_id"]}),
        batch_format="pyarrow",
    ).repartition(p)
    num_partitions = p

    for rnd in range(max_rounds):
        # --- stage 1: labels ⋈ adjacency → messages -------------------
        # pad the unused column with the node value itself, NEVER null:
        # a null int64 column round-trips through the pandas grouped
        # kernel as float64, and float node keys then hash to different
        # buckets than their int adjacency rows — labels never meet
        # their edges and propagation silently "converges" one round in
        # (caught by test_int64_nodes_both_paths); `side` tags which
        # rows are labels vs adjacency instead
        lab_rows = labels.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "nbr": b["node"],
                    "label": b["label"],
                    "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        edge_rows = sym.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "nbr": b["nbr"],
                    "label": b["node"],
                    "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )

        def _send(df: pd.DataFrame) -> pd.DataFrame:
            labs = df[df["side"] == 0][["node", "label"]]
            adj = df[df["side"] == 1][["node", "nbr"]]
            to_nbrs = adj.merge(labs, on="node", how="inner")
            # self-messages carry is_self=1 so the reducer can detect change
            self_msgs = pd.DataFrame(
                {"target": labs["node"], "label": labs["label"], "is_self": np.int8(1)}
            )
            nbr_msgs = pd.DataFrame(
                {"target": to_nbrs["nbr"], "label": to_nbrs["label"], "is_self": np.int8(0)}
            )
            return pd.concat([self_msgs, nbr_msgs], ignore_index=True)

        messages = bucketed_group_apply(
            lab_rows.union(edge_rows), "node", _send, num_partitions
        )

        # --- stage 2: min per target + changed count ------------------
        def _reduce(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("target", sort=False)
            new = g["label"].min()
            old = df[df["is_self"] == 1].set_index("target")["label"]
            old = old[~old.index.duplicated()]
            changed = (new.reindex(old.index) != old).astype("int32")
            out = pd.DataFrame({"node": new.index, "label": new.to_numpy()})
            out["changed"] = changed.reindex(new.index).fillna(0).astype("int32").to_numpy()
            return out

        new_labels = bucketed_group_apply(messages, "target", _reduce, num_partitions).materialize()
        # repartition keeps the label block count bounded: each grouped
        # round otherwise emits (input + P) blocks, so rounds get
        # linearly slower (observed 4s → 17s by round 5 unbounded)
        labels = new_labels.drop_columns(["changed"]).repartition(num_partitions)
        # round 0 always changes labels when any edge exists — skip the
        # convergence-check execution there
        if rnd > 0 and not new_labels.sum("changed"):
            break

    return labels.map_batches(
        lambda b: pa.table({"conv_id": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )


def cluster_representatives(
    clusters: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """One representative row per cluster: the deterministic min
    conv_id (our analogue of ``select_cleaner_record``,
    ``core/data_matcher.py:262-281``, with a total order), plus the
    cluster size."""

    def _rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "conv_id"], kind="mergesort")
        sizes = df.groupby("cluster_id", sort=False)["conv_id"].transform("size")
        out = df[~df["cluster_id"].duplicated()].copy()
        out["cluster_size"] = sizes[out.index].astype("int32").to_numpy()
        return out

    # same data-sized partition clamp as connected_components
    from fuzzy_matching_ray.stages.grouped import sized_partitions

    try:
        n_rows = clusters.count()
    except Exception:
        n_rows = None
    p = sized_partitions(num_partitions, n_rows)
    return bucketed_group_apply(clusters, "cluster_id", _rep, p)
