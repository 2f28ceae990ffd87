"""Distributed connected components: correctness on known graph
shapes, convergence within the round cap."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.stages.union_find import cluster_representatives, connected_components


def _run(nodes: list[str], edges: list[tuple[str, str]]):
    nds = rd.from_pandas(pd.DataFrame({"conv_id": nodes}))
    eds = rd.from_pandas(
        pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges],
                      "score": 1.0, "channel": "minhash"})
        if edges
        else pd.DataFrame({"src": pd.Series(dtype=object), "dst": pd.Series(dtype=object),
                           "score": pd.Series(dtype=float), "channel": pd.Series(dtype=object)})
    )
    out = connected_components(nds, eds, num_partitions=4).to_pandas()
    return dict(zip(out.conv_id, out.cluster_id))


def test_chain_and_star(ray_session):
    nodes = [f"n{i}" for i in range(8)] + ["s0", "s1", "s2", "s3", "iso"]
    chain = [(f"n{i}", f"n{i+1}") for i in range(7)]
    star = [("s0", "s1"), ("s0", "s2"), ("s0", "s3")]
    lab = _run(nodes, chain + star)
    assert all(lab[f"n{i}"] == "n0" for i in range(8))
    assert all(lab[f"s{i}"] == "s0" for i in range(4))
    assert lab["iso"] == "iso"


def test_no_edges_all_singletons(ray_session):
    lab = _run(["a", "b", "c"], [])
    assert lab == {"a": "a", "b": "b", "c": "c"}


def test_representatives(ray_session):
    lab = _run(["b", "a", "c", "z"], [("b", "a"), ("a", "c")])
    nds = rd.from_pandas(pd.DataFrame({"conv_id": list(lab), "cluster_id": [lab[k] for k in lab]}))
    reps = cluster_representatives(nds, num_partitions=2).to_pandas()
    reps = reps.set_index("cluster_id")
    assert reps.loc["a", "conv_id"] == "a"
    assert reps.loc["a", "cluster_size"] == 3
    assert reps.loc["z", "cluster_size"] == 1


def test_iterative_path_matches_single_task(ray_session, monkeypatch):
    """Force the iterative min-label-propagation path (the huge-edge-set
    mode the sandbox never reaches naturally) and assert it produces
    exactly the single-task union-find's labels — including on a chain,
    which needs multiple propagation rounds."""
    import fuzzy_matching_ray.stages.union_find as uf

    nodes = [f"n{i}" for i in range(10)] + ["s0", "s1", "s2", "iso"]
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)] + [("s0", "s1"), ("s0", "s2")]
    small = _run(nodes, edges)
    monkeypatch.setattr(uf, "_SMALL_GRAPH_EDGES", 0)
    iterative = _run(nodes, edges)
    assert iterative == small
    assert all(iterative[f"n{i}"] == "n0" for i in range(10))


def test_int64_nodes_both_paths(ray_session, monkeypatch):
    """Node ids need not be strings: int64 vec_ids flow through both
    the single-task and iterative paths with NUMERIC min labels
    (10 < 2 as ints — a stringly path would label the component '10'
    wrong)."""
    import pyarrow as pa

    import fuzzy_matching_ray.stages.union_find as uf

    nodes = rd.from_arrow(
        pa.table({"conv_id": pa.array([2, 10, 30, 7], pa.int64())})
    )
    edges_tbl = pa.table(
        {"src": pa.array([10, 30], pa.int64()), "dst": pa.array([2, 10], pa.int64())}
    )
    for small_cap in (5_000_000, 0):
        monkeypatch.setattr(uf, "_SMALL_GRAPH_EDGES", small_cap)
        out = (
            connected_components(nodes, rd.from_arrow(edges_tbl), num_partitions=4)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert out.conv_id.tolist() == [2, 7, 10, 30]
        assert out.cluster_id.tolist() == [2, 7, 2, 2]
        assert out.cluster_id.dtype == "int64"


def test_small_graph_attach_survives_block_splitting(ray_session):
    """Ray splits map_batches output past target_max_block_size, so
    the broadcast roots table can arrive as SEVERAL blocks — the
    attach must probe all of them (regression: only the first block's
    labels were read, silently making later components singletons)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4096  # force multi-block roots
    try:
        # 600 two-node components with fat ids → roots table ≫ 4 KiB
        nodes = [f"node-{i:06d}-{'x' * 40}" for i in range(1200)]
        edges = [(nodes[2 * i], nodes[2 * i + 1]) for i in range(600)]
        lab = _run(nodes, edges)
        for a, b in edges:
            assert lab[a] == lab[b] == min(a, b)
    finally:
        ctx.target_max_block_size = old
