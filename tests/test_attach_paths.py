"""Big-side payload paths: shuffle attach and bucketed id mapping must
produce byte-identical results to the broadcast paths (VERDICT round-1
items #2/#3 — these are the code paths that must work beyond ~2M docs,
where the sandbox corpus never forces them)."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.stages.minhash import channel_code
from fuzzy_matching_ray.config import PipelineConfig


def _edge_frame(res) -> pd.DataFrame:
    df = res.edges.to_pandas()[["src", "dst", "channel", "score"]]
    return df.sort_values(["src", "dst"]).reset_index(drop=True)


def _cluster_frame(res) -> pd.DataFrame:
    df = res.clusters.to_pandas()
    return df.sort_values(["conv_id"]).reset_index(drop=True)


def test_shuffle_attach_matches_broadcast(ray_session, tiny_transcripts):
    """Forcing attach='shuffle' (narrow signatures, bucketed text join,
    per-pair shingle recompute) must reproduce the broadcast path's
    edges and clusters exactly."""
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    cfg = PipelineConfig(num_partitions=4)
    res_b = dedup_transcripts(turns, cfg, attach="broadcast")
    res_s = dedup_transcripts(turns, cfg, attach="shuffle")
    # shuffle mode must not carry shingle payloads on the signature set
    assert res_s.metrics["attach_mode"] == "shuffle"
    assert res_s.metrics["sigs_bytes"] < res_b.metrics["sigs_bytes"]
    pd.testing.assert_frame_equal(_edge_frame(res_b), _edge_frame(res_s))
    pd.testing.assert_frame_equal(_cluster_frame(res_b), _cluster_frame(res_s))


def test_edges_to_conv_ids_bucketed_matches_broadcast(ray_session, tiny_transcripts):
    """The bucketed (no-driver-dict) id mapping must equal the
    broadcast reverse-map on the same edge set."""
    import pyarrow as pa

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.stages.assemble import assemble_documents
    from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
    from fuzzy_matching_ray.stages.verify import edges_to_conv_ids
    from fuzzy_matching_ray.hashing import nid_of

    cfg = PipelineConfig(num_partitions=4)
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    docs = canonicalize_documents(assemble_documents(turns, num_partitions=4), cfg)
    docs = docs.materialize()
    ids = [r["conv_id"] for r in docs.select_columns(["conv_id"]).take(40)]
    nids = nid_of(ids)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(nids[:20], pa.uint64()),
                "dst": pa.array(nids[20:40], pa.uint64()),
                "score": pa.array([1.0] * 20, pa.float64()),
                "channel": pa.array([channel_code("minhash")] * 20, pa.int8()),
            }
        )
    )
    b = (
        edges_to_conv_ids(edges, docs, mode="broadcast")
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    s = (
        edges_to_conv_ids(edges, docs, mode="bucketed", num_partitions=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, s[b.columns])


def test_edges_to_conv_ids_raises_on_unknown_nid(ray_session, tiny_transcripts):
    """An edge id absent from docs is an id-space bug: both paths must
    fail loudly instead of fabricating a conv_id."""
    import pyarrow as pa
    import pytest

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.stages.assemble import assemble_documents
    from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
    from fuzzy_matching_ray.stages.verify import edges_to_conv_ids

    cfg = PipelineConfig(num_partitions=4)
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    docs = canonicalize_documents(assemble_documents(turns, num_partitions=4), cfg)
    docs = docs.materialize()
    bogus = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([12345], pa.uint64()),
                "dst": pa.array([67890], pa.uint64()),
                "score": pa.array([1.0], pa.float64()),
                "channel": pa.array([channel_code("minhash")], pa.int8()),
            }
        )
    )
    for mode in ("broadcast", "bucketed"):
        with pytest.raises(Exception, match="not present in docs"):
            edges_to_conv_ids(bogus, docs, mode=mode, num_partitions=4).materialize()
