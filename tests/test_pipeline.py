"""End-to-end dedup pipeline: recall vs the reference-semantics truth
set, determinism, exact-dup handling, and skew salting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.datagen import TranscriptGenConfig, generate_transcripts
from fuzzy_matching_ray.functions.normalize import canonicalize_text
from fuzzy_matching_ray.functions.similarity import indel_ratio
from fuzzy_matching_ray.hashing import char_shingle_hashes
from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts


def _truth_above_threshold(root: str, cfg: PipelineConfig) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split generator truth into pairs the reference semantics would
    accept (Jaccard or edit ≥ threshold on canonical docs) vs not."""
    truth = pq.read_table(f"{root}/truth/dup_truth.parquet").to_pandas()
    import glob

    turns = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{root}/turns/*.parquet")]
    )
    docs = (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"]
        .agg("\n".join)
        .map(canonicalize_text)
    )

    def accepted(o: str, d: str) -> bool:
        a, b = docs[o], docs[d]
        A = char_shingle_hashes(a, cfg.shingle_k)
        B = char_shingle_hashes(b, cfg.shingle_k)
        inter = np.intersect1d(A, B, assume_unique=True).size
        union = A.size + B.size - inter
        jac = inter / union if union else 1.0
        if jac >= cfg.jaccard_threshold:
            return True
        return indel_ratio(a[:4096], b[:4096]) >= cfg.edit_accept_threshold

    mask = [accepted(o, d) for o, d in zip(truth.orig_conv_id, truth.dup_conv_id)]
    return truth[pd.Series(mask, index=truth.index)], truth[~pd.Series(mask, index=truth.index)]


def test_end_to_end_recall(ray_session, tiny_transcripts):
    cfg = PipelineConfig(num_partitions=4)
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    res = dedup_transcripts(turns, cfg)
    cl = res.clusters.to_pandas()
    lab = dict(zip(cl.conv_id, cl.cluster_id))

    accepted, _rejected = _truth_above_threshold(tiny_transcripts["root"], cfg)
    hits = sum(1 for o, d in zip(accepted.orig_conv_id, accepted.dup_conv_id) if lab[o] == lab[d])
    recall = hits / max(1, len(accepted))
    assert recall >= 0.99, f"recall {recall:.3f} ({hits}/{len(accepted)})"

    # every conv got exactly one cluster row
    assert cl.conv_id.is_unique
    assert res.metrics["docs_rows"] == len(cl)
    # cluster_id is the min conv_id of its members
    mins = cl.groupby("cluster_id")["conv_id"].min()
    assert (mins.index == mins.values).all()


def test_determinism_two_runs(ray_session, tiny_transcripts):
    cfg = PipelineConfig(num_partitions=4)
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    a = dedup_transcripts(turns, cfg).clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = dedup_transcripts(turns, cfg).clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_exact_duplicates_cluster(ray_session):
    # two identical conversations + one unrelated
    rows = []
    for cid in ["conv_a", "conv_b", "conv_zzz"]:
        text = "identical conversation body shared verbatim" if cid != "conv_zzz" else "completely different content of another conversation entirely"
        for t in range(3):
            rows.append(
                {"conv_id": cid, "turn_idx": t, "role": "user", "text": f"{text} turn {t}",
                 "tool": "", "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t)}
            )
    turns = rd.from_pandas(pd.DataFrame(rows))
    res = dedup_transcripts(turns, PipelineConfig(num_partitions=2))
    cl = res.clusters.to_pandas()
    lab = dict(zip(cl.conv_id, cl.cluster_id))
    assert lab["conv_a"] == lab["conv_b"] == "conv_a"
    assert lab["conv_zzz"] == "conv_zzz"
    edges = res.edges.to_pandas()
    assert (edges.channel == "exact").any()


def test_hot_band_salting():
    # 1,000-doc identical-boilerplate bucket must not emit C(1000,2)
    # pairs, yet must stay one connected component (salted chunks are
    # chained through the bucket's min id)
    from fuzzy_matching_ray.stages.minhash import _bucket_pairs, channel_code

    ids = np.arange(5000, 6000, dtype=np.uint64)  # 1000 node ids
    df, _dropped = _bucket_pairs(ids, max_bucket=64, channel=channel_code("minhash"))
    assert len(df) < 1000 * 999 // 2 / 10  # far fewer than all-pairs
    assert (df.bucket_size == 1000).all()

    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(df.src, df.dst):
        parent[find(int(s))] = find(int(d))
    assert len({find(int(i)) for i in ids}) == 1


def test_suffix_channel_positive(ray_session):
    shared = "a very long verbatim fragment that is shared between exactly two conversations " * 3
    rows = []
    for cid, prefix in [("conv_s1", "first unique prologue"), ("conv_s2", "second distinct intro"),
                        ("conv_s3", "unrelated other text entirely about nothing")]:
        body = prefix + " " + (shared if cid != "conv_s3" else "no common fragment here at all just words")
        rows.append({"conv_id": cid, "turn_idx": 0, "role": "user", "text": body,
                     "tool": "", "ts": pd.Timestamp("2024-01-01")})
    turns = rd.from_pandas(pd.DataFrame(rows))
    res = dedup_transcripts(
        turns, PipelineConfig(num_partitions=1, min_substring_len=64),
        channels=("minhash", "substring"),
    )
    edges = res.edges.to_pandas()
    pair = edges[(edges.src == "conv_s1") & (edges.dst == "conv_s2")]
    assert len(pair) >= 1


def test_flagship_equals_bruteforce_all_pairs(ray_session, tiny_transcripts):
    """Structural equivalence: the distributed LSH pipeline's clusters
    must equal a serial BRUTE-FORCE all-pairs implementation of the
    same acceptance semantics (no LSH, no estimate gate, no bucket
    budgets) on the fixture corpus.  Catches candidate-generation
    misses, verification drift, and clustering bugs in one assert.
    Deterministic: fixed corpus + seeded signatures."""
    import glob
    import itertools

    cfg = PipelineConfig(num_partitions=4)
    turns_dir = tiny_transcripts["turns_dir"]
    res = dedup_transcripts(rd.read_parquet(turns_dir), cfg)
    got = res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)

    # serial reimplementation: assemble + canonicalize + all-pairs
    turns = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{turns_dir}/*.parquet")]
    )
    docs = (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"]
        .agg("\n".join)
        .map(canonicalize_text)
    )
    ids = sorted(docs.index)
    shingles = {c: char_shingle_hashes(docs[c], cfg.shingle_k) for c in ids}

    def accepted(a: str, b: str) -> bool:
        A, B = shingles[a], shingles[b]
        if A.size == 0 and B.size == 0:
            return docs[a] == docs[b]
        inter = np.intersect1d(A, B, assume_unique=True).size
        union = A.size + B.size - inter
        jac = inter / union if union else 0.0
        if jac >= cfg.jaccard_threshold:
            return True
        # mirror the verifier's gray-zone edit kernel exactly:
        # capped prefix + length-ratio upper bound
        if cfg.edit_gate_low <= jac < cfg.jaccard_threshold:
            sa, sb = docs[a][:2048], docs[b][:2048]
            la, lb = len(sa), len(sb)
            if la + lb and 2.0 * min(la, lb) / (la + lb) >= cfg.edit_accept_threshold:
                return indel_ratio(sa, sb) >= cfg.edit_accept_threshold
        return False

    parent = {c: c for c in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        if accepted(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    want = pd.DataFrame(
        {"conv_id": ids, "cluster_id": [find(c) for c in ids]}
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_single_conversation_corpus(ray_session):
    """n=1 corpus: singleton cluster, no edges, no stage crashes."""
    rows = [
        {"conv_id": "only", "turn_idx": t, "role": "user",
         "text": f"the single conversation turn {t}",
         "tool": "", "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t)}
        for t in range(3)
    ]
    res = dedup_transcripts(rd.from_pandas(pd.DataFrame(rows)), PipelineConfig(num_partitions=2))
    cl = res.clusters.to_pandas()
    assert cl["conv_id"].tolist() == ["only"]
    assert cl["cluster_id"].tolist() == ["only"]
    assert res.edges.count() == 0


def test_all_identical_corpus(ray_session):
    """Every conversation identical: ONE cluster labeled by the min id
    (the maximal hot-band / exact-dup stress shape)."""
    rows = []
    for i in range(12):
        for t in range(2):
            rows.append(
                {"conv_id": f"c{i:02d}", "turn_idx": t, "role": "user",
                 "text": f"the one shared conversation body turn {t}",
                 "tool": "", "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t)}
            )
    res = dedup_transcripts(rd.from_pandas(pd.DataFrame(rows)), PipelineConfig(num_partitions=2))
    cl = res.clusters.to_pandas()
    assert set(cl["cluster_id"]) == {"c00"}
    assert len(cl) == 12
    assert res.representatives.count() == 1
