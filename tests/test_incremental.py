"""Incremental dedup: base×base candidate pairs are culled before
verification; pairs touching at least one NEW doc survive."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.doc_dedup import incremental_dedup_pairs

_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill and the rain taps gently on "
    "the old tin roof of the farmhouse near the river bend"
)
_OTHER_TEXT = (
    "completely different content about distributed systems and "
    "arrow columnar batches streaming through an object store with "
    "backpressure applied between pipeline stages at every block"
)


def _docs(rows):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in rows])


@pytest.mark.usefixtures("ray_session")
def test_base_base_pairs_culled():
    # base (even ids): 0 and 2 are near-identical — a pair the base
    # run already found; new (odd ids): 1 is near 0/2, 3 and 5 are
    # near each other, 7 matches nothing.
    base = _docs([(0, _BASE_TEXT), (2, _BASE_TEXT + " extra tail words here")])
    new = _docs(
        [
            (1, _BASE_TEXT + " one more clause"),
            (3, _OTHER_TEXT),
            (5, _OTHER_TEXT + " trailing addition"),
            (7, "short unrelated snippet with nothing in common at all"),
        ]
    )
    out = incremental_dedup_pairs(new, base).to_pandas()
    got = {tuple(r) for r in out[["src", "dst"]].itertuples(index=False)}
    assert ("0", "2") not in got, "base×base pair must be culled"
    assert ("0", "1") in got and ("1", "2") in got
    assert ("3", "5") in got
    assert not any("7" in p for p in got)


@pytest.mark.usefixtures("ray_session")
def test_matches_full_run_minus_base_pairs():
    # incremental(new, base) == full(new ∪ base) minus base×base pairs
    rng = np.random.default_rng(7)
    words = [f"w{i:03d}" for i in range(60)]
    rows = []
    for i in range(24):
        base_words = list(rng.choice(words, size=40))
        rows.append((i, " ".join(base_words)))
        if i % 3 == 0:  # a distorted near-dup of i at id 100+i
            dup = list(base_words)
            dup[5] = "changed"
            rows.append((100 + i, " ".join(dup)))
    evens = [(i, t) for i, t in rows if i % 2 == 0]
    odds = [(i, t) for i, t in rows if i % 2 == 1]

    full = incremental_dedup_pairs(_docs(rows), _docs([])).to_pandas()
    all_pairs = {tuple(r) for r in full[["src", "dst"]].itertuples(index=False)}
    expected = {
        (s, d) for s, d in all_pairs if int(s) % 2 == 1 or int(d) % 2 == 1
    }

    inc = incremental_dedup_pairs(_docs(odds), _docs(evens)).to_pandas()
    got = {tuple(r) for r in inc[["src", "dst"]].itertuples(index=False)}
    assert got == expected


@pytest.mark.usefixtures("ray_session")
def test_cluster_safe_split_no_leakage():
    import hashlib

    from fuzzy_matching_ray.extras.doc_dedup import cluster_safe_split

    # three near-dup pairs + singletons
    rows = []
    for i in range(12):
        base = f"document number {i} with a long enough body of repeated words " * 3
        rows.append((i, base))
        if i < 3:
            rows.append((100 + i, base + " tail"))
    out = cluster_safe_split(_docs(rows), val_hex="80").to_pandas()
    assert len(out) == len(rows)
    # every cluster lands wholly in one split
    assert (out.groupby("cluster_id")["split"].nunique() == 1).all()
    # near-dup partners share a cluster
    cl = dict(zip(out.doc_id.astype(int), out.cluster_id))
    for i in range(3):
        assert cl[i] == cl[100 + i]
    # split matches the md5 contract
    for _, r in out.iterrows():
        expect = "val" if hashlib.md5(str(r.cluster_id).encode()).hexdigest()[:2] < "80" else "train"
        assert r.split == expect


@pytest.mark.usefixtures("ray_session")
def test_incremental_workdir_reuses_base_signatures(tmp_path):
    import os

    base = _docs([(2 * i, f"base document {i} " + "shared words appear here " * 4) for i in range(8)])
    new1 = _docs([(1, "base document 0 " + "shared words appear here " * 4 + "tail")])
    wd = str(tmp_path / "ckpt")

    ref = incremental_dedup_pairs(new1, base).to_pandas()
    r1 = incremental_dedup_pairs(new1, base, workdir=wd).to_pandas()
    sig_manifest = os.path.join(wd, "stage=base_sigs", "_manifest.json")
    mtime1 = os.path.getmtime(sig_manifest)

    r2 = incremental_dedup_pairs(new1, base, workdir=wd).to_pandas()
    assert os.path.getmtime(sig_manifest) == mtime1, "base sigs recomputed on resume"

    key = lambda df: sorted(map(tuple, df[["src", "dst"]].to_numpy()))
    assert key(r1) == key(r2) == key(ref)
    assert ("0", "1") in key(ref)


@pytest.mark.usefixtures("ray_session")
def test_incremental_workdir_refuses_stale_base(tmp_path):
    """A changed base corpus must invalidate the checkpoint lineage —
    pairs against base docs added after the first run must appear."""
    base_v1 = _docs([(0, "alpha beta gamma delta epsilon " * 5)])
    wd = str(tmp_path / "ckpt")
    new = _docs([(1, "totally unrelated new content here " * 5)])
    r1 = incremental_dedup_pairs(new, base_v1, workdir=wd).to_pandas()
    assert len(r1) == 0

    # v2 base gains doc 2, a near-dup of the new doc 1
    base_v2 = _docs(
        [
            (0, "alpha beta gamma delta epsilon " * 5),
            (2, "totally unrelated new content here " * 5 + "tail"),
        ]
    )
    r2 = incremental_dedup_pairs(new, base_v2, workdir=wd).to_pandas()
    got = {tuple(r) for r in r2[["src", "dst"]].itertuples(index=False)}
    assert ("1", "2") in got, "stale base checkpoint was silently reused"


def test_incremental_empty_sides(ray_session):
    """Empty new batch → no pairs; empty base → plain within-new dedup."""
    import pandas as pd
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["a long shared body of text here " * 3] * 2}
        )
    )
    empty = rd.from_arrow(schema.empty_table())
    assert incremental_dedup_pairs(empty, docs).count() == 0
    assert incremental_dedup_pairs(docs, empty).count() == 1
