"""Channel B — 64-bit SimHash prefilter (Charikar 2002).

Mirrors the reference's *cheap weighted scoring* role
(``_weighted_average_similarity``, ``core/data_matcher.py:186-230``):
a near-free per-document sketch whose Hamming distance approximates
cosine similarity of token sets.  Candidate generation uses band
probing: the 64 bits are split into ``simhash_bands`` chunks; any two
hashes within Hamming distance < bands share at least one chunk
(pigeonhole), so bucketing by chunk value finds every pair within the
guaranteed radius.  Reuses the same skew-aware bucket machinery as the
MinHash channel.

Stateful actor: per-actor token-hash cache (tokens repeat heavily
across documents).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.config import PipelineConfig


class SimHashSignatures:
    """Actor-pool stage: token hash cache built up per actor."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self._cache: dict[str, int] = {}

    def _token_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
            if len(self._cache) < 1 << 20:
                self._cache[tok] = h
        return h

    def _simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter((self._token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = np.unpackbits(hs.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
        acc = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
        return int.from_bytes(np.packbits((acc > 0).astype(np.uint8)).tobytes(), "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.hashing import nid_of

        texts = batch["text_canon"].to_pylist()
        out = np.fromiter(
            (self._simhash(t or "") for t in texts), dtype=np.uint64, count=len(texts)
        )
        return pa.table(
            {
                "nid": pa.array(nid_of(batch["conv_id"].to_pylist()), pa.uint64()),
                "simhash": pa.array(out, pa.uint64()),
            }
        )


def simhash_band_rows(docs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """docs(conv_id, text_canon) → (band_key, nid) band rows for the
    SimHash channel.  Keys carry the chunk index in the high bits and a
    channel tag so they never collide with MinHash band keys."""
    # fixed cluster-and-data-clamped pool: autoscaling (1, N) pools ramp
    # from one actor and leave the stage effectively serial (measured in
    # round 1 — see stages/grouped.sized_pool)
    from fuzzy_matching_ray.stages.grouped import sized_pool

    try:
        n_docs = docs.count()
    except Exception:
        n_docs = None
    pool = sized_pool(cfg.sig_concurrency, n_docs, 2000)
    sigs = docs.select_columns(["conv_id", "text_canon"]).map_batches(
        SimHashSignatures,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        concurrency=pool,
        num_cpus=1,
    )
    bands = cfg.simhash_bands
    bits = cfg.simhash_bits
    width = bits // bands

    def _explode(batch: pa.Table) -> pa.Table:
        sims = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        n = sims.size
        keys = np.empty(n * bands, dtype=np.uint64)
        mask = np.uint64((1 << width) - 1)
        for i in range(bands):
            chunk = (sims >> np.uint64(i * width)) & mask
            # tag with chunk index + a simhash channel marker in high bits
            keys[i::bands] = chunk | (np.uint64(0x5150 + i) << np.uint64(48))
        idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.uint64()),
                "nid": batch["nid"].take(pa.array(idx)),
            }
        )

    return sigs.map_batches(_explode, batch_format="pyarrow")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
