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

Token-hash cache: per WORKER PROCESS (module global — tokens repeat
heavily across documents), so the stage runs as stateless tasks that
schedule wide immediately instead of an actor pool that ramps up
lazily (same reasoning as ``minhash.compute_signatures``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.config import PipelineConfig

# per-worker-process token→hash cache, growth-capped
_TOKEN_CACHE: dict[str, int] = {}


class SimHashSignatures:
    """Batch kernel: one vectorized pass per batch.

    Tokens are deduplicated across the whole batch (``pd.factorize``),
    only *new* unique tokens pay a blake2b call (the worker-process
    cache keeps them across batches AND tasks), and the per-document
    bit accumulation runs as one batched unpackbits + segment-sum
    instead of a Python loop per document.  Bit-identical with the
    scalar formulation (the serial golden oracle and ``tests`` pin
    this)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self._cache = _TOKEN_CACHE

    def _hashes_for(self, uniq: np.ndarray) -> np.ndarray:
        """uint64 blake2b hash per unique token, cache-backed."""
        cache = self._cache
        out = np.empty(uniq.size, dtype=np.uint64)
        grow = len(cache) < 1 << 20
        for i, tok in enumerate(uniq):
            h = cache.get(tok)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
                )
                if grow:
                    cache[tok] = h
            out[i] = h
        return out

    def _simhash_batch(self, texts: list) -> np.ndarray:
        import pandas as pd

        n = len(texts)
        sims = np.zeros(n, dtype=np.uint64)
        if n == 0:
            return sims
        counts = np.empty(n, dtype=np.int64)
        all_toks: list[str] = []
        for i, t in enumerate(texts):
            tk = (t or "").split()
            counts[i] = len(tk)
            all_toks.extend(tk)
        total = len(all_toks)
        if total == 0:
            return sims
        codes, uniq = pd.factorize(np.asarray(all_toks, dtype=object))
        hs_flat = self._hashes_for(uniq)[codes]
        ends = np.cumsum(counts)
        starts = ends - counts
        # chunk the bit expansion + segment sum so the working set
        # stays cache-resident (a full-batch cumsum materializes
        # ~0.5 KB/token and stalls on memory bandwidth)
        sign = np.zeros((n, 64), dtype=np.uint8)
        DOCS = 256
        for d0 in range(0, n, DOCS):
            d1 = min(d0 + DOCS, n)
            t0, t1 = starts[d0], ends[d1 - 1]
            if t1 == t0:
                continue
            # (t, 64) bit matrix, MSB-first like the scalar >u8 unpack
            bits = np.unpackbits(
                hs_flat[t0:t1].astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
            )
            cnt = counts[d0:d1]
            acc_t = np.int16 if cnt.max() < (1 << 15) else np.int64
            # reduceat over NON-EMPTY docs only: their starts are
            # strictly increasing and in range, and each segment ends
            # exactly at the next non-empty start (empty docs
            # contribute zero tokens).  The previous clamp-based
            # formulation stole the last token of the preceding doc
            # whenever a chunk ENDED with empty docs (out-of-range
            # start clamped to t1-t0-1 → wrong boundary).
            nz = np.flatnonzero(cnt > 0)
            ones = np.zeros((d1 - d0, 64), dtype=acc_t)
            ones[nz] = np.add.reduceat(
                bits.astype(acc_t), (starts[d0:d1] - t0)[nz], axis=0
            )
            sign[d0:d1] = (2 * ones.astype(np.int64) - cnt[:, None]) > 0
        packed = np.packbits(sign, axis=1)  # (n, 8) big-endian bytes
        return packed.view(">u8").reshape(n).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.hashing import nid_of

        texts = batch["text_canon"].to_pylist()
        return pa.table(
            {
                "nid": pa.array(nid_of(batch["conv_id"].to_pylist()), pa.uint64()),
                "simhash": pa.array(self._simhash_batch(texts), pa.uint64()),
            }
        )


def simhash_band_rows(docs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """docs(conv_id, text_canon) → (band_key, nid) band rows for the
    SimHash channel.  Keys carry the chunk index in the high bits and a
    channel tag so they never collide with MinHash band keys."""
    # stateless tasks (the token cache lives at worker-process level):
    # no pool ramp, no docs.count() execution just to size a pool.
    # the kernel is constructed INSIDE the task so it binds the
    # worker's module-global cache, not a pickled driver-side copy
    sigs = docs.select_columns(["conv_id", "text_canon"]).map_batches(
        lambda b: SimHashSignatures(cfg)(b),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
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
