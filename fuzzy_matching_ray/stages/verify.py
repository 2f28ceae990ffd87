"""Candidate-pair verification (replaces the reference's in-block
all-pairs scorer ``process_block`` + ``_get_similarity``,
``core/data_matcher.py:601-685``).

Two parts:

* **payload attach** — candidate pairs carry only ids through the
  shuffles (never ``doc_text``; SURVEY.md §7.4).  Texts are re-attached
  either by *broadcast* (``ray.put`` the id→text dict once, read per
  actor — the small-side pattern, right up to ~10⁷ docs) or by two
  hash-shuffle attach passes (union + groupby — the portable
  partitioned-join pattern) for the big-side case.

* **VerifierPool** — actor-pool ``map_batches`` over pair batches:
  exact character-shingle Jaccard (the quantity MinHash estimates) plus
  an optional bit-parallel Indel edit similarity over a capped prefix.
  Per-actor LRU of shingle sets: candidate pairs cluster around hot
  documents, so the cache hit rate is high.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.functions.similarity import indel_ratio
from fuzzy_matching_ray.hashing import char_shingle_hashes

_EDIT_PREFIX_CAP = 2048  # chars of text used for the edit-similarity gate


def attach_texts_broadcast(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    sigs: ray.data.Dataset | None = None,
) -> tuple[ray.data.Dataset, "ray.ObjectRef"]:
    """Broadcast the doc payloads via ``ray.put`` once; verifier actors
    resolve them locally.  Returns (pairs, store_ref).

    Store layout is fully columnar — an id→row dict plus flat numpy
    buffers (utf-8 text bytes + offsets, concatenated sorted shingle
    sets + offsets, signature matrix).  Numpy buffers deserialize
    zero-copy out of the object store, so N verifier actors on a node
    share ONE copy of the ~payload instead of N pickled copies, and
    the exact-Jaccard kernel reads shingle-set views without ever
    recomputing them (per-actor recompute is CPU-count-independent
    work that kills scaling)."""
    from fuzzy_matching_ray.stages.minhash import sig_matrix

    idx: dict[str, int] = {}
    text_chunks: list[bytes] = []
    text_lens: list[np.ndarray] = []
    for batch in docs.select_columns(["conv_id", "text_canon"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ids = batch["conv_id"].to_pylist()
        base = len(idx)
        idx.update(zip(ids, range(base, base + len(ids))))
        col = batch["text_canon"].combine_chunks() if isinstance(
            batch["text_canon"], pa.ChunkedArray
        ) else batch["text_canon"]
        # Arrow string column: reuse its own utf-8 buffer + offsets
        off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
        offs = np.frombuffer(
            col.buffers()[1], dtype=off_dtype, count=len(col) + col.offset + 1
        )[col.offset :]
        text_chunks.append(col.buffers()[2].to_pybytes()[offs[0] : offs[-1]])
        text_lens.append(np.diff(offs).astype(np.int64))

    n_docs = len(idx)
    text_flat = np.frombuffer(b"".join(text_chunks), dtype=np.uint8)
    lens = np.concatenate(text_lens) if text_lens else np.empty(0, dtype=np.int64)
    text_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=text_off[1:])

    # signature-side arrays keep the SIGS dataset's own iteration order
    # under a second index dict — no per-row scatter into docs order,
    # just per-batch concatenation of already-contiguous buffers
    idx_sig: dict[str, int] = {}
    sig_mats: list[np.ndarray] = []
    sh_flats: list[np.ndarray] = []
    sh_lens: list[np.ndarray] = []
    has_shingles = False
    if sigs is not None:
        has_shingles = "shingles" in sigs.schema().names
        cols = ["conv_id", "sig"] + (["shingles"] if has_shingles else [])
        for batch in sigs.select_columns(cols).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            ids = batch["conv_id"].to_pylist()
            base = len(idx_sig)
            idx_sig.update(zip(ids, range(base, base + len(ids))))
            sig_mats.append(sig_matrix(batch["sig"], cfg.num_perm))
            if has_shingles:
                sh_col = batch["shingles"]
                if isinstance(sh_col, pa.ChunkedArray):
                    sh_col = sh_col.combine_chunks()
                sh_flats.append(sh_col.flatten().to_numpy(zero_copy_only=False))
                offs = np.asarray(sh_col.offsets)
                sh_lens.append(np.diff(offs).astype(np.int64))

    sig_mat = np.vstack(sig_mats) if sig_mats else None
    sh_flat = None
    sh_off = None
    if has_shingles and sh_flats:
        sh_flat = np.concatenate(sh_flats)
        lens_s = np.concatenate(sh_lens)
        sh_off = np.zeros(lens_s.size + 1, dtype=np.int64)
        np.cumsum(lens_s, out=sh_off[1:])

    store = {
        "idx": idx,
        "idx_sig": idx_sig if sigs is not None else None,
        "text_flat": text_flat,
        "text_off": text_off,
        "sigs": sig_mat,
        "sh_flat": sh_flat,
        "sh_off": sh_off,
    }
    return pairs, ray.put(store)


def attach_texts_shuffle(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
) -> ray.data.Dataset:
    """Big-side attach: two union+groupby passes keyed on src then dst.

    Each pass unions (key, text) doc rows with (key, pair-payload) rows
    and broadcasts the doc text onto the pair rows inside
    ``map_groups`` — the portable partitioned hash-join."""
    out = pairs
    for side in ("src", "dst"):
        doc_rows = docs.select_columns(["conv_id", "text_canon"]).map_batches(
            lambda b: pa.table(
                {
                    "key": b["conv_id"],
                    "_text": b["text_canon"],
                    "_is_doc": pa.array(np.ones(b.num_rows, dtype=bool)),
                }
            ),
            batch_format="pyarrow",
        )

        def _tag(b: pa.Table, side=side) -> pa.Table:
            cols = {"key": b[side], "_is_doc": pa.array(np.zeros(b.num_rows, dtype=bool))}
            for name in b.column_names:
                cols["p_" + name] = b[name]
            return pa.table(cols)

        pair_rows = out.map_batches(_tag, batch_format="pyarrow")

        def _attach(g: pd.DataFrame, side=side) -> pd.DataFrame:
            docs_g = g[g["_is_doc"]]
            prs = g[~g["_is_doc"]].copy()
            if prs.empty:
                return pd.DataFrame()
            text = docs_g["_text"].iloc[0] if len(docs_g) else None
            out_df = prs[[c for c in prs.columns if c.startswith("p_")]].copy()
            out_df.columns = [c[2:] for c in out_df.columns]
            out_df[side + "_text"] = text
            return out_df

        out = doc_rows.union(pair_rows).groupby("key").map_groups(_attach, batch_format="pandas")
    return out


def _sorted_intersect_size(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∩ b| for sorted unique uint64 arrays via one-sided binary
    search — O(min log max), ~5-10× faster than ``np.intersect1d``'s
    concat-and-sort on shingle-set sizes."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return 0
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = b.size - 1
    return int(np.count_nonzero(b[idx] == a))


class VerifierPool:
    """Actor: exact Jaccard / edit-similarity over candidate pairs.

    A vectorized MinHash-signature estimate (mean per-permutation
    agreement — the unbiased Jaccard estimator the LSH bands are built
    from) gates the exact kernels: pairs estimated far below threshold
    (the overwhelming majority of LSH background collisions) are scored
    with the estimate alone and never touch the shingle sets.
    """

    def __init__(self, cfg: PipelineConfig, store_ref=None):
        self.cfg = cfg
        # columnar store: {"idx": {conv_id: row}, "texts": [...],
        # "sigs": (n, num_perm) matrix | None} — see attach_texts_broadcast
        store = ray.get(store_ref) if store_ref is not None else None
        self._idx: dict[str, int] | None = store["idx"] if store else None
        self._idx_sig: dict[str, int] | None = store.get("idx_sig") if store else None
        self._text_flat: np.ndarray | None = store["text_flat"] if store else None
        self._text_off: np.ndarray | None = store["text_off"] if store else None
        self._sh_flat: np.ndarray | None = store["sh_flat"] if store else None
        self._sh_off: np.ndarray | None = store["sh_off"] if store else None
        self._sigs: np.ndarray | None = store["sigs"] if store else None
        # low-byte view of the signatures for the estimate gate: equal
        # minhashes ⇒ equal bytes, unequal collide at p=1/256 (inflates
        # the estimate by ~0.004 — far below the gate's 4σ margin) for
        # 8× less gather/compare memory traffic per pair
        self._sigs8: np.ndarray | None = (
            (self._sigs & np.uint64(0xFF)).astype(np.uint8) if self._sigs is not None else None
        )
        self._shingle_cache: dict[str, np.ndarray] = {}
        self._sig_cache: dict[str, np.ndarray] = {}
        from fuzzy_matching_ray.hashing import minhash_coeffs

        self._a, self._b = minhash_coeffs(cfg.num_perm, cfg.seed)

    def _shingles(self, conv_id: str, text: str) -> np.ndarray:
        if self._sh_flat is not None:
            i = self._idx_sig.get(conv_id)
            if i is not None:
                return self._sh_flat[self._sh_off[i] : self._sh_off[i + 1]]
        sh = self._shingle_cache.get(conv_id)
        if sh is None:
            sh = char_shingle_hashes(text or "", self.cfg.shingle_k)
            if len(self._shingle_cache) > 1 << 16:
                self._shingle_cache.clear()
            self._shingle_cache[conv_id] = sh
        return sh

    def _signature(self, conv_id: str, text: str) -> np.ndarray:
        if self._sigs is not None:
            i = self._idx_sig.get(conv_id)
            if i is not None:
                return self._sigs[i]
        sig = self._sig_cache.get(conv_id)
        if sig is None:
            from fuzzy_matching_ray.hashing import minhash_signature

            sig = minhash_signature(self._shingles(conv_id, text), self._a, self._b)
            if len(self._sig_cache) > 1 << 17:
                self._sig_cache.clear()
            self._sig_cache[conv_id] = sig
        return sig

    def _text(self, conv_id: str, inline: str | None) -> str:
        if inline is not None:
            return inline
        if self._idx is None:
            return ""
        i = self._idx.get(conv_id)
        if i is None:
            return ""
        return (
            self._text_flat[self._text_off[i] : self._text_off[i + 1]]
            .tobytes()
            .decode("utf-8", errors="replace")
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch["src"].to_pylist()
        dsts = batch["dst"].to_pylist()
        channels = batch["channel"].to_pylist()
        n = len(srcs)
        src_texts = batch["src_text"].to_pylist() if "src_text" in batch.column_names else [None] * n
        dst_texts = batch["dst_text"].to_pylist() if "dst_text" in batch.column_names else [None] * n

        cfg = self.cfg
        gate = cfg.sig_est_gate
        jac = np.zeros(n, dtype=np.float64)
        edit = np.zeros(n, dtype=np.float64)
        use_edit = cfg.edit_accept_threshold > 0

        # pass 1 — vectorized signature-estimate gate over the batch.
        # Fast path: every pair id resolves into the broadcast signature
        # matrix, so the whole batch is one fancy-indexed numpy equality.
        # Slow path (no store / inline-attached ids): signatures are
        # computed once per unique doc (actor-cached across batches).
        need_exact = np.ones(n, dtype=bool)
        if gate > 0 and n:
            est = np.empty(n, dtype=np.float64)
            if self._sigs is not None:
                rs = np.fromiter((self._idx_sig.get(c, -1) for c in srcs), np.int64, count=n)
                rd = np.fromiter((self._idx_sig.get(c, -1) for c in dsts), np.int64, count=n)
                ok = (rs >= 0) & (rd >= 0)
                if ok.any():
                    est[ok] = (self._sigs8[rs[ok]] == self._sigs8[rd[ok]]).mean(axis=1)
                for i in np.flatnonzero(~ok):
                    sa = self._signature(srcs[i], self._text(srcs[i], src_texts[i]))
                    sb = self._signature(dsts[i], self._text(dsts[i], dst_texts[i]))
                    est[i] = float((sa == sb).mean())
            else:
                uniq_ids: dict[str, int] = {}
                sig_rows: list[np.ndarray] = []
                idx_src = np.empty(n, dtype=np.int64)
                idx_dst = np.empty(n, dtype=np.int64)
                for i in range(n):
                    for cid, inline, out in (
                        (srcs[i], src_texts[i], idx_src),
                        (dsts[i], dst_texts[i], idx_dst),
                    ):
                        j = uniq_ids.get(cid)
                        if j is None:
                            j = len(sig_rows)
                            uniq_ids[cid] = j
                            sig_rows.append(self._signature(cid, self._text(cid, inline)))
                        out[i] = j
                S = np.vstack(sig_rows)
                est = (S[idx_src] == S[idx_dst]).mean(axis=1)
            need_exact = est >= gate
            jac = np.where(need_exact, jac, est)

        # pass 2 — exact kernels only where the estimate didn't rule
        # out.  Text is fetched lazily: with the broadcast shingle
        # store, the Jaccard kernel never touches text at all, and the
        # (rare) edit gray zone decodes it on demand.
        chan_arr = np.asarray(channels, dtype=object)
        todo = np.flatnonzero(need_exact | (chan_arr == "exact") | (chan_arr == "substring"))
        for i in todo:
            if channels[i] == "exact":
                jac[i] = 1.0
                edit[i] = 1.0
                continue
            st = src_texts[i]
            dt = dst_texts[i]
            if self._sh_flat is None or src_texts[i] is not None:
                st = self._text(srcs[i], src_texts[i])
                dt = self._text(dsts[i], dst_texts[i])
            a = self._shingles(srcs[i], st)
            b = self._shingles(dsts[i], dt)
            if a.size == 0 and b.size == 0:
                if st is None:
                    st = self._text(srcs[i], src_texts[i])
                    dt = self._text(dsts[i], dst_texts[i])
                jac[i] = 1.0 if st == dt else 0.0
            else:
                inter = _sorted_intersect_size(a, b)
                union = a.size + b.size - inter
                jac[i] = inter / union if union else 0.0
            # the edit kernel only runs in the Jaccard gray zone
            # [edit_gate_low, jaccard_threshold), and only when the
            # length-ratio upper bound 2·min/(la+lb) ≥ indel_ratio
            # could still reach the accept threshold (exact bound — no
            # recall loss, skips the O(la·lb/64) kernel)
            if use_edit and cfg.edit_gate_low <= jac[i] < cfg.jaccard_threshold:
                if st is None:
                    st = self._text(srcs[i], src_texts[i])
                    dt = self._text(dsts[i], dst_texts[i])
                la = min(len(st), _EDIT_PREFIX_CAP)
                lb = min(len(dt), _EDIT_PREFIX_CAP)
                if la + lb and 2.0 * min(la, lb) / (la + lb) >= cfg.edit_accept_threshold:
                    edit[i] = indel_ratio(st[:_EDIT_PREFIX_CAP], dt[:_EDIT_PREFIX_CAP])

        return pa.table(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "channel": batch["channel"],
                "jaccard": pa.array(jac, pa.float64()),
                "edit_sim": pa.array(edit, pa.float64()),
            }
        )


def verify_pairs(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    *,
    attach: str = "auto",
    doc_count: int | None = None,
    sigs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Score candidate pairs; emit edges with ``score >= threshold``.

    ``attach='broadcast'`` ships the doc store once per node via the
    object store; ``'shuffle'`` re-attaches text through two grouped
    passes.  ``'auto'`` broadcasts below 2M docs.  ``sigs`` is the
    pre-computed MinHash signature dataset (verifiers fall back to a
    per-actor signature cache without it).
    """
    if attach == "auto":
        n = doc_count if doc_count is not None else docs.count()
        attach = "broadcast" if n <= 2_000_000 else "shuffle"

    store_ref = None
    if attach == "broadcast":
        pairs, store_ref = attach_texts_broadcast(pairs, docs, cfg, sigs=sigs)
    else:
        pairs = attach_texts_shuffle(pairs, docs)

    # fixed-size pool sized to the cluster (an autoscaling pool ramps
    # from one actor and leaves the stage single-threaded for most of
    # its life; a fixed pool larger than the cluster deadlocks waiting
    # for actors that can never get a CPU)
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    pool = max(1, min(cfg.verify_concurrency, ncpu - 2))
    # clamp the pool to the data volume too: ~100k pairs/s per actor
    # means a pool beyond n_pairs/100k starts actors (1-2s each of
    # startup overhead) that never pay for themselves
    try:
        n_pairs = pairs.count()
        pool = max(2, min(pool, n_pairs // 100_000 + 1))
    except Exception:
        pass
    # spread pair blocks across the whole pool ONLY when blocks are
    # scarce — Ray's repartition funnels all rows through a single
    # reduce task, which costs more than the map stage it feeds when
    # the block count is already sufficient
    try:
        n_blocks = pairs.num_blocks()
    except Exception:
        n_blocks = None
    if n_blocks is not None and n_blocks < pool * 2:
        pairs = pairs.repartition(pool * 4)
    scored = pairs.map_batches(
        VerifierPool,
        fn_constructor_args=(cfg, store_ref),
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
        concurrency=pool,
        num_cpus=1,
    )

    thr = cfg.jaccard_threshold
    edit_thr = cfg.edit_accept_threshold

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater_equal(batch["jaccard"], thr)
        if edit_thr > 0:
            mask = pc.or_(mask, pc.greater_equal(batch["edit_sim"], edit_thr))
        out = batch.filter(mask)
        score = pc.max_element_wise(out["jaccard"], out["edit_sim"])
        return pa.table(
            {
                "src": out["src"],
                "dst": out["dst"],
                "score": score,
                "channel": out["channel"],
            }
        )

    return scored.map_batches(_filter, batch_format="pyarrow")
