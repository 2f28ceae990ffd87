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
    """Broadcast the id→(text, signature) mapping via ``ray.put`` once;
    verifier actors resolve payloads locally.  Returns (pairs,
    store_ref).  Pre-computed MinHash signatures ride along so the
    estimate gate never recomputes them."""
    from fuzzy_matching_ray.stages.minhash import sig_matrix

    store: dict[str, tuple[str, np.ndarray | None]] = {}
    for batch in docs.select_columns(["conv_id", "text_canon"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        store.update(
            (cid, (txt, None))
            for cid, txt in zip(batch["conv_id"].to_pylist(), batch["text_canon"].to_pylist())
        )
    if sigs is not None:
        for batch in sigs.iter_batches(batch_size=65536, batch_format="pyarrow"):
            mat = sig_matrix(batch["sig"], cfg.num_perm)
            for i, cid in enumerate(batch["conv_id"].to_pylist()):
                ent = store.get(cid)
                if ent is not None:
                    store[cid] = (ent[0], mat[i])
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
        # store: conv_id → (text_canon, signature row | None)
        self.store: dict[str, tuple[str, np.ndarray | None]] | None = (
            ray.get(store_ref) if store_ref is not None else None
        )
        self._shingle_cache: dict[str, np.ndarray] = {}
        self._sig_cache: dict[str, np.ndarray] = {}
        from fuzzy_matching_ray.hashing import minhash_coeffs

        self._a, self._b = minhash_coeffs(cfg.num_perm, cfg.seed)

    def _shingles(self, conv_id: str, text: str) -> np.ndarray:
        sh = self._shingle_cache.get(conv_id)
        if sh is None:
            sh = char_shingle_hashes(text or "", self.cfg.shingle_k)
            if len(self._shingle_cache) > 1 << 16:
                self._shingle_cache.clear()
            self._shingle_cache[conv_id] = sh
        return sh

    def _signature(self, conv_id: str, text: str) -> np.ndarray:
        if self.store is not None:
            ent = self.store.get(conv_id)
            if ent is not None and ent[1] is not None:
                return ent[1]
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
        if self.store is None:
            return ""
        ent = self.store.get(conv_id)
        return ent[0] if ent is not None else ""

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

        # pass 1 — vectorized signature-estimate gate over the batch:
        # signatures are computed once per *unique* doc in the batch
        # (actor-cached across batches), then compared with one fancy-
        # indexed numpy equality over the whole batch — no per-pair loop
        need_exact = np.ones(n, dtype=bool)
        if gate > 0 and n:
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

        # pass 2 — exact kernels only where the estimate didn't rule out
        chan_arr = np.asarray(channels, dtype=object)
        todo = np.flatnonzero(need_exact | (chan_arr == "exact") | (chan_arr == "substring"))
        for i in todo:
            if channels[i] == "exact":
                jac[i] = 1.0
                edit[i] = 1.0
                continue
            st = self._text(srcs[i], src_texts[i])
            dt = self._text(dsts[i], dst_texts[i])
            a = self._shingles(srcs[i], st)
            b = self._shingles(dsts[i], dt)
            if a.size == 0 and b.size == 0:
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
    # for actors that can never get a CPU), and pair blocks spread
    # across the whole pool: upstream bucketed shuffles leave only
    # num_partitions blocks, which would starve most of the actors
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    pool = max(1, min(cfg.verify_concurrency, ncpu - 2))
    scored = pairs.repartition(pool * 4).map_batches(
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
