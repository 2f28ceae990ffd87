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

_EDIT_PREFIX_CAP = 4096  # chars of text used for the edit-similarity gate


def attach_texts_broadcast(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
) -> tuple[ray.data.Dataset, "ray.ObjectRef"]:
    """Broadcast the id→text mapping via ``ray.put`` once; verifier
    actors resolve texts locally.  Returns (pairs, store_ref)."""
    id_to_text = {}
    for batch in docs.select_columns(["conv_id", "text_canon"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        id_to_text.update(zip(batch["conv_id"].to_pylist(), batch["text_canon"].to_pylist()))
    return pairs, ray.put(id_to_text)


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


class VerifierPool:
    """Actor: exact Jaccard / edit-similarity over candidate pairs."""

    def __init__(self, cfg: PipelineConfig, store_ref=None):
        self.cfg = cfg
        self.store: dict[str, str] | None = ray.get(store_ref) if store_ref is not None else None
        self._shingle_cache: dict[str, np.ndarray] = {}

    def _shingles(self, conv_id: str, text: str) -> np.ndarray:
        sh = self._shingle_cache.get(conv_id)
        if sh is None:
            sh = char_shingle_hashes(text or "", self.cfg.shingle_k)
            if len(self._shingle_cache) > 1 << 16:
                self._shingle_cache.clear()
            self._shingle_cache[conv_id] = sh
        return sh

    def _text(self, conv_id: str, inline: str | None) -> str:
        if inline is not None:
            return inline
        return self.store.get(conv_id, "") if self.store else ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch["src"].to_pylist()
        dsts = batch["dst"].to_pylist()
        channels = batch["channel"].to_pylist()
        src_texts = batch["src_text"].to_pylist() if "src_text" in batch.column_names else [None] * len(srcs)
        dst_texts = batch["dst_text"].to_pylist() if "dst_text" in batch.column_names else [None] * len(srcs)

        cfg = self.cfg
        jac = np.empty(len(srcs), dtype=np.float64)
        edit = np.empty(len(srcs), dtype=np.float64)
        # the edit kernel only runs for pairs in the Jaccard gray zone
        # [edit_gate_low, jaccard_threshold) — cheap gate first
        use_edit = cfg.edit_accept_threshold > 0
        for i, (s, d) in enumerate(zip(srcs, dsts)):
            st = self._text(s, src_texts[i])
            dt = self._text(d, dst_texts[i])
            if channels[i] == "exact":
                jac[i] = 1.0
                edit[i] = 1.0
                continue
            a = self._shingles(s, st)
            b = self._shingles(d, dt)
            if a.size == 0 and b.size == 0:
                jac[i] = 1.0 if st == dt else 0.0
            else:
                inter = np.intersect1d(a, b, assume_unique=True).size
                union = a.size + b.size - inter
                jac[i] = inter / union if union else 0.0
            if use_edit and cfg.edit_gate_low <= jac[i] < cfg.jaccard_threshold:
                edit[i] = indel_ratio(st[:_EDIT_PREFIX_CAP], dt[:_EDIT_PREFIX_CAP])
            else:
                edit[i] = 0.0

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
) -> ray.data.Dataset:
    """Score candidate pairs; emit edges with ``score >= threshold``.

    ``attach='broadcast'`` ships the doc store once per node via the
    object store; ``'shuffle'`` re-attaches text through two grouped
    passes.  ``'auto'`` broadcasts below 2M docs.
    """
    if attach == "auto":
        n = doc_count if doc_count is not None else docs.count()
        attach = "broadcast" if n <= 2_000_000 else "shuffle"

    store_ref = None
    if attach == "broadcast":
        pairs, store_ref = attach_texts_broadcast(pairs, docs, cfg)
    else:
        pairs = attach_texts_shuffle(pairs, docs)

    scored = pairs.map_batches(
        VerifierPool,
        fn_constructor_args=(cfg, store_ref),
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
        concurrency=(1, cfg.verify_concurrency),
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
