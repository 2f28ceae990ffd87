"""Deduplication operators over generic document tables (doc_id, text)
— the training-data-pipeline dedup family, each reusing the engine's
channel machinery:

* exact dedup          — sha256 groupby, min doc_id survivor
* MinHash + LSH        — the flagship channel applied to documents
* SimHash              — 64-bit bands
* n-gram Jaccard       — exact word-set similarity within a blocking
                         key (integer inter/union sizes → SQL oracle)
* embedding cosine     — near-dup pairs over a ``list<float>`` column
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as _pc
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.pipelines.dedup import DedupResult  # noqa: F401  (re-export convenience)
from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
from fuzzy_matching_ray.stages.exact_dedup import add_text_hash
from fuzzy_matching_ray.stages.grouped import bucketed_group_apply
from fuzzy_matching_ray.stages.minhash import (
    candidate_pairs_from_buckets,
    dedup_pairs,
    minhash_band_rows,
)
from fuzzy_matching_ray.stages.simhash import simhash_band_rows
from fuzzy_matching_ray.stages.union_find import connected_components
from fuzzy_matching_ray.stages.verify import verify_pairs


def _as_conv(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"conv_id": b[id_col].cast(pa.string()), "doc_text": b[text_col]})

    return ds.map_batches(_rename, batch_format="pyarrow")


def exact_dedup_docs(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """One survivor per identical text: (doc_id=min id, text)."""

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b[id_col], text_col: b[text_col]})

    hashed = ds.map_batches(_prep, batch_format="pyarrow").map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow"
    )

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_sha256", id_col], kind="mergesort")
        return df[~df["text_sha256"].duplicated()][[id_col, text_col]]

    return bucketed_group_apply(hashed, "text_sha256", _first, 32)


def minhash_dedup_docs(
    ds: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """MinHash/LSH near-dup clusters over a document table:
    (doc_id, cluster_id).

    Default semantics are **pure shingle-Jaccard ≥ threshold** (the
    edit-similarity acceptance channel is off), which makes the
    operator's edge set brute-force-checkable by the DuckDB oracle
    (``__ray_entry__.oracle_sql()['minhash_dedup_documents']``:
    exact string shingle sets + a recursive-CTE connected components).
    Pass a custom ``cfg`` to re-enable the edit channel."""
    from fuzzy_matching_ray.stages.minhash import compute_signatures
    from fuzzy_matching_ray.stages.verify import edges_to_conv_ids

    cfg = cfg or PipelineConfig(num_partitions=8, edit_accept_threshold=0.0)
    docs = canonicalize_documents(_as_conv(ds, id_col, text_col), cfg).materialize()
    n = docs.count()
    sigs = compute_signatures(docs, cfg).materialize()
    band_rows = minhash_band_rows(sigs, cfg)
    pairs = dedup_pairs(
        candidate_pairs_from_buckets(band_rows, cfg, "minhash", cfg.num_partitions),
        cfg.num_partitions,
    )
    edges = edges_to_conv_ids(verify_pairs(pairs, docs, cfg, doc_count=n, sigs=sigs), docs)
    clusters = connected_components(
        docs.select_columns(["conv_id"]), edges, num_partitions=cfg.num_partitions
    )
    return clusters.map_batches(
        lambda b: pa.table({id_col: b["conv_id"], "cluster_id": b["cluster_id"]}),
        batch_format="pyarrow",
    )


def dedup_rate_by_group(
    ds: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    num_partitions: int = 16,
    labels: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Per-``group_col`` dedup report over the MinHash/LSH clusters:
    ``(group, n_docs, n_kept, n_removed)`` where a doc is *kept* iff it
    is its cluster's deterministic min-id representative.

    The curation dashboard view ("which sources are mostly dupes?").
    Scale shape: cluster labels attach to the group column through
    Ray Data's native hash join (both sides partitioned — no broadcast,
    either side may exceed worker memory), then per-batch partial
    (group, kept) counts flow into a tiny final groupby whose
    cardinality is the number of groups."""
    import numpy as np

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    if labels is None:
        labels = minhash_dedup_docs(ds, cfg, id_col, text_col)

    def _slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col].cast(pa.string()),  # label ids are strings
                # NULL groups fold to '' so no doc silently vanishes
                # from the report (pandas groupby drops NaN keys)
                "grp": _pc.fill_null(b[group_col].cast(pa.string()), ""),
            }
        )

    slim = ds.map_batches(_slim, batch_format="pyarrow")
    joined = labels.join(slim, "inner", num_partitions, on=(id_col,))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        kept = (df[id_col] == df["cluster_id"]).astype(np.int64)
        g = pd.DataFrame({"grp": df["grp"], "kept": kept}).groupby("grp", sort=False)
        out = g.agg(n_docs=("kept", "size"), n_kept=("kept", "sum")).reset_index()
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("grp", sort=True).agg(
            n_docs=("n_docs", "sum"), n_kept=("n_kept", "sum")
        )
        return pd.DataFrame(
            {
                group_col: g.index.to_numpy(dtype=object),
                "n_docs": g["n_docs"].to_numpy(np.int64),
                "n_kept": g["n_kept"].to_numpy(np.int64),
                "n_removed": (g["n_docs"] - g["n_kept"]).to_numpy(np.int64),
            }
        )

    partial = joined.map_batches(_partial, batch_format="pandas")
    return bucketed_group_apply(partial, "grp", _final, 8)


def cluster_best_representatives(
    ds: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
    labels: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Quality-ranked consolidation: per near-dup cluster, keep the
    *best* member — longest text, ties to the smallest id — emitting
    ``(cluster_id, rep_id, rep_score, n_members)``.

    This is the reference's ``select_cleaner_record`` consolidation
    (``core/data_matcher.py:447-497``: the "cleaner" record of a
    matched pair survives) generalized from pairs to whole clusters
    at document scale; the flagship's min-id representative is the
    determinism-first variant, this is the quality-first one.  Labels
    attach to the score column through the native hash join; one
    cluster-bucketed shuffle ranks members vectorized."""
    import numpy as np

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    if labels is None:
        labels = minhash_dedup_docs(ds, cfg, id_col, text_col)

    def _score(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col].cast(pa.string()),
                "score": _pc.cast(
                    _pc.coalesce(_pc.utf8_length(b[text_col]), 0), pa.int64()
                ),
            }
        )

    scored = ds.map_batches(_score, batch_format="pyarrow")
    joined = labels.join(scored, "inner", num_partitions, on=(id_col,))

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cluster_id", "score", id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = df.groupby("cluster_id", sort=False)
        best = df.drop_duplicates("cluster_id")
        sizes = g.size()
        return pd.DataFrame(
            {
                "cluster_id": best["cluster_id"].to_numpy(),
                "rep_id": best[id_col].to_numpy(),
                "rep_score": best["score"].to_numpy(np.int64),
                "n_members": sizes.loc[best["cluster_id"]].to_numpy(np.int64),
            }
        )

    return bucketed_group_apply(joined, "cluster_id", _best, num_partitions)


def simhash_dedup_docs(
    ds: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """SimHash-banded near-dup clusters: (doc_id, cluster_id)."""
    from fuzzy_matching_ray.stages.verify import edges_to_conv_ids

    cfg = cfg or PipelineConfig(num_partitions=8)
    docs = canonicalize_documents(_as_conv(ds, id_col, text_col), cfg).materialize()
    n = docs.count()
    rows = simhash_band_rows(docs, cfg)
    pairs = dedup_pairs(
        candidate_pairs_from_buckets(rows, cfg, "simhash", cfg.num_partitions),
        cfg.num_partitions,
    )
    edges = edges_to_conv_ids(verify_pairs(pairs, docs, cfg, doc_count=n), docs)
    clusters = connected_components(
        docs.select_columns(["conv_id"]), edges, num_partitions=cfg.num_partitions
    )
    return clusters.map_batches(
        lambda b: pa.table({id_col: b["conv_id"], "cluster_id": b["cluster_id"]}),
        batch_format="pyarrow",
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio_pct: int = 30,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact word-set Jaccard similar pairs *within a blocking key*.

    Integer contract (oracle-friendly): emits
    ``(src, dst, inter_size, union_size)`` for pairs with
    ``100*inter >= min_ratio_pct*union`` — float-free, so a DuckDB
    oracle hashes identically.  Tokens are the distinct lowercase
    whitespace tokens of trimmed text.
    """

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "block": b[block_col].cast(pa.string()),
                "id": b[id_col].cast(pa.int64()),
                "text": b[text_col],
            }
        )

    slim = ds.map_batches(_prep, batch_format="pyarrow")

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Prefix-filtered exact Jaccard join per block (Bayardo et al.
        2007, "Scaling Up All Pairs Similarity Search"): tokens are
        globally ordered rarest-first per block; a pair with
        J ≥ t must share a token inside both docs' prefixes of length
        ``|x| - ceil(t·|x|) + 1``, so candidates come from an inverted
        index over prefix tokens only (plus the t·|A| ≤ |B| size
        filter) instead of the all-pairs loop; exact inter/union then
        verifies each candidate.  Output is identical to the all-pairs
        formulation — only the candidate set shrinks."""
        out_src: list[np.ndarray] = []
        out_dst: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        out_u: list[np.ndarray] = []
        pct = min_ratio_pct
        for _, g in df.groupby("block", sort=False):
            ids = g["id"].to_numpy()
            n = len(ids)
            if n < 2:
                continue
            tok_arrays = [
                np.unique(np.asarray((t or "").strip().lower().split(), dtype=object))
                for t in g["text"]
            ]
            # rarest-first global order: rank tokens by (block frequency,
            # token) so prefix posting lists stay short
            all_toks = (
                np.concatenate(tok_arrays)
                if any(a.size for a in tok_arrays)
                else np.empty(0, dtype=object)
            )
            vocab, counts = np.unique(all_toks, return_counts=True)
            rank_of = np.empty(vocab.size, dtype=np.int64)
            rank_of[np.lexsort((vocab, counts))] = np.arange(vocab.size)
            ranks = [
                np.sort(rank_of[np.searchsorted(vocab, a)]) if a.size else a.astype(np.int64)
                for a in tok_arrays
            ]
            sizes = np.fromiter((r.size for r in ranks), dtype=np.int64, count=n)

            # inverted index over prefix tokens → candidate doc pairs
            post_tok: list[np.ndarray] = []
            post_doc: list[np.ndarray] = []
            for d, r in enumerate(ranks):
                L = r.size
                if L == 0:
                    continue
                plen = L - (pct * L + 99) // 100 + 1
                post_tok.append(r[:plen])
                post_doc.append(np.full(plen, d, dtype=np.int64))
            if not post_tok:
                continue
            pt = np.concatenate(post_tok)
            pd_ = np.concatenate(post_doc)
            order = np.argsort(pt, kind="stable")
            pt, pd_ = pt[order], pd_[order]
            bound = np.flatnonzero(np.r_[True, pt[1:] != pt[:-1], True])
            cand_parts: list[np.ndarray] = []
            for s, e in zip(bound[:-1], bound[1:]):
                docs_here = np.sort(pd_[s:e])
                m = docs_here.size
                if m < 2:
                    continue
                iu, ju = np.triu_indices(m, k=1)
                cand_parts.append(docs_here[iu] * n + docs_here[ju])
            if not cand_parts:
                continue
            cand = np.unique(np.concatenate(cand_parts))
            ca, cb = cand // n, cand % n
            # size filter: J ≥ t ⟹ t·|A| ≤ |B| (and symmetrically)
            sa, sb = sizes[ca], sizes[cb]
            keep = (100 * np.minimum(sa, sb)) >= pct * np.maximum(sa, sb)
            ca, cb = ca[keep], cb[keep]

            src_b: list[int] = []
            dst_b: list[int] = []
            i_b: list[int] = []
            u_b: list[int] = []
            for a, b_ in zip(ca, cb):
                ra, rb = ranks[a], ranks[b_]
                if ra.size > rb.size:
                    ra, rb = rb, ra
                idx = np.searchsorted(rb, ra)
                idx[idx == rb.size] = rb.size - 1
                inter = int(np.count_nonzero(rb[idx] == ra))
                union = int(sizes[a] + sizes[b_] - inter)
                if union and 100 * inter >= pct * union:
                    ia, ib = int(ids[a]), int(ids[b_])
                    if ia > ib:
                        ia, ib = ib, ia
                    src_b.append(ia)
                    dst_b.append(ib)
                    i_b.append(inter)
                    u_b.append(union)
            out_src.append(np.asarray(src_b, dtype=np.int64))
            out_dst.append(np.asarray(dst_b, dtype=np.int64))
            out_i.append(np.asarray(i_b, dtype=np.int64))
            out_u.append(np.asarray(u_b, dtype=np.int64))
        if not out_src:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="int64"),
                    "dst": pd.Series(dtype="int64"),
                    "inter_size": pd.Series(dtype="int64"),
                    "union_size": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "src": np.concatenate(out_src),
                "dst": np.concatenate(out_dst),
                "inter_size": np.concatenate(out_i),
                "union_size": np.concatenate(out_u),
            }
        )

    return bucketed_group_apply(slim, "block", _pairs, num_partitions)


def embedding_cosine_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
    num_partitions: int = 16,
    max_block_rows: int = 1 << 16,
) -> ray.data.Dataset:
    """Embedding near-dup pairs: cosine ≥ threshold within a blocking
    key.

    EXACT with two interchangeable block kernels (both vectorized, no
    per-pair Python), picked per block by a candidate-count probe:

    * **projection window** — for unit vectors cosine ≥ t ⟺
      ‖a−b‖ ≤ √(2−2t), and a 1-D projection onto any unit direction
      can only *shrink* distances, so sorting the block by a seeded
      random projection and scanning a ±ε window yields a candidate
      superset with zero recall loss (unlike hyperplane LSH, which
      would break the all-pairs SQL oracle).  Sub-quadratic whenever
      the projection discriminates (high threshold, clustered data,
      low effective dimension).  The window census (sort +
      searchsorted, O(n log n)) is computed BEFORE materializing any
      pair arrays, so a non-discriminating projection costs nothing.
    * **chunked matmul** — when the census says the window would keep
      ≳ n²/16 pairs (e.g. this repo's threshold-0.3 64-d query, where
      ε=1.18 exceeds the ~6σ projection spread and prunes nothing),
      fall back to blocked upper-triangular ``chunk @ mat.T`` with
      `np.nonzero` emission: O(n²·d) but in BLAS, with peak extra
      memory capped by the chunk size rather than the pair count.

    Both kernels emit the identical exact pair set, so the choice is
    invisible to the oracle and to determinism (output is re-sorted).

    **Hot-block budget** (the ``stages/minhash.py`` salted-chunk
    pattern): one skewed blocking key with n ≫ everything else would
    make even the BLAS fallback quadratic, so blocks larger than
    ``max_block_rows`` are split into id-sorted chunks of that size
    and compared chunk-locally.  The skipped cross-chunk comparisons
    are counted EXACTLY (``n·(n−1)/2 − Σ mᵢ·(mᵢ−1)/2``) and carried
    on one sentinel row per hot block — ``src = -1, dst = <count>``
    (real ids are non-negative) — never silently.  Consumers that
    want pairs only filter ``src >= 0``; ``embedding_dedup_clusters``
    does.  The default (65 536 rows → ≤2.1e9 comparisons ≈ seconds of
    BLAS per block) never triggers at oracle scales, so the all-pairs
    SQL contract is unaffected; pass a smaller value to bound skew
    harder, or ``None`` for the unbudgeted exact scan."""
    eps_margin = 1e-9
    cand_cap = 1 << 25  # ~34M window candidates ≈ 1.3 GB of index scratch

    def _window_pairs(ids, mat, eps, rng):
        """Exact pairs via sorted-projection window scan, or None when
        the window census says the filter isn't selective enough."""
        n = ids.size
        dirs = rng.standard_normal((2, mat.shape[1]))
        dirs /= np.linalg.norm(dirs, axis=1)[:, None]
        p1, p2 = mat @ dirs[0], mat @ dirs[1]
        order = np.argsort(p1, kind="stable")
        ps = p1[order]
        hi = np.searchsorted(ps, ps + eps, side="right")
        cnt = hi - np.arange(n) - 1
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if total > min(cand_cap, (n * (n - 1)) // 16):
            return None  # projection doesn't discriminate — use matmul
        a_pos = np.repeat(np.arange(n), cnt)
        b_pos = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + a_pos + 1
        ia, ib = order[a_pos], order[b_pos]
        # projection 2 prunes the window survivors before the dot
        keep = np.abs(p2[ia] - p2[ib]) <= eps
        ia, ib = ia[keep], ib[keep]
        if ia.size:
            sims = np.einsum("ij,ij->i", mat[ia], mat[ib])
            m = sims >= threshold
            ia, ib = ia[m], ib[m]
        return ia, ib

    def _matmul_pairs(ids, mat):
        """Exact pairs via blocked upper-triangular matmul; chunk rows
        so the sims panel stays ~256 MB regardless of block size."""
        n = ids.size
        chunk = max(256, min(n, int((1 << 25) // max(n, 1)) + 1))
        out_a, out_b = [], []
        for i0 in range(0, n - 1, chunk):
            i1 = min(i0 + chunk, n)
            sims = mat[i0:i1] @ mat[i0:].T  # cols j >= i0 only
            rows, cols = np.nonzero(sims >= threshold)
            gi = rows + i0  # global row index
            gj = cols + i0  # global col index
            keep = gj > gi  # strict upper triangle
            out_a.append(gi[keep].astype(np.int64))
            out_b.append(gj[keep].astype(np.int64))
        if not out_a:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_a), np.concatenate(out_b)

    def _block_pairs(ids: np.ndarray, mat: np.ndarray, rng: np.random.Generator):
        n = ids.size
        if n < 2:
            return None
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        eps = float(np.sqrt(max(2.0 - 2.0 * threshold, 0.0))) + eps_margin
        res = _window_pairs(ids, mat, eps, rng)
        if res is None:
            res = _matmul_pairs(ids, mat)
        ia, ib = res
        if ia.size == 0:
            return None
        s = np.minimum(ids[ia], ids[ib])
        d = np.maximum(ids[ia], ids[ib])
        return s, d

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _hl

        def _rng_for(tag: str) -> np.random.Generator:
            # seeded per block (and per chunk): deterministic under any
            # partitioning / arrival order (blake2b, NOT Python hash —
            # that one is salted per process)
            seed = int.from_bytes(
                _hl.blake2b(tag.encode(), digest_size=8).digest(), "little"
            )
            return np.random.Generator(np.random.PCG64(seed))

        srcs, dsts = [], []
        dropped_comparisons = 0  # exact cross-chunk skip count
        for key, g in df.groupby(block_col, sort=False):
            ids = g[id_col].to_numpy().astype(np.int64)
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
            if max_block_rows is not None and ids.size > max_block_rows:
                # hot block: id-sorted salted chunks, chunk-local exact
                # pairs, exact accounting of the skipped cross space
                order = np.argsort(ids, kind="stable")
                ids, mat = ids[order], mat[order]
                n = ids.size
                covered = 0
                for s in range(0, n, max_block_rows):
                    cid = ids[s : s + max_block_rows]
                    cmat = mat[s : s + max_block_rows]
                    covered += cid.size * (cid.size - 1) // 2
                    res = _block_pairs(cid, cmat, _rng_for(f"ecp:{key}:{s}"))
                    if res is not None:
                        srcs.append(res[0])
                        dsts.append(res[1])
                dropped_comparisons += n * (n - 1) // 2 - covered
                continue
            res = _block_pairs(ids, mat, _rng_for(f"ecp:{key}"))
            if res is not None:
                srcs.append(res[0])
                dsts.append(res[1])
        if dropped_comparisons:
            # the minhash __skew sentinel shape: visible accounting,
            # filterable by src >= 0 (ids are non-negative)
            srcs.append(np.array([-1], np.int64))
            dsts.append(np.array([dropped_comparisons], np.int64))
        if not srcs:
            return pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")})
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        order = np.lexsort((dst, src))
        return pd.DataFrame({"src": src[order], "dst": dst[order]}).astype("int64")

    return bucketed_group_apply(ds, block_col, _pairs, num_partitions)


def embedding_dedup_clusters(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
    num_partitions: int = 16,
    max_block_rows: int = 1 << 16,
) -> ray.data.Dataset:
    """Embedding near-dup clusters (the SemDeDup-shaped operator):
    exact cosine pairs within each blocking key → connected components
    → ``(id, cluster_id)`` with ``cluster_id`` = min member id.

    Composes two already-scale-safe stages: the censused pair kernel
    of :func:`embedding_cosine_pairs` (projection window / chunked
    matmul) and the size-aware union-find of
    ``stages.union_find.connected_components`` (single-task solve for
    realistic edge counts, iterative min-label propagation beyond) —
    both type-generic, so int64 vector ids flow through unchanged and
    the numeric min-label matches the SQL oracle's ``min(id)``."""
    from fuzzy_matching_ray.stages.union_find import connected_components

    import pyarrow.compute as pc

    pairs = embedding_cosine_pairs(
        ds,
        id_col=id_col,
        vec_col=vec_col,
        block_col=block_col,
        threshold=threshold,
        num_partitions=num_partitions,
        max_block_rows=max_block_rows,
    ).map_batches(
        # drop hot-block skew sentinels (src = -1): accounting rows,
        # not graph edges
        lambda b: b.filter(pc.greater_equal(b["src"], 0)),
        batch_format="pyarrow",
    )
    nodes = ds.map_batches(
        lambda b: pa.table({"conv_id": b[id_col].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    cl = connected_components(nodes, pairs, num_partitions=num_partitions)
    return cl.map_batches(
        lambda b, name=id_col: pa.table(
            {name: b["conv_id"], "cluster_id": b["cluster_id"]}
        ),
        batch_format="pyarrow",
    )


def _content_fingerprint(
    ds: ray.data.Dataset, id_col: str, text_col: str
) -> str:
    """Order-independent content fingerprint of an (id, text) dataset:
    row count + wraparound sum of per-row (id, text) hashes, computed
    in one streaming vectorized pass.  Used as checkpoint lineage for
    the incremental-dedup base corpus — far cheaper than the
    canonicalize+MinHash work it guards (one hash per row vs 126
    permutations over every shingle), but sensitive to any added,
    removed or edited row."""

    def _fp(b: pa.Table) -> pa.Table:
        ids = pd.util.hash_array(
            b[id_col].cast(pa.string()).to_pandas().to_numpy(dtype=object)
        ).astype(np.uint64)
        txt = pd.util.hash_array(
            b[text_col].to_pandas().fillna("").to_numpy(dtype=object)
        ).astype(np.uint64)
        with np.errstate(over="ignore"):
            mix = ids * np.uint64(0x9E3779B97F4A7C15) + txt
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "s": pa.array([int(mix.sum(dtype=np.uint64))], pa.uint64()),
            }
        )

    rows = ds.map_batches(_fp, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    s = 0
    for r in rows:
        s = (s + int(r["s"])) % (1 << 64)
    return f"n={n},sum={s:016x}"


def _canonical_sig_schema(b: pa.Table, num_perm: int) -> pa.Table:
    """Rebuild a signature batch reloaded from a Parquet checkpoint to
    the in-memory canonical types: Parquet has no fixed-size-list
    physical type, so ``sig`` comes back as ``list<uint64>`` — rebuild
    the ``FixedSizeListArray`` zero-copy from its flattened values so
    unions with freshly-computed signature blocks are schema-clean."""
    sig = b["sig"]
    if pa.types.is_fixed_size_list(sig.type):
        return b
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    fixed = pa.FixedSizeListArray.from_arrays(sig.flatten(), num_perm)
    return b.set_column(b.schema.get_field_index("sig"), "sig", fixed)


def incremental_dedup_pairs(
    new_ds: ray.data.Dataset,
    base_ds: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    workdir: str | None = None,
) -> ray.data.Dataset:
    """Incremental near-dup detection: accepted pairs touching at
    least one NEW document — ``(src, dst)`` doc-id strings, sorted
    within the pair.  The production ingestion mode: the base corpus
    was deduplicated in a previous run, so base×base pairs are dropped
    from the candidate stream BEFORE verification (they never reach
    the exact-Jaccard kernel, which is where the money goes).

    With ``workdir``, the base corpus's canonicalized docs AND MinHash
    signatures are checkpointed with config-hash lineage
    (`state/checkpoint.py`): repeated ingests against the same base
    skip the base side's canonicalize+signature compute entirely —
    the dominant cost of a daily-ingest loop, where the base is 100×
    the new batch.  A changed config refuses the stale lineage.

    Base membership is a broadcast sorted-nid array (8 bytes/base
    doc — ~800 MB at 10⁸ base docs; beyond that, swap the broadcast
    probe for a bucketed anti-join on nid, same machinery as
    `stages/verify.attach_texts_shuffle`).  Same acceptance semantics
    as :func:`minhash_dedup_docs` (pure shingle-Jaccard, edit channel
    off) so the DuckDB brute-force oracle applies."""
    import ray as _ray

    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.stages.minhash import compute_signatures
    from fuzzy_matching_ray.stages.verify import edges_to_conv_ids

    cfg = cfg or PipelineConfig(num_partitions=8, edit_accept_threshold=0.0)
    new_docs = canonicalize_documents(_as_conv(new_ds, id_col, text_col), cfg).materialize()
    base_sigs = None
    if workdir:
        from fuzzy_matching_ray.state.checkpoint import CheckpointManager

        # lineage = config hash + a streaming content fingerprint of
        # the base input, so a changed/merged base REFUSES the stale
        # checkpoint instead of silently missing its new documents
        base_fp = _content_fingerprint(base_ds, id_col, text_col)
        ckpt = CheckpointManager(workdir, cfg.config_hash())
        base_docs = ckpt.run_stage(
            "base_docs",
            lambda: canonicalize_documents(_as_conv(base_ds, id_col, text_col), cfg),
            input_fingerprint=base_fp,
        ).ds.materialize()
        num_perm = cfg.num_perm
        base_sigs = (
            ckpt.run_stage(
                "base_sigs",
                lambda: compute_signatures(base_docs, cfg),
                input_fingerprint=base_fp,
            )
            .ds.map_batches(
                lambda b: _canonical_sig_schema(b, num_perm), batch_format="pyarrow"
            )
            .materialize()
        )
    else:
        base_docs = canonicalize_documents(_as_conv(base_ds, id_col, text_col), cfg).materialize()
    docs = new_docs.union(base_docs).materialize()
    n = docs.count()

    # base-membership array built per block remotely and reduced in ONE
    # remote task whose return value IS the broadcast object — the
    # driver never materializes the id list (same shape as the
    # decontamination bench-set build)
    def _nid_table(b: pa.Table) -> pa.Table:
        return pa.table(
            {"nid": pa.array(nid_of(b["conv_id"].to_pylist()), pa.uint64())}
        )

    from fuzzy_matching_ray.stages.blocks import sorted_unique_broadcast

    base_ref = sorted_unique_broadcast(
        base_docs.select_columns(["conv_id"]).map_batches(
            _nid_table, batch_format="pyarrow"
        ),
        "nid",
    )

    if base_sigs is not None:
        sigs = compute_signatures(new_docs, cfg).union(base_sigs).materialize()
    else:
        sigs = compute_signatures(docs, cfg).materialize()
    band_rows = minhash_band_rows(sigs, cfg)
    pairs = dedup_pairs(
        candidate_pairs_from_buckets(band_rows, cfg, "minhash", cfg.num_partitions),
        cfg.num_partitions,
    )

    def _drop_base_base(b: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.stages.minhash import (
            CHANNEL_CODES,
            RESALT_CHANNEL,
            SKEW_CHANNEL,
        )

        from fuzzy_matching_ray.hashing import sorted_member

        base = _ray.get(base_ref)
        in_src = sorted_member(base, b["src"].to_numpy(zero_copy_only=False))
        in_dst = sorted_member(base, b["dst"].to_numpy(zero_copy_only=False))
        chan = b["channel"].to_numpy(zero_copy_only=False)
        keep = (
            ~(in_src & in_dst)
            | (chan == CHANNEL_CODES[SKEW_CHANNEL])
            | (chan == CHANNEL_CODES[RESALT_CHANNEL])
        )
        return b.filter(pa.array(keep))

    pairs = pairs.map_batches(_drop_base_base, batch_format="pyarrow")
    edges = edges_to_conv_ids(verify_pairs(pairs, docs, cfg, doc_count=n, sigs=sigs), docs)

    def _orient(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo = pc.min_element_wise(b["src"], b["dst"])
        hi = pc.max_element_wise(b["src"], b["dst"])
        return pa.table({"src": lo, "dst": hi})

    return edges.map_batches(_orient, batch_format="pyarrow")


def cluster_safe_split(
    ds: ray.data.Dataset,
    val_hex: str = "33",
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Leakage-free train/val split: every near-dup CLUSTER is
    assigned wholesale — a doc can never land in train while its
    near-duplicate sits in val (the classic eval-contamination bug a
    row-level split causes).  Assignment is content-addressed
    (``md5(cluster_id)`` prefix < ``val_hex`` → val, same contract as
    :func:`fuzzy_matching_ray.extras.relational.hash_sample`), so the
    split is a pure function of the data — reproducible across runs,
    partitionings and engines.  Output: (doc_id, cluster_id, split)."""

    from fuzzy_matching_ray.hashing import md5_leading_byte

    thr = int(val_hex, 16)
    clusters = minhash_dedup_docs(ds, cfg, id_col=id_col, text_col=text_col)

    def _assign(b: pa.Table) -> pa.Table:
        byte = md5_leading_byte(b["cluster_id"].to_pylist())
        split = np.where(byte < thr, "val", "train")
        return pa.table(
            {
                id_col: b[id_col],
                "cluster_id": b["cluster_id"],
                "split": pa.array(split, pa.string()),
            }
        )

    return clusters.map_batches(_assign, batch_format="pyarrow")
