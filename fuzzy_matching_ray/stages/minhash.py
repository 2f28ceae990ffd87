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
   deterministic sorted chunks of ``max_band_bucket`` under a
   per-bucket pair budget — and every skipped cross pair is counted
   EXACTLY at emission time and carried on a ``__skew`` sentinel row
   per coarse bucket (north_rule requires explicit drop accounting).
   With ``cfg.hot_bucket_mode='resalt'`` hot buckets are instead
   *re-banded* by a salt key over extra signature rows (finer LSH):
   salt groups emit full pairs, separations are counted exactly on a
   ``__resalt`` sentinel (``resalted_pairs_hot_buckets``) — better
   recall targeting on boilerplate-heavy corpora at bounded work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.hashing import (
    char_shingle_hashes,
    minhash_coeffs,
    minhash_signature,
)
from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

# candidate-pair rows; one __skew sentinel row per coarse bucket carries
# the exact dropped-cross-pair count (src=0, dst=first band key).  In
# hot_bucket_mode='resalt' a second __resalt sentinel per coarse bucket
# (src=1, dst=first band key — distinct (src,dst) so pair-dedup keeps
# both) carries the exact count of cross pairs separated by the finer
# salt banding (those are "didn't collide at finer granularity", not
# budget drops — reported as `resalted_pairs_hot_buckets`).
SKEW_CHANNEL = "__skew"
RESALT_CHANNEL = "__resalt"
PAIR_SCHEMA = pa.schema(
    [
        ("src", pa.uint64()),   # stable node id (hashing.nid_of)
        ("dst", pa.uint64()),
        ("channel", pa.int8()),  # dictionary code — see CHANNEL_CODES
        ("bucket_size", pa.int32()),
        ("dropped", pa.int64()),
    ]
)

# channel tags ride the pair shuffles as int8 DICTIONARY CODES: the
# per-row channel strings were ~11 bytes/row of pure freight on the
# biggest exchange in the pipeline (candidate pairs), and the code
# order doubles as the pair-dedup priority (lower wins).  Names are
# restored by decode_channels() on the final (small) edge set only.
CHANNEL_CODES: dict[str, int] = {
    "exact": 0,
    "substring": 1,
    "minhash": 2,
    "simhash": 3,
    SKEW_CHANNEL: 4,
    "__gate": 5,
    RESALT_CHANNEL: 6,
}


def channel_code(name: str) -> int:
    """Code for a channel name.  Unseen (user-registered) channels get
    the next free code — lowest dedup priority.  Assignment happens on
    the driver while building the stage closure, so every worker sees
    the captured code, never this dict."""
    if name not in CHANNEL_CODES:
        CHANNEL_CODES[name] = max(CHANNEL_CODES.values()) + 1
    return CHANNEL_CODES[name]


def decode_channels(codes: np.ndarray, mapping: dict[str, int] | None = None) -> np.ndarray:
    """int8 code array → object array of channel names.

    Pass ``mapping`` when decoding inside a WORKER task: user-registered
    channels mutate the driver's ``CHANNEL_CODES``, but workers import a
    fresh module copy, so the caller must capture the driver-side dict
    into its closure (see ``verify.score_and_filter``).  Codes beyond
    the mapping decode to ``channel_<code>`` instead of raising."""
    mapping = CHANNEL_CODES if mapping is None else mapping
    size = max(max(mapping.values()), int(codes.max(initial=0))) + 1
    names = np.array([f"channel_{i}" for i in range(size)], dtype=object)
    for k, v in mapping.items():
        names[v] = k
    return names[codes]


# per-WORKER-PROCESS permutation cache: the signature stage runs as
# stateless tasks (actor pools ramp up lazily — a few-second stage
# never reaches full width; tasks go wide immediately), and Ray worker
# processes persist across tasks, so this module global gives the same
# build-once-per-worker semantics an actor __init__ would
_COEFFS: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _cached_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _COEFFS:
        _COEFFS[key] = minhash_coeffs(num_perm, seed)
    return _COEFFS[key]


def signature_batch(
    batch: pa.Table, cfg: PipelineConfig, with_shingles: bool = True
) -> pa.Table:
    """k-char-shingle MinHash signatures for one Arrow batch (Broder
    1997).  Signatures are computed exactly ONCE here and reused by
    both band generation (cheap vectorized mix) and the verifier's
    estimate gate — recomputing them per verifier actor would dominate
    the verify stage (every actor sees pairs spanning the corpus)."""
    a, b = _cached_coeffs(cfg.num_perm, cfg.seed)
    texts = batch["text_canon"].to_pylist()
    k = cfg.shingle_k
    n = len(texts)
    out = np.empty((n, cfg.num_perm), dtype=np.uint64)
    sh_parts: list[np.ndarray] = []
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    for i, t in enumerate(texts):
        sh = char_shingle_hashes(t or "", k)
        if with_shingles:
            sh_parts.append(sh)
            offsets[i + 1] = offsets[i] + sh.size
        out[i] = minhash_signature(sh, a, b)
    from fuzzy_matching_ray.hashing import nid_of

    cols = {
        "conv_id": batch["conv_id"],
        "nid": pa.array(nid_of(batch["conv_id"].to_pylist()), pa.uint64()),
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.uint64()), cfg.num_perm
        ),
    }
    # the sorted-unique shingle sets ride along so the verifier's
    # exact-Jaccard kernel never recomputes them per actor (that
    # duplicated work is CPU-count-independent and kills scaling).
    # ``with_shingles=False`` (the big-side / shuffle-attach mode)
    # skips this ~4 bytes/char payload: the signature dataset then
    # stays a narrow (nid, sig) table instead of ~4× the corpus in
    # the object store, and verifiers recompute shingles from the
    # shuffle-attached text instead.
    if with_shingles:
        flat = np.concatenate(sh_parts) if sh_parts else np.empty(0, dtype=np.uint64)
        # shingle hashes are 32-bit values (hashing.char_shingle_hashes
        # masks to _MAX_HASH32): carried as uint32, halving the
        # largest payload in the object store AND the exact-Jaccard
        # kernel's memory traffic.  large_list offsets stay int64 —
        # int32 would overflow past 2^31 cumulative shingles.
        cols["shingles"] = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(flat.astype(np.uint32), pa.uint32()),
        )
    return pa.table(cols)


class MinHashSignatures:
    """Callable-class form of :func:`signature_batch` (kept for actor-
    pool use and tests; the pipeline itself runs the stateless task
    form — see ``compute_signatures``)."""

    def __init__(self, cfg: PipelineConfig, with_shingles: bool = True):
        self.cfg = cfg
        self.with_shingles = with_shingles
        self.a, self.b = _cached_coeffs(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return signature_batch(batch, self.cfg, self.with_shingles)


def compute_signatures(
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    with_shingles: bool = True,
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """docs(conv_id, text_canon, …) → narrow ``(conv_id, nid, sig)``
    dataset; only the two needed columns leave the doc store.
    ``with_shingles`` additionally carries the shingle sets for the
    broadcast-attach verify mode (see ``signature_batch``).

    Runs as STATELESS TASKS, not an actor pool: the only per-worker
    state is two tiny coefficient vectors (module-cached per worker
    process), and Ray's actor pools ramp up lazily — on a few-second
    stage the pool never reaches its sized width, which measured as a
    CPU-count-independent stage wall (flat 6.8s at 8 and 32 CPUs at
    scale24000).  Tasks schedule wide immediately.

    Block-granularity guard (round 5): map_batches schedules one TASK
    per input block, so a corpus assembled from few files/partitions
    caps this stage at that many tasks (4 tasks at 32 CPUs measured as
    a flat ~2s wall at any CPU count).  When ``n_docs`` implies fewer
    natural blocks than the cluster can use, the narrow projected
    input is re-sliced by a StreamingRepartition — a task-local split,
    NO all-to-all — to ``cfg.docs_rows_per_block`` rows per block.  At
    real scale (blocks ≫ cores) the estimate disables the split.  The
    split happens AFTER the column projection, so only (conv_id,
    text_canon) bytes are re-sliced, and the (tiny, narrow-keyed)
    exact-dedup shuffle keeps the coarse natural blocks it measures
    fastest on."""
    import ray

    narrow = docs.select_columns(["conv_id", "text_canon"])
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if (
        cfg.docs_rows_per_block > 0
        and n_docs is not None
        and n_docs > cfg.docs_rows_per_block
        # natural granularity unknown on a lazy plan: a corpus this
        # small relative to the cluster plausibly arrived as fewer
        # blocks than the cluster can use, and re-slicing its narrow
        # projection is cheap; a corpus past this bound has enough
        # natural blocks (and the split would re-copy real bytes)
        and n_docs < 16 * ncpu * cfg.docs_rows_per_block
    ):
        target = max(cfg.docs_rows_per_block, n_docs // (4 * ncpu) + 1)
        narrow = narrow.repartition(target_num_rows_per_block=target)
    return narrow.map_batches(
        lambda b: signature_batch(b, cfg, with_shingles),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        num_cpus=1,
    )


def sig_matrix(col: pa.ChunkedArray | pa.Array, num_perm: int) -> np.ndarray:
    """FixedSizeList<uint64> column → (n, num_perm) uint64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, num_perm)


def minhash_band_rows(sigs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """sigs(nid, sig) → (band_key, nid) rows (stateless: band keys are
    a vectorized mix over the signature matrix).  8-byte node ids, not
    conv_id strings, flow through the banding shuffle.  In
    ``hot_bucket_mode='resalt'`` each row additionally carries the
    doc's ``salt_key`` (hashing.salt_keys) so hot buckets can re-band
    at finer granularity downstream — +8 bytes/row on this exchange,
    only in that mode."""
    bands, num_perm = cfg.bands, cfg.num_perm
    resalt_rows = cfg.resalt_rows if cfg.hot_bucket_mode == "resalt" else 0

    def _explode(batch: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.hashing import band_hashes_matrix, salt_keys

        n = batch.num_rows
        mat = sig_matrix(batch["sig"], num_perm)
        keys = band_hashes_matrix(mat, bands)
        idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        cols = {
            "band_key": pa.array(keys.reshape(-1), pa.uint64()),
            "nid": batch["nid"].take(pa.array(idx)),
        }
        if resalt_rows:
            salts = salt_keys(mat, resalt_rows)
            cols["salt_key"] = pa.array(np.repeat(salts, bands), pa.uint64())
        return pa.table(cols)

    return sigs.select_columns(["nid", "sig"]).map_batches(
        _explode, batch_format="pyarrow"
    )


def _bucket_pairs(
    ids, max_bucket: int, channel: int, max_pairs: int = 1 << 62
) -> pd.DataFrame:
    """Deterministic pair emission for one hot bucket: salted chunks of
    ``max_bucket``, a total pair budget of ``max_pairs``, chain links
    between chunks.

    A band key shared by thousands of documents is boilerplate (a
    "stopword band") and carries almost no similarity signal — true
    near-dup pairs collide in many *other*, doc-specific bands.  Pairs
    inside budget-exhausted chunks are deliberately not emitted (they
    rely on the doc-specific bands for recall — measured neutral on the
    synthetic corpus); chain-link candidates keep one candidate path
    per chunk and are still verified, so they can never create a
    spurious cluster edge.  Returns (pairs_df, dropped_cross_pairs)
    with the exact count of skipped cross pairs for the skew metric.
    """
    ids_arr = np.sort(np.asarray(ids, dtype=np.uint64))
    n = ids_arr.size
    if n < 2:
        return (
            pd.DataFrame(
                {
                    "src": pd.Series(dtype="uint64"),
                    "dst": pd.Series(dtype="uint64"),
                    "channel": pd.Series(dtype="int8"),
                    "bucket_size": pd.Series(dtype="int32"),
                }
            ),
            0,
        )
    src_parts: list[np.ndarray] = []
    dst_parts: list[np.ndarray] = []
    emitted = 0
    for start in range(0, n, max_bucket):
        chunk = ids_arr[start : start + max_bucket]
        m = chunk.size
        # a chunk is admitted only if its FULL pair count fits the
        # remaining budget (admitting at `emitted < max_pairs` would
        # overshoot by up to C(max_bucket,2)-1 on unaligned budgets)
        if m >= 2 and emitted + m * (m - 1) // 2 <= max_pairs:
            iu, ju = np.triu_indices(m, k=1)
            src_parts.append(chunk[iu])
            dst_parts.append(chunk[ju])
            emitted += iu.size
        if start > 0 or m < 2:
            # chain chunks so one hot bucket still yields one component;
            # chain links are real cross pairs (bucket min × chunk head)
            # and count as emitted, not dropped
            src_parts.append(ids_arr[:1])
            dst_parts.append(chunk[:1])
            emitted += 1
    return (
        pd.DataFrame(
            {
                "src": np.concatenate(src_parts),
                "dst": np.concatenate(dst_parts),
                "channel": np.int8(channel),
                "bucket_size": np.int32(n),
            }
        ),
        n * (n - 1) // 2 - emitted,
    )


def _bucket_pairs_resalt(
    ids, salts, max_bucket: int, channel: int, max_pairs: int = 1 << 62
) -> tuple[pd.DataFrame, int, int]:
    """Re-salted pair emission for one hot bucket: members are
    re-banded by ``salt_key`` (a finer LSH band over extra signature
    rows — see ``hashing.salt_keys``); each salt group ≤ ``max_bucket``
    emits ALL its pairs, oversize salt groups fall back to the
    chunk/budget path of :func:`_bucket_pairs`.  Pairs separated by the
    salt didn't collide at the finer granularity — the same non-event
    as any LSH miss — and are counted exactly as ``resalted`` (not
    ``dropped``; only budget-exhausted pairs inside oversize salt
    groups count there).  Returns (pairs_df, dropped, resalted) with
    the exact identity C(n,2) == emitted + dropped + resalted.

    No chain links across salt groups: unlike sorted-id chunks (an
    arbitrary partition of one over-merged bucket), salt groups are a
    *principled* separation, so stitching them back into one candidate
    path would re-create exactly the boilerplate mega-component the
    finer banding exists to avoid."""
    ids_arr = np.asarray(ids, dtype=np.uint64)
    salts_arr = np.asarray(salts, dtype=np.uint64)
    n = ids_arr.size
    order = np.lexsort((ids_arr, salts_arr))
    ids_arr = ids_arr[order]
    salts_arr = salts_arr[order]
    boundary = np.flatnonzero(np.r_[True, salts_arr[1:] != salts_arr[:-1], True])
    sizes = np.diff(boundary)
    starts = boundary[:-1]

    frames: list[pd.DataFrame] = []
    emitted = 0
    dropped = 0
    for s, m in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        group = ids_arr[s : s + m]
        if m <= max_bucket:
            iu, ju = np.triu_indices(m, k=1)
            frames.append(
                pd.DataFrame(
                    {
                        "src": group[iu],
                        "dst": group[ju],
                        "channel": np.int8(channel),
                        "bucket_size": np.int32(n),
                    }
                )
            )
            emitted += iu.size
        else:
            frame, grp_dropped = _bucket_pairs(group, max_bucket, channel, max_pairs)
            frames.append(frame)
            dropped += grp_dropped
            emitted += int(m) * (int(m) - 1) // 2 - grp_dropped
    if frames:
        out = pd.concat(frames, ignore_index=True)
    else:
        out = pd.DataFrame(
            {
                "src": pd.Series(dtype="uint64"),
                "dst": pd.Series(dtype="uint64"),
                "channel": pd.Series(dtype="int8"),
                "bucket_size": pd.Series(dtype="int32"),
            }
        )
    resalted = n * (n - 1) // 2 - emitted - dropped
    return out, dropped, resalted


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
    max_pairs = cfg.max_pairs_per_bucket
    code = channel_code(channel)

    def _pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair emission for all bands in one coarse bucket.

        Bands of equal size are processed together: their member ids
        form a (n_groups, size) matrix and one ``triu_indices`` fancy-
        index emits every within-band pair — no per-band Python loop.
        Oversized (hot) bands fall back to the salted/capped path.

        Every cross pair skipped by the budget is counted EXACTLY and
        carried as one ``__skew`` sentinel row per coarse bucket
        (src=0, dst=first band key — unique per bucket), so the skew
        metric survives pair dedup without per-bucket identity columns.
        """
        df = df.sort_values(["band_key", "nid"], kind="mergesort")
        keys = df["band_key"].to_numpy()
        ids = df["nid"].to_numpy()
        salts = df["salt_key"].to_numpy() if "salt_key" in df.columns else None
        # group boundaries over the sorted keys
        boundary = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        sizes = np.diff(boundary)
        starts = boundary[:-1]

        src_parts: list[np.ndarray] = []
        dst_parts: list[np.ndarray] = []
        size_parts: list[np.ndarray] = []
        hot_frames: list[pd.DataFrame] = []
        dropped_total = 0
        resalted_total = 0
        # one vectorized emission per distinct group size (≤ max_bucket
        # distinct values) instead of one Python call per band
        for n in np.unique(sizes):
            if n < 2:
                continue
            sel = starts[sizes == n]
            if n > max_bucket:
                for s in sel:
                    if salts is not None:
                        frame, dropped, resalted = _bucket_pairs_resalt(
                            ids[s : s + n], salts[s : s + n], max_bucket, code, max_pairs
                        )
                        resalted_total += resalted
                    else:
                        frame, dropped = _bucket_pairs(
                            ids[s : s + n], max_bucket, code, max_pairs
                        )
                    hot_frames.append(frame)
                    dropped_total += dropped
                continue
            mat = ids[sel[:, None] + np.arange(n)[None, :]]  # (g, n)
            iu, ju = np.triu_indices(n, k=1)
            src_parts.append(mat[:, iu].ravel())
            dst_parts.append(mat[:, ju].ravel())
            size_parts.append(np.full(len(sel) * iu.size, n, dtype=np.int32))

        cold = pd.DataFrame(
            {
                "src": np.concatenate(src_parts) if src_parts else np.empty(0, dtype=np.uint64),
                "dst": np.concatenate(dst_parts) if dst_parts else np.empty(0, dtype=np.uint64),
                "channel": np.int8(code),
                "bucket_size": np.concatenate(size_parts)
                if size_parts
                else np.empty(0, dtype=np.int32),
            }
        )
        parts = [cold, *hot_frames]
        if dropped_total:
            parts.append(
                pd.DataFrame(
                    {
                        "src": np.zeros(1, dtype=np.uint64),
                        "dst": np.asarray([keys[0]], dtype=np.uint64),
                        "channel": np.int8(CHANNEL_CODES[SKEW_CHANNEL]),
                        # int32 would overflow for quadratic drop counts;
                        # carry the exact value in a dedicated column
                        "bucket_size": np.int32(0),
                        "dropped": np.int64(dropped_total),
                    }
                )
            )
        if resalted_total:
            # src=1 (vs the skew sentinel's src=0) keeps (src,dst)
            # distinct under pair dedup when both sentinels exist for
            # one coarse bucket
            parts.append(
                pd.DataFrame(
                    {
                        "src": np.ones(1, dtype=np.uint64),
                        "dst": np.asarray([keys[0]], dtype=np.uint64),
                        "channel": np.int8(CHANNEL_CODES[RESALT_CHANNEL]),
                        "bucket_size": np.int32(0),
                        "dropped": np.int64(resalted_total),
                    }
                )
            )
        out = pd.concat(parts, ignore_index=True) if len(parts) > 1 else cold
        if "dropped" not in out.columns:
            out["dropped"] = np.int64(0)
        else:
            out["dropped"] = out["dropped"].fillna(0).astype(np.int64)
        return out

    return bucketed_group_apply(band_rows, "band_key", _pairs_bucket, num_partitions)


def dedup_pairs(pairs: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """Normalize (src,dst) to (min,max) and keep one row per pair
    across bands/channels (shuffle #3; priority
    exact > substring > minhash > simhash decides the surviving
    channel tag).  Bucketing on ``src`` alone co-locates every copy of
    a pair (same (src,dst) ⇒ same bucket), so no concatenated pair-key
    string is ever built; dedup is a vectorized two-column
    ``drop_duplicates`` per bucket."""

    def _norm(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = batch["src"]
        dst = batch["dst"]
        lo = pc.min_element_wise(src, dst)
        hi = pc.max_element_wise(src, dst)
        # __skew sentinels (src=0, dst=band key) pass through: lo=0≠hi
        keep = pc.not_equal(lo, hi)
        cols = {
            "src": lo.filter(keep),
            "dst": hi.filter(keep),
            "channel": batch["channel"].filter(keep),
            "bucket_size": batch["bucket_size"].filter(keep),
        }
        if "dropped" in batch.column_names:
            cols["dropped"] = batch["dropped"].filter(keep)
        else:
            cols["dropped"] = pa.array(
                np.zeros(len(cols["src"]), dtype=np.int64), pa.int64()
            )
        return pa.table(cols)

    def _dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # channel CODES are the priority order (CHANNEL_CODES), so the
        # raw column sorts directly; bucket_size in the sort key makes
        # the surviving row deterministic under priority ties —
        # otherwise it depends on partition layout and the
        # dropped-pairs metric wobbles with P
        df = df.sort_values(["src", "dst", "channel", "bucket_size"], kind="mergesort")
        return df.drop_duplicates(subset=["src", "dst"], keep="first")

    normed = pairs.map_batches(_norm, batch_format="pyarrow")
    return bucketed_group_apply(normed, "src", _dedup_bucket, num_partitions)
