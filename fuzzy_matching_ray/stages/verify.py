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

# element budget per vectorized-Jaccard chunk: flat(4B) + idx(8B) +
# eq(4B) + bool temp ≈ 17 B/elem → 48k elems ≈ 0.8 MB, inside a
# per-core L2 even with 32 concurrent verifier tasks
_VEC_CHUNK = 49152

# opt-in coarse section profiler (tools/profile_verify.py): a dict of
# accumulated seconds per kernel section.  None — the default — keeps
# the hot kernel free of timer calls beyond one branch per section.
PROF: dict | None = None

# metric sentinel rows emitted by VerifierPool (one per batch) carrying
# the estimate-gate skip count in edit_sim; never become edges
GATE_CHANNEL = "__gate"
# __gate's int8 code in the pair stream — read from the registry so
# the two constants can't drift
from fuzzy_matching_ray.stages.minhash import CHANNEL_CODES as _CHANNEL_CODES  # noqa: E402

GATE_CODE = _CHANNEL_CODES[GATE_CHANNEL]


def _as_arrow(batch) -> pa.Table:
    if isinstance(batch, pd.DataFrame):
        return pa.Table.from_pandas(batch, preserve_index=False)
    return batch


def _pack_text_block(batch):
    """(nids, utf8 bytes, per-row byte lengths) for one doc block."""
    from fuzzy_matching_ray.hashing import nid_of

    batch = _as_arrow(batch)
    if batch.num_rows == 0:
        # empty shuffle buckets emit zero-row (sometimes zero-COLUMN)
        # blocks — pack them to empty rather than KeyError on a column
        # the degenerate schema lacks
        return np.empty(0, np.uint64), b"", np.empty(0, np.int64)
    nids = nid_of(batch["conv_id"].to_pylist())
    col = (
        batch["text_canon"].combine_chunks()
        if isinstance(batch["text_canon"], pa.ChunkedArray)
        else batch["text_canon"]
    )
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(
        col.buffers()[1], dtype=off_dtype, count=len(col) + col.offset + 1
    )[col.offset :]
    data = col.buffers()[2].to_pybytes()[offs[0] : offs[-1]]
    return nids, data, np.diff(offs).astype(np.int64)


def _build_bitmaps(sh_flat: np.ndarray, sh_lens: np.ndarray, bits: int) -> np.ndarray:
    """(n_docs, bits//64) uint64 bit-set sketches: shingle hash h sets
    bit ``h & (bits-1)``.  Dense boolean scatter + ``packbits`` per
    ≤4096-doc slice — measured ~6× faster than ``bitwise_or.at`` (which
    is unbuffered) and the slice bounds the dense temp at ~32 MB."""
    n = sh_lens.size
    w = bits // 64
    out = np.empty((n, w), dtype=np.uint64)
    doc_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sh_lens, out=doc_off[1:])
    mask = np.uint32(bits - 1)
    for lo in range(0, n, 4096):
        hi = min(lo + 4096, n)
        lens = sh_lens[lo:hi]
        flat = sh_flat[doc_off[lo] : doc_off[hi]]
        dense = np.zeros((hi - lo, bits), dtype=bool)
        rows = np.repeat(np.arange(hi - lo, dtype=np.int64), lens)
        dense[rows, (flat & mask).astype(np.int64)] = True
        out[lo:hi] = np.packbits(dense, axis=1, bitorder="little").view(np.uint64)
    return out


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _union_popcount(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise ``popcount(a | b)`` over (m, W) uint64 bitmap rows —
    SWAR bit-twiddling (Hacker's Delight fig. 5-2), fully vectorized;
    measured 3× over a byte-LUT gather (840k vs 274k pairs/s, W=128)."""
    x = a | b
    x -= (x >> np.uint64(1)) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x += x >> np.uint64(4)
    x &= _M4
    return ((x * _H01) >> np.uint64(56)).sum(axis=1, dtype=np.int64)


def _pack_sig_block(batch, num_perm: int, has_shingles: bool, bitmap_bits: int = 0):
    """(nids, sig matrix, shingle flat, shingle lengths, bitmaps) for
    one block."""
    from fuzzy_matching_ray.stages.minhash import sig_matrix

    build_bm = has_shingles and bitmap_bits > 0
    batch = _as_arrow(batch)
    if batch.num_rows == 0:
        empty_sh = (np.empty(0, np.uint64), np.empty(0, np.int64)) if has_shingles else (None, None)
        empty_bm = np.empty((0, bitmap_bits // 64), np.uint64) if build_bm else None
        return np.empty(0, np.uint64), np.empty((0, num_perm), np.uint64), *empty_sh, empty_bm
    nid_col = batch["nid"]
    if isinstance(nid_col, pa.ChunkedArray):
        nid_col = nid_col.combine_chunks()
    nids = nid_col.to_numpy(zero_copy_only=False)
    mat = sig_matrix(batch["sig"], num_perm)
    sh_flat = sh_lens = bitmaps = None
    if has_shingles:
        sh_col = batch["shingles"]
        if isinstance(sh_col, pa.ChunkedArray):
            sh_col = sh_col.combine_chunks()
        sh_flat = sh_col.flatten().to_numpy(zero_copy_only=False)
        offs = np.asarray(sh_col.offsets)
        sh_lens = np.diff(offs).astype(np.int64)
        if build_bm:
            bitmaps = _build_bitmaps(sh_flat, sh_lens, bitmap_bits)
    return nids, mat, sh_flat, sh_lens, bitmaps


def _gather_packed(ds: ray.data.Dataset, pack_fn, args: tuple, fallbacks: dict | None = None):
    """Run ``pack_fn`` over the dataset's blocks as parallel Ray tasks
    and yield the packed tuples in block order (numpy results come back
    zero-copy from the object store).

    Failure handling is per-ref and LOUD: a block whose remote pack
    errors is fetched and re-packed locally (not the whole gather — a
    silent whole-run serial fallback here was a 1.7× regression on the
    store build), and every fallback is counted into ``fallbacks`` and
    printed so it shows up in bench tails."""
    try:
        block_refs = [
            r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs
        ]
    except Exception as exc:
        print(f"[verify] block refs unavailable ({exc!r}); serial driver-side pack")
        if fallbacks is not None:
            fallbacks["serial_gather"] = fallbacks.get("serial_gather", 0) + 1
        for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            yield pack_fn(batch, *args)
        return
    pack_remote = ray.remote(num_cpus=1)(pack_fn)
    refs = [pack_remote.remote(r, *args) for r in block_refs]
    for ref, block_ref in zip(refs, block_refs):
        try:
            yield ray.get(ref)
        except Exception as exc:
            print(f"[verify] parallel pack failed for one block ({exc!r}); repacking locally")
            if fallbacks is not None:
                fallbacks["block_repacks"] = fallbacks.get("block_repacks", 0) + 1
            yield pack_fn(ray.get(block_ref), *args)


def _pconcat(parts: list[np.ndarray]) -> np.ndarray:
    """Concatenate along axis 0 into a preallocated buffer with a small
    thread pool.  numpy slice-assignment releases the GIL, and spreading
    the first-touch page faults of the ~GB store buffers over threads
    cuts the single-task assembly's flat cost (serial ``concatenate``
    was a CPU-count-independent 2-4 s at scale72000 under this host's
    memory-pressure phases).  Small inputs stay serial."""
    if len(parts) == 1:
        return parts[0]
    lens = [p.shape[0] for p in parts]
    offs = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    shape = (int(offs[-1]),) + parts[0].shape[1:]
    out = np.empty(shape, dtype=parts[0].dtype)
    if offs[-1] < (1 << 22):
        for i, p in enumerate(parts):
            out[offs[i] : offs[i + 1]] = p
        return out
    from concurrent.futures import ThreadPoolExecutor

    def _copy(i: int) -> None:
        out[offs[i] : offs[i + 1]] = parts[i]

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(_copy, range(len(parts))))
    return out


def _assemble_store(
    text_parts: list, sig_parts: list, has_shingles: bool
) -> dict:
    """Concatenate packed per-block buffers into the columnar broadcast
    store.  Runs inside ONE remote task on the fast path (the driver
    never touches the big buffers); also the driver-side fallback."""
    nid_parts = [p[0] for p in text_parts]
    text_chunks = [p[1] for p in text_parts]
    text_lens = [p[2] for p in text_parts]

    text_nids = np.concatenate(nid_parts) if nid_parts else np.empty(0, dtype=np.uint64)
    n_docs = text_nids.size
    text_flat = (
        _pconcat([np.frombuffer(c, dtype=np.uint8) for c in text_chunks])
        if text_chunks
        else np.empty(0, dtype=np.uint8)
    )
    lens = np.concatenate(text_lens) if text_lens else np.empty(0, dtype=np.int64)
    text_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=text_off[1:])
    # sorted-nid + permutation: lookups become one vectorized
    # searchsorted per batch instead of a per-pair dict probe
    text_order = np.argsort(text_nids, kind="stable")
    text_nids_sorted = text_nids[text_order]

    # signature-side arrays keep the SIGS dataset's own iteration order
    # under their own sorted-nid index — no per-row scatter, just
    # per-batch concatenation of already-contiguous buffers
    sig_nid_parts = [p[0] for p in sig_parts]
    sig_mats = [p[1] for p in sig_parts]
    sh_flats = [p[2] for p in sig_parts if has_shingles]
    sh_lens = [p[3] for p in sig_parts if has_shingles]
    bm_parts = [
        p[4] for p in sig_parts if has_shingles and len(p) > 4 and p[4] is not None
    ]

    sig_nids = (
        np.concatenate(sig_nid_parts) if sig_nid_parts else np.empty(0, dtype=np.uint64)
    )
    sig_order = np.argsort(sig_nids, kind="stable")
    sig_mat = _pconcat(sig_mats) if sig_mats else None
    sh_flat = None
    sh_off = None
    if has_shingles and sh_flats:
        sh_flat = _pconcat(sh_flats)
        lens_s = np.concatenate(sh_lens)
        sh_off = np.zeros(lens_s.size + 1, dtype=np.int64)
        np.cumsum(lens_s, out=sh_off[1:])

    # bitmap sketches ride the same sig-row order as sh_off/sh_flat;
    # only attached when every part carried one (mixed parts would
    # misalign rows)
    bitmaps = (
        _pconcat(bm_parts) if bm_parts and len(bm_parts) == len(sig_mats) else None
    )

    return {
        "text_nids_sorted": text_nids_sorted,
        "text_order": text_order,
        "text_flat": text_flat,
        "text_off": text_off,
        "sig_nids_sorted": sig_nids[sig_order] if sig_mat is not None else None,
        "sig_order": sig_order if sig_mat is not None else None,
        "sigs": sig_mat,
        "sh_flat": sh_flat,
        "sh_off": sh_off,
        "bitmaps": bitmaps,
    }


def _assemble_store_task(n_text: int, has_shingles: bool, *parts) -> dict:
    """Remote entry: Ray resolves the pack-task refs in ``*parts``
    zero-copy before the task body runs."""
    return _assemble_store(list(parts[:n_text]), list(parts[n_text:]), has_shingles)


def attach_texts_broadcast(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    sigs: ray.data.Dataset | None = None,
    fallbacks: dict | None = None,
) -> tuple[ray.data.Dataset, "ray.ObjectRef"]:
    """Broadcast the doc payloads once; verifier actors resolve them
    locally.  Returns (pairs, store_ref).

    Store layout is fully columnar — sorted-nid index arrays plus flat
    numpy buffers (utf-8 text bytes + offsets, concatenated sorted
    shingle sets + offsets, signature matrix).  Numpy buffers
    deserialize zero-copy out of the object store, so N verifier
    actors on a node share ONE copy of the payload instead of N
    pickled copies, and the exact-Jaccard kernel reads shingle-set
    views without ever recomputing them (per-actor recompute is
    CPU-count-independent work that kills scaling).

    Build path: per-block pack tasks run in PARALLEL, and the concat +
    index assembly runs in ONE remote task whose arguments are the
    pack refs (zero-copy resolve) and whose return value IS the
    broadcast object — the driver handles only refs, so the build
    costs one worker-side copy instead of the old pack→driver→
    ``ray.put`` double round-trip (measured as a CPU-count-independent
    ~12s at scale24000 in attach_s).  Any failure falls back, loudly
    and counted, to the driver-side gather (which retains per-block
    repack repair)."""
    handle = start_store_build(docs, cfg, sigs)
    return pairs, finish_store_build(handle, docs, cfg, sigs, fallbacks)


def start_store_build(
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    sigs: ray.data.Dataset | None = None,
) -> dict:
    """Launch the broadcast-store pack + assemble tasks WITHOUT
    blocking and return an opaque handle for ``finish_store_build``.

    The store depends only on the (materialized) docs and signature
    datasets — not on candidate pairs — so the flagship starts the
    build before the pair shuffle and the two overlap; the store-build
    wall (a CPU-count-independent serial segment when run inline)
    disappears behind the shuffle.  A failure here is deferred into the
    handle: ``finish_store_build`` owns the loud driver-side fallback."""
    # schema() is None for a fully-empty materialized dataset (the
    # 0-doc corpus edge): treat it as signatures-without-shingles
    sig_schema = sigs.schema() if sigs is not None else None
    has_shingles = sig_schema is not None and "shingles" in sig_schema.names
    try:
        # gather straight from the (materialized) datasets: the pack
        # fns project the columns they need, and
        # iter_internal_ref_bundles on a materialized dataset lists
        # existing blocks without a new execution
        text_blocks = [
            r for bundle in docs.iter_internal_ref_bundles() for r in bundle.block_refs
        ]
        pack_text = ray.remote(num_cpus=1)(_pack_text_block)
        text_refs = [pack_text.remote(r) for r in text_blocks]
        sig_refs: list = []
        if sigs is not None:
            sig_blocks = [
                r for bundle in sigs.iter_internal_ref_bundles() for r in bundle.block_refs
            ]
            pack_sig = ray.remote(num_cpus=1)(_pack_sig_block)
            sig_refs = [
                pack_sig.remote(r, cfg.num_perm, has_shingles, cfg.bitmap_bits)
                for r in sig_blocks
            ]
        build = ray.remote(num_cpus=2)(_assemble_store_task)
        store_ref = build.remote(len(text_refs), has_shingles, *text_refs, *sig_refs)
        # health probe that fetches ONE int, not the store: a failed
        # pack/build must surface in finish_store_build (where the
        # fallback can run), not inside a verifier actor's __init__
        probe = ray.remote(num_cpus=0)(lambda s: int(s["text_nids_sorted"].size))
        return {
            "store_ref": store_ref,
            "probe_ref": probe.remote(store_ref),
            "has_shingles": has_shingles,
        }
    except Exception as exc:  # deferred to finish_store_build
        return {"error": exc, "has_shingles": has_shingles}


def finish_store_build(
    handle: dict,
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    sigs: ray.data.Dataset | None = None,
    fallbacks: dict | None = None,
) -> "ray.ObjectRef":
    """Block on a ``start_store_build`` handle and return the store
    ref; on any build failure run the (loud, counted) driver-side
    gather fallback."""
    has_shingles = handle["has_shingles"]
    try:
        if "error" in handle:
            raise handle["error"]
        n_store = ray.get(handle["probe_ref"])
        if n_store == 0 and docs.count() > 0:
            raise RuntimeError("remote store build produced an empty store")
        return handle["store_ref"]
    except Exception as exc:
        print(f"[verify] remote store build failed ({exc!r}); driver-side build")
        if fallbacks is not None:
            fallbacks["driver_store_build"] = fallbacks.get("driver_store_build", 0) + 1

    text_parts = list(_gather_packed(docs, _pack_text_block, (), fallbacks))
    sig_parts = (
        list(
            _gather_packed(
                sigs,
                _pack_sig_block,
                (cfg.num_perm, has_shingles, cfg.bitmap_bits),
                fallbacks,
            )
        )
        if sigs is not None
        else []
    )
    return ray.put(_assemble_store(text_parts, sig_parts, has_shingles))


def _pad_column(typ: pa.DataType, n: int) -> pa.Array:
    """Type-preserving filler for the doc side of a bucketed join
    union.  Numeric columns are zero-filled, NOT null-filled: an Arrow
    uint64 column with nulls round-trips through pandas as float64 and
    silently corrupts node ids above 2^53."""
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.nulls(n, typ)
    return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), typ)


def attach_texts_shuffle(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Big-side attach: two bucketed hash-join passes keyed on src then
    dst.  This is the designated path beyond broadcast scale (docs >
    ~2M): ``doc_text`` never rides a full shuffle — each pass moves the
    narrow ``(nid, text_canon)`` projection plus the id-only pair rows,
    co-partitioned by ``hash(nid) % P``, and a *vectorized* pandas
    merge attaches texts for a whole bucket at once (O(P) Python calls,
    not one per document — ``stages/grouped.py``)."""
    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    out = pairs
    # track the evolving pair schema in Python: calling .schema() on the
    # lazy intermediate would execute pass 1 once for the schema and
    # again for pass 2
    base = pairs.schema()
    pair_names, pair_types = list(base.names), list(base.types)
    for side in ("src", "dst"):

        def _doc_rows(b: pa.Table, names=tuple(pair_names), types=tuple(pair_types)) -> pa.Table:
            from fuzzy_matching_ray.hashing import nid_of

            n = b.num_rows
            cols = {
                "key": pa.array(nid_of(b["conv_id"].to_pylist()), pa.uint64()),
                "_is_doc": pa.array(np.ones(n, dtype=bool)),
                "_text": b["text_canon"],
            }
            for name, typ in zip(names, types):
                cols["p_" + name] = _pad_column(typ, n)
            return pa.table(cols)

        doc_rows = docs.select_columns(["conv_id", "text_canon"]).map_batches(
            _doc_rows, batch_format="pyarrow"
        )

        def _pair_rows(b: pa.Table, side=side, names=tuple(pair_names)) -> pa.Table:
            n = b.num_rows
            cols = {
                "key": b[side],
                "_is_doc": pa.array(np.zeros(n, dtype=bool)),
                "_text": pa.nulls(n, pa.string()),
            }
            for name in names:
                cols["p_" + name] = b[name]
            return pa.table(cols)

        pair_rows = out.map_batches(_pair_rows, batch_format="pyarrow")

        def _attach_bucket(df: pd.DataFrame, side=side) -> pd.DataFrame:
            prs = df[~df["_is_doc"]]
            if prs.empty:
                out_df = prs[[c for c in prs.columns if c.startswith("p_")]].copy()
                out_df.columns = [c[2:] for c in out_df.columns]
                out_df[side + "_text"] = pd.Series(dtype=object)
                return out_df
            docs_g = df.loc[df["_is_doc"], ["key", "_text"]].drop_duplicates("key")
            merged = prs.drop(columns=["_is_doc", "_text"]).merge(
                docs_g, on="key", how="left"
            )
            out_df = merged[[c for c in merged.columns if c.startswith("p_")]].copy()
            out_df.columns = [c[2:] for c in out_df.columns]
            out_df[side + "_text"] = merged["_text"].to_numpy()
            return out_df

        out = bucketed_group_apply(
            doc_rows.union(pair_rows), "key", _attach_bucket, num_partitions
        )
        pair_names.append(side + "_text")
        pair_types.append(pa.string())
    return out


def _renormalize_edge_strings(b: pa.Table) -> pa.Table:
    """Pairs were (min,max)-normalized in nid space; re-normalize
    lexicographically so the string-facing edge contract is stable."""
    import pyarrow.compute as pc

    cols = {name: b[name] for name in b.column_names}
    lo = pc.min_element_wise(cols["src"], cols["dst"])
    hi = pc.max_element_wise(cols["src"], cols["dst"])
    cols["src"], cols["dst"] = lo, hi
    return pa.table(cols)


def edges_to_conv_ids(
    edges: ray.data.Dataset,
    docs: ray.data.Dataset,
    *,
    mode: str = "auto",
    doc_count: int | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Map uint64 ``src``/``dst`` node ids back to ``conv_id`` strings.

    Verified edges are a tiny fraction of candidate pairs, so string
    ids only reappear here, at the user-facing boundary.  Below ~2M
    docs the reverse map is built by parallel per-block Ray tasks and
    broadcast once (``ray.put``); beyond that (``mode='bucketed'``) the
    mapping is a bucketed hash-join of the edge endpoints against the
    narrow ``(nid, conv_id)`` doc projection — no driver-side dict over
    the corpus ever exists on that path.

    An edge id absent from ``docs`` is impossible by construction
    (pairs derive from docs), so both paths fail loudly instead of
    fabricating an id."""
    import ray as _ray

    if mode == "auto":
        n = doc_count if doc_count is not None else docs.count()
        mode = "broadcast" if n <= 2_000_000 else "bucketed"

    if mode == "bucketed":
        return _edges_to_conv_ids_bucketed(edges, docs, num_partitions)

    def _pack_rev(batch) -> tuple[np.ndarray, list[str]]:
        from fuzzy_matching_ray.hashing import nid_of

        batch = _as_arrow(batch)
        if batch.num_rows == 0:
            return np.empty(0, np.uint64), []
        ids = batch["conv_id"].to_pylist()
        return nid_of(ids), ids

    # gather straight from the materialized doc dataset (the pack fn
    # projects conv_id) — no select_columns execution
    rev: dict[int, str] = {}
    for nids_b, ids_b in _gather_packed(docs, _pack_rev, ()):
        rev.update(zip(nids_b.tolist(), ids_b))
    rev_ref = _ray.put(rev)

    def _to_str(b: pa.Table) -> pa.Table:
        r = _ray.get(rev_ref)
        cols = {name: b[name] for name in b.column_names}
        for name in ("src", "dst"):
            vals = b[name].to_pylist()
            missing = [v for v in vals if v not in r]
            if missing:
                raise ValueError(
                    f"edge {name} ids not present in docs (id-space bug): "
                    f"{missing[:5]}{'…' if len(missing) > 5 else ''}"
                )
            cols[name] = pa.array([r[v] for v in vals], pa.string())
        return _renormalize_edge_strings(pa.table(cols))

    return edges.map_batches(_to_str, batch_format="pyarrow")


def _edges_to_conv_ids_bucketed(
    edges: ray.data.Dataset, docs: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Bucketed-join variant: two passes keyed on the endpoint nid
    (same machinery as ``attach_texts_shuffle``), replacing the uint64
    endpoint with its ``conv_id`` string per pass."""
    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    out = edges
    base = edges.schema()
    names, types = list(base.names), list(base.types)
    for side in ("src", "dst"):

        def _doc_rows(b: pa.Table, names=tuple(names), types=tuple(types)) -> pa.Table:
            from fuzzy_matching_ray.hashing import nid_of

            n = b.num_rows
            cols = {
                "key": pa.array(nid_of(b["conv_id"].to_pylist()), pa.uint64()),
                "_is_doc": pa.array(np.ones(n, dtype=bool)),
                "_cid": b["conv_id"],
            }
            for name, typ in zip(names, types):
                cols["p_" + name] = _pad_column(typ, n)
            return pa.table(cols)

        def _edge_rows(b: pa.Table, side=side, names=tuple(names)) -> pa.Table:
            n = b.num_rows
            cols = {
                "key": b[side].cast(pa.uint64()),
                "_is_doc": pa.array(np.zeros(n, dtype=bool)),
                "_cid": pa.nulls(n, pa.string()),
            }
            for name in names:
                cols["p_" + name] = b[name]
            return pa.table(cols)

        doc_rows = docs.select_columns(["conv_id"]).map_batches(
            _doc_rows, batch_format="pyarrow"
        )
        edge_rows = out.map_batches(_edge_rows, batch_format="pyarrow")

        def _join(df: pd.DataFrame, side=side) -> pd.DataFrame:
            ers = df[~df["_is_doc"]]
            out_df = ers[[c for c in ers.columns if c.startswith("p_")]].copy()
            out_df.columns = [c[2:] for c in out_df.columns]
            if ers.empty:
                out_df[side] = pd.Series(dtype=object)
                return out_df
            docs_g = df.loc[df["_is_doc"], ["key", "_cid"]].drop_duplicates("key")
            merged = ers[["key"]].merge(docs_g, on="key", how="left")
            if merged["_cid"].isna().any():
                bad = ers.loc[merged["_cid"].isna().to_numpy(), "key"].tolist()[:5]
                raise ValueError(f"edge {side} ids not present in docs: {bad}…")
            out_df[side] = merged["_cid"].to_numpy()
            return out_df

        out = bucketed_group_apply(
            doc_rows.union(edge_rows), "key", _join, num_partitions
        )
        types[names.index(side)] = pa.string()
    return out.map_batches(_renormalize_edge_strings, batch_format="pyarrow")


def _sorted_intersect_size(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∩ b| for sorted unique integer arrays via one-sided binary
    search — O(min log max), ~5-10× faster than ``np.intersect1d``'s
    concat-and-sort on shingle-set sizes."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return 0
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = b.size - 1
    return int(np.count_nonzero(b[idx] == a))


# per-worker-process verifier cache for the task-based executor: keyed
# by (config hash, store ref, gate flag) so a stale corpus can never be
# scored; one live verifier per worker is the norm
_WORKER_VERIFIERS: dict = {}
_VERIFIER_LAST_USE: list[float] = [0.0]
_VERIFIER_IDLE_TTL_S = 180.0
_JANITOR_STARTED: list[bool] = [False]


def _start_verifier_janitor() -> None:
    """Daemon that drops the worker's cached verifier after the stage
    goes idle.  The cache entry holds zero-copy numpy views into the
    broadcast store, which pin the multi-GB object in the worker's
    plasma quota for as long as the Python references live — without
    eviction the LAST corpus's store stayed resident in every worker
    that ever scored a batch (the actor-pool executor freed it on pool
    teardown; stateless tasks have no teardown hook, so a TTL is the
    eviction point)."""
    if _JANITOR_STARTED[0]:
        return
    import threading
    import time as _time

    def _sweep() -> None:
        while True:
            _time.sleep(_VERIFIER_IDLE_TTL_S / 3.0)
            if (
                _WORKER_VERIFIERS
                and _time.monotonic() - _VERIFIER_LAST_USE[0] > _VERIFIER_IDLE_TTL_S
            ):
                _WORKER_VERIFIERS.clear()

    threading.Thread(target=_sweep, name="fmr-verifier-janitor", daemon=True).start()
    _JANITOR_STARTED[0] = True


def _worker_verifier(cfg_hash: str, cfg, store_ref, emit_gate: bool) -> "VerifierPool":
    import time as _time

    key = (cfg_hash, store_ref.hex() if store_ref is not None else None, emit_gate)
    _VERIFIER_LAST_USE[0] = _time.monotonic()
    v = _WORKER_VERIFIERS.get(key)
    if v is None:
        _WORKER_VERIFIERS.clear()
        v = _WORKER_VERIFIERS[key] = VerifierPool(cfg, store_ref, emit_gate)
        _start_verifier_janitor()
    return v


class VerifierPool:
    """Exact Jaccard / edit-similarity scorer over candidate pairs —
    runs as an actor pool (``cfg.verify_executor='actors'``) or via
    stateless tasks with a per-worker cache (``'tasks'``, default).

    A vectorized MinHash-signature estimate (mean per-permutation
    agreement — the unbiased Jaccard estimator the LSH bands are built
    from) gates the exact kernels: pairs estimated far below threshold
    (the overwhelming majority of LSH background collisions) are scored
    with the estimate alone and never touch the shingle sets.
    """

    def __init__(self, cfg: PipelineConfig, store_ref=None, emit_gate_sentinels: bool = False):
        self.cfg = cfg
        # when enabled, each output batch carries one __gate sentinel
        # row whose edit_sim holds the count of pairs the estimate gate
        # skipped — surfaced as metrics['gate_skipped_pairs'] so recall
        # loss on adversarial corpora is observable (ADVICE item)
        self.emit_gate_sentinels = emit_gate_sentinels
        # columnar nid-keyed store (sorted uint64 id arrays + flat
        # payload buffers) — see attach_texts_broadcast
        store = ray.get(store_ref) if store_ref is not None else None
        self._store = store
        self._sigs: np.ndarray | None = store["sigs"] if store else None
        # low-byte view of the signatures for the estimate gate: equal
        # minhashes ⇒ equal bytes, unequal collide at p=1/256 (inflates
        # the estimate by ~0.004 — far below the gate's 4σ margin) for
        # 8× less gather/compare memory traffic per pair
        self._sigs8: np.ndarray | None = (
            (self._sigs & np.uint64(0xFF)).astype(np.uint8) if self._sigs is not None else None
        )
        # per-doc bit-set sketches for the exact union-popcount
        # prefilter (config.bitmap_bits); absent on stores built by
        # older checkpoints or with the prefilter disabled
        self._bitmaps: np.ndarray | None = store.get("bitmaps") if store else None
        self._shingle_cache: dict[int, np.ndarray] = {}
        self._sig_cache: dict[int, np.ndarray] = {}
        from fuzzy_matching_ray.hashing import minhash_coeffs

        self._a, self._b = minhash_coeffs(cfg.num_perm, cfg.seed)

    @staticmethod
    def _lookup(sorted_nids: np.ndarray, order: np.ndarray, q: np.ndarray) -> np.ndarray:
        """Vectorized id → data-row resolution; -1 for missing ids."""
        if sorted_nids is None or sorted_nids.size == 0:
            return np.full(q.size, -1, dtype=np.int64)
        pos = np.searchsorted(sorted_nids, q)
        pos_c = np.minimum(pos, sorted_nids.size - 1)
        rows = order[pos_c].astype(np.int64, copy=False)
        rows[sorted_nids[pos_c] != q] = -1
        return rows

    def _sig_rows(self, q: np.ndarray) -> np.ndarray:
        s = self._store
        if s is None or s["sigs"] is None:
            return np.full(q.size, -1, dtype=np.int64)
        return self._lookup(s["sig_nids_sorted"], s["sig_order"], q)

    def _text_rows(self, q: np.ndarray) -> np.ndarray:
        s = self._store
        if s is None:
            return np.full(q.size, -1, dtype=np.int64)
        return self._lookup(s["text_nids_sorted"], s["text_order"], q)

    def _shingles_by_row(self, row: int) -> np.ndarray | None:
        s = self._store
        if s is None or s["sh_flat"] is None or row < 0:
            return None
        return s["sh_flat"][s["sh_off"][row] : s["sh_off"][row + 1]]

    def _shingles_fallback(self, nid: int, text: str) -> np.ndarray:
        sh = self._shingle_cache.get(nid)
        if sh is None:
            # uint32 to match the store's shingle dtype (values are
            # 32-bit by construction; mixed-dtype searchsorted promotes)
            sh = char_shingle_hashes(text or "", self.cfg.shingle_k).astype(np.uint32)
            if len(self._shingle_cache) > 1 << 16:
                self._shingle_cache.clear()
            self._shingle_cache[nid] = sh
        return sh

    def _signature_fallback(self, nid: int, text: str) -> np.ndarray:
        sig = self._sig_cache.get(nid)
        if sig is None:
            from fuzzy_matching_ray.hashing import minhash_signature

            sig = minhash_signature(self._shingles_fallback(nid, text), self._a, self._b)
            if len(self._sig_cache) > 1 << 17:
                self._sig_cache.clear()
            self._sig_cache[nid] = sig
        return sig

    def _text_by_row(self, row: int, inline: str | None) -> str:
        if inline is not None:
            return inline
        s = self._store
        if s is None or row < 0:
            return ""
        return (
            s["text_flat"][s["text_off"][row] : s["text_off"][row + 1]]
            .tobytes()
            .decode("utf-8", errors="replace")
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from fuzzy_matching_ray.stages.minhash import (
            CHANNEL_CODES,
            RESALT_CHANNEL,
            SKEW_CHANNEL,
        )

        prof = PROF
        if prof is not None:
            import time as _t

            _lap_t = [_t.perf_counter()]

            def _lap(name: str) -> None:
                now = _t.perf_counter()
                prof[name] = prof.get(name, 0.0) + (now - _lap_t[0])
                _lap_t[0] = now

        else:

            def _lap(name: str) -> None:
                return None

        def _np(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.to_numpy(zero_copy_only=False)

        srcs = _np(batch["src"])  # uint64 node ids
        dsts = _np(batch["dst"])
        n = srcs.size
        # channel tests stay vectorized Arrow kernels — materializing
        # millions of per-pair Python strings via to_pylist dominated
        # the scoring loop
        chan_col = batch["channel"]
        # both sentinel kinds (__skew budget drops, __resalt finer-band
        # separations) are metric freight, never candidates
        is_skew = _np(pc.equal(chan_col, CHANNEL_CODES[SKEW_CHANNEL])) | _np(
            pc.equal(chan_col, CHANNEL_CODES[RESALT_CHANNEL])
        )
        is_exact = _np(pc.equal(chan_col, CHANNEL_CODES["exact"]))
        is_substr = _np(pc.equal(chan_col, CHANNEL_CODES["substring"]))
        src_texts = batch["src_text"].to_pylist() if "src_text" in batch.column_names else [None] * n
        dst_texts = batch["dst_text"].to_pylist() if "dst_text" in batch.column_names else [None] * n

        cfg = self.cfg
        gate = cfg.sig_est_gate
        jac = np.zeros(n, dtype=np.float64)
        edit = np.zeros(n, dtype=np.float64)
        use_edit = cfg.edit_accept_threshold > 0
        _lap("prep")

        # resolve store rows once per batch — vectorized searchsorted,
        # no per-pair dict probes
        rs_sig = self._sig_rows(srcs)
        rd_sig = self._sig_rows(dsts)
        rs_txt = self._text_rows(srcs)
        rd_txt = self._text_rows(dsts)
        _lap("lookup")

        # pass 1 — vectorized signature-estimate gate over the batch
        need_exact = np.ones(n, dtype=bool)
        if gate > 0 and n:
            est = np.empty(n, dtype=np.float64)
            ok = (rs_sig >= 0) & (rd_sig >= 0)
            if ok.any():
                est[ok] = (self._sigs8[rs_sig[ok]] == self._sigs8[rd_sig[ok]]).mean(axis=1)
            for i in np.flatnonzero(~ok):
                sa = (
                    self._sigs[rs_sig[i]]
                    if rs_sig[i] >= 0
                    else self._signature_fallback(
                        int(srcs[i]), self._text_by_row(rs_txt[i], src_texts[i])
                    )
                )
                sb = (
                    self._sigs[rd_sig[i]]
                    if rd_sig[i] >= 0
                    else self._signature_fallback(
                        int(dsts[i]), self._text_by_row(rd_txt[i], dst_texts[i])
                    )
                )
                est[i] = float((sa == sb).mean())
            need_exact = est >= gate
            jac = np.where(need_exact, jac, est)
        _lap("gate")
        # the metric means "pairs the gate CULLED": exclude pairs that
        # get exactly scored anyway (substring channel / exact channel)
        # and __skew sentinels, which were never real candidates
        gate_skips = (
            int(np.count_nonzero(~need_exact & ~is_substr & ~is_exact & ~is_skew))
            if gate > 0
            else 0
        )

        # pass 2 — exact kernels only where the estimate didn't rule
        # out.  With the broadcast shingle store the Jaccard kernel
        # reads array views; text is decoded only for the (rare) edit
        # gray zone and fallback paths.  __skew metric sentinels (and
        # any pair where BOTH ids are unknown and no text is attached —
        # empty-text fallbacks would spuriously score 1.0) never match.
        unknown = (rs_sig < 0) & (rd_sig < 0) & (rs_txt < 0) & (rd_txt < 0)
        if "src_text" in batch.column_names:
            # a pair is only "dead" when NEITHER side has attached text
            # (symmetric — a one-sided attach still scores via fallback)
            unknown &= np.asarray([t is None for t in src_texts]) & np.asarray(
                [t is None for t in dst_texts]
            )
        dead = is_skew | unknown
        jac[dead] = 0.0
        need_exact &= ~dead
        # exact-dup channel pairs are known-identical: score vectorized
        live_exact = is_exact & ~dead
        jac[live_exact] = 1.0
        edit[live_exact] = 1.0
        todo = np.flatnonzero((need_exact | is_substr) & ~dead & ~is_exact)

        # src-grouped exact-Jaccard fast path: candidate pairs arrive
        # sorted by (src, dst) from pair dedup, so batches contain long
        # runs sharing one src (~100 pairs/run measured).  One
        # searchsorted of the run's CONCATENATED dst sets into the
        # shared src set + a segmented reduce scores the whole run —
        # measured 1.4× over the per-pair kernel on real candidate
        # streams.  Pairs needing text fallbacks, empty sets or the
        # edit gray zone stay on the per-pair path below.
        s_store = self._store
        if todo.size and s_store is not None and s_store["sh_flat"] is not None:
            sh_off = s_store["sh_off"]
            sh_flat = s_store["sh_flat"]
            ra_t = rs_sig[todo]
            rb_t = rd_sig[todo]
            res_mask = (ra_t >= 0) & (rd_sig[todo] >= 0)
            if res_mask.any():
                sz_a = np.zeros(todo.size, dtype=np.int64)
                sz_b = np.zeros(todo.size, dtype=np.int64)
                sz_a[res_mask] = sh_off[ra_t[res_mask] + 1] - sh_off[ra_t[res_mask]]
                sz_b[res_mask] = sh_off[rb_t[res_mask] + 1] - sh_off[rb_t[res_mask]]
                res_mask &= (sz_a > 0) & (sz_b > 0)
            if res_mask.any():
                # exact size-ratio prefilter (the serial golden's rule,
                # fixtures._serial_pair_scorer): J ≥ bound requires
                # min(|A|,|B|)/max ≥ bound, and below edit_gate_low the
                # edit kernel never runs — so such pairs can never
                # become edges.  Reads 8 bytes/pair from the offsets
                # array instead of two full shingle sets: on the
                # bandwidth-bound exchange this is the cheapest cut.
                # clamp: with edit_gate_low > jaccard_threshold the edit
                # channel is dead but Jaccard edges must still survive
                lo_bound = (
                    min(cfg.edit_gate_low, cfg.jaccard_threshold)
                    if use_edit
                    else cfg.jaccard_threshold
                )
                ratio_ok = np.minimum(sz_a, sz_b) >= lo_bound * np.maximum(sz_a, sz_b)
                # ratio-culled pairs are fully resolved (jac stays 0):
                # drop them from BOTH the vectorized and per-pair paths
                res_done = res_mask & ~ratio_ok
                res_mask &= ratio_ok
            else:
                res_done = np.zeros(todo.size, dtype=bool)
            _lap("sizefilter")
            # bitmap union-popcount prefilter (config.bitmap_bits):
            # popcount(bits_A | bits_B) ≤ |A ∪ B| exactly, so
            # i_ub = |A|+|B|−popcount is an exact upper bound on
            # |A ∩ B| and J < lo is PROVEN when i_ub·(1+lo) < lo·S.
            # Culled pairs resolve to jac=0 like the size-ratio cut —
            # bit-identical edges (an edge needs J ≥ lo).  Reads 2×1 KB
            # bitmap rows instead of 2×~3 KB shingle sets; measured
            # 94% of sig-gate passers culled at scale72000.
            if self._bitmaps is not None and res_mask.any():
                bm = self._bitmaps
                lo_b = (
                    min(cfg.edit_gate_low, cfg.jaccard_threshold)
                    if use_edit
                    else cfg.jaccard_threshold
                )
                sel = np.flatnonzero(res_mask)
                ra_s = ra_t[sel]
                rb_s = rb_t[sel]
                s_sum = sz_a[sel] + sz_b[sel]
                culled = np.empty(sel.size, dtype=bool)
                # ≤2048-pair chunks keep the |, SWAR and gather
                # temporaries (~2 MB live per thread at W=128) inside
                # L2 — same reasoning as the vec_jaccard chunking
                for o in range(0, sel.size, 2048):
                    pc_u = _union_popcount(bm[ra_s[o : o + 2048]], bm[rb_s[o : o + 2048]])
                    i_ub = s_sum[o : o + 2048] - pc_u
                    culled[o : o + 2048] = (
                        i_ub * (1.0 + lo_b) < lo_b * s_sum[o : o + 2048] - 1e-9
                    )
                if culled.any():
                    hit = sel[culled]
                    res_done[hit] = True
                    res_mask[hit] = False
                _lap("bitmapfilter")
            if res_mask.any():
                vec = todo[res_mask]
                ra_v, rb_v = rs_sig[vec], rd_sig[vec]
                b_sizes = sh_off[rb_v + 1] - sh_off[rb_v]
                bounds = np.flatnonzero(np.r_[True, ra_v[1:] != ra_v[:-1], True])
                # cache-blocked inner loop: a long run (~100 dsts ×
                # ~2k shingles) used to materialize ~6 MB of int64
                # temporaries (idx/eq) per run; at 32 verifier threads
                # that is ~190 MB of live temporaries — far past L3 —
                # so the kernel went DRAM-bound and stopped scaling.
                # Chunking to ≤_VEC_CHUNK elements keeps flat+idx+eq
                # inside L2 per thread (the only unavoidable DRAM
                # traffic left is the one-time gather of each dst set
                # out of the broadcast shingle buffer).  Bit-identical
                # results — only the segmentation changes.
                for s0, e0 in zip(bounds[:-1], bounds[1:]):
                    arow = ra_v[s0]
                    a = sh_flat[sh_off[arow] : sh_off[arow + 1]]
                    if e0 - s0 < 4:
                        for j in range(s0, e0):
                            bb = sh_flat[sh_off[rb_v[j]] : sh_off[rb_v[j] + 1]]
                            inter = _sorted_intersect_size(a, bb)
                            jac[vec[j]] = inter / (a.size + bb.size - inter)
                        continue
                    j0 = s0
                    while j0 < e0:
                        j1 = j0
                        tot = 0
                        while j1 < e0 and tot < _VEC_CHUNK:
                            tot += b_sizes[j1]
                            j1 += 1
                        flat = np.concatenate(
                            [sh_flat[sh_off[r] : sh_off[r + 1]] for r in rb_v[j0:j1]]
                        )
                        idx = np.searchsorted(a, flat)
                        np.minimum(idx, a.size - 1, out=idx)
                        eq = (a[idx] == flat).astype(np.int32)
                        seg = np.zeros(j1 - j0, dtype=np.int64)
                        np.cumsum(b_sizes[j0 : j1 - 1], out=seg[1:])
                        inter = np.add.reduceat(eq, seg)
                        jac[vec[j0:j1]] = inter / (a.size + b_sizes[j0:j1] - inter)
                        j0 = j1
                _lap("vec_jaccard")
                # gray-zone edit kernel for the vectorized pairs
                if use_edit:
                    gray = vec[
                        (jac[vec] >= cfg.edit_gate_low)
                        & (jac[vec] < cfg.jaccard_threshold)
                    ]
                    for i in gray:
                        st = self._text_by_row(rs_txt[i], src_texts[i])
                        dt = self._text_by_row(rd_txt[i], dst_texts[i])
                        la = min(len(st), _EDIT_PREFIX_CAP)
                        lb = min(len(dt), _EDIT_PREFIX_CAP)
                        if la + lb and 2.0 * min(la, lb) / (la + lb) >= cfg.edit_accept_threshold:
                            edit[i] = indel_ratio(st[:_EDIT_PREFIX_CAP], dt[:_EDIT_PREFIX_CAP])
                _lap("gray_edit")
                todo = todo[~res_mask & ~res_done]
            else:
                todo = todo[~res_done]

        for i in todo:
            st = dt = None
            a = self._shingles_by_row(rs_sig[i])
            if a is None:
                st = self._text_by_row(rs_txt[i], src_texts[i])
                a = self._shingles_fallback(int(srcs[i]), st)
            b = self._shingles_by_row(rd_sig[i])
            if b is None:
                dt = self._text_by_row(rd_txt[i], dst_texts[i])
                b = self._shingles_fallback(int(dsts[i]), dt)
            if a.size == 0 and b.size == 0:
                st = self._text_by_row(rs_txt[i], src_texts[i]) if st is None else st
                dt = self._text_by_row(rd_txt[i], dst_texts[i]) if dt is None else dt
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
                st = self._text_by_row(rs_txt[i], src_texts[i]) if st is None else st
                dt = self._text_by_row(rd_txt[i], dst_texts[i]) if dt is None else dt
                la = min(len(st), _EDIT_PREFIX_CAP)
                lb = min(len(dt), _EDIT_PREFIX_CAP)
                if la + lb and 2.0 * min(la, lb) / (la + lb) >= cfg.edit_accept_threshold:
                    edit[i] = indel_ratio(st[:_EDIT_PREFIX_CAP], dt[:_EDIT_PREFIX_CAP])
        _lap("perpair_loop")

        out = pa.table(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "channel": batch["channel"],
                "jaccard": pa.array(jac, pa.float64()),
                "edit_sim": pa.array(edit, pa.float64()),
            }
        )
        if self.emit_gate_sentinels and gate_skips:
            sentinel = pa.table(
                {
                    "src": pa.array([0], pa.uint64()),
                    "dst": pa.array([0], pa.uint64()),
                    "channel": pa.array([GATE_CODE], pa.int8()),
                    "jaccard": pa.array([-1.0], pa.float64()),
                    "edit_sim": pa.array([float(gate_skips)], pa.float64()),
                }
            )
            out = pa.concat_tables([out.cast(sentinel.schema), sentinel])
        return out


def verify_pairs(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    *,
    attach: str = "auto",
    doc_count: int | None = None,
    sigs: ray.data.Dataset | None = None,
    metrics: dict | None = None,
    prebuilt_store: dict | None = None,
) -> ray.data.Dataset:
    """Score candidate pairs; emit edges with ``score >= threshold``.

    ``attach='broadcast'`` ships the doc store once per node via the
    object store; ``'shuffle'`` re-attaches text through two bucketed
    join passes (the >2M-docs path — verifiers then recompute shingle
    sets from the attached text per pair batch).  ``'auto'`` broadcasts
    below 2M docs.  ``sigs`` is the pre-computed MinHash signature
    dataset (verifiers fall back to a per-actor signature cache without
    it).  When a ``metrics`` dict is passed, the returned edge set is
    materialized and ``metrics['gate_skipped_pairs']`` records exactly
    how many pairs the signature-estimate gate culled (observability
    for the documented gate semantics)."""
    if attach == "auto":
        n = doc_count if doc_count is not None else docs.count()
        attach = "broadcast" if n <= 2_000_000 else "shuffle"

    import time as _time

    detail: dict = {}
    if metrics is not None:
        metrics["verify_detail"] = detail
    _t0 = _time.perf_counter()

    # materialize before counting: lazy callers would otherwise execute
    # the whole candidate-generation lineage once for the count and
    # again for the verification pass.  Callers that already hold a
    # materialized pair set (the flagship) skip the barrier entirely.
    from ray.data.dataset import MaterializedDataset

    if not isinstance(pairs, MaterializedDataset):
        from fuzzy_matching_ray.state import execmeter

        execmeter.record("verify_pairs_mat")
        pairs = pairs.materialize()
    n_pairs = pairs.count()
    detail["pairs_mat_s"] = round(_time.perf_counter() - _t0, 2)
    _t0 = _time.perf_counter()

    store_ref = None
    if attach == "broadcast":
        fb: dict = {}
        if prebuilt_store is not None:
            # build was launched before the pair shuffle (overlapped);
            # this only blocks on the probe
            store_ref = finish_store_build(prebuilt_store, docs, cfg, sigs, fb)
        else:
            pairs, store_ref = attach_texts_broadcast(
                pairs, docs, cfg, sigs=sigs, fallbacks=fb
            )
        if fb and metrics is not None:
            # any nonzero count here means the parallel store build
            # partially degraded to driver-side work — a real slowdown
            # that must be visible, not silent
            metrics["pack_fallbacks"] = fb
    else:
        pairs = attach_texts_shuffle(pairs, docs, cfg.num_partitions)
    detail["attach_s"] = round(_time.perf_counter() - _t0, 2)

    # fixed-size pool sized to the cluster and the data volume (an
    # autoscaling pool ramps from one actor and leaves the stage
    # single-threaded for most of its life; ~100k pairs/s per actor
    # means a pool beyond n_pairs/100k starts actors that never pay
    # for their 1-2s startup)
    from fuzzy_matching_ray.stages.grouped import sized_pool

    pool = sized_pool(cfg.verify_concurrency, n_pairs, 100_000)
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
    emit_gate = metrics is not None and cfg.sig_est_gate > 0
    if cfg.verify_executor == "tasks":
        # stateless tasks + per-worker verifier cache (the signature
        # stage's pattern): tasks land on ALREADY-WARM Ray workers, so
        # the stage skips the actor pool's process-spawn ramp — a
        # CPU-count-independent cost the scaling measurement pays at
        # both parallelism levels.  State (store ray.get is zero-copy,
        # sigs8 view, kernels) builds once per worker process.
        cfg_h = cfg.config_hash()

        def _score(batch: pa.Table) -> pa.Table:
            return _worker_verifier(cfg_h, cfg, store_ref, emit_gate)(batch)

        scored = pairs.map_batches(
            _score,
            batch_format="pyarrow",
            batch_size=cfg.verify_batch_size,
            num_cpus=1,
        )
    else:
        scored = pairs.map_batches(
            VerifierPool,
            fn_constructor_args=(cfg, store_ref, emit_gate),
            batch_format="pyarrow",
            batch_size=cfg.verify_batch_size,
            concurrency=pool,
            num_cpus=1,
        )

    thr = cfg.jaccard_threshold
    edit_thr = cfg.edit_accept_threshold
    # capture the DRIVER's channel registry: user-registered channels
    # mutate it here, but worker processes import a fresh copy
    from fuzzy_matching_ray.stages.minhash import CHANNEL_CODES

    channel_names = dict(CHANNEL_CODES)

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater_equal(batch["jaccard"], thr)
        if edit_thr > 0:
            mask = pc.or_(mask, pc.greater_equal(batch["edit_sim"], edit_thr))
        if emit_gate:
            mask = pc.or_(mask, pc.equal(batch["channel"], GATE_CODE))
        out = batch.filter(mask)
        score = pc.max_element_wise(out["jaccard"], out["edit_sim"])
        # codes → names here, on the post-filter (small) edge set only
        from fuzzy_matching_ray.stages.minhash import decode_channels

        chan = out["channel"]
        if isinstance(chan, pa.ChunkedArray):
            chan = chan.combine_chunks()
        names = decode_channels(chan.to_numpy(zero_copy_only=False), channel_names)
        return pa.table(
            {
                "src": out["src"],
                "dst": out["dst"],
                "score": score,
                "channel": pa.array(names, pa.string()),
            }
        )

    edges = scored.map_batches(_filter, batch_format="pyarrow")
    if not emit_gate:
        return edges
    # split the metric sentinels off the (small, materialized) edge
    # set; the sentinel sum runs as per-block Ray tasks over the
    # materialized blocks — not another Dataset execution
    from fuzzy_matching_ray.state import execmeter

    _t0 = _time.perf_counter()
    execmeter.record("verify_score")
    edges = edges.materialize()
    detail["score_s"] = round(_time.perf_counter() - _t0, 2)
    from fuzzy_matching_ray.stages.blocks import sum_where

    try:
        metrics["gate_skipped_pairs"] = sum_where(edges, "score", "channel", GATE_CHANNEL)
    except Exception as exc:
        print(f"[verify] block-level gate sum failed ({exc!r}); dataset fallback")
        execmeter.record("gate_sum_fallback")
        total = 0
        gated = edges.filter(expr=f"channel == '{GATE_CHANNEL}'").select_columns(["score"])
        for b in gated.iter_batches(batch_size=65536, batch_format="pyarrow"):
            s = pa.compute.sum(b["score"]).as_py()
            total += int(s or 0)
        metrics["gate_skipped_pairs"] = total
    return edges.filter(expr=f"channel != '{GATE_CHANNEL}'")
