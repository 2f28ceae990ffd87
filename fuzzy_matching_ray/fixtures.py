"""Deterministic parquet fixtures + golden files for the driver's
correctness harness.

The driver compares each ``queries()`` entry against ``oracle_sql()``
at sf=0.01.  Three query families need *file-backed* fixtures so a
DuckDB oracle can see the same inputs / expected outputs:

* person record-matching (``record_match_persons``) — the greedy 1:1
  matcher is deterministic under ``sort_before_match`` but not
  SQL-expressible, so the oracle is a **frozen golden file**: the
  serial ``ReferenceMatcher`` (the reference-semantics parity
  implementation, ``pipelines/record_match.py``) is run over the
  parquet fixture at fixture-write time and its matches are written
  next to it; the driver's DuckDB oracle just reads them.  The check
  is real: distributed blocking/shuffle vs single-process execution.

* dataset transliteration (``transliterate_persons``) — same pattern
  (serial reference-path golden vs the distributed ``map_batches``
  path).

* transcripts (``assemble_docs``) — the synthetic transcript cache is
  written where DuckDB can ``read_parquet`` it, so assembly gets a
  true SQL oracle (per-conversation count/sum over the turn table).

Everything is deterministic from the seed (numpy PCG64; FIXTURES.md),
so it does not matter whether the Ray query or the SQL oracle runs
first — both see byte-identical files.  ``ensure_*`` helpers are
idempotent (marker files) and never touch Ray.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/fmr_cache"

# per-sf fixture sizes (must match __ray_entry__._q_record_match)
PERSON_N = {"sf0.001": 100, "sf0.01": 400, "sf0.1": 1500}
TRANSLIT_N = 200  # sf-independent (mirrors the reference demo size)


def _match_config():
    from fuzzy_matching_ray.config import MatchConfig, MatchFieldConfig

    return MatchConfig(
        fields=(
            MatchFieldConfig("last_name", 0.4),
            MatchFieldConfig("first_name", 0.3),
            MatchFieldConfig("middle_name", 0.2),
            MatchFieldConfig("email", 0.1),
        ),
        threshold=0.7,
        block_field="last_name",
        sort_before_match=True,
    )


def person_fixture_dir(sf: str) -> str:
    return os.path.join(CACHE_ROOT, f"persons_{sf}")


def translit_fixture_dir() -> str:
    return os.path.join(CACHE_ROOT, "persons_translit")


def ensure_person_fixtures(sf: str) -> dict[str, str]:
    """Write originals/variants parquet + the serial-matcher golden for
    one scale factor.  Returns the file paths."""
    from fuzzy_matching_ray.datagen import (
        PersonGenConfig,
        generate_person_records,
        person_records_table,
    )
    from fuzzy_matching_ray.pipelines.record_match import (
        ReferenceMatcher,
        _flatten_matches,
    )

    n = PERSON_N.get(sf, 100)
    out_dir = person_fixture_dir(sf)
    paths = {
        "originals": os.path.join(out_dir, "originals.parquet"),
        "variants": os.path.join(out_dir, "variants.parquet"),
        "match_golden": os.path.join(out_dir, "match_golden.parquet"),
    }
    marker = os.path.join(out_dir, f"_done_{n}_g2")  # g2: gender-paired generator
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    orig, var = generate_person_records(PersonGenConfig(n_records=n, language="mixed"))
    pq.write_table(person_records_table(orig), paths["originals"])
    pq.write_table(person_records_table(var), paths["variants"])

    matcher = ReferenceMatcher(_match_config())
    matches, _ = matcher.match_and_consolidate(orig, var)
    fields = list(orig[0].keys())
    golden = _flatten_matches(matches, fields)
    pq.write_table(
        pa.Table.from_pandas(golden, preserve_index=False).replace_schema_metadata(None),
        paths["match_golden"],
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def _serial_doc_texts(sf: str, n_convs: int, seed: int, cfg) -> "pd.Series":
    """Canonical per-conversation document texts, assembled serially
    (pandas sort+groupby+join — no Ray, no Arrow group_by): the common
    input of every serial golden below."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq_mod

    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts
    from fuzzy_matching_ray.functions.normalize import canonicalize_text

    turns_dir = write_transcripts(
        os.path.join(CACHE_ROOT, f"transcripts_{sf}"),
        TranscriptGenConfig(n_convs=n_convs, seed=seed),
    )
    turns = pd.concat(
        [pq_mod.read_table(f).to_pandas() for f in glob.glob(f"{turns_dir}/*.parquet")]
    )
    return (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"]
        .agg(cfg.turn_separator.join)
        .map(canonicalize_text)
    )


def _serial_pair_scorer(docs, cfg):
    """Serial replica of the verifier's acceptance semantics: exact
    shingle Jaccard, else the gray-zone capped-prefix Indel rule.
    Returns ``jac_edit(a, b) -> (jac, edit)``; acceptance is
    ``jac ≥ jaccard_threshold or edit ≥ edit_accept_threshold`` and
    the pipeline's edge score is ``max(jac, edit)``.  No LSH, no
    estimate gate, no budgets."""
    import numpy as np

    from fuzzy_matching_ray.functions.similarity import indel_ratio
    from fuzzy_matching_ray.hashing import char_shingle_hashes

    sh = {c: char_shingle_hashes(docs[c], cfg.shingle_k) for c in docs.index}

    def jac_edit(a: str, b: str) -> tuple[float, float]:
        A, B = sh[a], sh[b]
        if A.size == 0 and B.size == 0:
            return (1.0 if docs[a] == docs[b] else 0.0), 0.0
        lo, hi = (A, B) if A.size <= B.size else (B, A)
        # size prefilter: jac ≥ edit_gate_low needs min/max ≥ that
        # ratio, and below edit_gate_low the edit kernel never runs,
        # so such pairs can never reach any accept threshold
        if hi.size and lo.size < cfg.edit_gate_low * hi.size:
            return 0.0, 0.0
        idx = np.searchsorted(hi, lo)
        idx[idx == hi.size] = hi.size - 1
        inter = int(np.count_nonzero(hi[idx] == lo))
        union = A.size + B.size - inter
        jac = inter / union if union else 0.0
        edit = 0.0
        if cfg.edit_gate_low <= jac < cfg.jaccard_threshold:
            sa, sb = docs[a][:2048], docs[b][:2048]
            la, lb = len(sa), len(sb)
            if la + lb and 2.0 * min(la, lb) / (la + lb) >= cfg.edit_accept_threshold:
                edit = indel_ratio(sa, sb)
        return jac, edit

    return jac_edit


def _exact_groups(docs):
    """Exact-dup star structure over canonical texts: per identical
    text keep min conv_id as representative, link the rest.  Returns
    (sorted representative ids, [(rep, dup), ...] star edges)."""
    from collections import defaultdict

    groups: dict[str, list[str]] = defaultdict(list)
    for c in sorted(docs.index):
        groups[docs[c]].append(c)
    reps = []
    star = []
    for members in groups.values():
        reps.append(members[0])
        star.extend((members[0], m) for m in members[1:])
    return sorted(reps), star


def _components_min_label(ids, edge_pairs):
    """Union-find with min-id labels (same contract as
    ``stages/union_find``)."""
    parent = {c: c for c in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            l, h = sorted((ra, rb))
            parent[h] = l
    return {c: find(c) for c in ids}


def ensure_flagship_golden(sf: str, n_convs: int, seed: int = 42) -> dict[str, str]:
    """Brute-force ALL-PAIRS golden for the flagship dedup pipeline.

    A serial implementation with NO LSH, NO estimate gate and NO
    bucket budgets: every doc pair is scored with the same acceptance
    semantics (exact shingle Jaccard ≥ threshold, else the gray-zone
    capped-prefix Indel rule), then union-find with min-conv_id labels.
    The pipeline's candidate machinery must therefore find every
    accepted pair for the clusters to hash-match — a genuinely
    independent check of the LSH/gate/budget stack (the scalar kernels
    are shared; the orchestration is not).  Deterministic from the
    seed; cached under a config-fingerprint marker."""
    import itertools

    import pandas as pd

    from fuzzy_matching_ray.config import PipelineConfig

    cfg = PipelineConfig()
    out_dir = os.path.join(CACHE_ROOT, f"flagship_golden_{sf}")
    paths = {
        "clusters": os.path.join(out_dir, "clusters.parquet"),
        "reps": os.path.join(out_dir, "reps.parquet"),
    }
    fp = (
        f"{n_convs}_{seed}_{cfg.shingle_k}_{cfg.jaccard_threshold}"
        f"_{cfg.edit_gate_low}_{cfg.edit_accept_threshold}"
    )
    marker = os.path.join(out_dir, f"_done_{fp}")
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    docs = _serial_doc_texts(sf, n_convs, seed, cfg)
    ids = sorted(docs.index)
    jac_edit = _serial_pair_scorer(docs, cfg)

    def _accepted(a: str, b: str) -> bool:
        j, e = jac_edit(a, b)
        return j >= cfg.jaccard_threshold or e >= cfg.edit_accept_threshold

    edge_pairs = (
        (a, b) for a, b in itertools.combinations(ids, 2) if _accepted(a, b)
    )
    label = _components_min_label(ids, edge_pairs)
    clusters = pd.DataFrame({"conv_id": ids, "cluster_id": [label[c] for c in ids]})
    csize = clusters.groupby("cluster_id")["conv_id"].size()
    reps = pd.DataFrame(
        {
            "conv_id": csize.index,
            "cluster_id": csize.index,
            "cluster_size": csize.to_numpy().astype("int32"),
        }
    ).reset_index(drop=True)
    pq.write_table(
        pa.Table.from_pandas(clusters, preserve_index=False).replace_schema_metadata(None),
        paths["clusters"],
    )
    pq.write_table(
        pa.Table.from_pandas(reps, preserve_index=False).replace_schema_metadata(None),
        paths["reps"],
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def ensure_translit_fixtures() -> dict[str, str]:
    """Russian person records + the serial reference-path
    transliteration golden (target_lang='en', Passport standard)."""
    from fuzzy_matching_ray.datagen import (
        PersonGenConfig,
        generate_person_records,
        person_records_table,
    )
    from fuzzy_matching_ray.pipelines.record_match import ReferenceMatcher

    out_dir = translit_fixture_dir()
    paths = {
        "originals": os.path.join(out_dir, "originals_ru.parquet"),
        "translit_golden": os.path.join(out_dir, "translit_golden.parquet"),
    }
    marker = os.path.join(out_dir, f"_done_{TRANSLIT_N}_g2")  # g2: gender-paired generator
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    orig, _ = generate_person_records(PersonGenConfig(n_records=TRANSLIT_N, language="ru"))
    pq.write_table(person_records_table(orig), paths["originals"])

    matcher = ReferenceMatcher(_match_config())
    golden = matcher.transliterate_data(
        orig, "en", ["last_name", "first_name", "middle_name"]
    )
    pq.write_table(person_records_table(golden), paths["translit_golden"])
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def ensure_simhash_golden(sf: str, n_convs: int, seed: int = 42) -> dict[str, str]:
    """Serial golden for the SimHash-channel clusters.

    Independent scalar SimHash (per-token per-bit counters — not the
    pipeline's vectorized unpackbits kernel, ``stages/simhash.py:43``)
    over the exact-dedup representatives, band-chunk bucketing with the
    same hot-bucket budget semantics (``minhash._bucket_pairs`` is
    reused for budget parity), then the same serial acceptance rule and
    min-conv_id union-find as the flagship golden.  This checks the
    whole distributed SimHash channel — signatures, banding shuffle,
    budgets, verify, clustering — against a single-process rebuild."""
    import hashlib

    import numpy as np
    import pandas as pd

    from fuzzy_matching_ray.config import PipelineConfig

    cfg = PipelineConfig()
    out_dir = os.path.join(CACHE_ROOT, f"simhash_golden_{sf}")
    paths = {"clusters": os.path.join(out_dir, "clusters.parquet")}
    fp = (
        f"{n_convs}_{seed}_{cfg.simhash_bits}_{cfg.simhash_bands}"
        f"_{cfg.max_band_bucket}_{cfg.jaccard_threshold}_{cfg.edit_accept_threshold}"
    )
    marker = os.path.join(out_dir, f"_done_{fp}")
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    docs = _serial_doc_texts(sf, n_convs, seed, cfg)
    ids = sorted(docs.index)
    reps, star = _exact_groups(docs)

    def _simhash(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        counts = [0] * cfg.simhash_bits
        from collections import Counter

        for tok, mult in Counter(toks).items():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )
            for b in range(cfg.simhash_bits):
                counts[b] += mult if (h >> b) & 1 else -mult
        return sum(1 << b for b in range(cfg.simhash_bits) if counts[b] > 0)

    width = cfg.simhash_bits // cfg.simhash_bands
    mask = (1 << width) - 1
    sims = {c: _simhash(docs[c]) for c in reps}
    buckets: dict[tuple[int, int], list[str]] = {}
    for c in reps:
        for i in range(cfg.simhash_bands):
            buckets.setdefault((i, (sims[c] >> (i * width)) & mask), []).append(c)

    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.stages.minhash import _bucket_pairs, channel_code

    nids = nid_of(reps)
    by_nid = dict(zip(nids.tolist(), reps))
    rep_nid = dict(zip(reps, nids.tolist()))
    candidates: set[tuple[str, str]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len(members) <= cfg.max_band_bucket:
            ms = sorted(members)
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    candidates.add((ms[x], ms[y]))
            continue
        # hot band: reuse the salted/budgeted emission so candidate
        # coverage matches the pipeline exactly
        frame, _dropped = _bucket_pairs(
            np.asarray([rep_nid[m] for m in members], dtype=np.uint64),
            cfg.max_band_bucket,
            channel_code("simhash"),  # int8 code (a string here raises)
            cfg.max_pairs_per_bucket,
        )
        for s, d in zip(frame["src"], frame["dst"]):
            ca, cb = by_nid[int(s)], by_nid[int(d)]
            candidates.add(tuple(sorted((ca, cb))))

    jac_edit = _serial_pair_scorer(docs, cfg)
    edge_pairs = list(star)
    for a, b in sorted(candidates):
        j, e = jac_edit(a, b)
        if j >= cfg.jaccard_threshold or e >= cfg.edit_accept_threshold:
            edge_pairs.append((a, b))
    label = _components_min_label(ids, edge_pairs)
    clusters = pd.DataFrame({"conv_id": ids, "cluster_id": [label[c] for c in ids]})
    pq.write_table(
        pa.Table.from_pandas(clusters, preserve_index=False).replace_schema_metadata(None),
        paths["clusters"],
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def ensure_substring_golden(
    sf: str, n_convs: int, seed: int = 42, num_partitions: int = 32
) -> dict[str, str]:
    """Serial golden for the two-channel (minhash+substring) edge set.

    Edges are ALL accepted pairs among exact-dedup representatives
    (all-pairs scan — the LSH machinery must find every one) plus the
    exact-dup star edges; the surviving channel tag follows the pair-
    dedup priority (exact > substring > minhash), where a pair is
    substring-tagged iff the bucket-local suffix-array pass finds it
    under the SAME conv_id-hash bucketing the pipeline uses (the
    bucket-local partitioning assumption is part of the documented
    semantics, so the golden replicates it with ``num_partitions``
    pinned — the query pins the same value)."""
    import numpy as np
    import pandas as pd

    from fuzzy_matching_ray.config import PipelineConfig

    cfg = PipelineConfig(num_partitions=num_partitions)
    out_dir = os.path.join(CACHE_ROOT, f"substring_golden_{sf}")
    paths = {"edges": os.path.join(out_dir, "edges.parquet")}
    fp = (
        f"{n_convs}_{seed}_{cfg.min_substring_len}_{num_partitions}"
        f"_{cfg.jaccard_threshold}_{cfg.edit_accept_threshold}"
    )
    marker = os.path.join(out_dir, f"_done_{fp}")
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    docs = _serial_doc_texts(sf, n_convs, seed, cfg)
    reps, star = _exact_groups(docs)

    # bucket-local substring candidates under the pipeline's own
    # string-hash bucketing (stages/grouped._bucket_of_column)
    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.stages.minhash import CHANNEL_CODES, SKEW_CHANNEL
    from fuzzy_matching_ray.stages.suffix_array import _substring_pairs_bucket

    nids = nid_of(reps)
    by_nid = dict(zip(nids.tolist(), reps))
    bucket = (
        pd.util.hash_array(np.asarray(reps, dtype=object))
        % np.uint64(num_partitions)
    ).astype(np.int64)
    substr: set[tuple[str, str]] = set()
    for p in range(num_partitions):
        members = [reps[i] for i in np.flatnonzero(bucket == p)]
        if len(members) < 2:
            continue
        frame = _substring_pairs_bucket(
            members,
            [docs[c] for c in members],
            cfg.min_substring_len,
            cfg.max_pairs_per_bucket,
        )
        live = frame[frame["channel"] != CHANNEL_CODES[SKEW_CHANNEL]]
        for s, d in zip(live["src"], live["dst"]):
            substr.add(tuple(sorted((by_nid[int(s)], by_nid[int(d)]))))

    import itertools

    jac_edit = _serial_pair_scorer(docs, cfg)
    rows = [
        {"src": a, "dst": b, "score": 1.0, "channel": "exact"} for a, b in star
    ]
    for a, b in itertools.combinations(sorted(reps), 2):
        j, e = jac_edit(a, b)
        if j >= cfg.jaccard_threshold or e >= cfg.edit_accept_threshold:
            rows.append(
                {
                    "src": a,
                    "dst": b,
                    "score": max(j, e),
                    "channel": "substring" if (a, b) in substr else "minhash",
                }
            )
    edges = pd.DataFrame(rows, columns=["src", "dst", "score", "channel"])
    pq.write_table(
        pa.Table.from_pandas(edges, preserve_index=False).replace_schema_metadata(None),
        paths["edges"],
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def ensure_fingerprint_golden(sf_dir: str, k: int = 8, window: int = 16) -> str:
    """Frozen pure-Python winnowing golden (Schleimer et al. 2003) for
    ``fingerprint_documents``: plain int arithmetic, explicit per-window
    leftmost-min scan — no numpy, no stride tricks — over the static
    documents table.  The oracle just reads the parquet."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"fingerprint_golden_{sf}")
    out_path = os.path.join(out_dir, "fingerprints.parquet")
    marker = os.path.join(out_dir, f"_done_{k}_{window}")
    if os.path.exists(marker):
        return out_path
    os.makedirs(out_dir, exist_ok=True)

    M64 = (1 << 64) - 1
    BASE = 1099511628211  # FNV prime (hashing._POLY_BASE)

    def _smx(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & M64
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
        return (x ^ (x >> 31)) & M64

    pows = [1] * k
    for j in range(k - 2, -1, -1):
        pows[j] = (pows[j + 1] * BASE) & M64

    def _winnow(t: str) -> tuple[int, int]:
        cps = [ord(c) for c in t]
        if len(cps) < k:
            return 0, 0
        m = len(cps) - k + 1
        hashes = []
        for i in range(m):
            acc = 0
            for j in range(k):
                acc = (acc + cps[i + j] * pows[j]) & M64
            hashes.append(_smx(acc))
        if m <= window:
            best = 0
            for i in range(1, m):
                if hashes[i] < hashes[best]:
                    best = i
            sel = {best}
        else:
            sel = set()
            for w in range(m - window + 1):
                best = w
                for i in range(w + 1, w + window):
                    if hashes[i] < hashes[best]:
                        best = i
                sel.add(best)
        fps = sorted({hashes[i] for i in sel})
        return len(fps), fps[0]

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    n_fp = []
    fp_min = []
    for t in texts:
        n, mn = _winnow(t or "")
        n_fp.append(n)
        fp_min.append(mn)
    out = pa.table(
        {
            "doc_id": pa.array(ids, tbl.schema.field("doc_id").type),
            "n_fingerprints": pa.array(n_fp, pa.int64()),
            "fingerprint_min": pa.array(fp_min, pa.uint64()),
        }
    )
    pq.write_table(out, out_path)
    with open(marker, "w") as f:
        f.write("ok")
    return out_path


def ensure_ann_golden(sf_dir: str, k: int = 5) -> dict[str, str]:
    """Serial goldens for the approximate ANN queries (``knn_lsh`` /
    ``knn_ivf``), so the driver can value-hash them instead of the
    weaker rows-only check.

    Both algorithms are deterministic by construction (seeded
    hyperplanes, seeded k-means), so their output at a pinned seed IS a
    checkable contract.  The golden reuses the *driver-side* scalar
    artifacts (plane matrix / centroid trainer — tiny, non-distributed
    code both paths must share for the outputs to be comparable at
    all) but recomputes bucketing, candidate generation, similarity
    and ranking with independent per-query/per-row Python loops —
    exercising none of the distributed batched kernels
    (``extras/ann.py`` ``_candidates``/``_probe``/``grouped_topk``)."""
    import numpy as np

    from fuzzy_matching_ray.extras.ann import (
        HyperplaneLSH,
        _normalize,
        train_ivf_centroids,
    )

    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"ann_golden_{sf}")
    paths = {
        "lsh": os.path.join(out_dir, "knn_lsh.parquet"),
        "ivf": os.path.join(out_dir, "knn_ivf.parquet"),
    }
    marker = os.path.join(out_dir, f"_done_{k}")
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = [int(v) for v in tbl["vec_id"].to_pylist()]
    raw = [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    # normalize with the library's shared scalar helper so the unit
    # vectors are bit-identical to both query paths (a re-derived
    # normalization could differ in the last ulp and flip a rounded
    # tie at the k boundary)
    nmat = _normalize(np.stack(raw))
    vecs = [nmat[i] for i in range(nmat.shape[0])]
    n_rows = len(ids)
    q_n = 10  # first 10 rows in file order — mirrors _q_knn_lsh/_q_knn_ivf

    def _rank_and_take(cand: list[tuple[float, int]]) -> list[tuple[int, int]]:
        """(sim, id) candidates → [(neighbor_id, rank)] top-k by
        rounded sim DESC, id ASC (the shared total order)."""
        cand.sort(key=lambda p: (-p[0], p[1]))
        return [(nid, r + 1) for r, (_, nid) in enumerate(cand[:k])]

    # ---- LSH golden (bits=10, n_tables=6, seed=42, exclude_self) ----
    lsh = HyperplaneLSH(vecs[0].size, bits=10, n_tables=6, seed=42)
    buckets: list[set[int]] = []
    for v in vecs:
        bs = set()
        for t in range(lsh.n_tables):
            code = 0
            for j in range(lsh.bits):
                if float(lsh.planes[t, j] @ v) > 0:
                    code |= 1 << j
            bs.add(code + (t << 48))
        buckets.append(bs)
    rows = []
    for qi in range(q_n):
        cand = []
        for ci in range(n_rows):
            if ids[ci] == ids[qi]:
                continue
            if buckets[qi] & buckets[ci]:
                cand.append((round(float(vecs[qi] @ vecs[ci]), 6), ids[ci]))
        for nid, r in _rank_and_take(cand):
            rows.append((ids[qi], nid, r))
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        paths["lsh"],
    )

    # ---- IVF golden (nlists=16, nprobe=4, train_rows=2048, seed=42) ----
    # RAW sample: train_ivf_centroids normalizes internally, exactly as
    # the distributed path feeds it
    sample = np.stack(raw[: min(2048, n_rows)])
    cent = train_ivf_centroids(sample, 16, seed=42)
    nprobe = min(4, cent.shape[0])
    assign = [int(np.argmax(cent @ v)) for v in vecs]
    rows = []
    for qi in range(q_n):
        sims_c = -(cent @ vecs[qi])
        probes = set(int(x) for x in np.argsort(sims_c, kind="stable")[:nprobe])
        cand = []
        for ci in range(n_rows):
            if ids[ci] == ids[qi] or assign[ci] not in probes:
                continue
            cand.append((round(float(vecs[qi] @ vecs[ci]), 6), ids[ci]))
        for nid, r in _rank_and_take(cand):
            rows.append((ids[qi], nid, r))
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        paths["ivf"],
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def ensure_hll_golden(sf_dir: str) -> str:
    """Serial HyperLogLog golden for ``approx_ndistinct_events``: the
    sketch is deterministic given the hash function, so the estimate
    at a pinned register width IS a checkable value.  Registers are
    computed with plain integer ``bit_length`` bit-scans (an
    independent check of the vectorized float64-log2 rank kernel in
    ``extras/aggregates.py``); the estimate applies the same HLL
    formula to the identical register array."""
    import numpy as np

    from fuzzy_matching_ray.extras.aggregates import _HLL_P
    from fuzzy_matching_ray.hashing import hash64_str

    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"hll_golden_{sf}")
    out_path = os.path.join(out_dir, "ndv.parquet")
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_path
    os.makedirs(out_dir, exist_ok=True)

    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    m64 = (1 << 64) - 1
    by_key: dict[str, set[str]] = {}
    for et, uid in zip(tbl["event_type"].to_pylist(), tbl["user_id"].to_pylist()):
        by_key.setdefault(et, set()).add(str(uid))
    keys, ests = [], []
    for key in sorted(by_key):
        regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
        for v in by_key[key]:
            h = hash64_str(v)
            idx = h >> (64 - _HLL_P)
            rest = (h << _HLL_P) & m64
            rank = (64 - _HLL_P + 1) if rest == 0 else (65 - rest.bit_length())
            if rank > regs[idx]:
                regs[idx] = rank
        m = float(regs.size)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
        zeros = int(np.count_nonzero(regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        keys.append(key)
        ests.append(float(est))
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(keys, tbl.schema.field("event_type").type),
                "ndv_est": pa.array(ests, pa.float64()),
            }
        ),
        out_path,
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_path


def ensure_ddq_golden(sf_dir: str, rel_err: float = 0.01) -> str:
    """Serial golden for ``approx_quantiles_events`` (the DDSketch
    operator): per-event-type approximate p25/p50/p90 over ``value``.
    The sketch is deterministic and order-independent (log-bucket
    counts merge by addition), so its output at a pinned γ IS a
    checkable value.  This golden recomputes it with independent
    per-row Python loops and dict counters — none of the distributed
    partial-combine machinery."""
    import math

    import numpy as np

    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"ddq_golden_{sf}")
    out_path = os.path.join(out_dir, "quantiles.parquet")
    marker = os.path.join(out_dir, f"_done_{rel_err}")
    if os.path.exists(marker):
        return out_path
    os.makedirs(out_dir, exist_ok=True)

    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    gamma_log = float(np.log(gamma))
    # sign-encoding bias sized from γ so |b| can never exceed it over
    # the finite-double range (mirrors extras.aggregates._dd_bias; the
    # bias cancels out of the representatives, so any sufficient value
    # yields identical output)
    bias = int(np.ceil(745.0 / gamma_log)) + 2
    counts: dict[str, dict[int, int]] = {}
    for et, v in zip(tbl["event_type"].to_pylist(), tbl["value"].to_pylist()):
        v = float(v)
        if v > 0:
            key = int(np.ceil(np.log(v) / gamma_log)) + bias
        elif v < 0:
            key = -(int(np.ceil(np.log(-v) / gamma_log)) + bias)
        else:
            key = 0
        counts.setdefault(et, {})[key] = counts.setdefault(et, {}).get(key, 0) + 1

    def rep(key: int) -> float:
        if key == 0:
            return 0.0
        b = abs(key) - bias
        r = 2.0 * (gamma ** b) / (gamma + 1.0)
        return r if key > 0 else -r

    rows = []
    for et in sorted(counts):
        buckets = sorted(counts[et])
        n = sum(counts[et].values())
        row = {"event_type": et, "n": n}
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            rank = max(1, math.ceil(q * n))
            cum = 0
            for b in buckets:
                cum += counts[et][b]
                if cum >= rank:
                    row[name] = rep(b)
                    break
        rows.append(row)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
                "p25": pa.array([r["p25"] for r in rows], pa.float64()),
                "p50": pa.array([r["p50"] for r in rows], pa.float64()),
                "p90": pa.array([r["p90"] for r in rows], pa.float64()),
                "n": pa.array([r["n"] for r in rows], pa.int64()),
            }
        ),
        out_path,
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_path


def ensure_kmeans_golden(
    sf_dir: str, k: int = 10, iters: int = 5, threshold: float = 0.3
) -> dict[str, str]:
    """Serial goldens for ``kmeans_embeddings`` / ``semdedup_embeddings``.

    Both are bit-deterministic by construction (integer-quantized unit
    vectors, exact int64 dot products and sums — see ``extras/kmeans``
    module docstring), so the output at a pinned config IS a checkable
    contract.  The golden shares only the tiny scalar helpers both
    paths must agree on (``quantize_unit`` / ``update_centroids`` /
    ``sim_threshold_int`` — same rationale as ``ensure_ann_golden``
    sharing ``_normalize``) and recomputes assignment, partial sums
    and the pairwise dedup with independent per-row Python loops —
    exercising none of the distributed kernels (``_iter_partials`` /
    ``_sum_partials`` / ``bucketed_group_apply`` / the blockwise
    triangular matmul)."""
    import numpy as np

    from fuzzy_matching_ray.extras.kmeans import (
        quantize_unit,
        sim_threshold_int,
        update_centroids,
    )

    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"kmeans_golden_{sf}")
    paths = {
        "kmeans": os.path.join(out_dir, "kmeans.parquet"),
        "semdedup": os.path.join(out_dir, "semdedup.parquet"),
    }
    marker = os.path.join(out_dir, f"_done_{k}_{iters}_{threshold}")
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = [int(v) for v in tbl["vec_id"].to_pylist()]
    q = quantize_unit(np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]))
    n, d = q.shape

    # init: vectors of the k smallest ids (kmeans_fit contract)
    order = sorted(range(n), key=lambda i: ids[i])
    cent = np.stack([q[i] for i in order[:k]])

    def _assign_row(v: np.ndarray) -> int:
        best, best_dot = 0, None
        for j in range(cent.shape[0]):
            dot = int(sum(int(a) * int(b) for a, b in zip(v, cent[j])))
            if best_dot is None or dot > best_dot:
                best, best_dot = j, dot
        return best

    for _ in range(iters):
        counts = np.zeros(cent.shape[0], np.int64)
        sums = np.zeros_like(cent)
        for i in range(n):
            a = _assign_row(q[i])
            counts[a] += 1
            sums[a] += q[i]
        cent = update_centroids(cent, counts, sums)

    assign = [_assign_row(q[i]) for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array([int(a) for a in assign], pa.int64()),
            }
        ),
        paths["kmeans"],
    )

    # semdedup: within-cluster pairwise (lower-id wins), independent
    # per-pair integer dot loop
    thr = sim_threshold_int(threshold)
    by_id = sorted(range(n), key=lambda i: ids[i])
    keep = {}
    for i in by_id:
        dup = False
        for j in by_id:
            if ids[j] >= ids[i] or assign[j] != assign[i]:
                continue
            dot = int(sum(int(a) * int(b) for a, b in zip(q[i], q[j])))
            if dot >= thr:
                dup = True
                break
        keep[ids[i]] = not dup
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array([int(a) for a in assign], pa.int64()),
                "keep": pa.array([keep[v] for v in ids], pa.bool_()),
            }
        ),
        paths["semdedup"],
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths
