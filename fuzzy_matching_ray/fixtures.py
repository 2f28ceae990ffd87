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
    marker = os.path.join(out_dir, f"_done_{n}")
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

    import numpy as np

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts
    from fuzzy_matching_ray.functions.normalize import canonicalize_text
    from fuzzy_matching_ray.functions.similarity import indel_ratio
    from fuzzy_matching_ray.hashing import char_shingle_hashes

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

    import glob

    import pandas as pd
    import pyarrow.parquet as pq_mod

    turns_dir = write_transcripts(
        os.path.join(CACHE_ROOT, f"transcripts_{sf}"),
        TranscriptGenConfig(n_convs=n_convs, seed=seed),
    )
    turns = pd.concat(
        [pq_mod.read_table(f).to_pandas() for f in glob.glob(f"{turns_dir}/*.parquet")]
    )
    docs = (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"]
        .agg(cfg.turn_separator.join)
        .map(canonicalize_text)
    )
    ids = sorted(docs.index)
    sh = {c: char_shingle_hashes(docs[c], cfg.shingle_k) for c in ids}
    sizes = {c: sh[c].size for c in ids}

    def accepted(a: str, b: str) -> bool:
        A, B = sh[a], sh[b]
        if A.size == 0 and B.size == 0:
            return docs[a] == docs[b]
        # size prefilter: jac ≥ edit_gate_low needs min/max ≥ that ratio
        lo, hi = (A, B) if A.size <= B.size else (B, A)
        if hi.size and lo.size < cfg.edit_gate_low * hi.size:
            return False
        idx = np.searchsorted(hi, lo)
        idx[idx == hi.size] = hi.size - 1
        inter = int(np.count_nonzero(hi[idx] == lo))
        union = A.size + B.size - inter
        jac = inter / union if union else 0.0
        if jac >= cfg.jaccard_threshold:
            return True
        if cfg.edit_gate_low <= jac < cfg.jaccard_threshold:
            sa, sb = docs[a][:2048], docs[b][:2048]
            la, lb = len(sa), len(sb)
            if la + lb and 2.0 * min(la, lb) / (la + lb) >= cfg.edit_accept_threshold:
                return indel_ratio(sa, sb) >= cfg.edit_accept_threshold
        return False

    parent = {c: c for c in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        if accepted(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                l, h = sorted((ra, rb))
                parent[h] = l
    labels = [find(c) for c in ids]
    clusters = pd.DataFrame({"conv_id": ids, "cluster_id": labels})
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
    marker = os.path.join(out_dir, f"_done_{TRANSLIT_N}")
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
