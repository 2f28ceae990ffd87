"""Declarative pipeline composition: a JSON/dict spec → one lazy
Ray Data plan.

The reference drives its modes from a config object
(``core/match_config_classes.py``); the engine generalizes that to a
step registry so a curation pipeline ships as data, not code:

    {"steps": [
        {"op": "quality_filter", "min_words": 20},
        {"op": "exact_dedup"},
        {"op": "minhash_dedup"},
        {"op": "redact_pii"},
        {"op": "hash_sample", "hex_threshold": "33"},
        {"op": "shard", "n_shards": 64}
    ]}

Every step maps ``Dataset -> Dataset``, so the composed pipeline stays
ONE streaming plan wherever the underlying operators allow (filters,
redaction, sampling, sharding chain lazily; the dedup steps
materialize only what their own contracts require — e.g. the label
set for the anti-join).  Unknown ops or parameters fail at BUILD time
(before any data moves), not mid-run."""

from __future__ import annotations

import inspect
from typing import Any, Callable

import pyarrow as pa
import ray.data


def _quality_filter(ds: ray.data.Dataset, *, min_words: int = 10, text_col: str = "text") -> ray.data.Dataset:
    import pandas as pd

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").astype(str).str.split().str.len()
        return batch[toks >= min_words]

    return ds.map_batches(_f, batch_format="pandas")


def _lang_filter(ds: ray.data.Dataset, *, keep: tuple = ("en",), id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    import pandas as pd

    from fuzzy_matching_ray.extras.textstats import langid_frame

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        pred = langid_frame(batch, id_col, text_col)["lang_pred"]
        return batch[pred.isin(list(keep)).to_numpy()]

    return ds.map_batches(_f, batch_format="pandas")


def _exact_dedup(ds: ray.data.Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Keep one FULL row per identical text (survivor = min id):
    the projecting ``exact_dedup_docs`` yields only (id, text), so the
    composed step instead broadcasts the survivor-id set and filters —
    every payload column rides through."""
    from fuzzy_matching_ray.extras.doc_dedup import exact_dedup_docs

    survivors = exact_dedup_docs(ds, id_col=id_col, text_col=text_col)
    return _keep_members(ds, survivors, id_col)


def _keep_members(
    ds: ray.data.Dataset, members: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """Filter ``ds`` to rows whose id appears in ``members[id_col]``:
    broadcast sorted-nid membership probe (ids-only set, read
    zero-copy by every filter task), full rows ride through."""
    import ray

    from fuzzy_matching_ray.hashing import nid_of, sorted_member
    from fuzzy_matching_ray.stages.blocks import sorted_unique_broadcast

    def _nids(b: pa.Table) -> pa.Table:
        ids = b[id_col].cast(pa.string())
        return pa.table({"nid": pa.array(nid_of(ids.to_pylist()), pa.uint64())})

    keep_ref = sorted_unique_broadcast(
        members.select_columns([id_col]).map_batches(_nids, batch_format="pyarrow"),
        "nid",
    )

    def _keep(b: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        nids = nid_of([str(v) for v in b[id_col].to_pylist()])
        return b.filter(pa.array(sorted_member(keep, nids)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def _minhash_dedup(ds: ray.data.Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Keep only cluster representatives (min-id member per near-dup
    cluster): labels via the LSH pipeline, survivors via a broadcast
    membership probe (the label table is ids-only — far smaller than
    the corpus — and read zero-copy by every filter task)."""
    from fuzzy_matching_ray.extras.doc_dedup import minhash_dedup_docs

    labels = minhash_dedup_docs(ds, id_col=id_col, text_col=text_col)

    def _reps(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b[id_col].cast(pa.string())
        keep = ids.filter(pc.equal(ids, b["cluster_id"].cast(pa.string())))
        return pa.table({id_col: keep})

    reps = labels.map_batches(_reps, batch_format="pyarrow")
    return _keep_members(ds, reps, id_col)


def _redact_pii(ds: ray.data.Dataset, *, text_col: str = "text") -> ray.data.Dataset:
    """Composed-step variant of ``filtering.redact_pii``: redacts the
    text IN PLACE and appends audit counts — every other column rides
    through (the standalone operator projects to its audit schema)."""
    import pyarrow.compute as pc

    from fuzzy_matching_ray.extras.filtering import PII_PATTERNS

    def _r(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        counts = {
            f"n_{name}": pc.count_substring_regex(text, pat).cast(pa.int64())
            for name, pat, _ in PII_PATTERNS
        }
        red = text
        for _, pat, repl in PII_PATTERNS:
            red = pc.replace_substring_regex(red, pat, repl)
        out = batch.set_column(batch.column_names.index(text_col), text_col, red)
        for k, v in counts.items():
            out = out.append_column(k, v)
        return out

    return ds.map_batches(_r, batch_format="pyarrow")


def _hash_sample(ds: ray.data.Dataset, *, hex_threshold: str = "33", id_col: str = "doc_id") -> ray.data.Dataset:
    from fuzzy_matching_ray.extras.relational import hash_sample

    # cols=None keeps every column, resolved per batch — ds.schema()
    # here would force an extra execution of the upstream lazy plan
    return hash_sample(ds, id_col=id_col, cols=None, hex_threshold=hex_threshold)


def _shard(ds: ray.data.Dataset, *, n_shards: int = 64, id_col: str = "doc_id") -> ray.data.Dataset:
    """Attach the content-addressed shard id, keeping the payload (a
    composed pipeline writes training rows; the projecting layout with
    within-shard ranks is ``extras.packing.shard_documents``).  Pure
    map — zero shuffles."""
    import numpy as np

    from fuzzy_matching_ray.hashing import md5_first_word

    def _add(b: pa.Table) -> pa.Table:
        w = md5_first_word(b[id_col].to_pylist())
        return b.append_column(
            "shard", pa.array((w % np.uint32(n_shards)).astype(np.int64), pa.int64())
        )

    return ds.map_batches(_add, batch_format="pyarrow")


REGISTRY: dict[str, Callable[..., ray.data.Dataset]] = {
    "quality_filter": _quality_filter,
    "lang_filter": _lang_filter,
    "exact_dedup": _exact_dedup,
    "minhash_dedup": _minhash_dedup,
    "redact_pii": _redact_pii,
    "hash_sample": _hash_sample,
    "shard": _shard,
}


def build_pipeline(spec: dict[str, Any]) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """Validate a spec and return ``Dataset -> Dataset``.  Validation
    is eager (unknown op / unknown parameter / wrong shape raise
    ``ValueError`` here), execution stays lazy."""
    steps = spec.get("steps")
    if not isinstance(steps, list) or not steps:
        raise ValueError("spec['steps'] must be a non-empty list")
    plan: list[tuple[Callable[..., ray.data.Dataset], dict[str, Any]]] = []
    for i, step in enumerate(steps):
        if not isinstance(step, dict) or "op" not in step:
            raise ValueError(f"step {i}: expected a dict with an 'op' key")
        op = step["op"]
        fn = REGISTRY.get(op)
        if fn is None:
            raise ValueError(f"step {i}: unknown op {op!r} (known: {sorted(REGISTRY)})")
        params = {k: v for k, v in step.items() if k != "op"}
        allowed = {
            p.name
            for p in inspect.signature(fn).parameters.values()
            if p.kind is inspect.Parameter.KEYWORD_ONLY
        }
        bad = set(params) - allowed
        if bad:
            raise ValueError(f"step {i} ({op}): unknown params {sorted(bad)} (allowed: {sorted(allowed)})")
        # JSON has no tuples; coerce list params where the op expects them
        params = {k: tuple(v) if isinstance(v, list) else v for k, v in params.items()}
        plan.append((fn, params))

    def _run(ds: ray.data.Dataset) -> ray.data.Dataset:
        for fn, params in plan:
            ds = fn(ds, **params)
        return ds

    return _run


def run_pipeline(spec: dict[str, Any], ds: ray.data.Dataset) -> ray.data.Dataset:
    return build_pipeline(spec)(ds)
