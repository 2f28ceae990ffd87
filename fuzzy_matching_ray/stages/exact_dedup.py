"""Exact-duplicate pre-pass.

``sha256(text_canon)`` per document (vectorized batch map) → bucketed
group-apply on the hash → keep the deterministic min-``conv_id``
survivor per identical text and emit ``(src, dst, score=1.0,
channel="exact")`` edges for the rest.  A cheap win before the sketch
channels: exact dups never reach MinHash.  The reference has no such
pass (SURVEY.md §2.8); ids there are assumed unique.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("score", pa.float64()),
        ("channel", pa.string()),
    ]
)


def add_text_hash(batch: pa.Table, text_col: str = "text_canon") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hashes = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("text_sha256", pa.array(hashes, pa.string()))


def _dup_edges_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """All hash-groups of one bucket at once: min conv_id per group is
    the src; every other member is a dst."""
    df = df.sort_values(["text_sha256", "conv_id"], kind="mergesort")
    grp = df.groupby("text_sha256", sort=False)["conv_id"]
    reps = grp.transform("first")
    dups = df[df["conv_id"].to_numpy() != reps.to_numpy()]
    if dups.empty:
        return pd.DataFrame(
            {
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "score": pd.Series(dtype=float),
                "channel": pd.Series(dtype=object),
            }
        )
    return pd.DataFrame(
        {
            "src": reps[dups.index].to_numpy(),
            "dst": dups["conv_id"].to_numpy(),
            "score": 1.0,
            "channel": "exact",
        }
    )


def exact_dup_edges(docs_hashed: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """Edges linking every exact duplicate to its group's min conv_id."""
    slim = docs_hashed.select_columns(["text_sha256", "conv_id"])
    return bucketed_group_apply(slim, "text_sha256", _dup_edges_bucket, num_partitions)


def drop_exact_dups(docs_hashed: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """Keep one representative per identical text (min conv_id) —
    the rest are already linked by ``exact_dup_edges`` and need not
    flow through the sketch channels.

    This is the *shuffle* formulation (full-payload hash shuffle on
    ``text_sha256``) — the beyond-broadcast-scale path.  Below
    ``BROADCAST_DROP_MAX`` duplicates the pipeline uses
    :func:`drop_exact_dups_broadcast` instead: the dup-id set from the
    (narrow) ``exact_dup_edges`` shuffle is broadcast once and the
    corpus is filtered map-only, so the document payload never rides a
    second shuffle."""

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_sha256", "conv_id"], kind="mergesort")
        return df[~df["text_sha256"].duplicated()]

    return bucketed_group_apply(docs_hashed, "text_sha256", _first, num_partitions)


# dup-id sets up to this size are shipped once via ray.put and applied
# as a map-only filter; beyond it the shuffle formulation takes over
BROADCAST_DROP_MAX = 20_000_000


def drop_exact_dups_broadcast(
    docs_hashed: ray.data.Dataset, dup_ids_ref: "ray.ObjectRef"
) -> ray.data.Dataset:
    """Map-only exact-dup filter: drop every ``conv_id`` in the
    broadcast dup-id set (the ``dst`` column of ``exact_dup_edges``).
    Lazy — fuses into whatever execution consumes it."""
    import pyarrow.compute as pc
    import ray as _ray

    def _drop(batch: pa.Table) -> pa.Table:
        ids = _ray.get(dup_ids_ref)
        mask = pc.is_in(batch["conv_id"], value_set=ids)
        return batch.filter(pc.invert(mask))

    return docs_hashed.map_batches(_drop, batch_format="pyarrow")
