"""Content-filtering operators for training-data curation: PII
redaction, benchmark decontamination, and repetition statistics
(Gopher-style quality signals).

No reference equivalent — built to the brief's training-data-pipeline
mandate, alongside the dedup family.  All three are stateless
vectorized ``map_batches`` stages; decontamination broadcasts its
(small) benchmark n-gram set once via ``ray.put`` and probes it with
``np.searchsorted`` per batch — the GPT-3/Llama decontamination
shape: the benchmark side is bounded (millions of grams), the corpus
side streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# --- PII redaction ---------------------------------------------------------

# Applied IN ORDER; each is RE2-compatible (pyarrow) AND DuckDB-
# compatible so the SQL oracle can mirror the exact semantics.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
)


def redact_pii(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> ray.data.Dataset:
    """Replace PII spans with typed placeholders, entirely in Arrow
    regex kernels (RE2): zero Python per row.  Output columns:
    ``(id, text_redacted, n_<name> ... )`` where the counts are
    matches found in the ORIGINAL text per category — the audit
    metric a curation run reports."""

    def _redact(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch[id_col]}
        counts = {
            name: pc.count_substring_regex(text, pat).cast(pa.int64())
            for name, pat, _ in patterns
        }
        red = text
        for _, pat, repl in patterns:
            red = pc.replace_substring_regex(red, pat, repl)
        cols["text_redacted"] = red
        for name, _, _ in patterns:
            cols[f"n_{name}"] = counts[name]
        return pa.table(cols)

    return ds.map_batches(_redact, batch_format="pyarrow")


# --- benchmark decontamination ---------------------------------------------

_POLY = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for window combine


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def _doc_gram_hashes(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ordinal, gram_hash) for every word n-gram of every doc,
    fully vectorized: one ``pd.util.hash_array`` pass over the
    exploded token array, then an n-wide polynomial window combine.
    Docs with fewer than ``n`` words emit no grams (mirrors the SQL
    oracle's ``len(w) >= n`` guard).  Gram equality is decided by the
    64-bit combined hash — at 10⁹ distinct grams the expected
    collision count is n²/2⁶⁵ ≈ 0.03 (standard for decontamination
    at scale; the SQL oracle compares gram STRINGS, so a collision
    would surface as a driver hash mismatch — none at test scales)."""
    tokens = texts.str.lower().str.split()
    lens = tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    flat = tokens.explode().dropna()
    doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    th = pd.util.hash_array(flat.to_numpy(dtype=object)).astype(np.uint64)
    m = th.size - n + 1
    if m <= 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            acc = acc * _POLY + th[j : j + m]
    # a window is a real gram only when it lies inside ONE doc
    valid = doc_of[: m] == doc_of[n - 1 :]
    return doc_of[:m][valid], _splitmix64(acc[valid])


def decontaminate(
    ds: ray.data.Dataset,
    bench_ds: ray.data.Dataset,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Flag corpus documents sharing any word ``n``-gram with the
    benchmark set: ``(doc_id, n_contaminated)`` with the count of
    DISTINCT contaminated grams per doc, contaminated docs only.

    The benchmark side is gathered to one sorted uint64 hash array
    and broadcast (``ray.put``) — 8 bytes per distinct bench gram, so
    even a 10⁸-gram benchmark union is an 800 MB shared read-only
    block, read zero-copy by every probe task.  The corpus side
    streams; the probe is a vectorized ``searchsorted``."""

    def _bench_grams(batch: pa.Table) -> pa.Table:
        _, h = _doc_gram_hashes(batch[text_col].to_pandas(), n)
        return pa.table({"g": pa.array(np.unique(h), pa.uint64())})

    # reduce the per-batch unique sets in ONE remote task whose return
    # value IS the broadcast object — the driver only ever holds the
    # ref, never the (possibly hundreds-of-MB) sorted hash array
    from fuzzy_matching_ray.stages.blocks import sorted_unique_broadcast

    bench_ref = sorted_unique_broadcast(
        bench_ds.map_batches(_bench_grams, batch_format="pyarrow"), "g"
    )

    def _probe(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        empty = pa.table(  # preserve the input id type (int or string)
            {id_col: pa.array([], batch[id_col].type), "n_contaminated": pa.array([], pa.int64())}
        )
        if bset.size == 0:
            return empty
        from fuzzy_matching_ray.hashing import sorted_member

        doc_ord, h = _doc_gram_hashes(batch[text_col].to_pandas(), n)
        hit = sorted_member(bset, h)
        if not hit.any():
            return empty
        # distinct (doc, gram) hits, then count per doc
        pairs = np.stack([doc_ord[hit].astype(np.uint64), h[hit]], axis=1)
        uniq = np.unique(pairs, axis=0)
        docs, counts = np.unique(uniq[:, 0].astype(np.int64), return_counts=True)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids.take(pa.array(docs, pa.int64())),
                "n_contaminated": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_probe, batch_format="pyarrow")


def gram_novelty(
    ds: ray.data.Dataset,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Duplication *attribution*: of each document's DISTINCT word
    ``n``-grams, how many already occur in an earlier document
    (smaller id)?  ``(doc_id, n_grams, n_dup_grams)`` — the novelty
    signal dedup dashboards report (a doc whose grams are mostly old
    is boilerplate even when no single pair crosses the near-dup bar).

    Scale shape: the corpus never re-reads — batches emit distinct
    ``(doc_id, gram_hash)`` pairs (16 bytes/row), the first bucketed
    shuffle groups by gram hash to find each gram's min doc id and
    fold per-doc partial counts, the second sums partials per doc.
    Earlier-than semantics follow the id order (numeric for integer
    ids, lexicographic for strings — matching SQL ``min`` on either
    type), so the operator is deterministic and the SQL oracle
    (string grams + ``min(doc_id)`` window) hashes identically absent
    64-bit gram collisions (see ``_doc_gram_hashes``)."""

    def _pairs(batch: pa.Table) -> pa.Table:
        id_arr = batch[id_col]
        is_int = pa.types.is_integer(id_arr.type)
        doc_ord, h = _doc_gram_hashes(batch[text_col].to_pandas(), n)
        empty_id = pa.array([], pa.int64() if is_int else pa.string())
        if h.size == 0:
            return pa.table({"d": empty_id, "g": pa.array([], pa.uint64())})
        if is_int:
            ids = id_arr.to_numpy(zero_copy_only=False).astype(np.int64)
            pairs = np.unique(
                np.stack([ids[doc_ord].astype(np.uint64), h], axis=1), axis=0
            )
            d_out = pa.array(pairs[:, 0].astype(np.int64), pa.int64())
            g_out = pa.array(pairs[:, 1], pa.uint64())
        else:  # string ids: dedup via pandas, keep ids as objects
            ids = np.asarray(id_arr.to_pylist(), dtype=object)
            dd = pd.DataFrame({"d": ids[doc_ord], "g": h}).drop_duplicates()
            d_out = pa.array(dd["d"].to_numpy(dtype=object), pa.string())
            g_out = pa.array(dd["g"].to_numpy(np.uint64), pa.uint64())
        return pa.table({"d": d_out, "g": g_out})

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")

    def _per_gram(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby("g", sort=False)["d"].transform("min")
        dup = (df["d"] > first).to_numpy().astype(np.int64)
        out = (
            pd.DataFrame({"d": df["d"].to_numpy(), "dup": dup})
            .groupby("d", sort=False)["dup"]
            .agg(n_grams="size", n_dup_grams="sum")
            .reset_index()
        )
        return out

    partial = bucketed_group_apply(pairs, "g", _per_gram, num_partitions)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", sort=True)[["n_grams", "n_dup_grams"]].sum()
        return pd.DataFrame(
            {
                id_col: g.index.to_numpy(),  # id dtype preserved (int or str)
                "n_grams": g["n_grams"].to_numpy(np.int64),
                "n_dup_grams": g["n_dup_grams"].to_numpy(np.int64),
            }
        )

    return bucketed_group_apply(partial, "d", _final, num_partitions)


# --- repetition statistics (Gopher-style) ----------------------------------


def repetition_stats(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-document repetition signals used by Gopher/MassiveText-style
    quality filters: word count, distinct-word count, and the most
    frequent word bigram with its count (ties broken by lexicographic
    min — deterministic and SQL-mirrorable).  All counts are integers
    so the oracle hash is float-free.  Docs with <2 words report
    ``('', 0)`` for the bigram."""

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        tokens = texts.str.lower().str.split()
        lens = tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
        k = len(texts)
        doc_of = np.repeat(np.arange(k, dtype=np.int64), lens)
        flat = tokens.explode().dropna().to_numpy(dtype=object)

        n_distinct = np.zeros(k, dtype=np.int64)
        if flat.size:
            dd = pd.DataFrame({"d": doc_of, "t": flat}).drop_duplicates()
            vc = dd.groupby("d", sort=False).size()
            n_distinct[vc.index.to_numpy()] = vc.to_numpy()

        top_gram = np.full(k, "", dtype=object)
        top_count = np.zeros(k, dtype=np.int64)
        if flat.size >= 2:
            same = doc_of[:-1] == doc_of[1:]
            if same.any():
                grams = (
                    flat[:-1][same].astype(object) + " " + flat[1:][same].astype(object)
                )
                gc = (
                    pd.DataFrame({"d": doc_of[:-1][same], "g": grams})
                    .groupby(["d", "g"], sort=False)
                    .size()
                    .reset_index(name="c")
                    .sort_values(["d", "c", "g"], ascending=[True, False, True])
                    .drop_duplicates("d")
                )
                top_gram[gc["d"].to_numpy()] = gc["g"].to_numpy()
                top_count[gc["d"].to_numpy()] = gc["c"].to_numpy()

        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(lens, pa.int64()),
                "n_distinct_words": pa.array(n_distinct, pa.int64()),
                "top_bigram": pa.array(top_gram, pa.string()),
                "top_bigram_count": pa.array(top_count, pa.int64()),
            }
        )

    return ds.map_batches(_stats, batch_format="pyarrow")
