"""Micro-bench: TF-IDF document-frequency state vs vocabulary size
(VERDICT round-3 item #2 'Done' criterion).

The broadcast path holds the WHOLE (terms, df) vocabulary on every
worker; the bucketed path holds one term-hash bucket (vocab / P) per
task.  This bench builds corpora whose distinct vocabulary grows 10×,
runs both modes, and reports for each: wall time, distinct terms, the
per-worker broadcast payload bytes, and the bucketed path's LARGEST
bucket (rows + bytes) — the bucketed numbers must grow ~vocab/P while
the broadcast payload grows ~vocab.

Usage: python tools/bench_tfidf_scale.py [n_docs_base]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

PARTITIONS = 32


def _make_docs(n_docs: int, vocab_size: int, seed: int) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    # zipf-ish: half the tokens from a common head, half unique-ish tail
    head = np.array([f"h{i:06d}" for i in range(min(vocab_size // 10 + 1, 5000))])
    texts = []
    for i in range(n_docs):
        n_tok = int(rng.integers(20, 60))
        h = rng.choice(head, size=n_tok // 2)
        t = [f"t{int(x):08d}" for x in rng.integers(0, vocab_size, size=n_tok - n_tok // 2)]
        texts.append(" ".join(np.concatenate([h, t]).tolist()))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _df_stats(tbl: pa.Table) -> dict:
    """Ground truth about the vocabulary and its bucket spread."""
    toks = (
        pd.Series(tbl["text"].to_pylist()).str.lower().str.split().explode()
    )
    toks = toks[toks.notna() & (toks != "")]
    per_doc = pd.DataFrame({"r": toks.index, "t": toks.to_numpy(object)}).drop_duplicates()
    df = per_doc["t"].value_counts()
    terms = df.index.to_numpy(object)
    buckets = pd.util.hash_array(terms) % np.uint64(PARTITIONS)
    bucket_rows = (
        per_doc.assign(b=pd.util.hash_array(per_doc["t"].to_numpy(object)) % np.uint64(PARTITIONS))
        .groupby("b")
        .size()
    )
    term_bytes = int(sum(len(t) for t in terms)) + 8 * len(terms)
    max_bucket_terms = int(pd.Series(buckets).value_counts().max())
    return {
        "n_terms": int(len(terms)),
        "broadcast_bytes_per_worker": term_bytes,
        "max_bucket_terms": max_bucket_terms,
        "max_bucket_tf_rows": int(bucket_rows.max()),
    }


def _run(mode: str, tbl: pa.Table) -> float:
    import ray.data as rd

    from fuzzy_matching_ray.extras.tfidf import tfidf_top_terms

    ds = rd.from_arrow(tbl).repartition(8)
    t0 = time.perf_counter()
    out = tfidf_top_terms(
        ds, k=3, df_mode=mode, num_partitions=PARTITIONS
    )
    n = out.count()
    wall = time.perf_counter() - t0
    assert n > 0
    return wall


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out = {"n_docs_base": n_docs, "partitions": PARTITIONS, "scales": {}}
    # docs scale with the vocab target so the distinct-term count
    # actually grows ~10x (draws ≈ 1.6 × vocab in both cases)
    for label, vocab, docs in (("1x", 50_000, n_docs), ("10x", 500_000, 10 * n_docs)):
        tbl = _make_docs(docs, vocab, seed=11)
        stats = _df_stats(tbl)
        stats["wall_broadcast_s"] = round(_run("broadcast", tbl), 3)
        stats["wall_bucketed_s"] = round(_run("bucketed", tbl), 3)
        out["scales"][label] = stats
    s1, s10 = out["scales"]["1x"], out["scales"]["10x"]
    out["broadcast_state_growth"] = round(
        s10["broadcast_bytes_per_worker"] / s1["broadcast_bytes_per_worker"], 2
    )
    out["bucketed_state_growth"] = round(
        s10["max_bucket_terms"] / s1["max_bucket_terms"], 2
    )
    out["bucket_fraction_of_vocab_10x"] = round(
        s10["max_bucket_terms"] / s10["n_terms"], 4
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
