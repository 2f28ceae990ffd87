"""Micro-bench: ngram_jaccard_pairs wall-time vs corpus size
(VERDICT round-1 item #5 'Done' criterion — ~linear growth at 10×).

Uses realistic sparse-similarity data (large vocabulary, ~2% seeded
near-dups): with a small vocabulary every pair is similar and the
OUTPUT itself is quadratic, so no exact algorithm can be linear there.

Usage: python tools/bench_ngram_scale.py [n_base]
Prints one JSON line with wall times at 1× and 10× and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _make_docs(n: int, seed: int) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"w{i:05d}" for i in range(20_000)]
    texts = []
    ids = []
    for i in range(n):
        toks = rng.choice(len(vocab), size=40, replace=False)
        texts.append(" ".join(vocab[t] for t in toks))
        ids.append(i)
    # ~2% near-dups: copy an earlier doc and perturb 4 tokens
    n_dup = max(1, n // 50)
    for j in range(n_dup):
        base = texts[int(rng.integers(0, n))].split()
        for _ in range(4):
            base[int(rng.integers(0, len(base)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts.append(" ".join(base))
        ids.append(n + j)
    m = len(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s" + str(i % 4) for i in range(m)], pa.string()),
        }
    )


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from fuzzy_matching_ray.extras.doc_dedup import ngram_jaccard_pairs

    out = {}
    for label, n in (("1x", n_base), ("10x", n_base * 10)):
        ds = rd.from_arrow(_make_docs(n, seed=11)).materialize()
        t0 = time.time()
        res = ngram_jaccard_pairs(ds, min_ratio_pct=30)
        n_pairs = res.count()
        out[label] = {"docs": n, "pairs": n_pairs, "sec": round(time.time() - t0, 2)}
    out["wall_ratio_10x"] = round(out["10x"]["sec"] / out["1x"]["sec"], 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
