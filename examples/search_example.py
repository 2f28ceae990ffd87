"""Search over a document corpus (Ray-Data-native): BM25 keyword
ranking plus brute-force cosine kNN over an embedding column."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.ann import knn_bruteforce
    from fuzzy_matching_ray.extras.search import bm25_topk

    owned = ensure_ray()
    try:
        rng = np.random.default_rng(13)
        topics = {
            "databases": ["query", "index", "join", "hash", "table"],
            "ml": ["model", "training", "gradient", "loss", "batch"],
        }
        rows = []
        for i in range(200):
            topic = "databases" if i % 2 == 0 else "ml"
            rows.append(
                {
                    "doc_id": i,
                    "text": " ".join(rng.choice(topics[topic], size=12).tolist()),
                }
            )
        docs = rd.from_pandas(pd.DataFrame(rows))
        hits = bm25_topk(docs, terms=("hash", "join"), k=5)
        if not isinstance(hits, pd.DataFrame):
            hits = hits.to_pandas()
        print_table(hits.to_dict("records"), title="BM25 top-5 for 'hash join'")
        assert set(hits["doc_id"] % 2) == {0}  # all database docs

        vecs = pd.DataFrame(
            {
                "vec_id": np.arange(100, dtype=np.int64),
                "embedding": list(rng.standard_normal((100, 16))),
            }
        )
        q = np.stack(vecs["embedding"][:2].to_numpy())
        knn = knn_bruteforce(rd.from_pandas(vecs), q, [0, 1], k=3)
        print_table(knn.to_dict("records"), limit=6, title="kNN neighbors")
        return {"bm25_hits": len(hits), "knn_rows": len(knn)}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
