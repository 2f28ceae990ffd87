"""Training-data curation compose (Ray-Data-native): quality filter →
language filter → exact dedup → content-addressed sample over a small
synthetic documents table, one lazy Dataset plan."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.curate import curate_documents

    owned = ensure_ray()
    try:
        rng = np.random.default_rng(21)
        words = ["the", "data", "pipeline", "is", "a", "stream", "of", "blocks"]
        texts = []
        for i in range(300):
            n = int(rng.integers(2, 30))
            t = " ".join(rng.choice(words, size=n).tolist())
            if i % 7 == 0:
                t = texts[i - 1] if texts else t  # exact dups
            if i % 11 == 0:
                t = "!!! ??? ### " * 5  # punct-heavy junk
            texts.append(t)
        ds = rd.from_pandas(pd.DataFrame({"doc_id": range(300), "text": texts}))
        kept = curate_documents(ds).to_pandas()
        print_table(
            [
                {"stage": "input", "rows": 300},
                {"stage": "curated (filter→dedup→sample)", "rows": len(kept)},
            ],
            limit=2,
            title="curation",
        )
        assert 0 < len(kept) < 300
        return {"n_in": 300, "n_out": len(kept)}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
