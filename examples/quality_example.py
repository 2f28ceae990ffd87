"""Corpus-statistics quality analysis (Ray-Data-native): unigram-LM
fluency scoring — each document's mean log token frequency under the
corpus's own unigram model, the CCNet-style "LM score" — plus the
cross-source trigram-overlap matrix that shows which feeds copy which
before any per-document dedup runs."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import source_ngram_overlap
    from fuzzy_matching_ray.extras.tfidf import unigram_logfreq

    owned = ensure_ray()
    try:
        rng = np.random.default_rng(7)
        common = ["the", "data", "pipeline", "streams", "blocks", "of", "work"]
        rows = []
        for i in range(240):
            src = ["wiki", "web", "scan"][i % 3]
            if src == "scan" and i % 6 == 5:
                # OCR-noise docs: tokens nothing else uses
                t = " ".join(f"x{rng.integers(1e6)}q" for _ in range(12))
            else:
                t = " ".join(rng.choice(common, size=int(rng.integers(8, 20))))
            if src == "web" and i % 4 == 1:
                t = "the data pipeline streams blocks " + t  # syndicated prefix
            rows.append({"doc_id": i, "source": src, "text": t})
        ds = rd.from_pandas(pd.DataFrame(rows))

        scored = unigram_logfreq(ds).to_pandas().merge(
            pd.DataFrame(rows)[["doc_id", "source"]], on="doc_id"
        )
        by_src = scored.groupby("source")["logfreq"].mean().sort_values()
        print_table(
            [{"source": s, "mean_logfreq": round(v, 3)} for s, v in by_src.items()],
            limit=3,
            title="unigram-LM fluency by source (low = rare-vocab junk)",
        )
        # the OCR-noise source must score visibly lower
        assert by_src.index[0] == "scan"

        overlap = source_ngram_overlap(ds, n=3).to_pandas()
        print_table(
            overlap.sort_values("shared_ngrams", ascending=False).to_dict("records"),
            limit=3,
            title="shared trigrams per source pair",
        )
        assert len(overlap) == 3  # all three pairs share the common vocab
        return {
            "worst_source": by_src.index[0],
            "overlap_pairs": len(overlap),
        }
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
