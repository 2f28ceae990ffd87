"""Flagship transcript near-dup pipeline (Ray-Data-native — no
reference equivalent): synthesize a transcript corpus, dedup it, and
score recall against the generator's ground truth."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table, scratch_dir


def main() -> dict:
    import glob

    import pyarrow.parquet as pq

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    owned = ensure_ray()
    try:
        out = scratch_dir("dedup")
        turns_dir = write_transcripts(out, TranscriptGenConfig(n_convs=120, seed=42))
        files = sorted(glob.glob(turns_dir + "/*.parquet"))
        # file-list input takes the shuffle-free assembly fast path
        res = dedup_transcripts(files, PipelineConfig(num_partitions=4))
        clusters = res.clusters.to_pandas()
        labels = dict(zip(clusters.conv_id, clusters.cluster_id))
        truth = pq.read_table(out + "/truth/dup_truth.parquet").to_pandas()
        hits = sum(
            1
            for o, d in zip(truth.orig_conv_id, truth.dup_conv_id)
            if labels.get(o) == labels.get(d)
        )
        print_table(
            [
                {"metric": "documents", "value": len(clusters)},
                {"metric": "edges", "value": res.metrics["edges"]},
                {"metric": "clusters", "value": clusters.cluster_id.nunique()},
                {"metric": "recall_vs_truth", "value": f"{hits}/{len(truth)}"},
            ],
            limit=4,
            title="flagship dedup",
        )
        return {"n_docs": len(clusters), "recall_hits": hits, "n_truth": len(truth)}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
