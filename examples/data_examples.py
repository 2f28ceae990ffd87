"""Test-data generation showcase (reference examples/data_examples.py):
person records with controlled distortions, plus the transcript corpus
with its duplicate ground truth."""

from __future__ import annotations

from examples._common import print_table, scratch_dir


def main() -> dict:
    import pyarrow.parquet as pq

    from fuzzy_matching_ray.datagen import (
        PersonGenConfig,
        TranscriptGenConfig,
        generate_person_records,
        write_transcripts,
    )

    orig, var = generate_person_records(
        PersonGenConfig(n_records=8, language="mixed", seed=1)
    )
    rows = [
        {"id": o["id"], "original": o["last_name"], "variant": v["last_name"]}
        for o, v in zip(orig, var)
    ]
    print_table(rows, limit=8, title="person distortions")

    out = scratch_dir("transcripts")
    turns_dir = write_transcripts(out, TranscriptGenConfig(n_convs=50, seed=9))
    import glob

    n_files = len(glob.glob(turns_dir + "/*.parquet"))
    truth = pq.read_table(out + "/truth/dup_truth.parquet")
    print(f"{n_files} conv-sharded turn files; {truth.num_rows} known duplicate pairs")
    return {"n_files": n_files, "n_truth": truth.num_rows}


if __name__ == "__main__":
    main()
