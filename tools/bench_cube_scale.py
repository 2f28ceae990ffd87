"""Scale evidence for the combiner-first ROLLUP/CUBE family: the
bytes that reach the exchanges are bounded by batches × distinct key
combos, NOT by input rows — the property that makes the operators
viable at 100 TB.

Runs grouped_rollup and grouped_cube over synthetic documents-shaped
inputs at growing row counts (fixed key cardinality, the realistic
shape: sources × languages is small and stable while rows grow
unboundedly) and reports input rows vs combiner-output rows (the
exchange unit) vs final output rows.

Usage: python tools/bench_cube_scale.py [rows ...]   (default 3 sizes)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import (
        _cube_partial_fn,
        grouped_cube,
        grouped_rollup,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000, 800_000]
    n_src, n_lang = 20, 10
    for n in sizes:
        rng = np.random.default_rng(1)
        df = pd.DataFrame(
            {
                "source": [f"s{i}" for i in rng.integers(0, n_src, n)],
                "lang": [f"l{i}" for i in rng.integers(0, n_lang, n)],
                "n_chars": rng.integers(1, 2000, n).astype("int64"),
            }
        )
        ds = rd.from_pandas(df).repartition(16)
        partial_rows = (
            ds.map_batches(_cube_partial_fn(("source", "lang"), "n_chars"), batch_format="pyarrow")
            .count()
        )
        t0 = time.time()
        roll_rows = grouped_rollup(ds).count()
        t_roll = time.time() - t0
        t0 = time.time()
        cube_rows = grouped_cube(ds).count()
        t_cube = time.time() - t0
        print(
            f"rows={n:>9,}  exchange_rows={partial_rows:>6,} "
            f"({partial_rows / n:6.2%} of input)  "
            f"rollup_out={roll_rows} ({t_roll:.1f}s)  cube_out={cube_rows} ({t_cube:.1f}s)"
        )


if __name__ == "__main__":
    main()
    import ray

    ray.shutdown()
