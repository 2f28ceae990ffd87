"""Local stand-in for the driver's correctness harness: run every
``queries()`` entry at a given sf, compare row-count + column names +
order-insensitive value hash against ``oracle_sql()`` via DuckDB.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    # normalize dtypes: ints to int64, floats rounded repr, all to str
    rows = []
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_float_dtype(s):
            df[col] = s.map(lambda v: f"{v:.9g}")
        else:
            df[col] = s.astype(str)
    recs = ["\x1f".join(r) for r in df.itertuples(index=False)]
    recs.sort()
    h = hashlib.sha256()
    for r in recs:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    # fixture-backed oracles are pinned to the driver's compare scale
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf != getattr(e, "FIXTURE_ORACLE_SF", "sf0.01"):
        for name in getattr(e, "FIXTURE_ORACLE_QUERIES", ()):
            oracles.pop(name, None)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            results[name] = f"QUERY ERROR: {type(ex).__name__}: {str(ex)[:160]}"
            continue
        wall = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows ({wall:.1f}s)"
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            results[name] = f"ORACLE ERROR: {str(ex)[:160]}"
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        if not problems:
            hg, he = value_hash(got), value_hash(exp)
            if hg != he:
                problems.append(f"value hash {hg} vs {he}")
        results[name] = (
            f"OK: {len(got)} rows ({wall:.1f}s)" if not problems else "MISMATCH: " + "; ".join(problems)
        )

    width = max(len(k) for k in results)
    fails = 0
    for k, v in results.items():
        flag = " " if v.startswith(("OK", "rows-only")) else "!"
        if flag == "!":
            fails += 1
        print(f"{flag} {k:<{width}}  {v}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
