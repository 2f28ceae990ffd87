"""pivot_counts: unlisted pivot values must land in n_total only, and
partial counts must combine across batches."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.aggregates import pivot_counts


def test_quantile_bucket_assign_matches_duckdb():
    import duckdb
    import numpy as np

    from fuzzy_matching_ray.extras.aggregates import quantile_bucket_assign

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 40, size=500)  # heavy ties stress rank picks
    df = pd.DataFrame({"doc_id": np.arange(500), "n_chars": vals})
    out = (
        quantile_bucket_assign(
            rd.from_pandas(df).repartition(5), id_col="doc_id", val_col="n_chars"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "WITH cuts AS (SELECT quantile_disc(n_chars, "
        "[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c FROM df) "
        "SELECT doc_id, len(list_filter(cuts.c, x -> x < d.n_chars))::BIGINT AS decile "
        "FROM df d, cuts ORDER BY doc_id"
    ).df()
    assert (out["decile"].to_numpy() == exp["decile"].to_numpy()).all()


def test_dedup_rate_by_group():
    from fuzzy_matching_ray.extras.doc_dedup import dedup_rate_by_group

    dup = "the same long conversation text repeated verbatim for dedup " * 5
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [dup, dup, "a unique first text here", dup, "another unique one"],
            "source": ["s1", "s1", "s1", "s2", "s2"],
        }
    )
    out = (
        dedup_rate_by_group(rd.from_pandas(df), group_col="source")
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    # cluster {1,2,4} keeps min-id "1"; 3 and 5 are singletons
    assert out.loc["s1"].tolist() == [3, 2, 1]  # n_docs, n_kept, n_removed
    assert out.loc["s2"].tolist() == [2, 1, 1]


def test_grouped_top_tokens():
    from fuzzy_matching_ray.extras.aggregates import grouped_top_tokens

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de"],
            "text": ["the cat the dog", "the cat", "der der hund", "der"],
        }
    )
    out = (
        grouped_top_tokens(
            rd.from_pandas(df).repartition(3), group_col="lang", k=2, num_partitions=2
        )
        .to_pandas()
        .sort_values(["lang", "term_rank"])
        .reset_index(drop=True)
    )
    en = out[out["lang"] == "en"]
    assert en["token"].tolist() == ["the", "cat"]  # the×3 across batches
    assert en["n"].tolist() == [3, 2]
    de = out[out["lang"] == "de"]
    assert de["token"].tolist() == ["der", "hund"]
    assert de["n"].tolist() == [3, 1]


def test_cluster_best_representatives():
    from fuzzy_matching_ray.extras.doc_dedup import cluster_best_representatives

    dup = "the same long conversation text repeated verbatim for dedup " * 5
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            # doc 2 is the LONGEST member of the near-dup cluster {1,2}
            "text": [dup, dup + " extra", "a unique doc"],
        }
    )
    out = (
        cluster_best_representatives(rd.from_pandas(df))
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    # min-id cluster label is "1", but the QUALITY rep is doc 2
    assert out.loc["1", "rep_id"] == "2"
    assert out.loc["1", "n_members"] == 2
    assert out.loc["3", "rep_id"] == "3"


def test_group_size_histogram():
    from fuzzy_matching_ray.extras.aggregates import group_size_histogram

    df = pd.DataFrame({"k": ["a"] * 3 + ["b"] * 3 + ["c"] * 1 + ["d"] * 2})
    out = (
        group_size_histogram(
            rd.from_pandas(df).repartition(3), key_col="k", num_partitions=2
        )
        .to_pandas()
        .set_index("group_size")["n_groups"]
        .sort_index()
    )
    assert out.to_dict() == {1: 1, 2: 1, 3: 2}


def test_pivot_counts_combines_and_totals():
    df = pd.DataFrame(
        {
            "u": ["a"] * 4 + ["b"] * 2,
            "t": ["x", "x", "y", "zzz", "y", "zzz"],  # zzz unlisted
        }
    )
    out = (
        pivot_counts(
            rd.from_pandas(df).repartition(3),  # force multi-batch partials
            key_col="u",
            pivot_col="t",
            categories=("x", "y"),
            num_partitions=2,
        )
        .to_pandas()
        .set_index("u")
        .sort_index()
    )
    assert out.loc["a"].tolist() == [2, 1, 4]  # n_x, n_y, n_total
    assert out.loc["b"].tolist() == [0, 1, 2]
    assert out.columns.tolist() == ["n_x", "n_y", "n_total"]


def test_approx_quantiles_sketch_error_bound(ray_session):
    """DDSketch quantiles: every reported quantile within rel_err of
    the exact discrete quantile, negatives and zeros included."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import approx_quantiles_sketch

    rng = np.random.default_rng(23)
    frames = []
    for key, scale in (("a", 1.0), ("b", 1000.0)):
        v = rng.lognormal(0, 2, 4000) * scale
        v[::7] = -v[::7]  # negatives
        v[::50] = 0.0     # exact zeros
        frames.append(pd.DataFrame({"k": key, "v": v}))
    df = pd.concat(frames, ignore_index=True)
    rel = 0.01
    out = (
        approx_quantiles_sketch(
            rd.from_pandas(df).repartition(5),
            key_col="k",
            val_col="v",
            rel_err=rel,
            num_partitions=4,
        )
        .to_pandas()
        .set_index("k")
    )
    for key, g in df.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        n = len(vals)
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            exact = vals[max(1, int(np.ceil(q * n))) - 1]
            got = out.loc[key, name]
            if exact == 0:
                assert got == 0.0
            else:
                assert abs(got - exact) <= rel * abs(exact) * 1.0000001, (
                    key, name, got, exact
                )
        assert out.loc[key, "n"] == n


def test_approx_quantiles_partition_independent(ray_session):
    """The sketch is order-independent: identical output at different
    partitionings (the property the serial golden oracle relies on)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import approx_quantiles_sketch

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.choice(["x", "y"], 3000), "v": rng.exponential(9, 3000)})
    outs = []
    for parts in (1, 7):
        outs.append(
            approx_quantiles_sketch(
                rd.from_pandas(df).repartition(parts), key_col="k", val_col="v"
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_approx_quantiles_tiny_rel_err_sign_and_bound(ray_session):
    """Small rel_err with tiny-magnitude values: the log-bucket index
    |b| grows as 1/ln γ, so the sign-encoding bias must scale with it —
    a fixed bias sign-flipped keys (negative p25 for an all-positive
    domain) once rel_err dropped below ~7e-4."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import approx_quantiles_sketch

    vals = np.array([1e-120, 1e-120, 1.0, 10.0], np.float64)
    rel = 1e-4
    out = (
        approx_quantiles_sketch(
            rd.from_pandas(pd.DataFrame({"k": "a", "v": vals})),
            key_col="k",
            val_col="v",
            rel_err=rel,
            num_partitions=2,
        )
        .to_pandas()
        .set_index("k")
    )
    # p25 = rank-1 value = 1e-120: must come back positive and tight
    got = float(out.loc["a", "p25"])
    assert got > 0
    assert abs(got - 1e-120) <= rel * 1e-120 * 1.0000001
    assert abs(float(out.loc["a", "p90"]) - 10.0) <= rel * 10.0 * 1.0000001


def test_approx_quantiles_rel_err_validated(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import approx_quantiles_sketch

    ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [1.0]}))
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="rel_err"):
            approx_quantiles_sketch(ds, key_col="k", val_col="v", rel_err=bad)


def test_quantile_bucket_assign_rejects_nulls(ray_session):
    """Nulls would vanish from the cutpoint histogram but reach the
    assignment pass as INT64_MIN garbage — the operator must fail
    loudly instead (same contract as the float rejection)."""
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import quantile_bucket_assign

    t = pa.table({"id": [1, 2, 3], "v": pa.array([10, None, 30], pa.int64())})
    with pytest.raises(Exception, match="null"):
        quantile_bucket_assign(
            rd.from_arrow(t), id_col="id", val_col="v"
        ).materialize()


def test_grouped_rollup_matches_duckdb_rollup(ray_session):
    """Leaf rows + k1 subtotals + grand total must equal GROUP BY
    ROLLUP as a multiset — including a NULL key present in the DATA
    (its leaf row is distinct from the subtotal row only by value)
    and NULL VALUES (count(*) counts them; sum skips them)."""
    import duckdb
    import numpy as np

    from fuzzy_matching_ray.extras.aggregates import grouped_rollup

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "source": [f"s{i % 5}" for i in range(300)],
            "lang": [None if i % 37 == 0 else ["en", "de", "zh"][i % 3] for i in range(300)],
            "n_chars": [None if i % 23 == 0 else int(v) for i, v in enumerate(rng.integers(1, 500, size=300))],
        }
    )
    out = grouped_rollup(
        rd.from_pandas(df).repartition(6),
        key_cols=("source", "lang"),
        value_col="n_chars",
        num_partitions=4,
    ).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS sum_val, "
        "count(*)::BIGINT AS n_rows FROM df GROUP BY ROLLUP (source, lang)"
    ).fetchdf()

    def canon(d):
        return sorted(
            (str(a), str(b), int(s), int(n))
            for a, b, s, n in zip(d.source, d.lang, d.sum_val, d.n_rows)
        )

    assert len(out) == len(exp)
    assert canon(out) == canon(exp)


def test_source_ngram_overlap_matches_duckdb(ray_session):
    """Shared-trigram counts per source pair must equal the SQL string
    join; short docs (< n tokens) contribute nothing."""
    import duckdb

    from fuzzy_matching_ray.extras.aggregates import source_ngram_overlap

    df = pd.DataFrame(
        {
            "source": ["a"] * 4 + ["b"] * 4 + ["c"] * 2,
            "text": [
                "the quick brown fox jumps",
                "pack my box with five dozen",
                "the quick brown cat",
                "to be",  # too short for trigrams
                "THE QUICK BROWN fox ran",  # case-folds into overlap with a
                "pack my box tightly",
                "lorem ipsum dolor sit",
                "",
                "lorem ipsum dolor amet",
                "the quick brown fox jumps again",
            ],
        }
    )
    out = (
        source_ngram_overlap(rd.from_pandas(df).repartition(4), n=3, num_partitions=4)
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        "WITH toks AS (SELECT source, list_filter(regexp_split_to_array(lower(text), "
        "'\\s+'), x -> x <> '') AS w FROM df), "
        "grams AS (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g "
        "FROM toks, unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3) "
        "SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS shared_ngrams "
        "FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchdf()
    assert out.to_dict("records") == exp.to_dict("records")
    # sanity on the fixture itself: a∩b from two gram families, a∩c large
    got = {(r.src_a, r.src_b): r.shared_ngrams for r in out.itertuples()}
    assert got[("a", "b")] >= 3 and got[("a", "c")] >= 3


def test_grouped_rollup_rejects_nonstring_keys(ray_session):
    """Integer keys would union-fail between leaf and subtotal blocks
    downstream — the operator must refuse them loudly up front."""
    import pyarrow as pa
    import pytest

    from fuzzy_matching_ray.extras.aggregates import grouped_rollup

    t = pa.table({"a": [1, 2], "b": ["x", "y"], "v": [3, 4]})
    with pytest.raises(Exception, match="string key columns"):
        grouped_rollup(
            rd.from_arrow(t), key_cols=("a", "b"), value_col="v"
        ).materialize()


def test_grouped_rollup_empty_and_dict_keys(ray_session):
    """SQL parity on empty input (ROLLUP still emits the grand
    grouping-set row: NULL keys, NULL sum, count 0) and acceptance of
    parquet dictionary-encoded string keys."""
    import pyarrow as pa

    from fuzzy_matching_ray.extras.aggregates import grouped_rollup

    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    out = grouped_rollup(rd.from_arrow(empty), num_partitions=2).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert pd.isna(row.source) and pd.isna(row.lang) and pd.isna(row.sum_val)
    assert row.n_rows == 0

    dicted = pa.table(
        {
            "source": pa.array(["a", "a", "b"]).dictionary_encode(),
            "lang": pa.array(["en", "de", "en"]).dictionary_encode(),
            "n_chars": pa.array([1, 2, 4], pa.int64()),
        }
    )
    out = grouped_rollup(rd.from_arrow(dicted), num_partitions=2).to_pandas()
    assert len(out) == 6  # 3 leaf + 2 sub + 1 grand
    grand = out[out.source.isna() & out.lang.isna()]
    assert int(grand.sum_val.iloc[0]) == 7 and int(grand.n_rows.iloc[0]) == 3


def test_grouped_cube_matches_duckdb_cube(ray_session):
    """All four grouping sets must equal GROUP BY CUBE as a multiset —
    NULL data keys and NULL values included."""
    import duckdb
    import numpy as np

    from fuzzy_matching_ray.extras.aggregates import grouped_cube

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "source": [None if i % 41 == 0 else f"s{i % 4}" for i in range(300)],
            "lang": [None if i % 29 == 0 else ["en", "de", "zh"][i % 3] for i in range(300)],
            "n_chars": [None if i % 17 == 0 else int(v) for i, v in enumerate(rng.integers(1, 500, size=300))],
        }
    )
    out = grouped_cube(
        rd.from_pandas(df).repartition(6),
        key_cols=("source", "lang"),
        value_col="n_chars",
        num_partitions=4,
    ).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS sum_val, "
        "count(*)::BIGINT AS n_rows FROM df GROUP BY CUBE (source, lang)"
    ).fetchdf()

    def canon(d):
        return sorted(
            (str(a), str(b), "NA" if pd.isna(s) else str(int(s)), int(n))
            for a, b, s, n in zip(d.source, d.lang, d.sum_val, d.n_rows)
        )

    assert len(out) == len(exp)
    assert canon(out) == canon(exp)


def test_grouped_cube_3keys_full_aggs_matches_duckdb(ray_session):
    """The N-key generalization: CUBE over THREE keys (8 grouping
    sets, one partial-shuffle per key) with the full aggregate set —
    sum / count(*) / min / max / avg — must equal DuckDB as a
    multiset, NULL data keys and NULL values included."""
    import duckdb
    import numpy as np

    from fuzzy_matching_ray.extras.aggregates import grouped_cube

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "a": [None if i % 53 == 0 else f"a{i % 3}" for i in range(400)],
            "b": [["x", "y"][i % 2] for i in range(400)],
            "c": [None if i % 31 == 0 else f"c{i % 4}" for i in range(400)],
            "v": [None if i % 19 == 0 else int(x) for i, x in enumerate(rng.integers(1, 900, size=400))],
        }
    )
    out = grouped_cube(
        rd.from_pandas(df).repartition(5),
        key_cols=("a", "b", "c"),
        value_col="v",
        aggs=("sum", "count", "min", "max", "avg"),
        num_partitions=3,
    ).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT a, b, c, CAST(sum(v) AS BIGINT) AS sum_val, "
        "count(*)::BIGINT AS n_rows, CAST(min(v) AS BIGINT) AS min_val, "
        "CAST(max(v) AS BIGINT) AS max_val, avg(v) AS avg_val "
        "FROM df GROUP BY CUBE (a, b, c)"
    ).fetchdf()

    def canon(d):
        return sorted(
            (
                str(r.a),
                str(r.b),
                str(r.c),
                "NA" if pd.isna(r.sum_val) else str(int(r.sum_val)),
                int(r.n_rows),
                "NA" if pd.isna(r.min_val) else str(int(r.min_val)),
                "NA" if pd.isna(r.max_val) else str(int(r.max_val)),
                "NA" if pd.isna(r.avg_val) else f"{r.avg_val:.10f}",
            )
            for r in d.itertuples()
        )

    assert len(out) == len(exp)
    assert canon(out) == canon(exp)


def test_grouped_rollup_single_key_and_bad_agg(ray_session):
    """Degenerate 1-key ROLLUP = GROUP BY + grand total; unknown agg
    names must fail loudly at plan time."""
    import pytest

    from fuzzy_matching_ray.extras.aggregates import grouped_rollup

    df = pd.DataFrame({"k": ["p", "q", "p"], "v": [1, 2, 4]})
    out = (
        grouped_rollup(
            rd.from_pandas(df), key_cols=("k",), value_col="v", num_partitions=2
        )
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == 3  # p, q, grand
    assert out.loc[0, "k"] == "p" and int(out.loc[0, "sum_val"]) == 5
    grand = out[out.k.isna()]
    assert int(grand.sum_val.iloc[0]) == 7 and int(grand.n_rows.iloc[0]) == 3

    with pytest.raises(ValueError, match="unknown aggs"):
        grouped_rollup(rd.from_pandas(df), key_cols=("k",), value_col="v", aggs=("median",))
