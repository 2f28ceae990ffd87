"""Training-mixture resampling (Ray-Data-native): deterministic
source weighting with upsampling — each source's documents are
repeated ``int + fractional`` times, multiplicity a pure md5 function
of the id (reproducible in SQL; see
``__ray_entry__.oracle_sql()['mix_sources_documents']``), plus a
hierarchical ROLLUP report of the resulting mix."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    import pandas as pd
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import grouped_rollup
    from fuzzy_matching_ray.extras.relational import weighted_mix

    owned = ensure_ray()
    try:
        df = pd.DataFrame(
            {
                "doc_id": range(600),
                "source": [["wiki", "web", "forums"][i % 3] for i in range(600)],
                "lang": [["en", "de"][i % 2] for i in range(600)],
                "text": [f"doc {i} body" for i in range(600)],
            }
        )
        df["n_chars"] = df.text.str.len()
        ds = rd.from_pandas(df)

        # wiki ~2.4x, web kept ~50%, forums exactly 1x; carry lang and
        # n_chars through so the rollup below reports the MIXED output
        mixed_ds = weighted_mix(
            ds,
            group_col="source",
            weights={"wiki": (2, "66"), "web": (0, "80")},
            default_weight=(1, "00"),
            cols=("doc_id", "source", "lang", "text", "n_chars"),
        )
        mixed = mixed_ds.to_pandas()
        by_src = mixed.groupby("source").size().to_dict()
        print_table(
            [{"source": s, "docs_out": n} for s, n in sorted(by_src.items())],
            limit=3,
            title="mixture (200 docs/source in)",
        )
        assert by_src["forums"] == 200 and by_src["wiki"] > 400 and by_src["web"] < 140

        rolled = grouped_rollup(
            mixed_ds, key_cols=("source", "lang"), value_col="n_chars"
        ).to_pandas()
        print_table(
            rolled.sort_values(["source", "lang"], na_position="last").to_dict("records"),
            limit=10,
            title="rollup(source, lang) of the MIXED output",
        )
        # 6 leaf + 3 subtotal + 1 grand; the grand total counts every
        # emitted copy, not the 600 input docs
        assert len(rolled) == 10
        grand = rolled[rolled.source.isna() & rolled.lang.isna()]
        assert int(grand.n_rows.iloc[0]) == len(mixed) > 600
        return {"mix_by_source": by_src, "rollup_rows": len(rolled)}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
