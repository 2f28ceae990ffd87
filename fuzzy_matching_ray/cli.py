"""Command-line entry points (reference surface:
``cli/process_data.py:222-338`` modes ``match`` / ``transliterate`` /
``generate``, plus our flagship ``dedup`` and ``generate-transcripts``).

Run as ``python -m fuzzy_matching_ray.cli <mode> ...``.  This is the
only module (besides bench.py and the test fixture) that owns a Ray
session; the library never calls ``ray.init``.

The ``--fields`` grammar mirrors the reference's
``parse_match_fields`` (``cli/process_data.py:178-219``):
``field:weight[:translit[:algorithm]]`` items separated by commas,
e.g. ``last_name:0.4:true:token_sort,first_name:0.3``.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_match_fields(spec: str):
    """``field:weight[:translit[:algo]]`` CSV grammar → field configs
    (reference ``parse_match_fields``, ``cli/process_data.py:178-219``)."""
    from fuzzy_matching_ray.config import FuzzyAlgorithm, MatchFieldConfig

    out = []
    for item in spec.split(","):
        parts = item.strip().split(":")
        if not parts or not parts[0]:
            continue
        field = parts[0]
        weight = float(parts[1]) if len(parts) > 1 and parts[1] else 1.0
        translit = len(parts) > 2 and parts[2].strip().lower() in ("true", "1", "yes")
        algo = None
        if len(parts) > 3 and parts[3]:
            try:
                algo = FuzzyAlgorithm(parts[3].strip().lower())
            except ValueError:
                algo = None  # unknown algorithm falls back (reference behavior)
        out.append(MatchFieldConfig(field, weight, translit, algo))
    return tuple(out)


def parse_name_fields(spec: str | None) -> dict[str, str] | None:
    """``source=target`` comma list → rename mapping (reference
    ``parse_name_fields``, ``cli/process_data.py:137-175``)."""
    if not spec:
        return None
    out = {}
    for item in spec.split(","):
        if "=" in item:
            src, tgt = item.split("=", 1)
            out[src.strip()] = tgt.strip()
    return out or None


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_match(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from fuzzy_matching_ray.config import MatchConfig
    from fuzzy_matching_ray.pipelines.record_match import match_records
    from fuzzy_matching_ray.sources.io import load_dataset, write_dataset

    cfg = MatchConfig(
        fields=parse_match_fields(args.fields),
        threshold=args.threshold,
        block_field=args.block_field,
        sort_before_match=True,
    )
    name_fields = parse_name_fields(args.name_fields)
    ds1 = load_dataset(args.input1, args.format, name_fields)
    ds2 = load_dataset(args.input2, args.format, name_fields)
    matches = match_records(ds1, ds2, cfg)
    write_dataset(matches, args.output, args.output_format)
    print(f"matches written to {args.output}")
    return 0


def cmd_transliterate(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from fuzzy_matching_ray.pipelines.record_match import transliterate_dataset
    from fuzzy_matching_ray.sources.io import load_dataset, write_dataset

    ds = load_dataset(args.input, args.format, parse_name_fields(args.name_fields))
    out = transliterate_dataset(
        ds, args.target_lang, args.fields.split(","), standard=args.standard
    )
    write_dataset(out, args.output, args.output_format)
    print(f"transliterated dataset written to {args.output}")
    return 0


def cmd_generate(args: argparse.Namespace) -> int:
    """Person-record pair generator (reference ``--mode generate``,
    ``cli/process_data.py:368-474``) — no Ray needed."""
    import pyarrow.parquet as pq

    from fuzzy_matching_ray.datagen import (
        PersonGenConfig,
        generate_person_records,
        person_records_table,
    )

    orig, var = generate_person_records(
        PersonGenConfig(n_records=args.count, language=args.language, seed=args.seed)
    )
    pq.write_table(person_records_table(orig), args.output_original)
    pq.write_table(person_records_table(var), args.output_variant)
    print(f"{args.count} record pairs → {args.output_original}, {args.output_variant}")
    return 0


def cmd_generate_transcripts(args: argparse.Namespace) -> int:
    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts

    out = write_transcripts(
        args.output, TranscriptGenConfig(n_convs=args.count, seed=args.seed)
    )
    print(f"transcripts → {out}")
    return 0


def cmd_dedup(args: argparse.Namespace) -> int:
    """Flagship near-dup pipeline over a transcripts Parquet directory."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    cfg = PipelineConfig(
        num_partitions=args.num_partitions,
        workdir=args.workdir,
    )
    channels = tuple(args.channels.split(","))
    res = dedup_transcripts(
        rd.read_parquet(args.input), cfg, channels=channels, attach=args.attach
    )
    if args.partition_output:
        # one directory per conv_id hash bucket: a downstream consumer
        # (or a re-run after failure) can process / skip buckets
        # independently — the brief's resumable-output layout
        import pyarrow as pa

        from fuzzy_matching_ray.stages.grouped import _bucket_of_column

        def _bucketed(b: pa.Table) -> pa.Table:
            return b.append_column(
                "bucket",
                pa.array(_bucket_of_column(b["conv_id"], args.num_partitions), pa.int32()),
            )

        res.clusters.map_batches(_bucketed, batch_format="pyarrow").write_parquet(
            args.output + "/clusters", partition_cols=["bucket"]
        )
    else:
        res.clusters.write_parquet(args.output + "/clusters")
    res.representatives.write_parquet(args.output + "/representatives")
    res.edges.write_parquet(args.output + "/edges")
    print(json.dumps(res.metrics))
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """Composed curation (filter → dedup → sample) over a documents
    Parquet file/dir; writes (doc_id, n_tokens) survivors."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fuzzy_matching_ray.extras.curate import curate_documents

    out = curate_documents(
        rd.read_parquet(args.input),
        min_tokens=args.min_tokens,
        lang=args.lang,
        sample_hex=args.sample_hex,
    )
    out.write_parquet(args.output)
    print(f"curated ids -> {args.output}")
    return 0


def cmd_incremental(args: argparse.Namespace) -> int:
    """Incremental dedup: accepted near-dup pairs touching the NEW
    batch, against a (checkpointable) base corpus."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fuzzy_matching_ray.extras.doc_dedup import incremental_dedup_pairs

    out = incremental_dedup_pairs(
        rd.read_parquet(args.new),
        rd.read_parquet(args.base),
        workdir=args.workdir,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    out.write_parquet(args.output)
    print(f"incremental dup pairs -> {args.output}")
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    """Dedup dashboard over a documents Parquet: cluster-size
    histogram, per-source kept/removed rates, and per-doc n-gram
    novelty attribution — the post-dedup reporting views."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fuzzy_matching_ray.extras.aggregates import group_size_histogram
    from fuzzy_matching_ray.extras.doc_dedup import (
        dedup_rate_by_group,
        minhash_dedup_docs,
    )
    from fuzzy_matching_ray.extras.filtering import gram_novelty

    docs = rd.read_parquet(args.input)
    cols = set(docs.schema().names)
    labels = minhash_dedup_docs(docs).materialize()
    group_size_histogram(
        labels, key_col="cluster_id", size_name="cluster_size", count_name="n_clusters"
    ).write_parquet(args.output + "/cluster_sizes")
    views = ["cluster_sizes", "gram_novelty"]
    # the per-group view needs the group column; skip (loudly) if absent
    if args.group_col and args.group_col in cols:
        dedup_rate_by_group(docs, group_col=args.group_col, labels=labels).write_parquet(
            args.output + "/dedup_rate"
        )
        views.append("dedup_rate")
    elif args.group_col:
        print(f"report: no column {args.group_col!r} — skipping dedup_rate view")
    gram_novelty(docs).write_parquet(args.output + "/gram_novelty")
    print(json.dumps({"docs": docs.count(), "out": args.output, "views": views}))
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    """Declarative pipeline: a JSON step spec composed over the
    operator registry into one lazy plan (validated before any data
    moves), then written as partitioned Parquet."""
    with open(args.config) as f:
        spec = json.load(f)
    from fuzzy_matching_ray.pipelines.compose import build_pipeline

    run = build_pipeline(spec)  # validates BEFORE ray spins up
    _init_ray(args.num_cpus)
    import ray.data as rd

    # materialize once: write + count off the same execution (a lazy
    # write_parquet followed by count() would run the whole plan twice)
    out = run(rd.read_parquet(args.input)).materialize()
    out.write_parquet(args.output)
    print(json.dumps({"rows_out": out.count(), "steps": [s["op"] for s in spec["steps"]]}))
    return 0


def cmd_search(args: argparse.Namespace) -> int:
    """BM25 ranked keyword search over a documents Parquet file/dir."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fuzzy_matching_ray.extras.search import bm25_topk

    res = bm25_topk(
        rd.read_parquet(args.input),
        terms=tuple(args.query.split()),
        k=args.top_k,
    )
    print(res.to_string(index=False))
    return 0


def cmd_pack(args: argparse.Namespace) -> int:
    """Concat-and-chunk sequence packing over a documents Parquet."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from fuzzy_matching_ray.extras.packing import pack_sequences

    out = pack_sequences(
        rd.read_parquet(args.input),
        budget=args.budget,
        num_shards=args.num_shards,
    )
    out.write_parquet(args.output)
    print(f"pack layout -> {args.output}")
    return 0


def cmd_menu(args: argparse.Namespace) -> int:
    """Interactive menu — UX parity with the reference's menu entry
    point (``cli/main.py:37-227``); see ``fuzzy_matching_ray.menu``."""
    from fuzzy_matching_ray.menu import run_menu

    return run_menu(num_cpus=args.num_cpus)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fuzzy_matching_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="mode", required=True)

    m = sub.add_parser("match", help="match two datasets (reference --mode match)")
    m.add_argument("--input1", required=True)
    m.add_argument("--input2", required=True)
    m.add_argument("--fields", required=True, help="field:weight[:translit[:algo]],...")
    m.add_argument("--threshold", type=float, default=0.7)
    m.add_argument("--block-field", default=None)
    m.add_argument("--name-fields", default=None, help="src=tgt,...")
    m.add_argument("--format", default=None)
    m.add_argument("--output", required=True)
    m.add_argument("--output-format", default="parquet")
    m.set_defaults(fn=cmd_match)

    t = sub.add_parser("transliterate", help="transliterate columns (reference mode)")
    t.add_argument("--input", required=True)
    t.add_argument("--fields", required=True, help="comma-separated column names")
    t.add_argument("--target-lang", required=True, choices=["ru", "en"])
    t.add_argument("--standard", default="Passport")
    t.add_argument("--name-fields", default=None)
    t.add_argument("--format", default=None)
    t.add_argument("--output", required=True)
    t.add_argument("--output-format", default="parquet")
    t.set_defaults(fn=cmd_transliterate)

    g = sub.add_parser("generate", help="synthetic person-record pairs (reference mode)")
    g.add_argument("--count", type=int, default=100)
    g.add_argument("--language", default="mixed", choices=["ru", "en", "mixed"])
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--output-original", required=True)
    g.add_argument("--output-variant", required=True)
    g.set_defaults(fn=cmd_generate)

    gt = sub.add_parser("generate-transcripts", help="synthetic transcripts table + truth")
    gt.add_argument("--count", type=int, default=1000, help="number of base conversations")
    gt.add_argument("--seed", type=int, default=42)
    gt.add_argument("--output", required=True)
    gt.set_defaults(fn=cmd_generate_transcripts)

    d = sub.add_parser("dedup", help="near-dup detection + clustering (flagship)")
    d.add_argument("--input", required=True, help="transcripts Parquet dir")
    d.add_argument("--output", required=True)
    d.add_argument("--workdir", default=None, help="checkpoint dir (resume)")
    d.add_argument("--channels", default="minhash",
                   help="comma list from the channel registry (minhash,simhash,substring,…)")
    d.add_argument("--attach", default="auto", choices=["auto", "broadcast", "shuffle"],
                   help="verify payload path (shuffle = beyond-broadcast scale)")
    d.add_argument("--num-partitions", type=int, default=16)
    d.add_argument("--partition-output", action="store_true",
                   help="write clusters as one directory per conv_id hash bucket")
    d.set_defaults(fn=cmd_dedup)

    c = sub.add_parser("curate", help="filter+dedup+sample documents for training")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--min-tokens", type=int, default=10)
    c.add_argument("--lang", default="en")
    c.add_argument("--sample-hex", default="aa")
    c.set_defaults(fn=cmd_curate)

    inc = sub.add_parser(
        "incremental", help="dedup a NEW batch against a checkpointed base corpus"
    )
    inc.add_argument("--new", required=True, help="new-batch documents Parquet")
    inc.add_argument("--base", required=True, help="base-corpus documents Parquet")
    inc.add_argument("--output", required=True)
    inc.add_argument("--workdir", default=None,
                     help="base docs+signatures checkpoint dir (reused across ingests)")
    inc.add_argument("--id-col", default="doc_id")
    inc.add_argument("--text-col", default="text")
    inc.set_defaults(fn=cmd_incremental)

    rn = sub.add_parser("run", help="declarative pipeline from a JSON step spec")
    rn.add_argument("--config", required=True, help="JSON: {steps: [{op, ...params}]}")
    rn.add_argument("--input", required=True, help="documents parquet path")
    rn.add_argument("--output", required=True)
    rn.add_argument("--num-cpus", type=int, default=None)
    rn.set_defaults(fn=cmd_run)

    rp = sub.add_parser("report", help="dedup dashboard: cluster sizes, per-source rates, novelty")
    rp.add_argument("--input", required=True, help="documents parquet path")
    rp.add_argument("--output", required=True)
    rp.add_argument("--group-col", default="source", dest="group_col")
    rp.add_argument("--num-cpus", type=int, default=None)
    rp.set_defaults(fn=cmd_report)

    s = sub.add_parser("search", help="BM25 ranked keyword search")
    s.add_argument("--input", required=True)
    s.add_argument("--query", required=True, help="space-separated terms")
    s.add_argument("--top-k", type=int, default=20)
    s.set_defaults(fn=cmd_search)

    pk = sub.add_parser("pack", help="concat-and-chunk sequence packing layout")
    pk.add_argument("--input", required=True)
    pk.add_argument("--output", required=True)
    pk.add_argument("--budget", type=int, default=512)
    pk.add_argument("--num-shards", type=int, default=64)
    pk.set_defaults(fn=cmd_pack)

    mn = sub.add_parser(
        "menu",
        help="interactive menu (reference cli/main.py UX: demos, launchers, help)",
    )
    mn.add_argument("--num-cpus", type=int, default=None)
    mn.set_defaults(fn=cmd_menu)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    code = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
