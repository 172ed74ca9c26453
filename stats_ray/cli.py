"""CLI entry points — the `process <worker>` analogue (SURVEY §2.11,
reference `process:65-125`). Each subcommand owns its Ray session (guarded
init); library code never calls ray.init.

Usage:
  python -m stats_ray.cli stats  --corpus DIR --out DIR [--families a,b]
  python -m stats_ray.cli reports --corpus DIR --out DIR [--formats f1,f2]
  python -m stats_ray.cli anon   --corpus DIR --out DIR [--salt S] [--rate R]
  python -m stats_ray.cli db     --corpus DIR --out DIR
  python -m stats_ray.cli db-cutoff  --db DIR --percentile 0.9
  python -m stats_ray.cli db-sizes   --db DIR [--cutoff 1630]
  python -m stats_ray.cli db-display --db DIR [--cutoff 1630] [--moves N]
  python -m stats_ray.cli tiers  --corpus DIR --out FILE
  python -m stats_ray.cli synth  --sf 0.01 [--n N]

Cluster runs: every subcommand is `ray job submit`-able —

  ray job submit --working-dir . -- \
      python -m stats_ray.cli stats --corpus s3://... --out s3://...

The job runner sets RAY_ADDRESS to the cluster head; the guarded init
below connects to it instead of starting a local session, so the same
command line works standalone (RAY_ADDRESS unset or "local") and on a
multi-node cluster.
"""

from __future__ import annotations

import argparse
import json
import os


def _ray():
    import logging

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local":
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        else:
            # `ray job submit` / existing cluster: connect, don't start.
            ray.init(address=addr, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def cmd_stats(args):
    _ray()
    from .pipelines.usage import run_flagship
    corpus = args.corpus
    lineage_extra = None
    if getattr(args, "from_logs", False):
        # Raw-log tree ingest (S2): map YYYY-MM-DD/format trees into the
        # tokens-contract Parquet layout ONCE (under out/ingested), then
        # run the flagship with its full shard-granular resume on top.
        # Idempotent: a completed ingest is marked and skipped on re-run
        # (write_parquet APPENDS files, so a blind re-ingest would
        # duplicate every battle); an interrupted one is rebuilt fresh.
        import shutil

        from . import __version__
        from .sources.logs import read_logs_tree, tree_fingerprint
        # absolute: this path lands in the resume lineage AND in cleanup's
        # lineage-path protection, both of which must not depend on the
        # cwd the run (or a later `cleanup`) happens to start from
        ingested = os.path.join(os.path.abspath(args.out), "ingested")
        marker = os.path.join(ingested, "_INGESTED.json")
        fmt_list = args.formats.split(",") if args.formats else None
        # the marker keys on the selection AND the selected files' content
        # fingerprint AND the engine version: files arriving later within
        # the same range, or a tokenizer change, both force re-ingest
        spec = {"root": os.path.abspath(args.corpus), "begin": args.begin,
                "end": args.end, "formats": args.formats,
                "tree": tree_fingerprint(args.corpus, begin=args.begin,
                                         end=args.end, formats=fmt_list),
                "engine": __version__}
        done = None
        if os.path.exists(marker):
            try:
                with open(marker) as f:
                    done = json.load(f)
            except (json.JSONDecodeError, OSError):
                done = None  # torn marker (killed mid-write): rebuild
        if done != spec:
            shutil.rmtree(ingested, ignore_errors=True)
            ds = read_logs_tree(args.corpus,
                                begin=args.begin, end=args.end,
                                formats=fmt_list)
            ds.write_parquet(os.path.join(ingested, "battles"))
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                json.dump(spec, f)
            os.replace(tmp, marker)  # atomic: never leaves a torn marker
        corpus = ingested
        # the ingested corpus path is FIXED under out/, so the ingest spec
        # must be part of the flagship's resume lineage — otherwise a
        # re-ingest with a new range would not invalidate old checkpoints
        lineage_extra = {"ingest": spec}
    counts = run_flagship(corpus, args.out,
                          families=args.families.split(",") if args.families
                          else None, lineage_extra=lineage_extra)
    print(json.dumps(counts))


def cmd_reports(args):
    _ray()
    from .pipelines.usage import parse_pipeline, render_reports
    parsed = parse_pipeline(args.corpus).materialize()
    written = render_reports(parsed, args.out,
                             formats=args.formats.split(",") if args.formats
                             else None)
    print(json.dumps({f"{k[0]}-{k[1]}": sorted(v) for k, v in written.items()}))


def cmd_mono_reports(args):
    _ray()
    from .pipelines.usage import parse_pipeline, render_monotype_reports
    parsed = parse_pipeline(args.corpus).materialize()
    written = render_monotype_reports(
        parsed, args.out, fmt=args.format,
        tags=args.tags.split(",") if args.tags else None)
    print(json.dumps({f"{k[0]}-{k[1]}": sorted(v) for k, v in written.items()}))


def cmd_anon(args):
    _ray()
    from .stages.anon import anonymize_pipeline, ordinal_rename
    import ray.data
    ds = anonymize_pipeline(args.corpus, salt=args.salt, rate=args.rate)
    ds = ordinal_rename(ds)
    ds.write_parquet(args.out)
    print(json.dumps({"rows": ray.data.read_parquet(args.out).count()}))


def cmd_db(args):
    _ray()
    import ray.data
    from .pipelines.usage import parse_pipeline
    from .stages.binary import binary_db
    parsed = parse_pipeline(args.corpus)
    binary_db(parsed, args.out)
    print(json.dumps({"rows": ray.data.read_parquet(args.out).count()}))


def cmd_compact(args):
    """Small-file compaction: re-emit a Parquet directory as ~target-MB
    files (the reference's 10M-files/month pain, solved at the layout)."""
    _ray()
    from .ops.io import compact_parquet
    print(json.dumps(compact_parquet(
        args.input, args.out, target_mb=args.target_mb,
        partition_cols=args.partition_cols.split(",")
        if args.partition_cols else None)))


def cmd_db_cutoff(args):
    """tools/stats `cutoff` analogue: percentile of the binary db's codec
    ratings per format."""
    _ray()
    import ray.data
    from .stages.binary import db_rating_percentile
    df = db_rating_percentile(ray.data.read_parquet(args.db),
                              args.percentile)
    print(df.to_json(orient="records"))


def cmd_db_sizes(args):
    """tools/stats `sizes` analogue: percentile table of per-species
    qualifying move/item counts at a weighting cutoff."""
    _ray()
    import ray.data
    from .stages.binary import binary_stats_tables, db_sizes_table
    stats = binary_stats_tables(ray.data.read_parquet(args.db),
                                cutoff=args.cutoff).to_pandas()
    print(db_sizes_table(stats).to_json(orient="records"))


def cmd_db_display(args):
    """tools/stats `display --report=pokemon` analogue: per-format JSON of
    species usage/lead/move/item percentages from the binary db."""
    _ray()
    import ray.data
    from .stages.binary import binary_stats_tables, db_display_pokemon
    stats = binary_stats_tables(ray.data.read_parquet(args.db),
                                cutoff=args.cutoff).to_pandas()
    print(json.dumps(db_display_pokemon(stats, n_moves=args.moves,
                                        n_items=args.items)))


def cmd_tiers(args):
    _ray()
    from .dex import cutoffs_for
    from .pipelines.usage import parse_pipeline
    from .stages.tiers import TIER_FORMATS, monthly_reports, tier_update_report
    parsed = parse_pipeline(args.corpus).materialize()
    reports = monthly_reports(parsed)
    out = tier_update_report(reports, {},
                             {f: cutoffs_for(f)[2] for _, f in TIER_FORMATS})
    with open(args.out, "w") as f:
        f.write(out)
    print(json.dumps({"bytes": len(out)}))


def cmd_convert(args):
    from .stages.convert import convert_reports
    out = convert_reports(args.reports, args.out, split=args.split)
    print(json.dumps({"converted": len(out)}))


def cmd_synth(args):
    _ray()
    from . import synth
    if args.n:
        synth.build_corpus(args.out or synth.corpus_dir(args.sf), args.n)
        print(json.dumps({"dir": args.out or synth.corpus_dir(args.sf),
                          "n": args.n}))
    else:
        d = synth.ensure_corpus(args.sf)
        print(json.dumps({"dir": d}))


def cmd_curate(args):
    """Resumable document curation: clean gates -> pack survivors ->
    shard-partitioned Parquet (pipelines/curate.py)."""
    _ray()
    from .pipelines.curate import run_curation
    counts = run_curation(args.sf_dir, args.out, capacity=args.capacity,
                          n_shards=args.shards)
    print(json.dumps(counts))


def cmd_quarantine(args):
    """Fault-tolerant parse: good rows to out/parsed (partitioned by
    format), malformed battles to out/errors with their parse_error."""
    _ray()
    import os

    from .pipelines.usage import parse_with_quarantine
    good, errors = parse_with_quarantine(args.corpus)
    good.write_parquet(os.path.join(args.out, "parsed"),
                       partition_cols=["format"])
    err = errors.to_pandas()
    if err.empty:  # a fully-empty dataset drops its schema in to_pandas
        import pandas as pd
        err = pd.DataFrame({c: pd.Series(dtype=str)
                            for c in ("doc_id", "source", "parse_error")})
    os.makedirs(os.path.join(args.out, "errors"), exist_ok=True)
    err.to_parquet(os.path.join(args.out, "errors", "errors.parquet"),
                   index=False)
    print(json.dumps({"good": int(good.count()), "errors": len(err)}))


def cmd_cleanup(args):
    """GC a checkpoint/manifest root: orphaned *.tmp-* scratch always;
    manifest-unreferenced partitions with --unreferenced; --tombstone
    reclaims named completed partitions' space, keeping resume markers
    (logs/DESIGN.md:39-87). Pure filesystem — no Ray session."""
    from .state.checkpoints import Manifest, cleanup_root
    removed = cleanup_root(args.root,
                           remove_unreferenced=args.unreferenced,
                           min_tmp_age_sec=args.tmp_age)
    tombstoned = []
    if args.tombstone:
        m = Manifest(args.root, match_any_lineage=True)
        for key in args.tombstone.split(","):
            if m.tombstone(key):
                tombstoned.append(key)
    removed["tombstoned"] = tombstoned
    print(json.dumps(removed))


def cmd_run(argv):
    """`run` — the `process <worker>` analogue with dynamic worker loading
    (process:65-101): parse the base options first, load the worker (by
    registry name, module:Class, or /path/to/file.py:Class), merge the
    worker's own option descriptors into a second parser, then re-parse the
    remaining argv STRICTLY so unknown arguments fail loudly only once the
    full option set is registered."""
    from .workers import load_worker, run_worker, worker_options

    base = argparse.ArgumentParser(prog="stats_ray run")
    base.add_argument("--worker", required=True,
                      help="registry name (e.g. stats/usage), module:Class, "
                           "or /path/to/worker.py:Class")
    base.add_argument("--corpus", required=True)
    base.add_argument("--out", required=True)
    known, rest = base.parse_known_args(argv)

    cls = load_worker(known.worker)
    wp = argparse.ArgumentParser(
        prog=f"stats_ray run --worker {known.worker}")
    for name, o in worker_options(cls).items():
        alias = o.get("alias") or []
        alias = [alias] if isinstance(alias, str) else list(alias)
        flags = [f"--{name}"] + [f"-{a}" if len(a) == 1 else f"--{a}"
                                 for a in alias]
        wp.add_argument(*flags, dest=name, type=o.get("parse", str),
                        default=o.get("default"), help=o.get("desc", ""))
    config = vars(wp.parse_args(rest))  # strict: unknown args error here

    _ray()
    counts = run_worker(cls, known.corpus, known.out, config)
    print(json.dumps(counts))


def main(argv=None):
    if argv is None:
        import sys
        argv = sys.argv[1:]
    if argv and argv[0] == "run":
        # two-phase worker-option parsing can't pre-declare its arguments,
        # so `run` owns its own argv (mirroring the reference's reparse)
        try:
            return cmd_run(argv[1:])
        finally:
            import ray
            if ray.is_initialized():
                ray.shutdown()
    p = argparse.ArgumentParser(prog="stats_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("stats")
    sp.add_argument("--corpus", required=True,
                    help="tokens-contract Parquet dir, or with --from-logs "
                         "a raw <format>/<day>/*.log.json(.gz) tree")
    sp.add_argument("--out", required=True)
    sp.add_argument("--families", default=None)
    sp.add_argument("--from-logs", action="store_true", dest="from_logs")
    sp.add_argument("--begin", default=None,
                    help="inclusive first day (YYYY-MM-DD), with --from-logs")
    sp.add_argument("--end", default=None,
                    help="inclusive last day (YYYY-MM-DD), with --from-logs")
    sp.add_argument("--formats", default=None,
                    help="comma-separated format allowlist, with --from-logs")
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("reports")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--formats", default=None)
    sp.set_defaults(fn=cmd_reports)

    sp = sub.add_parser("mono-reports")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--format", default="gen9monotype")
    sp.add_argument("--tags", default=None)
    sp.set_defaults(fn=cmd_mono_reports)

    sp = sub.add_parser("anon")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--salt", default=None)
    sp.add_argument("--rate", type=float, default=1.0)
    sp.set_defaults(fn=cmd_anon)

    sp = sub.add_parser("db")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_db)

    sp = sub.add_parser("compact")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--target-mb", type=int, default=256, dest="target_mb")
    sp.add_argument("--partition-cols", default=None, dest="partition_cols")
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("db-cutoff")
    sp.add_argument("--db", required=True)
    sp.add_argument("--percentile", type=float, required=True)
    sp.set_defaults(fn=cmd_db_cutoff)

    sp = sub.add_parser("db-sizes")
    sp.add_argument("--db", required=True)
    sp.add_argument("--cutoff", type=float, default=1630.0)
    sp.set_defaults(fn=cmd_db_sizes)

    sp = sub.add_parser("db-display")
    sp.add_argument("--db", required=True)
    sp.add_argument("--cutoff", type=float, default=1630.0)
    sp.add_argument("--moves", type=int, default=20)
    sp.add_argument("--items", type=int, default=5)
    sp.set_defaults(fn=cmd_db_display)

    sp = sub.add_parser("tiers")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_tiers)

    sp = sub.add_parser("convert")
    sp.add_argument("--reports", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--split", action="store_true")
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("quarantine")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_quarantine)

    sp = sub.add_parser("curate")
    sp.add_argument("--sf-dir", required=True, dest="sf_dir")
    sp.add_argument("--out", required=True)
    sp.add_argument("--capacity", type=int, default=512)
    sp.add_argument("--shards", type=int, default=16)
    sp.set_defaults(fn=cmd_curate)

    sp = sub.add_parser("cleanup")
    sp.add_argument("--root", required=True,
                    help="checkpoint/manifest root to GC")
    sp.add_argument("--unreferenced", action="store_true",
                    help="also remove partitions no manifest entry "
                         "references")
    sp.add_argument("--tombstone", default=None,
                    help="comma-separated completed partition keys whose "
                         "data to reclaim (resume markers kept)")
    sp.add_argument("--tmp-age", type=float, default=3600.0,
                    help="only GC *.tmp-* scratch older than this many "
                         "seconds (guards a concurrently running job's "
                         "live scratch; 0 = remove regardless)")
    sp.set_defaults(fn=cmd_cleanup)

    sp = sub.add_parser("synth")
    sp.add_argument("--sf", default="0.001")
    sp.add_argument("--n", type=int, default=None)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    try:
        args.fn(args)
    finally:
        import ray
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    main()
