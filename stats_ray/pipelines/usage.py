"""Flagship pipeline: battles (tokens) -> parse -> route -> aggregates.

Mirrors `process smogon/stats` (workflows/smogon/stats.ts; SURVEY.md §3.1)
as a Ray Data streaming pipeline:

  read_parquet(battles)                      # S1: pruned columnar read
    -> filter skipped formats (F1)           # vectorized Arrow predicate
    -> map_batches(ParseBattles, actor pool) # M1-M14 + weights (A1/A2)
    -> write_parquet(parsed/, partitioned by format)   # S7 routing sink
    -> per-family explode + partial combine + groupby-sum (A3-A9)

`parse_pipeline` keeps everything lazy; `run_flagship` routes the parsed
battles to a per-format partitioned Parquet sink once and then runs every
aggregate family off the routed copy (column-pruned re-reads), which is the
resumable checkpoint layout (S4): a rerun can skip finished partitions.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

from ..stages import aggregate as agg
from ..stages.parse import ParseBattles
from .. import dex

_SKIP_RE = "|".join(dex.SKIP_FORMAT_MARKERS)


def read_battles(corpus_dir: str, columns=None) -> Dataset:
    return ray.data.read_parquet(f"{corpus_dir}/battles", columns=columns)


def filter_formats(ds: Dataset) -> Dataset:
    """F1 format gate — vectorized on `source` (format is the path prefix)."""
    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.match_substring_regex(t["source"], _SKIP_RE)))
    return ds.map_batches(_keep, batch_format="pyarrow")


def _default_concurrency() -> int:
    """Fixed actor-pool size: ~7/8 of the cluster (proportional headroom for
    read/shuffle tasks at every cluster size). A fixed pool starts every
    actor immediately — the autoscaling (1, N) ramp was the dominant cost at
    high CPU counts."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus - max(1, cpus // 8))


def parse_pipeline(corpus_dir: str, *, strict: bool = True,
                   concurrency=None, batch_size: int = 256) -> Dataset:
    ds = read_battles(corpus_dir)
    ds = filter_formats(ds)
    return ds.map_batches(
        ParseBattles, fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_concurrency())


def parse_with_quarantine(corpus_dir: str, *, concurrency=None,
                          batch_size: int = 256) -> tuple[Dataset, Dataset]:
    """Fault-tolerant parse: returns (good, errors). A malformed battle
    never kills the job and never silently vanishes — it lands in the
    errors dataset as (doc_id, source, parse_error), ready for a
    quarantine sink. The good side carries the regular PARSED_SCHEMA."""
    ds = filter_formats(read_battles(corpus_dir))
    tagged = ds.map_batches(
        ParseBattles,
        fn_constructor_kwargs={"strict": False, "quarantine": True},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_concurrency())

    def only_good(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["parse_error"], "")
        if pc.all(keep).as_py():
            return t.drop_columns(["parse_error"])
        return t.filter(keep).drop_columns(["parse_error"])

    def only_errors(t: pa.Table) -> pa.Table:
        bad = pc.invert(pc.equal(t["parse_error"], ""))
        return t.select(["doc_id", "source", "parse_error"]).filter(bad)

    return (tagged.map_batches(only_good, batch_format="pyarrow"),
            tagged.map_batches(only_errors, batch_format="pyarrow"))


def route_parsed(parsed: Dataset, out_dir: str) -> None:
    """S7/S4: per-format partitioned, resumable sink."""
    parsed.write_parquet(out_dir, partition_cols=["format"])


AGG_FAMILIES = {
    "usage": agg.usage_stats,
    "movesets": agg.moveset_stats,
    "leads": agg.lead_stats,
    "battles": agg.battle_counts,
    "encounters": agg.encounter_stats,
    "teammates": agg.teammate_stats,
    "teammates_empty": agg.teammate_empty_lastwriter,
    "metagame": agg.metagame_stats,
    "unique": agg.unique_player_rollup,
    "unique_total": lambda parsed: agg.unique_total_rollup(
        agg._per_player_max(parsed)),
    "viability": agg.viability_stats,
    "stalliness": agg.stalliness_stats,
}

def all_stats(parsed: Dataset) -> dict[str, object]:
    """Compute every aggregate family with the minimal number of shuffles:
    one fused hash-bucket exchange for the 4 high-cardinality families, one
    shared per-player pass for unique+viability, native groupbys (run
    concurrently by the caller) for the small-key families.

    Returns {family: Dataset}; the fused base is materialized once."""
    fused = agg.fused_highcard(parsed).materialize()
    out = {name: split(fused) for name, split in agg.FUSED_SPLITS.items()}
    uniq, viab = agg.unique_and_viability(parsed)
    out["unique"] = uniq
    out["viability"] = viab
    for name in ("usage", "leads", "battles", "metagame"):
        out[name] = AGG_FAMILIES[name](parsed)
    return out


# families feeding the report renderers (stages.reports.collect_view)
REPORT_FAMILIES = ["usage", "movesets", "leads", "battles", "encounters",
                   "teammates", "teammates_empty", "metagame", "viability",
                   "stalliness", "unique", "unique_total"]


def render_reports(parsed: Dataset, out_dir: str, *, formats=None,
                   dex_name: str = "synth") -> dict:
    """S7 report fan-out: compute the report-feeding aggregates once, then
    render the 5 legacy reports + display JSON per (format, cutoff) into
    out_dir/{usage,leads,moveset,chaos,metagame,display}/.

    Returns {(format, cutoff): paths}. Aggregates stream through Ray; the
    per-(format, cutoff) render is driver-side small work."""
    import os

    from ..gendex import get_dex
    from ..stages import reports as R

    dx = get_dex(dex_name)
    aggs = {name: AGG_FAMILIES[name](parsed).to_pandas()
            for name in REPORT_FAMILIES}
    pairs = (aggs["battles"][["format", "cutoff"]]
             .drop_duplicates().itertuples(index=False))
    written = {}
    for fmt, cutoff in pairs:
        if formats and fmt not in formats:
            continue
        view = R.collect_view(aggs, fmt, int(cutoff), dx)
        movesets = R.to_moveset_statistics(view, fmt)
        outputs = {
            "usage": R.usage_report(view),
            "leads": R.leads_report(view),
            "moveset": R.moveset_report(view, movesets),
            "chaos": R.detailed_moveset_report(view, movesets=movesets),
            "metagame": R.metagame_report(view),
            "display": R.display_statistics(view),
        }
        paths = {}
        for kind, text in outputs.items():
            ext = "json" if kind in ("chaos", "display") else "txt"
            d = os.path.join(out_dir, kind)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{fmt}-{int(cutoff)}.{ext}")
            with open(path, "w") as f:
                f.write(text)
            paths[kind] = path
        written[(fmt, int(cutoff))] = paths
    return written


def project_tag(parsed: Dataset, fmt: str, tag: str) -> Dataset:
    """Tag-shard projection (stats.ts:157-199 updateTagged for one tag):
    keep only <fmt> battles; for each side whose team lacks <tag>, drop its
    slots / tags (no per-species, metagame or stalliness contribution) and
    sentinel its lead as 'skip' (no lead count) — while the battle itself
    still counts for battles/encounters with the original min weights."""

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["format"], fmt)
        t = t.filter(keep)
        if len(t) == 0:
            return t
        import numpy as np
        out = {name: t[name] for name in t.column_names}
        for j, side in enumerate(("p1", "p2")):
            tags = t[f"{side}_tags"].to_pylist()
            has = np.array([tag in (ts or []) for ts in tags])
            # drop untagged side's tags
            out[f"{side}_tags"] = pa.array(
                [ts if h else [] for ts, h in zip(tags, has)],
                type=pa.list_(pa.string()))
            # sentinel untagged side's lead
            leads = t[f"lead{j + 1}"].to_pylist()
            out[f"lead{j + 1}"] = pa.array(
                [ld if (h or ld == "empty") else "skip"
                 for ld, h in zip(leads, has)])
        # drop untagged sides' slots
        slots = t["slots"].to_pylist()
        p1tag = [len(ts) > 0 for ts in out["p1_tags"].to_pylist()]
        p2tag = [len(ts) > 0 for ts in out["p2_tags"].to_pylist()]
        out["slots"] = pa.array(
            [[s for s in sl
              if (s["side"] == 1 and h1) or (s["side"] == 2 and h2)]
             for sl, h1, h2 in zip(slots, p1tag, p2tag)],
            type=t.schema.field("slots").type)
        return pa.table(out)

    return parsed.map_batches(fn, batch_format="pyarrow")


def render_monotype_reports(parsed: Dataset, out_dir: str,
                            fmt: str = "gen9monotype",
                            tags=None, dex_name: str = "synth") -> dict:
    """Per-shard report fan-out (workflows/smogon/stats.ts:110-121,159-196):
    the full report set per mono<type> shard under out_dir/monotype/<tag>/."""
    import os

    from .. import dex as dexmod
    from ..gendex import get_dex
    from ..stages import reports as R

    dx = get_dex(dex_name)
    written = {}
    for tag in (tags or dexmod.MONOTYPE_SHARDS):
        shard = project_tag(parsed, fmt, tag).materialize()
        if shard.count() == 0:
            continue
        aggs = {name: AGG_FAMILIES[name](shard).to_pandas()
                for name in REPORT_FAMILIES}
        for cutoff in dexmod.cutoffs_for(fmt):
            view = R.collect_view(aggs, fmt, cutoff, dx)
            movesets = R.to_moveset_statistics(view, fmt)
            outputs = {
                "usage": R.usage_report(view),
                "leads": R.leads_report(view),
                "moveset": R.moveset_report(view, movesets),
                "chaos": R.detailed_moveset_report(view, tag=tag,
                                                   movesets=movesets),
                "metagame": R.metagame_report(view),
                "display": R.display_statistics(view),
            }
            d = os.path.join(out_dir, "monotype", tag)
            os.makedirs(d, exist_ok=True)
            paths = {}
            for kind, text in outputs.items():
                ext = "json" if kind in ("chaos", "display") else "txt"
                path = os.path.join(d, f"{fmt}-{cutoff}.{kind}.{ext}")
                with open(path, "w") as f:
                    f.write(text)
                paths[kind] = path
            written[(tag, cutoff)] = paths
    return written


def run_flagship(corpus_dir: str, out_dir: str, *, families=None,
                 concurrency=None) -> dict[str, int]:
    """Parse once, route to parquet, then aggregate each family from the
    routed copy — resumable: every stage is a checkpointed partition (S4),
    so a rerun skips completed work. Returns row counts per family."""
    from .. import __version__
    from ..state.checkpoints import Manifest

    manifest = Manifest(out_dir, lineage={"corpus": corpus_dir,
                                          "engine": __version__})

    def do_parse(tmp: str) -> dict:
        parsed = parse_pipeline(corpus_dir, concurrency=concurrency)
        route_parsed(parsed, tmp)
        return {"rows": ray.data.read_parquet(tmp).count()}

    manifest.run("parsed", do_parse)
    routed = ray.data.read_parquet(manifest.partition_dir("parsed"))

    counts = {}
    for name in (families or AGG_FAMILIES):
        def do_agg(tmp: str, fn=AGG_FAMILIES[name]) -> dict:
            out = fn(routed)
            out.write_parquet(tmp)
            return {"rows": ray.data.read_parquet(tmp).count()}

        entry = manifest.run(f"agg-{name}", do_agg)
        counts[name] = entry["metrics"]["rows"]
    return counts
