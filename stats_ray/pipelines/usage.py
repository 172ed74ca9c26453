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


def _shim_fsspec_http() -> None:
    """Make `fsspec.implementations.http` importable without aiohttp.

    Ray's path resolution probes `from fsspec.implementations.http import
    HTTPFileSystem` on EVERY read/write path resolve, catching only
    ModuleNotFoundError. With aiohttp absent the import fails every time
    and is retried every time; two driver threads resolving paths
    concurrently can then observe the partially-initialized module and get
    a plain ImportError, which escapes Ray's except and kills the job.
    Registering a stub module with a never-instantiated HTTPFileSystem
    makes the probe succeed deterministically (and still classify every
    real filesystem as non-HTTP, which is correct without aiohttp)."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module imports fine; nothing to do
    except ImportError:
        pass
    import importlib.machinery

    mod = types.ModuleType("fsspec.implementations.http")
    mod.__doc__ = "stats_ray stub: aiohttp absent, HTTP filesystems unusable"

    class HTTPFileSystem:
        """isinstance() target only; constructing one re-raises the real
        cause so an http:// path still fails with the clear message."""

        def __init__(self, *a, **k):
            raise ImportError(
                "HTTPFileSystem requires aiohttp, which is not installed")

    mod.HTTPFileSystem = HTTPFileSystem
    # a real __spec__ and a parent attribute keep every import form
    # working (`import fsspec.implementations.http as x`,
    # importlib.util.find_spec), not just `from ... import ...`
    mod.__spec__ = importlib.machinery.ModuleSpec(
        "fsspec.implementations.http", loader=None)
    sys.modules["fsspec.implementations.http"] = mod
    try:
        import fsspec.implementations
        fsspec.implementations.http = mod
    except ImportError:
        pass


_shim_fsspec_http()

_SKIP_RE = "|".join(dex.SKIP_FORMAT_MARKERS)


def read_battles(corpus_dir: str, columns=None, files=None) -> Dataset:
    """Battles table read; `files` restricts to an explicit file subset
    (the unit of per-partition resume in run_flagship)."""
    return ray.data.read_parquet(files or f"{corpus_dir}/battles",
                                 columns=columns)


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
                   concurrency=None, batch_size: int = 256,
                   files=None) -> Dataset:
    ds = read_battles(corpus_dir, files=files)
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


def _parquet_rows(root: str) -> int:
    """Row count from parquet FOOTERS only: re-reading just-written output
    through a full Dataset scan doubles the stage's read I/O at scale.
    Driver-side footer reads are metadata-sized (KBs/file) and the file
    count per partition is bounded by the write's block count."""
    import glob
    import os

    import pyarrow.parquet as pq

    # glob.escape: a root containing [, ], * or ? must match literally,
    # not as a pattern (silent rows=0 otherwise)
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(glob.escape(root),
                                               "**", "*.parquet"),
                                  recursive=True))


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


def report_aggs(parsed: Dataset) -> dict[str, Dataset]:
    """Every report-feeding family with shared shuffles: the 4
    high-cardinality families ride ONE fused hash-bucket exchange, and
    unique / viability / unique_total share ONE per-player max shuffle —
    instead of each family rebuilding its own exchange."""
    fused = agg.fused_highcard(parsed).materialize()
    out = {name: split(fused) for name, split in agg.FUSED_SPLITS.items()}
    per_player = agg._per_player_max(parsed).materialize()
    out["unique"] = agg._rollup_unique(per_player)
    out["viability"] = agg._rollup_viability(per_player)
    out["unique_total"] = agg.unique_total_rollup(per_player)
    for name in ("usage", "leads", "battles", "metagame", "teammates_empty"):
        out[name] = AGG_FAMILIES[name](parsed)
    return out


# families feeding the report renderers (stages.reports.collect_view)
REPORT_FAMILIES = ["usage", "movesets", "leads", "battles", "encounters",
                   "teammates", "teammates_empty", "metagame", "viability",
                   "stalliness", "unique", "unique_total"]

# per-family column pruning for re-reads of the routed parquet: a family
# re-read only loads the columns its explode actually touches
_W_COLS = [f"p{s}_w{k}" for s in (1, 2) for k in range(4)]
_M_COLS = [f"p{s}_m{k}" for s in (1, 2) for k in range(4)]
_COUNTED_COLS = ["short", "singles", "lead1", "lead2"]  # _batch_counted gate
_PLAYER_COLS = ["format", "slots", "short", "p1_gxe", "p2_gxe"] + _W_COLS

FAMILY_COLUMNS = {
    "usage": ["format", "slots", "short", "winner", "p1_valid", "p2_valid"]
             + _W_COLS + _M_COLS,
    "movesets": ["format", "slots"] + _M_COLS,
    "leads": ["format"] + _COUNTED_COLS + _W_COLS,
    "battles": ["format"] + _COUNTED_COLS,
    "encounters": ["format", "matchups"] + _COUNTED_COLS + _W_COLS,
    "teammates": ["format", "slots", "short"] + _W_COLS,
    "teammates_empty": ["format", "slots", "short", "doc_id"] + _W_COLS,
    "metagame": ["format", "slots", "short", "p1_tags", "p2_tags"] + _W_COLS,
    "stalliness": ["format", "slots", "short",
                   "p1_stalliness", "p2_stalliness"] + _W_COLS,
    "unique": _PLAYER_COLS,
    "unique_total": _PLAYER_COLS,
    "viability": _PLAYER_COLS,
}


class AggSpill:
    """Streaming hand-off from the aggregate families to the driver-side
    renderers: every family is written to a per-format hive-partitioned
    Parquet spill, and the renderer re-reads ONE format's slice at a time.
    The driver never holds all formats of all families at once — at a
    100x-format fan-out the peak driver footprint is one format's
    aggregate rows, not the whole species x kind x cutoff matrix."""

    def __init__(self, parsed: Dataset, spill_dir: str):
        import os

        self.dirs: dict[str, str] = {}
        self.parts: dict[str, dict[str, str]] = {}
        self._fallback_schemas: dict[str, object] = {}
        for name, ds in report_aggs(parsed).items():
            d = os.path.join(spill_dir, name)
            # materialize once: the aggregate output is already reduced
            # (object-store-sized, auto-spilled), the write streams from
            # the executed blocks, and schema() below is then metadata —
            # calling schema() on the un-materialized plan after
            # write_parquet would RE-EXECUTE the whole aggregation
            # (measured: 2x task count) just to learn column names
            ds = ds.materialize()
            ds.write_parquet(d, partition_cols=["format"])
            self.dirs[name] = d
            self.parts[name] = self._partitions(d)
            if not self.parts[name]:
                # a family with zero rows in EVERY format writes no files
                # at all, so _empty would have no schema source and
                # renderers would KeyError on column selection
                self._fallback_schemas[name] = ds.schema()
        self._empties: dict[str, "pd.DataFrame"] = {}

    @staticmethod
    def _partitions(d: str) -> dict[str, str]:
        import os
        from urllib.parse import unquote

        out = {}
        if os.path.isdir(d):
            for sub in os.listdir(d):
                if sub.startswith("format="):
                    out[unquote(sub.split("=", 1)[1])] = os.path.join(d, sub)
        return out

    def _empty(self, name: str) -> "pd.DataFrame":
        """Typed zero-row frame for a family with no rows in a format
        (schema from any written file; hive drops the format column, so it
        is re-added as a string)."""
        import glob
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        if name not in self._empties:
            files = glob.glob(os.path.join(self.dirs[name], "format=*", "*"))
            if files:
                df = pq.read_schema(files[0]).empty_table().to_pandas()
                df.insert(0, "format", pd.Series(dtype="object"))
            else:
                # globally-empty family: no spill files anywhere — fall back
                # to the schema captured at spill time so renderers can still
                # select this family's columns
                from ..schema import empty_frame
                df = empty_frame(self._fallback_schemas.get(name))
                if len(df.columns) and "format" not in df.columns:
                    df.insert(0, "format", pd.Series(dtype="object"))
            self._empties[name] = df
        return self._empties[name].copy()

    def formats(self) -> list[str]:
        """Formats present in the battle-count family (the render driver)."""
        return sorted(self.parts.get("battles", {}))

    def load(self, fmt: str) -> dict[str, "pd.DataFrame"]:
        """One format's slice of every family (pruned read of one hive
        directory per family)."""
        import pandas as pd

        out = {}
        for name in self.dirs:
            sub = self.parts[name].get(fmt)
            if sub is None:
                out[name] = self._empty(name)
            else:
                df = pd.read_parquet(sub)
                df.insert(0, "format", fmt)
                out[name] = df
        return out


def render_reports(parsed: Dataset, out_dir: str, *, formats=None,
                   dex_name: str = "synth") -> dict:
    """S7 report fan-out: compute the report-feeding aggregates once, spill
    them per-format, then render the 5 legacy reports + display JSON per
    (format, cutoff) into out_dir/{usage,leads,moveset,chaos,metagame,display}/.

    Returns {(format, cutoff): paths}. Aggregates stream through Ray into
    the per-format spill; the driver re-reads one format at a time (see
    AggSpill), so its footprint never scales with the number of formats."""
    import os
    import shutil
    import tempfile

    from ..gendex import get_dex
    from ..stages import reports as R

    dx = get_dex(dex_name)
    spill_dir = tempfile.mkdtemp(prefix="stats_ray_aggspill_")
    written = {}
    try:
        spill = AggSpill(parsed, spill_dir)
        for fmt in spill.formats():
            if formats and fmt not in formats:
                continue
            aggs = spill.load(fmt)
            cutoffs = sorted(aggs["battles"]["cutoff"].unique())
            for cutoff in cutoffs:
                view = R.collect_view(aggs, fmt, int(cutoff), dx)
                movesets = R.to_moveset_statistics(view, fmt)
                outputs = {
                    "usage": R.usage_report(view),
                    "leads": R.leads_report(view),
                    "moveset": R.moveset_report(view, movesets),
                    "chaos": R.detailed_moveset_report(view,
                                                       movesets=movesets),
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
    finally:
        shutil.rmtree(spill_dir, ignore_errors=True)
    return written


def _project_tags_batch(t: pa.Table, fmt: str, tags: list[str],
                        composite: bool) -> pa.Table:
    """Vectorized tag-shard projection (stats.ts:157-199 updateTagged):
    keep only <fmt> battles; for each side whose team lacks the tag, drop
    its slots / tags (no per-species, metagame or stalliness contribution)
    and sentinel its lead as 'skip' (no lead count) — while the battle
    itself still counts for battles/encounters with the original min
    weights. Emits one projected copy per tag; with composite=True the
    format column becomes '<fmt>\\x1f<tag>' so ONE format-keyed aggregation
    serves every shard."""
    import numpy as np

    from ..dex import SHARD_SEP

    t = t.filter(pc.equal(t["format"], fmt))
    n = len(t)
    if n == 0:
        return t

    # per-side tag membership: has[side][tag] -> bool[n]  (one flatten pass)
    has: dict[str, dict[str, np.ndarray]] = {}
    tag_par, tag_val, tag_counts = {}, {}, {}
    for side in ("p1", "p2"):
        col = t[f"{side}_tags"].combine_chunks()
        par = pc.list_parent_indices(col).to_numpy().astype(np.int64)
        vals = col.flatten()
        vnp = vals.to_numpy(zero_copy_only=False).astype(str)
        counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64)).astype(np.int64)
        tag_par[side], tag_val[side], tag_counts[side] = par, vals, counts
        has[side] = {}
        for tag in tags:
            h = np.zeros(n, dtype=bool)
            m = vnp == tag
            if m.any():
                h[par[m]] = True
            has[side][tag] = h

    slots_col = t["slots"].combine_chunks()
    sl_par = pc.list_parent_indices(slots_col).to_numpy().astype(np.int64)
    sl_flat = slots_col.flatten()
    sl_side = sl_flat.field("side").to_numpy()
    slots_type = t.schema.field("slots").type
    tags_type = t.schema.field("p1_tags").type
    lead1 = t["lead1"].to_numpy(zero_copy_only=False).astype(str)
    lead2 = t["lead2"].to_numpy(zero_copy_only=False).astype(str)

    def rebuild_list(values, par, counts, keep_battle, el_keep=None):
        """List column with per-battle keep mask (and optional per-element
        mask) applied — offsets from cumsum, values filtered once."""
        if el_keep is None:
            el_keep = keep_battle[par]
            new_counts = counts * keep_battle
        else:
            new_counts = np.bincount(par[el_keep], minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_counts, out=offsets[1:])
        vals = values.filter(pa.array(el_keep))
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), vals)

    pieces = []
    for tag in tags:
        h1, h2 = has["p1"][tag], has["p2"][tag]
        out = {name: t[name] for name in t.column_names}
        if composite:
            out["format"] = pa.array([f"{fmt}{SHARD_SEP}{tag}"] * n,
                                     pa.string())
        out["p1_tags"] = rebuild_list(
            tag_val["p1"], tag_par["p1"], tag_counts["p1"], h1).cast(tags_type)
        out["p2_tags"] = rebuild_list(
            tag_val["p2"], tag_par["p2"], tag_counts["p2"], h2).cast(tags_type)
        out["lead1"] = pa.array(
            np.where(h1 | (lead1 == "empty"), lead1, "skip"))
        out["lead2"] = pa.array(
            np.where(h2 | (lead2 == "empty"), lead2, "skip"))
        el_keep = np.where(sl_side == 1, h1[sl_par], h2[sl_par])
        out["slots"] = rebuild_list(
            sl_flat, sl_par, None, None, el_keep=el_keep).cast(slots_type)
        pieces.append(pa.table(out))
    return pa.concat_tables(pieces)


def project_tag(parsed: Dataset, fmt: str, tag: str) -> Dataset:
    """One tag shard, format key unchanged (single-shard path / tests)."""
    return parsed.map_batches(
        lambda t: _project_tags_batch(t, fmt, [tag], composite=False),
        batch_format="pyarrow")


def explode_tag_shards(parsed: Dataset, fmt: str, tags: list[str]) -> Dataset:
    """All shards in ONE pass: each <fmt> battle fans out into len(tags)
    projected rows keyed '<fmt>\\x1f<tag>', so every downstream
    format-keyed family aggregates all shards in a single exchange."""
    return parsed.map_batches(
        lambda t: _project_tags_batch(t, fmt, list(tags), composite=True),
        batch_format="pyarrow")


def render_monotype_reports(parsed: Dataset, out_dir: str,
                            fmt: str = "gen9monotype",
                            tags=None, dex_name: str = "synth") -> dict:
    """Per-shard report fan-out (workflows/smogon/stats.ts:110-121,159-196):
    the full report set per mono<type> shard under out_dir/monotype/<tag>/.

    One pipeline execution: the vectorized shard explode runs once and each
    aggregate family runs once over composite '<fmt>\\x1f<tag>' keys (ONE
    exchange per family for all 19 shards), instead of 19 sequential
    full passes."""
    import os

    from .. import dex as dexmod
    from ..gendex import get_dex
    from ..stages import reports as R

    import shutil
    import tempfile

    dx = get_dex(dex_name)
    tags = list(tags or dexmod.MONOTYPE_SHARDS)
    shards = explode_tag_shards(parsed, fmt, tags).materialize()
    if shards.count() == 0:
        return {}
    spill_dir = tempfile.mkdtemp(prefix="stats_ray_monospill_")
    written = {}
    try:
        # per-shard streaming render: each composite '<fmt>\x1f<tag>' key is
        # a hive partition of the spill, loaded one tag at a time — the
        # driver never holds all 19 shards' aggregates at once
        spill = AggSpill(shards, spill_dir)
        for tag in tags:
            comp = f"{fmt}{dexmod.SHARD_SEP}{tag}"
            aggs = spill.load(comp)
            for name, df in aggs.items():
                if len(df) and "format" in df.columns:
                    df["format"] = fmt
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
    finally:
        shutil.rmtree(spill_dir, ignore_errors=True)
    return written


def run_flagship(corpus_dir: str, out_dir: str, *, families=None,
                 concurrency=None, parse_shards: int = 8,
                 lineage_extra: dict | None = None) -> dict[str, int]:
    """Parse once (in `parse_shards` independently-checkpointed input
    shards), route to parquet, then aggregate each family from the routed
    copy. Resumable at PARTITION granularity (S4 / north rule): each parse
    shard is its own manifest entry with lineage + metrics, so a job that
    dies mid-parse re-runs only the unfinished shards — at 100 TB the
    parse is days of work and stage-level resume would repeat all of it.
    Aggregates are per-family entries (cheap relative to parse).
    Returns row counts per family."""
    import glob as _glob
    import os

    from .. import __version__
    from ..state.checkpoints import Manifest

    # lineage_extra lets a caller fold upstream provenance into the resume
    # key — e.g. the --from-logs ingest spec: the ingested corpus lives at
    # a FIXED path under out/, so without the spec a re-ingest with a new
    # date range would not invalidate these checkpoints and a resumed run
    # would silently return the old range's results.
    manifest = Manifest(out_dir, lineage={"corpus": corpus_dir,
                                          "engine": __version__,
                                          **(lineage_extra or {})})

    all_files = [p for p in _glob.glob(f"{corpus_dir}/battles/**/*",
                                       recursive=True)
                 if os.path.isfile(p)
                 and not os.path.basename(p).startswith(("_", "."))]
    files = sorted(p for p in all_files if p.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(
            f"run_flagship: no .parquet files under {corpus_dir}/battles")
    if len(files) != len(all_files):
        # a data file without the .parquet extension would be silently
        # excluded from every shard (data loss, not an error) — fail loudly
        extra = sorted(set(all_files) - set(files))[:5]
        raise ValueError(
            f"run_flagship: {len(all_files) - len(files)} non-.parquet data "
            f"files under {corpus_dir}/battles would be skipped: {extra}")
    k = max(1, min(parse_shards, len(files)))
    # deterministic round-robin split: shard membership is a pure function
    # of the sorted file list, so a resumed run sees identical shards
    units = [files[i::k] for i in range(k)]

    # shards run SEQUENTIALLY: each shard's parse uses a fixed-size actor
    # pool sized to ~7/8 of the cluster, so two in flight would deadlock
    # waiting on each other's actor reservations (measured, not
    # hypothetical). The spin-up bubble per shard is seconds; at real
    # scale each shard is minutes-to-hours of work and the bubble is
    # noise.
    for i, unit in enumerate(units):
        def do_parse(tmp: str, unit=unit) -> dict:
            parsed = parse_pipeline(corpus_dir, concurrency=concurrency,
                                    files=unit)
            route_parsed(parsed, tmp)
            return {"rows": _parquet_rows(tmp),
                    "input_files": len(unit)}

        manifest.run(f"parsed-{i:04d}", do_parse)
    routed_dirs = [manifest.partition_dir(f"parsed-{i:04d}")
                   for i in range(k)]

    def routed_union(cols):
        # column-pruned re-read: only the columns the consumer's explode
        # touches leave storage. One lazy read per parse shard, unioned
        # (read_parquet rejects a list of hive roots, and a union keeps
        # each root's partition-column inference intact).
        reads = [ray.data.read_parquet(d, columns=cols)
                 for d in routed_dirs]
        routed = reads[0]
        for r in reads[1:]:
            routed = routed.union(r)
        return routed

    def write_family(name: str, out) -> int:
        # `out` is only consumed when the key is NOT already done
        def do_write(tmp: str) -> dict:
            out.write_parquet(tmp)
            return {"rows": _parquet_rows(tmp)}

        return manifest.run(f"agg-{name}", do_write)["metrics"]["rows"]

    # dedup while preserving order: duplicate names (e.g. a repeated
    # --families entry) would otherwise spawn two concurrent jobs writing
    # the SAME manifest key, racing the final-dir rename
    names = list(dict.fromkeys(families or AGG_FAMILIES))

    # Shared-intermediate groups: the 4 high-cardinality families come out
    # of ONE fused exchange (agg.fused_highcard — the same path bench.py
    # uses; key sets identical to the standalone fns, weights equal up to
    # FP combine order), and the 3 per-player rollups share ONE per-player
    # shuffle. The group intermediate is materialized once —
    # aggregate-sized, not input-sized, so it fits the object store at any
    # input scale — and each member family keeps its OWN manifest key, so
    # resume granularity is unchanged. A group recomputes its intermediate
    # only when at least one member is missing.
    FUSED_G = [n for n in agg.FUSED_SPLITS if n in names]
    PLAYER_G = [n for n in ("unique", "viability", "unique_total")
                if n in names]
    solo = [n for n in names if n not in FUSED_G and n not in PLAYER_G]

    def fused_group() -> dict[str, int]:
        todo = [n for n in FUSED_G if not manifest.done(f"agg-{n}")]
        src: dict[str, object] = {}
        if todo:
            # _explode_fused computes ALL four families regardless of which
            # were requested, so the pruned read must carry all four
            # families' columns even when FUSED_G is a subset
            cols = sorted(set().union(
                *(FAMILY_COLUMNS[n] for n in agg.FUSED_SPLITS)))
            fused = agg.fused_highcard(routed_union(cols)).materialize()
            src = {n: agg.FUSED_SPLITS[n](fused) for n in todo}
        return {n: write_family(n, src.get(n)) for n in FUSED_G}

    def player_group() -> dict[str, int]:
        todo = [n for n in PLAYER_G if not manifest.done(f"agg-{n}")]
        src: dict[str, object] = {}
        if todo:
            per_player = agg._per_player_max(
                routed_union(FAMILY_COLUMNS["unique"])).materialize()
            rollups = {"unique": agg._rollup_unique,
                       "viability": agg._rollup_viability,
                       "unique_total": agg.unique_total_rollup}
            src = {n: rollups[n](per_player) for n in todo}
        return {n: write_family(n, src.get(n)) for n in PLAYER_G}

    def solo_one(name: str) -> dict[str, int]:
        out = None
        if not manifest.done(f"agg-{name}"):
            out = AGG_FAMILIES[name](routed_union(FAMILY_COLUMNS.get(name)))
        return {name: write_family(name, out)}

    # groups and solo families run CONCURRENTLY from driver threads:
    # overlapping the Dataset executions keeps the cluster saturated
    # instead of paying each stage's read+shuffle latency serially.
    # Manifest appends are lock-serialized; every key is distinct.
    jobs = []
    if FUSED_G:
        jobs.append(fused_group)
    if PLAYER_G:
        jobs.append(player_group)
    jobs.extend(lambda n=n: solo_one(n) for n in solo)
    counts: dict[str, int] = {}
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(6, max(1, len(jobs)))) as ex:
        for res in ex.map(lambda j: j(), jobs):
            counts.update(res)
    return {n: counts[n] for n in names}
