"""Dynamic worker-module extension surface (SURVEY §2.11).

The reference's `process` driver accepts a worker by registry name OR by a
path to foreign worker code, merges the worker's own CLI option descriptors
into the argument parser, and re-parses argv once the full option set is
known (`/root/reference/process:18-27,65-101`). A worker module exposes
`options` / `init` / `accept` / `apply` / `combine`
(`logs/src/worker.ts:14-29`).

The Ray-Data-first translation: a worker is a CLASS whose `apply` is a
Dataset -> Dataset transform (so the engine keeps streaming execution and
the worker composes `map_batches`/`groupby` itself), with the same
surrounding protocol:

    class Worker:
        options = {                      # merged into the CLI (two-phase)
            "threshold": {"desc": "...", "alias": ["t"],
                          "parse": float, "default": 0.5},
        }
        def __init__(self, config: dict): ...   # init(config) analogue
        def accept(self, fmt: str) -> bool: ... # optional format gate
        def apply(self, ds) -> "ray.data.Dataset": ...      # required
        def combine(self, fmt: str, df): ...    # optional per-format merge

`accept` prunes formats BEFORE the worker runs (a partition-level filter,
like the reference's per-format batch selection); `combine` runs per format
inside `groupby("format").map_groups` — distributed, one task per format —
mirroring the reference's per-format checkpoint merge.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from typing import Any

# Built-in registry — the `workflows/` analogue (process:29-42; the
# reference ships exactly the stats and anon workflow workers). Names map
# to "module:Class" specs resolved through the same loader as foreign code.
BUILTIN_WORKERS: dict[str, str] = {
    "stats/usage": "stats_ray.workers:UsageWorker",
    "anon/anonymize": "stats_ray.workers:AnonWorker",
}


class UsageWorker:
    """Registry example: weighted usage per (format, cutoff, species)."""

    options = {
        "cutoff": {"desc": "single rating cutoff to keep (default: all)",
                   "parse": float, "default": None},
    }

    def __init__(self, config: dict):
        self.cutoff = config.get("cutoff")

    def apply(self, ds):
        from .stages import aggregate as agg
        out = agg.usage_stats(ds)
        if self.cutoff is not None:
            cutoff = self.cutoff
            out = out.filter(lambda r: r["cutoff"] == cutoff)
        return out


class AnonWorker:
    """Registry example over RAW logs: the anonymizer workflow (M8-M10)
    as a worker — deterministic rate sampling + full protocol anonymize,
    consuming the tokens contract directly like the reference's anon
    workflow consumes raw logs."""

    input = "raw"
    options = {
        "salt": {"desc": "hash salt for name anonymization", "parse": str,
                 "default": None},
        "rate": {"desc": "deterministic sample rate (0..1]", "alias": ["r"],
                 "parse": float, "default": 1.0},
    }

    def __init__(self, config: dict):
        self.salt = config.get("salt")
        self.rate = config.get("rate", 1.0)

    def apply(self, ds):
        from .stages.anon import AnonymizeBattles
        return ds.map_batches(
            AnonymizeBattles,
            fn_constructor_kwargs={"salt": self.salt, "rate": self.rate},
            batch_format="pyarrow", batch_size=256, concurrency=(1, 8))


def load_worker(spec: str):
    """Resolve a worker class from a registry name, ``module:Class``, or
    ``/path/to/file.py:Class`` (Class defaults to ``Worker``). Mirrors
    `createWorker` (process:18-27): load the code, surface its `options`."""
    spec = BUILTIN_WORKERS.get(spec, spec)
    mod_ref, _, cls_name = spec.partition(":")
    cls_name = cls_name or "Worker"
    if mod_ref.endswith(".py") or os.path.sep in mod_ref:
        name = os.path.basename(mod_ref)
        name = name[:-3] if name.endswith(".py") else name
        loader_spec = importlib.util.spec_from_file_location(
            f"stats_ray_worker_{name}", mod_ref)
        if loader_spec is None or loader_spec.loader is None:
            raise FileNotFoundError(f"worker module not found: {mod_ref}")
        mod = importlib.util.module_from_spec(loader_spec)
        loader_spec.loader.exec_module(mod)
    else:
        mod = importlib.import_module(mod_ref)
    try:
        return getattr(mod, cls_name)
    except AttributeError as e:
        raise AttributeError(
            f"worker module {mod_ref!r} has no class {cls_name!r}") from e


def worker_options(worker_cls) -> dict[str, dict]:
    opts = getattr(worker_cls, "options", None) or {}
    for name, o in opts.items():
        if not isinstance(o, dict):
            raise TypeError(f"worker option {name!r} must be a dict "
                            "(desc/alias/parse/default)")
    return opts


def run_worker(worker_cls, corpus: str, out: str,
               config: dict[str, Any]) -> dict[str, int]:
    """Drive a worker over the parsed corpus: accept-gate formats, apply,
    optional per-format combine, write partitioned Parquet under ``out``.

    The accept gate prunes with a vectorized per-batch mask over the small
    set of distinct formats (computed once on the driver — format
    cardinality is tiny); combine runs distributed via map_groups.

    A worker may set ``input = "raw"`` to receive the tokens-contract
    dataset (doc_id/tokens/n_tok/source) instead of parsed battles — the
    reference's workers likewise consume raw logs (worker.ts:50-53); the
    default is the parsed schema, which is what aggregate-style workers
    want. Raw mode gates ``accept`` on the format segment of ``source``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .pipelines.usage import parse_pipeline, read_battles

    worker = worker_cls(config)
    if hasattr(worker, "combine"):
        # combine runs ON THE EXECUTORS (map_groups closes over the worker
        # instance), unlike accept/apply which stay on the driver — so a
        # combine-bearing worker must be picklable. Check NOW, before any
        # pipeline work, not after a long apply() has already executed.
        from ray import cloudpickle
        try:
            cloudpickle.dumps(worker)
        except Exception as e:
            raise TypeError(
                f"worker {worker_cls.__name__} defines combine() but the "
                "instance is not picklable — combine executes on Ray "
                "workers. Keep unpicklable state (DB handles, open files) "
                "out of __init__, or open it lazily inside combine()."
            ) from e
    raw = getattr(worker, "input", "parsed") == "raw"
    if raw:
        ds = read_battles(corpus)
        # derive the format column workers gate/group on from source
        # ("format/day") — split once per batch, zero-copy otherwise
        ds = ds.map_batches(
            lambda t: t.append_column(
                "format",
                pc.list_element(pc.split_pattern(t["source"], "/"), 0)),
            batch_format="pyarrow")
    else:
        ds = parse_pipeline(corpus)

    if hasattr(worker, "accept"):
        # accept runs ON THE DRIVER, once per distinct format (the
        # reference's worker contract, and it keeps unpicklable worker
        # state — DB handles, open files — off the executors). Formats are
        # enumerated with a column-pruned scan of the source column only,
        # never by executing the parse pipeline twice.
        from .stages.parse import canonicalize_format
        srcs = read_battles(corpus, columns=["source"]).unique("source")
        raw_fmts = {s.split("/", 1)[0] for s in srcs}
        cand = sorted(raw_fmts) if raw else \
            sorted({canonicalize_format(f) for f in raw_fmts})
        keep = {f for f in cand if worker.accept(f)}
        if keep != set(cand):
            keep_arr = pa.array(sorted(keep), pa.string())

            def _gate(t: pa.Table) -> pa.Table:
                return t.filter(pc.is_in(t["format"], value_set=keep_arr))

            ds = ds.map_batches(_gate, batch_format="pyarrow")

    result = worker.apply(ds)

    if hasattr(worker, "combine"):
        def _combine(df):
            return worker.combine(df["format"].iloc[0], df)
        result = result.groupby("format").map_groups(
            _combine, batch_format="pandas")

    part = ["format"] if "format" in result.schema().names else None
    # the out dir is this run's result sink: write_parquet APPENDS files,
    # so a re-run into a populated dir would duplicate every row — rebuild
    # the dir, but ONLY if a sentinel says a prior run_worker wrote it
    # (never delete a user directory that holds anything else, e.g. a
    # flagship checkpoint root or an ingested corpus)
    import json
    import shutil
    marker = os.path.join(out, "_WORKER_SINK.json")
    if os.path.isdir(out) and os.listdir(out):
        if not os.path.exists(marker):
            raise FileExistsError(
                f"run_worker: out dir {out!r} is non-empty and was not "
                "written by run_worker (no _WORKER_SINK.json sentinel) — "
                "refusing to delete it; point --out at a new or empty "
                "directory")
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    # claim the dir BEFORE writing ("_" prefix: excluded from parquet
    # discovery): a run killed mid-write leaves the sentinel behind, so
    # the retry rebuilds instead of refusing — only dirs run_worker never
    # claimed are protected
    with open(marker, "w") as f:
        json.dump({"worker": type(worker).__name__, "complete": False}, f)
    if part:
        result.write_parquet(out, partition_cols=part)
    else:
        result.write_parquet(out)
    # count from the written footers — metadata-only, never re-reads data
    import ray.data
    n = ray.data.read_parquet(out).count()
    with open(marker, "w") as f:
        json.dump({"worker": type(worker).__name__, "complete": True,
                   "rows": int(n)}, f)
    return {"rows": int(n)}
