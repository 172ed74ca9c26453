"""Reference-fixture parity: run the engine over the reference's real test
logs and compare every report byte-for-byte against its checked-in goldens.

Mirrors stats/src/test/integration.ts:46-103: for each format directory of
raw battle logs, parse every log (legacy mode, real-data dex slice), update
the tagged statistics at cutoffs [0, 1500, 1630, 1760] and render the six
report kinds; `compare_goldens` diffs the output against
testdata/reports/<format>/<kind>.<cutoff>.{txt,json}.

The whole path is the regular engine pipeline (ParseBattles actor pool ->
aggregate families -> report renderers) — only the input adapter
(`build_battles_dataset`) and the golden comparison are parity-specific.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data
from ray.data import Dataset

from ..tokens import encode_strings

CUTOFFS = [0, 1500, 1630, 1760]

# golden file name -> (renderer kind, extension)
REPORT_KINDS = ["usage", "leads", "movesets", "detailed", "metagame",
                "display"]

DEFAULT_LOGS = "/root/reference/stats/src/test/testdata/logs"
DEFAULT_GOLDENS = "/root/reference/stats/src/test/testdata/reports"


def build_battles_dataset(logs_root: str = DEFAULT_LOGS,
                          formats: list[str] | None = None) -> Dataset:
    """Wrap the raw reference logs into the engine's input contract
    (doc_id, source, tokens:list<int32>, n_tok)."""
    doc_ids, sources, docs = [], [], []
    for fmt in sorted(os.listdir(logs_root)):
        if formats and fmt not in formats:
            continue
        d = os.path.join(logs_root, fmt)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            with open(os.path.join(d, name)) as f:
                raw = f.read()
            doc_ids.append(f"{fmt}/{name}")
            sources.append(f"{fmt}/{name}")
            docs.append(raw)
    tokens = encode_strings(docs)
    table = pa.table({
        "doc_id": pa.array(doc_ids), "source": pa.array(sources),
        "tokens": tokens,
        "n_tok": pa.array([len(s.encode()) for s in docs], type=pa.int32()),
    })
    return ray.data.from_arrow(table)


def parse_reference_logs(logs_root: str = DEFAULT_LOGS,
                         formats: list[str] | None = None,
                         concurrency: int = 2) -> Dataset:
    from ..stages.parse import ParseBattles
    ds = build_battles_dataset(logs_root, formats)
    return ds.map_batches(
        ParseBattles,
        fn_constructor_kwargs={"strict": True, "dex_name": "legacy",
                               "legacy": True},
        batch_format="pyarrow", batch_size=64, concurrency=concurrency)


def render_parity_reports(parsed: Dataset,
                          formats: list[str] | None = None) -> dict:
    """-> {(format, cutoff, kind): text} for the six report kinds,
    rendered with the integration harness's parameters
    (movesetReports min=[0, -Infinity], Display.fromStatistics min=0)."""
    from ..gendex import get_dex
    from ..stages import reports as R
    from .usage import report_aggs

    dx = get_dex("legacy")
    aggs = {name: ds.to_pandas() for name, ds in report_aggs(parsed).items()}
    fmts = sorted(aggs["battles"]["format"].unique())
    out = {}
    for fmt in fmts:
        if formats and fmt not in formats:
            continue
        for cutoff in CUTOFFS:
            view = R.collect_view(aggs, fmt, cutoff, dx)
            movesets = R.to_moveset_statistics(view, min_n=0)
            out[(fmt, cutoff, "usage")] = R.usage_report(view)
            out[(fmt, cutoff, "leads")] = R.leads_report(view)
            out[(fmt, cutoff, "movesets")] = R.moveset_report(
                view, movesets, min_=(0, -float("inf")))
            out[(fmt, cutoff, "detailed")] = R.detailed_moveset_report(
                view, movesets=movesets, min_n=0)
            out[(fmt, cutoff, "metagame")] = R.metagame_report(view)
            out[(fmt, cutoff, "display")] = R.display_statistics(view)
    return out


def golden_path(golden_root: str, fmt: str, kind: str, cutoff: int) -> str:
    ext = "json" if kind in ("detailed", "display") else "txt"
    return os.path.join(golden_root, fmt, f"{kind}.{cutoff}.{ext}")


def compare_goldens(rendered: dict, golden_root: str = DEFAULT_GOLDENS):
    """-> list of {format, cutoff, kind, match, got, want}."""
    results = []
    for (fmt, cutoff, kind), got in sorted(rendered.items()):
        path = golden_path(golden_root, fmt, kind, cutoff)
        want = None
        if os.path.exists(path):
            with open(path) as f:
                want = f.read()
        results.append({"format": fmt, "cutoff": cutoff, "kind": kind,
                        "match": got == want, "got": got, "want": want})
    return results


def run_parity(logs_root: str = DEFAULT_LOGS,
               golden_root: str = DEFAULT_GOLDENS,
               formats: list[str] | None = None):
    parsed = parse_reference_logs(logs_root, formats).materialize()
    rendered = render_parity_reports(parsed, formats)
    return compare_goldens(rendered, golden_root)


def summarize(results) -> str:
    lines = []
    ok = 0
    for r in results:
        status = "OK " if r["match"] else "DIFF"
        ok += r["match"]
        lines.append(f"{status} {r['format']} {r['kind']}.{r['cutoff']}")
    lines.append(f"{ok}/{len(results)} byte-exact")
    return "\n".join(lines)


def first_diff(got: str, want: str, context: int = 2) -> str:
    """Line-oriented first-difference report for iteration."""
    if want is None:
        return "golden file missing"
    g, w = got.split("\n"), want.split("\n")
    for i in range(max(len(g), len(w))):
        gl = g[i] if i < len(g) else "<EOF>"
        wl = w[i] if i < len(w) else "<EOF>"
        if gl != wl:
            lo = max(0, i - context)
            ctx = "\n".join(f"  {w[j]}" for j in range(lo, min(i, len(w))))
            return (f"line {i + 1}:\n{ctx}\n- want: {wl!r}\n+ got:  {gl!r}")
    return "identical"


if __name__ == "__main__":
    import sys
    fmts = sys.argv[1:] or None
    res = run_parity(formats=fmts)
    print(summarize(res))
    for r in res:
        if not r["match"]:
            print(f"\n=== {r['format']} {r['kind']}.{r['cutoff']} ===")
            print(first_diff(r["got"], r["want"]))
