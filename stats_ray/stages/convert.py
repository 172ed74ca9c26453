"""Legacy-report converter (S11: the `convert` CLI, stats/convert:28-120).

Walks a report fan-out directory (as written by pipelines.render_reports),
re-parses the legacy text reports with the S10 inverse parsers, and emits
one unified JSON per (format, cutoff) — optionally split per Pokémon.
When the detailed (`chaos/`) report is present the full
`Display.fromReports` reconstruction (display.ts:174-292) is used; without
it, a best-effort merge of the text-parsable fields. Driver-side small
work (reports are KBs)."""

from __future__ import annotations

import json
import os

from .reports import (from_reports, parse_leads_report,
                      parse_metagame_report, parse_usage_report,
                      partial_parse_moveset_report)


def _read(path: str) -> str | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return f.read()


def convert_reports(reports_dir: str, out_dir: str, split: bool = False,
                    dex_name: str = "synth") -> dict[str, str]:
    """reports_dir must contain usage/, leads/, metagame/ subdirs with
    <format>-<cutoff>.txt files (plus moveset/ and chaos/ for the full
    fromReports path). Returns {format-cutoff: output path}."""
    from ..gendex import get_dex

    os.makedirs(out_dir, exist_ok=True)
    usage_dir = os.path.join(reports_dir, "usage")
    dx = get_dex(dex_name)
    written = {}
    for fname in sorted(os.listdir(usage_dir)):
        if not fname.endswith(".txt"):
            continue
        stem = fname[:-4]
        fmt, cutoff = stem.rsplit("-", 1)

        chaos = _read(os.path.join(reports_dir, "chaos", f"{stem}.json"))
        moveset = _read(os.path.join(reports_dir, "moveset", fname))
        if chaos is not None and moveset is not None:
            unified = {
                "format": fmt, "cutoff": int(cutoff),
                **from_reports(
                    dx,
                    _read(os.path.join(usage_dir, fname)) or "",
                    moveset, chaos,
                    _read(os.path.join(reports_dir, "metagame", fname)),
                    _read(os.path.join(reports_dir, "leads", fname))),
            }
            written[stem] = _write(unified, out_dir, stem, fmt,
                                   int(cutoff), split)
            continue

        unified = {"format": fmt, "cutoff": int(cutoff)}
        with open(os.path.join(usage_dir, fname)) as f:
            u = parse_usage_report(f.read())
        unified["battles"] = u["battles"]
        unified["avg_weight"] = u["avg_weight"]
        unified["pokemon"] = {
            name: {"usage": row} for name, row in u["usage"].items()}

        leads_path = os.path.join(reports_dir, "leads", fname)
        if os.path.exists(leads_path):
            with open(leads_path) as f:
                lr = parse_leads_report(f.read())
            unified["total_leads"] = lr["total_leads"]
            for name, row in lr["leads"].items():
                unified["pokemon"].setdefault(name, {})["lead"] = row

        moveset_path = os.path.join(reports_dir, "moveset", fname)
        if os.path.exists(moveset_path):
            with open(moveset_path) as f:
                pmr = partial_parse_moveset_report(f.read())
            for name, data in pmr.items():
                entry = unified["pokemon"].setdefault(name, {})
                entry["weight"] = data["weight"]
                entry["counters"] = data["outcomes"]

        meta_path = os.path.join(reports_dir, "metagame", fname)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                mr = parse_metagame_report(f.read())
            unified["metagame"] = mr

        written[stem] = _write(unified, out_dir, stem, fmt, int(cutoff),
                               split)
    return written


def _write(unified: dict, out_dir: str, stem: str, fmt: str, cutoff: int,
           split: bool) -> str:
    if split:
        d = os.path.join(out_dir, stem)
        os.makedirs(d, exist_ok=True)
        for name, data in unified["pokemon"].items():
            safe = "".join(c for c in name if c.isalnum())
            with open(os.path.join(d, f"{safe}.json"), "w") as f:
                json.dump({"format": fmt, "cutoff": cutoff,
                           "pokemon": name, **data}, f)
        return d
    path = os.path.join(out_dir, f"{stem}.json")
    with open(path, "w") as f:
        json.dump(unified, f)
    return path
