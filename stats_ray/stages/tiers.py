"""Tier-update report (J3: reports.ts:414-649).

Joins per-month usage maps across N months, weighted by battle counts,
against a current tier table with rise/drop thresholds, emitting the BBCode
combined-usage tables + movement lines. Inputs are usage *report texts*
re-parsed with the S10 inverse parsers — the same loop the reference runs
(tools feed it the previous months' published reports).

Our tier ladder is {OU: gen9ou, UU: gen9uu} over the synthetic universe;
months are day-window slices of the corpus (the driver of monthly_reports).
All driver-side small-data work (a few thousand rows per month).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .reports import (collect_view, display_species, parse_usage_report,
                      usage_report)

# tier ladder: tier name -> source format (highest first)
TIER_FORMATS = [("OU", "gen9ou"), ("UU", "gen9uu")]
TIERS = [t for t, _ in TIER_FORMATS]
RISE = 0.04515839608  # reports.ts:473-475
DROP = RISE


def day_window(day: int) -> int:
    """Split the corpus month into 3 pseudo-months by day (1-9/10-18/19-28)."""
    return 0 if day <= 9 else (1 if day <= 18 else 2)


def monthly_reports(parsed: Dataset, cutoff_index: int = 2) -> dict:
    """{(window, format): usage report text} for the tier formats.

    Filters parsed battles per day window (vectorized on `source`), runs the
    usage/battle aggregates per window, renders the legacy usage report."""
    from ..dex import cutoffs_for
    from ..pipelines.usage import AGG_FAMILIES

    out = {}
    for w in range(3):
        def keep(t: pa.Table, w=w) -> pa.Table:
            days = np.array([int(s.rsplit("-", 1)[1])
                             for s in t["source"].to_pylist()])
            mask = np.array([day_window(d) == w for d in days])
            return t.filter(pa.array(mask))

        sub = parsed.map_batches(keep, batch_format="pyarrow")
        aggs = {name: AGG_FAMILIES[name](sub).to_pandas()
                for name in ("usage", "battles")}
        for tier, fmt in TIER_FORMATS:
            cutoff = cutoffs_for(fmt)[cutoff_index]
            view = collect_view(aggs, fmt, cutoff)
            out[(w, fmt)] = usage_report(view)
    return out


def _make_table(tier: str, cutoff: int, rows: list[tuple[str, float]]) -> str:
    """reports.ts:758-784 BBCode combined-usage table."""
    title = f"{tier} ({cutoff} stats)"
    s = f"[HIDE={title}][CODE]\n"
    s += f"Combined usage for {title}\n"
    s += " + ---- + ------------------ + ------- + \n"
    s += " | Rank | Pokemon            | Percent | \n"
    s += " + ---- + ------------------ + ------- + \n"
    for i, (sid, usage) in enumerate(rows):
        if usage < 0.001:
            break
        rank = f"{i + 1}".ljust(4)
        poke = display_species(sid).ljust(18)
        pct = f"{100 * usage:.3f}".rjust(6)
        s += f" | {rank} | {poke} | {pct}% |\n"
    s += " + ---- + ------------------ + ------- + \n"
    s += "[/CODE][/HIDE]\n"
    return s


def tier_update_report(reports: dict, current_tiers: dict[str, str],
                       cutoff_of: dict[str, int] | None = None) -> str:
    """Combine months -> usage per (species, tier) -> tables + movements.

    reports: {(month_index, format): usage report text}
    current_tiers: species id -> current tier name
    """
    months = sorted({m for m, _ in reports})
    combined: dict[str, dict[str, float]] = {}
    cutoffs: dict[str, int] = dict.fromkeys(TIERS, 0)

    by_name = {}  # display name -> species id (inverse of display)
    for tier, fmt in TIER_FORMATS:
        total_by_month = {}
        parsed_by_month = {}
        for m in months:
            text = reports.get((m, fmt))
            if not text:
                continue
            r = parse_usage_report(text)
            parsed_by_month[m] = r
            total_by_month[m] = r["battles"]
        for m, r in parsed_by_month.items():
            for name, row in r["usage"].items():
                by_name.setdefault(name, name)
                v = combined.setdefault(name, dict.fromkeys(TIERS, 0.0))
                # single-suffix weighting: usage averaged over months
                v[tier] += (row["usage_pct"] / 100.0) / len(months)
        if cutoff_of:
            cutoffs[tier] = cutoff_of.get(fmt, 0)

    s = ""
    for tier in TIERS:
        rows = sorted(((name, v[tier]) for name, v in combined.items()
                       if v[tier] > 0),
                      key=lambda kv: (-kv[1], kv[0]))
        s += _make_table(tier, cutoffs[tier], rows)
    s += "\n"

    # movements: rise into the highest tier whose usage beats the threshold
    updated: dict[str, str] = {}
    for name, v in combined.items():
        new_tier = None
        for tier in TIERS:
            if v[tier] > RISE:
                new_tier = tier
                break
        if new_tier is None:
            new_tier = TIERS[-1] + "BL"  # fell through the ladder
        updated[name] = new_tier

    for name in sorted(set(current_tiers) | set(updated)):
        cur = current_tiers.get(name)
        new = updated.get(name)
        if cur and new and cur != new:
            s += f"{name} moved from {cur} to {new}\n"
    return s
