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


# ===========================================================================
# Full reference tier-update semantics (reports.ts:414-649): suffix fan-in
# weighted by battle counts, the four report types with their complete
# ladders, banlists, NFE / mega-base movement suppression.

USAGE_TIERS_BY_TYPE = {
    "singles": ["OU", "UU", "RU", "NU", "PU"],
    "doubles": ["DOU", "DUU"],
    "nationaldex": ["OU", "UU"],
    "littlecup": ["LC"],
}
LADDERS = {
    "singles": ["Uber", "OU", "UUBL", "UU", "RUBL", "RU", "NUBL", "NU",
                "PUBL", "PU", "ZUBL", "ZU"],
    "doubles": ["DUber", "DOU", "DUU", "DNU"],
    "nationaldex": ["Uber", "OU", "UUBL", "UU", "RUBL", "RU", "NUBL", "NU",
                    "PUBL", "PU", "ZUBL", "ZU"],
    "littlecup": ["LC Uber", "LC", "LCUU"],
}
SUFFIXES = ["", "suspecttest", "alpha", "beta"]  # reports.ts:64

# legacy cosmetic/renamed forme ids excluded from tier updates
# (reports.ts:512-521)
TIER_SKIP = {
    "pichuspikyeared", "unownb", "unownc", "unownd", "unowne", "unownf",
    "unowng", "unownh", "unowni", "unownj", "unownk", "unownl", "unownm",
    "unownn", "unowno", "unownp", "unownq", "unownr", "unowns", "unownt",
    "unownu", "unownv", "unownw", "unownx", "unowny", "unownz", "unownem",
    "unownqm", "burmysandy", "burmytrash", "cherrimsunshine", "shelloseast",
    "gastrodoneast", "deerlingsummer", "deerlingautumn", "deerlingwinter",
    "sawsbucksummer", "sawsbuckautumn", "sawsbuckwinter", "keldeoresolution",
    "genesectdouse", "genesectburn", "genesectshock", "genesectchill",
    "basculinbluestriped", "darmanitanzen", "keldeoresolute",
    "pikachucosplay",
}


def usage_tier_format(report_type: str, tier: str) -> str:
    """reports.ts:532-538."""
    if report_type == "doubles" and tier == "DOU":
        return "doublesou"
    if report_type == "doubles" and tier == "DUU":
        return "doublesuu"
    if report_type == "nationaldex" and tier == "OU":
        return "nationaldex"
    if report_type == "nationaldex" and tier == "UU":
        return "nationaldexuu"
    from ..gendex import to_id
    return to_id(tier)


def parse_published_usage(text: str):
    """reports.ts:791-805 parseUsageReport over a published (leading-space)
    usage report: -> (usage: id -> fraction, battles, names: id -> display)."""
    from ..gendex import to_id
    lines = text.split("\n")
    battles = int(lines[0][16:])
    usage, names = {}, {}
    for i in range(5, len(lines)):
        cols = lines[i].split("|")
        if len(cols) < 3:
            break
        name = cols[2][1:].strip()
        pct = float(cols[3][1:cols[3].index("%")]) / 100
        sid = to_id(name)
        usage[sid] = pct
        names.setdefault(sid, name)
    return usage, battles, names


def _display(names: dict, sid: str, legacy: bool = True) -> str:
    name = names.get(sid, sid)
    if legacy and name.startswith("Nidoran"):
        return name.replace("-", "")
    return name


def _update_tiers_full(report_type: str, pokemon: dict, tiers_data: dict,
                       bl: dict, rise: float, drop: float):
    """updateTiers (reports.ts:540-617) over the tier table `tiers_data`
    ({'tier'|'doublesTier'|'natDexTier': {tier: [ids...]}})."""
    field = {"doubles": "doublesTier",
             "nationaldex": "natDexTier"}.get(report_type, "tier")
    by_species: dict[str, str] = {}
    fallback: dict[str, str] = {}
    for t, ids in tiers_data.get("tier", {}).items():
        for sid in ids:
            fallback[sid] = t
    for t, ids in tiers_data.get(field, {}).items():
        for sid in ids:
            by_species[sid] = t
    universe = set(fallback) | set(by_species)

    ladder = LADDERS[report_type]
    doubles = report_type == "doubles"
    current: dict[str, str] = {}
    updated: dict[str, str] = {}
    nfe: set[str] = set()
    for sid in sorted(universe):
        tier = by_species.get(sid) or fallback.get(sid)
        nonstandard = tier in ("CAP", "CAP LC", "CAP NFE", "AG") and \
            report_type != "nationaldex"
        if sid in TIER_SKIP or nonstandard or not tier or \
                tier in ("Illegal", "Unreleased"):
            continue
        if doubles:
            if tier.startswith("("):
                tier = "DNU"  # reference bug replicated (reports.ts:564-567)
            if tier in ("NFE", "LC", "LC Uber"):
                nfe.add(sid)
            tier = tier if tier in ladder else "DNU"
        else:
            if tier.startswith("(") and tier[1] != "P":
                tier = tier[1:-1]
            if tier.startswith("(") and tier[1] == "P":
                tier = "ZU"
            if tier in ("NFE", "LC", "LC Uber"):
                nfe.add(sid)
            tier = tier if tier in ladder else "ZU"
        current[sid] = tier

        uber = "DUber" if doubles else "Uber"
        if tier == uber:
            updated[sid] = uber
            continue
        update = pokemon.get(sid)
        if update is None:
            updated[sid] = tier
            continue

        def rise_and_drop(r, d, b=None):
            # rungs outside the type's usage tiers (e.g. RU for
            # nationaldex) have NO usage entry; JS compares undefined,
            # which is false both ways (reports.ts:632-643)
            uv = update.get(r)
            if uv is not None and uv > rise:
                updated[sid] = r
                return True
            if tier == r:
                updated[sid] = d if (uv is not None and uv < drop) else r
                return True
            if b is not None and tier == b:
                updated[sid] = b
                return True
            return False

        if doubles:
            if rise_and_drop("DOU", "DUU"):
                continue
            if rise_and_drop("DUU", "DNU"):
                continue
        else:
            if rise_and_drop("OU", "UU", "UUBL"):
                continue
            if rise_and_drop("UU", "RU", "RUBL"):
                continue
            if rise_and_drop("RU", "NU", "NUBL"):
                continue
            if rise_and_drop("NU", "PU", "PUBL"):
                continue
            if rise_and_drop("PU", "ZU", "ZUBL"):
                continue

        if sid not in updated:
            updated[sid] = "DNU" if doubles else "ZU"
        new_tier = updated[sid]
        if sid in bl.get(new_tier, ()):  # reports.ts:611-614
            updated[sid] = f"{new_tier}BL"
    return current, updated, nfe


def reference_tier_update(stats_dir: str, report_type: str,
                          tiers_data: dict, bl: dict,
                          months: list[str] = ("2024-06", "2024-05",
                                               "2024-04"),
                          gen_num: int = 9) -> str:
    """tierUpdateReport (reports.ts:414-509) over published monthly usage
    files at <stats_dir>/<month>/<format>-<baseline>.txt, with the full
    suffix fan-in (battle-count weighting across '', suspecttest, alpha,
    beta variants of each ladder format)."""
    import os

    from ..functions.jsfmt import js_tofixed

    rise = drop = RISE
    usage_tiers = USAGE_TIERS_BY_TYPE[report_type]
    cutoffs = dict.fromkeys(usage_tiers, 0)
    pokemon: dict[str, dict[str, float]] = {}
    names: dict[str, str] = {}

    for month in months:
        for tier in usage_tiers:
            n_by, u_by = {}, {}
            ntot = 0
            for suffix in SUFFIXES:
                fmt = f"gen{gen_num}{usage_tier_format(report_type, tier)}{suffix}"
                baseline = 1695 if fmt[4:] in ("ou", "doublesou") else 1630
                path = os.path.join(stats_dir, month,
                                    f"{fmt}-{baseline}.txt")
                if not os.path.exists(path):
                    continue
                with open(path) as f:
                    u, n, nm = parse_published_usage(f.read())
                cutoffs[tier] = baseline
                u_by[suffix], n_by[suffix] = u, n
                ntot += n
                for k, v in nm.items():
                    names.setdefault(k, v)
            for suffix, u in u_by.items():
                for sid, frac in u.items():
                    v = pokemon.setdefault(sid,
                                           dict.fromkeys(usage_tiers, 0.0))
                    if sid != "empty":
                        v[tier] += (n_by[suffix] / ntot * frac) / len(months)

    s = ""
    for tier in usage_tiers:
        rows = [(sid, v[tier]) for sid, v in pokemon.items() if v[tier] > 0]
        rows.sort(key=lambda kv: (-kv[1], kv[0]))
        prefix = "National Dex " if report_type == "nationaldex" else ""
        title = f"{prefix}{tier} ({cutoffs[tier]} stats)"
        s += f"[HIDE={title}][CODE]\n"
        s += f"Combined usage for {title}\n"
        s += " + ---- + ------------------ + ------- + \n"
        s += " | Rank | Pokemon            | Percent | \n"
        s += " + ---- + ------------------ + ------- + \n"
        for i, (sid, usage) in enumerate(rows):
            if usage < 0.001:
                break
            rank = f"{i + 1}".ljust(4)
            poke = _display(names, sid).ljust(18)
            pct = js_tofixed(100 * usage, 3).rjust(6)
            s += f" | {rank} | {poke} | {pct}% |\n"
        s += " + ---- + ------------------ + ------- + \n"
        s += "[/CODE][/HIDE]\n"
    s += "\n"

    if report_type == "littlecup":
        banned = sorted(sid for sid, v in pokemon.items()
                        if v.get("LC", 0.0) > drop)
        s += "[b]LC UU Banlist:[/b] "
        s += ", ".join(names.get(sid, sid) for sid in banned)
        return s

    current, updated, nfe = _update_tiers_full(report_type, pokemon,
                                               tiers_data, bl, rise, drop)
    ladder = LADDERS[report_type]
    for sid in sorted(current):
        tier = current[sid]
        update = updated.get(sid)
        if report_type != "doubles" and tier == "ZU" and sid in nfe:
            continue
        if tier != update:
            name = names.get(sid, sid)
            # mega/primal movement suppressed when the base already sits in
            # a higher tier (reports.ts:493-502)
            if "-Mega" in name or "-Primal" in name:
                base = name.split("-Mega")[0].split("-Primal")[0]
                from ..gendex import to_id
                base_update = updated.get(to_id(base))
                base_ix = ladder.index(base_update) \
                    if base_update in ladder else -1
                if base_ix < ladder.index(update):
                    continue
            prefix = "ND" if report_type == "nationaldex" else ""
            s += f"{name} moved from {prefix}{tier} to {prefix}{update}\n"
    return s
