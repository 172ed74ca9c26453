"""Report rendering: the reference's 5 legacy reports + display JSON.

Byte-exact replicas of `stats/src/reports.ts:98-412` (usage / leads /
moveset / detailed / metagame) and `stats/src/display.ts:93-172`
(Display.fromStatistics), rendered from the long-form aggregate tables
produced by stats_ray.stages.aggregate over a pluggable GenDex. All number
formatting goes through functions.jsfmt (JS toFixed / Number::toString /
localeCompare semantics) so output bytes match the reference goldens.

Rendering is driver-side small work: each (format, cutoff) view is a few
thousand rows.

Also implements the inverse report parsers (S10, display.ts:387-535
analogues) used for roundtrip tests.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..gendex import GenDex
from ..functions.jsfmt import (
    js_round, js_tofixed, json_stringify, locale_key, round_str,
    stringify_pretty_compact,
)

MIN = (20, 0.5)  # reports.ts:66

# outcome indices
_KOED, _SWITCHED = 0, 3

# reports.ts:100,665 — literal pre-gen-prefix format ids (modern gen-prefixed
# ids never match; kept verbatim for fidelity)
_REAL_FORMATS = ("challengecup1v1", "1v1")
_ALPHA_FORMATS = ("randombattle", "challengecup", "challengcup1v1", "seasonal")


def _default_dex() -> GenDex:
    from ..dex import SYNTH_DEX
    return SYNTH_DEX


def _div(a: float, b: float) -> float:
    """JS division: x/0 -> ±inf, 0/0 -> NaN."""
    if b == 0:
        return math.nan if a == 0 else math.copysign(math.inf, a)
    return a / b


def _falsy(x) -> bool:
    """JS falsiness for numbers: 0, -0 and NaN."""
    return x != x or x == 0


def to_display_object(m: dict[str, float], display=None, p: float = 1e10):
    """util.ts:296-309 — sort desc by value, tie by display-name
    localeCompare; keys stay RAW (the display fn is sort-only — the
    reference's 'FIXME: use display here for chaos reports as well')."""
    d = display or (lambda k: str(k))
    items = sorted(m.items(),
                   key=lambda kv: (-kv[1], locale_key(d(kv[0]))
                                   if isinstance(kv[0], str) else
                                   locale_key(str(kv[0]))))
    return {str(k): js_round(v, p) for k, v in items}


def display_species(sid: str, dx: GenDex | None = None) -> str:
    return (dx or _default_dex()).display_species(sid)


def display_ability(aid: str, dx: GenDex | None = None) -> str:
    return (dx or _default_dex()).display_ability(aid)


def display_item(iid: str, dx: GenDex | None = None) -> str:
    return (dx or _default_dex()).display_item(iid)


def display_move(mid: str, dx: GenDex | None = None) -> str:
    return (dx or _default_dex()).display_move(mid)


# ---------------------------------------------------------------------------
# per-(format, cutoff) statistics view assembled from aggregate tables

@dataclass
class SpeciesView:
    usage_raw: int = 0
    usage_real: int = 0
    usage_weighted: float = 0.0
    win_raw: int = 0
    win_real: int = 0
    win_weighted: float = 0.0
    raw_count: int = 0
    raw_weight: float = 0.0
    saved_count: int = 0
    saved_weight: float = 0.0
    lead_raw: int = 0
    lead_real: int = 0
    lead_weighted: float = 0.0
    unique_raw: int = 0
    unique_real: int = 0
    unique_weighted: float = 0.0
    abilities: dict = field(default_factory=dict)
    items: dict = field(default_factory=dict)
    teras: dict = field(default_factory=dict)
    spreads: dict = field(default_factory=dict)
    statsmap: dict = field(default_factory=dict)
    moves: dict = field(default_factory=dict)
    happiness: dict = field(default_factory=dict)
    teammates: dict = field(default_factory=dict)
    encounters: dict = field(default_factory=dict)  # opp -> [13] floats
    viability: tuple = (0, 0, 0, 0)


@dataclass
class FormatView:
    fmt: str
    cutoff: int
    dx: GenDex = None
    battles: int = 0
    usage_raw: int = 0
    usage_real: int = 0
    usage_weighted: float = 0.0
    lead_raw: int = 0
    lead_real: int = 0
    lead_weighted: float = 0.0
    unique_total_raw: int = 0
    unique_total_real: int = 0
    unique_total_weighted: float = 0.0
    tags: dict = field(default_factory=dict)
    stalliness: pd.DataFrame | None = None  # value/count/weight rows
    pokemon: dict[str, SpeciesView] = field(default_factory=dict)
    # True iff the reference would have created stats.pokemon['empty'] (a
    # legacy team with >= 2 empty slots; stats.ts:449-470 via the b='empty'
    # branch) — gates whether 'empty' teammate weights survive getTeammates
    empty_in_pokemon: bool = False

    def __post_init__(self):
        if self.dx is None:
            self.dx = _default_dex()

    def poke(self, sid: str) -> SpeciesView:
        if sid not in self.pokemon:
            self.pokemon[sid] = SpeciesView()
        return self.pokemon[sid]

    # display helpers bound to the view's dex
    def dspecies(self, sid: str) -> str:
        return self.dx.display_species(sid)

    def dspecies_raw(self, sid: str) -> str:
        """display.ts N(): raw dex name, no legacy Nidoran/Flabebe fixes."""
        sp = self.dx.SPECIES.get(sid)
        return sp["name"] if sp else sid


_KIND_FIELD = {"ability": "abilities", "item": "items", "tera": "teras",
               "spread": "spreads", "stats": "statsmap", "move": "moves",
               "happiness": "happiness"}


def collect_view(aggs: dict[str, pd.DataFrame], fmt: str, cutoff: int,
                 dx: GenDex | None = None) -> FormatView:
    """Assemble the reference's `Statistics` shape for one (format, cutoff)
    from the long-form aggregate tables."""
    v = FormatView(fmt, cutoff, dx or _default_dex())

    def sel(name):
        df = aggs.get(name)
        if df is None or df.empty:
            return pd.DataFrame()
        df = df[(df["format"] == fmt) & (df["cutoff"] == cutoff)]
        # Ray's to_pandas row order follows block arrival, which varies with
        # cluster state; the scalar accumulations below must not — a
        # different FP summation order flips ulp-level ties in the
        # byte-exact reports. Fix the order before any arithmetic.
        return df.sort_values(list(df.columns), kind="stable")

    b = sel("battles")
    v.battles = int(b["battles"].iloc[0]) if len(b) else 0

    for r in sel("usage").itertuples():
        # 'empty' slots feed the global usage totals only (stats.ts:285-303)
        v.usage_raw += int(r.usage_raw)
        v.usage_real += int(r.usage_real)
        v.usage_weighted += float(r.usage_weighted)
        if r.species == "empty":
            continue
        p = v.poke(r.species)
        p.usage_raw, p.usage_real = int(r.usage_raw), int(r.usage_real)
        p.usage_weighted = float(r.usage_weighted)
        p.win_raw, p.win_real = int(r.win_raw), int(r.win_real)
        p.win_weighted = float(r.win_weighted)
        p.raw_count, p.raw_weight = int(r.raw_count), float(r.raw_weight)
        p.saved_count, p.saved_weight = int(r.saved_count), float(r.saved_weight)

    for r in sel("movesets").itertuples():
        getattr(v.poke(r.species), _KIND_FIELD[r.kind])[r.key] = \
            getattr(v.poke(r.species), _KIND_FIELD[r.kind]).get(r.key, 0.0) \
            + float(r.weight)

    for r in sel("leads").itertuples():
        p = v.poke(r.species)
        p.lead_raw, p.lead_real = int(r.lead_raw), int(r.lead_real)
        p.lead_weighted = float(r.lead_weighted)
        v.lead_raw += p.lead_raw
        v.lead_real += p.lead_real
        v.lead_weighted += p.lead_weighted

    for r in sel("teammates").itertuples():
        # stored as unordered pairs; mirror both directions (stats.ts:449-471)
        v.poke(r.s1).teammates[r.s2] = float(r.weight)
        v.poke(r.s2).teammates[r.s1] = float(r.weight)

    for r in sel("teammates_empty").itertuples():
        # legacy last-writer 'empty' entries (see teammate_empty_lastwriter)
        if r.species != "empty":
            v.poke(r.species).teammates["empty"] = float(r.weight)
        else:
            v.empty_in_pokemon = True

    for r in sel("encounters").itertuples():
        enc = v.poke(r.species).encounters.setdefault(r.opponent, [0.0] * 13)
        enc[int(r.outcome)] += float(r.weight)

    for r in sel("metagame").itertuples():
        v.tags[r.tag] = float(r.weight)

    for r in sel("viability").itertuples():
        v.poke(r.species).viability = (int(r.v_n), float(r.v_max),
                                       float(r.v_p99), float(r.v_p80))

    for r in sel("unique").itertuples():
        if r.species == "empty":
            continue
        p = v.poke(r.species)
        p.unique_raw = int(r.n_players)
        p.unique_real = int(r.real_players)
        p.unique_weighted = float(r.sum_max_weight)

    ut = sel("unique_total")
    if len(ut):
        r = next(ut.itertuples())
        v.unique_total_raw = int(r.n_players)
        v.unique_total_real = int(r.real_players)
        v.unique_total_weighted = float(r.sum_max_weight)

    st = sel("stalliness")
    v.stalliness = st[["value", "count", "weight"]] if len(st) else None
    return v


# ---------------------------------------------------------------------------
# checks & counters (util.ts:332-357)

def checks_and_counters(encounters: dict, min_n: float = 20):
    cc = []
    for opp, outcomes in encounters.items():
        n = sum(outcomes[0:6])
        if n <= min_n:
            continue
        koed, switched = outcomes[_KOED], outcomes[_SWITCHED]
        p = js_round((koed + switched) / n)
        d = js_round(math.sqrt((p * (1.0 - p)) / n))
        score = js_round(p - 4 * d)
        cc.append((opp, {"koed": koed, "switched": switched, "n": n,
                         "p": p, "d": d, "score": score}))
    cc.sort(key=lambda kv: (-kv[1]["score"], locale_key(kv[0])))
    return cc


# ---------------------------------------------------------------------------
# toMovesetStatistics (reports.ts:657-725)

def to_moveset_statistics(v: FormatView, fmt: str | None = None,
                          min_n: float = 20):
    fmt = fmt or v.fmt
    dx = v.dx
    real = fmt in _REAL_FORMATS
    total = max(1.0, v.usage_real if real else v.usage_weighted)

    def usage(n):
        return js_round((n / total) * 6, 1e7)

    entries = list(v.pokemon.items())
    if fmt in _ALPHA_FORMATS:
        entries.sort(key=lambda kv: locale_key(kv[0]))
    elif real:
        entries.sort(key=lambda kv: (-usage(kv[1].usage_real),
                                     locale_key(kv[0])))
    else:
        entries.sort(key=lambda kv: (-usage(kv[1].usage_weighted),
                                     locale_key(kv[0])))

    def teammates_obj(p):
        # getTeammates (reports.ts:728-748): display names; ids missing from
        # stats.pokemon (incl. 'empty' unless a >=2-empty team created the
        # entry) zero out
        m = {}
        for sid, w in p.teammates.items():
            name = dx.display_species(sid)
            if sid == "empty":
                m[name] = w if v.empty_in_pokemon else 0
            elif sid not in v.pokemon:
                m[name] = 0
            else:
                m[name] = w
        return to_display_object(m)

    out = {}
    for sid, p in entries:
        cc = checks_and_counters(p.encounters, min_n)
        out[sid] = {
            "Raw count": p.raw_count,
            "usage": usage(p.usage_real if real else p.usage_weighted),
            "Viability Ceiling": list(p.viability),
            "Abilities": to_display_object(p.abilities, dx.display_ability),
            "Items": to_display_object(p.items, dx.display_item),
            "Tera Types": to_display_object(
                p.teras, lambda t: t[0].upper() + t[1:] if t else t),
            "Spreads": to_display_object(p.spreads),
            "Happiness": to_display_object(p.happiness),
            "Moves": to_display_object(p.moves, dx.display_move),
            "Teammates": teammates_obj(p),
            "Checks and Counters": {dx.display_species(k): e for k, e in cc},
        }
    return out


# ---------------------------------------------------------------------------
# renderers

def usage_report(v: FormatView) -> str:
    real_fmt = v.fmt in _REAL_FORMATS
    entries = list(v.pokemon.items())
    if real_fmt:
        entries.sort(key=lambda kv: (-kv[1].usage_real, locale_key(kv[0])))
    else:
        entries.sort(key=lambda kv: (-kv[1].usage_weighted, locale_key(kv[0])))

    s = f"Total battles: {v.battles}\n"
    avg = round_str(v.usage_weighted / v.battles / 12, 1e3) if v.battles else "0.0"
    s += f"Avg. weight/team: {avg}\n"
    bar = "+ ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + \n"
    s += bar
    s += "| Rank | Pokemon            | Usage %   | Raw    | %       | Real   | %       | \n"
    s += bar
    t_raw = max(1.0, v.usage_raw)
    t_real = max(1.0, v.usage_real)
    t_w = max(1.0, v.usage_weighted)
    for i, (sid, p) in enumerate(entries):
        if p.usage_raw == 0:
            break
        rank = f"{i + 1}".ljust(4)
        poke = v.dspecies(sid).ljust(18)
        use = js_tofixed((100 * p.usage_weighted / t_w) * 6, 5).rjust(8)
        raw = f"{p.usage_raw}".ljust(6)
        rawp = js_tofixed((100 * p.usage_raw / t_raw) * 6, 3).rjust(6)
        real = f"{p.usage_real}".ljust(6)
        realp = js_tofixed((100 * p.usage_real / t_real) * 6, 3).rjust(6)
        s += f"| {rank} | {poke} | {use}% | {raw} | {rawp}% | {real} | {realp}% | \n"
    s += bar
    return s


def leads_report(v: FormatView) -> str:
    s = f"Total leads: {v.battles * 2}\n"
    bar = "+ ---- + ------------------ + --------- + ------ + ------- + \n"
    s += bar
    s += "| Rank | Pokemon            | Usage %   | Raw    | %       | \n"
    s += bar
    t_raw = max(1.0, v.lead_raw)
    t_w = max(1.0, v.lead_weighted)
    entries = sorted(v.pokemon.items(),
                     key=lambda kv: (-kv[1].lead_weighted, -kv[1].lead_raw,
                                     locale_key(kv[0])))
    for i, (sid, p) in enumerate(entries):
        if p.lead_raw == 0:
            break
        rank = f"{i + 1}".ljust(4)
        poke = v.dspecies(sid).ljust(18)
        use = js_tofixed(100 * p.lead_weighted / t_w, 5).rjust(8)
        raw = f"{p.lead_raw}".ljust(6)
        pct = js_tofixed(100 * p.lead_raw / t_raw, 3).rjust(6)
        s += f"| {rank} | {poke} | {use}% | {raw} | {pct}% | \n"
    s += bar
    return s


def moveset_report(v: FormatView, movesets=None, min_=MIN) -> str:
    movesets = movesets or to_moveset_statistics(v, min_n=min_[0])
    width = 40

    def pad(line):
        return line.ljust(width + 1) + "|"

    def heading(n):
        return pad(f"| {n}") + "\n"

    def display(n, w):
        return pad(f"| {n} {js_tofixed(100 * w, 3)}%") + "\n"

    def other(total, f=1):
        return pad(f"| Other {js_tofixed(abs(f * 100 * (1 - total)), 3)}%") + "\n"

    sep = "+" + "-" * width + "+\n"
    s = ""
    for sid, m in movesets.items():
        if m["usage"] < 0.0001:
            break
        p = v.pokemon[sid]
        s += sep
        s += pad(f"| {v.dspecies(sid)}") + "\n"
        s += sep
        s += pad(f"| Raw count: {m['Raw count']}") + "\n"
        avg = round_str(p.saved_weight / p.saved_count, 1e12) if p.saved_count else "---"
        s += pad(f"| Avg. weight: {avg}") + "\n"
        ceiling = math.floor(m["Viability Ceiling"][1])
        s += pad(f"| Viability Ceiling: {ceiling}") + "\n"
        s += sep

        total = 0.0
        s += heading("Abilities")
        for i, (name, w) in enumerate(m["Abilities"].items()):
            if i > 5:
                s += other(total)
                break
            weight = w / p.raw_weight
            s += display(v.dx.display_ability(name), weight)
            total += weight
        s += sep
        total = 0.0
        s += heading("Items")
        for name, w in m["Items"].items():
            if total > 0.95:
                s += other(total)
                break
            weight = w / p.raw_weight
            s += display(v.dx.display_item(name), weight)
            total += weight
        s += sep
        total = 0.0
        s += heading("Spreads")
        for i, (name, w) in enumerate(m["Spreads"].items()):
            if total > 0.95 or i > 5:
                s += other(total)
                break
            weight = w / p.raw_weight
            s += display(name, weight)
            total += weight
        s += sep
        total = 0.0
        s += heading("Moves")
        for name, w in m["Moves"].items():
            if total > 0.95:
                s += other(total, 4)
                break
            weight = w / p.raw_weight
            s += display(v.dx.display_move(name), weight)
            total += weight / 4
        s += sep
        total = 0.0
        teras = m["Tera Types"]
        if not (len(teras) == 1 and next(iter(teras)).lower() == "nothing"):
            s += heading("Tera Types")
            for name, w in teras.items():
                if total > 0.95:
                    s += other(total)
                    break
                weight = w / p.raw_weight
                s += display(name[0].upper() + name[1:] if name else name, weight)
                total += weight
            s += sep
            total = 0.0
        s += heading("Teammates")
        for i, (name, w) in enumerate(m["Teammates"].items()):
            if total > 0.95 or i > 10:
                break
            if w < 0.005 * p.raw_weight:
                break
            weight = w / p.raw_weight
            s += pad(f"| {name} {js_tofixed(100 * weight, 3)}%") + "\n"
            total += weight / 5
        s += sep
        cc = m["Checks and Counters"]
        if any(e["p"] - 4.0 * e["d"] >= 0.5 for e in cc.values()):
            s += heading("Checks and Counters")
            for i, (name, e) in enumerate(cc.items()):
                if i > 11:
                    break
                if e["score"] < min_[1]:
                    break
                line = (f"| {name} {js_tofixed(100 * e['score'], 3)} "
                        f"({js_tofixed(100 * e['p'], 2)}±{js_tofixed(100 * e['d'], 2)})"
                        ).ljust(width + 1) + "|\n"
                # FIXME-replica (reports.ts:321): \t + conditional pad spaces
                ko = 100 * e["koed"] / e["n"]
                sw = 100 * e["switched"] / e["n"]
                line += f"|\t({js_tofixed(ko, 1)}% KOed / {js_tofixed(sw, 1)}% switched out)"
                if ko < 10:
                    line += " "
                if sw < 10:
                    line += " "
                s += line + "\n"
            s += sep
    return s


def detailed_moveset_report(v: FormatView, tag=None, movesets=None,
                            min_n: float = 20) -> str:
    movesets = movesets or to_moveset_statistics(v, min_n=min_n)
    info = {
        "metagame": v.fmt, "cutoff": v.cutoff, "cutoff deviation": 0,
        "team type": tag, "number of battles": v.battles,
    }
    data = {}
    for sid, m in movesets.items():
        if m["usage"] < 0.0001:
            break
        m = dict(m)
        m["Checks and Counters"] = {
            k: {"n": js_round(e["n"]), "p": js_round(e["p"]),
                "d": js_round(e["d"])}
            for k, e in m["Checks and Counters"].items()}
        data[v.dspecies(sid)] = m
    return json_stringify({"info": info, "data": data})


def _fmod(a: float, b: float, f: float = 1e3) -> float:
    # reports.ts:651-655
    a = js_round(a, f)
    b = js_round(b, f)
    return (abs(a * f) % (b * f)) / f


def stalliness_histogram(st: pd.DataFrame):
    """Exact reconstruction of util.stallinessHistogram over value-grouped
    sample mass (value, count, weight)."""
    st = st.sort_values("value")
    values = st["value"].to_numpy()
    counts = st["count"].to_numpy().astype(np.int64)
    weights = st["weight"].to_numpy()
    n = int(counts.sum())
    if n == 0:
        return None
    # sample-position quantiles over the expanded (virtual) list
    cum = np.cumsum(counts)
    index = n // 1000
    low = float(values[np.searchsorted(cum, index + 1)])
    high = float(values[np.searchsorted(cum, n - index)])
    if low > 0:
        low = 0.0
    elif high < 0:
        high = 0.0
    nbins = 13
    size = (high - low) / (nbins - 1)
    bin_size = next((bs for bs in (10, 5, 2.5, 2, 1.5, 1, 0.5, 0.25, 0.2, 0.1, 0.05)
                     if size > bs), 0.05)
    xs = [0.0]
    x = bin_size
    while x + bin_size / 2 < high:
        xs.append(x)
        x += bin_size
    x = -bin_size
    while x - bin_size / 2 > low:
        xs.append(x)
        x -= bin_size
    xs.sort()
    hist = [[x, 0.0] for x in xs]
    nb = len(hist)
    j = 0
    for v_, c, w in zip(values, counts, weights):
        while j < nb and v_ > hist[0][0] + bin_size * (j + 0.5):
            j += 1
        if j >= nb:
            break
        hist[j][1] += w
    # zero total weight -> NaN mean, matching the reference JS 0/0 result —
    # computed without tripping numpy's divide RuntimeWarning
    wsum = float(weights.sum())
    mean = float((values * weights).sum() / wsum) if wsum else float("nan")
    return {"histogram": hist, "binSize": bin_size, "mean": mean,
            "total": wsum}


def metagame_report(v: FormatView) -> str:
    w_total = max(1.0, v.usage_weighted)
    tags = sorted(v.tags.items(), key=lambda kv: (-kv[1], locale_key(kv[0])))
    s = ""
    for tag, weight in tags:
        dots = "." * max(0, 18 - len(tag))
        s += f"{tag}{dots}{js_tofixed(100.0 * weight / w_total * 6.0, 5)}%\n"
    s += "\n"
    if v.stalliness is None or not len(v.stalliness):
        return s
    h = stalliness_histogram(v.stalliness)
    if h is None:
        return s
    max_w = max((x[1] for x in h["histogram"]), default=0.0)
    block = max_w / 30
    if block <= 0:
        return s
    s += f"Stalliness (mean: {js_tofixed(h['mean'], 3)})\n"
    for x, w in h["histogram"]:
        line = "    |"
        if _fmod(x, 2 * h["binSize"]) < h["binSize"] / 2:
            line = ""
            if x > 0:
                line += "+"
            elif x == 0:
                line += " "
            line += f"{js_tofixed(x, 1)}|"
        s += line + "#" * int(js_round(w / block, 1)) + "\n"
    s += "more negative = more offensive, more positive = more stall\n"
    s += f"one # = {js_tofixed(100.0 * block / h['total'], 2)}%\n"
    return s


# ---------------------------------------------------------------------------
# Display.fromStatistics (display.ts:93-172) — the unified display JSON

def display_statistics(v: FormatView, min_n: float = 0,
                       pretty: bool = True) -> str:
    R = lambda x: js_round(x, 1e4)  # noqa: E731
    real = v.fmt in _REAL_FORMATS

    def calc_usage(n_raw, n_real, n_w, d_raw, d_real, d_w, f=1):
        return {"raw": R(_div(n_raw, d_raw) * f),
                "real": R(_div(n_real, d_real) * f),
                "weighted": R(_div(n_w, d_w) * f)}

    N = v.dspecies_raw
    entries = list(v.pokemon.items())
    if v.fmt in _ALPHA_FORMATS:
        entries.sort(key=lambda kv: locale_key(N(kv[0])))
    elif real:
        entries.sort(key=lambda kv: (-kv[1].usage_real, locale_key(N(kv[0]))))
    else:
        entries.sort(key=lambda kv: (-kv[1].usage_weighted,
                                     locale_key(N(kv[0]))))

    def pct_obj(m, weight, display=None):
        # display.ts:305-319 toDisplayObject — break on first zero
        d = display or str
        items = sorted(m.items(), key=lambda kv: (-kv[1], locale_key(d(kv[0]))))
        out = {}
        for k, w in items:
            r = R(_div(w, weight))
            if _falsy(r):
                break
            out[d(k)] = r
        return out

    def teammates_obj(p):
        # display.ts:321-344 — unknown species skipped
        m = {}
        for sid, w in p.teammates.items():
            sp = v.dx.SPECIES.get(sid)
            if sp is None:
                continue
            m[sp["name"]] = 0 if sid not in v.pokemon else w
        return pct_obj(m, p.raw_weight)

    pokemon = {}
    for sid, p in entries:
        usage = calc_usage(p.usage_raw, p.usage_real, p.usage_weighted,
                           v.usage_raw, v.usage_real, v.usage_weighted, 6)
        if _falsy(usage["weighted"]):
            break
        cc = checks_and_counters(p.encounters, min_n)
        pokemon[N(sid)] = {
            "lead": calc_usage(p.lead_raw, p.lead_real, p.lead_weighted,
                               v.lead_raw, v.lead_real, v.lead_weighted),
            "usage": usage,
            "unique": calc_usage(p.unique_raw, p.unique_real,
                                 p.unique_weighted, v.unique_total_raw,
                                 v.unique_total_real,
                                 v.unique_total_weighted, 6),
            "win": calc_usage(p.win_raw, p.win_real, p.win_weighted,
                              p.usage_raw, p.usage_real, p.usage_weighted),
            "count": p.raw_count,
            "weight": R(p.saved_weight / p.saved_count) if p.saved_count else None,
            "viability": list(p.viability),
            "abilities": pct_obj(p.abilities, p.raw_weight,
                                 v.dx.display_ability),
            "items": pct_obj(p.items, p.raw_weight, v.dx.display_item),
            "teraTypes": pct_obj(p.teras, p.raw_weight,
                                 lambda t: t[0].upper() + t[1:] if t else t),
            "stats": pct_obj(p.statsmap, p.raw_weight),
            "moves": pct_obj(p.moves, p.raw_weight, v.dx.display_move),
            "teammates": teammates_obj(p),
            "counters": {N(k): [R(e["n"]), R(_div(e["koed"], e["n"])),
                                R(_div(e["switched"], e["n"]))]
                         for k, e in cc},
        }

    W = max(1.0, v.usage_weighted)
    tags = {}
    for t, w in sorted(v.tags.items(), key=lambda kv: (-kv[1],
                                                       locale_key(kv[0]))):
        r = R(w / W)
        if _falsy(r):
            break
        tags[t] = r

    h = stalliness_histogram(v.stalliness) if v.stalliness is not None \
        and len(v.stalliness) else None
    stall = {
        "histogram": [[R(b), R(n)] for b, n in h["histogram"]],
        "mean": R(h["mean"]),
        "total": R(h["total"]),
    } if h else {"histogram": [], "mean": 0, "total": 0}

    obj = {"battles": v.battles, "pokemon": pokemon,
           "metagame": {"tags": tags, "stalliness": stall}}
    return stringify_pretty_compact(obj) if pretty else json_stringify(obj)


# ---------------------------------------------------------------------------
# inverse parsers (S10 — display.ts:387-535 analogues)

def parse_usage_report(report: str):
    """display.ts:388-410 parseUsageReport — split-based, so leading
    whitespace and column drift are tolerated like the reference. Keys are
    the printed display names; percentage fields keep the printed scale."""
    lines = report.split("\n")
    battles = int(_num(lines[0].split(": ")[1]))
    avg = _num(lines[1].split(": ")[1])
    usage = {}
    for i in range(5, len(lines)):
        line = lines[i].split("|")
        if len(line) < 8:
            break
        name = line[2][1:].strip()
        usage[name] = {
            "usage_pct": _num(line[3][1:line[3].index("%")]),
            "raw": int(_num(line[4][1:-1])),
            "raw_pct": _num(line[5][1:line[5].index("%")]),
            "real": int(_num(line[6][1:-1])),
            "real_pct": _num(line[7][1:line[7].index("%")]),
        }
    return {"battles": battles, "avg_weight": avg, "usage": usage}


def parse_leads_report(report: str):
    """display.ts:413-431 parseLeadsReport (same split-based tolerance)."""
    lines = report.split("\n")
    total = int(_num(lines[0].split(": ")[1]))
    leads = {}
    for i in range(4, len(lines)):
        line = lines[i].split("|")
        if len(line) < 6:
            break
        name = line[2][1:].strip()
        leads[name] = {
            "usage_pct": _num(line[3][1:line[3].index("%")]),
            "raw": int(_num(line[4][1:-1])),
            "raw_pct": _num(line[5][1:line[5].index("%")]),
        }
    return {"total_leads": total, "leads": leads}


_CC_SPECIES = re.compile(r"\| (.*) [-+.0-9]+ \([-+.0-9]+±[-+.0-9]+\)")
_CC_OUTCOME = re.compile(
    r"\|\W+\(([-+.0-9]+)% KOed / ([-+.0-9]+)% switched out\)")
_WEIGHT_NUM = re.compile(r"\d[\d.]*")


def partial_parse_moveset_report(report: str):
    """display.ts:432-483 partialParseMovesetReport — recover each species'
    average weight and checks-and-counters outcome percentages from the
    basic moveset text report (the S10 inverse needed by `convert` to
    rebuild the unified display JSON from published legacy reports)."""
    movesets: dict[str, dict] = {}
    species = ""
    s = ""
    in_cc = False
    cc_line = 0
    section_lines = 0
    prev_section_empty = False
    for line in report.split("\n"):
        if line.lstrip().startswith("+"):
            prev_section_empty = section_lines == 0
            in_cc = False
            cc_line = 0
            section_lines = 0
            continue
        section_lines += 1
        if "Checks and Counters" in line:
            in_cc = True
            cc_line = 0
            continue
        if section_lines == 1 and prev_section_empty:
            parts = line.split("|")
            species = parts[1].strip() if len(parts) > 1 else ""
            continue
        if species not in movesets and "Avg. weight" in line:
            m = _WEIGHT_NUM.search(line)
            movesets[species] = {"weight": float(m.group(0)) if m else None,
                                 "outcomes": {}}
            continue
        if in_cc:
            cc_line += 1
            if cc_line % 2 == 1:
                m = _CC_SPECIES.search(line)
                s = m.group(1) if m else ""
            else:
                m = _CC_OUTCOME.search(line)
                if m and species in movesets:
                    movesets[species]["outcomes"][s] = {
                        "koedn": float(m.group(1)) / 100,
                        "switchedn": float(m.group(2)) / 100,
                    }
    return movesets


_DIGIT = re.compile(r"\d")


def _num(s: str) -> float:
    """JS Number(): trims whitespace, '' -> 0, garbage -> NaN."""
    s = s.strip()
    if not s:
        return 0.0
    try:
        return float(s)
    except ValueError:
        return math.nan


def parse_metagame_report(report: str):
    """display.ts:485-535 parseMetagameReport — recover tag weights
    (fractions), stalliness mean, the histogram (bin axis reconstructed
    from the labeled rows, mass = bar length in '#'s) and the legend
    ('one # = x.xx%' as a fraction)."""
    tags: dict[str, float] = {}
    lines = report.split("\n")

    i = 0
    while i < len(lines):
        line = lines[i].lstrip()
        d = line.find(".")
        if d < 0:
            break
        tag = line[:d]
        ds = _DIGIT.search(line)
        tags[tag] = _num(line[ds.start():line.rfind("%")]) / 100 if ds \
            else math.nan
        i += 1
    i += 1
    if i >= len(lines):
        return {"tags": tags, "mean": 0, "histogram": [], "legend": 0}
    ds = _DIGIT.search(lines[i])
    # faithful port: Number() from the first DIGIT, so a negative mean's
    # sign is dropped exactly as in the reference
    mean = _num(lines[i][ds.start():lines[i].rfind(")")]) if ds else 0.0

    j = 0
    start: float | None = None
    step: float | None = None
    values: list[int] = []
    i += 1
    begin = i
    while i < len(lines):
        line = lines[i].split("|")
        if len(line) < 2:
            break
        if start is None or not step:
            if _DIGIT.search(line[0]):
                n = _num(line[0])
                if start is None:
                    start = n
                    j = i
                    if i != begin:
                        step = 0.0
                else:
                    s = (n - start) / (i - j)
                    if step == 0.0:
                        start -= (j - begin) * s
                    step = s
        values.append(len(line[1]))
        i += 1
    histogram: list[list[float]] = []
    for value in values:
        histogram.append([start, value])
        if start is not None:
            start += step or 0.0
    i += 1
    legend = 0.0
    if i < len(lines):
        ds = _DIGIT.search(lines[i])
        if ds:
            legend = _num(lines[i][ds.start():lines[i].rfind("%")]) / 100
    return {"tags": tags, "mean": mean, "histogram": histogram,
            "legend": legend}


# display.ts:85-87 — historical species-id fixups applied on re-parse
_FIX = {"mimikyutotembusted": "mimikyubustedtotem"}


def _display_object_weighted(m: dict, weight: float, display=None):
    """display.ts:296-310 (the local toDisplayObject): sort desc / name
    tiebreak, divide by weight, stop at the first falsy rounded value."""
    R = lambda x: js_round(x, 1e4)  # noqa: E731
    d = (lambda k: display(k) if isinstance(k, str) else str(k)) \
        if display else str
    items = sorted(m.items(), key=lambda kv: (-kv[1], locale_key(d(kv[0]))))
    out = {}
    for k, v in items:
        r = R(_div(v, weight))
        if _falsy(r):
            break
        out[d(k)] = r
    return out


def from_reports(dx: GenDex, usage_report: str, moveset_report: str,
                 detailed_report: str, metagame_report: str | None = None,
                 leads_report: str | None = None) -> dict:
    """display.ts:174-292 Display.fromReports — rebuild the unified legacy
    display-statistics object from the published text reports (the S11
    `convert` path for pre-unified report archives).

    Returns the structured object (dict); serialize with
    functions.jsfmt.json_stringify / stringify_pretty_compact."""
    import json as _json

    R = lambda x: js_round(x, 1e4)  # noqa: E731

    def N(n: str) -> str:
        from ..gendex import to_id
        sid = _FIX.get(to_id(n)) or dx.species_id(n)
        sp = dx.SPECIES.get(sid) if sid else None
        return sp["name"] if sp else n

    from ..gendex import to_id

    dr = _json.loads(detailed_report)
    ur = parse_usage_report(usage_report)
    pmr = partial_parse_moveset_report(moveset_report)
    mr = parse_metagame_report(metagame_report) if metagame_report else None
    lr = parse_leads_report(leads_report) if leads_report else None

    ur_by_id = {to_id(name): row for name, row in ur["usage"].items()}
    lr_by_id = {to_id(name): row for name, row in lr["leads"].items()} \
        if lr else {}

    pokemon: dict[str, dict] = {}
    for species, pm in pmr.items():
        if species == "empty":
            continue
        p = dr["data"].get(species)
        if p is None:
            continue
        sid = to_id(species)
        raw_weight = sum(p["Abilities"].values())
        w = pm["weight"]
        weight = R(w) if w is not None and not _falsy(w) else None

        urp = ur_by_id.get(sid)
        if urp is None:
            break
        usage = {"raw": R(urp["raw_pct"] / 100),
                 "real": R(urp["real_pct"] / 100),
                 "weighted": R(urp["usage_pct"] / 100)}
        if _falsy(usage["weighted"]):
            break

        lead = None
        lrp = lr_by_id.get(sid)
        if lrp:
            lead = {"raw": R(lrp["raw_pct"] / 100),
                    "real": R(lrp["raw_pct"] / 100),
                    "weighted": R(lrp["usage_pct"] / 100)}

        scored = {}
        for k, v in p.get("Checks and Counters", {}).items():
            o = pm["outcomes"].get(k)
            if not o:
                continue
            n = v[0] if isinstance(v, list) else v["n"]
            q = R(_div(o["koedn"] * n + o["switchedn"] * n, n))
            dd = R(math.sqrt(_div(q * (1.0 - q), n)))
            score = R(q - 4 * dd)
            scored[N(k)] = (score, [R(n), R(o["koedn"]), R(o["switchedn"])])
        counters = {k: val for k, (s, val) in
                    sorted(scored.items(),
                           key=lambda kv: (-kv[1][0], locale_key(kv[0])))}

        p.get("Teammates", {}).pop("empty", None)
        pokemon[N(species)] = {
            "lead": lead,
            "usage": usage,
            "count": p["Raw count"],
            "weight": weight,
            "viability": p["Viability Ceiling"],
            "abilities": _display_object_weighted(
                p["Abilities"], raw_weight, dx.display_ability),
            "items": _display_object_weighted(
                p["Items"], raw_weight, dx.display_item),
            "teraTypes": _display_object_weighted(
                p.get("Tera Types", {}), raw_weight,
                lambda t: t[0].upper() + t[1:] if t else t),
            "happinesses": _display_object_weighted(
                p["Happiness"], raw_weight) if p.get("Happiness") else None,
            "spreads": _display_object_weighted(p["Spreads"], raw_weight),
            "moves": _display_object_weighted(
                p["Moves"], raw_weight, dx.display_move),
            "teammates": _display_object_weighted(
                p.get("Teammates", {}), raw_weight, N),
            "counters": counters,
        }

    metagame = None
    if mr:
        tags = {}
        for tag, wt in mr["tags"].items():
            r = R(wt)
            if _falsy(r):
                break
            tags[tag] = r
        # display.ts:277 — the reference's own '// BUG: this probably
        # wrong' normalization, replicated for output parity
        total = sum(n for _, n in mr["histogram"]) / math.e
        metagame = {
            "tags": tags,
            "stalliness": {
                "histogram": [[R(b), R(n * mr["legend"] * total)]
                              for b, n in mr["histogram"]],
                "mean": R(mr["mean"]),
                "total": R(total),
            },
        }

    return {"battles": dr["info"]["number of battles"],
            "pokemon": pokemon, "metagame": metagame}
