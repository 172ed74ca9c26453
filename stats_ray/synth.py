"""Deterministic synthetic battle-log corpus + ground truth.

Generates (seeded, reproducible, parallelized with Ray Data):

- ``battles``     — the engine input table per BASELINE.json input_hint:
                    (doc_id:string, tokens:list<int32>, n_tok:int32, source:string)
                    where tokens = UTF-8 byte tokens of the canonical JSON
                    battle-log document (FIXTURES.md §1-2).
- ``gt_battles``  — battle-level ground truth (winner, turns, ratings,
                    per-cutoff Glicko weights computed with *math.erf* — an
                    implementation independent of the engine's Cody-erf —
                    leads, classification).
- ``gt_slots``    — per team-slot ground truth (canonical species/item/
                    ability/moves/spread/stats, turns_out, kos).
- ``gt_matchups`` — the expected matchup tuples (species1, species2, outcome).
- ``gt_tags``     — exploded (doc_id, side, tag) team-archetype tags.

The battle *script* (protocol lines) and its expected matchups are generated
FORWARD from a scenario model; the engine's parser must reconstruct the same
matchups BACKWARD from the lines (reference semantics:
stats/src/parser.ts:68-275). That asymmetry is what makes the DuckDB oracle
comparison a genuine test of the parser state machine.

Outcome enum (stats/src/util.ts:8-22): 0 P1_KOED, 1 P2_KOED, 2 DOUBLE_DOWN,
3 P1_SWITCHED_OUT, 4 P2_SWITCHED_OUT, 5 DOUBLE_SWITCH, 6 P1_FORCED_OUT,
7 P2_FORCED_OUT, 8 P1_UTURN_KOED, 9 P2_UTURN_KOED, 10 P1_FODDERED,
11 P2_FODDERED, 12 UNKNOWN.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import dex
from .dex import ABILITIES, HP_TYPES, ITEMS, MOVES, NATURES, SPECIES, to_id
from .functions.statmath import hidden_power_type, spread_and_stats
from .stages.classify import classify_team
from .tokens import canonical_json, encode_strings

SYNTH_VERSION = 4
DEFAULT_BASE = "/tmp/stats_ray_corpus"
N_BATTLES = {"0.001": 2000, "0.01": 20000, "0.1": 200000}

MONTH = "2026-07"

FORMAT_WEIGHTS = [
    ("gen9ou", 0.42),          # hot key — exercises skew handling
    ("gen9ubers", 0.14),
    ("gen9uu", 0.10),
    ("gen7ou", 0.08),
    ("gen9doublesou", 0.08),   # non-singles: no log scan
    ("gen9monotype", 0.07),    # tag-sharded format
    ("gen91v1", 0.05),         # non-6v6: never "short"
    ("gen9randombattle", 0.06),  # SKIP-listed: filtered by the pipeline
]
_FMT_CUM = np.cumsum([w for _, w in FORMAT_WEIGHTS])

BASE_POOL = sorted(s for s, v in SPECIES.items() if v["baseSpecies"] is None)
_TYPE_POOL = {}
for _s in BASE_POOL:
    for _t in SPECIES[_s]["types"]:
        _TYPE_POOL.setdefault(_t, []).append(_s)
MONO_TYPES = sorted(t for t, ss in _TYPE_POOL.items() if len(ss) >= 6)

_MOVE_POOL = sorted(m for m in MOVES if not m.startswith("hiddenpower"))
_ITEM_POOL = sorted(ITEMS)
_ABILITY_POOL = sorted(ABILITIES)
_NATURE_POOL = sorted(NATURES)

# Outcome codes
P1_KOED, P2_KOED, DOUBLE_DOWN = 0, 1, 2
P1_SWITCHED_OUT, P2_SWITCHED_OUT, DOUBLE_SWITCH = 3, 4, 5
P1_FORCED_OUT, P2_FORCED_OUT = 6, 7
P1_UTURN_KOED, P2_UTURN_KOED = 8, 9
P1_FODDERED, P2_FODDERED = 10, 11


def _rng(i: int) -> random.Random:
    seed = int.from_bytes(hashlib.md5(f"stats_ray:{SYNTH_VERSION}:{i}".encode()).digest()[:8],
                          "little")
    return random.Random(seed)


# ---------------------------------------------------------------------------
# raw team generation + forward canonicalization (independent of the engine's
# parse-stage implementation)

def _gen_mon(rng: random.Random, fmt: str, used: set, force_type: str | None) -> dict:
    pool = [s for s in BASE_POOL
            if s not in used and (force_type is None or force_type in SPECIES[s]["types"])]
    sid = rng.choice(pool)
    used.add(sid)
    name = SPECIES[sid]["name"]

    r = rng.random()
    if r < 0.70:
        species_str = name
    elif r < 0.90:
        species_str = sid
    else:
        alias = [a for a, t in dex.ALIASES.items() if t == sid]
        species_str = alias[0] if alias else name.upper()

    item = rng.choice(_ITEM_POOL) if rng.random() < 0.82 else ("" if rng.random() < 0.7 else "Mystery Thing")
    ability = rng.choice(_ABILITY_POOL) if rng.random() < 0.92 else "???"
    # special combos exercising forme canonicalization
    if sid == "greninja" and rng.random() < 0.35:
        ability = "Battle Bond"
    elif sid == "zacian" and rng.random() < 0.4:
        item = "Rusted Sword"
    elif sid == "zamazenta" and rng.random() < 0.4:
        item = "Rusted Shield"
    elif sid == "kyogre" and rng.random() < 0.3:
        item = "Blue Orb"
    elif sid == "groudon" and rng.random() < 0.3:
        item = "Red Orb"
    elif sid == "charizard" and rng.random() < 0.3:
        item = "Charizardite Y"
    elif sid == "aegislash" and rng.random() < 0.6:
        ability = "Stance Change"

    moves = rng.sample(_MOVE_POOL, 4)
    if sid == "rayquaza" and rng.random() < 0.4:
        moves[0] = "dragonascent"
    elif sid == "meloetta" and rng.random() < 0.4:
        moves[0] = "relicsong"
    elif rng.random() < 0.10:
        moves[rng.randrange(4)] = "hiddenpower"
    # raw strings: mix of ids and display names
    raw_moves = [MOVES.get(m, m) if rng.random() < 0.5 else m for m in moves]

    evs = {k: 0 for k in ("hp", "atk", "def", "spa", "spd", "spe")}
    picks = rng.sample(list(evs), 3)
    evs[picks[0]], evs[picks[1]], evs[picks[2]] = 252, 252, 4
    ivs = {k: 31 for k in evs}
    if rng.random() < 0.2:
        ivs[rng.choice(list(ivs))] = rng.randrange(31)

    mon = {
        "name": name if rng.random() < 0.7 else f"Nick{rng.randrange(100)}",
        "species": species_str,
        "item": ITEMS.get(item, item) if rng.random() < 0.5 else item,
        "ability": ABILITIES.get(to_id(ability), ability),
        "moves": raw_moves,
        "nature": (NATURES[rng.choice(_NATURE_POOL)]["name"]
                   if rng.random() < 0.95 else "Mysterious"),
        "evs": evs,
        "ivs": ivs,
        "level": 100 if rng.random() < 0.85 else 50,
    }
    if rng.random() < 0.05:
        mon["forcedLevel"] = 5
    if rng.random() < 0.4:
        mon["happiness"] = rng.randrange(256)
    if "hiddenpower" in moves and rng.random() < 0.6:
        mon["hpType"] = rng.choice(HP_TYPES)
    if fmt.startswith("gen9") and rng.random() < 0.5:
        mon["teraType"] = rng.choice(dex.ALL_TYPES)
    if rng.random() < 0.3:
        mon["gender"] = rng.choice(["M", "F", ""])
    if rng.random() < 0.1:
        mon["shiny"] = True
    if rng.random() < 0.1:
        mon["pokeball"] = "Poke Ball"
    return mon


def _canon_mon(raw: dict) -> dict:
    """Forward canonicalization — mirrors the spec of Parser.canonicalizeTeam
    (parser.ts:278-334) but implemented independently of the engine stage."""
    item = to_id(raw.get("item") or "")
    item = item if item in ITEMS else "nothing"
    ability = to_id(raw.get("ability") or "")
    ability = ability if ability in ABILITIES else "unknown"
    nature = to_id(raw.get("nature") or "")
    nature = nature if nature in NATURES else "hardy"
    evs = {k: 0 for k in ("hp", "atk", "def", "spa", "spd", "spe")}
    evs.update({k: int(v) for k, v in raw.get("evs", {}).items()})
    ivs = {k: 31 for k in evs}
    ivs.update({k: int(v) for k, v in raw.get("ivs", {}).items()})
    moves = []
    for mv in raw["moves"][:4]:
        m = to_id(mv)
        if m == "hiddenpower":
            t = raw.get("hpType") or hidden_power_type(ivs)
            m = f"hiddenpower{to_id(t)}"
        moves.append(m)
    level = raw.get("forcedLevel") or raw.get("level") or 100
    sid = dex.species_id(raw.get("species") or raw.get("name"))
    assert sid is not None, raw
    happiness = raw.get("happiness", 255)
    tera = raw.get("teraType") or "nothing"
    if sid == "greninja" and ability == "battlebond":
        sid = "greninjaash"
    elif sid == "zacian" and item == "rustedsword":
        sid = "zaciancrowned"
    elif sid == "zamazenta" and item == "rustedshield":
        sid = "zamazentacrowned"
    elif item == "blueorb" and dex.base_species(sid) == "kyogre":
        sid, ability = "kyogreprimal", "primordialsea"
    elif item == "redorb" and dex.base_species(sid) == "groudon":
        sid, ability = "groudonprimal", "desolateland"
    elif item in dex.MEGA_STONES and dex.MEGA_STONES[item][0] == sid:
        sid, ability = dex.MEGA_STONES[item][1], dex.MEGA_STONES[item][2]
    return {
        "species": sid, "item": item, "ability": ability, "nature": nature,
        "moves": moves, "evs": evs, "ivs": ivs, "level": level,
        "happiness": happiness, "tera": tera,
    }


# ---------------------------------------------------------------------------
# battle script generation (forward scenario model)

def _switch_line(side: str, mon_raw: dict, kind: str = "switch") -> str:
    sp = SPECIES[dex.base_species(dex.species_id(mon_raw["species"]))]["name"]
    nick = mon_raw.get("name") or sp
    return f"|{kind}|{side}a: {nick}|{sp}, L{mon_raw.get('level', 100)}|100/100"


def _nick(mon_raw: dict) -> str:
    """Protocol nickname of a mon (full name; anon/parser resolve prefixes)."""
    sp = SPECIES[dex.base_species(dex.species_id(mon_raw["species"]))]["name"]
    return mon_raw.get("name") or sp


def _gen_script(rng, team1_raw, team2_raw, p1name, p2name, winner, turns):
    """Returns (lines, matchups, turns_out per side, kos per side)."""
    n1, n2 = len(team1_raw), len(team2_raw)
    a1, a2 = 0, 0
    bench1 = set(range(1, n1))
    bench2 = set(range(1, n2))
    to1, to2 = [0] * n1, [0] * n2
    kos1, kos2 = [0] * n1, [0] * n2
    lines = [f"|player|p1|{p1name}|266|1500",
             f"|player|p2|{p2name}|102|1490",
             "|gametype|singles", "|rated",
             "|start",
             _switch_line("p1", team1_raw[0]),
             _switch_line("p2", team2_raw[0])]
    if rng.random() < 0.4:
        lines.append(f"|c|\u2606{p1name}|glhf")
        lines.append(f"|j| {p2name}")
        lines.append(f"|inactive|{p1name} has 270 seconds left.")
    matchups = []  # (p1_slot, p2_slot, outcome); species resolved by caller

    for t in range(1, turns + 1):
        lines.append(f"|turn|{t}")
        to1[a1] += 1
        to2[a2] += 1
        if rng.random() < 0.08:
            # |replace| re-identifies the active mon (parser.ts:206-210);
            # no matchup/turnsOut effect — exercises identify on the oracle path
            lines.append(_switch_line("p1", team1_raw[a1], "replace"))
        last = t == turns
        ops = ["stay", "stay", "stay", "switch1", "switch2", "double_switch",
               "uturn1", "forced1", "forced2", "enditem_forced1", "enditem_eject2"]
        if not last:
            ops += ["ko1", "ko2", "uturnko1", "uturnko2", "fodder1", "fodder2"]
        op = rng.choice(ops)
        if op in ("switch1", "uturn1", "forced1", "enditem_forced1", "fodder1",
                  "ko1", "uturnko1", "uturnko2") and not bench1:
            op = "stay"
        if op in ("switch2", "forced2", "enditem_eject2", "fodder2",
                  "ko2", "uturnko1", "uturnko2") and not bench2:
            op = "stay"
        if op == "double_switch" and (not bench1 or not bench2):
            op = "stay"
        if op in ("fodder1",) and len(bench1) < 2:
            op = "stay"
        if op in ("fodder2",) and len(bench2) < 2:
            op = "stay"

        if op == "stay":
            lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|Tackle|p2a: {_nick(team2_raw[a2])}")
            if rng.random() < 0.5:
                lines.append(f"|move|p2a: {_nick(team2_raw[a2])}|Scald|p1a: {_nick(team1_raw[a1])}")
        elif op == "switch1":
            new = rng.choice(sorted(bench1))
            lines.append(f"|move|p2a: {_nick(team2_raw[a2])}|Scald|p1a: {_nick(team1_raw[a1])}")
            lines.append(_switch_line("p1", team1_raw[new]))
            matchups.append((a1, a2, P1_SWITCHED_OUT))
            bench1.remove(new); bench1.add(a1); a1 = new
        elif op == "switch2":
            new = rng.choice(sorted(bench2))
            lines.append(_switch_line("p2", team2_raw[new]))
            matchups.append((a1, a2, P2_SWITCHED_OUT))
            bench2.remove(new); bench2.add(a2); a2 = new
        elif op == "double_switch":
            new1 = rng.choice(sorted(bench1))
            new2 = rng.choice(sorted(bench2))
            lines.append(_switch_line("p1", team1_raw[new1]))
            lines.append(_switch_line("p2", team2_raw[new2]))
            matchups.append((a1, a2, DOUBLE_SWITCH))
            bench1.remove(new1); bench1.add(a1); a1 = new1
            bench2.remove(new2); bench2.add(a2); a2 = new2
        elif op == "uturn1":  # voluntary pivot — still a plain switch-out
            new = rng.choice(sorted(bench1))
            lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|U-turn|p2a: {_nick(team2_raw[a2])}")
            lines.append(_switch_line("p1", team1_raw[new]))
            matchups.append((a1, a2, P1_SWITCHED_OUT))
            bench1.remove(new); bench1.add(a1); a1 = new
        elif op in ("forced1", "forced2"):
            side = 1 if op == "forced1" else 2
            if side == 1:
                new = rng.choice(sorted(bench1))
                lines.append(f"|move|p2a: {_nick(team2_raw[a2])}|Roar|p1a: {_nick(team1_raw[a1])}")
                lines.append(_switch_line("p1", team1_raw[new], "drag"))
                matchups.append((a1, a2, P1_FORCED_OUT))
                bench1.remove(new); bench1.add(a1); a1 = new
            else:
                new = rng.choice(sorted(bench2))
                lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|Whirlwind|p2a: {_nick(team2_raw[a2])}")
                lines.append(_switch_line("p2", team2_raw[new], "drag"))
                matchups.append((a1, a2, P2_FORCED_OUT))
                bench2.remove(new); bench2.add(a2); a2 = new
        elif op == "enditem_forced1":
            new = rng.choice(sorted(bench1))
            nick2 = _nick(team2_raw[a2])
            lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|Tackle|p2a: {nick2}")
            lines.append(f"|-enditem|p2a: {nick2}|Red Card")
            lines.append(_switch_line("p1", team1_raw[new], "drag"))
            matchups.append((a1, a2, P1_FORCED_OUT))
            bench1.remove(new); bench1.add(a1); a1 = new
        elif op == "enditem_eject2":
            new = rng.choice(sorted(bench2))
            nick2 = _nick(team2_raw[a2])
            lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|Tackle|p2a: {nick2}")
            lines.append(f"|-enditem|p2a: {nick2}|Eject Button")
            lines.append(_switch_line("p2", team2_raw[new]))
            matchups.append((a1, a2, P2_SWITCHED_OUT))
            bench2.remove(new); bench2.add(a2); a2 = new
        elif op in ("ko1", "ko2"):
            if op == "ko1":
                new = rng.choice(sorted(bench1))
                nick1 = _nick(team1_raw[a1])
                lines.append(f"|move|p2a: {_nick(team2_raw[a2])}|Surf|p1a: {nick1}")
                lines.append(f"|faint|p1a: {nick1}")
                lines.append(_switch_line("p1", team1_raw[new]))
                matchups.append((a1, a2, P1_KOED))
                kos1[a1] += 1  # reference increments the KOed mon (stats.ts quirk)
                bench1.remove(new); a1 = new
            else:
                new = rng.choice(sorted(bench2))
                nick2 = _nick(team2_raw[a2])
                lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|Earthquake|p2a: {nick2}")
                lines.append(f"|faint|p2a: {nick2}")
                lines.append(_switch_line("p2", team2_raw[new]))
                matchups.append((a1, a2, P2_KOED))
                kos2[a2] += 1
                bench2.remove(new); a2 = new
        elif op in ("uturnko1", "uturnko2"):
            # pX U-turns, opponent's active faints to the hit, both replace.
            # Parser double-increments the fainted mon's kos (close-out +
            # review, parser.ts:215-231) — replicated here.
            if op == "uturnko1":  # p1 uses U-turn, p2's mon faints
                new1 = rng.choice(sorted(bench1))
                new2 = rng.choice(sorted(bench2))
                nick2 = _nick(team2_raw[a2])
                lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|U-turn|p2a: {nick2}")
                lines.append(f"|faint|p2a: {nick2}")
                lines.append(_switch_line("p1", team1_raw[new1]))
                lines.append(_switch_line("p2", team2_raw[new2]))
                matchups.append((a1, a2, P2_UTURN_KOED))
                kos2[a2] += 2
                bench1.remove(new1); bench1.add(a1); a1 = new1
                bench2.remove(new2); a2 = new2
            else:  # p2 uses Volt Switch, p1's mon faints
                new1 = rng.choice(sorted(bench1))
                new2 = rng.choice(sorted(bench2))
                nick1 = _nick(team1_raw[a1])
                lines.append(f"|move|p2a: {_nick(team2_raw[a2])}|Volt Switch|p1a: {nick1}")
                lines.append(f"|faint|p1a: {nick1}")
                lines.append(_switch_line("p2", team2_raw[new2]))
                lines.append(_switch_line("p1", team1_raw[new1]))
                matchups.append((a1, a2, P1_UTURN_KOED))
                kos1[a1] += 2
                bench2.remove(new2); bench2.add(a2); a2 = new2
                bench1.remove(new1); a1 = new1
        elif op in ("fodder1", "fodder2"):
            if op == "fodder1":
                mid, new = rng.sample(sorted(bench1), 2)
                lines.append(_switch_line("p1", team1_raw[mid]))
                matchups.append((a1, a2, P1_SWITCHED_OUT))
                nick = team1_raw[mid].get("name", "x")
                lines.append(f"|faint|p1a: {nick}")
                lines.append(_switch_line("p1", team1_raw[new]))
                matchups.append((mid, a2, P1_FODDERED))
                bench1.add(a1); bench1.discard(mid); bench1.discard(new)
                a1 = new
            else:
                mid, new = rng.sample(sorted(bench2), 2)
                lines.append(_switch_line("p2", team2_raw[mid]))
                matchups.append((a1, a2, P2_SWITCHED_OUT))
                nick = team2_raw[mid].get("name", "y")
                lines.append(f"|faint|p2a: {nick}")
                lines.append(_switch_line("p2", team2_raw[new]))
                matchups.append((a1, mid, P2_FODDERED))
                bench2.add(a2); bench2.discard(mid); bench2.discard(new)
                a2 = new

    # end of battle
    if winner == 0:
        lines.append("|tie")
    else:
        r = rng.random()
        if r < 0.25 and winner == 1 and bench2:
            nick2 = _nick(team2_raw[a2])
            lines.append(f"|move|p1a: {_nick(team1_raw[a1])}|Ice Beam|p2a: {nick2}")
            lines.append(f"|faint|p2a: {nick2}")
            matchups.append((a1, a2, P2_KOED))
            kos2[a2] += 1
        elif r < 0.35 and winner == 2 and bench1:
            nick1 = _nick(team1_raw[a1])
            lines.append(f"|move|p2a: {_nick(team2_raw[a2])}|Flamethrower|p1a: {nick1}")
            lines.append(f"|faint|p1a: {nick1}")
            matchups.append((a1, a2, P1_KOED))
            kos1[a1] += 1
        elif r < 0.40:
            nick1 = _nick(team1_raw[a1])
            nick2 = _nick(team2_raw[a2])
            lines.append(f"|move|p1a: {nick1}|Explosion|p2a: {nick2}")
            lines.append(f"|faint|p1a: {nick1}")
            lines.append(f"|faint|p2a: {nick2}")
            matchups.append((a1, a2, DOUBLE_DOWN))
            kos1[a1] += 1
            kos2[a2] += 1
        lines.append(f"|win|{p1name if winner == 1 else p2name}")
    return lines, matchups, to1, to2, kos1, kos2


# ---------------------------------------------------------------------------
# per-battle generation

def _gt_weight(rpr: float, rprd: float, cutoff: float) -> float:
    # independent implementation: math.erf, not the engine's Cody erf
    if rprd > 100 and cutoff > 1500:
        return 0.0
    return (math.erf((rpr - cutoff) / rprd / math.sqrt(2.0)) + 1.0) / 2.0


def _gt_player_weights(has_rating, rpr, rprd, outcome, cutoffs):
    valid = bool(has_rating) and rprd != 0
    if valid:
        r, d = rpr, rprd
    elif outcome == 1:
        r, d = 1540.16061434, 122.858308077
    elif outcome == 2:
        r, d = 1459.83938566, 122.858308077
    else:
        r, d = 1500.0, 130.0
    return [_gt_weight(r, d, c) for c in cutoffs], valid


def _gt_binary_weight(rating, cutoff=1630.0):
    """Binary-db stats weight (binary.ts:284-287): the codec's ROUNDED
    rating (u16 rpr / u8 rprd), no validity imputation, util.weighting
    semantics — math.erf, independent of the engine's Cody erf."""
    if rating is None:
        return 0.0
    rpr = float(min(max(round(rating["rpr"]), 0), 0xFFFE))
    rprd = float(min(max(round(rating["rprd"]), 0), 255))
    if rprd > 100 and cutoff > 1500:
        return 0.0
    if rprd == 0:
        return 1.0 if rpr > cutoff else (0.0 if rpr < cutoff else 0.5)
    return (math.erf((rpr - cutoff) / rprd / math.sqrt(2.0)) + 1.0) / 2.0


def _gt_gxe(rpr, rprd):
    c = (3.0 * math.log(10.0) ** 2.0) / (400.0 * math.pi) ** 2
    d = rprd ** 2.0 + 130.0 ** 2.0
    vc = 1.0 / (1.0 + 10.0 ** ((1500.0 - rpr) / 400.0 / math.sqrt(1.0 + c * d)))
    return math.floor(100.0 * vc + 0.5)


def gen_battle(i: int) -> dict:
    rng = _rng(i)
    u = rng.random()
    fmt = FORMAT_WEIGHTS[int(np.searchsorted(_FMT_CUM, u, side="right"))][0]
    day = rng.randint(1, 28)
    doc_id = f"battle-{fmt}-{i}"
    source = f"{fmt}/{MONTH}-{day:02d}"

    singles = not dex.is_non_singles(fmt)
    non6v6 = dex.is_non_6v6(fmt)
    skip = dex.skip_format(fmt)
    cutoffs = dex.cutoffs_for(fmt)

    i1 = 1 + min(int(rng.paretovariate(1.1)), 400)
    i2 = 1 + min(int(rng.paretovariate(1.1)), 400)
    if i2 == i1:
        i2 = i1 + 1
    name1, name2 = f"Trainer {i1}", f"Trainer {i2}"

    def gen_rating(r):
        if r.random() < 0.15:
            return None
        rpr = round(min(2400.0, max(1000.0, r.gauss(1550, 180))), 2)
        rprd = 0.0 if r.random() < 0.03 else round(r.uniform(25, 180), 2)
        return {"rpr": rpr, "rprd": rprd}
    rating1, rating2 = gen_rating(rng), gen_rating(rng)

    n_mons = 3 if non6v6 else (6 if rng.random() < 0.9 else 5)
    mono_type = rng.choice(MONO_TYPES) if fmt == "gen9monotype" else None
    used1, used2 = set(), set()
    team1_raw = [_gen_mon(rng, fmt, used1, mono_type) for _ in range(n_mons)]
    team2_raw = [_gen_mon(rng, fmt, used2, mono_type) for _ in range(n_mons)]
    team1 = [_canon_mon(m) for m in team1_raw]
    team2 = [_canon_mon(m) for m in team2_raw]
    trunc_after_script = []
    if rng.random() < 0.3:
        # exercise the nickname-prefix identification path (parser.ts:358-377):
        # protocol lines carry the full nickname, the stored set only a prefix
        s_ix = rng.randrange(n_mons)
        full = f"Longname{rng.randrange(1000)}xyz"
        team1_raw[s_ix]["name"] = full
        trunc_after_script.append((team1_raw[s_ix], full[:8]))

    wr = rng.random()
    winner = 1 if wr < 0.45 else (2 if wr < 0.90 else 0)
    end_type = rng.choice(["normal", "normal", "normal", "forfeit", "forced"])

    no_log = rng.random() < 0.02
    if no_log:
        turns = 0
        lines = ["|start"]
        if winner:
            lines.append(f"|win|{name1 if winner == 1 else name2}")
        mt, to1, to2, kos1, kos2 = [], [0] * n_mons, [0] * n_mons, [0] * n_mons, [0] * n_mons
    else:
        turns = rng.randint(1, 2) if rng.random() < 0.06 else rng.randint(3, 20)
        lines, mt, to1, to2, kos1, kos2 = _gen_script(
            rng, team1_raw, team2_raw, name1, name2, winner, turns)
        for mon_raw, prefix in trunc_after_script:
            mon_raw["name"] = prefix  # truncate only in the stored team JSON
        if not singles:
            # parser skips the log for non-singles formats (parser.ts:119)
            mt, to1, to2 = [], [0] * n_mons, [0] * n_mons
            kos1, kos2 = [0] * n_mons, [0] * n_mons

    # matchups resolved to canonical species
    matchups = [
        {"idx": k, "s1": team1[s1]["species"], "s2": team2[s2]["species"],
         "outcome": out}
        for k, (s1, s2, out) in enumerate(mt)
    ]

    # leads (stats.ts:516-540): first matchup, else first mon with turnsOut>0
    lead1 = lead2 = "empty"
    if singles:
        if matchups:
            lead1, lead2 = matchups[0]["s1"], matchups[0]["s2"]
        else:
            for j, v in enumerate(to1):
                if v > 0:
                    lead1 = team1[j]["species"]
                    break
            for j, v in enumerate(to2):
                if v > 0:
                    lead2 = team2[j]["species"]
                    break

    short = (not non6v6) and (turns < 2 or (turns < 3 and singles))

    o1 = 0 if winner == 0 else (1 if winner == 1 else 2)
    o2 = 0 if winner == 0 else (1 if winner == 2 else 2)
    w1, valid1 = _gt_player_weights(rating1 is not None, (rating1 or {}).get("rpr", 0.0),
                                    (rating1 or {}).get("rprd", 0.0), o1, cutoffs)
    w2, valid2 = _gt_player_weights(rating2 is not None, (rating2 or {}).get("rpr", 0.0),
                                    (rating2 or {}).get("rprd", 0.0), o2, cutoffs)
    gxe1 = _gt_gxe(rating1["rpr"], rating1["rprd"]) if rating1 else None
    gxe2 = _gt_gxe(rating2["rpr"], rating2["rprd"]) if rating2 else None

    bias1, stall1, tags1 = classify_team(team1)
    bias2, stall2, tags2 = classify_team(team2)

    doc = {
        "id": doc_id,
        "format": fmt,
        "timestamp": f"{MONTH}-{day:02d}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:"
                     f"{rng.randrange(60):02d}Z",
        "winner": "" if winner == 0 else (name1 if winner == 1 else name2),
        "endType": end_type,
        "seed": [rng.randrange(65536) for _ in range(4)],
        "turns": turns,
        "score": [sum(kos2), sum(kos1)],
        "p1": name1, "p2": name2,
        "p1rating": rating1, "p2rating": rating2,
        "p1team": team1_raw, "p2team": team2_raw,
        "log": lines,
        "inputLog": [f">p1 team {i % 6 + 1}", f">p2 move {i % 4 + 1}"],
    }
    doc_str = canonical_json(doc)

    slots = []
    for side, (team_c, player, tos, koss) in enumerate(
            [(team1, to_id(name1), to1, kos1), (team2, to_id(name2), to2, kos2)], start=1):
        for j, m in enumerate(team_c):
            spread, statsk = spread_and_stats(m["species"], m["nature"], m["ivs"],
                                              m["evs"], m["level"])
            slots.append({
                "side": side, "slot": j, "player": player,
                "species": m["species"], "item": m["item"], "ability": m["ability"],
                "nature": m["nature"], "happiness": m["happiness"], "level": m["level"],
                "tera": m["tera"],
                "move1": m["moves"][0], "move2": m["moves"][1],
                "move3": m["moves"][2], "move4": m["moves"][3],
                "spread": spread, "stats": statsk,
                "turns_out": tos[j], "kos": koss[j],
            })

    tags = ([{"side": 1, "tag": t} for t in tags1]
            + [{"side": 2, "tag": t} for t in tags2])

    row = {
        "doc_id": doc_id, "source": source, "format": fmt, "day": day,
        "doc": doc_str,
        "skip": skip, "singles": singles, "non6v6": non6v6, "short": short,
        "p1": to_id(name1), "p2": to_id(name2), "winner": winner,
        "turns": turns, "end_type": end_type,
        "p1_has_rating": rating1 is not None,
        "p1_rpr": (rating1 or {}).get("rpr"), "p1_rprd": (rating1 or {}).get("rprd"),
        "p1_valid": valid1, "p1_gxe": gxe1,
        "p2_has_rating": rating2 is not None,
        "p2_rpr": (rating2 or {}).get("rpr"), "p2_rprd": (rating2 or {}).get("rprd"),
        "p2_valid": valid2, "p2_gxe": gxe2,
        "lead1": lead1, "lead2": lead2,
        "p1_bias": bias1, "p1_stalliness": stall1,
        "p2_bias": bias2, "p2_stalliness": stall2,
        "slots": slots, "matchups": matchups, "tags": tags,
    }
    row["p1_bw"] = _gt_binary_weight(rating1)
    row["p2_bw"] = _gt_binary_weight(rating2)
    for k in range(4):
        row[f"cutoff{k}"] = cutoffs[k]
        row[f"p1_w{k}"] = w1[k]
        row[f"p2_w{k}"] = w2[k]
    return row


# ---------------------------------------------------------------------------
# Arrow schema + Ray Data generation

from .schema import MATCHUP_T as _MATCHUP_T
from .schema import SLOT_T as _SLOT_T
from .schema import TAG_T as _TAG_T

_SCALARS = [
    ("doc_id", pa.string()), ("source", pa.string()), ("format", pa.string()),
    ("day", pa.int32()),
    ("skip", pa.bool_()), ("singles", pa.bool_()), ("non6v6", pa.bool_()),
    ("short", pa.bool_()),
    ("p1", pa.string()), ("p2", pa.string()), ("winner", pa.int8()),
    ("turns", pa.int32()), ("end_type", pa.string()),
    ("p1_has_rating", pa.bool_()), ("p1_rpr", pa.float64()),
    ("p1_rprd", pa.float64()), ("p1_valid", pa.bool_()), ("p1_gxe", pa.float64()),
    ("p2_has_rating", pa.bool_()), ("p2_rpr", pa.float64()),
    ("p2_rprd", pa.float64()), ("p2_valid", pa.bool_()), ("p2_gxe", pa.float64()),
    ("lead1", pa.string()), ("lead2", pa.string()),
    ("p1_bias", pa.int32()), ("p1_stalliness", pa.float64()),
    ("p2_bias", pa.int32()), ("p2_stalliness", pa.float64()),
    ("p1_bw", pa.float64()), ("p2_bw", pa.float64()),
    ("cutoff0", pa.int32()), ("cutoff1", pa.int32()),
    ("cutoff2", pa.int32()), ("cutoff3", pa.int32()),
    ("p1_w0", pa.float64()), ("p1_w1", pa.float64()),
    ("p1_w2", pa.float64()), ("p1_w3", pa.float64()),
    ("p2_w0", pa.float64()), ("p2_w1", pa.float64()),
    ("p2_w2", pa.float64()), ("p2_w3", pa.float64()),
]

WIDE_SCHEMA = pa.schema(
    _SCALARS
    + [("slots", pa.list_(_SLOT_T)), ("matchups", pa.list_(_MATCHUP_T)),
       ("tags", pa.list_(_TAG_T)),
       ("tokens", pa.list_(pa.int32())), ("n_tok", pa.int32())]
)

GT_BATTLE_COLS = [n for n, _ in _SCALARS]


def _gen_batch(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_pylist()
    rows = [gen_battle(i) for i in ids]
    cols = {}
    for name, typ in _SCALARS:
        cols[name] = pa.array([r[name] for r in rows], type=typ)
    cols["slots"] = pa.array([r["slots"] for r in rows], type=pa.list_(_SLOT_T))
    cols["matchups"] = pa.array([r["matchups"] for r in rows], type=pa.list_(_MATCHUP_T))
    cols["tags"] = pa.array([r["tags"] for r in rows], type=pa.list_(_TAG_T))
    toks = encode_strings([r["doc"] for r in rows])
    cols["tokens"] = toks
    cols["n_tok"] = pa.array([len(r["doc"].encode("utf-8")) for r in rows],
                             type=pa.int32())
    return pa.table(cols, schema=WIDE_SCHEMA)


def _explode(t: pa.Table, col: str) -> pa.Table:
    lst = t[col].combine_chunks()
    idx = pc.list_parent_indices(lst)
    flat = lst.flatten()
    out = {"doc_id": pc.take(t["doc_id"].combine_chunks(), idx)}
    for field in flat.type:
        out[field.name] = flat.field(field.name)
    return pa.table(out)


def build_corpus(out_dir: str, n: int) -> None:
    """Generate the corpus under out_dir (parallel, deterministic).

    At real scale this writes the wide table once and derives the narrow
    tables by column-pruned re-reads — parquet column pruning makes the
    projections cheap and each step streams.
    """
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    nblocks = max(8, min(256, n // 500))
    ds = ray.data.range(n, override_num_blocks=nblocks)
    ds.map_batches(_gen_batch, batch_format="pyarrow").write_parquet(
        f"{out_dir}/wide")

    wide = f"{out_dir}/wide"
    ray.data.read_parquet(wide, columns=["doc_id", "tokens", "n_tok", "source"]) \
        .write_parquet(f"{out_dir}/battles")
    ray.data.read_parquet(wide, columns=GT_BATTLE_COLS) \
        .write_parquet(f"{out_dir}/gt_battles")
    for col, name in [("slots", "gt_slots"), ("matchups", "gt_matchups"),
                      ("tags", "gt_tags")]:
        ray.data.read_parquet(wide, columns=["doc_id", col]) \
            .map_batches(lambda t, c=col: _explode(t, c), batch_format="pyarrow") \
            .write_parquet(f"{out_dir}/{name}")
    with open(f"{out_dir}/_SUCCESS.json", "w") as f:
        json.dump({"version": SYNTH_VERSION, "n": n}, f)


def sf_of_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> '0.01'."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else base


def corpus_dir(sf: str) -> str:
    return os.path.join(DEFAULT_BASE, f"sf{sf}")


def ensure_corpus(sf_dir_or_sf: str) -> str:
    """Idempotently materialize the corpus for a scale factor; returns dir."""
    sf = sf_of_dir(sf_dir_or_sf)
    n = N_BATTLES.get(sf)
    if n is None:
        n = max(100, int(float(sf) * 2_000_000))
    out = corpus_dir(sf)
    marker = f"{out}/_SUCCESS.json"
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                meta = json.load(f)
            if meta.get("version") == SYNTH_VERSION and meta.get("n") == n:
                return out
        except (json.JSONDecodeError, OSError):
            pass
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    build_corpus(out, n)
    return out
