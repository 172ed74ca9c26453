"""Pokémon stat formulas (gen 3+ semantics) + EV reconstruction.

Replicates gen.stats.calc / statToEV / getSpread / computeStats semantics
from the reference (stats/src/stats.ts:391-447, classifier.ts:163-192) using
the public stat formula. Only modern (gen >= 3) math — no legacy DV path.
"""

from __future__ import annotations

import math

from ..dex import NATURES, NEUTRAL_NATURES, SPECIES

STAT_ORDER = ("hp", "atk", "def", "spa", "spd", "spe")

# Hidden Power type list in canonical bit order (public gen-3+ formula)
_HP_TYPE_ORDER = (
    "Fighting", "Flying", "Poison", "Ground", "Rock", "Bug", "Ghost", "Steel",
    "Fire", "Water", "Grass", "Electric", "Psychic", "Ice", "Dragon", "Dark",
)


def hidden_power_type(ivs: dict) -> str:
    """gen.types.getHiddenPower(ivs).type analogue (gen 3+ bit formula)."""
    bits = [ivs[s] & 1 for s in ("hp", "atk", "def", "spe", "spa", "spd")]
    val = sum(b << i for i, b in enumerate(bits))
    return _HP_TYPE_ORDER[val * 15 // 63]


def nature_multiplier(nature_id: str, stat: str) -> float:
    n = NATURES[nature_id]
    if n["plus"] == stat:
        return 1.1
    if n["minus"] == stat:
        return 0.9
    return 1.0


def calc_stat(stat: str, base: int, iv: int, ev: int, level: int, nature_id: str) -> int:
    if stat == "hp":
        if base == 1:  # shedinja — @pkmn/data special-cases base-1 HP to 1
            return 1
        return math.floor((2 * base + iv + math.floor(ev / 4)) * level / 100) + level + 10
    val = math.floor((2 * base + iv + math.floor(ev / 4)) * level / 100) + 5
    return math.floor(val * nature_multiplier(nature_id, stat))


def calc_stats(species_id: str, ivs: dict, evs: dict, level: int, nature_id: str) -> dict:
    base = SPECIES[species_id]["baseStats"]
    out = {}
    for s in STAT_ORDER:
        if s == "hp" and base["hp"] == 1:
            out[s] = 1
        else:
            out[s] = calc_stat(s, base[s], ivs[s], evs[s], level, nature_id)
    return out


def stat_to_ev(stat: str, val: int, base: int, iv: int, level: int, nature_id: str) -> int:
    """Inverse of calc_stat (stats.ts:432-447), non-legacy path."""
    if stat == "hp":
        if base == 1:
            return 0
        return max(0, (math.ceil(((val - level - 10) * 100) / level) - 2 * base - iv) * 4)
    n = nature_multiplier(nature_id, stat)
    return max(0, (math.ceil(((math.ceil(val / n) - 5) * 100) / level) - 2 * base - iv) * 4)


import numpy as np

_SPECIES_LIST = sorted(SPECIES)
_SPECIES_IX = {s: i for i, s in enumerate(_SPECIES_LIST)}
_BASE_MATRIX = np.array([[SPECIES[s]["baseStats"][st] for st in STAT_ORDER]
                         for s in _SPECIES_LIST], dtype=np.int64)
_NATURE_LIST = sorted(NATURES)
_NATURE_IX = {n: i for i, n in enumerate(_NATURE_LIST)}
_NATURE_MULT = np.ones((len(_NATURE_LIST), 6))
for _n, _ix in _NATURE_IX.items():
    _nat = NATURES[_n]
    for _j, _st in enumerate(STAT_ORDER):
        if _nat["plus"] == _st:
            _NATURE_MULT[_ix, _j] = 1.1
        elif _nat["minus"] == _st:
            _NATURE_MULT[_ix, _j] = 0.9
_NATURE_NAMES = np.array([NATURES[n]["name"] for n in _NATURE_LIST])


def spread_and_stats_batch(species_ids: list[str], nature_ids: list[str],
                           ivs: np.ndarray, evs: np.ndarray,
                           levels: np.ndarray) -> tuple[list[str], list[str]]:
    """Vectorized spread_and_stats over n mons.

    ivs/evs: (n, 6) int arrays in STAT_ORDER; exact same semantics as the
    scalar path (float-division floors mirror JS Math.floor/Math.ceil)."""
    n = len(species_ids)
    sp_ix = np.fromiter((_SPECIES_IX[s] for s in species_ids), np.int64, n)
    nat_ix = np.fromiter(
        (_NATURE_IX["hardy" if x in NEUTRAL_NATURES else x] for x in nature_ids),
        np.int64, n)
    base = _BASE_MATRIX[sp_ix]                       # (n, 6)
    mult = _NATURE_MULT[nat_ix]                      # (n, 6)
    lv = levels.astype(np.float64)[:, None]

    raw = np.floor((2 * base + ivs + evs // 4) * lv / 100.0)
    stats = np.floor((raw + 5.0) * mult).astype(np.int64)
    hp = (raw[:, 0] + levels + 10).astype(np.int64)
    stats[:, 0] = hp
    shed = base[:, 0] == 1
    stats[shed, 0] = 1

    # EV reconstruction (stat_to_ev, non-legacy)
    val = stats.astype(np.float64)
    rev = (np.ceil((np.ceil(val / mult) - 5.0) * 100.0 / lv)
           - 2 * base - ivs) * 4
    rev_hp = (np.ceil((val[:, 0] - levels - 10.0) * 100.0 / levels.astype(np.float64))
              - 2 * base[:, 0] - ivs[:, 0]) * 4
    rev[:, 0] = rev_hp
    rev[shed, 0] = 0
    rev = np.maximum(0, rev).astype(np.int64)

    nat_names = _NATURE_NAMES[nat_ix]
    spreads = [f"{nm}:{r[0]}/{r[1]}/{r[2]}/{r[3]}/{r[4]}/{r[5]}"
               for nm, r in zip(nat_names, rev.tolist())]
    statkeys = [f"{s[0]}/{s[1]}/{s[2]}/{s[3]}/{s[4]}/{s[5]}"
                for s in stats.tolist()]
    return spreads, statkeys


def spread_and_stats(species_id: str, nature_id: str, ivs: dict, evs: dict,
                     level: int) -> tuple[str, str]:
    """Return (spread_key, stats_key) for one set.

    spread (stats.ts:391-415): 'Nature:ev_hp/.../ev_spe' with EVs
    reconstructed from the displayed stats (wasted EVs canonicalized away);
    neutral natures folded to Hardy first (stats.ts:330-334).
    stats (stats.ts:417-430): 'hp/atk/def/spa/spd/spe' computed stats.
    """
    nid = "hardy" if nature_id in NEUTRAL_NATURES else nature_id
    base = SPECIES[species_id]["baseStats"]
    revs = []
    stats = []
    for s in STAT_ORDER:
        if s == "hp" and base["hp"] == 1:
            val = 1
        else:
            val = calc_stat(s, base[s], ivs[s], evs[s], level, nid)
        stats.append(val)
        revs.append(stat_to_ev(s, val, base[s], ivs[s], level, nid))
    spread = f"{NATURES[nid]['name']}:" + "/".join(str(e) for e in revs)
    return spread, "/".join(str(v) for v in stats)
