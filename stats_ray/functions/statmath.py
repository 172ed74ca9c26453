"""Pokémon stat formulas + EV reconstruction over a pluggable GenDex.

Replicates gen.stats.calc / statToEV / getSpread / computeStats semantics
from the reference (stats/src/stats.ts:391-447, classifier.ts:163-192) using
the public stat formulas:

- gen >= 3: floor((2*base + iv + floor(ev/4)) * level / 100) + 5 (or
  +level+10 for HP), nature multiplier floor-truncated;
- gen < 3 (@pkmn/data Stats.calc): ivs are converted to DVs (iv -> 2*floor
  (iv/2)) and natures are ignored — used only by the classifier, which is
  the one legacy call site that keeps the real generation
  (classifier.ts:176-192 passes the format's gen to gen.stats.calc).

Spread semantics (stats.ts:391-412): non-legacy reconstructs every EV from
the displayed stat; LEGACY reconstructs only 'def' and passes the raw EVs
through for the other five stats.
"""

from __future__ import annotations

import math

import numpy as np

from ..dex import NATURES, NEUTRAL_NATURES
from ..gendex import GenDex

STAT_ORDER = ("hp", "atk", "def", "spa", "spd", "spe")

# Hidden Power type list in canonical bit order (public gen-3+ formula)
_HP_TYPE_ORDER = (
    "Fighting", "Flying", "Poison", "Ground", "Rock", "Bug", "Ghost", "Steel",
    "Fire", "Water", "Grass", "Electric", "Psychic", "Ice", "Dragon", "Dark",
)


def _default_dex() -> GenDex:
    from ..dex import SYNTH_DEX
    return SYNTH_DEX


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


def calc_stat(stat: str, base: int, iv: int, ev: int, level: int,
              nature_id: str, gen_num: int = 9) -> int:
    if gen_num < 3:
        iv = (iv // 2) * 2  # toDV(iv) * 2
    if stat == "hp":
        if base == 1:  # shedinja — @pkmn/data special-cases base-1 HP
            return 1
        return math.floor((2 * base + iv + math.floor(ev / 4)) * level / 100) + level + 10
    val = math.floor((2 * base + iv + math.floor(ev / 4)) * level / 100) + 5
    mult = 1.0 if gen_num < 3 else nature_multiplier(nature_id, stat)
    return math.floor(val * mult)


def calc_stats(species_id: str, ivs: dict, evs: dict, level: int,
               nature_id: str, dx: GenDex | None = None,
               gen_num: int = 9) -> dict:
    dx = dx or _default_dex()
    base = dx.SPECIES[species_id]["baseStats"]
    out = {}
    for s in STAT_ORDER:
        out[s] = calc_stat(s, base[s], ivs[s], evs[s], level, nature_id,
                           gen_num)
    return out


def stat_to_ev(stat: str, val: int, base: int, iv: int, level: int,
               nature_id: str, gen_num: int = 9) -> int:
    """Inverse of calc_stat (stats.ts:430-447)."""
    if gen_num < 3:
        iv = (iv // 2) * 2
    if stat == "hp":
        if base == 1:
            return 0
        return max(0, (math.ceil(((val - level - 10) * 100) / level) - 2 * base - iv) * 4)
    n = nature_multiplier(nature_id, stat)
    return max(0, (math.ceil(((math.ceil(val / n) - 5) * 100) / level) - 2 * base - iv) * 4)


# ---------------------------------------------------------------------------
# vectorized batch path (one numpy pass per parse batch)

class _DexTables:
    def __init__(self, dx: GenDex):
        self.species_list = sorted(dx.SPECIES)
        self.species_ix = {s: i for i, s in enumerate(self.species_list)}
        self.base = np.array(
            [[dx.SPECIES[s]["baseStats"][st] for st in STAT_ORDER]
             for s in self.species_list], dtype=np.int64)
        self.nature_list = sorted(NATURES)
        self.nature_ix = {n: i for i, n in enumerate(self.nature_list)}
        self.nature_mult = np.ones((len(self.nature_list), 6))
        for n, ix in self.nature_ix.items():
            nat = NATURES[n]
            for j, st in enumerate(STAT_ORDER):
                if nat["plus"] == st:
                    self.nature_mult[ix, j] = 1.1
                elif nat["minus"] == st:
                    self.nature_mult[ix, j] = 0.9
        self.nature_names = np.array(
            [NATURES[n]["name"] for n in self.nature_list])


_TABLES: dict[str, _DexTables] = {}


def _tables(dx: GenDex) -> _DexTables:
    t = _TABLES.get(dx.name)
    if t is None:
        t = _TABLES[dx.name] = _DexTables(dx)
    return t


def spread_and_stats_batch(species_ids: list[str], nature_ids: list[str],
                           ivs: np.ndarray, evs: np.ndarray,
                           levels: np.ndarray,
                           dx: GenDex | None = None,
                           legacy: bool = False) -> tuple[list[str], list[str]]:
    """Vectorized spread/stats keys over n mons.

    ivs/evs: (n, 6) int arrays in STAT_ORDER. Non-legacy folds neutral
    natures to Hardy and EV-reconstructs every stat; legacy keeps the
    original nature and reconstructs only 'def' (stats.ts:342,396-410).
    Stat computation itself always uses the default (gen 9) formula because
    updateStats ignores the gen in legacy mode (stats.ts:282).
    """
    dx = dx or _default_dex()
    tb = _tables(dx)
    n = len(species_ids)
    sp_ix = np.fromiter((tb.species_ix[s] for s in species_ids), np.int64, n)
    if legacy:
        nat_ix = np.fromiter((tb.nature_ix[x] for x in nature_ids),
                             np.int64, n)
    else:
        nat_ix = np.fromiter(
            (tb.nature_ix["hardy" if x in NEUTRAL_NATURES else x]
             for x in nature_ids), np.int64, n)
    base = tb.base[sp_ix]                            # (n, 6)
    mult = tb.nature_mult[nat_ix]                    # (n, 6)
    lv = levels.astype(np.float64)[:, None]

    raw = np.floor((2 * base + ivs + evs // 4) * lv / 100.0)
    stats = np.floor((raw + 5.0) * mult).astype(np.int64)
    hp = (raw[:, 0] + levels + 10).astype(np.int64)
    stats[:, 0] = hp
    shed = base[:, 0] == 1
    stats[shed, 0] = 1

    # EV reconstruction (stat_to_ev)
    val = stats.astype(np.float64)
    rev = (np.ceil((np.ceil(val / mult) - 5.0) * 100.0 / lv)
           - 2 * base - ivs) * 4
    rev_hp = (np.ceil((val[:, 0] - levels - 10.0) * 100.0 / levels.astype(np.float64))
              - 2 * base[:, 0] - ivs[:, 0]) * 4
    rev[:, 0] = rev_hp
    rev[shed, 0] = 0
    rev = np.maximum(0, rev).astype(np.int64)
    if legacy:
        # legacy spreads: raw EVs except the reconstructed 'def' column
        legacy_rev = evs.copy()
        legacy_rev[:, 2] = rev[:, 2]
        rev = legacy_rev

    nat_names = tb.nature_names[nat_ix]
    spreads = [f"{nm}:{r[0]}/{r[1]}/{r[2]}/{r[3]}/{r[4]}/{r[5]}"
               for nm, r in zip(nat_names, rev.tolist())]
    statkeys = [f"{s[0]}/{s[1]}/{s[2]}/{s[3]}/{s[4]}/{s[5]}"
                for s in stats.tolist()]
    return spreads, statkeys


def spread_and_stats(species_id: str, nature_id: str, ivs: dict, evs: dict,
                     level: int, dx: GenDex | None = None,
                     legacy: bool = False) -> tuple[str, str]:
    """Return (spread_key, stats_key) for one set (scalar reference path)."""
    dx = dx or _default_dex()
    nid = nature_id if legacy else (
        "hardy" if nature_id in NEUTRAL_NATURES else nature_id)
    base = dx.SPECIES[species_id]["baseStats"]
    revs = []
    stats = []
    for s in STAT_ORDER:
        val = calc_stat(s, base[s], ivs[s], evs[s], level, nid)
        stats.append(val)
        if legacy and s != "def":
            revs.append(evs[s])
        else:
            revs.append(stat_to_ev(s, val, base[s], ivs[s], level, nid))
    spread = f"{NATURES[nid]['name']}:" + "/".join(str(e) for e in revs)
    return spread, "/".join(str(v) for v in stats)
