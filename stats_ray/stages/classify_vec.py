"""Vectorized team classifier: the batch kernel behind classify.classify_team.

classifier.ts's per-pokemon math (base stalliness from computed stats +
ability/item/move modifiers, classifier.ts:60-516) is elementwise, so a
whole parse batch of mons is classified in a handful of numpy kernels:

- move modifiers: each move id maps to a bitmask of table memberships; a
  mon's 4 moves OR together and the modifier is a weighted popcount — no
  Python set ops in the hot path;
- base stalliness: the same base-stats matrix kernel as
  statmath.spread_and_stats_batch, with shedinja/ditto/aegislash and the
  mega / forme averaging branches applied to boolean subsets;
- item specials (toxic orb, soul dew, ...) fall back to the scalar rule
  only for the rows that hold such an item.

Every operation is elementwise, so results are bitwise identical whether a
team is classified alone (the oracle/synth path) or inside a 6000-mon parse
batch — the DuckDB oracle groups stalliness by exact float value, so this
invariant is load-bearing.

The tag counters (classifier.ts:203-393) keep their sequential per-team
semantics (caps interact with mon order) but consume the precomputed
per-mon flag masks instead of re-deriving set memberships.
"""

from __future__ import annotations

import math

import numpy as np

from ..gendex import GenDex
from ..functions.statmath import _tables

LOG3_LOG2 = math.log(3) / math.log(2)
_LOG2 = math.log(2)

# move-flag bit positions
_MOVE_FLAGS = [
    ("toxic", 1.0), ("spikes", 0.5), ("toxicspikes", 0.5),
    ("willowisp", 0.5), ("psychoshift", 0.5), ("healbell", 0.5),
    ("haze", 0.5), ("substitute", -0.5), ("superfang", -0.5),
    ("trick", -0.5), ("endeavor", -1.0),
    ("recovery", 1.0), ("protection", 1.0), ("phazing", 0.5),
    ("paralysis", 0.5), ("confusion", 0.5), ("sleep", -0.5),
    ("lesserOffensive", -0.5), ("greaterOffensive", -1.0), ("ohko", -1.0),
]
_B_BELLY, _B_SHELL, _B_GSETUP, _B_LSETUP = 20, 21, 22, 23
_B_TRAPMOVE, _B_RECYCLE, _B_WEATHERMOVE = 24, 25, 26
# tag-loop move bits
_B_RAINDANCE, _B_SUNNYDAY, _B_SANDSTORM, _B_HAIL = 27, 28, 29, 30
_B_BATONPASS = 31
_B_BPSET = 32
_B_TAILWIND, _B_TRICKROOM, _B_IMPRISON, _B_GRAVITY = 33, 34, 35, 36
_B_GRAVMOVE, _B_VOLTTURN, _B_TAGTRAP, _B_RAPIDSPIN = 37, 38, 39, 40
_B_ENDEAVOR, _B_SWAGPLAY = 41, 42


class ClassifyTables:
    """Per-dex lookup tables for the vectorized classifier."""

    def __init__(self, dx: GenDex):
        self.dx = dx
        st = _tables(dx)
        self.species_ix = st.species_ix
        self.base = st.base  # (S, 6) base stats in STAT_ORDER
        self.nature_ix = st.nature_ix
        self.nature_mult = st.nature_mult

        sids = st.species_list
        self.is_shedinja = np.array([s == "shedinja" for s in sids])
        self.is_ditto = np.array([s == "ditto" for s in sids])

        # move id -> flag bitmask
        t = dx.TABLES
        sets = {
            "toxic": {"toxic"}, "spikes": {"spikes"},
            "toxicspikes": {"toxicspikes"}, "willowisp": {"willowisp"},
            "psychoshift": {"psychoshift"},
            "healbell": {"healbell", "aromatherapy"},
            "haze": {"haze", "clearsmog"}, "substitute": {"substitute"},
            "superfang": {"superfang"}, "trick": {"trick"},
            "endeavor": {"endeavor"},
            "recovery": t["recovery"], "protection": t["protection"],
            "phazing": t["phazing"], "paralysis": t["paralysis"],
            "confusion": t["confusion"], "sleep": t["sleep"],
            "lesserOffensive": t["lesserOffensive"],
            "greaterOffensive": t["greaterOffensive"], "ohko": t["ohko"],
        }
        mask: dict[str, int] = {}

        def add(ids, bit):
            for m in ids:
                mask[m] = mask.get(m, 0) | (1 << bit)

        for i, (name, _w) in enumerate(_MOVE_FLAGS):
            add(sets[name], i)
        add({"bellydrum"}, _B_BELLY)
        add({"shellsmash"}, _B_SHELL)
        add(t["greaterSetup"] - {"bellydrum", "shellsmash"}, _B_GSETUP)
        add(t["lesserSetup"], _B_LSETUP)
        add(dx.TRAPPING_MOVES, _B_TRAPMOVE)
        add({"recycle"}, _B_RECYCLE)
        add({"sandstorm", "hail"}, _B_WEATHERMOVE)
        add({"raindance"}, _B_RAINDANCE)
        add({"sunnyday"}, _B_SUNNYDAY)
        add({"sandstorm"}, _B_SANDSTORM)
        add({"hail"}, _B_HAIL)
        add({"batonpass"}, _B_BATONPASS)
        add(t["batonPass"], _B_BPSET)
        add({"tailwind"}, _B_TAILWIND)
        add({"trickroom"}, _B_TRICKROOM)
        add({"imprison"}, _B_IMPRISON)
        add({"gravity"}, _B_GRAVITY)
        add(t["gravity"], _B_GRAVMOVE)
        add({"voltswitch", "uturn", "batonpass"}, _B_VOLTTURN)
        add(dx.TAG_TRAPPING_MOVES if dx.legacy else dx.TRAPPING_MOVES,
            _B_TAGTRAP)
        add({"rapidspin"}, _B_RAPIDSPIN)
        add({"endeavor"}, _B_ENDEAVOR)
        add({"foulplay", "swagger"}, _B_SWAGPLAY)
        self.move_mask = mask
        self.flag_weights = np.array([w for _n, w in _MOVE_FLAGS])

        # ability -> stalliness modifier
        amod = {}
        for a in dx.GREATER_OFFENSIVE_ABILITIES:
            amod[a] = -1.0
        for a in dx.LESSER_OFFENSIVE_ABILITIES:
            amod.setdefault(a, -0.5)
        for a in dx.LESSER_DEFENSIVE_ABILITIES:
            amod.setdefault(a, 0.5)
        for a in dx.GREATER_DEFENSIVE_ABILITIES:
            amod.setdefault(a, 1.0)
        self.ability_mod = amod
        self.trapping_abilities = dx.TRAPPING_ABILITIES

        # item -> plain stalliness modifier (species/ability specials fall
        # back to the scalar rule, flagged here)
        imod = {}
        for i in dx.LESSER_BOOSTING_ITEMS:
            imod[i] = -0.25
        for i in dx.GREATER_BOOSTING_ITEMS:
            imod[i] = -0.5
        imod["weaknesspolicy"] = -1.0
        imod["lightclay"] = -1.0
        imod["rockyhelmet"] = 0.5
        imod["eviolite"] = 0.5
        self.item_mod = imod
        self.special_items = {
            "toxicorb", "flameorb", "souldew", "thickclub", "lightball",
            "deepseatooth", "deepseascale", "adamantorb", "lustrousorb",
            "griseousorb",
        }


_TABLE_CACHE: dict[str, ClassifyTables] = {}


def tables_for(dx: GenDex) -> ClassifyTables:
    t = _TABLE_CACHE.get(dx.name)
    if t is None:
        t = _TABLE_CACHE[dx.name] = ClassifyTables(dx)
    return t


def _calc_stats_matrix(tb: ClassifyTables, sp_ix, nat_ix, ivs, evs, levels,
                       gen_nums):
    """gen.stats.calc over (n, 6) — gen<3 rows use DVs and no natures
    (classifier.ts passes the real gen, @pkmn Stats.calc semantics)."""
    base = tb.base[sp_ix]
    mult = tb.nature_mult[nat_ix].copy()
    old = gen_nums < 3
    iv_eff = np.where(old[:, None], (ivs // 2) * 2, ivs)
    mult[old] = 1.0
    lv = levels.astype(np.float64)[:, None]
    raw = np.floor((2 * base + iv_eff + evs // 4) * lv / 100.0)
    stats = np.floor((raw + 5.0) * mult)
    hp = raw[:, 0] + levels + 10
    stats[:, 0] = np.where(base[:, 0] == 1, 1.0, hp)
    return stats  # float (n, 6)


def _base_stalliness_vec(tb: ClassifyTables, sp_ix, ability, nat_ix, ivs,
                         evs, levels, gen_nums):
    stats = _calc_stats_matrix(tb, sp_ix, nat_ix, ivs, evs, levels, gen_nums)

    # Aegislash stance averaging (classifier.ts:163-174)
    dx = tb.dx
    if "aegislashblade" in tb.species_ix:
        ae = tb.species_ix.get("aegislash")
        sub = (sp_ix == ae) & (ability == "stancechange") if ae is not None \
            else np.zeros(len(sp_ix), dtype=bool)
        if sub.any():
            blade_ix = np.full(int(sub.sum()), tb.species_ix["aegislashblade"])
            blade = _calc_stats_matrix(tb, blade_ix, nat_ix[sub], ivs[sub],
                                       evs[sub], levels[sub], gen_nums[sub])
            blade[:, 2] = np.floor((blade[:, 2] + stats[sub][:, 2]) / 2)
            blade[:, 4] = np.floor((blade[:, 4] + stats[sub][:, 4]) / 2)
            stats[sub] = blade

    level_term = np.floor(2.0 * levels + 10) / 250
    atk = np.maximum(stats[:, 1], stats[:, 3])
    dfn = np.maximum(stats[:, 2], stats[:, 4])
    x = ((level_term * atk / dfn * 120) + 2) * 0.925 / stats[:, 0]
    # math.log, not np.log: numpy's SIMD log differs from libm by 1 ulp on
    # ~15% of inputs, and the stalliness oracle groups by EXACT float value
    # — bitwise parity with the scalar classifier is load-bearing.
    out = np.fromiter((-math.log(t) for t in x.tolist()), np.float64, len(x))
    out /= _LOG2
    out[tb.is_shedinja[sp_ix]] = 0.0
    out[tb.is_ditto[sp_ix]] = LOG3_LOG2
    return out


def mon_masks(tb: ClassifyTables, moves: list[list[str]]) -> np.ndarray:
    """(n,) uint64 OR of the 4 move bitmasks."""
    mm = tb.move_mask
    return np.fromiter(
        (mm.get(m1, 0) | mm.get(m2, 0) | mm.get(m3, 0) | mm.get(m4, 0)
         for m1, m2, m3, m4 in moves),
        dtype=np.uint64, count=len(moves))


def _moves_modifier_vec(tb: ClassifyTables, masks: np.ndarray) -> np.ndarray:
    nflags = len(_MOVE_FLAGS)
    bits = ((masks[:, None] >> np.arange(nflags, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.float64)
    mod = bits @ tb.flag_weights
    # setup ladder (mutually exclusive else-if, classifier.ts:505-513)
    belly = (masks >> np.uint64(_B_BELLY)) & np.uint64(1)
    shell = ((masks >> np.uint64(_B_SHELL)) & np.uint64(1)) & (1 - belly)
    gsetup = ((masks >> np.uint64(_B_GSETUP)) & np.uint64(1)) \
        & (1 - belly) & (1 - shell)
    lsetup = ((masks >> np.uint64(_B_LSETUP)) & np.uint64(1)) \
        & (1 - belly) & (1 - shell) & (1 - gsetup)
    mod = mod - 2.0 * belly - 1.5 * shell - 1.0 * gsetup - 0.5 * lsetup
    return mod


def _item_modifier_vec(tb: ClassifyTables, species, items, abilities):
    out = np.zeros(len(items))
    for i, (sid, item, ab) in enumerate(zip(species, items, abilities)):
        if item in tb.special_items:
            from .classify import _item_modifier
            out[i] = _item_modifier(tb.dx, sid, item, ab)
        else:
            out[i] = tb.item_mod.get(item, 0.0)
    return out


def classify_mons_batch(mons: list[dict], dx: GenDex,
                        gen_nums: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                       np.ndarray]:
    """-> (bias int64, stalliness float64, flag-mask uint64) per mon.

    Replicates classifyPokemon (classifier.ts:60-107) including the mega /
    forme stalliness averaging; the returned mask feeds the tag loop."""
    tb = tables_for(dx)
    n = len(mons)
    species = [m["species"] for m in mons]
    abilities = [m["ability"] for m in mons]
    items = [m["item"] for m in mons]
    natures = [m["nature"] for m in mons]
    moves = [m["moves"] for m in mons]

    from ..functions.statmath import STAT_ORDER
    ivs = np.array([[m["ivs"][s] for s in STAT_ORDER] for m in mons],
                   dtype=np.int64)
    evs = np.array([[m["evs"][s] for s in STAT_ORDER] for m in mons],
                   dtype=np.int64)
    levels = np.array([m["level"] for m in mons], dtype=np.int64)

    # mega undo: classify with the base species, remember the second pass
    eff_species = list(species)
    second_species = [None] * n   # species for the averaging pass
    second_ability = [None] * n
    for i, sid in enumerate(species):
        if dx.is_mega(sid):
            sp = dx.SPECIES[sid]
            base = sp.get("baseSpecies") or sid
            eff_species[i] = base
            second_species[i] = base if dx.legacy else sid
            second_ability[i] = sp.get("ability0", abilities[i])
        elif not dx.legacy:
            base = sid
            if base == "meloetta" and "relicsong" in moves[i]:
                second_species[i] = "meloettapirouette"
                second_ability[i] = abilities[i]
            elif base == "darmanitan" and abilities[i] == "zenmode":
                second_species[i] = "darmanitanzen"
                second_ability[i] = abilities[i]
            elif base == "rayquaza" and "dragonascent" in moves[i]:
                second_species[i] = "rayquazamega"
                second_ability[i] = "deltastream"

    sp_ix = np.fromiter((tb.species_ix[s] for s in eff_species), np.int64, n)
    nat_ix = np.fromiter((tb.nature_ix[x] for x in natures), np.int64, n)
    ab_arr = np.array(abilities, dtype=object)

    masks = mon_masks(tb, moves)

    def forme_stalliness(sp_ix_, ability_list, idx, species_list):
        """classifyForme for the row subset idx with given species/ability
        (species_list = pokemon.species as visible to the item rules)."""
        base = _base_stalliness_vec(tb, sp_ix_, np.array(ability_list,
                                                         dtype=object),
                                    nat_ix[idx], ivs[idx], evs[idx],
                                    levels[idx], gen_nums[idx])
        amod = np.fromiter((tb.ability_mod.get(a, 0.0) for a in ability_list),
                           np.float64, len(ability_list))
        imod = _item_modifier_vec(tb, species_list,
                                  [items[i] for i in idx], ability_list)
        mmod = _moves_modifier_vec(tb, masks[idx])
        s = base + amod + imod + mmod
        trap_ab = np.fromiter((a in tb.trapping_abilities
                               for a in ability_list), bool,
                              len(ability_list))
        trap_mv = ((masks[idx] >> np.uint64(_B_TRAPMOVE))
                   & np.uint64(1)).astype(bool)
        s = s - 1.0 * trap_ab - 0.5 * (~trap_ab & trap_mv)
        harvest = np.fromiter((a == "harvest" for a in ability_list), bool,
                              len(ability_list))
        recycle = ((masks[idx] >> np.uint64(_B_RECYCLE))
                   & np.uint64(1)).astype(bool)
        s = s + 1.0 * (harvest | recycle)
        weather_ab = np.fromiter(
            (a in ("sandstream", "snowwarning") for a in ability_list), bool,
            len(ability_list))
        weather_mv = ((masks[idx] >> np.uint64(_B_WEATHERMOVE))
                      & np.uint64(1)).astype(bool)
        s = s + 0.5 * (weather_ab | weather_mv)
        return s - LOG3_LOG2

    all_idx = np.arange(n)
    stalliness = forme_stalliness(sp_ix, abilities, all_idx, eff_species)

    # second (averaging) pass for megas / non-legacy formes — the item rules
    # see the SECOND species (classifier.ts:96-99 swaps pokemon.species)
    sec = [i for i in range(n) if second_species[i] is not None]
    if sec:
        sec = np.array(sec)
        sp2 = np.fromiter((tb.species_ix[second_species[i]] for i in sec),
                          np.int64, len(sec))
        ab2 = [second_ability[i] for i in sec]
        s2 = forme_stalliness(sp2, ab2, sec,
                              [second_species[i] for i in sec])
        stalliness[sec] = (stalliness[sec] + s2) / 2

    bias = (evs[:, 1] + evs[:, 3] - evs[:, 0] - evs[:, 2] - evs[:, 4])
    return bias, stalliness, masks


def classify_teams_batch(teams: list[list[dict]], dx: GenDex,
                         gen_nums: list[int]):
    """Batch classify: -> list of (team_bias, stalliness, sorted tags).

    Flattens every team's mons into one vectorized classify_mons_batch call;
    the sequential tag counters reuse the scalar _tag (caps interact with
    mon order, and a team is <= 6 mons)."""
    from .classify import _tag

    flat: list[dict] = []
    team_ix: list[int] = []
    for ti, team in enumerate(teams):
        flat.extend(team)
        team_ix.extend([ti] * len(team))
    if not flat:
        return [(0, 0.0, []) for _ in teams]
    gnum_arr = np.fromiter((gen_nums[ti] for ti in team_ix), np.int64,
                           len(flat))
    bias, stall, _masks = classify_mons_batch(flat, dx, gnum_arr)

    out = []
    pos = 0
    for ti, team in enumerate(teams):
        k = len(team)
        b = int(bias[pos:pos + k].sum())
        # left-fold sum from 0.0 to match the scalar reduce (bitwise)
        s = 0.0
        for v in stall[pos:pos + k]:
            s += float(v)
        s = s / k
        tags = sorted(_tag(team, s, dx))
        out.append((b, s, tags))
        pos += k
    return out
