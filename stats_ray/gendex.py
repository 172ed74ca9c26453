"""Pluggable dex: a bundle of lookup tables the engine stages consume.

The engine supports two universes:
  - the synthetic deterministic universe (stats_ray.dex builds it; used by the
    corpus synthesizer + DuckDB oracle), and
  - a hand-authored real-data slice (stats_ray.dexdata_legacy) covering the
    species/items/moves/abilities appearing in the reference's checked-in
    test logs, used for byte-exact golden parity with pkmn/stats
    (stats/src/test/integration.ts:29-103).

`legacy` mirrors the reference's legacy flag (util.ts:33-38 ignoreGen + the
hardcoded classifier tables, classifier.ts:12-25): all species/item/nature/
ability lookups use the default (gen 9) data and the classifier uses pinned
move sets rather than computed ones.

Instances are registered by name so Ray actor constructors can reference
them with a small string instead of shipping the tables per task (the tables
load once per worker process on first lookup).
"""

from __future__ import annotations

import functools
import re

_NON_ID = re.compile(r"[^a-z0-9]")


@functools.lru_cache(maxsize=65536)
def to_id(s: str) -> str:
    return _NON_ID.sub("", s.lower())


class GenDex:
    """One universe of species/move/item/ability tables + classifier sets."""

    def __init__(self, *, name: str, species: dict, aliases: dict,
                 formes: set, moves: dict, items: dict, abilities: dict,
                 natures: dict, mega_stones: dict, tables: dict,
                 trapping_abilities: set, trapping_moves: set,
                 tag_trapping_moves: set, setup_abilities: set,
                 greater_offensive_abilities: set,
                 lesser_offensive_abilities: set,
                 lesser_defensive_abilities: set,
                 greater_defensive_abilities: set,
                 lesser_boosting_items: set, greater_boosting_items: set,
                 dragons: set = frozenset(),
                 non_singles_formats: set = frozenset(),
                 non_6v6_formats: set = frozenset(),
                 legacy: bool = False):
        self.name = name
        self.SPECIES = species
        self.SPECIES_BY_NAME = {to_id(v["name"]): k for k, v in species.items()}
        self.ALIASES = aliases
        self.FORMES = formes
        self.MOVES = moves
        self.ITEMS = items
        self.ABILITIES = abilities
        self.NATURES = natures
        self.MEGA_STONES = mega_stones
        self.TABLES = tables
        self.TRAPPING_ABILITIES = trapping_abilities
        self.TRAPPING_MOVES = trapping_moves          # classifyForme list
        self.TAG_TRAPPING_MOVES = tag_trapping_moves  # tag() trappers list
        self.SETUP_ABILITIES = setup_abilities
        self.GREATER_OFFENSIVE_ABILITIES = greater_offensive_abilities
        self.LESSER_OFFENSIVE_ABILITIES = lesser_offensive_abilities
        self.LESSER_DEFENSIVE_ABILITIES = lesser_defensive_abilities
        self.GREATER_DEFENSIVE_ABILITIES = greater_defensive_abilities
        self.LESSER_BOOSTING_ITEMS = lesser_boosting_items
        self.GREATER_BOOSTING_ITEMS = greater_boosting_items
        self.DRAGONS = dragons
        self.NON_SINGLES_FORMATS = non_singles_formats
        self.NON_6V6_FORMATS = non_6v6_formats
        self.legacy = legacy

    # -- species helpers (util.ts:40-99) ------------------------------------

    def species_id(self, name: str) -> str | None:
        """Resolve raw name / alias / display-name to canonical species id."""
        sid = to_id(name)
        sid = self.ALIASES.get(sid, sid)
        if sid in self.SPECIES:
            return sid
        return self.SPECIES_BY_NAME.get(sid)

    def base_species(self, sid: str) -> str:
        seen = set()
        while self.SPECIES[sid].get("baseSpecies") and sid not in seen:
            seen.add(sid)
            sid = self.SPECIES[sid]["baseSpecies"]
        return sid

    def is_mega(self, sid: str) -> bool:
        """util.ts:62-65 — forme starts with Mega/Primal (+Ultra, non-legacy)."""
        forme = self.SPECIES[sid].get("forme") or ""
        if forme.startswith("Mega") or forme.startswith("Primal"):
            return True
        return (not self.legacy) and forme.startswith("Ultra")

    def mega_evolution(self, sid: str, item: str):
        """util.ts:67-93: (species, ability) if the held item mega-evolves."""
        if item == "blueorb" and self.base_species(sid) == "kyogre":
            return "kyogreprimal", "primordialsea"
        if item == "redorb" and self.base_species(sid) == "groudon":
            return "groudonprimal", "desolateland"
        if (not self.legacy and item == "ultranecroziumz"
                and self.base_species(sid) == "necrozma"):
            return "necrozmaultra", "neuroforce"
        stone = self.MEGA_STONES.get(item)
        if stone and stone[0] == sid:
            return stone[1], stone[2]
        return None

    def is_non_singles(self, format_id: str) -> bool:
        if format_id.endswith("suspecttest"):
            format_id = format_id[:-11]
        return format_id in self.NON_SINGLES_FORMATS

    def is_non_6v6(self, format_id: str) -> bool:
        if format_id.endswith("suspecttest"):
            format_id = format_id[:-11]
        return format_id in self.NON_6V6_FORMATS

    # -- display names (reports.ts / util.ts:286-294) -----------------------

    def display_species(self, sid: str) -> str:
        if sid == "empty":
            return sid
        sp = self.SPECIES.get(sid)
        name = sp["name"] if sp else sid
        if name == "Flabébé":
            return "Flabebe"
        if self.legacy and name.startswith("Nidoran"):
            return name.replace("-", "")
        return name

    def display_ability(self, aid: str) -> str:
        return self.ABILITIES.get(aid, aid)

    def display_item(self, iid: str) -> str:
        return "Nothing" if iid == "nothing" else self.ITEMS.get(iid, iid)

    def display_move(self, mid: str) -> str:
        return "Nothing" if mid == "" else self.MOVES.get(mid, mid)


_REGISTRY: dict[str, GenDex] = {}


def register(dx: GenDex) -> GenDex:
    _REGISTRY[dx.name] = dx
    return dx


def get_dex(name: str) -> GenDex:
    if name not in _REGISTRY:
        if name == "synth":
            from . import dex  # noqa: F401  (registers "synth" on import)
        elif name == "legacy":
            from . import dexdata_legacy  # noqa: F401  (registers "legacy")
        else:
            raise KeyError(f"unknown dex '{name}'")
    return _REGISTRY[name]


def gen_for_format(format_id: str) -> int:
    """util.ts:57-60 — generation number from the format id (default 6)."""
    m = re.match(r"gen(\d)", format_id)
    return int(m.group(1)) if m else 6
