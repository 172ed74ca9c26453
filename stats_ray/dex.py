"""Synthetic, deterministic "dex": the lookup-table universe for the engine.

Plays the role of the reference's @pkmn/data Generations tables + aliases
(`stats/src/util.ts:24-99`) and the classifier's move-category tables
(`stats/src/classifier.ts:26-40,524-762`, legacy hardcoded variants).

This is OUR universe: species/base-stat values are defined here, the
deterministic corpus synthesizer (stats_ray.synth) generates battles drawn
from it, and the DuckDB oracle checks the engine against ground truth
emitted by the synthesizer — so internal consistency, not fidelity to the
real Pokémon dex, is what matters. The *formulas* (stat calc, stalliness,
tags) replicate the reference's semantics exactly.

All tables here are plain dicts/sets — broadcast once per enrich actor
(loaded in __init__), never shipped per batch.
"""

from __future__ import annotations

import functools
import re

# ---------------------------------------------------------------------------
# toID — the universal key normalizer (reference: logs/src/config.ts:18-22).
# Memoized: the same display names recur across every battle in a batch.

_NON_ID = re.compile(r"[^a-z0-9]")


@functools.lru_cache(maxsize=65536)
def to_id(s: str) -> str:
    return _NON_ID.sub("", s.lower())


# ---------------------------------------------------------------------------
# Species. id -> (display name, (types...), {hp,atk,def,spa,spd,spe})

def _sp(name, types, hp, atk, df, spa, spd, spe, base=None):
    return {
        "name": name,
        "types": types,
        "baseStats": {"hp": hp, "atk": atk, "def": df, "spa": spa, "spd": spd, "spe": spe},
        "baseSpecies": base,  # id of base forme, None if this IS the base
    }


SPECIES: dict[str, dict] = {
    "pikachu": _sp("Pikachu", ("Electric",), 35, 55, 40, 50, 50, 90),
    "charizard": _sp("Charizard", ("Fire", "Flying"), 78, 84, 78, 109, 85, 100),
    "charizardmegay": _sp("Charizard-Mega-Y", ("Fire", "Flying"), 78, 104, 78, 159, 115, 100,
                          base="charizard") | {"ability0": "drought"},
    "blissey": _sp("Blissey", ("Normal",), 255, 10, 10, 75, 135, 55),
    "skarmory": _sp("Skarmory", ("Steel", "Flying"), 65, 80, 140, 40, 70, 70),
    "tyranitar": _sp("Tyranitar", ("Rock", "Dark"), 100, 134, 110, 95, 100, 61),
    "garchomp": _sp("Garchomp", ("Dragon", "Ground"), 108, 130, 95, 80, 85, 102),
    "heatran": _sp("Heatran", ("Fire", "Steel"), 91, 90, 106, 130, 106, 77),
    "pelipper": _sp("Pelipper", ("Water", "Flying"), 60, 50, 100, 95, 70, 65),
    "torkoal": _sp("Torkoal", ("Fire",), 70, 85, 140, 85, 70, 20),
    "excadrill": _sp("Excadrill", ("Ground", "Steel"), 110, 135, 60, 50, 65, 88),
    "dragonite": _sp("Dragonite", ("Dragon", "Flying"), 91, 134, 95, 100, 100, 80),
    "scizor": _sp("Scizor", ("Bug", "Steel"), 70, 130, 100, 55, 80, 65),
    "greninja": _sp("Greninja", ("Water", "Dark"), 72, 95, 67, 103, 71, 122),
    "greninjaash": _sp("Greninja-Ash", ("Water", "Dark"), 72, 145, 67, 153, 71, 132,
                       base="greninja"),
    "ditto": _sp("Ditto", ("Normal",), 48, 48, 48, 48, 48, 48),
    "shedinja": _sp("Shedinja", ("Bug", "Ghost"), 1, 90, 45, 30, 30, 40),
    "aegislash": _sp("Aegislash", ("Steel", "Ghost"), 60, 50, 140, 50, 140, 60),
    "aegislashblade": _sp("Aegislash-Blade", ("Steel", "Ghost"), 60, 140, 50, 140, 50, 60,
                          base="aegislash"),
    "meloetta": _sp("Meloetta", ("Normal", "Psychic"), 100, 77, 77, 128, 128, 90),
    "meloettapirouette": _sp("Meloetta-Pirouette", ("Normal", "Fighting"),
                             100, 128, 90, 77, 77, 128, base="meloetta"),
    "darmanitan": _sp("Darmanitan", ("Fire",), 105, 140, 55, 30, 55, 95),
    "darmanitanzen": _sp("Darmanitan-Zen", ("Fire", "Psychic"), 105, 30, 105, 140, 105, 55,
                         base="darmanitan"),
    "rayquaza": _sp("Rayquaza", ("Dragon", "Flying"), 105, 150, 90, 150, 90, 95),
    "rayquazamega": _sp("Rayquaza-Mega", ("Dragon", "Flying"), 105, 180, 100, 180, 100, 115,
                        base="rayquaza") | {"ability0": "deltastream"},
    "kyogre": _sp("Kyogre", ("Water",), 100, 100, 90, 150, 140, 90),
    "kyogreprimal": _sp("Kyogre-Primal", ("Water",), 100, 150, 90, 180, 160, 90,
                        base="kyogre") | {"ability0": "primordialsea"},
    "groudon": _sp("Groudon", ("Ground",), 100, 150, 140, 100, 90, 90),
    "groudonprimal": _sp("Groudon-Primal", ("Ground", "Fire"), 100, 180, 160, 150, 90, 90,
                         base="groudon") | {"ability0": "desolateland"},
    "zacian": _sp("Zacian", ("Fairy",), 92, 130, 115, 80, 115, 138),
    "zaciancrowned": _sp("Zacian-Crowned", ("Fairy", "Steel"), 92, 170, 115, 80, 115, 148,
                         base="zacian"),
    "zamazenta": _sp("Zamazenta", ("Fighting",), 92, 130, 115, 80, 115, 138),
    "zamazentacrowned": _sp("Zamazenta-Crowned", ("Fighting", "Steel"),
                            92, 130, 145, 80, 145, 128, base="zamazenta"),
    "clefable": _sp("Clefable", ("Fairy",), 95, 70, 73, 95, 90, 60),
    "toxapex": _sp("Toxapex", ("Poison", "Water"), 50, 63, 152, 53, 142, 35),
    "ferrothorn": _sp("Ferrothorn", ("Grass", "Steel"), 74, 94, 131, 54, 116, 20),
    "dragapult": _sp("Dragapult", ("Dragon", "Ghost"), 88, 120, 75, 100, 75, 142),
    "corviknight": _sp("Corviknight", ("Flying", "Steel"), 98, 87, 105, 53, 85, 67),
    "gholdengo": _sp("Gholdengo", ("Steel", "Ghost"), 87, 60, 95, 133, 91, 84),
    "kingambit": _sp("Kingambit", ("Dark", "Steel"), 100, 135, 120, 60, 85, 50),
    "greattusk": _sp("Great Tusk", ("Ground", "Fighting"), 115, 131, 131, 53, 53, 87),
    "ironvaliant": _sp("Iron Valiant", ("Fairy", "Fighting"), 74, 130, 90, 120, 60, 116),
    "landorus": _sp("Landorus", ("Ground", "Flying"), 89, 125, 90, 115, 80, 101),
    "azumarill": _sp("Azumarill", ("Water", "Fairy"), 100, 50, 80, 60, 80, 50),
    "pincurchin": _sp("Pincurchin", ("Electric",), 48, 101, 95, 91, 85, 15),
    "whimsicott": _sp("Whimsicott", ("Grass", "Fairy"), 60, 67, 85, 77, 75, 116),
    "alomomola": _sp("Alomomola", ("Water",), 165, 75, 80, 40, 45, 65),
    "gliscor": _sp("Gliscor", ("Ground", "Flying"), 75, 95, 125, 45, 75, 95),
    "slowking": _sp("Slowking", ("Water", "Psychic"), 95, 75, 80, 100, 110, 30),
    "hatterene": _sp("Hatterene", ("Psychic", "Fairy"), 57, 90, 95, 136, 103, 29),
    "weavile": _sp("Weavile", ("Dark", "Ice"), 70, 120, 65, 45, 85, 125),
    "volcarona": _sp("Volcarona", ("Bug", "Fire"), 85, 60, 65, 135, 105, 100),
    "dugtrio": _sp("Dugtrio", ("Ground",), 35, 100, 50, 50, 70, 120),
    "magnezone": _sp("Magnezone", ("Electric", "Steel"), 70, 70, 115, 130, 90, 60),
    "gothitelle": _sp("Gothitelle", ("Psychic",), 70, 55, 95, 95, 110, 65),
}

# display name -> id  (plus a couple of space/case variants via to_id)
SPECIES_BY_NAME: dict[str, str] = {to_id(v["name"]): k for k, v in SPECIES.items()}

# reference: stats/src/aliases.json (226 entries) — ours is tiny but exercises
# the same lookup path (util.ts:40-42).
ALIASES: dict[str, str] = {
    "chomp": "garchomp",
    "ttar": "tyranitar",
    "lando": "landorus",
    "gren": "greninja",
    "zardy": "charizardmegay",
}

# forme-undo set for protocol identification (reference: parser.ts:337-342)
FORMES: set[str] = {
    "greninjaash", "zaciancrowned", "zamazentacrowned", "meloettapirouette",
    "darmanitanzen", "aegislashblade",
}


def species_id(name: str) -> str | None:
    """Resolve a raw name/alias/display-name to a canonical species id."""
    sid = to_id(name)
    sid = ALIASES.get(sid, sid)
    if sid in SPECIES:
        return sid
    return SPECIES_BY_NAME.get(sid)


def base_species(sid: str) -> str:
    seen = set()
    while SPECIES[sid]["baseSpecies"] and sid not in seen:
        seen.add(sid)
        sid = SPECIES[sid]["baseSpecies"]
    return sid


def is_mega(sid: str) -> bool:
    name = SPECIES[sid]["name"]
    forme = name.split("-", 1)[1] if "-" in name else ""
    return forme.startswith("Mega") or forme.startswith("Primal")


# ---------------------------------------------------------------------------
# Natures: the standard public 5x5 table. id -> (display, plus, minus)

_NATURE_ROWS = [
    # (name, plus, minus)
    ("Hardy", None, None), ("Lonely", "atk", "def"), ("Brave", "atk", "spe"),
    ("Adamant", "atk", "spa"), ("Naughty", "atk", "spd"),
    ("Bold", "def", "atk"), ("Docile", None, None), ("Relaxed", "def", "spe"),
    ("Impish", "def", "spa"), ("Lax", "def", "spd"),
    ("Timid", "spe", "atk"), ("Hasty", "spe", "def"), ("Serious", None, None),
    ("Jolly", "spe", "spa"), ("Naive", "spe", "spd"),
    ("Modest", "spa", "atk"), ("Mild", "spa", "def"), ("Quiet", "spa", "spe"),
    ("Bashful", None, None), ("Rash", "spa", "spd"),
    ("Calm", "spd", "atk"), ("Gentle", "spd", "def"), ("Sassy", "spd", "spe"),
    ("Careful", "spd", "spa"), ("Quirky", None, None),
]
NATURES: dict[str, dict] = {
    to_id(n): {"name": n, "plus": p, "minus": m} for n, p, m in _NATURE_ROWS
}

# stats.ts:64 — neutral natures folded into hardy for spread display
NEUTRAL_NATURES = {"serious", "docile", "quirky", "bashful"}

# ---------------------------------------------------------------------------
# Moves. id -> display name. Category membership drives the classifier.

_MOVE_NAMES = [
    "Tackle", "Thunderbolt", "Surf", "Earthquake", "Ice Beam", "Flamethrower",
    "Shadow Ball", "Moonblast", "Close Combat", "Draco Meteor", "U-turn",
    "Volt Switch", "Baton Pass", "Roar", "Whirlwind", "Dragon Tail",
    "Circle Throw", "Toxic", "Spikes", "Toxic Spikes", "Stealth Rock",
    "Will-O-Wisp", "Substitute", "Protect", "Detect", "Recover", "Roost",
    "Soft-Boiled", "Wish", "Heal Bell", "Aromatherapy", "Haze", "Clear Smog",
    "Rain Dance", "Sunny Day", "Sandstorm", "Hail", "Trick Room", "Tailwind",
    "Gravity", "Swords Dance", "Nasty Plot", "Dragon Dance", "Quiver Dance",
    "Shell Smash", "Belly Drum", "Agility", "Rock Polish", "Calm Mind",
    "Bulk Up", "Curse", "Thunder Wave", "Glare", "Stun Spore", "Spore",
    "Sleep Powder", "Hypnosis", "Confuse Ray", "Swagger", "Foul Play",
    "Super Fang", "Trick", "Endeavor", "Rapid Spin", "Defog", "Knock Off",
    "Hidden Power", "Relic Song", "Dragon Ascent", "Extreme Speed",
    "Water Shuriken", "Ice Punch", "Sucker Punch", "Giga Drain", "Leech Seed",
    "Pain Split", "Mean Look", "Block", "Pursuit", "Explosion",
    "Self-Destruct", "Sheer Cold", "Fissure", "Guillotine", "Horn Drill",
    "Recycle", "Imprison", "Brave Bird", "Flare Blitz", "Superpower",
    "Overheat", "Leaf Storm", "Double-Edge", "Scald", "Body Press",
    "Make It Rain", "Raging Fury", "Psychic", "Play Rough", "Crunch",
    "Iron Head", "Acrobatics", "Synthesis", "Slack Off", "Milk Drink",
]
MOVES: dict[str, str] = {to_id(n): n for n in _MOVE_NAMES}

# Hidden Power types (suffix moves exist per type; parser appends from hpType
# or IVs — parser.ts:302-307)
HP_TYPES = [
    "Bug", "Dark", "Dragon", "Electric", "Fighting", "Fire", "Flying",
    "Ghost", "Grass", "Ground", "Ice", "Poison", "Psychic", "Rock",
    "Steel", "Water",
]
for _t in HP_TYPES:
    MOVES[f"hiddenpower{_t.lower()}"] = f"Hidden Power {_t}"

# Parser's forced-switch / pivot move sets (parser.ts:64-65)
ROAR_MOVES = {"Roar", "Whirlwind", "Circle Throw", "Dragon Tail"}
UTURN_MOVES = {"U-Turn", "U-turn", "Volt Switch", "Baton Pass"}

# --- classifier move tables (classifier.ts caches / legacy hardcoded sets) ---
CLASSIFIER_TABLES: dict[str, set[str]] = {
    "greaterSetup": {"swordsdance", "nastyplot", "dragondance", "quiverdance", "curse",
                     "shellsmash", "bellydrum"},
    "lesserSetup": {"agility", "rockpolish", "calmmind", "bulkup"},
    "batonPass": {"swordsdance", "nastyplot", "dragondance", "quiverdance", "agility",
                  "rockpolish", "calmmind", "bulkup", "shellsmash", "bellydrum"},
    "gravity": {"hypnosis", "sheercold", "fissure", "guillotine", "horndrill"},
    "recovery": {"recover", "roost", "softboiled", "wish", "synthesis", "slackoff",
                 "milkdrink"},
    "protection": {"protect", "detect"},
    "phazing": {"roar", "whirlwind", "dragontail", "circlethrow"},
    "paralysis": {"thunderwave", "glare", "stunspore"},
    "confusion": {"confuseray", "swagger"},
    "sleep": {"spore", "sleeppowder", "hypnosis"},
    "ohko": {"sheercold", "fissure", "guillotine", "horndrill"},
    "greaterOffensive": {"explosion", "selfdestruct"},
    "lesserOffensive": {"dracometeor", "closecombat", "bravebird", "flareblitz",
                        "superpower", "overheat", "leafstorm", "doubleedge"},
}

TRAPPING_ABILITIES = {"arenatrap", "magnetpull", "shadowtag"}
TRAPPING_MOVES = {"block", "meanlook", "pursuit"}
SETUP_ABILITIES = {"angerpoint", "contrary", "moody", "moxie", "speedboost"}

GREATER_OFFENSIVE_ABILITIES = {"purepower", "hugepower", "speedboost", "moody"}
LESSER_OFFENSIVE_ABILITIES = {
    "chlorophyll", "hustle", "moxie", "sandrush", "swiftswim", "technician",
    "protean", "toughclaws",
}
LESSER_DEFENSIVE_ABILITIES = {
    "intimidate", "naturalcure", "magicguard", "multiscale", "thickfat",
    "unaware", "regenerator",
}
GREATER_DEFENSIVE_ABILITIES = {"slowstart", "truant", "furcoat", "harvest"}

# ---------------------------------------------------------------------------
# Items. id -> display name.

_ITEM_NAMES = [
    "Leftovers", "Choice Band", "Choice Scarf", "Choice Specs", "Life Orb",
    "Focus Sash", "Rocky Helmet", "Eviolite", "Toxic Orb", "Flame Orb",
    "Heavy-Duty Boots", "Assault Vest", "Damp Rock", "Heat Rock",
    "Smooth Rock", "Icy Rock", "Eject Button", "Red Card",
    "Weakness Policy", "Light Clay", "Expert Belt", "Charizardite Y",
    "Blue Orb", "Red Orb", "Rusted Sword", "Rusted Shield", "Air Balloon",
    "Sitrus Berry", "Lum Berry", "Black Sludge",
]
ITEMS: dict[str, str] = {to_id(n): n for n in _ITEM_NAMES}

LESSER_BOOSTING_ITEMS = {"expertbelt"}
GREATER_BOOSTING_ITEMS = {
    "choiceband", "choicescarf", "choicespecs", "lifeorb", "focussash",
    "ejectbutton", "airballoon", "sitrusberry", "lumberry",
}
# item id -> (mega source species id, mega target species id, target ability)
MEGA_STONES = {"charizarditey": ("charizard", "charizardmegay", "drought")}

# ---------------------------------------------------------------------------
# Abilities. id -> display name.

_ABILITY_NAMES = [
    "Drizzle", "Drought", "Desolate Land", "Primordial Sea", "Sand Stream",
    "Snow Warning", "Arena Trap", "Magnet Pull", "Shadow Tag", "Harvest",
    "Huge Power", "Pure Power", "Speed Boost", "Moody", "Moxie", "Contrary",
    "Anger Point", "Chlorophyll", "Swift Swim", "Sand Rush", "Technician",
    "Protean", "Tough Claws", "Regenerator", "Natural Cure", "Magic Guard",
    "Multiscale", "Thick Fat", "Unaware", "Intimidate", "Slow Start",
    "Truant", "Fur Coat", "Levitate", "Stance Change", "Battle Bond",
    "Zen Mode", "Magic Bounce", "Sturdy", "Guts", "Poison Heal", "Klutz",
    "Air Lock", "Serene Grace", "Illusion", "Delta Stream", "Pressure",
    "Clear Body", "Illuminate", "Hustle",
]
ABILITIES: dict[str, str] = {to_id(n): n for n in _ABILITY_NAMES}

# ---------------------------------------------------------------------------
# Formats (workflows/smogon/stats.ts:37-72 analogues)

# skipped by the stats worker (SKIP list, stats.ts:37-41)
SKIP_FORMAT_MARKERS = ("random", "seasonal", "custom", "petmod", "factory", "challengecup")

NON_SINGLES_FORMATS = {"gen9doublesou", "gen9vgc2026"}
NON_6V6_FORMATS = {"gen91v1", "gen9challengecup1v1"}

DEFAULT_CUTOFFS = [0, 1500, 1630, 1760]
POPULAR_CUTOFFS = [0, 1500, 1695, 1825]
# formats using the "popular" cutoff schedule (stats.ts:42-72)
POPULAR_FORMATS = {"gen9ou"}

MONOTYPE_FORMAT = "gen9monotype"
ALL_TYPES = [
    "Bug", "Dark", "Dragon", "Electric", "Fairy", "Fighting", "Fire",
    "Flying", "Ghost", "Grass", "Ground", "Ice", "Normal", "Poison",
    "Psychic", "Rock", "Steel", "Water",
]
MONOTYPE_SHARDS = ["mono" + t.lower() for t in ALL_TYPES]


# ---------------------------------------------------------------------------
# GenDex registration: the synthetic universe as a pluggable dex instance.

from .gendex import GenDex, register as _register_dex

for _sid, _spv in SPECIES.items():
    _nm = _spv["name"]
    _spv.setdefault("forme", _nm.split("-", 1)[1] if "-" in _nm else "")

SYNTH_DEX = _register_dex(GenDex(
    name="synth",
    species=SPECIES, aliases=ALIASES, formes=FORMES,
    moves=MOVES, items=ITEMS, abilities=ABILITIES, natures=NATURES,
    mega_stones=MEGA_STONES, tables=CLASSIFIER_TABLES,
    trapping_abilities=TRAPPING_ABILITIES, trapping_moves=TRAPPING_MOVES,
    tag_trapping_moves=TRAPPING_MOVES, setup_abilities=SETUP_ABILITIES,
    greater_offensive_abilities=GREATER_OFFENSIVE_ABILITIES,
    lesser_offensive_abilities=LESSER_OFFENSIVE_ABILITIES,
    lesser_defensive_abilities=LESSER_DEFENSIVE_ABILITIES,
    greater_defensive_abilities=GREATER_DEFENSIVE_ABILITIES,
    lesser_boosting_items=LESSER_BOOSTING_ITEMS,
    greater_boosting_items=GREATER_BOOSTING_ITEMS,
    non_singles_formats=NON_SINGLES_FORMATS,
    non_6v6_formats=NON_6V6_FORMATS,
    legacy=False,
))


# Composite "<format><SHARD_SEP><tag>" keys let the monotype shard fan-out
# ride every format-keyed aggregate unchanged (one exchange for all shards);
# schedule lookups resolve against the base format.
SHARD_SEP = "\x1f"


def base_format(format_id: str) -> str:
    return format_id.split(SHARD_SEP, 1)[0]


def cutoffs_for(format_id: str) -> list[int]:
    return (POPULAR_CUTOFFS if base_format(format_id) in POPULAR_FORMATS
            else DEFAULT_CUTOFFS)


def skip_format(format_id: str) -> bool:
    return any(m in format_id for m in SKIP_FORMAT_MARKERS)


def is_non_singles(format_id: str) -> bool:
    return format_id in NON_SINGLES_FORMATS


def is_non_6v6(format_id: str) -> bool:
    return format_id in NON_6V6_FORMATS
