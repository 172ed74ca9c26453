"""Team classification: bias, stalliness, archetype tags.

Replicates the semantics of the reference classifier
(`stats/src/classifier.ts:11-393,411-516`) over a pluggable GenDex —
including its quirks (uncapped counter branches, forme averaging, the
charizardite-Y sun bonus, JS ?:-precedence in the dragons/trappers counters).

Two modes, selected by the dex:
  - non-legacy (synthetic universe): computed-style tables, forme branches;
  - legacy (real-data slice): hardcoded tables (classifier.ts:12-25), no
    forme branches, megas re-classified with base stats + mega ability, and
    the gen-specific stat formula (gen < 3 uses DVs, no natures).

Operates on canonicalized mons:
{species, item, ability, nature, moves: [id x4], evs, ivs, level, happiness}.
Pure Python per team (a team is <= 6 mons); tables load once per actor.
"""

from __future__ import annotations

import math

from ..gendex import GenDex
from ..functions.statmath import calc_stats

LOG3_LOG2 = math.log(3) / math.log(2)

_SLOW_NATURES = ("brave", "relaxed", "quiet", "sassy")


def _base_stalliness(dx: GenDex, species_id: str, mon: dict, ability: str,
                     gen_num: int) -> float:
    # classifier.ts:146-161
    if species_id == "shedinja":
        return 0.0
    if species_id == "ditto":
        return LOG3_LOG2
    stats = _calc_forme_stats(dx, species_id, mon, ability, gen_num)
    level = mon["level"]
    return -math.log(
        ((math.floor(2.0 * level + 10) / 250)
         * max(stats["atk"], stats["spa"])
         / max(stats["def"], stats["spd"])
         * 120 + 2) * 0.925 / stats["hp"]
    ) / math.log(2)


def _calc_forme_stats(dx: GenDex, species_id: str, mon: dict, ability: str,
                      gen_num: int) -> dict:
    stats = calc_stats(species_id, mon["ivs"], mon["evs"], mon["level"],
                       mon["nature"], dx=dx, gen_num=gen_num)
    # Aegislash averaging (classifier.ts:163-176)
    if species_id == "aegislash" and ability == "stancechange":
        blade = calc_stats("aegislashblade", mon["ivs"], mon["evs"],
                           mon["level"], mon["nature"], dx=dx,
                           gen_num=gen_num)
        blade["def"] = math.floor((blade["def"] + stats["def"]) / 2)
        blade["spd"] = math.floor((blade["spd"] + stats["spd"]) / 2)
        return blade
    return stats


def _ability_modifier(dx: GenDex, ability: str) -> float:
    if ability in dx.GREATER_OFFENSIVE_ABILITIES:
        return -1.0
    if ability in dx.LESSER_OFFENSIVE_ABILITIES:
        return -0.5
    if ability in dx.LESSER_DEFENSIVE_ABILITIES:
        return 0.5
    if ability in dx.GREATER_DEFENSIVE_ABILITIES:
        return 1.0
    return 0.0


def _item_modifier(dx: GenDex, species_id: str, item: str,
                   ability: str) -> float:
    # classifier.ts:445-477 — full special-item rules
    if item in ("weaknesspolicy", "lightclay"):
        return -1.0
    if item in ("rockyhelmet", "eviolite"):
        return 0.5
    if item == "toxicorb":
        if ability == "poisonheal":
            return 0.5
        if ability in ("toxicboost", "guts", "quickfeet"):
            return -1.0
    if item == "flameorb" and ability in ("flareboost", "guts", "quickfeet"):
        return -1.0
    if item == "souldew" and species_id in ("latios", "latias"):
        return -0.5
    if item == "thickclub" and species_id in ("cubone", "marowak"):
        return -1.0
    if item == "lightball" and species_id == "pikachu":
        return -1.0
    if species_id == "clamperl":
        if item == "deepseatooth":
            return -1.0
        if item == "deepseascale":
            return 1.0
    if item == "adamantorb" and species_id == "dialga":
        return -0.25
    if item == "lustrousorb" and species_id == "palkia":
        return -0.25
    if item == "griseousorb" and species_id == "giratinaorigin":
        return -0.25
    if item in dx.LESSER_BOOSTING_ITEMS:
        return -0.25
    if item in dx.GREATER_BOOSTING_ITEMS:
        return -0.5
    return 0.0


def _moves_modifier(dx: GenDex, moves: list[str]) -> float:
    t = dx.TABLES
    ms = set(moves)
    mod = 0.0
    if "toxic" in ms:
        mod += 1.0
    if "spikes" in ms:
        mod += 0.5
    if "toxicspikes" in ms:
        mod += 0.5
    if "willowisp" in ms:
        mod += 0.5
    if "psychoshift" in ms:
        mod += 0.5
    if "healbell" in ms or "aromatherapy" in ms:
        mod += 0.5
    if "haze" in ms or "clearsmog" in ms:
        mod += 0.5
    if "substitute" in ms:
        mod -= 0.5
    if "superfang" in ms:
        mod -= 0.5
    if "trick" in ms:
        mod -= 0.5
    if "endeavor" in ms:
        mod -= 1.0
    if ms & t["recovery"]:
        mod += 1.0
    if ms & t["protection"]:
        mod += 1.0
    if ms & t["phazing"]:
        mod += 0.5
    if ms & t["paralysis"]:
        mod += 0.5
    if ms & t["confusion"]:
        mod += 0.5
    if ms & t["sleep"]:
        mod -= 0.5
    if ms & t["lesserOffensive"]:
        mod -= 0.5
    if ms & t["greaterOffensive"]:
        mod -= 1.0
    if ms & t["ohko"]:
        mod -= 1.0
    if "bellydrum" in ms:
        mod -= 2.0
    elif "shellsmash" in ms:
        mod -= 1.5
    elif ms & (t["greaterSetup"] - {"bellydrum", "shellsmash"}):
        mod -= 1.0
    elif ms & t["lesserSetup"]:
        mod -= 0.5
    return mod


def _classify_forme(dx: GenDex, species_id: str, mon: dict, ability: str,
                    gen_num: int) -> tuple[int, float]:
    # classifier.ts:113-144
    stalliness = _base_stalliness(dx, species_id, mon, ability, gen_num)
    stalliness += _ability_modifier(dx, ability)
    stalliness += _item_modifier(dx, species_id, mon["item"], ability)
    stalliness += _moves_modifier(dx, mon["moves"])
    if ability in dx.TRAPPING_ABILITIES:
        stalliness -= 1.0
    elif any(m in dx.TRAPPING_MOVES for m in mon["moves"]):
        stalliness -= 0.5
    if ability == "harvest" or "recycle" in mon["moves"]:
        stalliness += 1.0
    if ability in ("sandstream", "snowwarning") or any(
            m in ("sandstorm", "hail") for m in mon["moves"]):
        stalliness += 0.5
    evs = mon["evs"]
    bias = evs["atk"] + evs["spa"] - evs["hp"] - evs["def"] - evs["spd"]
    stalliness -= LOG3_LOG2
    return bias, stalliness


def classify_pokemon(mon: dict, dx: GenDex, gen_num: int = 9) -> tuple[int, float]:
    # classifier.ts:60-107
    species = mon["species"]
    ability = mon["ability"]
    mega = None
    if species != "empty" and dx.is_mega(species):
        sp = dx.SPECIES[species]
        mega = (species, sp.get("ability0", ability))
        species = sp.get("baseSpecies") or species

    bias, stalliness = _classify_forme(dx, species, mon, ability, gen_num)
    if not dx.legacy:
        if species == "meloetta" and "relicsong" in mon["moves"]:
            stalliness = (stalliness + _classify_forme(
                dx, "meloettapirouette", mon, ability, gen_num)[1]) / 2
        elif species == "darmanitan" and ability == "zenmode":
            stalliness = (stalliness + _classify_forme(
                dx, "darmanitanzen", mon, ability, gen_num)[1]) / 2
        elif species == "rayquaza" and "dragonascent" in mon["moves"]:
            stalliness = (stalliness + _classify_forme(
                dx, "rayquazamega", mon, "deltastream", gen_num)[1]) / 2
    if mega:
        # legacy: re-classify with BASE species but the mega's ability
        # (classifier.ts:96-100: species only swapped back when !legacy)
        mega_species = mega[0] if not dx.legacy else species
        stalliness = (stalliness + _classify_forme(
            dx, mega_species, mon, mega[1], gen_num)[1]) / 2
    return bias, stalliness


def classify_team(team: list[dict], dx: GenDex | None = None,
                  gen_num: int = 9) -> tuple[int, float, list[str]]:
    """-> (bias, stalliness, sorted tag list). classifier.ts:11-55."""
    if dx is None:
        from ..dex import SYNTH_DEX as dx  # default universe
    team_bias = 0
    stallinesses = []
    for mon in team:
        b, s = classify_pokemon(mon, dx, gen_num)
        team_bias += b
        stallinesses.append(s)
    stalliness = sum(stallinesses) / len(stallinesses)
    tags = _tag(team, stalliness, dx)
    return team_bias, stalliness, sorted(tags)


def _tag(team: list[dict], stalliness: float, dx: GenDex) -> set[str]:
    # classifier.ts:203-393, quirks preserved
    weather = {"rain": 0, "sun": 0, "sand": 0, "hail": 0}
    st = {k: 0 for k in ("batonpass", "tailwind", "trickroom", "slow",
                         "gravityMoves", "gravity", "voltturn", "dragons",
                         "trappers", "clearance", "fear", "choice",
                         "swagplay")}
    possible_types: list[str] | None = None

    for mon in team:
        raw_species = mon["species"]
        species = raw_species
        if dx.is_mega(species):
            species = dx.base_species(species)
        sp = dx.SPECIES[species]
        moves = set(mon["moves"])
        ability = mon["ability"]
        item = mon["item"]

        types = list(sp["types"])
        possible_types = (types if possible_types is None
                          else [t for t in possible_types if t in types])

        if ability in ("drizzle", "primordialsea"):
            weather["rain"] += 2
        elif ability in ("drought", "desolateland"):
            weather["sun"] += 2
        elif ability == "sandstream":
            weather["sand"] += 2
        elif ability == "snowwarning":
            weather["hail"] += 2
        if weather["sun"] < 2 and raw_species == "charizard" and item == "charizarditey":
            weather["sun"] += 2
        if weather["rain"] < 2 and "raindance" in moves:
            weather["rain"] += 2 if item == "damprock" else 1
        if weather["sun"] < 2 and "sunnyday" in moves:
            weather["sun"] += 2 if item == "heatrock" else 1
        if weather["sand"] < 2 and "sandstorm" in moves:
            weather["sand"] += 2 if item == "smoothrock" else 1
        if weather["hail"] < 2 and "hail" in moves:
            weather["hail"] += 2 if item == "icyrock" else 1

        if (st["batonpass"] < 2 and "batonpass" in moves
                and (ability in dx.SETUP_ABILITIES
                     or bool(moves & dx.TABLES["batonPass"]))):
            st["batonpass"] += 1
        if st["tailwind"] < 2 and "tailwind" in moves:
            st["tailwind"] += 1
        if "trickroom" in moves and "imprison" not in moves:
            st["trickroom"] += 1
        if (st["slow"] < 2 and mon["evs"]["spe"] < 5
                and (mon["nature"] in _SLOW_NATURES
                     or sp["baseStats"]["spe"] <= 50)):
            st["slow"] += 1
        if st["gravity"] < 2 and "gravity" in moves:
            st["gravity"] += 1
        if moves & dx.TABLES["gravity"]:
            st["gravityMoves"] += 1
        # quirk preserved: the cap only applies to the item branch
        if (st["voltturn"] < 3 and item == "ejectbutton") or \
                any(m in ("voltswitch", "uturn", "batonpass") for m in mon["moves"]):
            st["voltturn"] += 1
        if (st["trappers"] < 3 and ability in dx.TRAPPING_ABILITIES) or \
                any(m in (dx.TAG_TRAPPING_MOVES if dx.legacy
                          else dx.TRAPPING_MOVES) for m in mon["moves"]):
            st["trappers"] += 1
        # JS ?:-precedence quirk (classifier.ts:286-289):
        #   (dragons < 2 && legacy) ? DRAGONS.has(raw) : types has Dragon
        # so legacy uses the pinned set until the cap, then falls through to
        # the (uncapped) type check; non-legacy is always the type check.
        if st["dragons"] < 2 and dx.legacy:
            if raw_species in dx.DRAGONS:
                st["dragons"] += 1
        else:
            rsp = dx.SPECIES.get(raw_species)
            if rsp and "Dragon" in rsp["types"]:
                st["dragons"] += 1
        if (st["clearance"] < 2 and ability == "magicbounce") or "rapidspin" in moves:
            st["clearance"] += 1
        if (st["fear"] < 3 and (ability == "sturdy" or item == "focussash")
                and "endeavor" in moves):
            st["fear"] += 1
        if (st["choice"] < 4 and ability != "klutz"
                and item in ("choiceband", "choicescarf", "choicespecs")):
            st["choice"] += 1
        if st["swagplay"] < 2 and any(m in ("foulplay", "swagger") for m in mon["moves"]):
            st["swagplay"] += 1

    tags: set[str] = set()
    for w in ("rain", "sun", "sand", "hail"):
        if weather[w] > 1:
            tags.add(w)
    if len(tags) == 4:
        tags.add("allweather")
    elif len(tags) > 1:
        tags.add("multiweather")
    elif len(tags) == 0:
        tags.add("weatherless")

    if st["batonpass"] > 1:
        tags.add("batonpass")
    if st["tailwind"] > 1:
        tags.add("tailwind")
    trickroom = st["trickroom"] > 2 or (st["trickroom"] > 1 and st["slow"] > 1)
    if trickroom:
        tags.add("trickroom")
        for w, t in (("rain", "trickrain"), ("sun", "tricksun"),
                     ("sand", "tricksand"), ("hail", "trickhail")):
            if weather[w] > 1:
                tags.add(t)
    if st["gravity"] > 2 or (st["gravity"] > 1 and st["gravityMoves"] > 1):
        tags.add("gravity")
    if st["voltturn"] > 2 and st["batonpass"] < 2:
        tags.add("voltturn")
    if st["dragons"] > 1 and st["trappers"] > 0:
        tags.add("dragmag")
    if st["trappers"] > 2:
        tags.add("trapper")
    if st["fear"] > 2 and st["clearance"] > 1:
        tags.add("fear")
        if weather["sand"] > 1:
            tags.add("sandfear")
        if weather["hail"] > 1:
            tags.add("hailfear")
        if trickroom:
            tags.add("trickfear")
    if st["choice"] > 3:
        tags.add("choice")
    if st["swagplay"] > 1:
        tags.add("swagplay")

    if possible_types:
        tags.add("monotype")
        for t in possible_types:
            tags.add("mono" + t.lower())

    weather_tags = {"rain", "sun", "sand", "hail"} & tags
    clean_weather = not ({"multiweather", "allweather", "weatherless"} & tags)
    if stalliness <= -1:
        tags.add("hyperoffense")
        if clean_weather:
            if "rain" in weather_tags:
                tags.add("rainoffense")
            elif "sun" in weather_tags:
                tags.add("sunoffense")
            elif "sand" in weather_tags:
                tags.add("sandoffense")
            else:
                tags.add("hailoffense")
    elif stalliness < 0:
        tags.add("offense")
    elif stalliness < 1.0:
        tags.add("balance")
    elif stalliness < LOG3_LOG2:
        tags.add("semistall")
    else:
        tags.add("stall")
        if clean_weather:
            if "rain" in weather_tags:
                tags.add("rainstall")
            elif "sun" in weather_tags:
                tags.add("sunstall")
            elif "sand" in weather_tags:
                tags.add("sandstall")
            else:
                tags.add("hailstall")

    return tags
