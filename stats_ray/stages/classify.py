"""Team classification: bias, stalliness, archetype tags.

Replicates the semantics of the reference classifier
(`stats/src/classifier.ts:11-393,411-516`) over the synthetic dex —
including its quirks (uncapped counter branches, forme averaging, the
charizardite-Y sun bonus). Operates on canonicalized mons:
{species, item, ability, nature, moves: [id x4], evs, ivs, level, happiness}.

Pure Python per team (a team is <= 6 mons; the per-battle parse state
machine dominates cost). Loaded once per enrich actor.
"""

from __future__ import annotations

import math

from ..dex import (
    CLASSIFIER_TABLES,
    GREATER_BOOSTING_ITEMS,
    GREATER_DEFENSIVE_ABILITIES,
    GREATER_OFFENSIVE_ABILITIES,
    LESSER_BOOSTING_ITEMS,
    LESSER_DEFENSIVE_ABILITIES,
    LESSER_OFFENSIVE_ABILITIES,
    SETUP_ABILITIES,
    SPECIES,
    TRAPPING_ABILITIES,
    TRAPPING_MOVES,
    base_species,
    is_mega,
)
from ..functions.statmath import calc_stats

LOG3_LOG2 = math.log(3) / math.log(2)

_T = CLASSIFIER_TABLES


def _base_stalliness(species_id: str, mon: dict) -> float:
    # classifier.ts:146-161
    if species_id == "shedinja":
        return 0.0
    if species_id == "ditto":
        return LOG3_LOG2
    stats = _calc_forme_stats(species_id, mon)
    level = mon["level"]
    return -math.log(
        ((math.floor(2.0 * level + 10) / 250)
         * max(stats["atk"], stats["spa"])
         / max(stats["def"], stats["spd"])
         * 120 + 2) * 0.925 / stats["hp"]
    ) / math.log(2)


def _calc_forme_stats(species_id: str, mon: dict) -> dict:
    stats = calc_stats(species_id, mon["ivs"], mon["evs"], mon["level"], mon["nature"])
    # Aegislash averaging (classifier.ts:163-176)
    if species_id == "aegislash" and mon["ability"] == "stancechange":
        blade = calc_stats("aegislashblade", mon["ivs"], mon["evs"], mon["level"], mon["nature"])
        blade["def"] = math.floor((blade["def"] + stats["def"]) / 2)
        blade["spd"] = math.floor((blade["spd"] + stats["spd"]) / 2)
        return blade
    return stats


def _ability_modifier(ability: str) -> float:
    if ability in GREATER_OFFENSIVE_ABILITIES:
        return -1.0
    if ability in LESSER_OFFENSIVE_ABILITIES:
        return -0.5
    if ability in LESSER_DEFENSIVE_ABILITIES:
        return 0.5
    if ability in GREATER_DEFENSIVE_ABILITIES:
        return 1.0
    return 0.0


def _item_modifier(species_id: str, item: str, ability: str) -> float:
    # classifier.ts:444-478 (subset relevant to our dex)
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
    if item in LESSER_BOOSTING_ITEMS:
        return -0.25
    if item in GREATER_BOOSTING_ITEMS:
        return -0.5
    return 0.0


def _moves_modifier(moves: list[str]) -> float:
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
    if ms & _T["recovery"]:
        mod += 1.0
    if ms & _T["protection"]:
        mod += 1.0
    if ms & _T["phazing"]:
        mod += 0.5
    if ms & _T["paralysis"]:
        mod += 0.5
    if ms & _T["confusion"]:
        mod += 0.5
    if ms & _T["sleep"]:
        mod -= 0.5
    if ms & _T["lesserOffensive"]:
        mod -= 0.5
    if ms & _T["greaterOffensive"]:
        mod -= 1.0
    if ms & _T["ohko"]:
        mod -= 1.0
    if "bellydrum" in ms:
        mod -= 2.0
    elif "shellsmash" in ms:
        mod -= 1.5
    elif ms & (_T["greaterSetup"] - {"bellydrum", "shellsmash"}):
        mod -= 1.0
    elif ms & _T["lesserSetup"]:
        mod -= 0.5
    return mod


def _classify_forme(species_id: str, mon: dict, ability: str) -> tuple[int, float]:
    # classifier.ts:117-145
    stalliness = _base_stalliness(species_id, mon)
    stalliness += _ability_modifier(ability)
    stalliness += _item_modifier(species_id, mon["item"], ability)
    stalliness += _moves_modifier(mon["moves"])
    if ability in TRAPPING_ABILITIES:
        stalliness -= 1.0
    elif any(m in TRAPPING_MOVES for m in mon["moves"]):
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


def classify_pokemon(mon: dict) -> tuple[int, float]:
    # classifier.ts:61-110 (non-legacy path)
    species = mon["species"]
    ability = mon["ability"]
    mega = None
    if is_mega(species):
        mega = (species, SPECIES[species].get("ability0", ability))
        species = base_species(species)

    bias, stalliness = _classify_forme(species, mon, ability)
    if species == "meloetta" and "relicsong" in mon["moves"]:
        stalliness = (stalliness + _classify_forme("meloettapirouette", mon, ability)[1]) / 2
    elif species == "darmanitan" and ability == "zenmode":
        stalliness = (stalliness + _classify_forme("darmanitanzen", mon, ability)[1]) / 2
    elif species == "rayquaza" and "dragonascent" in mon["moves"]:
        stalliness = (stalliness + _classify_forme("rayquazamega", mon, "deltastream")[1]) / 2
    if mega:
        stalliness = (stalliness + _classify_forme(mega[0], mon, mega[1])[1]) / 2
    return bias, stalliness


def classify_team(team: list[dict]) -> tuple[int, float, list[str]]:
    """-> (bias, stalliness, sorted tag list). classifier.ts:11-55."""
    team_bias = 0
    stallinesses = []
    for mon in team:
        b, s = classify_pokemon(mon)
        team_bias += b
        stallinesses.append(s)
    stalliness = sum(stallinesses) / len(stallinesses)
    tags = _tag(team, stalliness)
    return team_bias, stalliness, sorted(tags)


def _tag(team: list[dict], stalliness: float) -> set[str]:
    # classifier.ts:203-393 (non-legacy), quirks preserved
    weather = {"rain": 0, "sun": 0, "sand": 0, "hail": 0}
    st = {k: 0 for k in ("batonpass", "tailwind", "trickroom", "slow", "gravityMoves",
                         "gravity", "voltturn", "dragons", "trappers", "clearance",
                         "fear", "choice", "swagplay")}
    possible_types: list[str] | None = None

    for mon in team:
        species = mon["species"]
        if is_mega(species):
            species = base_species(species)
        sp = SPECIES[species]
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
        if weather["sun"] < 2 and species == "charizard" and item == "charizarditey":
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
                and (ability in SETUP_ABILITIES or bool(moves & _T["batonPass"]))):
            st["batonpass"] += 1
        if st["tailwind"] < 2 and "tailwind" in moves:
            st["tailwind"] += 1
        if "trickroom" in moves and "imprison" not in moves:
            st["trickroom"] += 1
        if (st["slow"] < 2 and mon["evs"]["spe"] < 5
                and (mon["nature"] in ("brave", "relaxed", "quiet", "sassy")
                     or sp["baseStats"]["spe"] <= 50)):
            st["slow"] += 1
        if st["gravity"] < 2 and "gravity" in moves:
            st["gravity"] += 1
        if moves & _T["gravity"]:
            st["gravityMoves"] += 1
        # quirk preserved: the cap only applies to the item branch
        if (st["voltturn"] < 3 and item == "ejectbutton") or \
                any(m in ("voltswitch", "uturn", "batonpass") for m in mon["moves"]):
            st["voltturn"] += 1
        if (st["trappers"] < 3 and ability in TRAPPING_ABILITIES) or \
                any(m in TRAPPING_MOVES for m in mon["moves"]):
            st["trappers"] += 1
        # quirk preserved: non-legacy branch is uncapped (precedence in
        # classifier.ts:286-289)
        if "Dragon" in sp["types"]:
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
