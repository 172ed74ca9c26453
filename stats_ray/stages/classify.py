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


def _mon_tag_preds(dx: GenDex, mon: dict) -> tuple:
    """Per-mon tag predicates (everything in the classifier.ts:203-330 mon
    loop that does NOT depend on the running counters). Pure function of
    (species, moves, ability, item, nature, spe-EV gate) — memoized per dex
    because competitive sets repeat heavily, so the hot parse path pays one
    dict probe per mon instead of a dozen set constructions/lookups."""
    raw_species = mon["species"]
    species = raw_species
    if dx.is_mega(species):
        species = dx.base_species(species)
    sp = dx.SPECIES[species]
    moves = set(mon["moves"])
    mlist = mon["moves"]
    ability = mon["ability"]
    item = mon["item"]
    w_ab = ("rain" if ability in ("drizzle", "primordialsea") else
            "sun" if ability in ("drought", "desolateland") else
            "sand" if ability == "sandstream" else
            "hail" if ability == "snowwarning" else None)
    rsp = dx.SPECIES.get(raw_species)
    return (
        tuple(sp["types"]),
        w_ab,
        raw_species == "charizard" and item == "charizarditey",
        "raindance" in moves, item == "damprock",
        "sunnyday" in moves, item == "heatrock",
        "sandstorm" in moves, item == "smoothrock",
        "hail" in moves, item == "icyrock",
        ("batonpass" in moves and (ability in dx.SETUP_ABILITIES
                                   or bool(moves & dx.TABLES["batonPass"]))),
        "tailwind" in moves,
        "trickroom" in moves and "imprison" not in moves,
        (mon["evs"]["spe"] < 5 and (mon["nature"] in _SLOW_NATURES
                                    or sp["baseStats"]["spe"] <= 50)),
        "gravity" in moves,
        bool(moves & dx.TABLES["gravity"]),
        item == "ejectbutton",
        any(m in ("voltswitch", "uturn", "batonpass") for m in mlist),
        ability in dx.TRAPPING_ABILITIES,
        any(m in (dx.TAG_TRAPPING_MOVES if dx.legacy
                  else dx.TRAPPING_MOVES) for m in mlist),
        raw_species in dx.DRAGONS,
        bool(rsp and "Dragon" in rsp["types"]),
        ability == "magicbounce",
        "rapidspin" in moves,
        ((ability == "sturdy" or item == "focussash")
         and "endeavor" in moves),
        (ability != "klutz"
         and item in ("choiceband", "choicescarf", "choicespecs")),
        any(m in ("foulplay", "swagger") for m in mlist),
    )


def _tag(team: list[dict], stalliness: float, dx: GenDex) -> set[str]:
    # classifier.ts:203-393, quirks preserved; the per-mon predicates are
    # memoized (_mon_tag_preds) and only the counter-coupled sequential
    # logic runs per call
    weather = {"rain": 0, "sun": 0, "sand": 0, "hail": 0}
    st = {k: 0 for k in ("batonpass", "tailwind", "trickroom", "slow",
                         "gravityMoves", "gravity", "voltturn", "dragons",
                         "trappers", "clearance", "fear", "choice",
                         "swagplay")}
    possible_types: list[str] | None = None
    cache = dx.__dict__.setdefault("_tag_pred_cache", {})
    if len(cache) > 200_000:  # bounded per-actor memory at corpus scale
        cache.clear()

    for mon in team:
        key = (mon["species"], tuple(mon["moves"]), mon["ability"],
               mon["item"], mon["nature"], mon["evs"]["spe"] < 5)
        p = cache.get(key)
        if p is None:
            p = cache[key] = _mon_tag_preds(dx, mon)
        (types, w_ab, chary, rd, rd_rock, sd, sd_rock, ss, ss_rock, hl,
         hl_rock, bp, tw, tr, slow_full, grav, gravmv, vt_item, vt_move,
         trap_ab, trap_mv, drag_set, drag_type, clear_ab, rspin, fear,
         choice, swag) = p

        possible_types = (list(types) if possible_types is None
                          else [t for t in possible_types if t in types])

        if w_ab:
            weather[w_ab] += 2
        if weather["sun"] < 2 and chary:
            weather["sun"] += 2
        if weather["rain"] < 2 and rd:
            weather["rain"] += 2 if rd_rock else 1
        if weather["sun"] < 2 and sd:
            weather["sun"] += 2 if sd_rock else 1
        if weather["sand"] < 2 and ss:
            weather["sand"] += 2 if ss_rock else 1
        if weather["hail"] < 2 and hl:
            weather["hail"] += 2 if hl_rock else 1

        if st["batonpass"] < 2 and bp:
            st["batonpass"] += 1
        if st["tailwind"] < 2 and tw:
            st["tailwind"] += 1
        if tr:
            st["trickroom"] += 1
        if st["slow"] < 2 and slow_full:
            st["slow"] += 1
        if st["gravity"] < 2 and grav:
            st["gravity"] += 1
        if gravmv:
            st["gravityMoves"] += 1
        # quirk preserved: the cap only applies to the item branch
        if (st["voltturn"] < 3 and vt_item) or vt_move:
            st["voltturn"] += 1
        if (st["trappers"] < 3 and trap_ab) or trap_mv:
            st["trappers"] += 1
        # JS ?:-precedence quirk (classifier.ts:286-289):
        #   (dragons < 2 && legacy) ? DRAGONS.has(raw) : types has Dragon
        # so legacy uses the pinned set until the cap, then falls through to
        # the (uncapped) type check; non-legacy is always the type check.
        if st["dragons"] < 2 and dx.legacy:
            if drag_set:
                st["dragons"] += 1
        else:
            if drag_type:
                st["dragons"] += 1
        if (st["clearance"] < 2 and clear_ab) or rspin:
            st["clearance"] += 1
        if st["fear"] < 3 and fear:
            st["fear"] += 1
        if st["choice"] < 4 and choice:
            st["choice"] += 1
        if st["swagplay"] < 2 and swag:
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
