"""Battle parse stage: tokens -> structured battle rows.

The engine's M1-M7 operators (SURVEY.md §2.2) as one Ray Data actor-pool
stage: decode int32 tokens to the JSON document (vectorized over the Arrow
list buffer), validate, canonicalize both teams against a pluggable GenDex,
run the protocol-line state machine to reconstruct matchups/turnsOut/kos,
classify the teams, and compute per-cutoff Glicko weights (vectorized Cody
erf).

Semantics replicate the reference parser (stats/src/parser.ts:68-399) and
weighting (stats/src/stats.ts:245-270) in both modes:

- non-legacy (synthetic universe): one weight per (player, cutoff);
- legacy (real-data slice; parser.ts `legacy=true`): teams pad to six
  'empty' slots, the double-down review increments a single KO counter
  (parser.ts:225-230), hpType comes from IVs, and weights split into the
  (s, m) pair — s imputes a rating from the outcome while m falls back to
  the provisional (1500, 130) when the rating is invalid (stats.ts:259-267).

Usage:
    ds.map_batches(ParseBattles, batch_format="pyarrow",
                   concurrency=N, batch_size=256)
"""

from __future__ import annotations

import json

try:  # ~10x faster doc parse in the per-battle hot loop; stdlib fallback
    import orjson

    def _json_loads(s):
        # orjson rejects JSON stdlib accepts (NaN/Infinity literals,
        # ints beyond 64 bits); fall back per doc so the accepted-input
        # surface doesn't depend on an optional dependency
        try:
            return orjson.loads(s)
        except orjson.JSONDecodeError:
            return json.loads(s)
except ImportError:  # pragma: no cover
    _json_loads = json.loads

import numpy as np
import pyarrow as pa

from ..gendex import GenDex, gen_for_format, get_dex, to_id
from ..functions.statmath import hidden_power_type
from ..functions.weights import effective_rating, gxe, weighting
from ..schema import PARSED_SCALARS, PARSED_SCHEMA, MATCHUP_T, SLOT_T
from ..tokens import decode_column
from .classify import classify_team

# Outcome enum (stats/src/util.ts:8-22)
P1_KOED, P2_KOED, DOUBLE_DOWN = 0, 1, 2
P1_SWITCHED_OUT, P2_SWITCHED_OUT, DOUBLE_SWITCH = 3, 4, 5
P1_FORCED_OUT, P2_FORCED_OUT = 6, 7
P1_UTURN_KOED, P2_UTURN_KOED = 8, 9
P1_FODDERED, P2_FODDERED = 10, 11
UNKNOWN = 12

ROAR_MOVES = {"Roar", "Whirlwind", "Circle Throw", "Dragon Tail"}
UTURN_MOVES = {"U-Turn", "U-turn", "Volt Switch", "Baton Pass"}

# the only protocol commands the matchup state machine consumes
# (parser.ts:118-273 switch arms)
_MATCHUP_CMDS = {"turn", "win", "tie", "move", "-enditem", "faint",
                 "replace", "switch", "drag"}


class ParseError(ValueError):
    pass


def _ts_ms(ts: str | None) -> int:
    """'YYYY-MM-DDTHH:MM:SSZ' -> epoch ms (binary.ts:159 analogue).
    Fixed-format slice parse — strptime costs ~30us/call in the hot loop."""
    if not ts:
        return 0
    import datetime
    try:
        # validate the fixed separators too — strptime rejected malformed
        # strings (-> 0) and digit-position slicing alone would not
        if (ts[4] != "-" or ts[7] != "-" or ts[10] != "T"
                or ts[13] != ":" or ts[16] != ":"):
            return 0
        dt = datetime.datetime(int(ts[0:4]), int(ts[5:7]), int(ts[8:10]),
                               int(ts[11:13]), int(ts[14:16]), int(ts[17:19]),
                               tzinfo=datetime.timezone.utc)
        return int(dt.timestamp() * 1000)
    except (ValueError, IndexError):
        return 0


def canonicalize_format(fmt: str) -> str:
    """util.ts:260-275 (subset relevant to modern format ids)."""
    fmt = to_id(fmt)
    if fmt.endswith("current"):
        fmt = fmt[:-7]
    if fmt.startswith("pokebank"):
        fmt = fmt[8:-4]
    if fmt.startswith("oras"):
        fmt = fmt[4:]
    return fmt


_EV_DEFAULT = {"hp": 0, "atk": 0, "def": 0, "spa": 0, "spd": 0, "spe": 0}
_IV_DEFAULT = {"hp": 31, "atk": 31, "def": 31, "spa": 31, "spd": 31,
               "spe": 31}


def canonicalize_team(team: list[dict], dx: GenDex | None = None,
                      legacy: bool = False) -> list[dict]:
    """Engine implementation of Parser.canonicalizeTeam (parser.ts:278-334)."""
    if dx is None:
        dx = get_dex("synth")
    out = []
    for p in team or []:
        if not p:
            continue
        item = to_id(p.get("item") or "")
        item = item if item in dx.ITEMS else "nothing"
        happiness = p.get("happiness")
        happiness = 255 if happiness is None else happiness
        nature = to_id(p.get("nature") or "")
        nature = nature if nature in dx.NATURES else "hardy"
        # constant-dict copies: ~10% of the whole parse was spent
        # rebuilding these six-key dicts by comprehension per mon
        evs = _EV_DEFAULT.copy()
        for k, v in (p.get("evs") or {}).items():
            if k in evs:
                evs[k] = int(v)
        ivs = _IV_DEFAULT.copy()
        for k, v in (p.get("ivs") or {}).items():
            if k in ivs:
                ivs[k] = int(v)
        moves = []
        for mv in (p.get("moves") or [])[:4]:
            m = to_id(mv)
            if m == "hiddenpower":
                # legacy always derives the type from the IVs (parser.ts:304)
                t = (p.get("hpType") if not legacy else None) \
                    or hidden_power_type(ivs)
                m = f"hiddenpower{to_id(t)}"
            moves.append(m)
        while len(moves) < 4:
            moves.append("")
        level = p.get("forcedLevel") or p.get("level") or 100
        ability = to_id(p.get("ability") or "")
        ability = ability if ability in dx.ABILITIES else "unknown"
        sid = dx.species_id(p.get("species") or p.get("name") or "")
        if sid is None:
            raise ParseError(f"Unknown species '{p.get('species')}'")
        tera = p.get("teraType") or "nothing"
        # forme overrides (parser.ts:318-331)
        if sid == "greninja" and ability == "battlebond":
            sid = "greninjaash"
        elif sid == "zacian" and item == "rustedsword":
            sid = "zaciancrowned"
        elif sid == "zamazenta" and item == "rustedshield":
            sid = "zamazentacrowned"
        else:
            mega = dx.mega_evolution(sid, item)
            if mega:
                sid, ability = mega
        out.append({
            "name": p.get("name") or "",
            "species": sid, "item": item, "ability": ability, "nature": nature,
            "moves": moves, "evs": evs, "ivs": ivs, "level": level,
            "happiness": happiness, "tera": tera,
        })
    return out


def _identify(name: str, side: str, mons: list[dict], idents: dict,
              dx: GenDex) -> int:
    """parser.ts:344-399."""
    names = idents[side]
    if name.startswith(f"{side}a: ") or name.startswith(f"{side}: "):
        nick = name[name.index(" ") + 1:]
        found = []
        for i, n in enumerate(names):
            if n == nick:
                return i
            if nick.startswith(n):
                found.append((i, n))
        if found:
            longest = max(found, key=lambda f: len(f[1]))
            names[longest[0]] = longest[1]
            return longest[0]
    else:
        sid = dx.species_id(name)
        if sid is None:
            raise ParseError(f"Unknown species '{name}'")
        for i, m in enumerate(mons):
            if m["species"] == sid:
                return i
        if dx.is_mega(sid) or sid in dx.FORMES:
            sid = dx.base_species(sid)
        for i, m in enumerate(mons):
            if m["species"].startswith(sid):
                return i
    raise ParseError(f"Unable to locate {side}'s '{name}'")


def parse_battle(doc: dict, fmt: str, singles: bool, dx: GenDex | None = None,
                 legacy: bool = False) -> dict:
    """One document -> parsed battle dict (parser.ts:68-275)."""
    if dx is None:
        dx = get_dex("synth")
    if doc.get("turns") is None:
        raise ParseError("No turn count")
    log = doc.get("log")
    winner = 0
    if log:
        winners = [ln for ln in log if ln.startswith("|win|")]
        if f"|win|{doc.get('p1')}" in winners:
            winner = 1
        if f"|win|{doc.get('p2')}" in winners:
            if winner == 1:
                raise ParseError("Battle had two winners")
            winner = 2
    if doc.get("p1") == doc.get("p2"):
        raise ParseError("Player battling themself")

    teams = {}
    idents = {"p1": [], "p2": []}
    mons = {}
    for side in ("p1", "p2"):
        team = canonicalize_team(doc.get(f"{side}team"), dx, legacy)
        teams[side] = team
        # legacy pads each side to six slots with 'empty' (parser.ts:95-106)
        count = 6 if legacy else len(team)
        for i in range(count):
            p = team[i] if i < len(team) else None
            idents[side].append((p["name"] or p["species"]) if p else "empty")
        mons[side] = [
            {"species": team[i]["species"] if i < len(team) else "empty",
             "turnsOut": 0, "kos": 0}
            for i in range(count)]

    battle = {
        "winner": winner, "turns": int(doc["turns"]),
        "end_type": doc.get("endType") or "",
        "teams": teams, "mons": mons, "matchups": [],
    }
    if not log or not singles:
        return battle

    m1, m2 = mons["p1"], mons["p2"]
    active = {"p1": None, "p2": None}

    def empty_flags():
        return {"roar": False, "uturn": False, "fodder": False, "hazard": False,
                "uturnko": False, "ko1": False, "ko2": False,
                "sw1": False, "sw2": False}

    flags = empty_flags()
    turn_matchups: list[list] = []
    matchups = battle["matchups"]

    for raw_line in log:
        if len(raw_line) < 2 or not raw_line.startswith("|"):
            continue
        # cheap command pre-filter: most protocol lines (poke/-damage/rules/
        # chat) are irrelevant to the matchup state machine — skip them
        # before paying the full per-field split+strip
        e = raw_line.find("|", 1)
        cmd = (raw_line[1:e] if e > 0 else raw_line[1:]).strip()
        if cmd not in _MATCHUP_CMDS:
            continue
        line = [s.strip() for s in raw_line.split("|")]
        cmd = line[1]
        if cmd == "turn":
            matchups.extend(turn_matchups)
            flags = empty_flags()
            turn_matchups = []
            m1[active["p1"]]["turnsOut"] += 1
            m2[active["p2"]]["turnsOut"] += 1
        elif cmd in ("win", "tie"):
            if flags["ko1"] or flags["ko2"]:
                poke1, poke2 = m1[active["p1"]], m2[active["p2"]]
                matchup = [poke1["species"], poke2["species"], UNKNOWN]
                if flags["ko1"] and flags["ko2"]:
                    poke1["kos"] += 1
                    poke2["kos"] += 1
                    matchup[2] = DOUBLE_DOWN
                else:
                    (poke1 if flags["ko1"] else poke2)["kos"] += 1
                    if flags["uturnko"]:
                        turn_matchups.pop()
                        matchup[2] = P1_UTURN_KOED if flags["ko1"] else P2_UTURN_KOED
                    else:
                        matchup[2] = P1_KOED if flags["ko1"] else P2_KOED
                turn_matchups.append(matchup)
            matchups.extend(turn_matchups)
        elif cmd == "move":
            if len(line) < 4:
                raise ParseError(f"Could not parse line: '{raw_line}'")
            flags["hazard"] = False
            move = line[3]
            if move in ROAR_MOVES:
                flags["roar"] = True
            elif move in UTURN_MOVES:
                flags["uturn"] = True
        elif cmd == "-enditem":
            if "Red Card" in raw_line:
                flags["roar"] = True
            elif "Eject Button" in raw_line:
                flags["uturn"] = True
        elif cmd == "faint":
            side = "p1" if line[2].startswith("p1") else "p2"
            k = "ko1" if side == "p1" else "ko2"
            if flags["sw1" if side == "p1" else "sw2"]:
                flags["fodder"] = True
            flags[k] = True
            if flags["uturn"]:
                flags["uturn"] = False
                flags["uturnko"] = True
        elif cmd in ("replace", "switch", "drag"):
            if len(line) < 4:
                raise ParseError(f"Could not parse line: '{raw_line}'")
            name = line[3].split(",")[0]
            side = "p1" if line[2].startswith("p1") else "p2"
            if cmd == "replace":
                active[side] = _identify(name, side, mons[side], idents, dx)
                continue
            if active["p1"] is not None and active["p2"] is not None:
                flags["sw1" if side == "p1" else "sw2"] = True
                if flags["sw1"] and flags["sw2"] and not flags["fodder"]:
                    # review the previous matchup (parser.ts:215-237)
                    matchup = turn_matchups[-1]
                    p = "p1" if flags["ko1"] else "p2"
                    if not flags["ko1"] and not flags["ko2"]:
                        matchup[2] = DOUBLE_SWITCH
                    elif flags["ko1"] and flags["ko2"]:
                        if legacy:
                            # parser.ts:225-227: only one counter bumped
                            (m1 if p == "p1" else m2)[active[p]]["kos"] += 1
                        else:
                            m1[active["p1"]]["kos"] += 1
                            m2[active["p2"]]["kos"] += 1
                        matchup[2] = DOUBLE_DOWN
                    else:
                        (m1 if p == "p1" else m2)[active[p]]["kos"] += 1
                        matchup[2] = P1_UTURN_KOED if flags["ko1"] else P2_UTURN_KOED
                else:
                    poke1, poke2 = m1[active["p1"]], m2[active["p2"]]
                    matchup = [poke1["species"], poke2["species"], UNKNOWN]
                    if flags["ko1"] or flags["ko2"]:
                        if flags["fodder"] and flags["hazard"]:
                            matchup[2] = P1_FODDERED if flags["ko1"] else P2_FODDERED
                        else:
                            (poke1 if flags["ko1"] else poke2)["kos"] += 1
                            matchup[2] = P1_KOED if flags["ko1"] else P2_KOED
                    else:
                        if flags["roar"]:
                            matchup[2] = P1_FORCED_OUT if flags["sw1"] else P2_FORCED_OUT
                        else:
                            matchup[2] = P1_SWITCHED_OUT if flags["sw1"] else P2_SWITCHED_OUT
                    turn_matchups.append(matchup)
                flags["uturn"] = flags["roar"] = flags["fodder"] = False
                flags["hazard"] = True
            active[side] = _identify(name, side, mons[side], idents, dx)
    return battle


class ParseBattles:
    """Actor-pool batch transform: battles (tokens) table -> parsed table.

    Stateful per-actor setup (dex tables load once per worker; SURVEY.md
    §2.4 T1/T2). `dex_name` selects the universe ("synth" or "legacy");
    `legacy` enables the reference's legacy parse/weighting semantics.
    """

    def __init__(self, strict: bool = True, dex_name: str = "synth",
                 legacy: bool = False, quarantine: bool = False):
        self.strict = strict
        self.dx = get_dex(dex_name)
        self.legacy = legacy
        # quarantine mode: malformed battles become rows with a non-empty
        # `parse_error` column instead of being silently dropped — at scale
        # a bad shard must be ACCOUNTED, not vanished (split downstream
        # with pipelines.usage.parse_with_quarantine)
        self.quarantine = quarantine

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = decode_column(batch["tokens"])
        sources = batch["source"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        dx = self.dx

        rows = []
        errors: list[tuple[str, str, str]] = []
        for doc_id, source, s in zip(doc_ids, sources, docs):
            fmt = canonicalize_format(source.split("/", 1)[0])
            singles = not dx.is_non_singles(fmt)
            non6v6 = dx.is_non_6v6(fmt)
            try:
                doc = _json_loads(s)
                b = parse_battle(doc, fmt, singles, dx, self.legacy)
            except (ParseError, ValueError, KeyError, IndexError, TypeError) as e:
                if self.strict:
                    raise ParseError(f"{doc_id}: {e}") from e
                if self.quarantine:
                    errors.append((str(doc_id), str(source),
                                   f"{type(e).__name__}: {e}"))
                continue
            rows.append((doc_id, source, fmt, singles, non6v6, doc, b))

        good = self._assemble(rows)
        if not self.quarantine:
            return good
        good = good.append_column("parse_error",
                                  pa.array([""] * len(good), pa.string()))
        if not errors:
            return good
        err_cols = {}
        for f in PARSED_SCHEMA:
            if f.name == "doc_id":
                err_cols[f.name] = pa.array([e[0] for e in errors],
                                            type=f.type)
            elif f.name == "source":
                err_cols[f.name] = pa.array([e[1] for e in errors],
                                            type=f.type)
            else:
                err_cols[f.name] = pa.nulls(len(errors), type=f.type)
        err_cols["parse_error"] = pa.array([e[2] for e in errors],
                                           pa.string())
        return pa.concat_tables([good, pa.table(err_cols)])

    def _assemble(self, rows) -> pa.Table:
        dx, legacy = self.dx, self.legacy
        n = len(rows)
        cols: dict[str, list] = {name: [] for name, _ in PARSED_SCALARS}
        p1_tags, p2_tags = [], []
        # columnar staging for the nested slot/matchup columns: one flat list
        # per struct field + list offsets — 24k per-batch slot dicts were a
        # measured 30-40% of the assemble wall
        S: dict[str, list] = {f.name: [] for f in SLOT_T
                              if f.name not in ("spread", "stats")}
        M: dict[str, list] = {f.name: [] for f in MATCHUP_T}
        s_off, m_off = [0], [0]
        mon_meta: list[tuple[dict, int]] = []  # (mon, flat slot idx)

        # numpy staging for vectorized weight math
        has_r = np.zeros((n, 2), dtype=bool)
        rpr = np.zeros((n, 2)); rprd = np.zeros((n, 2))
        outc = np.zeros((n, 2), dtype=np.int8)
        cutoffs = np.zeros((n, 4))

        from ..dex import cutoffs_for
        from .classify_vec import classify_teams_batch

        # batch-classify every team in the batch in one vectorized pass
        # (bitwise-identical to the scalar classifier; see classify_vec)
        all_teams = []
        team_gens = []
        for _i, (_d, _s, fmt, _sg, _n6, _doc, b) in enumerate(rows):
            g = gen_for_format(fmt)
            all_teams.append(b["teams"]["p1"])
            all_teams.append(b["teams"]["p2"])
            team_gens.extend((g, g))
        classified = classify_teams_batch(all_teams, dx, team_gens)

        for i, (doc_id, source, fmt, singles, non6v6, doc, b) in enumerate(rows):
            turns = b["turns"]
            short = (not non6v6) and (turns < 2 or (turns < 3 and singles))
            cols["doc_id"].append(doc_id)
            cols["source"].append(source)
            cols["format"].append(fmt)
            cols["singles"].append(singles)
            cols["non6v6"].append(non6v6)
            cols["short"].append(short)
            cols["p1"].append(to_id(doc.get("p1") or ""))
            cols["p2"].append(to_id(doc.get("p2") or ""))
            cols["winner"].append(b["winner"])
            cols["turns"].append(turns)
            cols["end_type"].append(b["end_type"])
            cols["ts_ms"].append(_ts_ms(doc.get("timestamp")))
            cuts = cutoffs_for(fmt)
            cutoffs[i] = cuts
            for k in range(4):
                cols[f"cutoff{k}"].append(cuts[k])

            for j, side in enumerate(("p1", "p2")):
                rating = doc.get(f"{side}rating")
                has = rating is not None
                has_r[i, j] = has
                rpr[i, j] = (rating or {}).get("rpr") or 0.0
                rprd[i, j] = (rating or {}).get("rprd") or 0.0
                w = b["winner"]
                outc[i, j] = 0 if w == 0 else (1 if w == j + 1 else 2)
                cols[f"{side}_has_rating"].append(has)
                cols[f"{side}_rpr"].append(rpr[i, j] if has else None)
                cols[f"{side}_rprd"].append(rprd[i, j] if has else None)

            # leads (stats.ts:516-540)
            lead1 = lead2 = "empty"
            if singles:
                if b["matchups"]:
                    lead1, lead2 = b["matchups"][0][0], b["matchups"][0][1]
                else:
                    for m in b["mons"]["p1"]:
                        if m["turnsOut"] > 0:
                            lead1 = m["species"]
                            break
                    for m in b["mons"]["p2"]:
                        if m["turnsOut"] > 0:
                            lead2 = m["species"]
                            break
            cols["lead1"].append(lead1)
            cols["lead2"].append(lead2)

            for j, side in enumerate(("p1", "p2")):
                team = b["teams"][side]
                bias, stalliness, tags = classified[2 * i + j]
                cols[f"{side}_bias"].append(bias)
                cols[f"{side}_stalliness"].append(stalliness)
                (p1_tags if j == 0 else p2_tags).append(tags)
                player = to_id(doc.get(side) or "")
                for k, st in enumerate(b["mons"][side]):
                    mon = team[k] if k < len(team) else None
                    S["side"].append(j + 1)
                    S["slot"].append(k)
                    S["player"].append(player)
                    if mon is None:
                        # legacy 'empty' slot: counted in the global usage /
                        # metagame totals, excluded from per-species stats
                        S["species"].append("empty")
                        S["item"].append("")
                        S["ability"].append("")
                        S["nature"].append("")
                        S["happiness"].append(0)
                        S["level"].append(0)
                        S["tera"].append("")
                        for mv in ("move1", "move2", "move3", "move4"):
                            S[mv].append("")
                        S["turns_out"].append(0)
                        S["kos"].append(0)
                        continue
                    # spread/stats keys are filled in one vectorized pass below
                    S["species"].append(mon["species"])
                    S["item"].append(mon["item"])
                    S["ability"].append(mon["ability"])
                    S["nature"].append(mon["nature"])
                    S["happiness"].append(mon["happiness"])
                    S["level"].append(mon["level"])
                    S["tera"].append(mon["tera"])
                    S["move1"].append(mon["moves"][0])
                    S["move2"].append(mon["moves"][1])
                    S["move3"].append(mon["moves"][2])
                    S["move4"].append(mon["moves"][3])
                    S["turns_out"].append(st["turnsOut"])
                    S["kos"].append(st["kos"])
                    mon_meta.append((mon, len(S["side"]) - 1))
            s_off.append(len(S["side"]))
            for k, m in enumerate(b["matchups"]):
                M["idx"].append(k)
                M["s1"].append(m[0])
                M["s2"].append(m[1])
                M["outcome"].append(m[2])
            m_off.append(len(M["idx"]))

        # vectorized spread/stat keys across every mon in the batch (M14)
        n_slots = len(S["side"])
        spread_flat = [""] * n_slots
        stats_flat = [""] * n_slots
        if mon_meta:
            from ..functions.statmath import STAT_ORDER, spread_and_stats_batch
            m_iv = np.array([[m["ivs"][s] for s in STAT_ORDER]
                             for m, _ in mon_meta], dtype=np.int64)
            m_ev = np.array([[m["evs"][s] for s in STAT_ORDER]
                             for m, _ in mon_meta], dtype=np.int64)
            m_lv = np.array([m["level"] for m, _ in mon_meta], dtype=np.int64)
            spreads, statkeys = spread_and_stats_batch(
                [m["species"] for m, _ in mon_meta],
                [m["nature"] for m, _ in mon_meta], m_iv, m_ev, m_lv,
                dx=dx, legacy=legacy)
            for (arr_s, arr_k, (_, idx)) in zip(spreads, statkeys, mon_meta):
                spread_flat[idx] = arr_s
                stats_flat[idx] = arr_k
        S["spread"] = spread_flat
        S["stats"] = stats_flat

        # vectorized weights + gxe (Cody erf; stats.ts:245-270, util.ts:410-419)
        for j, side in enumerate(("p1", "p2")):
            r_eff, d_eff, valid = effective_rating(
                has_r[:, j], rpr[:, j], rprd[:, j], outc[:, j])
            # numpy arrays go to pa.array zero-copy — no tolist round-trip
            cols[f"{side}_valid"] = valid
            g = gxe(rpr[:, j], rprd[:, j])
            cols[f"{side}_gxe"] = [
                float(g[i]) if has_r[i, j] else None for i in range(n)]
            for k in range(4):
                w = weighting(r_eff, d_eff, cutoffs[:, k])
                # rd>100 & cutoff>1500 zeroing needs the *per-row* cutoff
                w = np.where((d_eff > 100.0) & (cutoffs[:, k] > 1500), 0.0, w)
                cols[f"{side}_w{k}"] = w
                if legacy:
                    # stats.ts:262-265: the m-weight ignores the imputed
                    # outcome rating, falling back to (1500, 130)
                    mfall = weighting(np.full(n, 1500.0), np.full(n, 130.0),
                                      cutoffs[:, k])
                    wm = np.where(valid, w, mfall)
                else:
                    wm = w
                cols[f"{side}_m{k}"] = wm

        arrays = {name: pa.array(cols[name], type=typ) for name, typ in PARSED_SCALARS}
        arrays["p1_tags"] = pa.array(p1_tags, type=pa.list_(pa.string()))
        arrays["p2_tags"] = pa.array(p2_tags, type=pa.list_(pa.string()))

        def nested(fields: pa.StructType, flat: dict[str, list],
                   offs: list[int]) -> pa.Array:
            struct = pa.StructArray.from_arrays(
                [pa.array(flat[f.name], type=f.type) for f in fields],
                fields=list(fields))
            lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), struct)
            return lst.cast(pa.list_(fields))

        arrays["slots"] = nested(SLOT_T, S, s_off)
        arrays["matchups"] = nested(MATCHUP_T, M, m_off)
        return pa.table(arrays, schema=PARSED_SCHEMA)
