"""Protocol-faithful battle-log line anonymizer (M8).

Replicates the reference anonymizer's per-command switch
(`anon/src/index.ts:165-412`) over raw Pokemon Showdown protocol lines,
including the `@pkmn/protocol` parsing semantics it relies on:

- `parseBattleLine`: split on '|', pop trailing `[kw] value` bracket args
  into kwArgs (value trimmed; bare `[kw]` -> True), with the client's
  special single-rest-argument commands (`tier`, `debug`, `inactive`, ...)
  exempt from kwarg popping;
- `upgradeArgs`: legacy `-activate` rewrites (public Showdown
  battle-text-parser semantics): `disguise`/`protect`/... -> `-block`,
  `sturdy`, `wonderguard` -> `-immune`, trap residuals -> `-start`,
  `fairylock` -> `-fieldactivate`, and the modern fall-through
  `['-activate', pokemon, effect, arg3 || arg4]` whose undefined 4th arg
  join()s to a trailing empty field;
- `combine`: rejoin args then kwArgs in original line order (reversed
  insertion order), re-anonymizing `[of]` idents and `[spread]` fields;
- `parsePokemonIdent` / ident map keyed `'pN: <team name>'`, position
  letter preserved on output.

Byte-exact parity with the reference's own goldens
(`anon/src/testdata/{raw,anon,salt,team}.json`, `anon/src/index.test.ts`)
is pinned by tests/test_anon_parity.py.
"""

from __future__ import annotations

import re

from ..gendex import to_id

# Anchored ident test, anon/src/index.ts:163 (`/^p\d[a-d]: .*$/`).
IDENT = re.compile(r"^p\d[a-d]: ")

# parseLine commands whose single rest argument may contain '|' and is never
# kwarg-parsed (public battle-text-parser parseLine switch).
_SPECIAL_REST = {
    "chatmsg", "chatmsg-raw", "raw", "error", "html", "inactive",
    "inactiveoff", "warning", "fieldhtml", "controlshtml", "bigerror",
    "debug", "tier", "challstr", "popup",
}
# Multi-part chat-ish commands — never kwarg-parsed; all dropped by the
# anonymizer switch, so we only need args[0] to be right.
_CHATTY = {"c", "chat", "c:", "pm", "uhtml", "uhtmlchange"}

# Protocol abbreviations normalized before the switch (the reference's
# switch only knows the long forms, anon/src/index.ts:199-233).
_ABBREV = {"j": "join", "J": "join", "l": "leave", "L": "leave",
           "n": "name", "N": "name", "c": "chat"}

DROP = {
    "", "t:", ":", "c:", "chat", "join", "leave", "unlink", "raw", "html",
    "uhtml", "uhtmlchange", "warning", "error", "bigerror", "chatmsg",
    "chatmsg-raw", "controlshtml", "hidelines", "fieldhtml", "inactive",
    "inactiveoff", "debug", "seed", "message", "-message", "-hint",
}
KEEP = {
    "done", "gametype", "gen", "tier", "rule", "teamsize", "clearpoke",
    "teampreview", "start", "rated", "turn", "upkeep", "tie",
}

_FIELD = {"-clearallboost", "-weather", "-fieldstart", "-fieldend", "-ohko",
          "-center", "-combine", "-swapsideconditions", "-fieldactivate"}
_SINGLE_IDENT = {
    "-crit", "-supereffective", "-resisted", "-immune", "-invertboost",
    "-clearboost", "-clearnegativeboost", "-endability", "-cureteam",
    "-mustrecharge", "-primal", "-zpower", "-zbroken", "faint", "-damage",
    "-status", "-curestatus", "-hitcount", "-singlemove", "-singleturn",
    "-terastallize", "-mega", "-start", "-end", "-item", "-enditem", "-fail",
    "cant", "swap", "-boost", "-unboost", "-setboost", "-burst",
}
_SWITCHLIKE = {"detailschange", "-formechange", "switch", "drag", "replace"}
_PAIR_IDENT = {"-transform", "-miss", "-waiting", "-copyboost",
               "-clearpositiveboost", "-swapboost"}

# -activate legacy-effect rewrite tables (public battle-text-parser
# upgradeArgs; only `disguise` and the fall-through fire in the goldens).
_BLOCK_EFFECTS = {
    "ingrain", "quickguard", "wideguard", "craftyshield", "matblock",
    "protect", "mist", "safeguard", "electricterrain", "mistyterrain",
    "psychicterrain", "telepathy", "stickyhold", "suctioncups", "aromaveil",
    "flowerveil", "sweetveil", "disguise", "safetygoggles", "protectivepads",
}
_START_EFFECTS = {"bind", "wrap", "clamp", "whirlpool", "firespin",
                  "magmastorm", "sandtomb", "infestation", "trapped"}

# PS mishandles certain apostrophe names (anon/src/index.ts:420-424).
DETAILS_EXCEPTIONS = {
    "Farfetch'd": "Farfetch’d",
    "Farfetch'd-Galar": "Farfetch’d-Galar",
    "Sirfetch'd": "Sirfetch’d",
}


def _effect_id(effect) -> str:
    if not effect:
        return ""
    s = str(effect)
    for prefix in ("ability:", "item:", "move:"):
        if s.startswith(prefix):
            s = s[len(prefix):]
            break
    return to_id(s)


def _upgrade_args(args: list, kwargs: dict):
    cmd = args[0]
    if cmd in _ABBREV:
        return [_ABBREV[cmd]] + args[1:], kwargs
    if cmd != "-activate":
        return args, kwargs
    if any(k in kwargs for k in ("item", "move", "number", "ability")):
        return args, kwargs
    pokemon = args[1] if len(args) > 1 else None
    effect = args[2] if len(args) > 2 else None
    arg3 = args[3] if len(args) > 3 else None
    arg4 = args[4] if len(args) > 4 else None
    target = kwargs.get("of")
    eid = _effect_id(effect)
    if "block" in kwargs:
        return ["-fail", pokemon], {}
    if eid == "sturdy":
        return ["-activate", pokemon, "ability: Sturdy"], {}
    if eid == "wonderguard":
        return ["-immune", pokemon], {"from": "ability: Wonder Guard"}
    if eid == "beatup" and target:
        return args, {"name": target}
    if eid in _BLOCK_EFFECTS:
        return ["-block", pokemon, effect, None, target], {}
    if eid in _START_EFFECTS:
        return ["-start", pokemon, effect], ({"of": target} if target else {})
    if eid == "fairylock":
        return ["-fieldactivate", effect], {}
    return ["-activate", pokemon, effect, (arg3 or arg4)], kwargs


def parse_battle_line(line: str):
    """'|cmd|a|b|[kw] v' -> (args, kwargs). Caller guarantees '|' prefix."""
    if line == "|":
        return ["done"], {}
    rest = line[1:]
    idx = rest.find("|")
    cmd = rest if idx < 0 else rest[:idx]
    if cmd in _SPECIAL_REST:
        return [cmd, rest[idx + 1:] if idx >= 0 else ""], {}
    if cmd in _CHATTY:
        parts = rest.split("|")
        return _upgrade_args(parts, {})
    args = rest.split("|")
    kwargs: dict = {}
    while len(args) > 1:
        last = args[-1]
        if not last.startswith("["):
            break
        bp = last.find("]")
        if bp <= 0:
            break
        v = last[bp + 1:].strip()
        kwargs[last[1:bp]] = v if v else True
        args.pop()
    return _upgrade_args(args, kwargs)


def parse_pokemon_ident(ident: str):
    """'p2a: Nick' -> ('p2', 'a', 'Nick'); position may be absent."""
    i = ident.find(":")
    pos = ident[:i]
    name = ident[i + 1:].strip()
    if len(pos) > 2:
        return pos[:2], pos[2:], name
    return pos, "", name


class UnknownIdentError(ValueError):
    pass


def _anon_player(name: str, player_map: dict) -> str:
    anon = player_map.get(to_id(name))
    if anon is None:
        raise UnknownIdentError(f"Unknown player: {name}")
    return anon


def _anon_side(side: str, player_map: dict) -> str:
    return side[:4] + _anon_player(side[4:], player_map)


def _anon_details(details: str) -> str:
    split = details.split(",")
    split[0] = DETAILS_EXCEPTIONS.get(split[0], split[0])
    return ",".join(split)


def _anon_pokemon(ident: str, pokemon_map: dict,
                  verifier=None) -> str:
    player, position, name = parse_pokemon_ident(ident)
    anon = pokemon_map.get(f"{player}: {name}")
    if anon is not None:
        return f"{player}{position}: {anon}"
    # Divergence from the reference (which throws, anon/src/index.ts:439):
    # the stored team name may be a truncated PREFIX of the protocol
    # nickname (stats parser.ts:358-377); resolve with the longest-prefix
    # rule, register the full nickname with the Verifier, cache the mapping.
    best = None
    for key, anon_name in pokemon_map.items():
        p, stored = key.split(": ", 1)
        if p == player and stored and name.startswith(stored):
            if best is None or len(stored) > len(best[0]):
                best = (stored, anon_name)
    if best is not None:
        if verifier is not None and name != best[1]:
            verifier.names.add(name)
        pokemon_map[f"{player}: {name}"] = best[1]
        return f"{player}{position}: {best[1]}"
    raise UnknownIdentError(f"Unknown Pokemon: {ident}")


def anonymize_line(line: str, player_map: dict, pokemon_map: dict,
                   verifier=None):
    """One protocol line -> anonymized line, or None to drop.

    player_map: toID(username) -> anonymized username.
    pokemon_map: 'pN: <name>' -> anonymized species/hash (mutated for
    'name' renames and prefix-resolved nicknames).
    """
    if line == "":
        return line
    if not line.startswith("|"):
        return None
    args, kwargs = parse_battle_line(line)

    def anon_poke(ident):
        return _anon_pokemon(ident, pokemon_map, verifier)

    def combine(a):
        buf = "|" + "|".join("" if x is None else str(x) for x in a)
        kws = []
        for k in reversed(list(kwargs.keys())):
            v = kwargs[k]
            if k == "of":
                if v == "":
                    continue
                v = anon_poke(v)
            elif k == "spread" and v is not True:
                v = ",".join(anon_poke(s) if IDENT.match(s) else s
                             for s in str(v).split(","))
            kws.append(f"[{k}]" if v is True else f"[{k}] {v}")
        return buf + "|" + "|".join(kws) if kws else buf

    cmd = args[0]

    # Legacy protocol message (anon/src/index.ts:196).
    if cmd == "-nothing":
        return combine(args)

    if cmd == "name":
        # '|name|NEWNAME|OLDID' — carry the mapping forward, drop the line.
        if len(args) > 2:
            existing = player_map.get(args[2])
            if existing is not None:
                player_map[to_id(args[1])] = existing
        return None

    if cmd in DROP:
        return None
    if cmd in KEEP:
        return line

    if cmd == "poke":
        args[2] = _anon_details(args[2])
        return combine(args)

    if cmd in _FIELD:
        return combine(args)

    if cmd == "-activate":
        if len(args) > 1 and args[1] and IDENT.match(args[1]):
            args[1] = anon_poke(args[1])
        return combine(args)

    if cmd == "player":
        if len(args) < 3 or not args[2]:
            return line
        args[2] = _anon_player(args[2], player_map)
        while len(args) < 5:
            args.append("")
        args[3] = "1"
        args[4] = ""
        return combine(args)

    if cmd in ("-sidestart", "-sideend"):
        args[1] = _anon_side(args[1], player_map)
        return combine(args)

    if cmd == "win":
        args[1] = _anon_player(args[1], player_map)
        return combine(args)

    if cmd in ("-anim", "-prepare"):
        args[1] = anon_poke(args[1])
        if len(args) > 3 and args[3]:
            args[3] = anon_poke(args[3])
        return combine(args)

    if cmd == "move":
        args[1] = anon_poke(args[1])
        if len(args) > 3 and args[3] and args[3] != "null" \
                and IDENT.match(args[3]):
            args[3] = anon_poke(args[3])
        return combine(args)

    if cmd == "-notarget":
        if len(args) > 1 and args[1]:
            args[1] = anon_poke(args[1])
        return combine(args)

    if cmd in _SINGLE_IDENT:
        if len(args) > 1 and args[1]:
            args[1] = anon_poke(args[1])
        return combine(args)

    if cmd in _SWITCHLIKE:
        args[1] = anon_poke(args[1])
        args[2] = _anon_details(args[2])
        return combine(args)

    if cmd == "-block":
        args[1] = anon_poke(args[1])
        # Reference validates args[4] but emits it untouched
        # (anon/src/index.ts:359-364) — replicated exactly.
        if len(args) > 4 and args[4]:
            anon_poke(args[4])
        while len(args) < 5:
            args.append(None)
        args[4] = args[4] or ""
        return combine(args)

    if cmd == "-sethp":
        args[1] = anon_poke(args[1])
        if len(args) > 3 and args[3]:
            args[3] = anon_poke(args[3])
        return combine(args)

    if cmd == "-ability":
        if args[1] != "":
            args[1] = anon_poke(args[1])
        if len(args) > 3 and args[3] and IDENT.match(args[3]):
            args[3] = anon_poke(args[3])
        elif len(args) > 3 and args[3] and ":" in args[3]:
            args[3] = _anon_side(args[3], player_map)
        elif len(args) > 4 and args[4]:
            args[4] = anon_poke(args[4])
        return combine(args)

    if cmd == "-heal":
        args[1] = anon_poke(args[1])
        if "wisher" in kwargs:
            # Not the actual position; only the side matters
            # (anon/src/index.ts:387-394).
            position = args[1].split(": ")[0]
            full = anon_poke(f"{position}: {kwargs['wisher']}")
            kwargs["wisher"] = full.split(": ")[1]
        return combine(args)

    if cmd in _PAIR_IDENT:
        args[1] = anon_poke(args[1])
        if len(args) > 2 and args[2]:
            args[2] = anon_poke(args[2])
        return combine(args)

    raise ValueError(f"Unknown protocol message {cmd}: '{line}'")
