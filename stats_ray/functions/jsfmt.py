"""JavaScript-exact formatting primitives for byte-parity report rendering.

The reference emits reports via JS `Number.prototype.toFixed`,
`JSON.stringify`, `String.prototype.localeCompare` and the npm package
json-stringify-pretty-compact (integration.ts:6,204). Byte-exact golden
parity requires replicating their exact semantics:

- js_num:     Number::toString (shortest round-trip, JS exponent rules)
- js_tofixed: toFixed (round-half-toward-+Infinity on exact ties)
- js_round:   Math.round(v*p)/p (util.ts:277-279)
- locale_key: sort key approximating Intl default collation (space <
  punctuation < digits < case-folded letters)
- json_stringify: JSON.stringify with JS number formatting
- stringify_pretty_compact: the pretty-compact layout (80-col wrap)
"""

from __future__ import annotations

import math
from decimal import Decimal, ROUND_HALF_DOWN, ROUND_HALF_UP


def js_round(v: float, p: float = 1e10) -> float:
    """Math.round(v * p) / p — half toward +Infinity (util.ts:277).
    NaN/±inf propagate like JS Math.round."""
    x = v * p
    if x != x or x in (math.inf, -math.inf):
        return x
    return math.floor(x + 0.5) / p


def js_num(v) -> str:
    """ECMA-262 Number::toString(10)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    f = float(v)
    if f != f:
        return "NaN"
    if f == math.inf:
        return "Infinity"
    if f == -math.inf:
        return "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    s = repr(f)
    if "e" not in s:
        return s
    m, e = s.split("e")
    exp = int(e)
    neg = m.startswith("-")
    if neg:
        m = m[1:]
    digits = m.replace(".", "")
    point = 1 + exp  # decimal point position relative to digit string
    if -5 <= point <= 21:
        if point <= 0:
            out = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            out = digits + "0" * (point - len(digits))
        else:
            out = digits[:point] + "." + digits[point:]
    else:
        mm = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        out = f"{mm}e{'+' if exp >= 0 else '-'}{abs(exp)}"
    return ("-" if neg else "") + out


def js_tofixed(v: float, digits: int) -> str:
    """Number.prototype.toFixed — ties pick the larger candidate (+inf)."""
    d = Decimal(float(v))
    rounding = ROUND_HALF_UP if d >= 0 else ROUND_HALF_DOWN
    q = d.quantize(Decimal(1).scaleb(-digits), rounding=rounding)
    return f"{q:.{digits}f}" if digits > 0 else str(int(q))


def round_str(v: float, p: float = 1e10) -> str:
    """util.ts roundStr: integral -> toFixed(1), else Number::toString."""
    num = js_round(v, p)
    return f"{num:.1f}" if num == math.floor(num) else js_num(num)


_PUNCT_RANK = {" ": 0, "\t": 0, "'": 1, "-": 2}


def locale_key(s: str):
    """Sort key approximating JS default localeCompare (ICU en):
    whitespace < punctuation < digits < letters (case-insensitive primary,
    lowercase-first tertiary)."""
    primary = []
    tertiary = []
    for c in s:
        if c.isalpha():
            primary.append((4, c.lower()))
            tertiary.append(0 if c.islower() else 1)
        elif c.isdigit():
            primary.append((3, c))
            tertiary.append(0)
        else:
            primary.append((_PUNCT_RANK.get(c, 1), c))
            tertiary.append(0)
    return (tuple(primary), tuple(tertiary))


def json_stringify(obj) -> str:
    """JSON.stringify(obj) — compact, JS number formatting, insertion
    order."""
    return _stringify_value(obj)


def _json_str(s: str) -> str:
    out = ['"']
    for c in s:
        if c == '"':
            out.append('\\"')
        elif c == "\\":
            out.append("\\\\")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c == "\t":
            out.append("\\t")
        elif ord(c) < 0x20:
            out.append(f"\\u{ord(c):04x}")
        else:
            out.append(c)
    out.append('"')
    return "".join(out)


def _stringify_value(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return _json_str(v)
    if isinstance(v, (int, float)):
        f = float(v)
        if f != f or f in (math.inf, -math.inf):
            return "null"
        return js_num(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_stringify_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_json_str(str(k))}:{_stringify_value(v[k])}"
            for k in js_object_keys(v)) + "}"
    raise TypeError(f"unstringifiable {type(v)}")


def _is_array_index(k: str) -> bool:
    return k.isdigit() and (k == "0" or k[0] != "0") and int(k) < 2 ** 32 - 1


def js_object_keys(d: dict) -> list[str]:
    """ECMA OrdinaryOwnPropertyKeys: integer-like keys ascending first,
    then string keys in insertion order."""
    keys = [str(k) for k in d.keys()]
    ints = sorted((k for k in keys if _is_array_index(k)), key=int)
    strs = [k for k in keys if not _is_array_index(k)]
    if ints:
        remap = {str(k): k for k in d.keys()}
        return [remap[k] for k in ints + strs]
    return list(d.keys())


def _prettify(compact: str) -> str:
    """Add a space after every ':' and ',' outside strings (the package's
    stringOrChar regex replace)."""
    out = []
    i = 0
    n = len(compact)
    while i < n:
        c = compact[i]
        if c == '"':
            j = i + 1
            while j < n:
                if compact[j] == "\\":
                    j += 2
                    continue
                if compact[j] == '"':
                    break
                j += 1
            out.append(compact[i:j + 1])
            i = j + 1
        elif c in ":,":
            out.append(c + " ")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def stringify_pretty_compact(obj, indent: int = 2, max_length: int = 80) -> str:
    """json-stringify-pretty-compact: objects/arrays go on one line when the
    prettified compact form fits in (max_length - current indent - reserved),
    otherwise one item per line at the next indent level."""
    ind = " " * indent

    def rec(v, current_indent: str, reserved: int) -> str:
        string = _stringify_value(v)
        length = max_length - len(current_indent) - reserved
        if len(string) <= length:
            prettified = _prettify(string)
            if len(prettified) <= length:
                return prettified
        if isinstance(v, (dict, list, tuple)):
            next_indent = current_indent + ind
            items = []
            if isinstance(v, (list, tuple)):
                start, end = "[", "]"
                n = len(v)
                for idx, x in enumerate(v):
                    items.append(rec(x, next_indent, 0 if idx == n - 1 else 1))
            else:
                start, end = "{", "}"
                keys = js_object_keys(v)
                n = len(keys)
                for idx, k in enumerate(keys):
                    key_part = _json_str(str(k)) + ": "
                    extra = 0 if idx == n - 1 else 1
                    val = rec(v[k], next_indent, len(key_part) + extra)
                    items.append(key_part + val)
            if items:
                return (start + "\n" + next_indent
                        + (",\n" + next_indent).join(items)
                        + "\n" + current_indent + end)
        return string

    return rec(obj, "", 0)
