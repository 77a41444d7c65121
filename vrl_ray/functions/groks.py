"""parse_groks — the Datadog grok dialect.

Reference: parse_groks.rs (530 LoC) + src/datadog/grok/ (parse rules
parse_grok_rules.rs:24-120: alias resolution with cycle detection,
first-matching-pattern-wins; matchers under datadog/grok/matchers/,
post-filters under datadog/grok/filters/).

Supported surface (documented subset):
- patterns: list tried in order, first full match wins
- aliases + alias_sources (JSON files of name→pattern; `aliases`
  entries take precedence), recursive expansion w/ cycle detection
- the FULL baked pattern library (350 definitions generated from
  src/datadog/grok/patterns/*.pattern by scripts/gen_dd_patterns.py
  into _dd_patterns.py — aws/httpd/haproxy/syslog/... ; bodies expand
  with legacy grok-crate alias semantics, 349/350 compile under
  Python `regex`; SHOREWALL uses onig stacked quantifiers)
- Datadog matchers: data, notSpace, word, integer, number, boolean,
  ipv4, ipv6, ip, ipOrHost, hostname, port, doubleQuotedString,
  singleQuotedString, quotedString, uuid, date("fmt"), regex("...")
- filters: number, integer, boolean, scale(x), lowercase, uppercase,
  nullIf("v"), json, querystring, decodeuricomponent, array([sep]),
  keyvalue([kvSep[, valueCharset]])

Compile once per distinct (patterns, aliases) — the stage layer caches
compiled rule sets per actor, mirroring the reference's compile-time
`Arc` state (parse_grok.rs:148-169).
"""

from __future__ import annotations

import json as _json
import re as _stdre
from typing import Any, Optional
from urllib.parse import parse_qsl, unquote

import regex as _regex

from ..value import VrlError
from ..grok import BASE_PATTERNS
from ._dd_patterns import DD_PATTERNS
from .parse_data import resolve_data_path

__all__ = ["parse_groks", "compile_groks"]

_MAX_DEPTH = 64

# Datadog matchers → (regex, implicit filter)
_DD_MATCHERS: dict[str, tuple[str, Optional[str]]] = {
    "data": (r".*?", None),
    "notSpace": (r"\S+", None),
    "word": (r"\w+", None),
    "integer": (r"[+-]?\d+", "integer"),
    "integerStr": (r"[+-]?\d+", None),
    "integerExt": (r"[+-]?\d+(?:[eE][+-]?\d+)?", "number"),
    "number": (r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?", "number"),
    "numberStr": (r"[+-]?(?:\d+\.?\d*|\.\d+)", None),
    "numberExt": (r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?", "number"),
    "boolean": (r"(?:[Tt]rue|[Ff]alse)", "boolean"),
    "ipv4": (BASE_PATTERNS["IPV4"], None),
    "ipv6": (BASE_PATTERNS["IPV6"], None),
    "ip": (BASE_PATTERNS["IP"], None),
    "hostname": (BASE_PATTERNS["HOSTNAME"], None),
    "ipOrHost": (BASE_PATTERNS["IPORHOST"], None),
    "port": (r"\d{1,5}", None),
    "doubleQuotedString": (r'"[^"]*"', None),
    "singleQuotedString": (r"'[^']*'", None),
    "quotedString": (r'(?:"[^"]*"|\'[^\']*\')', None),
    "uuid": (BASE_PATTERNS["UUID"], None),
}

class _GrokArgsError(VrlError):
    """Invalid static function arguments — surfaces as
    parse_grok_rules' "invalid arguments for the function '{name}'"
    without the grok-expression wrapper."""


def _date_format_tokens(fmt: str) -> list:
    """Joda format → [('tok', 'yyyy') | ('lit', text)] — letter runs
    like matchers/date.rs' peeking_take_while, 'quoted' literals."""
    out, i, n = [], 0, len(fmt)
    while i < n:
        c = fmt[i]
        if c.isalpha():
            j = i
            while j < n and fmt[j] == c:
                j += 1
            out.append(("tok", fmt[i:j]))
            i = j
        elif c == "'":
            j = fmt.find("'", i + 1)
            j = n if j < 0 else j
            out.append(("lit", fmt[i + 1: j]))
            i = j + 1
        else:
            out.append(("lit", c))
            i += 1
    return out


def _date_regex(fmt: str, captures: bool = False) -> str:
    """matchers/date.rs time_format_to_regex — the exact fragment per
    token; with captures=True, named groups for value extraction."""
    out: list = []

    def grp(name: str, rx: str) -> str:
        return f"(?P<{name}>{rx})" if captures else f"(?:{rx})"

    for kind, tok in _date_format_tokens(fmt):
        if kind == "lit":
            out.append(_stdre.escape(tok))
            continue
        c, ln = tok[0], len(tok)
        if c == "h":
            out.append(grp("h12", rf"\d{{{ln}}}"))
        elif c == "H":
            out.append(grp("h24", rf"\d{{{ln}}}"))
        elif c == "m":
            out.append(grp("mi", rf"\d{{{ln}}}"))
        elif c == "s":
            out.append(grp("se", rf"\d{{{ln}}}"))
        elif c in "YxcCeDw":
            out.append(rf"\d{{{ln}}}")
        elif c == "d":
            out.append(grp("dy", r"\d{1,2}" if ln == 1 else rf"\d{{{ln}}}"))
        elif c == "y":
            out.append(grp("yr", r"\d{4}" if ln == 1 else rf"\d{{{ln}}}"))
        elif c == "S":
            # the PRECEDING literal is the fraction separator
            if out:
                out.pop()
            out.append(r"[.,]" + grp("fr", rf"\d{{{ln}}}"))
        elif c == "M":
            if ln == 1:
                out.append(grp("mo", r"\d{1,2}"))
            elif ln == 2:
                out.append(grp("mo", r"\d{2}"))
            elif ln == 3:
                out.append(grp("moa", r"\w{3}"))
            else:
                out.append(grp("moa", r"\w+"))
        elif c == "a":
            out.append(grp("ap", r"[aA][mM]|[pP][mM]"))
        elif c == "E":
            out.append(r"\w{3}" if ln == 3 else r"\w+")
        elif c == "z":
            out.append(grp("tz", r"\w+(?:/\w+)?"))
        elif c == "Z":
            if ln <= 2:
                out.append(grp("off", r"Z|[+-]\d\d:?\d\d"))
            else:
                out.append(grp("tz", r"\w+(?:/\w+)?"))
        else:
            raise _GrokArgsError(
                "invalid arguments for the function 'date'")
    return "".join(out)


def _parse_dd_timezone(tz: str) -> int:
    """parse_timezone (matchers/date.rs:106-137) → offset SECONDS.
    Named zones use their offset AT NOW (the reference calls
    Utc::now().with_timezone(tz).offset().fix())."""
    if tz in ("GMT", "UTC", "UT", "Z"):
        return 0
    s = tz
    if not s.startswith(("+", "-")):
        if "+" in s:
            s = s[s.index("+"):]
        elif "-" in s:
            s = s[s.index("-"):]
        else:
            from datetime import datetime, timezone
            from zoneinfo import ZoneInfo
            try:
                z = ZoneInfo(tz)
            except Exception as e:
                raise _GrokArgsError(
                    "invalid arguments for the function 'date'") from e
            return int(datetime.now(timezone.utc).astimezone(z)
                       .utcoffset().total_seconds())
    try:
        if len(s) <= 3:  # +5, -12
            return int(s) * 3600
        body = s[1:].replace(":", "")
        hh, mm = int(body[:2]), int(body[2:4])
        return (1 if s[0] == "+" else -1) * (hh * 3600 + mm * 60)
    except ValueError as e:
        raise _GrokArgsError(
            "invalid arguments for the function 'date'") from e


_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun",
     "jul", "aug", "sep", "oct", "nov", "dec"])}


def _apply_date(text: str, fmt: str, target_tz) -> Optional[int]:
    """apply_date_filter (matchers/date.rs:257-366): joda-parse the
    matched text and return epoch MILLISECONDS. Missing day → current
    month+day; missing year → current year (adjust_strp_format_and_
    value); a 'Z' suffix means +0000; z-captured zones localize
    DST-aware at the parsed instant; the target-tz argument applies a
    FIXED offset to naive stamps."""
    from datetime import datetime, timedelta, timezone

    rx = _regex.compile(r"\A" + _date_regex(fmt, captures=True) + r"\Z")
    m = rx.match(text.strip())
    if m is None:
        return None
    g = m.groupdict()
    now = datetime.now(timezone.utc)
    if g.get("yr") is not None:
        yr = int(g["yr"])
        if len(g["yr"]) == 2:  # chrono %y pivot
            yr += 2000 if yr <= 68 else 1900
    else:
        yr = now.year
    if g.get("dy") is not None:
        day = int(g["dy"])
        mo = int(g["mo"]) if g.get("mo") is not None else \
            _MONTHS.get(g["moa"][:3].lower(), now.month) \
            if g.get("moa") is not None else now.month
    else:
        mo, day = now.month, now.day
    if g.get("h24") is not None:
        hour = int(g["h24"])
    elif g.get("h12") is not None:
        hour = int(g["h12"]) % 12
        if g.get("ap") and g["ap"].lower() == "pm":
            hour += 12
    else:
        hour = 0
    mi = int(g["mi"]) if g.get("mi") is not None else 0
    se = int(g["se"]) if g.get("se") is not None else 0
    ms = int(g["fr"][:3].ljust(3, "0")) if g.get("fr") else 0
    try:
        naive = datetime(yr, mo, day, hour, mi, se, ms * 1000)
    except ValueError:
        return None
    if g.get("off") is not None:
        off = g["off"]
        if off == "Z":
            osec = 0
        else:
            body = off[1:].replace(":", "")
            osec = (1 if off[0] == "+" else -1) * \
                (int(body[:2]) * 3600 + int(body[2:4]) * 60)
        dt = naive.replace(tzinfo=timezone(timedelta(seconds=osec)))
    elif g.get("tz") is not None:
        from zoneinfo import ZoneInfo
        try:
            dt = naive.replace(tzinfo=ZoneInfo(g["tz"]))
        except Exception:
            return None
    elif target_tz:
        osec = _parse_dd_timezone(str(target_tz))
        dt = naive.replace(tzinfo=timezone(timedelta(seconds=osec)))
    else:
        dt = naive.replace(tzinfo=timezone.utc)
    return (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) \
        // timedelta(milliseconds=1)


def _split_spec(spec: str) -> list[str]:
    """Split `matcher:dest:filter` on ':' outside parens/quotes."""
    parts, cur, depth, q, esc = [], [], 0, None, False
    for c in spec:
        if q:
            cur.append(c)
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == q:
                q = None
            continue
        if c in "\"'":
            q = c
            cur.append(c)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == ":" and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(c)
    parts.append("".join(cur))
    return parts


def _unescape_grok_str(s: str) -> str:
    """datadog/grok/lexer.rs:255-288 unescape_string_literal: the
    three-byte forms \\\\n \\\\r \\\\t first, then \\' \\" \\\\;
    anything else is an invalid escape."""
    out = []
    i, n = 0, len(s)
    while i < n:
        j = s.find("\\", i)
        if j < 0:
            out.append(s[i:])
            break
        out.append(s[i:j])
        if s[j + 1: j + 3] in ("\\n", "\\r", "\\t"):
            out.append({"n": "\n", "r": "\r", "t": "\t"}[s[j + 2]])
            i = j + 3
            continue
        nxt = s[j + 1: j + 2]
        if nxt in ("'", '"', "\\"):
            out.append(nxt)
            i = j + 2
            continue
        raise VrlError(f"invalid escape literal '{s[j:]}'")
    return "".join(out)


class _RawTok(str):
    """An UNQUOTED filter argument (an identifier or nested filter
    call like `integer` / `scale(10)`) — the array filter needs to
    tell these apart from quoted delimiter/bracket strings."""


def _parse_call(s: str) -> tuple[str, list]:
    """`name("a", 2)` → (name, [args]); bare name → (name, [])."""
    m = _stdre.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\((.*)\))?\s*$", s,
                     _stdre.S)
    if not m:
        return s.strip(), []
    name = m.group(1)
    if m.group(2) is None:
        return name, []
    raw = m.group(3).strip()
    args: list = []
    if raw:
        for am in _stdre.finditer(
                r'\s*"((?:[^"\\]|\\.)*)"\s*|\s*\'((?:[^\'\\]|\\.)*)\'\s*'
                r'|([^,]+)', raw):
            if am.group(1) is not None or am.group(2) is not None:
                q = am.group(1) if am.group(1) is not None else am.group(2)
                args.append(_unescape_grok_str(q))
            else:
                tok = am.group(3).strip()
                try:
                    args.append(int(tok))
                except ValueError:
                    try:
                        args.append(float(tok))
                    except ValueError:
                        args.append(_RawTok(tok))
    return name, args


def _int_fold(f: float):
    """grok_filter.rs:155-160/191-196: a float whose i64 round-trip is
    exact becomes an Integer (Number/NumberExt/Scale results)."""
    if -(2**63) <= f < 2**63 and float(int(f)) == f:
        return int(f)
    return f


def _rust_f64(s: str) -> float:
    """Rust f64 FromStr: no surrounding whitespace or underscores."""
    s = str(s)
    if s != s.strip() or "_" in s:
        raise ValueError(s)
    f = float(s)
    return 0.0 if f != f else f  # from_f64_or_zero: NaN → 0.0


def _array_filter(s: str, args: list):
    """datadog/grok/filters/array.rs: argument shapes are
    (delimiter) | (filter) | (brackets, delimiter) |
    (delimiter, filter) | (brackets, delimiter, filter); default
    brackets "[]", default delimiter ",". Elements split exactly like
    nom's separated_list0(tag(d), alt((take_until(d),
    take_until(close)))) — NO trimming, and a close-bracket char may
    appear inside non-final elements. Any element failing the inner
    filter drops the whole field (parse_grok.rs internal error)."""
    quoted = [a for a in args if isinstance(a, str)
              and not isinstance(a, _RawTok)]
    inner = next((a for a in args if isinstance(a, _RawTok)), None)
    brackets = delim = None
    if len(quoted) == 2:
        brackets, delim = quoted
    elif len(quoted) == 1:
        delim = quoted[0]
    if brackets is None:
        b0, b1 = "[", "]"
    elif brackets == "":
        b0 = b1 = ""
    elif len(brackets) == 1:
        b0 = b1 = brackets
    elif len(brackets) == 2:
        b0, b1 = brackets[0], brackets[1]
    else:
        return None
    d = delim if delim else ","

    if b0:
        if not s.startswith(b0):
            return None
        body = s[len(b0):]
    else:
        body = s
    items = []
    i = 0
    while True:
        nd = body.find(d, i)
        if nd != -1:  # take_until(delimiter) wins whenever d is ahead
            items.append(body[i:nd])
            i = nd + len(d)
            continue
        if b1:
            nb = body.find(b1, i)
            if nb == -1:
                return None
            items.append(body[i:nb])
            rest = body[nb + len(b1):]
            if rest.strip():
                return None
        else:
            items.append(body[i:])
        break

    if inner is not None:
        fname, fargs = _parse_call(inner)
        out = []
        for el in items:
            v = _apply_filter(el, fname, fargs)
            if v is None:
                return None  # inner-filter failure drops the field
            out.append(v)
        return out
    return items


_KV_DEFAULT_QUOTES = [('"', '"'), ("'", "'"), ("<", ">")]
_KV_NUM = _stdre.compile(
    r"[+-]?(?:\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)")


def _kv_value(raw: str, quotes):
    """keyvalue.rs parse_value: null/boolean are PREFIX tags (nom tag
    without eof), numbers need a full match (terminated(double, eof))
    with the invalid-octal rule, quoted values stay strings."""
    if raw.startswith("null"):
        return None
    if raw.startswith("true"):
        return True
    if raw.startswith("false"):
        return False
    if _KV_NUM.fullmatch(raw):
        f = float(raw)
        if -(2**63) <= f < 2**63 and float(int(f)) == f:
            if not (raw.startswith("0")
                    and ("8" in raw or "9" in raw)):
                return int(f)
            # valid-octal-shaped but with 8/9 digits → string
        else:
            return f
    for left, right in quotes:
        if raw.startswith(left):
            end = raw.find(right, 1)
            if end > 0:  # rest after the close quote is ignored
                return raw[1:end].strip()
    return raw.strip()


def _kv_unquote(key: str, quotes) -> str:
    for left, right in quotes:
        if key.startswith(left):
            end = key.find(right, 1)
            if end > 0:
                return key[1:end]
    return key


def _keyvalue_filter(value, args: list):
    """datadog/grok/filters/keyvalue.rs: an oniguruma scan
    `(?<=[fd0]|^)(quoted|[charset]+)<delim>(quoted|[charset]+)(?:[fd1]|$)`
    over the whole input; args = (kv_delimiter, extra value chars,
    quote pair, field delimiters). null/empty values and keys with
    spaces drop; repeated keys accumulate into arrays."""
    if not isinstance(value, str):
        return None
    kv_delim = str(args[0]) if len(args) >= 1 else "="
    value_re = r"\w.\-_@" + (str(args[1]) if len(args) >= 2 else "")
    quotes = _KV_DEFAULT_QUOTES
    if len(args) >= 3:
        q = str(args[2])
        if len(q) == 2:
            quotes = [(q[0], q[1])]
        elif q != "":
            return None
    fd = (r"\s,;(\[{", r"\s,;)\]}")
    if len(args) >= 4:
        d = str(args[3])
        if len(d) == 1:
            fd = (d, d)
        elif len(d) == 2:
            fd = (d[0], d[1])
        else:
            return None
    quoting = ("(" + "".join(f"{l}[^{l}]+{r}|" for l, r in quotes)
               + "[" + value_re + "]+)")
    try:
        rx = _regex.compile(f"(?<=[{fd[0]}]|^)" + quoting + kv_delim
                            + quoting + f"(?:[{fd[1]}]|$)")
    except _regex.error:
        return None
    out: dict = {}
    for m in rx.finditer(value):
        key = _kv_unquote(m.group(1).strip(), quotes)
        if " " in key or not key:
            continue
        v = _kv_value(m.group(2).strip().rstrip(","), quotes)
        if v is None or v == "":
            continue
        if key in out:
            if isinstance(out[key], list):
                out[key].append(v)
            else:
                out[key] = [out[key], v]
        else:
            out[key] = v
    return out


def _parse_keys_as_path(v):
    """parse_grok.rs:137-151: object keys parse as value paths
    (dotted keys nest; a key that isn't a valid path stays one
    segment), recursively through objects and arrays."""
    if isinstance(v, list):
        return [_parse_keys_as_path(x) for x in v]
    if not isinstance(v, dict):
        return v
    out: dict = {}
    for k, x in v.items():
        segs = k.split(".") if "." in k and all(k.split(".")) \
            and '"' not in k else [k]
        cur = out
        for s in segs[:-1]:
            nxt = cur.get(s)
            if not isinstance(nxt, dict):
                nxt = cur[s] = {}
            cur = nxt
        cur[segs[-1]] = _parse_keys_as_path(x)
    return out


_KNOWN_FILTERS = frozenset({
    "integer", "integerExt", "number", "numberExt", "boolean", "scale",
    "lowercase", "uppercase", "nullIf", "json", "rubyhash",
    "querystring", "decodeuricomponent", "xml", "array", "keyvalue",
    "date",
})


def _validate_filter(name: str, args: list) -> None:
    """Static filter checks at rule-compile time (grok_filter.rs
    TryFrom + parse_grok_rules error taxonomy)."""
    if name not in _KNOWN_FILTERS:
        raise _GrokArgsError(f"unknown filter '{name}'")
    if name == "scale" and (len(args) != 1
                            or isinstance(args[0], (str, bool))):
        raise _GrokArgsError("invalid arguments for the function 'scale'")
    if name == "nullIf" and (len(args) != 1
                             or not isinstance(args[0], str)):
        raise _GrokArgsError("invalid arguments for the function 'nullIf'")


def _apply_filter(value, name: str, args: list):
    if value is None:
        return None
    if name == "integer":
        # grok_filter.rs:122-133 — strict i64 FromStr ("1.5" FAILS)
        try:
            s = str(value)
            if s != s.strip() or "_" in s:
                return None
            return int(s)
        except (TypeError, ValueError):
            return None
    if name == "integerExt":
        # grok_filter.rs:136-145 — f64 parse, `as i64` cast
        try:
            f = _rust_f64(value)
        except (TypeError, ValueError):
            return None
        if f >= 2**63:
            return 2**63 - 1
        if f < -(2**63):
            return -(2**63)
        return int(f)
    if name in ("number", "numberExt"):
        try:
            return _int_fold(_rust_f64(value))
        except (TypeError, ValueError):
            return None
    if name == "boolean":
        return str(value).lower() == "true"
    if name == "scale":
        try:
            return _int_fold(float(value) * float(args[0]))
        except (TypeError, ValueError, IndexError):
            return None
    if name == "lowercase":
        return str(value).lower()
    if name == "uppercase":
        return str(value).upper()
    if name == "nullIf":
        return None if args and str(value) == str(args[0]) else value
    if name == "json":
        try:
            return _json.loads(value)
        except ValueError:
            return None
    if name == "querystring":
        # grok_filter.rs:207 — parse_query_string(s, true): empty
        # values dropped, repeated keys accumulate into arrays
        from .parse import parse_query_string
        return parse_query_string(str(value), _ignore_empty_values=True)
    if name == "decodeuricomponent":
        return unquote(str(value))
    if name == "array":
        return _array_filter(str(value), args)
    if name == "keyvalue":
        return _keyvalue_filter(value, args)
    if name == "rubyhash":
        # grok_filter.rs:203-205
        from .parse_data import parse_ruby_hash
        try:
            return parse_ruby_hash(str(value))
        except VrlError:
            return None
    if name == "xml":
        # grok_filter.rs:215-224: attr_prefix "", numbers/bools stay
        # strings
        from .parse_data import parse_xml
        try:
            return parse_xml(str(value), attr_prefix="",
                             parse_number=False, parse_bool=False)
        except VrlError:
            return None
    if name == "date":
        # matchers/date.rs apply_date_filter → epoch milliseconds
        return _apply_date(str(value), str(args[0]) if args else "",
                           args[1] if len(args) > 1 else None)
    raise VrlError(f"unsupported grok filter: {name}")


def _dest_segs(dest: str) -> list:
    """Destination path segments: dots split, `["quoted name"]`
    brackets hold one literal segment (lookup path grammar)."""
    segs, cur, i, n = [], [], 0, len(dest)
    while i < n:
        c = dest[i]
        if c == ".":
            if cur:
                segs.append("".join(cur))
                cur = []
            i += 1
            continue
        if c == "[":
            bm = _stdre.match(r'\["((?:[^"\\]|\\.)*)"\]', dest[i:])
            if bm:
                if cur:
                    segs.append("".join(cur))
                    cur = []
                segs.append(bm.group(1).replace('\\"', '"'))
                i += bm.end()
                continue
        cur.append(c)
        i += 1
    if cur:
        segs.append("".join(cur))
    return segs or [dest]


def _drop_empty(v) -> None:
    """parse_grok.rs:154-166 postprocess: recursively remove empty
    objects and nulls from object values."""
    if isinstance(v, list):
        for x in v:
            _drop_empty(x)
    elif isinstance(v, dict):
        for x in v.values():
            _drop_empty(x)
        for k in [k for k, x in v.items()
                  if x is None or (isinstance(x, dict) and not x)]:
            del v[k]


class _CompiledGroks:
    """One rule set: patterns expanded to anchored regexes."""

    def __init__(self, patterns: list[str], aliases: dict[str, str]):
        self.rules = []
        for p in patterns:
            comp = _DdPattern(p, aliases)
            self.rules.append(comp)

    def parse(self, value: str) -> dict:
        for rule in self.rules:
            out = rule.match(value)
            if out is not None:
                return out
        # datadog/grok/parse_grok.rs:12 wrapped by parse_groks.rs
        raise VrlError("unable to parse grok: value does not match any rule")


class _DdPattern:
    def __init__(self, pattern: str, aliases: dict[str, str]):
        self.aliases = aliases
        self._fields: dict[str, tuple[str, list]] = {}  # group → (dest, filters)
        self._n = 0
        try:
            expanded = self._expand(pattern, ())
        except _GrokArgsError:
            raise  # "invalid arguments for the function .." unwrapped
        except VrlError as e:
            # parse_grok_rules.rs:88 — the expression shown is the
            # (?m)\A..\z-anchored wrapping the reference compiles
            raise VrlError("failed to parse grok expression "
                           f"'(?m)\\A{pattern}\\z': {e}") from e
        try:
            # parse_grok_rules wraps rules as onig `(?m)\A..\z` —
            # onig's (?m) is DOTALL (Ruby semantics), and there is NO
            # whitespace trimming around the rule
            self.regex = _regex.compile(r"\A" + expanded + r"\Z",
                                        _regex.DOTALL)
        except _regex.error as e:
            raise VrlError(f"invalid grok pattern {pattern!r}: {e}") from e

    # quoted args may contain ESCAPED quotes (lexer.rs:19 onig:
    # (?<!\\)"(?:\\"|[^"])*(?<!\\)")
    _REF = _regex.compile(
        r"%\{((?:[^{}\"']|\"(?:\\.|[^\"\\])*\"|'(?:\\.|[^'\\])*')+)\}")

    def _expand(self, pat: str, stack: tuple,
                legacy: bool = False) -> str:
        if len(stack) > _MAX_DEPTH:
            raise VrlError("Cyclic dependency found in the alias")

        # raw onig named groups `(?<name>..)` written directly in the
        # template are fields whose names are LITERAL keys, never
        # lookup paths (parse_grok.rs extracts_field_with_regex_
        # capture); rename to safe generated group names BEFORE %{}
        # expansion so they can't collide with ours
        def raw_group(gm):
            self._n += 1
            group = f"g{self._n}"
            self._fields[group] = ((gm.group(1),), [])
            return f"(?P<{group}>"

        pat = _regex.sub(r"\(\?P?<([^>=!][^>]*)>", raw_group, pat)

        def repl(m):
            spec = m.group(1)
            if legacy:
                # legacy grok-crate semantics inside the baked pattern
                # library (grok.rs GROK_PATTERN): the ALIAS is
                # everything after the first ':' — a LITERAL field
                # name (types like `:int` ride along) — and there are
                # no datadog filters
                head, _, alias = spec.partition(":")
                name = head.strip()
                if name in stack:
                    raise VrlError(
                        f"Cyclic dependency found in the alias {name!r}")
                body = DD_PATTERNS.get(name)
                if body is None:
                    raise VrlError(
                        f'The given pattern definition name "{name}" '
                        "could not be found in the definition map")
                inner = self._expand(body, stack + (name,), legacy=True)
                if alias.strip():
                    self._n += 1
                    group = f"g{self._n}"
                    self._fields[group] = ((alias.strip(),), [])
                    return f"(?P<{group}>{inner})"
                return f"(?:{inner})"
            parts = _split_spec(spec)
            head = parts[0].strip()
            dest = parts[1].strip() if len(parts) > 1 and parts[1].strip() else None
            filters = [_parse_call(p) for p in parts[2:]]
            for fname, fargs in filters:
                _validate_filter(fname, fargs)

            name, args = _parse_call(head)
            if name in stack:
                raise VrlError(
                    f"Cyclic dependency found in the alias {name!r}")

            if name in self.aliases and not args:
                inner = self._expand(self.aliases[name], stack + (name,))
            elif name == "regex" and args:
                if not isinstance(args[0], str) \
                        or isinstance(args[0], _RawTok):
                    raise _GrokArgsError(
                        "invalid arguments for the function 'regex'")
                inner = str(args[0])
            elif name == "date" and args:
                inner = _date_regex(str(args[0]))
                if len(args) > 1:  # compile-time timezone validation
                    _parse_dd_timezone(str(args[1]))
                filters = [("date", args)] + filters
            elif name in _DD_MATCHERS:
                rx, implicit = _DD_MATCHERS[name]
                inner = self._expand(rx, stack + (name,)) if "%{" in rx else rx
                if implicit:
                    filters = [(implicit, [])] + filters
            elif name in DD_PATTERNS and not args:
                # the baked pattern library (src/datadog/grok/
                # patterns/*.pattern via Grok::with_patterns) — its
                # bodies expand with legacy grok-crate semantics
                inner = self._expand(DD_PATTERNS[name], stack + (name,),
                                     legacy=True)
            elif name in BASE_PATTERNS:
                inner = self._expand(BASE_PATTERNS[name], stack + (name,))
            else:
                # the grok crate's Error::DefinitionNotFound Display
                raise VrlError(
                    f'The given pattern definition name "{name}" could '
                    "not be found in the definition map")

            if dest or filters:
                # dest None + filters = `%{data::keyvalue}` — the
                # object result merges into the ROOT (parse_grok.rs
                # field.is_root())
                self._n += 1
                group = f"g{self._n}"
                self._fields[group] = (dest, filters)
                return f"(?P<{group}>{inner})"
            return f"(?:{inner})"

        return self._REF.sub(repl, pat)

    def match(self, value: str) -> Optional[dict]:
        m = self.regex.match(value)
        if m is None:
            return None
        out: dict[str, Any] = {}
        for group, (dest, filters) in self._fields.items():
            v: Any = m.group(group)
            if v is None:
                continue
            dropped = False
            for fname, fargs in filters:
                v = _apply_filter(v, fname, fargs)
                if v is None:
                    # parse_grok.rs:80 — a filter yielding Null DROPS
                    # the field (nullIf sentinel hits)
                    dropped = True
                    break
            if dropped:
                continue
            # object results nest their dotted keys
            # (parse_grok.rs:81 parse_keys_as_path)
            if isinstance(v, (dict, list)):
                v = _parse_keys_as_path(v)
            if dest is None:
                # root destination: object results MERGE into the
                # event (parse_grok.rs:93-96)
                if isinstance(v, dict):
                    out.update(v)
                continue
            # dotted destinations create nested objects; raw-group
            # fields carry pre-split literal segments
            segs = list(dest) if isinstance(dest, tuple) \
                else _dest_segs(dest)
            cur = out
            for s in segs[:-1]:
                cur = cur.setdefault(s, {})
            # a dest written more than once accumulates into an array
            # (parse_grok.rs:102-109, appends_to_the_same_field)
            last = segs[-1]
            if last in cur:
                if isinstance(cur[last], list):
                    cur[last].append(v)
                else:
                    cur[last] = [cur[last], v]
            else:
                cur[last] = v
        _drop_empty(out)
        return out


_RULE_CACHE: dict = {}


def compile_groks(patterns: list[str], aliases: Optional[dict] = None,
                  alias_sources: Optional[list] = None) -> _CompiledGroks:
    merged: dict[str, str] = {}
    for src in alias_sources or []:
        with open(resolve_data_path(src), encoding="utf-8") as f:
            merged.update(_json.load(f))
    for k, v in (aliases or {}).items():
        if not isinstance(v, str):
            # parse_groks.rs: alias values resolve via try_bytes —
            # a non-string value is the generic "invalid argument"
            raise VrlError("invalid argument")
        merged[k] = v
    key = (tuple(patterns), tuple(sorted(merged.items())))
    rules = _RULE_CACHE.get(key)
    if rules is None:
        rules = _CompiledGroks(patterns, merged)
        _RULE_CACHE[key] = rules
    return rules


def parse_groks(value: str, patterns: list, aliases: Optional[dict] = None,
                alias_sources: Optional[list] = None) -> dict:
    if isinstance(patterns, str):
        patterns = [patterns]
    rules = compile_groks(list(patterns), aliases, alias_sources)
    return rules.parse(value)
