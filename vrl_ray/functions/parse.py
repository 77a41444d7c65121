"""Parse-category stdlib functions (row-level semantics).

Each function mirrors the reference implementation's observable
behavior (citations per function into /root/reference/src/stdlib/).
All fallible functions raise :class:`vrl_ray.value.VrlError` on bad
input — the engine's error lane catches these per row.

Vectorized counterparts for the pipeline hot path live in
``vrl_ray.functions.vectorized``.
"""

from __future__ import annotations

import csv as _csv
import io
import json as _json
import math
import re as _re
from datetime import datetime, timezone, timedelta
from typing import Any, Optional
from urllib.parse import urlsplit, parse_qsl, unquote

import regex as _regex

from ..value import VrlError
from ..grok import GrokPattern

__all__ = [
    "parse_json", "parse_key_value", "parse_logfmt", "parse_regex",
    "parse_regex_all", "parse_grok", "parse_timestamp", "parse_csv",
    "parse_tokens", "parse_url", "parse_query_string", "parse_duration",
    "parse_bytes", "parse_int", "parse_float", "parse_common_log",
    "parse_glog", "parse_syslog", "parse_user_agent",
]


# ---------------------------------------------------------------------------
# parse_json (parse_json.rs:1-120): optional max_depth 1..=128

def _json_int(s: str):
    """serde_json number widths (value/serde.rs:96-119): i64 range
    stays integer; anything wider becomes a LOSSY f64 (Python's
    bigints would silently diverge)."""
    v = int(s)
    if -9223372036854775808 <= v <= 9223372036854775807:
        return v
    return float(s)


#: any 19+-digit run MIGHT overflow i64 — only then pay the Python
#: parse_int callback (it knocks json.loads off its all-C fast path)
_BIG_INT_RE = _re.compile(r"\d{19}")


def parse_json(value: str, max_depth: Optional[int] = None,
               lossy: bool = True) -> Any:
    if isinstance(value, bytes):
        # parse_json.rs:38-42: lossy (default) replaces invalid UTF-8;
        # strict mode errors like serde's from_slice
        if lossy:
            value = value.decode("utf-8", "replace")
        else:
            try:
                value = value.decode("utf-8")
            except UnicodeDecodeError as e:
                line = value.count(b"\n", 0, e.start) + 1
                ls = value.rfind(b"\n", 0, e.start) + 1
                raise VrlError(
                    "unable to parse json: invalid unicode code point "
                    f"at line {line} column {e.end - ls + 1}") from e
    if isinstance(value, str) and value.startswith("\ufeff"):
        value = value[1:]  # serde strip_bom (both modes)
    if max_depth is not None and not (1 <= max_depth <= 128):
        raise VrlError(f"max_depth value should be greater than 0 and less than 128, got {max_depth}")
    if max_depth is not None:
        # depth-limited mode reads the doc as &RawValue first
        # (parse_json.rs:57-61): malformed input errors as "unable to
        # read json"; subtrees at the limit keep their RAW ORIGINAL
        # text (original spaces and all), never a re-serialization
        try:
            _json.loads(value)
        except (ValueError, TypeError) as e:
            raise VrlError(f"unable to read json: {_serde_msg(e)}") from e
        v, _ = _parse_depth_value(value, _json_ws(value, 0), max_depth)
        return v
    try:
        if isinstance(value, str) and _BIG_INT_RE.search(value):
            return _json.loads(value, parse_int=_json_int)
        return _json.loads(value)
    except (ValueError, TypeError) as e:
        raise VrlError(f"unable to parse json: {_serde_msg(e)}") from e


#: Python json decoder message → serde_json phrasing (the reference's
#: runtime error text, pinned by the diagnostics corpus's
#: program_aborted_internal_function_call_error.vrl)
_SERDE_MSGS = {
    "Expecting property name enclosed in double quotes":
        "key must be a string",
    "Expecting value": "expected value",
    "Extra data": "trailing characters",
    "Expecting ',' delimiter": "expected `,` or `}`",
    "Expecting ':' delimiter": "expected `:`",
}


def _serde_msg(e) -> str:
    if isinstance(e, _json.JSONDecodeError):
        if e.msg.startswith("Unterminated string starting at"):
            # serde reports EOF errors at the END of the doc, 1-based
            # on the last line (parse_json.rs test: column 16 for the
            # 16-byte doc `{"field": "value`)
            lines = e.doc.split("\n")
            return (f"EOF while parsing a string at line {len(lines)} "
                    f"column {len(lines[-1])}")
        if e.msg == "Expecting value" and e.pos >= len(e.doc.rstrip()):
            lines = e.doc.split("\n")
            return (f"EOF while parsing a value at line {len(lines)} "
                    f"column {len(lines[-1])}")
        mapped = _SERDE_MSGS.get(e.msg)
        if mapped:
            return f"{mapped} at line {e.lineno} column {e.colno}"
    return str(e)


_JSON_WS = " \t\n\r"


def _json_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in _JSON_WS:
        i += 1
    return i


def _skip_raw_json(s: str, i: int) -> int:
    """End index (exclusive) of the container starting at s[i] —
    the &RawValue slice serde hands back at the depth limit."""
    depth = 0
    in_str = False
    n = len(s)
    while i < n:
        c = s[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "{[":
            depth += 1
        elif c in "}]":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return n


def _parse_depth_value(s: str, i: int, depth: int):
    """parse_json.rs parse_layer: containers at remaining_depth 0
    become their raw text slice; scalars always parse (with serde
    number widths). Input is pre-validated JSON."""
    c = s[i]
    if c in "{[":
        if depth <= 0:
            j = _skip_raw_json(s, i)
            return s[i:j], j
        if c == "{":
            out: dict = {}
            i = _json_ws(s, i + 1)
            if s[i] == "}":
                return out, i + 1
            while True:
                key, i = _json_scanstring(s, i + 1)
                i = _json_ws(s, i)
                i = _json_ws(s, i + 1)          # past ':'
                v, i = _parse_depth_value(s, i, depth - 1)
                out[key] = v
                i = _json_ws(s, i)
                if s[i] == ",":
                    i = _json_ws(s, i + 1)
                    continue
                return out, i + 1               # past '}'
        out_l: list = []
        i = _json_ws(s, i + 1)
        if s[i] == "]":
            return out_l, i + 1
        while True:
            v, i = _parse_depth_value(s, i, depth - 1)
            out_l.append(v)
            i = _json_ws(s, i)
            if s[i] == ",":
                i = _json_ws(s, i + 1)
                continue
            return out_l, i + 1                 # past ']'
    return _JSON_SCALAR_DECODER.raw_decode(s, i)


_json_scanstring = _json.decoder.scanstring
_JSON_SCALAR_DECODER = _json.JSONDecoder(parse_int=_json_int)


# ---------------------------------------------------------------------------
# parse_key_value / parse_logfmt (parse_key_value.rs, parse_logfmt.rs)

def parse_key_value(
    value: str,
    key_value_delimiter: str = "=",
    field_delimiter: str = " ",
    whitespace: str = "lenient",
    accept_standalone_key: bool = True,
) -> dict:
    """Key-value / logfmt parser (parse_key_value.rs:38-60 defaults).

    - quoted keys/values with ``"``, escapes with ``\\``
    - lenient whitespace around the kv delimiter by default
    - standalone keys -> true (accept_standalone_key)
    - duplicate keys group into an array (parse_key_value.rs:72-95);
      a later bare-key `true` never overwrites a real value
    """
    if whitespace not in ("lenient", "strict"):
        raise VrlError(f"invalid whitespace value: {whitespace}")
    pairs = _kv_pairs(value, key_value_delimiter, field_delimiter,
                      whitespace == "lenient", accept_standalone_key)
    out: dict = {}
    for k, v in pairs:
        if k not in out:
            out[k] = v
        else:
            if v is True:
                continue  # standalone dup of existing key: no-op
            existing = out[k]
            if existing is True:
                out[k] = v
            elif isinstance(existing, list):
                existing.append(v)
            else:
                out[k] = [existing, v]
    return out


def _kv_pairs(s, kv_delim, field_delim, lenient, standalone):
    pairs = []
    i, n = 0, len(s)

    def read_quoted(j):
        # j at opening quote
        buf = []
        j += 1
        while j < n:
            c = s[j]
            if c == "\\" and j + 1 < n:
                buf.append(s[j + 1]); j += 2; continue
            if c == '"':
                return "".join(buf), j + 1
            buf.append(c); j += 1
        return "".join(buf), j  # unterminated: take rest

    def skip_field_delim(j):
        while j < n and s.startswith(field_delim, j):
            j += len(field_delim)
        # lenient: also skip stray whitespace between fields
        while lenient and j < n and s[j].isspace():
            j += 1
        return j

    i = skip_field_delim(0)
    while i < n:
        # --- key ---
        if s[i] == '"':
            key, i = read_quoted(i)
        else:
            j = i
            while j < n and not s.startswith(kv_delim, j) and not s.startswith(field_delim, j):
                j += 1
            key = s[i:j]
            i = j
            if lenient:
                key = key.strip()
        # lenient whitespace before delimiter
        if lenient:
            while i < n and s[i].isspace() and not s.startswith(field_delim, i):
                i += 1
        if i >= n or not s.startswith(kv_delim, i):
            # standalone key
            if key:
                if not standalone:
                    raise VrlError(f"standalone key not accepted: {key!r}")
                pairs.append((key, True))
            i = skip_field_delim(i)
            continue
        i += len(kv_delim)
        if lenient:
            while i < n and s[i].isspace():
                i += 1
        # --- value ---
        if i < n and s[i] == '"':
            val, i = read_quoted(i)
        else:
            j = i
            while j < n and not s.startswith(field_delim, j):
                j += 1
            val = s[i:j]
            i = j
            if lenient:
                val = val.strip()
        pairs.append((key, val if val != "" else ""))
        i = skip_field_delim(i)
    return pairs


def parse_logfmt(value: str) -> dict:
    """parse_logfmt.rs: parse_key_value with logfmt defaults."""
    return parse_key_value(value)


# ---------------------------------------------------------------------------
# parse_regex / parse_regex_all (parse_regex.rs:8-36, parse_regex_all.rs)

def _regex_captures(m, pattern, numeric_groups):
    out = {}
    if numeric_groups:
        out["0"] = m.group(0)
        for idx in range(1, (pattern.groups if hasattr(pattern, "groups") else m.re.groups) + 1):
            g = m.group(idx)
            if g is not None:
                out[str(idx)] = g
    for name, g in m.groupdict().items():
        if g is not None:
            out[name] = g
    return out


def parse_regex(value: str, pattern, numeric_groups: bool = False) -> dict:
    """Named (+ optionally numbered) capture groups of the FIRST match;
    no match is an error (parse_regex.rs:8-36)."""
    if isinstance(pattern, str):
        pattern = _regex.compile(pattern)
    m = pattern.search(value)
    if m is None:
        raise VrlError("could not find any pattern matches")
    return _regex_captures(m, pattern, numeric_groups)


def parse_regex_all(value: str, pattern, numeric_groups: bool = False) -> list:
    if isinstance(pattern, str):
        pattern = _regex.compile(pattern)
    return [_regex_captures(m, pattern, numeric_groups)
            for m in pattern.finditer(value)]


# ---------------------------------------------------------------------------
# parse_grok (parse_grok.rs:12-25)

_GROK_CACHE: dict[str, GrokPattern] = {}


def parse_grok(value: str, pattern: str) -> dict:
    gp = _GROK_CACHE.get(pattern)
    if gp is None:
        try:
            gp = _GROK_CACHE[pattern] = GrokPattern(pattern)
        except Exception as e:
            # grok-crate compile errors surface with their bare text
            raise VrlError(str(e)) from e
    out = gp.match(value)
    if out is None:
        raise VrlError("unable to parse input with grok pattern")
    return out


# ---------------------------------------------------------------------------
# parse_timestamp (parse_timestamp.rs:94-99)

def _chrono_to_strptime(fmt: str) -> str:
    """Translate chrono strftime tokens Python lacks."""
    out = fmt.replace("%T", "%H:%M:%S").replace("%F", "%Y-%m-%d")
    out = out.replace("%R", "%H:%M").replace("%v", "%d-%b-%Y")
    out = out.replace("%e", "%d")
    out = out.replace("%:z", "%z").replace("%#z", "%z")
    return out


def parse_timestamp(value, format: str, timezone_name: Optional[str] = None) -> datetime:
    """parse_timestamp.rs:94-99 (+ explicit timezone parameter, the
    context timezone of SURVEY §1.4)."""
    if isinstance(value, datetime):
        return value
    if not isinstance(value, str):
        # parse_timestamp.rs:30 — non-string/non-ts inputs name the kind
        from ..value import vrl_type
        raise VrlError(
            f"unable to convert {vrl_type(value)} value to timestamp")
    if "%+" in format:
        try:
            dt = datetime.fromisoformat(str(value).replace("Z", "+00:00"))
        except ValueError as e:
            raise VrlError(f"unable to parse timestamp: {e}") from e
    else:
        fmt = _chrono_to_strptime(format)
        try:
            dt = datetime.strptime(value, fmt)
        except (ValueError, TypeError) as e:
            # chrono is lenient about whitespace before the offset
            try:
                dt = datetime.strptime(value, fmt.replace(" %z", "%z"))
            except (ValueError, TypeError):
                raise VrlError(f"unable to parse timestamp: {e}") from e
    if dt.tzinfo is None:
        if timezone_name is None:
            from .timestamp import get_context_timezone
            timezone_name = get_context_timezone()
        if timezone_name and timezone_name not in ("UTC", "utc"):
            try:
                from zoneinfo import ZoneInfo
                dt = dt.replace(tzinfo=ZoneInfo(timezone_name))
            except Exception as e:
                raise VrlError(f"unable to parse timezone: {timezone_name}") from e
        else:
            dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


# ---------------------------------------------------------------------------
# parse_csv (parse_csv.rs): single record -> array of strings

def parse_csv(value: str, delimiter: str = ",") -> list:
    if len(delimiter) != 1:
        raise VrlError("delimiter must be a single character")
    is_bytes = isinstance(value, bytes)
    if is_bytes:
        # parse_csv.rs:34 works on raw Bytes; fields that aren't valid
        # UTF-8 come back as bytes (surrogateescape round-trips them)
        value = value.decode("utf-8", "surrogateescape")
    try:
        rows = list(_csv.reader(io.StringIO(value), delimiter=delimiter))
    except _csv.Error as e:
        raise VrlError(f"unable to parse csv: {e}") from e
    if not rows:
        return []
    if is_bytes:
        out = []
        for f in rows[0]:
            b = f.encode("utf-8", "surrogateescape")
            try:
                out.append(b.decode("utf-8"))
            except UnicodeDecodeError:
                out.append(b)
        return out
    return rows[0]


# ---------------------------------------------------------------------------
# parse_tokens (parse_tokens.rs + src/core/tokenize.rs):
# whitespace-separated; [] "" groups kept whole; "-" -> null

def parse_tokens(value: str) -> list:
    tokens: list = []
    i, n = 0, len(value)
    while i < n:
        c = value[i]
        if c.isspace():
            i += 1
            continue
        if c == '"':
            j = value.find('"', i + 1)
            while j != -1 and value[j - 1] == "\\":
                j = value.find('"', j + 1)
            if j == -1:
                tokens.append(value[i + 1:]); break
            tokens.append(value[i + 1:j]); i = j + 1
        elif c == "[":
            j = value.find("]", i + 1)
            if j == -1:
                tokens.append(value[i + 1:]); break
            tokens.append(value[i + 1:j]); i = j + 1
        else:
            j = i
            while j < n and not value[j].isspace():
                j += 1
            tok = value[i:j]
            tokens.append(None if tok == "-" else tok)
            i = j
    return tokens


# ---------------------------------------------------------------------------
# parse_url (parse_url.rs)

# --- WHATWG URL parsing (the `url` crate parse_url.rs rides) ---------

_URL_KNOWN_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443,
                    "ftp": 21}
_URL_SPECIAL = set(_URL_KNOWN_PORTS) | {"file"}
# percent-encode sets (WHATWG spec §1.3): controls = <0x20 or >0x7E
_PCT_FRAGMENT = set(' "<>`')
_PCT_PATH = _PCT_FRAGMENT | set("#?{}")
_PCT_USERINFO = _PCT_PATH | set("/:;=@[\\]^|")


def _pct_encode(s: str, extra: set) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if o < 0x20 or o > 0x7E or ch in extra:
            out.append("".join("%%%02X" % b for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def _url_dot_norm(path: str) -> str:
    """WHATWG path state: '.'/'..' segments (incl. %2e spellings,
    case-insensitive) collapse; a trailing dot segment leaves a
    trailing slash."""
    segs = path.split("/")[1:]
    out: list = []
    n = len(segs)
    for i, seg in enumerate(segs):
        t = seg.lower().replace("%2e", ".")
        last = i == n - 1
        if t == "..":
            if out:
                out.pop()
            if last:
                out.append("")
        elif t == ".":
            if last:
                out.append("")
        else:
            out.append(seg)
    return "/" + "/".join(out)


def _ipv4_number(s: str):
    if not s:
        return None
    radix = 10
    if s[:2].lower() == "0x":
        s, radix = s[2:], 16
        if not s:
            return 0
    elif len(s) >= 2 and s[0] == "0":
        s, radix = s[1:], 8
    digits = "0123456789abcdef"[:radix]
    if any(c.lower() not in digits for c in s):
        return None
    return int(s, radix)


def _url_host(raw: str, special: bool) -> str:
    """Host parser: IPv6 in brackets canonicalized, domains
    percent-decoded + IDNA'd + lowercased, number-tailed hosts parsed
    as WHATWG IPv4 (hex/octal forms normalize to dotted decimal)."""
    if raw.startswith("["):
        if not raw.endswith("]"):
            raise VrlError("unable to parse url: invalid IPv6 address")
        import ipaddress
        try:
            return "[" + ipaddress.IPv6Address(raw[1:-1]).compressed + "]"
        except ValueError as e:
            raise VrlError("unable to parse url: invalid IPv6 address") \
                from e
    if not special:
        # opaque host: kept verbatim bar C0/control encoding
        return _pct_encode(raw, set())
    host = unquote(raw)
    if any(c in host for c in "\x00\t\n\r #/:<>?@[\\]^|%"):
        raise VrlError("unable to parse url: invalid domain character")
    if not host.isascii():
        try:
            import idna
            host = idna.encode(host, uts46=True).decode("ascii")
        except Exception:
            try:
                host = host.encode("idna").decode("ascii")
            except Exception as e:
                raise VrlError("unable to parse url: invalid "
                               "international domain name") from e
    host = host.lower()
    # ends-in-a-number check → IPv4 parser
    parts = host.split(".")
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if parts and (parts[-1].isdigit()
                  or (parts[-1][:2] in ("0x", "0X")
                      and all(c in "0123456789abcdefABCDEF"
                              for c in parts[-1][2:]))):
        if len(parts) > 4:
            raise VrlError("unable to parse url: invalid IPv4 address")
        nums = []
        for p in parts:
            v = _ipv4_number(p)
            if v is None:
                raise VrlError("unable to parse url: invalid IPv4 "
                               "address")
            nums.append(v)
        if any(n > 255 for n in nums[:-1]) or \
                nums[-1] >= 256 ** (5 - len(nums)):
            raise VrlError("unable to parse url: invalid IPv4 address")
        ipv4 = nums[-1]
        for i, n in enumerate(nums[:-1]):
            ipv4 += n << (8 * (3 - i))
        return ".".join(str((ipv4 >> (8 * k)) & 0xFF)
                        for k in (3, 2, 1, 0))
    return host


def parse_url(value: str, default_known_ports: bool = False) -> dict:
    """WHATWG parsing as the `url` crate does (parse_url.rs:31-66):
    hosts lowercase/IDNA/IPv4-normalize, default ports elide, paths
    dot-normalize and percent-encode, userinfo/fragment re-serialize
    with their encode sets, query decodes via form_urlencoded
    (last duplicate wins)."""
    # spec preprocessing: strip C0/space at both ends, drop \t\r\n
    v = value.strip("\x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n\x0b"
                    "\x0c\r\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17"
                    "\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f ")
    v = v.replace("\t", "").replace("\n", "").replace("\r", "")
    m = _re.match(r"([A-Za-z][A-Za-z0-9+.-]*):", v)
    if not m:
        raise VrlError("unable to parse url: relative URL without a base")
    scheme = m.group(1).lower()
    rest = v[m.end():]
    special = scheme in _URL_SPECIAL
    try:
        if special:
            # "special authority ignore slashes": any run of / or \
            # after the colon is skipped and an authority always
            # follows; \ acts as / only BEFORE the query/fragment.
            # file: keeps exactly one leading // (empty host allowed,
            # "file:///p" → host "", path "/p").
            if scheme == "file":
                body = rest
                if body[:1] in "/\\":
                    body = body[1:]
                if body[:1] in "/\\":
                    body = body[1:]
            else:
                body = rest.lstrip("/\\")
            pre, qsep, qtail = body.partition("?")
            fpre, fsep, ftail = pre.partition("#")
            body = fpre.replace("\\", "/") + fsep + ftail + qsep + qtail
            parts = urlsplit("//" + body, allow_fragments=True)
        else:
            parts = urlsplit(v, allow_fragments=True)
            parts = parts._replace(scheme=scheme)
    except ValueError as e:
        raise VrlError(f"unable to parse url: {e}") from e
    netloc = parts.netloc
    username = password = ""
    host_s: Optional[str] = None
    port: Optional[int] = None
    if special or rest.startswith("//"):
        userinfo, _, hostport = netloc.rpartition("@")
        if userinfo:
            uname, usep, pword = userinfo.partition(":")
            username = _pct_encode(uname, _PCT_USERINFO)
            password = _pct_encode(pword, _PCT_USERINFO) if usep else ""
        if hostport.startswith("["):
            h, _, p = hostport.partition("]")
            h += "]"
            p = p[1:] if p.startswith(":") else p
        else:
            h, colon, p = hostport.partition(":")
        if p:
            if not p.isdigit() or int(p) > 65535:
                raise VrlError("unable to parse url: invalid port number")
            port = int(p)
        if h == "" and special and scheme != "file":
            raise VrlError("unable to parse url: empty host")
        if h:
            host_s = _url_host(h, special)
        if port is not None and port == _URL_KNOWN_PORTS.get(scheme):
            port = None  # the url crate elides a default port
        has_authority = True
    else:
        has_authority = False
    path = parts.path
    if has_authority or path.startswith("/"):
        if has_authority and not path:
            path = "/"
        if not path.startswith("/"):
            path = "/" + path
        path = _url_dot_norm(_pct_encode(path, _PCT_PATH))
    else:
        path = _pct_encode(path, set())  # opaque path: C0 controls only
    if port is None and default_known_ports:
        port = _URL_KNOWN_PORTS.get(scheme)
    frag = parts.fragment if "#" in v else None
    return {
        "scheme": scheme,
        "username": username,
        "password": password,
        "host": host_s,
        "port": port,
        "path": path,
        "query": dict(parse_qsl(parts.query, keep_blank_values=True)),
        "fragment": _pct_encode(frag, _PCT_FRAGMENT)
        if frag is not None else None,
    }


# ---------------------------------------------------------------------------
# parse_query_string (parse_query_string.rs, src/parsing/query_string.rs):
# duplicate keys -> array

def parse_query_string(value: str, _ignore_empty_values: bool = False) -> dict:
    """parsing/query_string.rs: one leading '?' stripped, pairs via
    url::form_urlencoded. `_ignore_empty_values` is the internal
    `ignore_keys_without_values` flag the datadog grok `querystring`
    filter passes as true (grok_filter.rs:207); the stdlib function
    always passes false."""
    if value.startswith("?"):
        value = value[1:]
    out: dict = {}
    if not value:
        return out
    for part in value.split("&"):
        if not part:
            # form_urlencoded::parse SKIPS empty sequences ("a&&b",
            # leading/trailing '&') — rust-url parse loop `continue`
            continue
        if "=" in part:
            k, v = part.split("=", 1)
        else:
            k, v = part, ""
        k, v = unquote(k.replace("+", " ")), unquote(v.replace("+", " "))
        if _ignore_empty_values and v == "":
            continue
        if k in out:
            if isinstance(out[k], list):
                out[k].append(v)
            else:
                out[k] = [out[k], v]
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# parse_duration (parse_duration.rs): "1s" "5m30s" etc -> float in `unit`

from fractions import Fraction as _Fr

# UNITS map (parse_duration.rs:102-119) — note "w" is accepted at
# runtime (both as a component and as the output unit) even though
# the docs enum omits it; there is NO "y".
_DUR_UNITS = {
    "ns": _Fr(1, 10**9), "us": _Fr(1, 10**6), "µs": _Fr(1, 10**6),
    "ms": _Fr(1, 10**3), "cs": _Fr(1, 100), "ds": _Fr(1, 10),
    "s": _Fr(1), "m": _Fr(60), "h": _Fr(3600), "d": _Fr(86400),
    "w": _Fr(604800),
}
# parse_duration.rs:91-99 — value is [0-9]*\.?[0-9]+ (leading-dot
# floats OK), at most ONE space, unit is ANY 1-2 letters (validated
# against UNITS afterwards), case-insensitive, searched (not
# anchored) so leading garbage before a match is skipped.
_DUR_RE = _regex.compile(r"(?i)([0-9]*\.?[0-9]+)\s?([µa-z]{1,2})")
# rust_decimal's 96-bit mantissa bound: checked_mul overflow above it
_DEC_MAX = _Fr(2**96 - 1)


def parse_duration(value: str, unit: str) -> float:
    """Loop of regex captures over the remaining slice, each component
    converted exactly (rust_decimal) then accumulated in f64 —
    parse_duration.rs:56-89. Error strings quote the REMAINING slice."""
    conv = _DUR_UNITS.get(unit)
    if conv is None:
        raise VrlError(f"unknown unit format: '{unit}'")
    rest = value
    num = 0.0
    while rest:
        m = _DUR_RE.search(rest)
        if not m:
            raise VrlError(f"unable to parse duration: '{rest}'")
        digits = m.group(1)
        if int(digits.replace(".", "") or "0") > 2**96 - 1:
            raise VrlError("unable to parse number: Invalid decimal: "
                           "overflow from too many digits")
        unit_s = m.group(2)
        unitf = _DUR_UNITS.get(unit_s)
        if unitf is None:
            raise VrlError(f"unknown duration unit: '{unit_s}'")
        qty = _Fr(digits) * unitf
        if abs(qty) > _DEC_MAX:
            raise VrlError(f"unable to convert duration: '{rest}'")
        num += float(qty / conv)
        rest = rest[m.end():]
    return num


# ---------------------------------------------------------------------------
# parse_bytes (parse_bytes.rs): "1.2KiB" -> int bytes ("binary"/"decimal"/both)

# Input grammar = the `parse-size` 1.1.0 crate (parse_bytes.rs:84-110):
# [+] digits[.digits] [e±digits] [ws] [suffix], case-insensitive
# suffixes K/M/G/T/P/E with optional 'i' (forces binary) and optional
# 'b'; the config (base "2"/"10") decides ambiguous K/KB-style units.
# Result is a ROUNDED u64 byte count (half away from zero), then
# divided by the OUTPUT unit factor. Output unit maps are
# case-sensitive and base-dependent (BIN_UNITS/DEC_UNITS,
# parse_bytes.rs:114-149): base 2 accepts B/KiB../EiB plus ambiguous
# KB../EB (=1024^k); base 10 accepts ONLY B/kB/MB../EB (=1000^k).
_PS_RE = _re.compile(
    r"^\+?(\d+(?:\.\d*)?|\.\d+)([eE][+-]?\d+)?\s*([A-Za-z]*)$")
_PS_POW = {"k": 1, "m": 2, "g": 3, "t": 4, "p": 5, "e": 6}
_BIN_UNITS = {"B": 1}
_DEC_UNITS = {"B": 1}
for _i, (_bu, _du) in enumerate(
        [("KiB", "kB"), ("MiB", "MB"), ("GiB", "GB"), ("TiB", "TB"),
         ("PiB", "PB"), ("EiB", "EB")], start=1):
    _BIN_UNITS[_bu] = 1024 ** _i
    _BIN_UNITS[_bu.replace("i", "")] = 1024 ** _i
    _DEC_UNITS[_du] = 1000 ** _i


def _parse_size(src: str, binary: bool) -> int:
    """parse-size crate: trimmed input → rounded u64 byte count.
    Errors use ParseIntError's Display texts (the crate reuses them)."""
    s = src.strip()
    if not s:
        raise VrlError("unable to parse bytes: 'cannot parse integer "
                       "from empty string'")
    m = _PS_RE.match(s)
    if not m:
        raise VrlError("unable to parse bytes: 'invalid digit found "
                       "in string'")
    num, exp, suffix = m.groups()
    qty = _Fr(num if num not in (".",) else "0")
    if exp:
        qty *= _Fr(10) ** int(exp[1:])
    sl = suffix.lower()
    if sl in ("", "b"):
        mult = 1
    else:
        head, rest = sl[0], sl[1:]
        if head not in _PS_POW or rest not in ("", "i", "b", "ib"):
            raise VrlError("unable to parse bytes: 'invalid digit "
                           "found in string'")
        k = _PS_POW[head]
        mult = 1024 ** k if ("i" in rest or binary) else 1000 ** k
    qty *= mult
    n = (2 * qty.numerator + qty.denominator) // (2 * qty.denominator)
    if n > 2**64 - 1:
        raise VrlError("unable to parse bytes: 'number too large to "
                       "fit in target type'")
    return int(n)


def parse_bytes(value: str, unit: str, base: Optional[str] = None) -> float:
    b = base or "2"
    if b not in ("2", "10"):
        raise VrlError(f"invalid base: {b}")
    units = _BIN_UNITS if b == "2" else _DEC_UNITS
    factor = units.get(unit)
    if factor is None:
        raise VrlError(f"unknown unit format: '{unit}'")
    n = _parse_size(value, binary=(b == "2"))
    return float(_Fr(n, factor))


# ---------------------------------------------------------------------------
# parse_int / parse_float (parse_int.rs, parse_float.rs)

def _from_str_radix(s: str, base: int) -> int:
    """Rust i64::from_str_radix: optional +/- then base digits ONLY —
    no whitespace, no underscores, no 0x/0o/0b prefixes (Python's
    int() accepts all three for the matching base)."""
    body = s[1:] if s[:1] in ("+", "-") else s
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
    if not body or any(ch.lower() not in digits for ch in body):
        raise VrlError(
            "could not parse integer: invalid digit found in string")
    v = int(s, base)
    if not (-9223372036854775808 <= v <= 9223372036854775807):
        raise VrlError("could not parse integer: "
                       "number too large to fit in target type")
    return v


def parse_int(value: str, base: Optional[int] = None) -> int:
    """parse_int.rs: explicit base 2..=36 parses the WHOLE string
    with from_str_radix (a 0x prefix is an error there); without a
    base the prefix picks the radix — 0b/0o/0x, and any OTHER
    leading 0 means OCTAL of the whole string (parse_int.rs:19-26);
    signs only work base-10 (the sign char stops prefix detection)."""
    s = value
    if base is not None:
        if not (2 <= base <= 36):
            raise VrlError(f"invalid base {base}, must be be between 2 and 36 (inclusive)")
        return _from_str_radix(s, base)
    if not s:
        raise VrlError("value is empty")
    if s[0] == "0":
        nxt = s[1] if len(s) > 1 else None
        if nxt == "b":
            return _from_str_radix(s[2:], 2)
        if nxt == "o":
            return _from_str_radix(s[2:], 8)
        if nxt == "x":
            return _from_str_radix(s[2:], 16)
        return _from_str_radix(s, 8)
    return _from_str_radix(s, 10)


def parse_float(value: str) -> float:
    """parse_float.rs = Conversion::Float = Rust f64 FromStr: no
    surrounding whitespace, no underscores (Python's float() accepts
    both); NaN is unrepresentable."""
    # conversion/mod.rs:44-47 error texts; Rust ParseFloatError
    # Display is the fixed "invalid float literal"
    if value != value.strip() or "_" in value:
        raise VrlError(
            f'Invalid floating point number "{value}": invalid float literal')
    try:
        f = float(value)
    except ValueError as e:
        raise VrlError(
            f'Invalid floating point number "{value}": '
            "invalid float literal") from e
    if math.isnan(f):
        raise VrlError(f'NaN number not supported "{value}"')
    return f


# ---------------------------------------------------------------------------
# parse_common_log (parse_common_log.rs): Apache common log format

def parse_common_log(value: str,
                     timestamp_format: Optional[str] = None,
                     timezone_name: Optional[str] = None) -> dict:
    """parse_common_log.rs:19-20 delegates to the SAME apache common
    regex + parse_message as parse_apache_log(format: "common")."""
    from .parse_logs import parse_apache_log
    return parse_apache_log(value, "common", timestamp_format,
                            timezone_name)


# ---------------------------------------------------------------------------
# parse_glog (parse_glog.rs): google log format
# e.g. I0813 16:10:35.231055 42324 main.cc:123] hello world

# mirrors REGEX_GLOG (parse_glog.rs:56-68): single \w level (mapped
# AFTER the match so unknown levels get their own error), mandatory
# YYYYMMDD date, exactly-6-digit fraction, greedy file up to last ':'
_GLOG = _re.compile(
    r"^\s*(?P<level>\w)"
    r"(?P<timestamp>(?P<y>\d{4})(?P<mo>\d{2})(?P<d>\d{2})\s"
    r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})\.(?P<usec>\d{6}))\s+"
    r"(?P<id>\d+)\s(?P<file>.+):(?P<line>\d+)\]\s(?P<message>.*?)\s*$"
)
_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def _glog_fields(d: dict) -> dict:
    """Shared glog/klog field assembly with the reference's error
    taxonomy (parse_glog.rs:14-52 / parse_klog.rs:14-57)."""
    level = _GLOG_LEVELS.get(d["level"])
    if level is None:
        raise VrlError(f'unrecognized log level "{d["level"]}"')
    try:
        ts = datetime(
            int(d["y"]), int(d["mo"]), int(d["d"]), int(d["h"]),
            int(d["mi"]), int(d["s"]), int(d["usec"]), tzinfo=timezone.utc)
    except ValueError as e:
        # chrono ParseError for a structurally-valid but out-of-range
        # date is "input is out of range"
        raise VrlError(f"failed parsing timestamp {d['timestamp']}: "
                       "input is out of range") from e
    # id/line parse as i64 (parse_glog.rs:37,46) — overflow errors
    tid, line = int(d["id"]), int(d["line"])
    if not -(2**63) <= tid < 2**63:
        raise VrlError("failed parsing id")
    if not -(2**63) <= line < 2**63:
        raise VrlError("failed parsing line")
    return {
        "level": level,
        "timestamp": ts,
        "id": tid,
        "file": d["file"],
        "line": line,
        "message": d["message"],
    }


def parse_glog(value: str) -> dict:
    m = _GLOG.match(value)
    if m is None:
        raise VrlError("failed parsing glog message")
    return _glog_fields(m.groupdict())


# ---------------------------------------------------------------------------
# parse_syslog (parse_syslog.rs): RFC 5424 (subset) + RFC 3164 fallback

_RFC5424 = _re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<version>\d)\s+(?P<ts>\S+)\s+(?P<host>\S+)\s+"
    r"(?P<app>\S+)\s+(?P<procid>\S+)\s+(?P<msgid>\S+)\s+"
    r"(?P<sd>-|(?:\[(?:[^\]\\]|\\.)*\])+)\s*(?P<msg>.*)$"
)
# RFC 5424 §6.3.3: PARAM-VALUE escapes \" \\ \] — values may span
# escaped quotes/brackets (syslog_loose crate behavior)
_SD_ELEMENT = _re.compile(
    r"\[(?P<id>[^=\s\]]+)(?P<params>(?:\s+[^=\s\]]+\s*=\s*"
    r"\"(?:[^\"\\]|\\.)*\")*)\s*\]")
_SD_PARAM = _re.compile(r"([^=\s\]]+)\s*=\s*\"((?:[^\"\\]|\\.)*)\"")


def _sd_unescape(v: str) -> str:
    return _re.sub(r'\\([\\"\]])', r"\1", v)
# syslog_loose RFC 3164 shapes, most-specific first: host + tag:,
# tag: WITHOUT host (the first word carries [pid] or ':' so it can't
# be a hostname — "haproxy[73411]:"), host + tag WITHOUT ':'
_RFC3164_HEAD = (r"^(?:<(?P<pri>\d{1,3})>)?"
                 r"(?P<ts>[A-Z][a-z]{2}\s+\d{1,2}\s+\d{2}:\d{2}:\d{2})\s+")
_RFC3164_VARIANTS = [
    _re.compile(_RFC3164_HEAD
                + r"(?P<host>\S+)\s+(?P<tag>[^:\[\s]+)"
                  r"(?:\[(?P<procid>\d+)\])?:\s*(?P<msg>.*)$"),
    _re.compile(_RFC3164_HEAD
                + r"(?P<tag>[^:\[\s]+)(?:\[(?P<procid>\d+)\])?:"
                  r"\s*(?P<msg>.*)$"),
    _re.compile(_RFC3164_HEAD
                + r"(?P<host>\S+)\s+(?P<tag>[^:\[\s]+)\s+(?P<msg>.+)$"),
]
_SYSLOG_SEVERITIES = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news", "uucp",
    "cron", "authpriv", "ftp", "ntp", "security", "console", "solaris-cron",
] + [f"local{i}" for i in range(8)]


def parse_syslog(value: str) -> dict:
    m = _RFC5424.match(value)
    if m:
        d = m.groupdict()
        out: dict = {"message": d["msg"]}
        if d["sd"] and d["sd"] != "-":
            for sde in _SD_ELEMENT.finditer(d["sd"]):
                out[sde.group("id")] = {k: _sd_unescape(v) for k, v in _SD_PARAM.findall(sde.group("params"))}
        pri = int(d["pri"])
        out["severity"] = _SYSLOG_SEVERITIES[pri % 8]
        fac = pri // 8
        out["facility"] = _SYSLOG_FACILITIES[fac] if fac < len(_SYSLOG_FACILITIES) else str(fac)
        out["version"] = int(d["version"])
        if d["ts"] != "-":
            try:
                out["timestamp"] = datetime.fromisoformat(d["ts"].replace("Z", "+00:00")).astimezone(timezone.utc)
            except ValueError:
                pass
        for src, dst in (("host", "hostname"), ("app", "appname"),
                         ("procid", "procid"), ("msgid", "msgid")):
            if d[src] and d[src] != "-":
                out[dst] = d[src]
        if isinstance(out.get("procid"), str) and out["procid"].isdigit():
            out["procid"] = int(out["procid"])
        return out
    m = None
    for rx in _RFC3164_VARIANTS:
        m = rx.match(value)
        if m:
            break
    if m:
        d = m.groupdict()
        out = {"message": d["msg"], "appname": d["tag"]}
        if d.get("host"):
            out["hostname"] = d["host"]
        if d["pri"] is not None:
            pri = int(d["pri"])
            out["severity"] = _SYSLOG_SEVERITIES[pri % 8]
            fac = pri // 8
            out["facility"] = _SYSLOG_FACILITIES[fac] if fac < len(_SYSLOG_FACILITIES) else str(fac)
        if d.get("procid"):
            out["procid"] = int(d["procid"])
        try:
            # RFC 3164 omits the year: the reference resolves it to the
            # current year and interprets the naive stamp in the
            # CONTEXT timezone (parse_syslog.rs ctx.timezone() via
            # syslog_loose)
            year = datetime.now(timezone.utc).year
            ts = datetime.strptime(f"{year} {d['ts']}", "%Y %b %d %H:%M:%S")
            from .timestamp import get_context_timezone
            ctz = get_context_timezone()
            if ctz and ctz not in ("UTC", "utc", "local"):
                from zoneinfo import ZoneInfo
                ts = ts.replace(tzinfo=ZoneInfo(ctz)) \
                    .astimezone(timezone.utc)
            else:
                ts = ts.replace(tzinfo=timezone.utc)
            out["timestamp"] = ts
        except ValueError:
            pass
        return out
    raise VrlError("unable to parse input as valid syslog message")


# ---------------------------------------------------------------------------
# parse_user_agent (parse_user_agent.rs:198-229)
#
# The reference composes two parsers: woothee ("fast") and the full
# uap-core table ("slow", baked from data/user_agent_regexes.yaml).
#   fast     = woothee only, partial schema
#   reliable = woothee; if browser.family or os.family missing, uap
#              result field-wise `.or(woothee)`; partial schema
#   enriched = uap `.or(woothee)`, full schema
# Our "fast" side is a documented woothee-subset heuristic (the
# woothee dataset is not vendored by the reference); the uap side is
# the FULL 1270-entry table (functions/ua.py + generated _ua_db.py).

_UA_BROWSERS = [
    ("Firefox", _re.compile(r"Firefox/(?P<v>[\d.]+)")),
    ("Edge", _re.compile(r"Edge?/(?P<v>[\d.]+)")),
    ("Chrome", _re.compile(r"Chrome/(?P<v>[\d.]+)")),
    ("Safari", _re.compile(r"Version/(?P<v>[\d.]+).*Safari")),
    # woothee resolves Opera's version from the trailing Version/x.y
    # token when present (Presto-era UAs), else Opera/x.y
    ("Opera", _re.compile(r"Opera.*?Version/(?P<v>[\d.]+)|Opera[/ ](?P<v2>[\d.]+)")),
    ("Internet Explorer", _re.compile(r"MSIE (?P<v>[\d.]+)")),
    ("curl", _re.compile(r"curl/(?P<v>[\d.]+)")),
]
_UA_OS = [
    ("Windows", _re.compile(r"Windows NT (?P<v>[\d.]+)")),
    ("Android", _re.compile(r"Android (?P<v>[\d.]+)")),
    ("iOS", _re.compile(r"iPhone OS (?P<v>[\d_]+)")),
    ("Mac OS X", _re.compile(r"Mac OS X (?P<v>[\d_.]+)")),
    ("Linux", _re.compile(r"Linux")),
]

_B_KEYS = ("family", "version", "major", "minor", "patch")
_O_KEYS = ("family", "version", "major", "minor", "patch", "patch_minor")
_D_KEYS = ("family", "category", "brand", "model")


def _woothee_ua(value: str) -> tuple:
    """Fast-parser stand-in -> (browser, os, device) full-field dicts
    (woothee sets only family/version/category; the rest stay None,
    matching reference UserAgent::Default, parse_user_agent.rs:577-605)."""
    browser = dict.fromkeys(_B_KEYS)
    os = dict.fromkeys(_O_KEYS)
    device = dict.fromkeys(_D_KEYS)
    for fam, rx in _UA_BROWSERS:
        m = rx.search(value)
        if m:
            gd = m.groupdict()
            browser["family"] = fam
            browser["version"] = gd.get("v") or gd.get("v2")
            break
    for fam, rx in _UA_OS:
        m = rx.search(value)
        if m:
            v = m.groupdict().get("v")
            os["family"] = fam
            os["version"] = v.replace("_", ".") if v else None
            break
    if os["family"] == "Windows":
        nt = {"5.1": "Windows XP", "6.1": "Windows 7", "6.2": "Windows 8",
              "6.3": "Windows 8.1", "10.0": "Windows 10"}
        fam = nt.get(os["version"] or "")
        if fam:
            os["family"] = fam
            os["version"] = f"NT {os['version']}"
    if "Mobile" in value or "iPhone" in value or "Android" in value:
        device["category"] = "smartphone"
    elif browser["family"] == "curl":
        device["category"] = "misc"
    elif browser["family"]:
        device["category"] = "pc"
    return browser, os, device


def _uap_ua(value: str) -> tuple:
    """Full uap-core extraction (reference parse_user_agent.rs:608-652)."""
    from .ua import extract_browser, extract_device, extract_os

    browser = dict.fromkeys(_B_KEYS)
    os = dict.fromkeys(_O_KEYS)
    device = dict.fromkeys(_D_KEYS)
    b = extract_browser(value)
    if b:
        browser["family"], browser["major"], browser["minor"], \
            browser["patch"] = b
    o = extract_os(value)
    if o:
        os["family"], os["major"], os["minor"], os["patch"], \
            os["patch_minor"] = o
    d = extract_device(value)
    if d:
        device["family"], device["brand"], device["model"] = d
    return browser, os, device


def _ua_or(pref: dict, fb: dict) -> dict:
    """Field-wise Option::or (parse_user_agent.rs:459-467)."""
    return {k: pref[k] if pref[k] is not None else fb[k] for k in pref}


def parse_user_agent(value: str, mode: str = "fast") -> dict:
    wb, wo, wd = _woothee_ua(value)
    if mode == "fast":
        b, o, d = wb, wo, wd
    elif mode == "reliable":
        if wb["family"] is None or wo["family"] is None:
            ub, uo, ud = _uap_ua(value)
            b, o, d = _ua_or(ub, wb), _ua_or(uo, wo), _ua_or(ud, wd)
        else:
            b, o, d = wb, wo, wd
    else:  # enriched
        ub, uo, ud = _uap_ua(value)
        b, o, d = _ua_or(ub, wb), _ua_or(uo, wo), _ua_or(ud, wd)
        return {
            "browser": {k: b[k] for k in _B_KEYS},
            "os": {k: o[k] for k in _O_KEYS},
            "device": {k: d[k] for k in _D_KEYS},
        }
    # partial schema (parse_user_agent.rs:382-396)
    return {
        "browser": {"family": b["family"], "version": b["version"]},
        "os": {"family": o["family"], "version": o["version"]},
        "device": {"category": d["category"]},
    }
