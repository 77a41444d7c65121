"""Misc stdlib functions: system info, uuid/random, geo, network id,
charset codecs, path splitting, external type tagging.

Reference files: split_path.rs, community_id.rs, haversine.rs,
tag_types_externally.rs, uuid_v4.rs, uuid_v7.rs,
uuid_from_friendly_id.rs, random_*.rs, get_env_var.rs,
get_hostname.rs, get_timezone_name.rs, log.rs,
to_syslog_facility_code.rs (src/stdlib/), decode_mime_q.rs,
encode_charset.rs / decode_charset.rs, dns_lookup.rs /
reverse_dns.rs / http_request.rs (I/O — stubbed, SURVEY §2.2 [X]).

Nondeterministic functions (now/uuid/random — function.rs:121-123
``deterministic`` flag) accept an optional ``seed`` for reproducible
pipeline runs; the scaled path never uses them unseeded.
"""

from __future__ import annotations

import base64 as _b64
import codecs as _codecs
import hashlib
import math
import os
import random as _random
import re as _re
import socket
import struct
import sys
import time
import uuid as _uuid
from datetime import datetime, timezone
from typing import Any, Optional

from ..value import VrlError

__all__ = [
    "split_path", "community_id", "haversine", "tag_types_externally",
    "uuid_v4", "uuid_v7", "uuid_from_friendly_id", "random_bool",
    "random_bytes", "random_float", "random_int", "get_env_var",
    "get_hostname", "get_timezone_name", "log", "to_syslog_facility_code",
    "decode_mime_q", "encode_charset", "decode_charset", "dns_lookup",
    "reverse_dns", "http_request", "unnest",
]


# ---------------------------------------------------------------------------
# split_path (split_path.rs): std::path::Path::components semantics

def split_path(value: str) -> list:
    out: list[str] = []
    s = value
    if s.startswith("/"):
        out.append("/")
        s = s.lstrip("/")
    first = True
    for part in s.split("/"):
        if part == "" or (part == "." and not (first and not out)):
            first = False
            continue
        if part == "." and not out:
            # leading ./ keeps the CurDir component
            out.append(".")
            first = False
            continue
        out.append(part)
        first = False
    return out


# ---------------------------------------------------------------------------
# community_id (community_id.rs): Community ID v1 flow hash
# https://github.com/corelight/community-id-spec

_ICMP4_MAP = {8: 0, 0: 8, 13: 14, 14: 13, 15: 16, 16: 15, 9: 10,
              10: 9, 17: 18, 18: 17}
_ICMP6_MAP = {128: 129, 129: 128, 133: 134, 134: 133, 135: 136,
              136: 135}


def community_id(source_ip: str, destination_ip: str, protocol: int,
                 source_port: Optional[int] = None,
                 destination_port: Optional[int] = None,
                 seed: int = 0) -> str:
    import ipaddress

    # community_id.rs:138-187: protocol must fit u8, ports/seed u16 —
    # compile-time InvalidArgument ("invalid argument" Display)
    if not 0 <= int(protocol) <= 255 or not 0 <= int(seed) <= 65535 \
            or (source_port is not None
                and not 0 <= int(source_port) <= 65535) \
            or (destination_port is not None
                and not 0 <= int(destination_port) <= 65535):
        raise VrlError("invalid argument")
    try:
        saddr = ipaddress.ip_address(source_ip).packed
        daddr = ipaddress.ip_address(destination_ip).packed
    except ValueError as e:
        raise VrlError(f"invalid ip address: {e}") from e
    proto = int(protocol)
    sport, dport = source_port, destination_port
    one_way = False
    if proto == 1 and sport is not None:  # ICMPv4: type/code mapping
        m = _ICMP4_MAP.get(sport)
        if m is not None:
            dport = m
        else:
            one_way = True
    elif proto == 58 and sport is not None:  # ICMPv6
        m = _ICMP6_MAP.get(sport)
        if m is not None:
            dport = m
        else:
            one_way = True

    if proto in (6, 17, 132) and (sport is None or dport is None):
        # community-id crate: transport protocols hard-require ports
        raise VrlError("src port and dst port should be set when "
                       "protocol is tcp/udp/sctp")
    has_ports = sport is not None and dport is not None and proto in (
        6, 17, 132, 1, 58)
    if not one_way:
        if (saddr, sport if has_ports else 0) > (daddr, dport if has_ports else 0):
            saddr, daddr = daddr, saddr
            sport, dport = dport, sport

    data = struct.pack("!H", seed) + saddr + daddr + struct.pack("!BB", proto, 0)
    if has_ports:
        data += struct.pack("!HH", sport, dport)
    digest = hashlib.sha1(data).digest()
    return "1:" + _b64.b64encode(digest).decode()


# ---------------------------------------------------------------------------
# haversine (haversine.rs:8-62): great-circle distance + bearing

def _round_to(x: float, p: int) -> float:
    scale = 10.0 ** p
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def haversine(latitude1: float, longitude1: float, latitude2: float,
              longitude2: float, measurement_unit: str = "kilometers") -> dict:
    r_km = 6_371_008.8 / 1000.0
    lat1, lon1 = math.radians(latitude1), math.radians(longitude1)
    lat2, lon2 = math.radians(latitude2), math.radians(longitude2)
    dlat, dlon = lat2 - lat1, lon2 - lon1
    a = math.sin(dlat / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2) ** 2
    d = 2.0 * math.asin(math.sqrt(a))
    if measurement_unit == "kilometers":
        dist = d * r_km
    elif measurement_unit == "miles":
        dist = d * r_km * 0.621_371_2
    else:
        raise VrlError(f"invalid measurement unit {measurement_unit}")
    y = math.sin(dlon) * math.cos(lat2)
    x = math.cos(lat1) * math.sin(lat2) - math.sin(lat1) * math.cos(lat2) * math.cos(dlon)
    bearing = (math.degrees(math.atan2(y, x)) + 360.0) % 360.0
    return {"distance": _round_to(dist, 7), "bearing": _round_to(bearing, 3)}


# ---------------------------------------------------------------------------
# tag_types_externally (tag_types_externally.rs): serde external tags

def tag_types_externally(value: Any) -> Any:
    if value is None:
        return None
    if isinstance(value, dict):
        return {k: tag_types_externally(v) for k, v in value.items()}
    if isinstance(value, list):
        return [tag_types_externally(v) for v in value]
    if isinstance(value, bool):
        return {"boolean": value}
    if isinstance(value, int):
        return {"integer": value}
    if isinstance(value, float):
        return {"float": value}
    if isinstance(value, datetime):
        return {"timestamp": value}
    if isinstance(value, (str, bytes)):
        return {"string": value}
    if hasattr(value, "pattern"):  # compiled regex (re or regex mod)
        return {"regex": value}
    return {"string": str(value)}


# ---------------------------------------------------------------------------
# uuid / random (nondeterministic — [X] in the scaled path; `seed`
# makes tests reproducible)

_FRIENDLY_ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def uuid_v4() -> str:
    return str(_uuid.uuid4())


def uuid_v7(timestamp: Optional[datetime] = None) -> str:
    """RFC 9562 UUIDv7: 48-bit timestamp field + random.

    Bit-parity quirk (uuid_v7.rs:23-29): the reference feeds chrono's
    TOTAL nanos-since-epoch truncated `as u32` into the uuid crate as
    the SUBSEC nanos, so the encoded millis field is
    ``secs*1000 + (total_ns % 2^32) // 1e6`` — up to ~4.29 s ahead of
    the true unix millis. Reproduced here exactly so the corpus
    timestamp-prefix check matches byte for byte."""
    if timestamp is not None:
        if not isinstance(timestamp, datetime):
            raise VrlError("uuid_v7 timestamp must be a timestamp")
        secs = int(timestamp.timestamp())
        total_ns = secs * 1_000_000_000 + timestamp.microsecond * 1000
    else:
        total_ns = time.time_ns()
        secs = total_ns // 1_000_000_000
    ms = secs * 1000 + (total_ns % (1 << 32)) // 1_000_000
    rand_a = _random.getrandbits(12)
    rand_b = _random.getrandbits(62)
    n = (ms & ((1 << 48) - 1)) << 80
    n |= 0x7 << 76
    n |= rand_a << 64
    n |= 0b10 << 62
    n |= rand_b
    return str(_uuid.UUID(int=n))


def uuid_from_friendly_id(value: str) -> str:
    n = 0
    for c in value:
        idx = _FRIENDLY_ALPHABET.find(c)
        if idx < 0:
            raise VrlError(f"invalid character {c!r} in friendly id")
        n = n * 62 + idx
    if n >= 1 << 128:
        raise VrlError("friendly id out of range")
    return str(_uuid.UUID(int=n))


def random_bool(seed: Optional[int] = None) -> bool:
    rng = _random.Random(seed) if seed is not None else _random
    return rng.random() < 0.5


def random_bytes(length: int, seed: Optional[int] = None) -> bytes:
    if length < 0:
        raise VrlError("length cannot be negative")
    if length > 64 * 1024:
        raise VrlError("length too large")
    rng = _random.Random(seed) if seed is not None else _random
    return bytes(rng.getrandbits(8) for _ in range(length))


def random_float(min: float, max: float, seed: Optional[int] = None) -> float:
    if max <= min:
        raise VrlError("max must be greater than min")
    rng = _random.Random(seed) if seed is not None else _random
    return rng.uniform(min, max)


def random_int(min: int, max: int, seed: Optional[int] = None) -> int:
    if max <= min:
        raise VrlError("max must be greater than min")
    rng = _random.Random(seed) if seed is not None else _random
    return rng.randrange(min, max)


# ---------------------------------------------------------------------------
# system info

def get_env_var(name: str) -> str:
    v = os.environ.get(name)
    if v is None:
        raise VrlError(f"environment variable {name} not set")
    return v


def get_hostname() -> str:
    return socket.gethostname()


def get_timezone_name() -> str:
    """get_timezone_name.rs:16-17 — the CONTEXT timezone's name
    (TimeZone::Named → its id; Local → the system zone)."""
    from .timestamp import get_context_timezone
    ctx = get_context_timezone()
    if ctx and ctx != "local":
        return ctx
    tz = os.environ.get("TZ")
    if tz:
        return tz
    return time.tzname[0] or "UTC"


def log(value: Any, level: str = "info", rate_limit_secs: int = 60) -> None:
    """Host log (log.rs): rate-limited print to stderr; returns null."""
    print(f"[{level}] {value}", file=sys.stderr)
    return None


# ---------------------------------------------------------------------------
# to_syslog_facility_code (to_syslog_facility_code.rs)

_FACILITIES = ["kern", "user", "mail", "daemon", "auth", "syslog", "lpr",
               "news", "uucp", "cron", "authpriv", "ftp", "ntp", "security",
               "console", "solaris-cron", "local0", "local1", "local2",
               "local3", "local4", "local5", "local6", "local7"]


def to_syslog_facility_code(value: str) -> int:
    try:
        return _FACILITIES.index(value)
    except ValueError:
        raise VrlError(f"syslog facility '{value}' not valid") from None


# ---------------------------------------------------------------------------
# decode_mime_q (decode_mime_q.rs): RFC 2047 encoded words, with the
# reference's leniency (optional charset / delimiters)

# decode_mime_q.rs grammar: the encoding slot is ANY text up to '?'
# (validated inside decode_word, "Invalid encoding: ..."), payload
# runs to the first "?=".
_MIME_DELIM = _re.compile(
    r"(.*?)=\?([^?]*)\?([^?]*)\?(.*?)\?=", _re.DOTALL)
_MIME_LOOSE = _re.compile(
    r"^([^?]*)\?([^?]*)\?(.*)$", _re.DOTALL)


def _decode_word(charset: str, enc: str, data: str) -> str:
    if enc in ("b", "B"):
        # base64_simd::STANDARD — padded, strict
        try:
            raw = _b64.b64decode(data, validate=True)
        except Exception as e:
            raise VrlError("Unable to decode base64 value") from e
    elif enc in ("q", "Q"):
        import quopri

        try:
            raw = quopri.decodestring(data.replace("_", " ").encode())
        except Exception as e:
            raise VrlError("Unable to decode quoted_printable value") \
                from e
    else:
        raise VrlError(f'Invalid encoding: "{enc}"')
    label = charset or "utf-8"
    name = _WHATWG_LABELS.get(label.strip(" \t\n\f\r").lower())
    if name is None or name == "replacement":
        # Charset::for_label_no_replacement
        raise VrlError(f'Unable to decode "{label}" value')
    # decode_without_bom_handling: lossy, NO BOM sniffing
    if name == "x-user-defined":
        return "".join(chr(b) if b <= 0x7F else chr(0xF780 + b - 0x80)
                       for b in raw)
    if name == "utf-16be":
        return raw.decode("utf-16-be", "replace")
    if name == "utf-16le":
        return raw.decode("utf-16-le", "replace")
    return raw.decode(name, "replace")


def decode_mime_q(value: str) -> str:
    """decode_mime_q.rs:99-133: every delimited =?..?..?..?= word
    decodes (decode errors PROPAGATE); with no delimited word, a bare
    charset?enc?payload parse is tried with errors swallowed; any
    trailing unparsed text is appended verbatim."""
    out, pos, found = [], 0, False
    for m in _MIME_DELIM.finditer(value):
        if m.start() != pos:
            break
        found = True
        out.append(m.group(1))
        out.append(_decode_word(m.group(2), m.group(3), m.group(4)))
        pos = m.end()
    if found:
        return "".join(out) + value[pos:]
    lm = _MIME_LOOSE.match(value)
    if lm:
        payload = lm.group(3)
        rest = ""
        cut = payload.find("?=")
        if cut != -1:
            payload, rest = payload[:cut], payload[cut:]
        try:
            return _decode_word(lm.group(1) or "", lm.group(2),
                                payload) + rest
        except VrlError:
            return value  # map_opt swallows loose-mode decode errors
    return value


# ---------------------------------------------------------------------------
# encode_charset / decode_charset (encode_charset.rs, decode_charset.rs)

# encoding_rs via Encoding::for_label: WHATWG label matching (strip
# ASCII whitespace + lowercase; ascii/latin1 ARE windows-1252), lossy
# encode with &#N; numeric character references, lossy decode with
# U+FFFD and BOM sniffing. Label table = the common WHATWG aliases.
def _whatwg_table() -> dict:
    t = {}

    def add(codec, *labels):
        for lab in labels:
            t[lab] = codec

    add("cp1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819",
        "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
        "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1",
        "us-ascii", "windows-1252", "x-cp1252")
    add("utf-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
        "utf-8", "utf8", "x-unicode20utf8")
    add("cp866", "866", "cp866", "csibm866", "ibm866")
    for n in (2, 3, 4, 5, 6, 7, 8, 10, 13, 14, 15, 16):
        add(f"iso8859-{n}", f"iso-8859-{n}", f"iso8859-{n}",
            f"iso8859{n}", f"iso_8859-{n}")
    add("iso8859-2", "csisolatin2", "l2", "latin2", "iso-ir-101",
        "iso_8859-2:1987")
    add("iso8859-3", "csisolatin3", "l3", "latin3", "iso-ir-109")
    add("iso8859-4", "csisolatin4", "l4", "latin4", "iso-ir-110")
    add("iso8859-5", "csisolatincyrillic", "cyrillic", "iso-ir-144")
    add("iso8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i",
        "csisolatinarabic", "ecma-114", "iso-8859-6-e", "iso-8859-6-i",
        "iso-ir-127")
    add("iso8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek",
        "greek8", "iso-ir-126", "sun_eu_greek")
    add("iso8859-8", "csiso88598e", "csisolatinhebrew", "hebrew",
        "iso-8859-8-e", "iso-ir-138", "visual", "csiso88598i",
        "iso-8859-8-i", "logical")
    add("iso8859-10", "csisolatin6", "iso-ir-157", "l6", "latin6")
    add("iso8859-13", "iso885913")
    add("iso8859-14", "iso885914")
    add("iso8859-15", "csisolatin9", "l9", "iso885915", "iso_8859-15")
    add("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
    add("koi8-u", "koi8-ru", "koi8-u")
    add("mac-roman", "csmacintosh", "mac", "macintosh", "x-mac-roman")
    add("cp874", "dos-874", "iso-8859-11", "iso8859-11", "iso885911",
        "tis-620", "windows-874")
    for n in range(1250, 1259):
        add(f"cp{n}", f"cp{n}", f"windows-{n}", f"x-cp{n}")
    add("mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
    add("gbk", "chinese", "csgb2312", "csiso58gb231280", "gb2312",
        "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk")
    add("gb18030", "gb18030")
    add("big5hkscs", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
    add("euc-jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
    add("iso-2022-jp", "csiso2022jp", "iso-2022-jp")
    add("cp932", "csshiftjis", "ms932", "ms_kanji", "shift-jis",
        "shift_jis", "sjis", "windows-31j", "x-sjis")
    add("cp949", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149",
        "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601",
        "ksc_5601", "windows-949")
    add("utf-16be", "unicodefffe", "utf-16be")
    add("utf-16le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
        "unicodefeff", "utf-16", "utf-16le")
    add("x-user-defined", "x-user-defined")
    add("replacement", "csiso2022kr", "hz-gb-2312", "iso-2022-cn",
        "iso-2022-cn-ext", "iso-2022-kr", "replacement")
    return t


_WHATWG_LABELS = _whatwg_table()


def _ncr_handler(err):
    # encoding_rs lossy encode: &#N; decimal character references
    s = err.object[err.start:err.end]
    return "".join(f"&#{ord(c)};" for c in s), err.end


_codecs.register_error("vrl_ncr", _ncr_handler)


def _for_label(label: str) -> str:
    if isinstance(label, bytes):  # VRL strings are bytes
        label = label.decode("utf-8", "replace")
    name = _WHATWG_LABELS.get(str(label).strip(" \t\n\f\r").lower())
    if name is None:
        raise VrlError(f"Unknown charset: {label}")
    return name


def encode_charset(value: str, to_charset: str) -> bytes:
    name = _for_label(to_charset)
    # encoding_rs output encodings: UTF-16 and replacement encode as
    # UTF-8 (Encoding::encode's output-encoding rule)
    if name in ("utf-16be", "utf-16le", "replacement"):
        name = "utf-8"
    if name == "x-user-defined":
        out = bytearray()
        for ch in value:
            o = ord(ch)
            if o <= 0x7F:
                out.append(o)
            elif 0xF780 <= o <= 0xF7FF:
                out.append(o - 0xF780 + 0x80)
            else:
                out.extend(f"&#{o};".encode("ascii"))
        return bytes(out)
    return value.encode(name, errors="vrl_ncr")


def decode_charset(value: bytes, from_charset: str) -> str:
    name = _for_label(from_charset)
    if isinstance(value, str):
        value = value.encode("latin-1")
    # decode() BOM-sniffs: a UTF-8/16 BOM overrides the label
    if value[:3] == b"\xef\xbb\xbf":
        return value[3:].decode("utf-8", "replace")
    if value[:2] == b"\xff\xfe":
        return value[2:].decode("utf-16-le", "replace")
    if value[:2] == b"\xfe\xff":
        return value[2:].decode("utf-16-be", "replace")
    if name == "replacement":
        return "�" if value else ""
    if name == "x-user-defined":
        return "".join(chr(b) if b <= 0x7F else chr(0xF780 + b - 0x80)
                       for b in value)
    if name == "utf-16be":
        return value.decode("utf-16-be", "replace")
    if name == "utf-16le":
        return value.decode("utf-16-le", "replace")
    return value.decode(name, "replace")


# ---------------------------------------------------------------------------
# network I/O — REAL since r4 (pure-Python RFC 1035 stub resolver +
# stdlib urllib transport, pluggable backends for air-gapped runs;
# vrl_ray/functions/net.py; dns_lookup.rs, reverse_dns.rs,
# http_request.rs). In a sandbox without network the system backends
# surface transport failures as the reference's error-as-value texts.

from .net import dns_lookup, http_request, reverse_dns  # noqa: F401,E402


# ---------------------------------------------------------------------------
# unnest (unnest.rs:64-72): explode an array field into N copies of
# the event — the one-to-many operator. Engine mapping: ds.flat_map /
# map_batches emitting more rows. Row-level form for the interpreter.

def unnest(event: dict, segments: list) -> list:
    """Return N copies of `event`, one per element of the array at
    `segments`; each copy has the path replaced by a single element."""
    import copy as _copy

    from ..value import path_get, path_insert

    arr = path_get(event, segments)
    if not isinstance(arr, list):
        raise VrlError("expected array at unnest path")
    out = []
    for el in arr:
        ev = _copy.deepcopy(event)
        ev = path_insert(ev, segments, el)
        out.append(ev)
    return out
