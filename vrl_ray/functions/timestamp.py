"""Timestamp-category stdlib functions (row-level semantics).

Mirrors /root/reference/src/stdlib/{format_timestamp,
from_unix_timestamp, to_unix_timestamp, now}.rs. ``now`` is
nondeterministic in the reference (function.rs:121-123 deterministic
flag) — here it must be frozen per job via ``set_frozen_now`` so
pipelines stay replayable.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Optional

from ..value import VrlError, vrl_type

__all__ = [
    "set_frozen_now", "now", "format_timestamp", "from_unix_timestamp",
    "to_unix_timestamp", "to_syslog_severity", "to_syslog_level",
    "to_syslog_facility",
]

_FROZEN_NOW: Optional[datetime] = None

#: the runtime-context timezone (SURVEY §1.4 / Context::timezone —
#: cmd.rs -z): naive timestamps in parse_timestamp and the log
#: parsers resolve here when no explicit timezone argument is given
_CTX_TZ: Optional[str] = None


def set_context_timezone(tz: Optional[str]) -> None:
    """Set the job's context timezone (an IANA name, or None = UTC).
    Validates eagerly like TimeZone::parse (cmd.rs:65-70)."""
    global _CTX_TZ
    if tz and tz not in ("UTC", "utc", "local"):
        from zoneinfo import ZoneInfo
        try:
            ZoneInfo(tz)
        except Exception as e:
            raise VrlError(f"unable to parse timezone: {tz}") from e
    _CTX_TZ = tz


def get_context_timezone() -> Optional[str]:
    return _CTX_TZ


def set_frozen_now(ts: Optional[datetime]) -> None:
    global _FROZEN_NOW
    _FROZEN_NOW = ts


def now() -> datetime:
    """Frozen job clock; errors if unset in a deterministic context."""
    if _FROZEN_NOW is None:
        return datetime.now(timezone.utc)
    return _FROZEN_NOW


def _ts(value) -> datetime:
    if not isinstance(value, datetime):
        raise VrlError("expected timestamp")
    if value.tzinfo is None:
        return value.replace(tzinfo=timezone.utc)
    return value


def format_timestamp(value: datetime, format: str, timezone_name: str = "UTC") -> str:
    """format_timestamp.rs: strftime (chrono dialect ≈ C strftime)."""
    dt = _ts(value)
    if timezone_name == "local":
        dt = dt.astimezone()  # chrono TimeZone::Local
    elif timezone_name not in ("UTC", "utc", None):
        try:
            from zoneinfo import ZoneInfo
            dt = dt.astimezone(ZoneInfo(timezone_name))
        except Exception as e:
            raise VrlError(f"unable to parse timezone: {timezone_name}") from e
    else:
        dt = dt.astimezone(timezone.utc)
    return dt.strftime(_translate_chrono(format, dt))


def _translate_chrono(fmt: str, dt: datetime) -> str:
    """chrono strftime dialect -> Python strftime (chrono
    format/strftime docs): a char scan, NOT str.replace, so %%f stays
    a literal. chrono-only specifiers expand to concrete values:
    %f = 9-digit NANOSECONDS (Python's %f is 6-digit micro), the
    %3f/%6f/%9f and %.f/%.3f/%.6f/%.9f fraction families, %:z/%::z/
    %:::z offset forms, %s epoch seconds (portably), %e/%v/%T/%F/%R,
    and %+ (RFC3339 AutoSi)."""
    us = dt.microsecond

    def off_str() -> str:
        return dt.strftime("%z") or "+0000"

    def autosi() -> str:
        if us == 0:
            return ""
        if us % 1000 == 0:
            return f".{us // 1000:03d}"
        return f".{us:06d}"

    out = []
    i, n = 0, len(fmt)
    while i < n:
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        rest = fmt[i + 1:i + 5]
        if rest.startswith("%"):
            out.append("%%")
            i += 2
        elif rest.startswith(".3f"):
            out.append(f".{us // 1000:03d}")
            i += 4
        elif rest.startswith(".6f"):
            out.append(f".{us:06d}")
            i += 4
        elif rest.startswith(".9f"):
            out.append(f".{us:06d}000")
            i += 4
        elif rest.startswith(".f"):
            out.append(autosi())
            i += 3
        elif rest.startswith("3f"):
            out.append(f"{us // 1000:03d}")
            i += 3
        elif rest.startswith("6f"):
            out.append(f"{us:06d}")
            i += 3
        elif rest.startswith("9f"):
            out.append(f"{us:06d}000")
            i += 3
        elif rest.startswith("f"):
            # chrono %f: nanoseconds since last whole second, nine
            # zero-padded digits (NOT Python's six-digit micro)
            out.append(f"{us:06d}000")
            i += 2
        elif rest.startswith(":::z"):
            out.append(off_str()[:3])
            i += 5
        elif rest.startswith("::z"):
            o = off_str()
            out.append(o[:3] + ":" + o[3:5] + ":00")
            i += 4
        elif rest.startswith(":z"):
            o = off_str()
            out.append(o[:3] + ":" + o[3:5])
            i += 3
        elif rest.startswith("s"):
            # chrono %s = UTC epoch seconds; CPython delegates %s to
            # libc mktime (localtime-dependent) — expand directly
            out.append(str(int(dt.timestamp())))
            i += 2
        elif rest.startswith("T"):
            out.append("%H:%M:%S")
            i += 2
        elif rest.startswith("F"):
            out.append("%Y-%m-%d")
            i += 2
        elif rest.startswith("R"):
            out.append("%H:%M")
            i += 2
        elif rest.startswith("v"):
            out.append(str(dt.day).rjust(2) + "-%b-%Y")
            i += 2
        elif rest.startswith("e"):
            out.append(str(dt.day).rjust(2))
            i += 2
        elif rest.startswith("+"):
            # chrono %+ = RFC3339 with %.f — fractional digits in SI
            # GROUPS (3/6/9), same as to_rfc3339_opts AutoSi
            iso = dt.strftime("%Y-%m-%dT%H:%M:%S") + autosi()
            o = off_str()
            iso += o[:3] + ":" + o[3:]
            out.append(iso)
            i += 2
        else:
            j = i + 1
            flag = ""
            if j < n and fmt[j] in "-0_":
                flag = fmt[j]
                j += 1
            sp = fmt[j] if j < n else ""
            expanded = _chrono_expand(sp, flag, dt)
            if expanded is None:
                # chrono: writing an unknown specifier is an error
                raise VrlError("invalid format")
            out.append(expanded)
            i = j + 1
    return "".join(out)


def _chrono_expand(sp: str, flag: str, dt: datetime):
    """Remaining chrono specifiers: numeric ones honor the -/0/_
    padding flags; unknown specifiers return None (format error)."""
    h12 = dt.hour % 12 or 12
    num = {
        "Y": (dt.year, 4, "0"), "C": (dt.year // 100, 2, "0"),
        "y": (dt.year % 100, 2, "0"), "m": (dt.month, 2, "0"),
        "d": (dt.day, 2, "0"), "e": (dt.day, 2, " "),
        "H": (dt.hour, 2, "0"), "k": (dt.hour, 2, " "),
        "I": (h12, 2, "0"), "l": (h12, 2, " "),
        "M": (dt.minute, 2, "0"), "S": (dt.second, 2, "0"),
        "j": (dt.timetuple().tm_yday, 3, "0"),
        "q": ((dt.month - 1) // 3 + 1, 1, "0"),
        "u": (dt.isoweekday(), 1, "0"),
        "w": ((dt.weekday() + 1) % 7, 1, "0"),
        "U": (int(dt.strftime("%U")), 2, "0"),
        "W": (int(dt.strftime("%W")), 2, "0"),
        "G": (dt.isocalendar()[0], 4, "0"),
        "g": (dt.isocalendar()[0] % 100, 2, "0"),
        "V": (dt.isocalendar()[1], 2, "0"),
    }
    if sp in num:
        v, width, dflt = num[sp]
        ch = {"-": None, "0": "0", "_": " "}.get(flag, dflt)
        s = str(v)
        return s if ch is None else s.rjust(width, ch)
    if flag:
        return None
    text = {
        "a": "%a", "A": "%A", "b": "%b", "B": "%B", "h": "%b",
        "p": "%p", "Z": "%Z", "z": "%z", "n": "\n", "t": "\t",
        "D": "%m/%d/%y", "x": "%m/%d/%y", "X": "%H:%M:%S",
        "r": "%I:%M:%S %p",
        "c": "%a %b " + str(dt.day).rjust(2) + " %H:%M:%S %Y",
        "P": "am" if dt.hour < 12 else "pm",
    }
    return text.get(sp)


_UNITS = {"seconds": 1, "milliseconds": 10**3, "microseconds": 10**6, "nanoseconds": 10**9}


def from_unix_timestamp(value: int, unit: str = "seconds") -> datetime:
    """from_unix_timestamp.rs: integer in `unit` -> timestamp.
    Non-integers error with the KIND; out-of-range integers with the
    NUMBER (from_unix_timestamp.rs:37-53)."""
    if unit not in _UNITS:
        raise VrlError(f"invalid unit: {unit}")
    if isinstance(value, bool) or not isinstance(value, int):
        raise VrlError(
            f"unable to coerce {vrl_type(value)} into timestamp")
    # exact integer math (floor like chrono's div_euclid); the old
    # float division lost precision past 2^53 ns
    if unit == "seconds":
        us = value * 10**6
    elif unit == "milliseconds":
        us = value * 10**3
    elif unit == "microseconds":
        us = value
    else:
        us = value // 1000  # ns → µs (floor, like chrono div_euclid)
    try:
        return (datetime(1970, 1, 1, tzinfo=timezone.utc)
                + timedelta(microseconds=us))
    except (OverflowError, OSError) as e:
        raise VrlError(
            f"unable to coerce {value} into timestamp") from e


def to_unix_timestamp(value: datetime, unit: str = "seconds") -> int:
    """to_unix_timestamp.rs: timestamp -> integer in `unit`."""
    if unit not in _UNITS:
        raise VrlError(f"invalid unit: {unit}")
    dt = _ts(value)
    # exact integer math like chrono's timestamp_*() (FLOOR division;
    # the float `.timestamp() * 1e9` path rounded nanoseconds off past
    # ~2^53 and truncated toward zero for pre-epoch instants)
    us = (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) \
        // timedelta(microseconds=1)
    if unit == "seconds":
        return us // 10 ** 6
    if unit == "milliseconds":
        return us // 10 ** 3
    if unit == "microseconds":
        return us
    return us * 1000


# to_syslog_* (to_syslog_severity.rs etc.)

_SEVERITIES = {
    "emerg": 0, "panic": 0, "alert": 1, "crit": 2, "err": 3, "error": 3,
    "warning": 4, "warn": 4, "notice": 5, "info": 6, "debug": 7,
}
_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
_FACILITIES = {
    0: "kern", 1: "user", 2: "mail", 3: "daemon", 4: "auth", 5: "syslog",
    6: "lpr", 7: "news", 8: "uucp", 9: "cron", 10: "authpriv", 11: "ftp",
    12: "ntp", 13: "security", 14: "console", 15: "solaris-cron",
    16: "local0", 17: "local1", 18: "local2", 19: "local3",
    20: "local4", 21: "local5", 22: "local6", 23: "local7",
}


def to_syslog_severity(value: str) -> int:
    # to_syslog_severity.rs:6-15 — EXACT keyword match (no lowercase)
    s = value if isinstance(value, str) else None
    if s not in _SEVERITIES:
        raise VrlError(f"syslog level {value} not valid")
    return _SEVERITIES[s]


def to_syslog_level(value: int) -> str:
    if isinstance(value, bool) or not isinstance(value, int):
        raise VrlError(f"expected integer, got {vrl_type(value)}")
    if not 0 <= value <= 7:
        raise VrlError(f"severity level {value} not valid")
    return _LEVELS[value]


def to_syslog_facility(value: int) -> str:
    # to_syslog_facility.rs: try_integer error for non-ints, then the
    # facility-code text with the bare number
    if isinstance(value, bool) or not isinstance(value, int):
        raise VrlError(f"expected integer, got {vrl_type(value)}")
    if value not in _FACILITIES:
        raise VrlError(f"facility code {value} not valid")
    return _FACILITIES[value]
