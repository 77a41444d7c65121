"""Coerce/Type-category stdlib functions (row-level semantics).

Mirrors /root/reference/src/stdlib/to_*.rs, is_*.rs, and the type
assertion functions (bool.rs, int.rs, float.rs, string.rs, object.rs,
array.rs, timestamp.rs).
"""

from __future__ import annotations

import math
import re as _re
from datetime import datetime, timezone
from typing import Any

import regex as _regex

from ..value import VrlError, vrl_type

__all__ = [
    "to_bool", "to_int", "to_float", "to_string", "to_regex",
    "assert_bool", "assert_int", "assert_float", "assert_string",
    "assert_object", "assert_array", "assert_timestamp",
    "is_array", "is_boolean", "is_empty", "is_float", "is_integer",
    "is_json", "is_null", "is_nullish", "is_object", "is_regex",
    "is_string", "is_timestamp", "type_def",
]

_TRUE_STRINGS = {"true", "t", "yes", "y", "1"}
_FALSE_STRINGS = {"false", "f", "no", "n", "0"}


def to_bool(value: Any) -> bool:
    """to_bool.rs coercion table: bool id; "true"/"t"/"yes"/"y"/non-zero
    numeric string rules; int/float 0 -> false else true; null ->
    false; other kinds error."""
    if isinstance(value, bool):
        return value
    if value is None:
        return False
    if isinstance(value, int):
        return value != 0
    if isinstance(value, float):
        return value != 0.0
    if isinstance(value, str):
        # parse_bool (conversion/mod.rs:204-222): exact word match,
        # then ANY integer string (non-zero = true — "5"/"-3" are
        # true, "00" is false), then case-insensitive words. NO
        # whitespace trimming anywhere.
        if value in ("true", "t", "yes", "y"):
            return True
        if value in ("false", "f", "no", "n", "0"):
            return False
        if value == value.strip() and "_" not in value:
            try:
                return int(value) != 0
            except ValueError:
                pass
        s = value.lower()
        if s in ("true", "t", "yes", "y"):
            return True
        if s in ("false", "f", "no", "n"):
            return False
        # conversion/mod.rs:40 — Invalid boolean value {:?}
        raise VrlError(f'Invalid boolean value "{value}"')
    raise VrlError(f"unable to coerce {vrl_type(value)} into boolean")


def to_int(value: Any) -> int:
    """to_int.rs: int id; float truncates; bool -> 0/1; string parsed
    decimal; timestamp -> unix seconds; null -> 0."""
    if isinstance(value, bool):
        return 1 if value else 0
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        # Rust `f64 as i64`: truncate toward zero, SATURATING at the
        # i64 bounds (to_int.rs: Float(v) => Integer(v as i64); inf
        # and out-of-range floats clamp, they don't raise)
        if value >= 9223372036854775807.0:
            return 9223372036854775807
        if value <= -9223372036854775808.0:
            return -9223372036854775808
        return int(value)
    if value is None:
        return 0
    if isinstance(value, datetime):
        return int(value.timestamp())
    if isinstance(value, str):
        # Rust i64 FromStr: no whitespace, no underscores (see
        # to_float note); Python's int() accepts both
        if value != value.strip() or "_" in value:
            raise VrlError(
                f"unable to coerce {value!r} into integer: Invalid integer")
        try:
            return int(value)
        except ValueError as e:
            raise VrlError(f"unable to coerce {value!r} into integer: Invalid integer") from e
    raise VrlError(f"unable to coerce {vrl_type(value)} into integer")


def to_float(value: Any) -> float:
    if isinstance(value, bool):
        return 1.0 if value else 0.0
    if isinstance(value, (int, float)):
        return float(value)
    if value is None:
        return 0.0
    if isinstance(value, datetime):
        return value.timestamp()
    if isinstance(value, str):
        # Rust f64 FromStr (conversion/mod.rs:161-168): NO surrounding
        # whitespace, NO digit-group underscores — Python's float()
        # accepts both, which silently diverged from the reference
        if value != value.strip() or "_" in value:
            raise VrlError(f"unable to coerce {value!r} into float")
        try:
            f = float(value)
        except ValueError as e:
            raise VrlError(f"unable to coerce {value!r} into float") from e
        if math.isnan(f):
            # NaN parses but is unrepresentable (NotNan; NanFloat)
            raise VrlError(f"unable to coerce {value!r} into float")
        return f
    raise VrlError(f"unable to coerce {vrl_type(value)} into float")


def _fmt_float(f: float) -> str:
    """Rust f64 Display exactly (to_string.rs: Float(v) =>
    v.to_string(); value/value/display.rs:19 `{val}`): shortest
    round-trip digits rendered ALWAYS positionally — std's `{}` never
    emits scientific notation (`{:e}` does) — integral values without
    a trailing ".0" (format!("{}", 2.0) == "2") and the IEEE sign of
    negative zero kept (format!("{}", -0.0) == "-0")."""
    if math.isinf(f):
        return "inf" if f > 0 else "-inf"
    r = repr(f)  # shortest round-trip digits, same as Rust's grisu
    if "e" not in r:
        return r[:-2] if r.endswith(".0") else r
    # expand Python's scientific form positionally
    m, _, e = r.partition("e")
    exp = int(e)
    sign = "-" if m.startswith("-") else ""
    m = m.lstrip("-")
    ip, _, fp = m.partition(".")
    digits = ip + fp
    point = len(ip) + exp
    if point <= 0:
        return sign + "0." + "0" * (-point) + digits
    if point >= len(digits):
        return sign + digits + "0" * (point - len(digits))
    return sign + digits[:point] + "." + digits[point:]


def to_string(value: Any) -> str:
    """to_string.rs: scalars only; objects/arrays error."""
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return _fmt_float(value)
    if value is None:
        return ""
    if isinstance(value, datetime):
        from ..value import timestamp_rfc3339

        return timestamp_rfc3339(value)
    if isinstance(value, bytes):
        return value.decode("utf-8", "replace")
    raise VrlError(f"unable to coerce {vrl_type(value)} into string")


# Python `regex` error text → the Rust regex crate's error phrase
_RUST_RE_ERRS = (
    ("nothing to repeat", "repetition operator missing expression"),
    ("multiple repeat", "repetition operator missing expression"),
    ("missing ), unterminated subpattern", "unclosed group"),
    ("unbalanced parenthesis", "unopened group"),
    ("unterminated character set", "unclosed character class"),
    ("bad escape", "unrecognized escape sequence"),
)


def to_regex(value: str):
    try:
        return _regex.compile(value)
    except _regex.error as e:
        # the Rust regex crate renders parse errors multi-line:
        #   regex parse error:\n    <pat>\n    <caret>\nerror: <what>
        msg = str(e)
        what = next((rust for py, rust in _RUST_RE_ERRS if py in msg), msg)
        pos = getattr(e, "pos", None)
        caret = ""
        if isinstance(pos, int) and "\n" not in value:
            caret = "\n    " + " " * pos + "^"
        raise VrlError("could not create regex: regex parse error:\n"
                       f"    {value}{caret}\nerror: {what}") from e


# --- type asserts (bool.rs etc.): error unless exactly that type -----------

def _assert(value, typ, pyname):
    if vrl_type(value) != typ:
        raise VrlError(f"expected {typ}, got {vrl_type(value)}")
    return value


def assert_bool(value):
    return _assert(value, "boolean", "bool")


def assert_int(value):
    return _assert(value, "integer", "int")


def assert_float(value):
    return _assert(value, "float", "float")


def assert_string(value):
    return _assert(value, "string", "str")


def assert_object(value):
    return _assert(value, "object", "dict")


def assert_array(value):
    return _assert(value, "array", "list")


def assert_timestamp(value):
    return _assert(value, "timestamp", "datetime")


# --- predicates ------------------------------------------------------------

def is_array(value) -> bool:
    return isinstance(value, list)


def is_boolean(value) -> bool:
    return isinstance(value, bool)


def is_empty(value) -> bool:
    """is_empty.rs: strings/arrays/objects only."""
    if isinstance(value, (str, list, dict)):
        return len(value) == 0
    raise VrlError(f"expected string, array or object, got {vrl_type(value)}")


def is_float(value) -> bool:
    return isinstance(value, float)


def is_integer(value) -> bool:
    return isinstance(value, int) and not isinstance(value, bool)


def is_json(value, variant=None) -> bool:
    """is_json.rs: optional variant asserts the parsed JSON type."""
    import json
    if not isinstance(value, str):
        return False
    try:
        parsed = json.loads(value)
    except ValueError:
        return False
    if variant is None:
        return True
    checks = {
        "object": lambda v: isinstance(v, dict),
        "array": lambda v: isinstance(v, list),
        "string": lambda v: isinstance(v, str),
        "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
        "bool": lambda v: isinstance(v, bool),
        "null": lambda v: v is None,
    }
    if variant not in checks:
        # compile-time enum check (compiler/function.rs:697) — the
        # trailing quote is literal in the reference text
        raise VrlError('invalid enum variant"')
    return checks[variant](parsed)


def is_null(value) -> bool:
    return value is None


def is_nullish(value) -> bool:
    """is_nullish.rs: null, "", "-", or whitespace-only string."""
    if value is None:
        return True
    if isinstance(value, str):
        return value == "" or value == "-" or value.strip() == ""
    return False


def is_object(value) -> bool:
    return isinstance(value, dict)


def is_regex(value) -> bool:
    return isinstance(value, (_regex.Pattern, _re.Pattern))


def is_string(value) -> bool:
    return isinstance(value, str)


def is_timestamp(value) -> bool:
    return isinstance(value, datetime)


def type_def(value):
    """type_def.rs: Kind object of the runtime value ({kind: true};
    collections nest per-field/per-index). Kind names follow
    kind.rs:8-22 — strings are the BYTES kind."""
    t = vrl_type(value)
    if t == "object":
        return {"object": {k: type_def(v) for k, v in value.items()}}
    if t == "array":
        return {"array": {str(i): type_def(v) for i, v in enumerate(value)}}
    if t == "string":
        t = "bytes"
    return {t: True}
