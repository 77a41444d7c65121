"""VRL Value data model — row-level reference semantics.

This module is the single-process *oracle* for the vectorized engine:
plain-Python values with VRL's exact runtime behavior. Pipeline-level
golden tests run the same transform here and through the Ray Data
stages and assert equality.

Semantics mirrored from the reference (file:line into /root/reference):

- Value variants: Bytes(str)/Integer/Float/Boolean/Timestamp/Object/
  Array/Null/Regex (``src/value/value.rs:38-67``). Python mapping:
  str, int, float, bool, datetime (UTC), dict, list, None,
  re.Pattern.
- Floats can never be NaN — arithmetic producing NaN is an error
  (``src/value/value.rs:50-51``,
  ``src/compiler/value/arithmetic.rs:60-64,305-338``).
- i64 arithmetic wraps (``wrapping_add``/``mul``/``sub``,
  ``src/compiler/value/arithmetic.rs:115,143`` and
  ``src/compiler/expression/op.rs:151-156``).
- int / int division always yields float; division by zero is an
  error (``arithmetic.rs:98-110``).
- ``+`` concatenates strings; string + null passes the string
  through (``arithmetic.rs:125-133``); ``*`` repeats a string by an
  int (``arithmetic.rs:68-95``).
- ``==`` is lossy across int/float (``eq_lossy``,
  ``arithmetic.rs:283-293``).
- Truthiness: ONLY null and false are falsy; ``&&`` treats null as
  false but errors on other non-bools; ``||`` returns rhs iff lhs is
  null/false (``arithmetic.rs:159-187``, ``op.rs:131-146``).
- ``|`` merge: shallow object merge, objects only, right wins
  (``arithmetic.rs:272-279``).
- Paths: Field / Index segments, negative indices count from the
  end, insert auto-creates intermediate containers and pads arrays
  with nulls, out-of-range negative insert prepends nulls
  (``src/path/owned.rs:327-330``,
  ``src/value/value/crud/mod.rs:81-95``, ``crud/insert.rs:7,82-87``);
  remove optionally compacts emptied containers upward
  (``crud/remove.rs:5``, ``src/compiler/target.rs:58-72``).
- Object keys serialize in sorted (BTreeMap) order
  (``src/value/value.rs:33-34``).
"""

from __future__ import annotations

import json
import math
import re
from datetime import datetime, timezone
from typing import Any, Iterable, Union

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1
_I64_MOD = 2**64


class VrlError(Exception):
    """A VRL runtime error *value* — caught by ``??`` / infallible
    assignment, never allowed to crash a pipeline stage."""

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


def wrap_i64(n: int) -> int:
    """Wrap an unbounded Python int into i64 two's-complement,
    mirroring Rust's wrapping_* ops (arithmetic.rs:115,143)."""
    n &= _I64_MOD - 1
    return n - _I64_MOD if n > I64_MAX else n


# ---------------------------------------------------------------------------
# Type helpers


def vrl_type(v: Any) -> str:
    """VRL kind name of a Python-represented value
    (src/compiler/value/kind.rs:8-22)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "float"
    if isinstance(v, (str, bytes)):
        return "string"
    if isinstance(v, datetime):
        return "timestamp"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, list):
        return "array"
    if isinstance(v, re.Pattern) or type(v).__name__ == "Pattern":
        # stdlib `re` or the `regex` module — both are VRL regexes
        return "regex"
    raise TypeError(f"not a VRL value: {type(v)!r}")


def is_truthy(v: Any) -> bool:
    """ONLY null and false are falsy (op.rs:131-146)."""
    return not (v is None or v is False)


def rust_debug(v: Any) -> str:
    """Rust `{:?}` of a Value (value.rs derive(Debug)) — some reference
    error texts interpolate it (tally.rs:12)."""
    if v is None:
        return "Null"
    if isinstance(v, bool):
        return f"Boolean({str(v).lower()})"
    if isinstance(v, int):
        return f"Integer({v})"
    if isinstance(v, float):
        return f"Float(NotNan({ryu_f64(v)}))"
    if isinstance(v, str):
        return f'Bytes(b"{v}")'
    if isinstance(v, bytes):
        return f'Bytes(b"{v.decode("utf-8", "replace")}")'
    if isinstance(v, list):
        return "Array([" + ", ".join(rust_debug(x) for x in v) + "])"
    if isinstance(v, dict):
        return ("Object({" + ", ".join(
            f'"{k}": {rust_debug(x)}'
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        ) + "})")
    if isinstance(v, datetime):
        return f"Timestamp({timestamp_rfc3339(v)})"
    return f"Regex({getattr(v, 'pattern', v)!r})"


def check_float(f: float) -> float:
    """NaN is unrepresentable (value.rs:50-51); error out like
    arithmetic.rs:60-64."""
    if math.isnan(f):
        raise VrlError("float operation produced NaN")
    return f


# ---------------------------------------------------------------------------
# Arithmetic / comparison (arithmetic.rs:66-294)


def _num(v: Any) -> Union[int, float]:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise VrlError(f"cannot use {vrl_type(v)} in numeric operation")
    return v


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def add(lhs: Any, rhs: Any) -> Any:
    if isinstance(lhs, str) and isinstance(rhs, str):
        return lhs + rhs
    if isinstance(lhs, str) and rhs is None:
        return lhs
    if lhs is None and isinstance(rhs, str):
        return rhs
    if not (_is_num(lhs) and _is_num(rhs)):
        # error.rs:34: "can't add type {rhs} to {lhs}"
        raise VrlError(f"can't add type {vrl_type(rhs)} to {vrl_type(lhs)}")
    if isinstance(lhs, int) and isinstance(rhs, int):
        return wrap_i64(lhs + rhs)
    return check_float(float(lhs) + float(rhs))


def sub(lhs: Any, rhs: Any) -> Any:
    if not (_is_num(lhs) and _is_num(rhs)):
        # error.rs:37: "can't subtract type {rhs} from {lhs}"
        raise VrlError(
            f"can't subtract type {vrl_type(rhs)} from {vrl_type(lhs)}")
    if isinstance(lhs, int) and isinstance(rhs, int):
        return wrap_i64(lhs - rhs)
    return check_float(float(lhs) - float(rhs))


def mul(lhs: Any, rhs: Any) -> Any:
    # string * int repetition, both orders (arithmetic.rs:68-95)
    if isinstance(lhs, str) and isinstance(rhs, int) and not isinstance(rhs, bool):
        return lhs * rhs
    if isinstance(rhs, str) and isinstance(lhs, int) and not isinstance(lhs, bool):
        return rhs * lhs
    if not (_is_num(lhs) and _is_num(rhs)):
        raise VrlError(
            f"can't multiply type {vrl_type(lhs)} by {vrl_type(rhs)}")
    a, b = lhs, rhs
    if isinstance(a, int) and isinstance(b, int):
        return wrap_i64(a * b)
    return check_float(float(a) * float(b))


def div(lhs: Any, rhs: Any) -> float:
    """Division is always float; /0 errors (arithmetic.rs:98-110)."""
    if not (_is_num(lhs) and _is_num(rhs)):
        raise VrlError(
            f"can't divide type {vrl_type(lhs)} by {vrl_type(rhs)}")
    a, b = lhs, rhs
    if float(b) == 0.0:
        raise VrlError("can't divide by zero")
    return check_float(float(a) / float(b))


def rem(lhs: Any, rhs: Any) -> Any:
    if not (_is_num(lhs) and _is_num(rhs)):
        raise VrlError("can't calculate remainder of type "
                       f"{vrl_type(lhs)} and {vrl_type(rhs)}")
    a, b = lhs, rhs
    if float(b) == 0.0:
        raise VrlError("can't divide by zero")
    if isinstance(a, int) and isinstance(b, int):
        # Rust % truncates toward zero, Python floors — adjust.
        return wrap_i64(a - int(a / b) * b)
    try:
        return check_float(math.fmod(float(a), float(b)))
    except ValueError as e:  # fmod(inf, x) — NaN-producing operation
        raise VrlError("float operation produced NaN") from e


def eq(lhs: Any, rhs: Any) -> bool:
    """Lossy across int/float (eq_lossy, arithmetic.rs:283-293);
    bool vs int are distinct kinds."""
    if isinstance(lhs, bool) != isinstance(rhs, bool):
        return False
    if (
        isinstance(lhs, (int, float))
        and isinstance(rhs, (int, float))
        and not isinstance(lhs, bool)
    ):
        return float(lhs) == float(rhs)
    if vrl_type(lhs) != vrl_type(rhs):
        return False
    return lhs == rhs


def _cmp_ok(lhs: Any, rhs: Any, op: str = ">") -> tuple:
    if isinstance(lhs, str) and isinstance(rhs, str):
        return lhs, rhs
    if isinstance(lhs, datetime) and isinstance(rhs, datetime):
        # timestamps order chronologically (comparison/gt.vrl etc.)
        return lhs, rhs
    if not (_is_num(lhs) and _is_num(rhs)):
        # error.rs:46-55: "can't compare {lhs} {op} {rhs}"
        raise VrlError(
            f"can't compare {vrl_type(lhs)} {op} {vrl_type(rhs)}")
    return float(lhs), float(rhs)


def gt(l: Any, r: Any) -> bool:
    a, b = _cmp_ok(l, r, ">")
    return a > b


def ge(l: Any, r: Any) -> bool:
    a, b = _cmp_ok(l, r, ">=")
    return a >= b


def lt(l: Any, r: Any) -> bool:
    a, b = _cmp_ok(l, r, "<")
    return a < b


def le(l: Any, r: Any) -> bool:
    a, b = _cmp_ok(l, r, "<=")
    return a <= b


def logical_and(lhs: Any, rhs_thunk) -> bool:
    """null → false; non-bool lhs errors; rhs evaluated lazily and must
    be bool/null (arithmetic.rs:159-175)."""
    if lhs is None or lhs is False:
        return False
    if lhs is not True:
        raise VrlError(f"expected boolean, got {vrl_type(lhs)}")
    rhs = rhs_thunk() if callable(rhs_thunk) else rhs_thunk
    if rhs is None:
        return False
    if not isinstance(rhs, bool):
        raise VrlError(f"expected boolean, got {vrl_type(rhs)}")
    return rhs


def logical_or(lhs: Any, rhs_thunk) -> Any:
    """lhs null/false → rhs, else lhs (arithmetic.rs:177-187)."""
    if lhs is None or lhs is False:
        return rhs_thunk() if callable(rhs_thunk) else rhs_thunk
    return lhs


def merge_shallow(lhs: Any, rhs: Any) -> dict:
    """``|`` operator: objects only, right wins
    (arithmetic.rs:272-279)."""
    if not isinstance(lhs, dict) or not isinstance(rhs, dict):
        # error.rs:58: "can't merge type {rhs} into {lhs}"
        raise VrlError(
            f"can't merge type {vrl_type(rhs)} into {vrl_type(lhs)}")
    out = dict(lhs)
    out.update(rhs)
    return out


def coalesce(lhs_thunk, rhs_thunk) -> Any:
    """``??``: rhs iff lhs errored (op.rs:131-146)."""
    try:
        return lhs_thunk() if callable(lhs_thunk) else lhs_thunk
    except VrlError:
        return rhs_thunk() if callable(rhs_thunk) else rhs_thunk


# ---------------------------------------------------------------------------
# Paths (src/path/owned.rs, src/value/value/crud/)

Segment = Union[str, int]  # Field(str) | Index(int)

_PATH_TOKEN = re.compile(
    r"""
    \.?\(?"(?P<quoted>(?:\\.|[^"\\])*)"\)?   # ."quoted field"
    | \[(?P<index>-?\d+)\]                    # [idx]
    | \.?(?P<field>[A-Za-z0-9_@]+)            # .field
    """,
    re.VERBOSE,
)


def parse_path(path: str) -> list[Segment]:
    """Parse a dotted path string (``.a.b[2]."c d"``) into segments.

    Covers the OwnedValuePath surface our engine needs
    (src/path/owned.rs:16-18,327-330); `%` metadata prefix handled by
    the caller.
    """
    if path in (".", ""):
        return []
    segs: list[Segment] = []
    pos = 0
    if path.startswith("."):
        pos = 0  # tokens consume leading dots themselves
    while pos < len(path):
        m = _PATH_TOKEN.match(path, pos)
        if not m:
            raise VrlError(f"invalid path: {path!r} at {pos}")
        if m.group("quoted") is not None:
            segs.append(m.group("quoted").replace('\\"', '"'))
        elif m.group("index") is not None:
            segs.append(int(m.group("index")))
        else:
            f = m.group("field")
            segs.append(int(f) if f.lstrip("-").isdigit() and f[0] == "-" else f)
        pos = m.end()
    return segs


def path_get(value: Any, path: Union[str, Iterable[Segment]]) -> Any:
    """CRUD get (crud/get.rs:5): missing → None (undefined)."""
    segs = parse_path(path) if isinstance(path, str) else list(path)
    cur = value
    for seg in segs:
        if isinstance(seg, int):
            if not isinstance(cur, list):
                return None
            idx = seg if seg >= 0 else len(cur) + seg
            if idx < 0 or idx >= len(cur):
                return None
            cur = cur[idx]
        else:
            if not isinstance(cur, dict) or seg not in cur:
                return None
            cur = cur[seg]
    return cur


def path_insert(value: Any, path: Union[str, Iterable[Segment]], new: Any) -> Any:
    """CRUD insert (crud/insert.rs:7): auto-creates intermediate
    objects/arrays; positive index past end pads with nulls; negative
    index out of range *prepends* nulls (crud/insert.rs:82-87,
    crud/mod.rs:81-95). Returns the (possibly replaced) root."""
    segs = parse_path(path) if isinstance(path, str) else list(path)
    if not segs:
        return new

    def _ins(cur: Any, i: int) -> Any:
        # COPY-ON-WRITE along the spine: VRL values are value-typed
        # (a variable bound to an event object is a logical clone —
        # Rust Value ownership), so mutating through one binding must
        # never leak into another. Python dicts/lists alias, so each
        # container on the written path is shallow-copied.
        seg = segs[i]
        last = i == len(segs) - 1
        if isinstance(seg, int):
            cur = list(cur) if isinstance(cur, list) else []
            if seg >= 0:
                while len(cur) <= seg:
                    cur.append(None)
                idx = seg
            else:
                while len(cur) < -seg:
                    cur.insert(0, None)
                idx = len(cur) + seg
            if last:
                cur[idx] = new
            else:
                cur[idx] = _ins(cur[idx], i + 1)
            return cur
        else:
            cur = dict(cur) if isinstance(cur, dict) else {}
            if last:
                cur[seg] = new
            else:
                cur[seg] = _ins(cur.get(seg), i + 1)
            return cur

    return _ins(value, 0)


def path_remove(
    value: Any, path: Union[str, Iterable[Segment]], compact: bool = False
) -> tuple[Any, Any]:
    """CRUD remove (crud/remove.rs:5): returns (new_root, removed).
    ``compact`` prunes containers emptied by the removal upward
    (target.rs:58-72)."""
    segs = parse_path(path) if isinstance(path, str) else list(path)
    if not segs:
        return None, value
    removed = [None]

    def _rm(cur: Any, i: int) -> Any:
        # copy-on-write along the spine (see path_insert): removal
        # through one binding must not leak into aliases
        seg = segs[i]
        last = i == len(segs) - 1
        if isinstance(seg, int):
            if not isinstance(cur, list):
                return cur
            idx = seg if seg >= 0 else len(cur) + seg
            if idx < 0 or idx >= len(cur):
                return cur
            cur = list(cur)
            if last:
                removed[0] = cur.pop(idx)
            else:
                cur[idx] = _rm(cur[idx], i + 1)
                if compact and cur[idx] in ({}, []):
                    cur.pop(idx)
            return cur
        else:
            if not isinstance(cur, dict) or seg not in cur:
                return cur
            cur = dict(cur)
            if last:
                removed[0] = cur.pop(seg)
            else:
                cur[seg] = _rm(cur[seg], i + 1)
                if compact and cur[seg] in ({}, []):
                    cur.pop(seg)
            return cur

    root = _rm(value, 0)
    return root, removed[0]


# ---------------------------------------------------------------------------
# JSON encoding with VRL's sorted-key (BTreeMap) semantics


def timestamp_rfc3339(dt: datetime) -> str:
    """timestamp_to_string (value.rs:219-221) =
    to_rfc3339_opts(SecondsFormat::AutoSi, true): fractional digits
    come in SI GROUPS — none, millis (3) or micros (6); never 1-5
    digits and never trailing zeros beyond the group."""
    dt = dt.astimezone(timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    us = dt.microsecond
    if us == 0:
        return base + "Z"
    if us % 1000 == 0:
        return f"{base}.{us // 1000:03d}Z"
    return f"{base}.{us:06d}Z"


def _json_default(v: Any):
    if isinstance(v, datetime):
        # VRL timestamps serialize via timestamp_to_string (AutoSi)
        return timestamp_rfc3339(v)
    if isinstance(v, re.Pattern) or type(v).__name__ == "Pattern":
        # both stdlib re and the `regex` module compile VRL regex
        # literals; Value::Regex serializes as its pattern text
        return v.pattern
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    raise TypeError(type(v))


def ryu_f64(f: float) -> str:
    """serde_json's float text = ryu::Buffer::format_finite (ryu
    pretty format64): with the shortest round-trip digits D and kk
    the decimal-point position (10^(kk-1) <= |f| < 10^kk), fixed
    notation iff -5 < kk <= 16 — integral fixed values KEEP ".0" —
    else scientific `d[.ddd]e<kk-1>` with no '+' sign and no zero
    padding in the exponent. Python's repr instead pads ("1e+20",
    "1e-05") and switches to scientific already at 1e-4."""
    if f == 0:
        return "-0.0" if math.copysign(1.0, f) < 0 else "0.0"
    r = repr(f)  # shortest round-trip digits, same set ryu computes
    if "e" in r:
        m, _, e = r.partition("e")
        exp = int(e)
        sign = "-" if m.startswith("-") else ""
        m = m.lstrip("-")
        ip, _, fp = m.partition(".")
        digits = (ip + fp).rstrip("0") or "0"
        kk = len(ip) + exp
    else:
        sign = "-" if r.startswith("-") else ""
        body = r.lstrip("-")
        ip, _, fp = body.partition(".")
        if ip != "0":
            digits = (ip + fp).rstrip("0")
            kk = len(ip)
        else:
            stripped = fp.lstrip("0")
            kk = -(len(fp) - len(stripped))
            digits = stripped.rstrip("0")
    if -5 < kk <= 16:
        if kk <= 0:
            return sign + "0." + "0" * (-kk) + digits
        if kk >= len(digits):
            return sign + digits + "0" * (kk - len(digits)) + ".0"
        return sign + digits[:kk] + "." + digits[kk:]
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return sign + mant + "e" + str(kk - 1)


def _encode_json_ryu(v: Any) -> str:
    """Slow path: pure-Python compact encoder with ryu float text.
    Only runs when the fast json.dumps output contains a float that
    Python formatted scientifically (or a matching substring inside a
    string — a false positive just re-encodes, still correct)."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return ryu_f64(v) if math.isfinite(v) else "null"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, dict):
        return "{" + ",".join(
            json.dumps(str(k), ensure_ascii=False) + ":" + _encode_json_ryu(x)
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        ) + "}"
    if isinstance(v, list):
        return "[" + ",".join(_encode_json_ryu(x) for x in v) + "]"
    return json.dumps(_json_default(v), ensure_ascii=False)


def _pretty_json_ryu(v: Any, level: int = 0) -> str:
    """serde_json::to_string_pretty with ryu float text (2-space
    indent, sorted keys) — the slow lane of encode_json(pretty:true),
    runs only when the tree holds a scientific-range float."""
    pad, inner = "  " * level, "  " * (level + 1)
    if isinstance(v, dict):
        if not v:
            return "{}"
        items = (
            json.dumps(str(k), ensure_ascii=False) + ": "
            + _pretty_json_ryu(x, level + 1)
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        )
        return "{\n" + ",\n".join(inner + i for i in items) + "\n" + pad + "}"
    if isinstance(v, list):
        if not v:
            return "[]"
        return ("[\n" + ",\n".join(
            inner + _pretty_json_ryu(x, level + 1) for x in v)
            + "\n" + pad + "]")
    return _encode_json_ryu(v)


def encode_json(v: Any) -> str:
    """encode_json with lexicographically sorted object keys
    (src/stdlib/encode_json.rs + value.rs:33-34). Non-finite floats
    serialize as null (serde_json serialize_f64; VRL floats are
    NaN-free but ±inf is representable) — Python's json would emit
    the invalid literal `Infinity`. Floats outside Python repr's
    fixed-notation range re-render through ryu_f64 (serde_json uses
    ryu: "1e20"/"1e-6"/"0.00009", never "1e+20"/"1e-06"/"9e-05")."""
    try:
        s = json.dumps(
            v, sort_keys=True, separators=(",", ":"),
            default=_json_default, ensure_ascii=False, allow_nan=False,
        )
    except ValueError:
        return _encode_json_ryu(v)
    if ("e+" in s or "e-" in s) and _has_sci_float(v):
        # a Python-formatted scientific float token (always a signed
        # exponent); the tree scan skips strings that merely contain
        # "e-"/"e+" ("large-scale", arithmetic text)
        return _encode_json_ryu(v)
    return s


def _has_sci_float(v) -> bool:
    """True iff the tree holds a float Python repr formats
    scientifically (|f| >= 1e16 or 0 < |f| < 1e-4) — exactly the set
    where repr and ryu disagree."""
    if isinstance(v, float):
        return v != 0 and not 1e-4 <= abs(v) < 1e16
    if isinstance(v, dict):
        return any(_has_sci_float(x) for x in v.values())
    if isinstance(v, list):
        return any(_has_sci_float(x) for x in v)
    return False


def _definitize(v):
    """Replace non-finite floats with None, recursively (cold path —
    only runs when a dumps(allow_nan=False) attempt failed)."""
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if isinstance(v, dict):
        return {k: _definitize(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_definitize(x) for x in v]
    return v
