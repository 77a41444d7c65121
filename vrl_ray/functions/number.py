"""Number-category stdlib functions (row-level semantics).

Mirrors /root/reference/src/stdlib/{abs,ceil,floor,round,mod,
format_int,format_number}.rs.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Union

from ..value import VrlError, wrap_i64, rem as _rem

__all__ = ["abs_", "ceil", "floor", "round_", "mod_", "format_int", "format_number"]

Num = Union[int, float]


def _num(v: Any) -> Num:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise VrlError("expected integer or float")
    return v


def abs_(value: Num) -> Num:
    v = _num(value)
    return wrap_i64(abs(v)) if isinstance(v, int) else abs(v)


def _with_precision(v: float, precision: int, fn) -> float:
    if not math.isfinite(v):
        return v                 # f64::ceil/floor(±inf) == ±inf
    factor = 10 ** precision
    out = fn(v * factor) / factor
    # IEEE zero-sign: Rust f64 ceil/floor/round keep the input's sign
    # when the result is zero (ceil(-0.3) == -0.0); Python's
    # math.ceil/floor return INT 0, losing it — encode_json then
    # diverges ("-0.0" vs "0.0"). Fuzz-found r5.
    return math.copysign(out, v) if out == 0 else out


def ceil(value: Num, precision: int = 0) -> Num:
    """ceil.rs: an integer input returns UNCHANGED at any precision
    (Value::Integer(_) => Ok(value)); floats stay floats, ±inf passes
    through (f64::ceil)."""
    v = _num(value)
    if isinstance(v, int):
        return v
    return _with_precision(float(v), precision, math.ceil)


def floor(value: Num, precision: int = 0) -> Num:
    """floor.rs: same integer/float/±inf contract as ceil."""
    v = _num(value)
    if isinstance(v, int):
        return v
    return _with_precision(float(v), precision, math.floor)


def round_(value: Num, precision: int = 0) -> Num:
    """round.rs: half-away-from-zero (Rust f64::round). An integer
    input returns unchanged (any precision); a float input returns a
    FLOAT regardless of precision (round(4.345) == 4.0 — docs rule +
    round.rs from_f64_or_zero; the old int() return was a type
    divergence, and it overflowed on ±inf)."""
    v = _num(value)
    if isinstance(v, int):
        return v
    if not math.isfinite(v):
        return v                 # f64::round(inf) == inf
    factor = 10 ** precision
    scaled = float(v) * factor
    r = math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)
    out = r / factor
    # IEEE zero-sign (see _with_precision): round(-0.3) == -0.0
    return math.copysign(out, scaled) if out == 0 else out


def mod_(value: Num, modulus: Num) -> Num:
    """mod.rs: same semantics as the `%` operator (truncated,
    /0 errors)."""
    return _rem(value, modulus)


def format_int(value: int, base: int = 10) -> str:
    """format_int.rs: render in base 2..=36."""
    if not (2 <= base <= 36):
        raise VrlError(f"invalid base {base}: must be be between 2 and 36 (inclusive)")
    v = value
    if isinstance(v, bool) or not isinstance(v, int):
        raise VrlError("expected integer")
    neg = v < 0
    v = abs(v)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if v == 0:
        s = "0"
    else:
        out = []
        while v:
            out.append(digits[v % base])
            v //= base
        s = "".join(reversed(out))
    return "-" + s if neg else s


def format_number(
    value: Num,
    scale: Optional[int] = None,
    decimal_separator: str = ".",
    grouping_separator: str = "",
) -> str:
    """format_number.rs: fixed scale + custom separators (grouping
    only when a grouping_separator is given)."""
    v = _num(value)
    if scale is not None:
        s = f"{float(v):.{scale}f}"
    elif isinstance(v, int):
        s = str(v)
    else:
        # format_number.rs:38,58 renders via rust_decimal::Decimal —
        # always positional, no trailing ".0" (Display semantics)
        from .coerce import _fmt_float

        s = _fmt_float(float(v))
    if "." in s:
        int_part, frac = s.split(".", 1)
    else:
        int_part, frac = s, None
    neg = int_part.startswith("-")
    if neg:
        int_part = int_part[1:]
    groups = []
    while len(int_part) > 3:
        groups.append(int_part[-3:])
        int_part = int_part[:-3]
    groups.append(int_part)
    out = grouping_separator.join(reversed(groups))
    if neg:
        out = "-" + out
    if frac is not None:
        out += decimal_separator + frac
    return out
