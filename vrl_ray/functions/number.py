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
    grouping_separator: Optional[str] = None,
) -> str:
    """format_number.rs:31-106, reproduced operation-for-operation:
    the value renders via rust_decimal Display (shortest digits, no
    exponent, no trailing .0 — _fmt_float), `scale` TRUNCATES or
    zero-pads the fractional TEXT (never rounds: 1234.567 @2 →
    "1234.56"), and grouping inserts the separator at the reference's
    exact computed positions — including its quirk of a LEADING
    separator when the integral text length is a multiple of 3
    (",123,456"), which we reproduce bug-for-bug."""
    v = _num(value)
    if isinstance(v, float):
        # Decimal::from_f64(..).expect("not NaN") — NaN/inf/|x| above
        # Decimal's 2^96 max PANIC in the reference; we error per row.
        if not math.isfinite(v) or abs(v) > 7.922816251426434e28:
            raise VrlError("value not representable as a decimal")
        from .coerce import _fmt_float

        s = _fmt_float(v)
    else:
        s = str(v)
    parts = s.split(".")
    if scale is not None:
        if scale == 0:
            parts = parts[:1]
        else:
            if scale < 0:
                # `i as usize` on a negative scale makes the reference
                # try to push ~2^64 zeros — effectively a hang/abort.
                raise VrlError("invalid scale")
            if len(parts) == 1:
                parts.append("")
            if scale > len(parts[1]):
                parts[1] += "0" * (scale - len(parts[1]))
            else:
                parts[1] = parts[1][:scale]
    if grouping_separator is not None:
        sep = grouping_separator
        ip = parts[0]
        start = len(ip) % 3
        positions = [i for i in range(len(ip) - start) if i % 3 == 0]
        for n, pos in enumerate(positions):
            at = pos + n * len(sep) + start
            ip = ip[:at] + sep + ip[at:]
        parts[0] = ip
    return decimal_separator.join(parts)
