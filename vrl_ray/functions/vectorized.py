"""Vectorized Arrow kernels for the pipeline hot path.

Design: every hot stage computes over ``pyarrow`` arrays with
``pyarrow.compute`` (zero-copy from the object store). Grok/regex
extraction uses ``pc.extract_regex`` (RE2) with a sanitized pattern —
RE2 has no lookarounds/atomic groups, so :func:`re2_compatible`
rewrites the oniguruma-style grok expansion; rows RE2 does not match
fall back to the exact row-level engine (Python ``regex``) so the
result is bit-identical to the row oracle (the fallback only fires on
rows that would fail or are pathological — a tiny fraction).

This mirrors the reference's split between compile-time pattern state
and per-event execution (parse_grok.rs:148-169): patterns are
sanitized+compiled once per worker, applied per batch.
"""

from __future__ import annotations

import json as _json
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..grok import GrokPattern

# ---------------------------------------------------------------------------
# RE2 sanitizer


def re2_compatible(pattern: str) -> str:
    """Rewrite a Python-`regex` pattern into RE2-accepted syntax:
    atomic groups ``(?>`` become plain groups, lookaround groups are
    deleted (they only tighten boundaries; the row-level fallback
    restores exactness for rows where this matters)."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if pattern.startswith("(?>", i):
            out.append("(?:")
            i += 3
            continue
        if (
            pattern.startswith("(?=", i)
            or pattern.startswith("(?!", i)
            or pattern.startswith("(?<=", i)
            or pattern.startswith("(?<!", i)
        ):
            # skip the whole lookaround group (balanced parens)
            depth = 0
            j = i
            while j < n:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "(":
                    depth += 1
                elif pattern[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            i = j + 1
            continue
        if pattern.startswith("(?P<", i):
            out.append(c)
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Grok over a batch


class VectorGrok:
    """Compiled-once grok kernel: RE2 fast path + exact fallback.

    ``extract(texts) -> (dict field -> pa.Array, matched: np.ndarray)``
    Semantics identical to parse_grok row-by-row
    (parse_grok.rs:12-25): a non-match is an error (reported via the
    returned mask; caller writes the error lane).
    """

    def __init__(self, pattern: str, definitions: Optional[dict] = None):
        self.grok = GrokPattern(pattern, definitions)
        self._fields = list(self.grok._fields.items())  # [(group, (field, typ))]
        self._re2 = re2_compatible(self.grok.regex.pattern)
        # RE2 anchors: pc.extract_regex searches anywhere; grok .match
        # anchors at start — add ^ if absent.
        if not self._re2.startswith("^"):
            self._re2 = "^" + self._re2
        # verify RE2 accepts it (raises at compile time, not per batch)
        pc.extract_regex(pa.array([""], pa.string()), self._re2)

    def extract(self, texts: pa.Array, consider: Optional[np.ndarray] = None):
        """``consider`` restricts the exact-fallback pass to rows the
        caller classified as this format — without it every JSON/KV row
        would take the per-row Python fallback (the single hottest
        mistake in the pipeline: a Python loop over 2/3 of the data)."""
        struct = pc.extract_regex(texts, self._re2)
        matched = pc.is_valid(struct)
        matched_np = matched.to_numpy(zero_copy_only=False)
        out: dict[str, pa.Array] = {}
        cols = {}
        for group, (field, typ) in self._fields:
            cols[(group, field, typ)] = pc.struct_field(struct, group)
        # exact fallback for rows RE2 missed (lookaround-sensitive or
        # genuinely unparseable) — per-row regex on that subset only
        miss = ~matched_np if consider is None else (consider & ~matched_np)
        miss_idx = np.flatnonzero(miss)
        fallback: dict[int, Optional[dict]] = {}
        if len(miss_idx):
            tl = texts.take(pa.array(miss_idx)).to_pylist()
            for k, t in zip(miss_idx, tl):
                fallback[int(k)] = None if t is None else self.grok.match(t)
        for (group, field, typ), arr in cols.items():
            if fallback:
                py = arr.to_pylist()
                for k, m in fallback.items():
                    if m is not None and field in m:
                        py[k] = str(m[field])
                        matched_np[k] = True
                arr = pa.array(py, pa.string())
            if typ in ("int", "integer"):
                arr = pc.cast(pc.cast(arr, pa.float64()), pa.int64())
            elif typ == "float":
                arr = pc.cast(arr, pa.float64())
            out[field] = arr
        if fallback:
            for k, m in fallback.items():
                if m is not None:
                    matched_np[k] = True
        return out, matched_np


# ---------------------------------------------------------------------------
# Key-value field extraction (vectorized subset of parse_key_value)


class VectorKV:
    """Extract a fixed set of keys from key-value/logfmt lines with
    per-key RE2 passes — the vectorized form of
    ``parse_key_value(text)[key]`` for simple keys (quoted or bare
    values, parse_key_value.rs defaults). One pc.extract_regex pass
    per key; quoted and bare values resolved with if_else."""

    def __init__(self, keys: list[str]):
        self.keys = keys
        self._pats = {
            k: (
                rf'(?:^|\s){k}\s*=\s*"(?P<v>[^"]*)"',
                rf'(?:^|\s){k}\s*=\s*(?P<v>[^\s"]+)',
            )
            for k in keys
        }

    def extract(self, texts: pa.Array) -> dict[str, pa.Array]:
        out = {}
        for k, (quoted, bare) in self._pats.items():
            q = pc.struct_field(pc.extract_regex(texts, quoted), "v")
            b = pc.struct_field(pc.extract_regex(texts, bare), "v")
            out[k] = pc.if_else(pc.is_valid(q), q, b)
        return out


# ---------------------------------------------------------------------------
# JSON subset parse (row loop over ONLY the classified-JSON rows)


def json_extract_subset(
    texts: pa.Array, mask: np.ndarray, keys: list[str]
) -> tuple[dict[str, list], np.ndarray]:
    """parse_json over the masked subset; returns per-key python lists
    (len == len(texts), None elsewhere) and an ok-mask. The Python
    loop touches only the JSON-classified rows."""
    n = len(texts)
    cols: dict[str, list] = {k: [None] * n for k in keys}
    ok = np.zeros(n, dtype=bool)
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return cols, ok
    subset = texts.take(pa.array(idx)).to_pylist()
    loads = _json.loads
    for i, t in zip(idx, subset):
        try:
            obj = loads(t)
        except (ValueError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        ok[i] = True
        for k in keys:
            v = obj.get(k)
            if v is not None and not isinstance(v, (dict, list)):
                cols[k][i] = v
    return cols, ok


# ---------------------------------------------------------------------------
# Safe scalar coercions over arrays (VRL to_int/to_float semantics:
# failure -> null + error mark, never an exception)


def to_int64_lane(arr: pa.Array) -> pa.Array:
    """String/number array -> int64, invalid -> null (the caller owns
    the error lane). Mirrors to_int.rs coercion for strings/floats."""
    if pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.int64())
    if pa.types.is_floating(arr.type):
        return pc.cast(pc.trunc(arr), pa.int64(), safe=False)
    f = _to_float64_or_null(arr)
    return pc.cast(pc.trunc(f), pa.int64(), safe=False)


def to_float64_lane(arr: pa.Array) -> pa.Array:
    if pa.types.is_floating(arr.type):
        return pc.cast(arr, pa.float64())
    if pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.float64())
    return _to_float64_or_null(arr)


def _to_float64_or_null(arr: pa.Array) -> pa.Array:
    """String -> float64 with invalid -> null (Arrow cast either raises
    or we pre-mask with a validity regex)."""
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    valid = pc.match_substring_regex(arr, r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?\s*$")
    cleaned = pc.if_else(pc.fill_null(valid, False), arr, pa.scalar(None, arr.type))
    return pc.cast(pc.utf8_trim_whitespace(cleaned), pa.float64())


def combine_str(masks_and_arrays: list, n: int) -> pa.Array:
    """First-match-wins combination of per-format string columns:
    [(np_mask, pa.Array|None), ...] -> single column."""
    out = pa.nulls(n, pa.string())
    for mask, arr in reversed(masks_and_arrays):
        if arr is None:
            continue
        m = pa.array(mask)
        out = pc.if_else(m, arr, out)
    return out
