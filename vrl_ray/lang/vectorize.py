"""Vectorizing compiler: VRL program → Arrow column plan.

The reference compiles a program once and interprets it per event
(runtime.rs:96-128). Our fast path goes further: when every statement
of a program falls inside the vectorizable subset, the whole program
compiles to a sequence of pyarrow.compute column operations executed
once per BATCH — no per-row Python at all. Anything outside the
subset raises :class:`NotVectorizable` and the remap stage falls back
to the per-row interpreter (same observable semantics, slower).

Vectorizable subset (late r4):
- statements: `.field = expr` / `.a.b = expr` (struct writes; a
  write into a NULL row creates a fresh object with only the written
  path — shape union lanes), `ok, err =` destructuring (event /
  nested / variable targets), variable assignment, `|=`
  merge-assign, `%metadata` writes (transient mangled namespace),
  whole-event replacement (`. = parse_json!(.msg)`), bare
  expression statements (value discarded, errors kill), general
  if/else-if statements incl. NESTED branch targets, `abort` /
  `return`, and `for_each` accumulators
- expressions: literals (incl. t'…' timestamps, regex, computed and
  heterogeneous containers), event/nested/metadata paths,
  constant-index list reads (`.arr[0]`, negative from the end),
  whole-event reads before any write, variables, all binary ops
  with exact VRL semantics (wrapping i64, per-row kind-named
  errors, `|` shallow merge, `??`, null-falsy `&&`/`||`), `!`, if
  expressions (mixed branch types → tagged union lanes),
  `map_values`/`map_keys`/`filter` closures, del/exists over event
  paths, and the kernel registry
- kernels: the r3 set plus encode_json, parse_json (per-shape
  lanes), length, push, append, includes, the type-assert family
  (string!/int!/…) — and a GENERIC row-loop tier that runs any
  other pure registry function per row bounded to its statement
  (exact row semantics; the rest of the program stays columnar).
  Nondeterministic / environment / side-effect functions always
  take the row path.

Error-as-value: every compiled expression yields ``(values,
errs|None)`` where ``errs`` is a per-row string array — the same
shape the flagship parse stage uses (SURVEY §7 "error/abort
semantics vectorized").
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .parser import parse, ParseError

# Broad-exception → _RowFallback conversions in VectorProgram.run,
# keyed by exception class (ADVICE r5): lets soaks/benches spot a
# kernel bug masquerading as a silent row-path fallback.
FALLBACK_CONVERSIONS: Counter = Counter()


class NotVectorizable(Exception):
    """Program uses constructs outside the vectorized subset."""


# ---------------------------------------------------------------------------
# helpers

def _nulls(n: int, typ=pa.string()):
    return pa.nulls(n, typ)


def _as_array(v, n: int):
    """Scalar results (constant expressions / all-scalar if_else)
    broadcast to a full column."""
    if isinstance(v, pa.Scalar):
        return pa.repeat(v, n)
    return v


class _Union:
    """Per-row dynamic-type column (r4): parallel full-length lanes +
    an int8 numpy tag saying which lane owns each row (every row is
    owned by exactly one lane; a lane's values on foreign rows are
    meaningless). Created by :func:`_blend` when an `if` expression's
    branches produce Arrow-incompatible types (the interpreter allows
    per-row types, e.g. ``if c { 1 } else { "x" }``) — previously a
    whole-batch row fallback.

    Consumers dispatch LANE-WISE (:func:`_u_args` for kernels,
    :func:`_u_binop` for binops): run the operation once per lane,
    mask each lane's values/errors to its owned rows, and blend —
    which may itself produce a (possibly deeper) union. Sites that
    don't support unions degrade via the poison ``type`` property to
    the row path, never to a crash."""

    __slots__ = ("tag", "lanes", "n")

    def __init__(self, tag: np.ndarray, lanes: list, n: int):
        self.tag = tag          # np.int8, len n
        self.lanes = lanes      # list[pa.Array], each len n
        self.n = n

    @property
    def type(self):
        # poison: any site that reads .type to pick a kernel cannot
        # handle a per-row-typed column — degrade to the row path
        raise _RowFallback("union column type probe")

    def __iter__(self):
        raise _RowFallback("union column iterated")

    def __len__(self):
        return self.n

    def iter_lanes(self):
        """Yield (np-bool owned-rows mask, lane array) for non-empty
        lanes."""
        for code, lane in enumerate(self.lanes):
            mask = self.tag == code
            if mask.any():
                yield mask, lane

    def mask_null(self, bad) -> "_Union":
        """Null out `bad` rows (boolean Arrow array) by RETAGGING them
        to a null lane. Retag, not per-lane bitmaps: a struct lane with
        a union child must never receive a validity bitmap — the next
        pc.struct_field on it hits Arrow's CHECK (array_nested.cc:1142,
        unions may not carry validity) and ABORTS the process."""
        bad_np = pc.fill_null(bad, False).to_numpy(zero_copy_only=False)
        if not bad_np.any():
            return self
        tag = self.tag.copy()
        lanes = list(self.lanes)
        null_code = None
        for code, lane in enumerate(lanes):
            if pa.types.is_null(lane.type):
                null_code = code
                break
        if null_code is None:
            lanes.append(_nulls(self.n, pa.null()))
            null_code = len(lanes) - 1
        tag[bad_np] = null_code
        return _Union(tag, lanes, self.n)

    def to_arrow(self) -> pa.UnionArray:
        """Materialize as a DENSE Arrow union. Dense, not sparse:
        pyarrow 16 mishandles sliced sparse unions (children ignore
        the slice offset — ``u.slice(2,1)`` reads child index 0), and
        Ray blocks slice tables constantly; dense unions slice /
        take / filter correctly."""
        return _dense_union(self.tag, self.lanes, self.n)


def _contains_union(t: pa.DataType) -> bool:
    """True when `t` is or nests a union type (struct/list children)."""
    if pa.types.is_union(t):
        return True
    if pa.types.is_struct(t):
        return any(_contains_union(t.field(i).type)
                   for i in range(t.num_fields))
    if _is_list_type(t):
        return _contains_union(t.value_type)
    return False


def _null_rows(arr, bad, n: int):
    """`arr` with `bad` rows nulled. pc.if_else with a typed null
    scalar where Arrow supports it; union-bearing types (no if_else
    kernel, and unions may NOT carry a validity bitmap — take with a
    null index hard-aborts Arrow) rebuild structurally: structs get a
    widened null mask, dense unions null their children's owned
    positions."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        return pc.if_else(bad, pa.scalar(None, arr.type), arr)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
            pa.ArrowTypeError, TypeError):
        pass
    t = arr.type
    if pa.types.is_struct(t):
        if _contains_union(t):
            # A validity bitmap on this struct would poison every
            # later pc.struct_field: Arrow pushes parent validity into
            # the child, and a union with a validity bitmap trips a
            # CHECK that ABORTS the process (array_nested.cc:1142) —
            # uncatchable from Python. Degrade to the row path.
            raise _RowFallback("null-mask struct with union child")
        mask = pc.or_(pc.is_null(arr), pc.fill_null(bad, False))
        children = [arr.field(i) for i in range(t.num_fields)]
        return pa.StructArray.from_arrays(
            children, names=[t.field(i).name
                             for i in range(t.num_fields)],
            mask=mask)
    if _is_list_type(t):
        # lists carry validity; a null at offsets[i] marks list i
        # null (works for any value type incl. unions)
        bad_np = pc.fill_null(bad, False).to_numpy(zero_copy_only=False)
        already = pc.is_null(arr).to_numpy(zero_copy_only=False)
        off_np = np.asarray(arr.offsets, np.int64)
        cls = pa.LargeListArray if pa.types.is_large_list(t) \
            else pa.ListArray
        ot = pa.int64() if pa.types.is_large_list(t) else pa.int32()
        new_off = pa.array(
            [None if (i < n and (bad_np[i] or already[i]))
             else int(off_np[i]) for i in range(n + 1)], ot)
        return cls.from_arrays(new_off, arr.values)
    if pa.types.is_union(t):
        # a union has no top-level validity: null each child's owned
        # positions instead (the row reads back as a null value)
        bad_np = pc.fill_null(bad, False).to_numpy(zero_copy_only=False)
        tags = np.asarray(arr.type_codes)
        offs = np.asarray(arr.offsets)
        children = []
        for i in range(t.num_fields):
            code = t.type_codes[i]
            child = arr.field(i)
            sel = bad_np & (tags == code)
            if sel.any() and not pa.types.is_null(child.type):
                cb = np.zeros(len(child), bool)
                cb[offs[sel]] = True
                child = _null_rows(child, pa.array(cb), len(child))
            children.append(child)
        return pa.UnionArray.from_dense(
            pa.array(tags, pa.int8()), pa.array(offs, pa.int32()),
            children, [t.field(i).name for i in range(t.num_fields)])
    raise _RowFallback(f"cannot null rows of {t}")


def _from_arrow_union(arr: pa.UnionArray, n: int) -> "_Union":
    """Dense Arrow union → the engine's _Union (full-length lanes +
    ownership tag), so kernels lane-dispatch values read OUT of
    union-typed columns/children (e.g. `.p.a` over mixed-kind
    parse_json lanes) instead of erroring on the union type."""
    t = arr.type
    tags_raw = np.asarray(arr.type_codes)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    lanes = []
    tag = np.zeros(n, np.int8)
    for i in range(t.num_fields):
        code = t.type_codes[i]
        child = arr.field(i)
        mask = tags_raw == code
        if len(child) == 0:
            lanes.append(_nulls(n, child.type))
        else:
            idx = np.zeros(n, np.int64)
            idx[mask] = offs[mask]
            lanes.append(child.take(pa.array(idx, mask=~mask)))
        tag[mask] = i
    return _Union(tag, lanes, n)


def _dense_union(tag: np.ndarray, lanes: list, n: int) -> pa.UnionArray:
    """Full-length lanes + ownership tag → dense Arrow union (each
    child compacted to its owned rows, value_offsets = per-lane
    running index)."""
    offsets = np.zeros(n, np.int32)
    children = []
    for code, lane in enumerate(lanes):
        mask = tag == code
        offsets[mask] = np.arange(int(mask.sum()), dtype=np.int32)
        if isinstance(lane, pa.ChunkedArray):
            lane = lane.combine_chunks()
        children.append(lane.filter(pa.array(mask)))
    return pa.UnionArray.from_dense(
        pa.array(tag, pa.int8()), pa.array(offsets, pa.int32()),
        children)


class _PyConst:
    """A constant Python value (e.g. a compiled regex) flowing as a
    call argument into the generic row-loop tier — the one consumer
    that can hold non-Arrow values. Any other site treats it as
    unusable and degrades via the poison ``type`` probe."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    @property
    def type(self):
        raise _RowFallback("python-constant argument")


def _pattern_str(v):
    """Regex-pattern argument → its source string (compiled-pattern
    constant or a plain string scalar); None when neither."""
    if isinstance(v, _PyConst):
        return v.value.pattern
    if isinstance(v, pa.Scalar):
        p = v.as_py()
        return p if isinstance(p, str) else None
    return None


def _to_union(v, n: int) -> _Union:
    if isinstance(v, _Union):
        return v
    return _Union(np.zeros(n, np.int8), [_as_array(v, n)], n)


def _mask_np(c, n: int) -> np.ndarray:
    ca = _as_array(c, n)
    return pc.fill_null(ca, False).to_numpy(zero_copy_only=False)


def _union_blend(c, tv, ev, n: int) -> _Union:
    """if_else over at least one incompatible side: merge into a
    union — rows where `c` take tv's lane, the rest keep ev's."""
    tu, eu = _to_union(tv, n), _to_union(ev, n)
    m = _mask_np(c, n)
    tag = np.where(m, tu.tag, eu.tag + np.int8(len(tu.lanes))) \
        .astype(np.int8)
    out = _Union(tag, list(tu.lanes) + list(eu.lanes), n)
    # compact: drop lanes that own no rows (keeps lane count bounded
    # across long else-if chains)
    live = [(code, lane) for code, lane in enumerate(out.lanes)
            if (out.tag == code).any()]
    if len(live) == 1:
        # one side fully shadowed: back to a plain column
        return live[0][1]
    if len(live) == len(out.lanes):
        return out
    remap = np.zeros(len(out.lanes), np.int8)
    lanes = []
    for new_code, (code, lane) in enumerate(live):
        remap[code] = new_code
        lanes.append(lane)
    return _Union(remap[out.tag], lanes, n)


def _merge_errs(n: int, *errs):
    out = None
    for e in errs:
        if e is None:
            continue
        out = e if out is None else pc.if_else(pc.is_valid(out), out, e)
    return out


def _is_num_type(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def _vrl_kind_name(t: pa.DataType) -> str:
    """VRL kind name of an Arrow type (for comparison error text)."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    if pa.types.is_struct(t):
        return "object"
    return "null"


def _type_pair_errs(ctx, tmpl: str, la, ra) -> pa.Array:
    """Uniformly-invalid operand types (e.g. a boolean column in
    arithmetic): EVERY row errors with its null-aware kind pair —
    vectorized, no batch fallback."""
    lk, rk = _vrl_kind_name(la.type), _vrl_kind_name(ra.type)
    ln = pc.is_null(la).to_numpy(zero_copy_only=False)
    rn = pc.is_null(ra).to_numpy(zero_copy_only=False)
    msgs = [tmpl.format(l="null" if ln[i] else lk,
                        r="null" if rn[i] else rk)
            for i in range(ctx.n)]
    return pa.array(msgs, pa.string())


def _num_or_null(t: pa.DataType) -> bool:
    return _is_num_type(t) or pa.types.is_null(t)


def _is_str_type(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _typ(v) -> pa.DataType:
    return v.type


def _err_where(mask, message: str, n: int):
    """error-string array: message where mask, null elsewhere."""
    return pc.if_else(mask, pa.scalar(message, pa.string()),
                      _nulls(n))


#: in-band abort channel: `f!()` errors are UNCATCHABLE — the
#: interpreter raises VrlRuntimeError straight through `ok, err =`
#: (_eval_assign catches VrlError only), `??` (value.coalesce) and
#: outer-call framing (_eval_call). The column error lane carries
#: them tagged with a prefix no real message can contain (NULs);
#: capture sites skip tagged rows and run() strips the tag before
#: the text lands in `vrl_err`.
_ABORT = "\x00vrl:abort\x00"


def _abort_mask(e):
    """Boolean mask of abort-tagged rows, or None when none are."""
    if e is None:
        return None
    m = pc.fill_null(pc.starts_with(e, pattern=_ABORT), False)
    return m if pc.any(m).as_py() else None


def _tag_abort(e):
    """Tag every valid, not-yet-tagged error row as an abort."""
    already = pc.fill_null(pc.starts_with(e, pattern=_ABORT), False)
    tagged = pc.binary_join_element_wise(
        pa.scalar(_ABORT, pa.string()), e, "")
    return pc.if_else(already, e, tagged)


def _strip_abort(e):
    """Remove the abort tag (final `vrl_err` text is the plain
    message, same as the interpreter's VrlRuntimeError str)."""
    if e is None:
        return None
    return pc.replace_substring(e, pattern=_ABORT, replacement="",
                                max_replacements=1)


# ---------------------------------------------------------------------------
# kernel registry: name -> (fn(ctx, args) -> (values, errs), default)

def _k_downcase(ctx, a):
    v, e = a[0]
    return pc.utf8_lower(v), e


def _k_upcase(ctx, a):
    v, e = a[0]
    return pc.utf8_upper(v), e


def _call_frame(name: str, span) -> str:
    """The interpreter's positioned diagnostic prefix
    (`function call error for "f" at (s:e): `, interpreter.py:346)."""
    at = f" at ({span[0]}:{span[1]})" if span else ""
    return f'function call error for "{name}"{at}: '


def _masked_err_msgs(bad, msg_fn, values, *, n):
    """Interpreter-parity error column built by a Python callback on
    ERROR rows only (masked-fallback idiom: errors are the rare case,
    so per-row text construction costs O(bad), not O(n))."""

    bad_np = pc.fill_null(bad, False).to_numpy(zero_copy_only=False)
    if not bad_np.any():
        return None
    idx = np.flatnonzero(bad_np)
    arr = (values.combine_chunks()
           if isinstance(values, pa.ChunkedArray) else values)
    vals = arr.take(pa.array(idx)).to_pylist()
    msgs = np.full(n, None, dtype=object)
    for i, val in zip(idx, vals):
        msgs[i] = msg_fn(val)
    return pa.array(msgs, pa.string())


def _coerce_err_msgs(v, bad, *, name, span, tail, n):
    """`function call error for "<name>" at (s:e): unable to coerce
    <value!r> into <tail>` — exact interpreter text (coerce.py) with
    the value's Python repr, built on error rows only."""
    prefix = _call_frame(name, span)
    sv = v if pa.types.is_string(_typ(v)) else pc.cast(v, pa.string())
    return _masked_err_msgs(
        bad, lambda val: f"{prefix}unable to coerce {val!r} into {tail}",
        sv, n=n)


def _ts_us_float(v, n):
    """Timestamp column → epoch seconds float64 — identical to
    datetime.timestamp(): one float division of the exact
    microsecond count."""
    va = _as_array(v, n)
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    us = pc.cast(pc.cast(va, pa.timestamp("us", tz="UTC")), pa.int64())
    return pc.divide(pc.cast(us, pa.float64()),
                     pa.scalar(1e6, pa.float64()))


def _k_to_int(ctx, a, span=None):
    from ..functions.vectorized import to_int64_lane

    v, e = a[0]
    if pa.types.is_timestamp(_typ(v)):
        # to_int.rs: unix seconds — int(timestamp()) truncates the
        # epoch-seconds FLOAT toward zero
        sec = _ts_us_float(v, ctx.n)
        out = pc.cast(pc.trunc(sec), pa.int64())
        return pc.fill_null(out, 0), e
    out = to_int64_lane(v)
    bad = pc.and_(pc.is_valid(v), pc.is_null(out))
    errs = _coerce_err_msgs(v, bad, name="to_int", span=span,
                            tail="integer: Invalid integer", n=ctx.n)
    # type default on error (assignment.rs:522-549); null coerces to 0
    # with NO error (to_int.rs:12)
    out = pc.fill_null(pc.if_else(bad, pa.scalar(0, pa.int64()), out), 0)
    return out, _merge_errs(ctx.n, e, errs)


def _k_to_float(ctx, a, span=None):
    from ..functions.vectorized import to_float64_lane

    v, e = a[0]
    if pa.types.is_timestamp(_typ(v)):
        # to_float.rs: timestamp -> epoch seconds float
        return pc.fill_null(_ts_us_float(v, ctx.n), 0.0), e
    out = to_float64_lane(v)
    bad = pc.and_(pc.is_valid(v), pc.is_null(out))
    errs = _coerce_err_msgs(v, bad, name="to_float", span=span,
                            tail="float", n=ctx.n)
    # null coerces to 0.0 with no error (to_float.rs:17)
    out = pc.fill_null(
        pc.if_else(bad, pa.scalar(0.0, pa.float64()), out), 0.0)
    return out, _merge_errs(ctx.n, e, errs)


def _k_to_string(ctx, a):
    v, e = a[0]
    if pa.types.is_timestamp(_typ(v)):
        # RFC3339 text via the row encoder per DISTINCT value
        from ..functions.coerce import to_string as _row_ts
        va = _as_array(v, ctx.n)
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        dct = va.dictionary_encode()
        uniq = [None if u is None else _row_ts(u)
                for u in dct.dictionary.to_pylist()]
        out = pa.DictionaryArray.from_arrays(
            dct.indices, pa.array(uniq, pa.string())).cast(pa.string())
        return pc.fill_null(out, ""), e
    # null coerces to "" (to_string.rs:12)
    out = pc.fill_null(pc.cast(v, pa.string()), "")
    if pa.types.is_floating(_typ(v)):
        # Arrow's cast matches Rust f64 Display ("-0", no ".0") in
        # the fixed range but goes scientific at |x| >= 1e15 — Rust
        # Display NEVER does; re-render those rows positionally
        bad = pc.match_substring(out, "e")
        if pc.any(bad).as_py():
            from ..functions.coerce import _fmt_float
            va = _as_array(v, ctx.n)
            if isinstance(va, pa.ChunkedArray):
                va = va.combine_chunks()
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            bad = pc.fill_null(bad, False)
            if isinstance(bad, pa.ChunkedArray):
                bad = bad.combine_chunks()
            repl = pa.array([_fmt_float(x) for x in
                             pc.filter(va, bad).to_pylist()], pa.string())
            out = pc.replace_with_mask(out, bad, repl)
    return out, e


def _k_round(ctx, a):
    v, e = a[0]
    prec = 0
    if len(a) > 1:
        prec = a[1][0].as_py() if isinstance(a[1][0], pa.Scalar) else a[1][0]
    if pa.types.is_integer(_typ(v)):
        return v, e   # round.rs: integer input is identity
    # VRL round = half away from zero (round.rs via f64::round); a
    # float input stays FLOAT at every precision (round(4.345) == 4.0
    # — docs rule + round.rs from_f64_or_zero)
    out = pc.round(v, ndigits=int(prec),
                   round_mode="half_towards_infinity")
    return out, e


def _precision(a) -> int:
    if len(a) < 2:
        return 0
    p = a[1][0]
    p = p.as_py() if isinstance(p, pa.Scalar) else None
    if not isinstance(p, int) or isinstance(p, bool):
        raise NotVectorizable("precision arg")
    return p


def _k_floor(ctx, a):
    v, e = a[0]
    if pa.types.is_integer(_typ(v)):
        return v, e   # floor.rs: integer input is identity (stays int)
    prec = _precision(a)
    if prec == 0:
        return pc.floor(v), e
    return pc.round(v, ndigits=prec, round_mode="down"), e


def _k_ceil(ctx, a):
    v, e = a[0]
    if pa.types.is_integer(_typ(v)):
        return v, e   # ceil.rs: integer input is identity (stays int)
    prec = _precision(a)
    if prec == 0:
        return pc.ceil(v), e
    return pc.round(v, ndigits=prec, round_mode="up"), e


def _k_abs(ctx, a):
    v, e = a[0]
    return pc.abs(v), e


def _k_strlen(ctx, a):
    v, e = a[0]
    return pc.cast(pc.utf8_length(v), pa.int64()), e


def _case_insensitive(a) -> bool:
    """Literal `case_sensitive` third arg of contains/starts_with/
    ends_with → Arrow's ignore_case; non-literal falls back."""
    if len(a) < 3:
        return False
    c = a[2][0]
    c = c.as_py() if isinstance(c, pa.Scalar) else None
    if not isinstance(c, bool):
        raise NotVectorizable("case_sensitive arg")
    return not c


def _k_contains(ctx, a):
    v, e = a[0]
    pat = a[1][0]
    return pc.match_substring(
        v, pat.as_py() if isinstance(pat, pa.Scalar) else pat,
        ignore_case=_case_insensitive(a)), e


def _k_starts_with(ctx, a):
    v, e = a[0]
    pat = a[1][0]
    return pc.starts_with(
        v, pattern=pat.as_py() if isinstance(pat, pa.Scalar) else pat,
        ignore_case=_case_insensitive(a)), e


def _k_ends_with(ctx, a):
    v, e = a[0]
    pat = a[1][0]
    return pc.ends_with(
        v, pattern=pat.as_py() if isinstance(pat, pa.Scalar) else pat,
        ignore_case=_case_insensitive(a)), e


def _k_replace(ctx, a, nodes, span=None):
    """replace.rs: literal pattern → pc.replace_substring, regex
    literal → pc.replace_substring_regex (replacement strings with
    $-group refs / backslashes fall back — RE2 rewrite syntax
    differs); literal `count` maps to max_replacements."""
    v, e = a[0]
    pat, rep = _pattern_str(a[1][0]), a[2][0]
    rep = rep.as_py() if isinstance(rep, pa.Scalar) else None
    if not isinstance(pat, str) or not isinstance(rep, str):
        raise NotVectorizable("replace args")
    count = None
    if len(a) > 3:
        c = a[3][0]
        c = c.as_py() if isinstance(c, pa.Scalar) else None
        if not isinstance(c, int) or isinstance(c, bool) or c < -1:
            raise NotVectorizable("replace count")
        count = None if c == -1 else c
    if nodes[1][0] == "regex":
        if "$" in rep or "\\" in rep:
            raise NotVectorizable("replace rewrite refs")
        out = pc.replace_substring_regex(
            v, pat, rep, max_replacements=count)
    else:
        out = pc.replace_substring(v, pat, rep, max_replacements=count)
    return out, e


def _k_match(ctx, a):
    v, e = a[0]
    pat = _pattern_str(a[1][0])
    if pat is None:
        raise _RowFallback("match pattern")
    return pc.match_substring_regex(v, pat), e


def _k_is_null(ctx, a):
    v, e = a[0]
    return pc.is_null(v), e


def _k_is_nullish(ctx, a):
    # is_nullish.rs: null, "", "-", or whitespace-only strings
    v, e = a[0]
    if pa.types.is_string(v.type):
        trimmed = pc.utf8_trim_whitespace(v)
        nullish = pc.or_(pc.equal(trimmed, ""), pc.equal(trimmed, "-"))
        return pc.fill_null(pc.or_(pc.is_null(v), nullish), True), e
    return pc.is_null(v), e


def _k_format_timestamp(ctx, a):
    from ..functions.parse import _chrono_to_strptime

    v, e = a[0]
    if len(a) > 2:
        tz = a[2][0]
        tz = tz.as_py() if isinstance(tz, pa.Scalar) else None
        if tz not in ("UTC", "Etc/UTC"):
            raise NotVectorizable("format_timestamp timezone")
    fmt = a[1][0]
    fmt = fmt.as_py() if isinstance(fmt, pa.Scalar) else None
    if not isinstance(fmt, str):
        raise NotVectorizable("format_timestamp format")
    out = pc.strftime(v, format=_chrono_to_strptime(fmt))
    if "%f" not in fmt and "%.f" not in fmt:
        # Arrow's %S always renders fractional seconds; chrono's only
        # with an explicit %.f — strip the fraction for parity
        out = pc.replace_substring_regex(out, r"\.\d{6}", "")
    return out, e


def _k_parse_timestamp(ctx, a, span=None):

    from ..functions.parse import _chrono_to_strptime
    from ..functions.parse import parse_timestamp as _scalar_pt
    from ..value import VrlError

    v, e = a[0]
    if len(a) > 2:
        # timezone argument: the scalar path owns those semantics
        raise NotVectorizable("parse_timestamp timezone")
    fmt = a[1][0]
    fmt = fmt.as_py() if isinstance(fmt, pa.Scalar) else None
    if not isinstance(fmt, str):
        raise NotVectorizable("parse_timestamp format")
    out = pc.strptime(v, format=_chrono_to_strptime(fmt), unit="us",
                      error_is_null=True)
    if out.type.tz is None:      # VRL timestamps are UTC; %z formats
        out = pc.assume_timezone(out, "UTC")   # come back tz-aware
    elif out.type.tz != "UTC":
        out = out.cast(pa.timestamp("us", tz="UTC"))
    # null input is ALSO an error (parse_timestamp.rs: only
    # bytes/timestamp convert) — the scalar fallback below reproduces
    # the interpreter's exact message for it
    bad = pc.is_null(out)
    bad_np = pc.fill_null(bad, False).to_numpy(zero_copy_only=False)
    if not bad_np.any():
        return out, e
    # masked scalar fallback on the FAILING rows only: Arrow's strptime
    # is stricter than the interpreter's, and the interpreter's exact
    # per-row error text (positioned call frame + strptime message)
    # can't be built from a kernel
    idx = np.flatnonzero(bad_np)
    arr = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
    vals = arr.take(pa.array(idx)).to_pylist()
    prefix = _call_frame("parse_timestamp", span)
    msgs = np.full(ctx.n, None, dtype=object)
    fixed = {}
    from datetime import datetime, timezone

    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    for i, s in zip(idx, vals):
        try:
            fixed[int(i)] = _scalar_pt(s, fmt)
        except VrlError as ex:
            msgs[i] = prefix + ex.message
            # `ok, err =` default: exactly-timestamp kinds default to
            # the epoch (kind.rs:60-66)
            fixed[int(i)] = epoch
    if fixed:
        lst = out.to_pylist()
        for i, dt in fixed.items():
            lst[i] = dt
        out = pa.array(lst, pa.timestamp("us", tz="UTC"))
    errs = pa.array(msgs, pa.string())
    if not pc.any(pc.is_valid(errs)).as_py():
        errs = None
    return out, _merge_errs(ctx.n, e, errs)


def _k_to_unix_timestamp(ctx, a):
    v, e = a[0]
    unit = "seconds"
    if len(a) > 1:
        u = a[1][0]
        unit = u.as_py() if isinstance(u, pa.Scalar) else None
        if unit not in ("seconds", "milliseconds", "nanoseconds"):
            raise NotVectorizable("to_unix_timestamp unit")
    us = pc.cast(v, pa.int64())   # timestamp[us] → µs since epoch
    if unit == "nanoseconds":
        return pc.multiply(us, 1_000), e
    # chrono timestamp()/timestamp_millis() FLOOR; Arrow's integer
    # divide truncates toward zero (wrong for pre-epoch instants)
    div = 1_000_000 if unit == "seconds" else 1_000
    filled = pc.fill_null(us, 0).to_numpy(zero_copy_only=False)
    out = pa.array(filled // div, pa.int64())
    if us.null_count:
        out = pc.if_else(pc.is_null(us), pa.scalar(None, pa.int64()),
                         out)
    return out, e


def _hash_impl(algo: str, ctx, v, e):
    import hashlib

    if isinstance(v, pa.Scalar):
        v = pa.repeat(v, ctx.n)
    # dictionary-encode first: digest cost scales with DISTINCT
    # values, not rows — log batches hash low-cardinality columns
    # (tool/role/level) far more often than free text
    arr = (v.combine_chunks() if isinstance(v, pa.ChunkedArray)
           else v)
    if not (pa.types.is_string(arr.type)
            or pa.types.is_large_string(arr.type)):
        # md5/sha* take bytes only — non-string columns carry the
        # per-row "expected string" error the interpreter builds
        raise _RowFallback("hash on non-string column")
    dct = arr.dictionary_encode()
    uniq = [hashlib.new(algo, s.encode()).hexdigest()
            if s is not None else None
            for s in dct.dictionary.to_pylist()]
    out = pa.DictionaryArray.from_arrays(
        dct.indices, pa.array(uniq, pa.string())) \
        .cast(pa.string())
    return out, e


def _hash_kernel(algo: str):
    def k(ctx, a):
        v, e = a[0]
        return _hash_impl(algo, ctx, v, e)
    return k


#: sha2.rs variant → hashlib algo (checksum.py _SHA2 keys)
_SHA2_ALGOS = {"SHA-224": "sha224", "SHA-256": "sha256",
               "SHA-384": "sha384", "SHA-512": "sha512",
               "SHA-512/224": "sha512_224",
               "SHA-512/256": "sha512_256"}


def _k_sha2(ctx, a):
    """sha2(value, variant) — the variant argument selects the
    digest (default SHA-512/256, sha2.rs); a non-constant or unknown
    variant takes the row path (exact framed error text there)."""
    v, e = a[0]
    variant = "SHA-512/256"
    if len(a) > 1:
        vv, _ = a[1]
        if not isinstance(vv, pa.Scalar):
            raise _RowFallback("sha2 non-constant variant")
        variant = vv.as_py()
    algo = _SHA2_ALGOS.get(variant)
    if algo is None:
        raise _RowFallback("sha2 unknown variant")
    return _hash_impl(algo, ctx, v, e)


def _k_split(ctx, a, nodes, span=None):
    """split.rs vectorized: literal-string pattern → pc.split_pattern,
    regex-literal pattern → pc.split_pattern_regex; literal limit
    caps pieces (limit-1 max splits)."""
    v, e = a[0]
    pat_node = nodes[1]
    max_splits = None
    if len(a) > 2:
        lim = a[2][0]
        lim = lim.as_py() if isinstance(lim, pa.Scalar) else None
        if not isinstance(lim, int) or lim <= 0:
            raise NotVectorizable("split limit")
        max_splits = lim - 1
    pat = _pattern_str(a[1][0])
    if pat is None:
        raise NotVectorizable("split pattern")
    if pat_node[0] == "regex":
        out = pc.split_pattern_regex(v, pat, max_splits=max_splits)
    else:
        out = pc.split_pattern(v, pat, max_splits=max_splits)
    return out, e


def _k_slice(ctx, a, nodes, span=None):
    """slice.rs on strings, non-negative literal bounds (negative /
    array slicing falls back to the interpreter)."""
    v, e = a[0]
    start = a[1][0]
    start = start.as_py() if isinstance(start, pa.Scalar) else None
    if not isinstance(start, int) or start < 0:
        raise NotVectorizable("slice start")
    stop = None
    if len(a) > 2:
        stop = a[2][0]
        stop = stop.as_py() if isinstance(stop, pa.Scalar) else None
        if not isinstance(stop, int) or stop < start:
            raise NotVectorizable("slice end")
    if stop is None:
        stop = (1 << 30)
    va = _as_array(v, ctx.n)
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    out = pc.utf8_slice_codeunits(va, start, stop=stop)
    # slice.rs operates on BYTES (Bytes.slice): for pure-ASCII rows
    # code-unit slicing IS byte slicing, so the Arrow kernel stands;
    # non-ASCII rows run the row fn masked (the VectorGrok fallback
    # idiom) — a slice through a multi-byte char yields U+FFFD.
    prefix = _call_frame("slice", span)
    ln_b = pc.cast(pc.binary_length(va), pa.int64())
    nonascii = pc.and_(
        pc.is_valid(va),
        pc.not_equal(ln_b, pc.cast(pc.utf8_length(va), pa.int64())))
    na_np = nonascii.to_numpy(zero_copy_only=False)
    na_errs = None
    if na_np.any():
        from ..functions.string import slice_ as _row_slice
        from ..value import VrlError as _VErr
        idx = np.flatnonzero(na_np)
        sub = va.take(pa.array(idx)).to_pylist()
        py = out.to_pylist()
        errs_py: list = [None] * ctx.n
        end_arg = None if stop == (1 << 30) else stop
        for i, s_ in zip(idx, sub):
            try:
                py[i] = _row_slice(s_, start, end_arg)
            except _VErr as ex:
                py[i] = None
                errs_py[i] = prefix + ex.message
        out = pa.array(py, pa.string())
        if any(x is not None for x in errs_py):
            na_errs = pa.array(errs_py, pa.string())
    if start == 0:
        return out, _merge_errs(ctx.n, e, na_errs)
    # start past the BYTE length is a per-row ERROR
    # ('"start" must be between "-n" and "n"'), not a silent ''
    bad = pc.and_(pc.and_(pc.is_valid(va), pc.invert(nonascii)),
                  pc.less(ln_b, pa.scalar(start, pa.int64())))
    if pc.any(bad).as_py():
        lns = pc.cast(ln_b, pa.string())
        neg = pc.cast(pc.subtract(pa.scalar(0, pa.int64()), ln_b),
                      pa.string())
        msg = pc.binary_join_element_wise(
            pa.scalar(prefix + '"start" must be between "'), neg,
            pa.scalar('" and "'), lns, pa.scalar('"'), "")
        errs = pc.if_else(bad, msg, _nulls(ctx.n))
        # `ok, err =` default for slice is NULL: its type_def is
        # bytes-or-array (slice.rs:154-160), and only exact kinds get
        # a non-null default_value (kind.rs:44-80)
        out = pc.if_else(bad, pa.scalar(None, pa.string()), out)
        return out, _merge_errs(ctx.n, e, errs, na_errs)
    return out, _merge_errs(ctx.n, e, na_errs)


def _k_join(ctx, a, span=None):
    v, e = a[0]
    if len(a) <= 1:
        return pc.binary_join(v, ""), e
    s = a[1][0]
    if isinstance(s, pa.Scalar):
        sep = s.as_py()
        if not isinstance(sep, str):
            # constant non-string separator: every row errors — rare
            # enough that the row path owns it
            raise NotVectorizable("join non-string separator")
        return pc.binary_join(v, sep), e
    # per-row separator column (r4): non-string / null separators
    # error per row with the interpreter's exact text (the stdlib
    # wrapper surfaces Python's AttributeError — functions/string.py
    # join, interpreter "invalid argument" framing)
    sa = _as_array(s, ctx.n)
    st = sa.type
    is_str = pa.types.is_string(st) or pa.types.is_large_string(st)
    bad = pc.is_null(sa) if is_str or pa.types.is_null(st) \
        else pa.array(np.ones(ctx.n, bool))
    errs = None
    if pc.any(bad).as_py():
        frame = _call_frame("join", span)
        errs = _masked_err_msgs(
            bad,
            lambda val: (f'{frame}invalid argument to "join": '
                         f"AttributeError: '{type(val).__name__}' "
                         "object has no attribute 'join'"),
            sa, n=ctx.n)
    safe = pc.fill_null(sa, "") if is_str \
        else pa.repeat(pa.scalar("", pa.string()), ctx.n)
    out = pc.binary_join(v, safe)
    if errs is not None:
        # handled-ok default for join is "" (string type_def)
        out = pc.if_else(bad, pa.scalar("", pa.string()), out)
    return out, _merge_errs(ctx.n, e, errs)


def _regex_groups_total(pat: str) -> bool:
    """True when every named group is guaranteed to participate in
    any match, so the interpreter's omit-unmatched-groups semantics
    (parse.py _regex_captures) equals a struct column: no
    alternation, and no group made optional by a quantifier. A `\\)`
    false-positive just means falling back — sound, never wrong."""
    if "|" in pat:
        return False
    for i, ch in enumerate(pat):
        if ch == ")" and i + 1 < len(pat) and pat[i + 1] in "?*{":
            return False
    return True


def _k_parse_regex(ctx, a, nodes, span=None):
    """parse_regex.rs vectorized: regex-literal pattern with all
    groups named and none optional → one pc.extract_regex pass
    returning a struct column (null = no match, with the
    interpreter's positioned per-row error and null ok-default).
    numeric_groups / dynamic patterns fall back."""
    if len(a) != 2 or nodes[1][0] != "regex":
        raise NotVectorizable("parse_regex args")
    pat = _pattern_str(a[1][0])
    if not isinstance(pat, str) or not _regex_groups_total(pat):
        raise NotVectorizable("parse_regex pattern shape")
    v, e = a[0]
    v = _as_array(v, ctx.n)
    try:
        out = pc.extract_regex(v, pattern=pat)
    except pa.lib.ArrowInvalid:
        # unnamed groups / RE2-incompatible syntax → interpreter
        raise NotVectorizable("parse_regex pattern syntax")
    bad = pc.and_(pc.is_valid(v), pc.is_null(out))
    errs = None
    if pc.any(bad).as_py():
        msg = (_call_frame("parse_regex", span)
               + "could not find any pattern matches")
        errs = _err_where(bad, msg, ctx.n)
    return out, _merge_errs(ctx.n, e, errs)


def _k_truncate(ctx, a, nodes, span=None):
    """truncate.rs: cut to a literal `limit` code points; literal
    `suffix` appended only where truncation happened."""
    v, e = a[0]
    limit = a[1][0]
    limit = limit.as_py() if isinstance(limit, pa.Scalar) else None
    if not isinstance(limit, int) or isinstance(limit, bool) or limit < 0:
        raise NotVectorizable("truncate limit")
    suffix = ""
    if len(a) > 2:
        s = a[2][0]
        suffix = s.as_py() if isinstance(s, pa.Scalar) else None
        if not isinstance(suffix, str):
            raise NotVectorizable("truncate suffix")
    cut = pc.utf8_slice_codeunits(v, 0, stop=limit)
    if suffix:
        cut = pc.binary_join_element_wise(cut, pa.scalar(suffix), "")
    fits = pc.less_equal(pc.utf8_length(v), pa.scalar(limit))
    return pc.if_else(fits, v, cut), e


def _k_strip_whitespace(ctx, a):
    v, e = a[0]
    return pc.utf8_trim_whitespace(v), e


def _k_to_bool(ctx, a, span=None):
    """to_bool.rs coercion table: bool id; numeric != 0; null → false
    (no error); recognized strings; other strings are per-row errors
    with the interpreter's repr text and `false` handled-default."""
    v, e = a[0]
    v = _as_array(v, ctx.n)
    t = _typ(v)
    if pa.types.is_null(t):
        return pa.array([False] * ctx.n), e
    if pa.types.is_boolean(t):
        return pc.fill_null(v, False), e
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pc.fill_null(pc.not_equal(v, pa.scalar(0, t)), False), e
    if not pa.types.is_string(t) and not pa.types.is_large_string(t):
        raise NotVectorizable("to_bool input type")
    # exact parse_bool table incl. integer strings ("5" → true,
    # "00" → false) and NO whitespace trim: the ROW fn per DISTINCT
    # value (bool-ish columns are low-cardinality by construction)
    from ..functions.coerce import to_bool as _row_tb
    from ..value import VrlError as _VErr

    prefix = _call_frame("to_bool", span)
    dct = (v.combine_chunks() if isinstance(v, pa.ChunkedArray)
           else v).dictionary_encode()
    uvals, uerrs = [], []
    for u in dct.dictionary.to_pylist():
        if u is None:
            uvals.append(None)
            uerrs.append(None)
            continue
        try:
            uvals.append(_row_tb(u))
            uerrs.append(None)
        except _VErr as ex:
            uvals.append(False)     # handled default
            uerrs.append(prefix + ex.message)
    out = pa.DictionaryArray.from_arrays(
        dct.indices, pa.array(uvals, pa.bool_())).cast(pa.bool_())
    err_col = pa.DictionaryArray.from_arrays(
        dct.indices, pa.array(uerrs, pa.string())).cast(pa.string())
    errs = err_col if err_col.null_count < ctx.n else None
    return pc.fill_null(out, False), _merge_errs(ctx.n, e, errs)


def _render_json(arr, n: int) -> pa.Array:
    """Arrow column → per-row JSON text (value.encode_json parity:
    sorted keys, compact separators, RFC3339 timestamps). Leaves
    dictionary-encode through the ROW encoder — exact float /
    escape / timestamp formatting for the cost of O(distinct);
    structs assemble sorted-key fragments with
    binary_join_element_wise; lists re-join their flattened child
    render with pc.binary_join; dense unions scatter per-lane
    renders by tag."""
    from ..value import encode_json as _ej

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_null(t):
        return pa.array(["null"] * n, pa.string())
    if pa.types.is_dictionary(t):
        arr = arr.cast(t.value_type)
        t = arr.type
    if pa.types.is_struct(t):
        if t.num_fields == 0:
            out = pa.array(["{}"] * n, pa.string())
        else:
            names = sorted(t.field(i).name for i in range(t.num_fields))
            idx = {t.field(i).name: i for i in range(t.num_fields)}
            pieces = []
            for j, name in enumerate(names):
                prefix = ("{" if j == 0 else ",") + _ej(name) + ":"
                pieces.append(pa.scalar(prefix))
                # raw child (no parent-validity merge — parent-null
                # rows are masked to "null" below, and struct_field
                # would abort on union children)
                pieces.append(_render_json(arr.field(idx[name]), n))
            out = pc.binary_join_element_wise(
                *pieces, pa.scalar("}"), "")
        if arr.null_count:
            out = pc.if_else(pc.is_null(arr), pa.scalar("null"), out)
        return out
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        values = arr.values
        rendered = _render_json(values, len(values))
        relist = (pa.LargeListArray if pa.types.is_large_list(t)
                  else pa.ListArray).from_arrays(arr.offsets, rendered)
        joined = pc.binary_join(relist, ",")
        out = pc.binary_join_element_wise(
            pa.scalar("["), joined, pa.scalar("]"), "")
        if arr.null_count:
            out = pc.if_else(pc.is_null(arr), pa.scalar("null"), out)
        return out
    if pa.types.is_union(t):
        tags = np.asarray(arr.type_codes)
        dense = t.mode == "dense"
        offs = np.asarray(arr.offsets) if dense else None
        out = np.empty(n, object)
        for i in range(t.num_fields):
            code = t.type_codes[i]
            m = tags == code
            if not m.any():
                continue
            child = arr.field(i)
            r = _render_json(child, len(child)) \
                .to_numpy(zero_copy_only=False)
            out[m] = r[offs[m]] if dense else r[m]
        return pa.array(out, pa.string())
    # leaf rendering, cheapest-first:
    # - int/bool: pure Arrow casts (decimal text == JSON text)
    # - float: ONE json.dumps over the whole list, split on the
    #   separator (no quotes/commas inside float tokens) — ~4.7× the
    #   per-value encoder loop; non-finite tokens map to null
    #   (serde_json serialize_f64)
    # - everything else: per DISTINCT value through a dictionary
    #   (log-shaped columns are low-cardinality)
    if pa.types.is_integer(t):
        return pc.fill_null(pc.cast(arr, pa.string()), "null")
    if pa.types.is_boolean(t):
        return pc.fill_null(
            pc.if_else(arr, pa.scalar("true"), pa.scalar("false")),
            "null")
    if pa.types.is_floating(t):
        import json as _json
        vals = arr.to_pylist()
        if not vals:
            return pa.array([], pa.string())
        s = _json.dumps(vals, separators=(",", ":"))
        toks = s[1:-1].split(",")
        if "Infinity" in s or "NaN" in s:
            toks = ["null" if t_ in ("Infinity", "-Infinity", "NaN")
                    else t_ for t_ in toks]
        if "e" in s:
            # Python repr formats |x|>=1e16 / <1e-4 scientifically
            # with padded signed exponents; serde_json uses ryu
            # ("1e20", "0.00009", "1e-6") — re-render those tokens
            from ..value import ryu_f64
            toks = [ryu_f64(vals[i]) if "e" in t_ else t_
                    for i, t_ in enumerate(toks)]
        return pa.array(toks, pa.string())
    try:
        dct = arr.dictionary_encode()
        uniq = [None if u is None else _ej(u)
                for u in dct.dictionary.to_pylist()]
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, TypeError):
        raise _RowFallback(f"encode_json leaf {t}")
    out = pa.DictionaryArray.from_arrays(
        dct.indices, pa.array(uniq, pa.string())).cast(pa.string())
    return pc.fill_null(out, "null")


def _k_encode_json(ctx, a):
    """encode_json.rs vectorized (sorted keys, compact separators);
    `pretty: true` keeps the row path (rare, indentation layout)."""
    v, e = a[0]
    if len(a) > 1:
        pv, _ = a[1]
        if not isinstance(pv, pa.Scalar) or pv.as_py():
            raise _RowFallback("encode_json pretty")
    return _render_json(_as_array(v, ctx.n), ctx.n), e


_KERNELS: dict[str, Callable] = {
    "encode_json": _k_encode_json,
    "downcase": _k_downcase, "upcase": _k_upcase, "to_int": _k_to_int,
    "to_float": _k_to_float, "to_string": _k_to_string, "round": _k_round,
    "floor": _k_floor, "ceil": _k_ceil, "abs": _k_abs,
    "strlen": _k_strlen, "contains": _k_contains,
    "starts_with": _k_starts_with, "ends_with": _k_ends_with,
    "match": _k_match, "is_null": _k_is_null,
    "is_nullish": _k_is_nullish,
    "format_timestamp": _k_format_timestamp,
    "parse_timestamp": _k_parse_timestamp,
    "to_unix_timestamp": _k_to_unix_timestamp,
    "md5": _hash_kernel("md5"), "sha1": _hash_kernel("sha1"),
    "sha2": _k_sha2,
    "strip_whitespace": _k_strip_whitespace,
}

#: kernels that also need the raw argument AST (regex-vs-string
#: pattern distinction, literal bounds)
_KERNELS_NODES: dict[str, Callable] = {
    "split": _k_split,
    "slice": _k_slice,
    "parse_regex": _k_parse_regex,
    "truncate": _k_truncate,
    "replace": _k_replace,
}

def _k_length(ctx, a, span=None):
    """length.rs: array → element count, object → key count, string →
    BYTE length; anything else (incl. null) errors per row with
    'expected object, array or string, got {kind}' (default 0)."""
    v, e = a[0]
    va = _as_array(v, ctx.n)
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    t = va.type
    prefix = _call_frame("length", span)

    def _null_errs(out):
        nulls = pc.is_null(va)
        if not pc.any(nulls).as_py():
            return out, e
        errs = _err_where(
            nulls, prefix + "expected object, array or string, "
            "got null", ctx.n)
        return out, _merge_errs(ctx.n, e, errs)

    if _is_str_type(t):
        return _null_errs(pc.cast(pc.binary_length(va), pa.int64()))
    if _is_list_type(t):
        return _null_errs(pc.cast(pc.list_value_length(va),
                                  pa.int64()))
    if pa.types.is_struct(t):
        return _null_errs(pa.array([t.num_fields] * ctx.n, pa.int64()))
    kind = "null" if pa.types.is_null(t) else _vrl_kind_name(t)
    if pa.types.is_null(t) or not va.null_count:
        errs = _err_where(pa.array([True] * ctx.n),
                          prefix + "expected object, array or string, "
                          f"got {kind}", ctx.n)
    else:
        nn = pc.is_null(va).to_numpy(zero_copy_only=False)
        errs = pa.array(
            [prefix + "expected object, array or string, got "
             + ("null" if b else kind) for b in nn], pa.string())
    return pa.array(np.zeros(ctx.n, np.int64)), \
        _merge_errs(ctx.n, e, errs)


def _list_concat_rows(la, lb, n: int):
    """Per-row list concatenation of two equal-length list columns
    with the SAME value type: combined = values_a ++ values_b, take
    indices interleave each row's a-run then b-run."""
    off_a = np.asarray(la.offsets, np.int64)
    off_b = np.asarray(lb.offsets, np.int64)
    # rebaseline: a sliced column's offsets are absolute into the
    # FULL child — make both sides 0-based over their covered range
    va = la.values.slice(int(off_a[0]), int(off_a[-1] - off_a[0]))
    vb = lb.values.slice(int(off_b[0]), int(off_b[-1] - off_b[0]))
    off_a = off_a - off_a[0]
    off_b = off_b - off_b[0]
    len_a = np.diff(off_a)
    len_b = np.diff(off_b)
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(len_a + len_b, out=new_off[1:])
    total = int(new_off[-1])
    out_idx = np.empty(total, np.int64)
    # after the rebaseline, covered a-elements enumerate 0..len(va)
    # in row order, so the scatter source is just that enumeration;
    # each row's a-run starts at new_off[row], its b-run after it
    row_of_a = np.repeat(np.arange(n), len_a)
    pos_a = np.arange(len(row_of_a))
    out_idx[new_off[row_of_a] + (pos_a - off_a[row_of_a])] = pos_a
    row_of_b = np.repeat(np.arange(n), len_b)
    pos_b = np.arange(len(row_of_b))
    out_idx[new_off[row_of_b] + len_a[row_of_b]
            + (pos_b - off_b[row_of_b])] = len(va) + pos_b
    combined = pa.concat_arrays([va, vb])
    if total >= 2**31:
        raise _RowFallback("list concat overflow")
    taken = combined.take(pa.array(out_idx))
    return pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                    taken)


def _as_plain_list(arr, n: int, what: str):
    """Normalize a list column for the concat kernels. NOTE: a sliced
    column's offsets stay ABSOLUTE into the full `.values` child —
    every consumer doing offset arithmetic must rebaseline (see
    _list_concat_rows) or index the full child consistently."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    return arr


def _k_push(ctx, a, span=None):
    """push.rs: copy of the array with the item appended. Non-array
    input errors per row; a mixed-type item (int item into a string
    list) defers to the row path."""
    v, e = a[0]
    item = a[1][0] if len(a) > 1 else pa.scalar(None)
    va = _as_array(v, ctx.n)
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    msg = _call_frame("push", span) + "expected array"
    if not _is_list_type(va.type):
        errs = _err_where(pa.array([True] * ctx.n), msg, ctx.n)
        return pa.array([[]] * ctx.n, pa.list_(pa.null())), \
            _merge_errs(ctx.n, e, errs)
    va = _as_plain_list(va, ctx.n, "push")
    item_arr = _as_array(item, ctx.n)
    if isinstance(item_arr, _Union):
        raise _RowFallback("push union item")
    vt, it = va.type.value_type, item_arr.type
    if pa.types.is_null(it) and not pa.types.is_null(vt):
        item_arr = _nulls(ctx.n, vt)
    elif pa.types.is_null(vt) and not pa.types.is_null(it):
        va = va.cast(pa.list_(it))
        vt = it
    elif vt != it:
        raise _RowFallback("push mixed item type")
    single = pa.ListArray.from_arrays(
        pa.array(np.arange(ctx.n + 1, dtype=np.int32)), item_arr)
    out = _list_concat_rows(va, single, ctx.n)
    errs = None
    if va.null_count:
        errs = _err_where(pc.is_null(va), msg, ctx.n)
    return out, _merge_errs(ctx.n, e, errs)


def _k_append(ctx, a, span=None):
    """append.rs: per-row concatenation of two arrays."""
    v, e = a[0]
    w, e2 = a[1]
    va, wa = _as_array(v, ctx.n), _as_array(w, ctx.n)
    if isinstance(va, _Union) or isinstance(wa, _Union):
        raise _RowFallback("append union operand")
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    if isinstance(wa, pa.ChunkedArray):
        wa = wa.combine_chunks()
    msg = _call_frame("append", span) + "expected arrays"
    if not _is_list_type(va.type) or not _is_list_type(wa.type):
        errs = _err_where(pa.array([True] * ctx.n), msg, ctx.n)
        return pa.array([[]] * ctx.n, pa.list_(pa.null())), \
            _merge_errs(ctx.n, e, e2, errs)
    va = _as_plain_list(va, ctx.n, "append")
    wa = _as_plain_list(wa, ctx.n, "append")
    vt, wt = va.type.value_type, wa.type.value_type
    if pa.types.is_null(vt) and not pa.types.is_null(wt):
        va = va.cast(pa.list_(wt))
    elif pa.types.is_null(wt) and not pa.types.is_null(vt):
        wa = wa.cast(pa.list_(vt))
    elif vt != wt:
        raise _RowFallback("append mixed value types")
    out = _list_concat_rows(va, wa, ctx.n)
    errs = None
    bad = pc.or_(pc.is_null(va), pc.is_null(wa))
    if pc.any(bad).as_py():
        errs = _err_where(bad, msg, ctx.n)
    return out, _merge_errs(ctx.n, e, e2, errs)


def _k_includes(ctx, a, span=None):
    """includes.rs: array membership with VRL equality (lossy across
    int/float, kind-strict otherwise)."""
    v, e = a[0]
    needle = a[1][0] if len(a) > 1 else pa.scalar(None)
    ne = a[1][1] if len(a) > 1 else None
    va = _as_array(v, ctx.n)
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    prefix = _call_frame("includes", span)
    if not _is_list_type(va.type):
        errs = _err_where(pa.array([True] * ctx.n),
                          prefix + "expected array", ctx.n)
        return _nulls(ctx.n, pa.null()), _merge_errs(ctx.n, e, ne, errs)
    va = _as_plain_list(va, ctx.n, "includes")
    if isinstance(needle, _Union):
        raise _RowFallback("includes union needle")
    off = np.asarray(va.offsets, np.int64)
    # work over the COVERED child range only (sliced columns keep
    # absolute offsets into the full child)
    flat = va.values.slice(int(off[0]), int(off[-1] - off[0]))
    off = off - off[0]
    lens = np.diff(off)
    needle_arr = _as_array(needle, ctx.n)
    ft, nt = flat.type, needle_arr.type

    def _kindclass(t):
        if pa.types.is_boolean(t):
            return "bool"
        if _is_num_type(t):
            return "num"
        if _is_str_type(t):
            return "str"
        if pa.types.is_timestamp(t):
            return "ts"
        return "other"

    if pa.types.is_null(ft) or pa.types.is_null(nt) or \
            _kindclass(ft) != _kindclass(nt) or \
            _kindclass(ft) == "other":
        # null needle matches null elements; cross-kind never matches
        if pa.types.is_null(nt) and not pa.types.is_null(ft):
            eq_flat = pc.is_null(flat)
        elif pa.types.is_null(ft) and pa.types.is_null(nt):
            eq_flat = pa.array([True] * len(flat))
        elif _kindclass(ft) == "other" or _kindclass(nt) == "other":
            raise _RowFallback("includes non-scalar elements")
        else:
            eq_flat = pa.array(np.zeros(len(flat), bool))
    else:
        # row-aligned needle: one repeat per element of the covered
        # (rebased) child
        needle_flat = needle_arr.take(
            pa.array(np.repeat(np.arange(ctx.n), lens)))
        both_null = pc.and_(pc.is_null(flat), pc.is_null(needle_flat))
        eq_flat = pc.or_(
            pc.fill_null(pc.equal(flat, needle_flat), False),
            both_null)
    eq_np = pc.fill_null(eq_flat, False).to_numpy(zero_copy_only=False)
    hit = np.zeros(ctx.n, bool)
    nz = lens > 0
    if nz.any():
        csum = np.concatenate(([0], np.cumsum(eq_np.astype(np.int64))))
        hit[nz] = (csum[off[1:][nz]] - csum[off[:-1][nz]]) > 0
    out = pa.array(hit)
    errs = None
    if va.null_count:
        errs = _err_where(pc.is_null(va), prefix + "expected array",
                          ctx.n)
    return out, _merge_errs(ctx.n, e, ne, errs)


def _shape_lanes(ctx, outs: list, errs: list):
    """Materialize per-row Python results as a column: one lane per
    distinct SHAPE (key set for objects, kind otherwise) so each
    row's true object shape survives into encode_json / the row
    path. Returns (array-or-_Union, err_col|None)."""
    from .remap import _py_array

    flat_cache: dict = {}

    def sig(x):
        # recursive over CONTAINER structure: nested dicts null-fill
        # inside one struct lane, so differing nested key sets must
        # split lanes; a list mixing container shapes within one row
        # has no faithful Arrow layout at all
        if isinstance(x, dict):
            if not any(type(v) is dict or type(v) is list
                       for v in x.values()):
                # flat object: memoize by key ORDER (the hot log
                # case — sorted() per row dominated the kernel).
                # Numeric KIND mixes within one key-set lane are
                # caught downstream by remap._silently_coerced
                # (per-field union children), not here — a per-row
                # per-field kind tuple cost ~70% of the kernel.
                ko = tuple(x)
                s_ = flat_cache.get(ko)
                if s_ is None:
                    s_ = ("obj",) + tuple((k, None)
                                          for k in sorted(ko))
                    flat_cache[ko] = s_
                return s_
            return ("obj",) + tuple(
                (k, sig(v) if isinstance(v, (dict, list)) else None)
                for k, v in sorted(x.items()))
        if isinstance(x, list):
            subs = {sig(v) for v in x if isinstance(v, (dict, list))}
            if len(subs) > 1:
                raise _RowFallback("mixed container shapes in list")
            return ("arr", next(iter(subs)) if subs else None)
        if isinstance(x, bool):
            return ("bool",)
        if isinstance(x, int):
            return ("int",)
        if isinstance(x, float):
            return ("float",)
        if isinstance(x, str):
            return ("str",)
        if x is None:
            return ("null",)
        return (type(x).__name__,)      # bytes, datetime, regex, …

    sigs = [sig(x) if errs[i] is None else ("null",)
            for i, x in enumerate(outs)]
    shapes: list = []
    index: dict = {}
    for s_ in sigs:
        if s_ not in index:
            index[s_] = len(shapes)
            shapes.append(s_)
    if len(shapes) > 8:
        raise _RowFallback("shape explosion")
    err_col = pa.array(errs, pa.string()) if any(
        x is not None for x in errs) else None
    if len(shapes) == 1:
        return _py_array(outs), err_col
    tag = np.array([index[s_] for s_ in sigs], np.int8)
    lanes = []
    for code, s_ in enumerate(shapes):
        lane_vals = [x if tag[i] == code else None
                     for i, x in enumerate(outs)]
        lanes.append(_py_array(lane_vals))
    return _Union(tag, lanes, ctx.n), err_col


#: registry functions the generic row-loop tier must NOT claim:
#: nondeterministic between lanes (time/random/uuid), environment-
#: dependent (host/env/network), or side-effectful (log prints)
_ROW_LOOP_EXCLUDE = frozenset({
    # now/uuid_v4 have dedicated kernels below; uuid_v7 and log ride
    # this generic tier (random/prints per row ARE per-row
    # evaluation; caveat: a later statement's row fallback re-runs
    # the batch through the interpreter, so log lines may duplicate —
    # host logging is best-effort, same as Ray task retries)
    "now", "uuid_v4", "random_bool", "random_bytes",
    "random_float", "random_int", "get_hostname", "get_env_var",
    "get_timezone_name", "dns_lookup", "reverse_dns",
    "http_request",
})


def _row_loop_kernel(name: str, kwnames=None) -> Callable:
    """Generic tier for registry functions without a dedicated Arrow
    kernel: evaluate the ROW function per row (exact row semantics,
    incl. the interpreter's TypeError→argument-kind error mapping),
    bounded to THIS statement — the rest of the program stays
    columnar instead of the whole batch re-running per row. Results
    materialize through :func:`_shape_lanes`. `kwnames` (parallel to
    the arg list, None entries = positional) carries named arguments
    that couldn't canonicalize positionally — they reach the registry
    fn as **kwargs exactly like interpreter.py:437-441."""
    from ..functions import REGISTRY
    from ..value import VrlError
    from .interpreter import _ARG_RENAME, _arg_kind_error

    fn = REGISTRY[name]
    pykw = [None if an is None else _ARG_RENAME.get(an, an)
            for an in kwnames] if kwnames else None

    def k(ctx, a, span=None):
        prefix = _call_frame(name, span)
        cols = []                  # (per_row?, payload)
        for (v, _e) in a:
            if isinstance(v, _PyConst):
                cols.append((False, v.value))   # compiled regex etc.
                continue
            if isinstance(v, _Union):
                v = v.to_arrow()
            if isinstance(v, pa.Scalar):
                # shared constant — a LIST constant must not be
                # indexed per row
                cols.append((False, v.as_py()))
                continue
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            cols.append((True, v.to_pylist()))
        skip = np.zeros(ctx.n, bool)
        for (_v, e_) in a:
            if e_ is not None:
                skip |= pc.is_valid(e_).to_numpy(zero_copy_only=False)
        outs: list = [None] * ctx.n
        errs: list = [None] * ctx.n
        for i in range(ctx.n):
            if skip[i]:
                continue            # arg error already recorded
            vals_i = [p[i] if per else p for per, p in cols]
            if pykw is None:
                args_i, kw_i = vals_i, {}
            else:
                args_i, kw_i = [], {}
                for v_, an in zip(vals_i, pykw):
                    if an is None:
                        args_i.append(v_)
                    else:
                        kw_i[an] = v_
            try:
                outs[i] = fn(*args_i, **kw_i)
            except VrlError as ex:
                errs[i] = prefix + ex.message
            except TypeError as ex:
                msg = _arg_kind_error(name, args_i, kw_i)
                if msg is None:
                    # interpreter raises an UNCATCHABLE
                    # VrlRuntimeError here — row path owns that
                    raise _RowFallback(f"{name} bad argument shape")
                errs[i] = prefix + msg
        out, err_col = _shape_lanes(ctx, outs, errs)
        return out, _merge_errs(ctx.n,
                                *[e_ for _v, e_ in a], err_col)
    return k


def _value_eq_arrays(ctx, la, ra):
    """VRL Value equality over two columns: null == null is true,
    null == x is false (Value PartialEq — Arrow's kernels would
    null-propagate instead); cross-type pairs compare simply unequal;
    same complex types Arrow can't compare (e.g. list<union>) go
    structural via value.eq (cold path, union-bearing columns only)."""
    try:
        valeq = pc.fill_null(pc.equal(la, ra), False)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
            pa.ArrowTypeError):
        if la.type == ra.type:
            from ..value import eq as _veq
            valeq = pa.array(
                [x is not None and y is not None and _veq(x, y)
                 for x, y in zip(la.to_pylist(), ra.to_pylist())],
                pa.bool_())
        else:
            valeq = pa.array(np.zeros(ctx.n, bool))
    return pc.or_(valeq, pc.and_(pc.is_null(la), pc.is_null(ra)))


def _k_assert(ctx, a, span=None):
    """`assert` special form (interpreter.py:421-427): errors on every
    row whose condition is not exactly `true`; the optional message is
    evaluated unconditionally (interpreter order) and stringified on
    failing rows only."""
    v, e = a[0]
    if isinstance(v, _Union):
        raise _RowFallback("assert union condition")
    va = _as_array(v, ctx.n)
    if pa.types.is_boolean(va.type):
        bad = pc.fill_null(pc.invert(va), True) \
            .to_numpy(zero_copy_only=False)
    else:
        bad = np.ones(ctx.n, bool)       # non-bool is never `true`
    merr = a[1][1] if len(a) > 1 else None
    errs = None
    if bad.any():
        prefix = _call_frame("assert", span)
        if len(a) > 1:
            mv = a[1][0]
            if isinstance(mv, _Union):
                mv = mv.to_arrow()
            mp = _as_array(mv, ctx.n).to_pylist()
        else:
            mp = None
        msgs = np.full(ctx.n, None, dtype=object)
        for i in np.flatnonzero(bad):
            msgs[i] = prefix + ("assertion failed" if mp is None
                                else str(mp[i]))
        errs = pa.array(msgs, pa.string())
    return pa.scalar(True), _merge_errs(ctx.n, e, merr, errs)


def _k_assert_eq(ctx, a, span=None):
    """`assert_eq` special form (interpreter.py:428-433): per-row
    value.eq; failing rows carry `assertion failed: {l!r} == {r!r}`
    over the operands' python reprs (interpreter parity)."""
    (lv, le), (rv, re) = a[0], a[1]
    if isinstance(lv, _Union) or isinstance(rv, _Union):
        raise _RowFallback("assert_eq union operand")
    rest = [e_ for _, e_ in a[2:]]
    la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
    eq = pc.fill_null(_value_eq_arrays(ctx, la, ra), False)
    bad = pc.invert(eq).to_numpy(zero_copy_only=False)
    errs = None
    if bad.any():
        if pa.types.is_nested(la.type) or pa.types.is_nested(ra.type):
            # container literals fold through Arrow and promote mixed
            # int/float leaves — the VALUES compare fine but the error
            # message reprs the operands ([-3.43, 2] vs [-3.43, 2.0]):
            # failing container asserts take the row path
            raise _RowFallback("assert_eq container operand repr")
        prefix = _call_frame("assert_eq", span)
        lp, rp = la.to_pylist(), ra.to_pylist()
        msgs = np.full(ctx.n, None, dtype=object)
        for i in np.flatnonzero(bad):
            msgs[i] = (prefix
                       + f"assertion failed: {lp[i]!r} == {rp[i]!r}")
        errs = pa.array(msgs, pa.string())
    return pa.scalar(True), _merge_errs(ctx.n, le, re, *rest, errs)


def _k_now(ctx, a):
    """now(): ONE clock read per batch evaluation (the row path reads
    the clock per event — microseconds apart within a batch; a single
    batch timestamp is the vectorized analogue and respects the
    frozen job clock, functions/timestamp.py:29)."""
    from ..functions.timestamp import now as _now

    return pa.scalar(_now(), pa.timestamp("us", tz="UTC")), None


def _k_uuid_v4(ctx, a):
    import uuid as _uuid

    return pa.array([str(_uuid.uuid4()) for _ in range(ctx.n)],
                    pa.string()), None


def _k_parse_json(ctx, a, span=None):
    """parse_json.rs: per-row json.loads (C-speed, bounded to THIS
    statement — the rest of the program stays columnar), exact row
    error texts, results grouped into per-SHAPE lanes (one struct
    lane per distinct key set, one lane per scalar kind) so each
    row's true object shape survives — encode_json downstream
    renders {"a":1}, not null-filled siblings."""
    from ..functions.parse import parse_json as _pj
    from ..value import VrlError
    from .remap import _py_array

    v, e = a[0]
    kwargs = {}
    if len(a) > 1:
        md = a[1][0]
        if not isinstance(md, pa.Scalar):
            raise _RowFallback("parse_json non-constant max_depth")
        kwargs["max_depth"] = md.as_py()
    va = _as_array(v, ctx.n)
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    if isinstance(va, _Union):
        raise _RowFallback("parse_json union input")
    prefix = _call_frame("parse_json", span)
    vals = va.to_pylist()
    outs: list = [None] * ctx.n
    errs: list = [None] * ctx.n
    for i, s in enumerate(vals):
        try:
            outs[i] = _pj(s, **kwargs)
        except VrlError as ex:
            errs[i] = prefix + ex.message
        except Exception as ex:           # defensive: never raise
            errs[i] = prefix + f"unable to parse json: {ex}"

    out, err_col = _shape_lanes(ctx, outs, errs)
    return out, _merge_errs(ctx.n, e, err_col)


def _type_assert_kernel(fname: str, kind: str, pred) -> Callable:
    """string()/int()/float()/bool()/array()/object()/timestamp():
    identity when the column's type matches, positioned per-row
    'expected {kind}, got {actual}' otherwise (null rows always
    render 'got null'); handled ok-default is null (the capture
    machinery applies it)."""

    def k(ctx, a, span=None):
        v, e = a[0]
        va = _as_array(v, ctx.n)
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        prefix = _call_frame(fname, span)
        t = va.type
        if pred(t):
            nulls = pc.is_null(va)
            if not pc.any(nulls).as_py():
                return va, e
            errs = _err_where(nulls,
                              prefix + f"expected {kind}, got null",
                              ctx.n)
            return va, _merge_errs(ctx.n, e, errs)
        actual = "null" if pa.types.is_null(t) else _vrl_kind_name(t)
        if pa.types.is_null(t) or not va.null_count:
            errs = _err_where(
                pa.array([True] * ctx.n),
                prefix + f"expected {kind}, got {actual}", ctx.n)
        else:
            nn = pc.is_null(va).to_numpy(zero_copy_only=False)
            msgs = [prefix + f"expected {kind}, got "
                    + ("null" if b else actual) for b in nn]
            errs = pa.array(msgs, pa.string())
        return _nulls(ctx.n, pa.null()), _merge_errs(ctx.n, e, errs)
    return k


def _is_list_type(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


#: kernels that build positioned per-row error text and therefore
#: need the call-expression span
_KERNELS_SPAN: dict[str, Callable] = {
    "length": _k_length,
    "parse_json": _k_parse_json,
    "push": _k_push,
    "append": _k_append,
    "includes": _k_includes,
    "string": _type_assert_kernel("string", "string", _is_str_type),
    "int": _type_assert_kernel("int", "integer", pa.types.is_integer),
    "float": _type_assert_kernel("float", "float", pa.types.is_floating),
    "bool": _type_assert_kernel("bool", "boolean", pa.types.is_boolean),
    "array": _type_assert_kernel("array", "array", _is_list_type),
    "object": _type_assert_kernel("object", "object",
                                  pa.types.is_struct),
    "timestamp": _type_assert_kernel("timestamp", "timestamp",
                                     pa.types.is_timestamp),
    "join": _k_join,
    "to_int": _k_to_int,
    "to_float": _k_to_float,
    "parse_timestamp": _k_parse_timestamp,
    "to_bool": _k_to_bool,
}

#: null-input semantics: the reference errors when a required typed
#: argument is null (only to_int/to_float/to_string/to_bool and the
#: is_* predicates accept null). (message-suffix, handled-ok default)
#: pairs mirror the interpreter's per-function text and _FN_DEFAULTS.
_NULL_RULES: dict[str, tuple[str, Any]] = {
    "downcase": ("expected string, got null", ""),
    "upcase": ("expected string, got null", ""),
    "strlen": ("expected string, got null", 0),
    "contains": ("expected string, got null", None),
    "starts_with": ("expected string, got null", None),
    "ends_with": ("expected string, got null", None),
    "replace": ("expected string, got null", None),
    "match": ("expected string, got null", None),
    "split": ("expected string, got null", None),
    "md5": ("expected string", None),
    "sha1": ("expected string", None),
    "sha2": ("expected string", None),
    "round": ("expected integer or float", None),
    "floor": ("expected integer or float", None),
    "ceil": ("expected integer or float", None),
    "abs": ("expected integer or float", None),
    "format_timestamp": ("expected timestamp", ""),
    "to_unix_timestamp": ("expected timestamp", 0),
    "join": ("expected array", ""),
    "slice": ("expected string or array, got null", None),
    "parse_regex": ("expected string, got null", None),
    "truncate": ("expected string, got null", None),
    "strip_whitespace": ("expected string, got null", None),
}


def _wrap_null_rule(name: str, kfn: Callable, expected: str, default):
    """Wrap a kernel so null first-arg rows produce the interpreter's
    positioned error (and its handled-ok default) instead of silently
    propagating null."""

    def wk(ctx, a, *rest):
        span = rest[-1] if rest else None
        v, e = a[0]
        if isinstance(v, pa.Scalar):
            return kfn(ctx, a, *rest)
        if pa.types.is_null(_typ(v)):
            # a wholly null-typed input (missing field / all-error
            # default): every row errors — don't hand the Arrow
            # kernel a type it has no signature for
            msg = _call_frame(name, span) + expected
            errs = _err_where(pa.array([True] * ctx.n), msg, ctx.n)
            out = pa.repeat(pa.scalar(default), ctx.n) \
                if default is not None else _nulls(ctx.n)
            return out, _merge_errs(ctx.n, e, errs)
        bad = pc.is_null(v)
        if not pc.any(bad).as_py():
            return kfn(ctx, a, *rest)
        out, oe = kfn(ctx, a, *rest)
        msg = _call_frame(name, span) + expected
        errs = _err_where(bad, msg, ctx.n)
        out = _as_array(out, ctx.n)
        if default is not None:
            out = pc.if_else(bad, pa.scalar(default), out)
        return out, _merge_errs(ctx.n, oe, errs)

    return wk


def _drop_rest(f: Callable) -> Callable:
    return lambda ctx, a, *rest: f(ctx, a)


for _n, (_m, _d) in _NULL_RULES.items():
    if _n in _KERNELS_NODES:
        _KERNELS_NODES[_n] = _wrap_null_rule(_n, _KERNELS_NODES[_n],
                                             _m, _d)
    elif _n in _KERNELS:
        _KERNELS_SPAN[_n] = _wrap_null_rule(_n, _drop_rest(_KERNELS[_n]),
                                            _m, _d)
    elif _n in _KERNELS_SPAN:
        _KERNELS_SPAN[_n] = _wrap_null_rule(_n, _KERNELS_SPAN[_n],
                                            _m, _d)

# interpreter special forms + per-batch nondeterministic functions
# (registered AFTER the null-rule wrap: these define their own null
# semantics; nondet fns are parity-exempt — the docs/fuzz harnesses
# exclude them from lane comparison by name)
_KERNELS_SPAN["assert"] = _k_assert
_KERNELS_SPAN["assert_eq"] = _k_assert_eq
_KERNELS["now"] = _k_now
_KERNELS["uuid_v4"] = _k_uuid_v4


# ---------------------------------------------------------------------------
# expression compiler — AST → fn(ctx) -> (values, errs)

class _RowFallback(Exception):
    """Raised mid-batch when a construct needs per-row semantics the
    column plan can't express (e.g. a nested write on a batch with
    dead error rows) — VectorRemapStage catches it and reruns the
    batch through the interpreter."""


def _list_set_at(ctx, base: pa.Array, seg: int, v):
    """Set element ``seg`` of every row's list (path_insert int
    segment): pad-above with nulls for positive out-of-range,
    negative in-range from the end; one vectorized take over
    concat(old values, new column). Exotic shapes (non-list base,
    null lists, negative pad, type mixes Arrow can't concat) degrade
    to the row path."""
    if not _is_list_type(base.type) or base.null_count:
        raise _RowFallback("varidx non-list base")
    if isinstance(v, _Union):
        raise _RowFallback("varidx union value")
    va = _as_array(v, ctx.n)
    flat = base.flatten()
    if len(flat) and len(va) and flat.type != va.type:
        if pa.types.is_null(flat.type):
            flat = flat.cast(va.type)
        elif pa.types.is_null(va.type):
            va = va.cast(flat.type)
        else:
            raise _RowFallback("varidx type mix")
    lens = pc.list_value_length(base) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if seg >= 0:
        out_lens = np.maximum(lens, seg + 1)
        pos_new = np.full(ctx.n, seg, np.int64)
    else:
        pos_new = lens + seg
        if (pos_new < 0).any():
            raise _RowFallback("varidx negative pad")
        out_lens = lens
    starts = np.cumsum(lens) - lens
    out_off = np.zeros(ctx.n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_off[1:])
    total = int(out_off[-1])

    def rep(a):
        return np.repeat(a, out_lens)

    pos = np.arange(total) - rep(out_off[:-1])
    is_new = pos == rep(pos_new)
    from_old = (~is_new) & (pos < rep(lens))
    try:
        combined = pa.concat_arrays([flat, va])
    except (pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError):
        raise _RowFallback("varidx concat")
    idx = np.where(is_new, len(flat) + rep(np.arange(ctx.n)),
                   np.where(from_old, rep(starts) + pos, -1))
    taken = combined.take(
        pa.array(np.where(idx >= 0, idx, 0), pa.int64(),
                 mask=idx < 0))
    return pa.ListArray.from_arrays(
        pa.array(out_off, pa.int64()).cast(pa.int32()), taken)


class _Ctx:
    def __init__(self, batch: pa.Table):
        self.batch = batch
        self.n = len(batch)
        self.written: dict[str, pa.Array] = {}
        self.closure_vars: dict[str, pa.Array] = {}
        # per-event variables as columns (one value per row)
        self.vars: dict[str, pa.Array] = {}
        # live-row mask while the plan runs (None ⇒ all rows live);
        # del consults it — dead rows must keep their fields
        self.active_mask = None
        # whole-event replacement (`. = {...}`) dropped every input
        # column: reads must not fall through to the batch
        self.root_cleared = False
        # >0 while evaluating a LAZILY-reachable expression (?? RHS,
        # if arms, &&/|| RHS, closure bodies): side-effectful
        # expressions (del) cannot gate per row there — row path
        self.lazy_depth = 0
        # lazy level at which VAR writes are still sound: closure
        # element contexts set 1 (every element evaluates the body),
        # so a body block may write closure/local vars; any deeper
        # lazy position (?? RHS, if arms) still falls back
        self.writes_ok_depth = -1
        # a %meta field was written under a row gate (if arm /
        # post-abort): the `%` root read can't express per-row key
        # presence and must fall back
        self.gated_meta = False

    def col(self, name: str):
        if name in self.written:
            v = self.written[name]
            if isinstance(v, pa.Array) and pa.types.is_union(v.type):
                # materialized mixed-kind column: re-wrap so kernels
                # lane-dispatch instead of erroring on the union type
                return _from_arrow_union(v, self.n)
            return v
        if not self.root_cleared and name in self.batch.column_names:
            c = self.batch[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            if pa.types.is_union(c.type):
                return _from_arrow_union(c, self.n)
            return c
        return _nulls(self.n, pa.null())


_UNSET = object()

#: mangled prefix for %metadata fields: they live beside event
#: columns in ctx.written but never reach the output table
_META = "\x00%"


def _seg_read(ctx, arr, s):
    """One path/index segment over a column: struct field (str) or
    list element (int, negative from the end; out-of-range → null —
    query semantics)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(s, int):
        if not _is_list_type(arr.type):
            return _nulls(ctx.n, pa.null())
        values = arr.values
        if pa.types.is_union(values.type):
            raise _RowFallback("index into union elements")
        off = np.asarray(arr.offsets, np.int64)
        lens = np.diff(off)
        pos = off[:-1] + (s if s >= 0 else lens + s)
        ok = (pos >= off[:-1]) & (pos < off[1:])
        ok &= pc.is_valid(arr).to_numpy(zero_copy_only=False)
        if not ok.any():
            return _nulls(ctx.n, pa.null())
        idx = pa.array(np.where(ok, pos, None))
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        return values.take(idx)
    if not pa.types.is_struct(arr.type) or \
            arr.type.get_field_index(s) < 0:
        return _nulls(ctx.n, pa.null())
    return _struct_field_safe(arr, s)


def _struct_field_safe(arr: pa.Array, name: str):
    """pc.struct_field that cannot abort the process: Arrow merges the
    parent validity bitmap into the child, and a UNION child cannot
    carry one — the CHECK at array_nested.cc:1142 aborts (uncatchable
    from Python). When the parent has validity and the child is a
    union, return the raw child if no row is actually null, else
    degrade to the row path."""
    idx = arr.type.get_field_index(name) if isinstance(name, str) \
        else name
    ft = arr.type.field(idx).type
    if pa.types.is_union(ft) and arr.buffers()[0] is not None:
        if not arr.null_count:
            return arr.field(name)
        raise _RowFallback("struct-with-validity union child read")
    return pc.struct_field(arr, name)


def _struct_set(ctx: "_Ctx", segs: tuple, values, top=_UNSET):
    """Nested-path write: rebuild the top-level struct column with the
    leaf replaced (.a.b = v → struct column 'a' with field b = v).
    Non-struct/absent intermediates become fresh structs (runtime
    path_insert semantics). Rows whose PRIOR top-level struct is null
    get a fresh object holding ONLY the written path (interpreter
    path_insert creates no siblings) — packed as a second union lane
    so encode_json/row-path consumers see the row's true shape.
    `top` overrides the prior column (lane dispatch)."""
    if top is _UNSET:
        top = ctx.col(segs[0])
    values = _as_array(values, ctx.n)
    if isinstance(values, _Union):
        # a per-row-typed leaf: build one struct variant per leaf
        # lane and merge them as STRUCT-level union lanes. A union
        # must never nest INSIDE a struct child — pc.struct_field
        # merges parent validity into the child, and Arrow CHECK-
        # aborts the process on a union with a validity bitmap.
        acc = None
        for mask, lane in values.iter_lanes():
            sub = _struct_set(ctx, segs, lane, top=top)
            m = pa.array(mask)
            acc = sub if acc is None else _blend(m, sub, acc, ctx.n)
        return acc

    def build(arr, rest):
        if not rest:
            return values
        fields: dict = {}
        if arr is not None:
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_struct(arr.type):
                for i in range(arr.type.num_fields):
                    f = arr.type.field(i)
                    fields[f.name] = _struct_field_safe(arr, f.name)
        child = fields.get(rest[0])
        fields[rest[0]] = build(child, rest[1:])
        arrs = [_as_array(a, ctx.n) for a in fields.values()]
        return pa.StructArray.from_arrays(arrs, names=list(fields))

    rest = list(segs[1:])
    if isinstance(top, _Union):
        # recurse per lane through the FULL logic — a lane's null
        # rows must still split into a fresh written-path-only shape
        acc = None
        for mask, lane in top.iter_lanes():
            sub = _struct_set(ctx, segs, values, top=lane)
            m = pa.array(mask)
            acc = sub if acc is None else _blend(m, sub, acc, ctx.n)
        return acc
    if isinstance(top, pa.ChunkedArray):
        top = top.combine_chunks()
    if pa.types.is_struct(top.type) and \
            pc.any(pc.is_null(top)).as_py():
        full = build(top, rest)
        fresh = build(None, rest)
        if full.type != fresh.type:
            # prior struct carries siblings the fresh object must NOT
            # have: split null-prior rows into their own lane
            nullmask = pc.is_null(top).to_numpy(zero_copy_only=False)
            tag = nullmask.astype(np.int8)
            return _Union(tag, [full, fresh], ctx.n)
        return full
    return build(top, rest)


def _struct_set_gated(ctx: "_Ctx", segs: tuple, values, dead,
                      top=_UNSET):
    """Per-row-gated nested write: `dead` rows keep the field's PRIOR
    value. Expressible as a column blend for 2-segment paths — blend
    the LEAF against the old leaf, rebuild the struct, then restore
    top-level validity (a dead row whose struct was null stays null;
    pc.if_else supports struct types since Arrow 12). Deeper paths and
    non-struct prior columns rerun per-row."""
    if len(segs) != 2:
        raise _RowFallback("deep nested write on error rows")
    old = ctx.col(segs[0]) if top is _UNSET else top
    if isinstance(old, _Union):
        # mixed prior shapes (an earlier shape-splitting write):
        # run the gated write against each shape lane and re-merge
        acc = None
        for mask, lane in old.iter_lanes():
            sub = _struct_set_gated(ctx, segs, values, dead, top=lane)
            m = pa.array(mask)
            acc = sub if acc is None else _blend(m, sub, acc, ctx.n)
        return acc
    if isinstance(old, pa.ChunkedArray):
        old = old.combine_chunks()
    old_struct = pa.types.is_struct(old.type)
    if not old_struct and not pa.types.is_null(old.type):
        # a dead row's prior scalar value can't live in a struct column
        raise _RowFallback("nested write over non-struct prior")
    ok = pc.invert(dead)
    if not (old_struct and old.type.get_field_index(segs[1]) >= 0):
        # the write ADDS a field: dead rows keep their prior struct —
        # shape included (materializing the new field as null would
        # invent a sibling the row never had)
        new = _struct_set(ctx, segs, _as_array(values, ctx.n), top=old)
        return _blend(ok, new, old, ctx.n)
    old_leaf = _struct_field_safe(old, segs[1])
    gated = _blend(ok, values, old_leaf, ctx.n)
    if not isinstance(gated, _Union):
        gated = _as_array(gated, ctx.n)
    # a retyping gated write (e.g. `.obj.x = to_float(.s)` over an
    # int leaf with error rows) yields a union leaf — _struct_set
    # splits it into per-type struct lanes
    new = _struct_set(ctx, segs, gated, top=old)
    mask = pc.and_(dead, pc.is_null(old))
    if pc.any(mask).as_py():
        if isinstance(new, _Union):
            # dead rows whose struct was null stay null (tags kept,
            # owned values nulled)
            return new.mask_null(mask)
        new = _null_rows(new, mask, ctx.n)
    return new


def _compile_del_exists(name: str, args) -> Callable:
    """del.rs / exists.rs over EVENT paths as column ops.

    ``exists(.a)`` is column presence (a materialized row dict always
    carries the key, null-valued or not); ``exists(.a.b)`` is parent
    validity chained down to the field (a null struct row has no
    keys). Fields the program already WROTE re-run per row — an
    asymmetric if-branch write means per-row presence the column
    can't represent.

    ``del`` returns the old value and leaves a null-typed column (the
    schema-stable analogue of a removed key: the row path's _py_array
    null-fills missing keys the same way); a partially-stopped batch
    re-runs per row, because dead rows must KEEP the field."""
    if not args or args[0][0] is not None:
        raise NotVectorizable(f"{name} args")
    anode = args[0][1]
    if name == "del" and len(args) == 1 and anode[0] == "index" \
            and anode[1][0] == "var" and isinstance(anode[1][1], str) \
            and len(anode[2]) == 1 and isinstance(anode[2][0], str):
        # del(var.field): struct-field removal from a VARIABLE —
        # the post-parse cleanup idiom (`del(etld_result.etld_plus)`)
        # and the closure-param form (`del(value.ttl)` in map_values
        # bodies, where every element evaluates the del)
        vname, fname = anode[1][1], anode[2][0]

        def del_var(ctx):
            if ctx.active_mask is not None:
                raise _RowFallback("del on partially-stopped batch")
            if ctx.lazy_depth and ctx.lazy_depth != \
                    getattr(ctx, "writes_ok_depth", -1):
                raise _RowFallback("del in lazily-evaluated context")
            store = ctx.closure_vars if vname in ctx.closure_vars \
                else ctx.vars
            if store is ctx.vars and ctx.lazy_depth:
                # element ctx: ctx.vars holds discarded COPIES of the
                # outer vars — a del there must persist (interpreter)
                raise _RowFallback("closure body del on outer var")
            top = store.get(vname)
            if top is None or isinstance(top, _Union):
                raise _RowFallback("del var shape")
            top = _as_array(top, ctx.n)
            if isinstance(top, pa.ChunkedArray):
                top = top.combine_chunks()
            t = top.type
            if not pa.types.is_struct(t) or \
                    t.get_field_index(fname) < 0:
                return _nulls(ctx.n, pa.null()), None      # no-op
            if any(pa.types.is_union(t.field(j).type)
                   for j in range(t.num_fields)):
                raise _RowFallback("del near union child")
            i = t.get_field_index(fname)
            old = _struct_field_safe(top, i)
            rest = [(t.field(j).name, top.field(j))
                    for j in range(t.num_fields) if j != i]
            if rest:
                new = pa.StructArray.from_arrays(
                    [a for _, a in rest],
                    names=[nm for nm, _ in rest],
                    mask=pc.is_null(top))
            else:
                nn = pc.is_null(top).to_numpy(zero_copy_only=False)
                new = pa.array([None if b else {} for b in nn],
                               pa.struct([]))
            store[vname] = new
            return old, None
        return del_var
    if anode[0] == "path" and anode[1] == "event" \
            and len(anode[2]) == 2 and len(args) == 1 \
            and isinstance(anode[2][0], str) \
            and isinstance(anode[2][1], int):
        # .field[idx]: list-element presence / removal-with-shift
        # (path_remove int segment, value.py:406-418: negative idx
        # counts from the end, out-of-range and non-list are no-ops)
        return _del_exists_list_idx(name, anode[2][0], anode[2][1])
    if not (anode[0] == "path" and anode[1] == "event" and anode[2]
            and all(isinstance(sg, str) for sg in anode[2])):
        raise NotVectorizable(f"{name} target")
    if len(args) > 1:
        raise NotVectorizable(f"{name} extra args")
    segs = tuple(anode[2])

    if name == "exists":
        def existsf(ctx):
            if segs[0] in ctx.written:
                raise _RowFallback("exists on written field")
            if ctx.root_cleared or \
                    segs[0] not in ctx.batch.column_names:
                return pa.array(np.zeros(ctx.n, bool)), None
            cur = ctx.col(segs[0])
            valid = None
            for sg in segs[1:]:
                if isinstance(cur, pa.ChunkedArray):
                    cur = cur.combine_chunks()
                t = cur.type
                if not pa.types.is_struct(t) or \
                        t.get_field_index(sg) < 0:
                    return pa.array(np.zeros(ctx.n, bool)), None
                v = pc.is_valid(cur)
                valid = v if valid is None else pc.and_(valid, v)
                cur = cur.field(t.get_field_index(sg))
            if valid is None:
                return pa.array(np.ones(ctx.n, bool)), None
            return valid, None
        return existsf

    def delf(ctx):
        if ctx.active_mask is not None:
            raise _RowFallback("del on partially-stopped batch")
        if ctx.lazy_depth:
            # inside ?? RHS / if arms / closures the interpreter only
            # runs del on the rows that reach it — not expressible as
            # an ungated column mutation
            raise _RowFallback("del in lazily-evaluated context")
        if len(segs) == 1:
            old = ctx.col(segs[0])
            ctx.written[segs[0]] = _nulls(ctx.n, pa.null())
            return old, None
        if len(segs) != 2:
            raise _RowFallback("deep del")
        top = ctx.col(segs[0])
        if isinstance(top, _Union):
            raise _RowFallback("del on mixed-shape column")
        if isinstance(top, pa.ChunkedArray):
            top = top.combine_chunks()
        t = top.type
        if not pa.types.is_struct(t) or t.get_field_index(segs[1]) < 0:
            return _nulls(ctx.n, pa.null()), None      # no-op
        if any(pa.types.is_union(t.field(j).type)
               for j in range(t.num_fields)):
            raise _RowFallback("del near union child")
        i = t.get_field_index(segs[1])
        old = _struct_field_safe(top, i)
        rest = [(t.field(j).name, top.field(j))
                for j in range(t.num_fields) if j != i]
        if rest:
            new = pa.StructArray.from_arrays(
                [a for _, a in rest], names=[nm for nm, _ in rest],
                mask=pc.is_null(top))
        else:
            nulls_np = pc.is_null(top).to_numpy(zero_copy_only=False)
            new = pa.array([None if b else {} for b in nulls_np],
                           pa.struct([]))
        ctx.written[segs[0]] = new
        return old, None
    return delf


def _del_exists_list_idx(name: str, fname: str, idx: int) -> Callable:
    """``del(.f[i])`` / ``exists(.f[i])`` over a list column: offsets
    arithmetic in numpy (one pass, no per-row Python). Sliced columns
    keep ABSOLUTE offsets into the full `.values` child — all indexing
    below goes through those raw offsets (see _as_plain_list note)."""

    def _list_geom(ctx):
        top = ctx.col(fname)
        if isinstance(top, _Union):
            raise _RowFallback(f"{name} on mixed-shape column")
        top = _as_array(top, ctx.n)
        if isinstance(top, pa.ChunkedArray):
            top = top.combine_chunks()
        if not _is_list_type(top.type):
            return None
        if _contains_union(top.type):
            raise _RowFallback(f"{name} near union child")
        va = _as_plain_list(top, ctx.n, name)
        off = va.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        valid = pc.is_valid(va).to_numpy(zero_copy_only=False)
        lens = np.where(valid, off[1:] - off[:-1], 0)
        eff = lens + idx if idx < 0 else np.full(ctx.n, idx, np.int64)
        app = valid & (eff >= 0) & (eff < lens)
        return va, off, valid, lens, eff, app

    if name == "exists":
        def exists_idx(ctx):
            if fname in ctx.written:
                raise _RowFallback("exists on written field")
            if ctx.root_cleared or fname not in ctx.batch.column_names:
                return pa.array(np.zeros(ctx.n, bool)), None
            g = _list_geom(ctx)
            if g is None:
                return pa.array(np.zeros(ctx.n, bool)), None
            return pa.array(g[5]), None
        return exists_idx

    def del_idx(ctx):
        if ctx.active_mask is not None:
            raise _RowFallback("del on partially-stopped batch")
        if ctx.lazy_depth:
            raise _RowFallback("del in lazily-evaluated context")
        g = _list_geom(ctx)
        if g is None:
            return _nulls(ctx.n, pa.null()), None          # no-op
        va, off, valid, lens, eff, app = g
        if not app.any():
            return _nulls(ctx.n, pa.null()), None          # no-op
        pos = off[:-1] + eff
        removed = va.values.take(pa.array(pos, mask=~app))
        tot = int(lens.sum())
        starts = np.cumsum(lens) - lens
        row_rep = np.repeat(np.arange(ctx.n), lens)
        intra = np.arange(tot) - starts[row_rep]
        abs_i = off[:-1][row_rep] + intra
        keep = ~(app[row_rep] & (intra == eff[row_rep]))
        new_lens = lens - app.astype(np.int64)
        new_off = np.zeros(ctx.n + 1, np.int64)
        np.cumsum(new_lens, out=new_off[1:])
        if new_off[-1] > np.iinfo(np.int32).max:
            raise _RowFallback("del list overflow")
        new = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), mask=np.concatenate(
                (~valid, [False]))),
            va.values.take(pa.array(abs_i[keep])))
        ctx.written[fname] = new
        return removed, None
    return del_idx


def _var_reader(name: str) -> Callable:
    """Current-value source for variable |= targets: ctx.vars (an
    unset variable coerces through the merge's not-object path)."""
    def read_cur(ctx):
        v = ctx.vars.get(name)
        if v is None:
            return _nulls(ctx.n, pa.null())
        return _as_array(v, ctx.n)
    return read_cur


def _compile_merge_assign(segs: tuple, rf: Callable,
                          read_cur: Callable = None) -> Callable:
    """``target |= rhs`` (merge.rs ObjectMerge): per row the target
    coerces to ``{}`` unless it is an object, then rhs's fields merge
    in (rhs must be an object — a null/non-object rhs errors per row
    with "can't merge type {kind} into object"). A struct target with
    null rows splits shapes: those rows get ONLY rhs's fields.
    ``read_cur`` overrides the current-value source (variable targets
    read ctx.vars instead of event columns)."""

    def f(ctx):
        rv, re = rf(ctx)
        if isinstance(rv, _Union):
            raise _RowFallback("|= union rhs")
        ra = _as_array(rv, ctx.n)
        if isinstance(ra, pa.ChunkedArray):
            ra = ra.combine_chunks()
        rt = ra.type
        tmpl = "can't merge type {r} into object"
        if not pa.types.is_struct(rt):
            rn = pc.is_null(ra).to_numpy(zero_copy_only=False)
            rk = _vrl_kind_name(rt)
            msgs = [tmpl.format(r="null" if b else rk) for b in rn]
            return _nulls(ctx.n, pa.null()), \
                _merge_errs(ctx.n, re, pa.array(msgs, pa.string()))
        if any(pa.types.is_union(rt.field(j).type)
               for j in range(rt.num_fields)):
            raise _RowFallback("|= near union child")
        # current target value
        cur = read_cur(ctx) if read_cur is not None \
            else ctx.col(segs[0])
        for sg in segs[1:]:
            if isinstance(cur, _Union):
                raise _RowFallback("|= over mixed shapes")
            if isinstance(cur, pa.ChunkedArray):
                cur = cur.combine_chunks()
            if not pa.types.is_struct(cur.type) or \
                    cur.type.get_field_index(sg) < 0:
                cur = _nulls(ctx.n, pa.null())
                break
            if any(pa.types.is_union(cur.type.field(j).type)
                   for j in range(cur.type.num_fields)):
                raise _RowFallback("|= near union child")
            cur = _struct_field_safe(cur, sg)
        if isinstance(cur, _Union):
            raise _RowFallback("|= over mixed shapes")
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        lt = cur.type
        rnull = pc.is_null(ra)
        errs = None
        if pc.any(rnull).as_py():
            errs = _err_where(rnull, tmpl.format(r="null"), ctx.n)
        if pa.types.is_struct(lt):
            if any(pa.types.is_union(lt.field(j).type)
                   for j in range(lt.num_fields)):
                raise _RowFallback("|= near union child")
            fields: dict = {}
            for j in range(lt.num_fields):
                fields[lt.field(j).name] = cur.field(j)
            for j in range(rt.num_fields):
                fields[rt.field(j).name] = ra.field(j)
            merged = pa.StructArray.from_arrays(
                list(fields.values()), names=list(fields),
                mask=pc.fill_null(rnull, False))
            if cur.null_count:
                # null-target rows coerce to {}: they carry ONLY
                # rhs's fields — a second shape lane
                if merged.type != ra.type:
                    tag = pc.is_null(cur) \
                        .to_numpy(zero_copy_only=False).astype(np.int8)
                    return _Union(tag, [merged, ra], ctx.n), errs
            return merged, errs
        # wholly non-object target (int column / missing): rhs as-is
        return ra, errs
    return f


def _take_any(v, idx_pa, idx_np, m: int):
    """Row-length value → element length via take (constants pass
    through; unions take per lane + retag)."""
    if isinstance(v, (_PyConst, pa.Scalar)):
        return v
    if isinstance(v, _Union):
        return _Union(v.tag[idx_np],
                      [lane.take(idx_pa) for lane in v.lanes], m)
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    return v.take(idx_pa)


def _element_ctx(ctx, flat_n: int, ridx=None):
    """Sub-context for a closure body over flattened list elements.
    With ``ridx`` (row index per element), EVERY outer surface —
    batch columns, written overlay, variables, enclosing closure vars
    — expands to element length by repeating each row's value once
    per element, so capture-bearing bodies (``|v| v + .base``) stay
    columnar instead of falling back to the row path. Side effects
    inside the body still degrade via lazy_depth."""
    sub = _Ctx.__new__(_Ctx)
    sub.n = flat_n
    sub.active_mask = None
    sub.lazy_depth = 1
    sub.writes_ok_depth = 1   # every element evaluates the body
    if ridx is None:
        sub.batch = None
        sub.written = {}
        sub.vars = {}      # outer vars are row-length, not element-length
        sub.closure_vars = dict(ctx.closure_vars)
        sub.root_cleared = False
        return sub
    if ctx.batch is None:
        raise _RowFallback("captured closure without batch")
    idx_pa = pa.array(ridx, pa.int64())
    sub.batch = ctx.batch.take(idx_pa)
    sub.written = {k: _take_any(v, idx_pa, ridx, flat_n)
                   for k, v in ctx.written.items()}
    sub.vars = {k: _take_any(v, idx_pa, ridx, flat_n)
                for k, v in ctx.vars.items()}
    sub.closure_vars = {k: _take_any(v, idx_pa, ridx, flat_n)
                        for k, v in ctx.closure_vars.items()}
    sub.root_cleared = ctx.root_cleared
    return sub


def _compile_map_values(args, closure):
    """Closure lowering: ``map_values(.list_col) -> |v| { expr }``
    computes the body ONCE over the flattened element array and
    rebuilds the list — no per-row Python. Bodies reading outer state
    (event paths / vars) run over an element-expanded context
    (:func:`_element_ctx`)."""
    params, body = closure
    if len(args) != 1 or args[0][0] is not None or len(params) != 1:
        raise NotVectorizable("map_values shape")
    argf = _compile_expr(args[0][1])
    pname = params[0]
    captures = _reads_beyond_param(body, pname)
    bodyf = _compile_expr(_unwrap_block(body))

    def mv(ctx):

        v, e = argf(ctx)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if not pa.types.is_list(v.type):
            raise _RowFallback("map_values over non-list column")
        if v.null_count:
            raise _RowFallback("map_values over null list rows")
        flat = v.flatten()
        lens = pc.list_value_length(v)
        lens_np = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False)
        ridx = np.repeat(np.arange(ctx.n), lens_np) if captures \
            else None
        sub = _element_ctx(ctx, len(flat), ridx)
        sub.closure_vars[pname] = flat
        bv, be = bodyf(sub)
        if be is not None and pc.any(pc.is_valid(be)).as_py():
            raise _RowFallback("map_values element error")
        bv = _as_array(bv, sub.n)
        if isinstance(bv, _Union):
            raise _RowFallback("map_values union elements")
        offsets = np.zeros(len(lens_np) + 1, dtype=np.int32)
        np.cumsum(lens_np, out=offsets[1:])
        out = pa.ListArray.from_arrays(pa.array(offsets), bv)
        return out, e
    return mv


def _reads_beyond_param(node, pname) -> bool:
    """True if the closure body reads anything but its parameter(s)
    (event paths, other variables) — then the result is row-dependent.
    ``pname`` may be one name or a set of names."""
    names = {pname} if isinstance(pname, str) else set(pname)
    if isinstance(node, tuple):
        if node and node[0] == "path":
            return True
        if node and node[0] == "var" and node[1] not in names:
            return True
        if node and node[0] == "varpath" and \
                isinstance(node[1], str) and node[1] not in names:
            # a varpath TARGET names its base var as a bare string
            # (no nested ("var", …) node) — it reads AND writes it
            return True
        return any(_reads_beyond_param(x, names) for x in node)
    if isinstance(node, list):
        return any(_reads_beyond_param(x, names) for x in node)
    return False


def _compile_map_keys(args, closure, span=None):
    """Closure lowering: ``map_keys(.obj) -> |k| { expr }`` — a
    struct column's keys are TYPE-level constants, so a body reading
    only its parameter runs ONCE PER FIELD NAME, not per row;
    colliding renames keep the later field (dict-overwrite order,
    the interpreter's map_keys). Null rows error per row
    ('expected object')."""
    params, body = closure
    pos = [a for n_, a in args if n_ is None]
    named = {n_: a for n_, a in args if n_ is not None}
    if len(pos) > 2 or not pos or len(params) != 1 \
            or set(named) - {"recursive"}:
        raise NotVectorizable("map_keys shape")
    rnode = pos[1] if len(pos) == 2 else named.get("recursive")
    if rnode is None:
        recursive = False
    elif rnode[0] == "lit" and isinstance(rnode[1], bool):
        recursive = rnode[1]
    else:
        raise NotVectorizable("map_keys non-constant recursive")
    if _reads_beyond_param(body, params[0]):
        raise NotVectorizable("map_keys row-dependent body")
    argf = _compile_expr(pos[0])
    pname = params[0]
    bodyf = _compile_expr(_unwrap_block(body))

    def rename_one(ctx, name: str) -> str:
        sub = _Ctx.__new__(_Ctx)
        sub.batch = None
        sub.n = 1
        sub.written = {}
        sub.vars = {}
        sub.active_mask = None
        sub.root_cleared = False
        sub.lazy_depth = 1
        sub.closure_vars = {pname: pa.array([name])}
        v, e = bodyf(sub)
        if e is not None and pc.any(pc.is_valid(e)).as_py():
            raise _RowFallback("map_keys body error")
        va = _as_array(v, 1)
        if isinstance(va, _Union) or not _is_str_type(va.type) \
                or va.null_count:
            raise _RowFallback("map_keys non-string key")
        return va[0].as_py()

    def mk(ctx):
        prefix = _call_frame("map_keys", span)

        def rename_deep(arr):
            """recursive: true — keys are TYPE-level, so the rename
            recurses through struct children and list elements once
            per field name (interpreter walk, object.py:234-242)."""
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = arr.type
            if pa.types.is_struct(t):
                if any(pa.types.is_union(t.field(j).type)
                       for j in range(t.num_fields)):
                    raise _RowFallback("map_keys union child")
                fs: dict = {}
                for j in range(t.num_fields):
                    fs[rename_one(ctx, t.field(j).name)] = \
                        rename_deep(arr.field(j))
                if len(fs) != t.num_fields:
                    # colliding renames keep the LAST source field —
                    # but a constant-folded literal's field order can
                    # differ from the interpreter dict's: row path
                    raise _RowFallback("map_keys key collision")
                nulls = pc.is_null(arr)
                if not fs:
                    nn = nulls.to_numpy(zero_copy_only=False)
                    return pa.array([None if b else {} for b in nn],
                                    pa.struct([]))
                return pa.StructArray.from_arrays(
                    list(fs.values()), names=list(fs), mask=nulls)
            if _is_list_type(t):
                if arr.null_count:
                    raise _RowFallback("map_keys recursive null list")
                vals = rename_deep(arr.flatten())
                lens = pc.list_value_length(arr) \
                    .to_numpy(zero_copy_only=False)
                offsets = np.zeros(len(lens) + 1, dtype=np.int32)
                np.cumsum(lens, out=offsets[1:])
                return pa.ListArray.from_arrays(pa.array(offsets),
                                                vals)
            return arr

        def over(arr):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = arr.type
            if not pa.types.is_struct(t):
                raise _RowFallback("map_keys over non-object column")
            fields: dict = {}
            for j in range(t.num_fields):
                child = arr.field(j)
                if recursive:
                    child = rename_deep(child)
                fields[rename_one(ctx, t.field(j).name)] = child
            if fields and len(fields) != t.num_fields:
                # colliding renames: constant-folded literals may
                # carry a different field order than the interpreter
                # dict — last-wins diverges, row path owns it
                raise _RowFallback("map_keys key collision")
            nulls = pc.is_null(arr)
            if not fields:
                nn = nulls.to_numpy(zero_copy_only=False)
                out = pa.array([None if b else {} for b in nn],
                               pa.struct([]))
            else:
                out = pa.StructArray.from_arrays(
                    list(fields.values()), names=list(fields),
                    mask=nulls)
            errs = None
            if arr.null_count:
                # the interpreter errors per null row
                errs = _err_where(nulls, prefix + "expected object",
                                  ctx.n)
            return out, errs
        v, e = argf(ctx)
        if isinstance(v, _Union):
            out, errs = _u_lanes(ctx, v, lambda lane: over(lane))
            return out, _merge_errs(ctx.n, e, errs)
        out, errs = over(_as_array(v, ctx.n))
        return out, _merge_errs(ctx.n, e, errs)
    return mk


def _compile_filter(args, closure):
    """Closure lowering: ``filter(.list_col) -> |i, v| { pred }``
    evaluates the predicate ONCE over the flattened element array and
    rebuilds each list from the kept elements — no per-row Python.
    Both closure params are available: the index var binds to the
    element's position within its own list. Object inputs (key/value
    filtering) take the row fallback."""

    params, body = closure
    if len(args) != 1 or args[0][0] is not None or len(params) != 2:
        raise NotVectorizable("filter shape")
    argf = _compile_expr(args[0][1])
    iname, vname = params
    captures = _reads_beyond_param(body, {iname, vname})
    bodyf = _compile_expr(_unwrap_block(body))

    def fv(ctx):
        v, e = argf(ctx)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if not pa.types.is_list(v.type):
            raise _RowFallback("filter over non-list input")
        if v.null_count:
            raise _RowFallback("filter over null list rows")
        flat = v.flatten()
        lens_np = pc.list_value_length(v).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.cumsum(lens_np) - lens_np
        within = np.arange(len(flat)) - np.repeat(starts, lens_np)
        ridx = np.repeat(np.arange(ctx.n), lens_np) if captures \
            else None
        sub = _element_ctx(ctx, len(flat), ridx)
        sub.closure_vars[vname] = flat
        sub.closure_vars[iname] = pa.array(within, pa.int64())
        bv, be = bodyf(sub)
        if be is not None and pc.any(pc.is_valid(be)).as_py():
            raise _RowFallback("filter predicate error")
        bv = _as_array(bv, sub.n)
        if not pa.types.is_boolean(bv.type):
            # reference semantics: the filter closure must return a
            # boolean (compile-time checked there) — anything else is
            # outside the vector subset
            raise _RowFallback("filter predicate not boolean")
        mask = pc.fill_null(bv, False)
        mask_np = mask.to_numpy(zero_copy_only=False)
        kept = flat.filter(mask)
        # kept-count per list via prefix sums (robust to empty lists)
        csum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(mask_np.astype(np.int64), out=csum[1:])
        ends = starts + lens_np
        new_lens = csum[ends] - csum[starts]
        offsets = np.zeros(len(new_lens) + 1, dtype=np.int32)
        np.cumsum(new_lens, out=offsets[1:])
        out = pa.ListArray.from_arrays(pa.array(offsets), kept)
        return out, e
    return fv


def _compile_replace_with(args, closure, span=None):
    """Closure lowering: ``replace_with(value, pattern[, count]) ->
    |m| { body }`` (reference src/stdlib/replace_with.rs). The body
    may read ONLY its match parameter, so the call is evaluated once
    per DISTINCT input string (encode_json leaf-renderer trick:
    dictionary-encode, run the row function over the dictionary,
    ``take`` back out) — digest cost ∝ distinct values × matches, not
    rows. Each match's capture object is bound to the closure var as
    a 1-row batch and the compiled body runs on it; any body error
    (fallible call, abort, non-string result surfaced by the row
    function) degrades to the row path for exact nested diagnostics."""
    params, body = closure
    pos = [a for n_, a in args if n_ is None]
    named = {n_: a for n_, a in args if n_ is not None}
    if len(params) != 1 or not (2 <= len(pos) <= 3) \
            or set(named) - {"count"}:
        raise NotVectorizable("replace_with shape")
    pname = params[0]
    if _reads_beyond_param(body, pname):
        # row-dependent replacement (body reads event paths / outer
        # vars) — per-distinct evaluation is unsound
        raise NotVectorizable("replace_with row-dependent body")
    valf = _compile_expr(pos[0])
    patf = _compile_expr(pos[1])
    cnode = pos[2] if len(pos) == 3 else named.get("count")
    cntf = _compile_expr(cnode) if cnode is not None else None
    bodyf = _compile_expr(_unwrap_block(body))

    def body_value(obj):
        """Evaluate the closure body over ONE match object; returns
        the python result. Raises _RowFallback on any body error."""
        from .remap import _py_array

        sub = _Ctx.__new__(_Ctx)
        sub.batch = None
        sub.n = 1
        sub.written = {}
        sub.vars = {}
        sub.active_mask = None
        sub.root_cleared = False
        sub.lazy_depth = 1
        sub.closure_vars = {pname: _py_array([obj])}
        bv, be = bodyf(sub)
        if be is not None and pc.any(pc.is_valid(be)).as_py():
            raise _RowFallback("replace_with body error")
        if isinstance(bv, _Union):
            bv = bv.to_arrow()
        return _as_array(bv, 1)[0].as_py()

    def rw(ctx):
        from ..functions.string import replace_with as _rw_row
        from ..value import VrlError

        prefix = _call_frame("replace_with", span)
        v, e = valf(ctx)
        p, pe = patf(ctx)
        e = _frame_arg_errs(e, prefix, ctx.n)
        pe = _frame_arg_errs(pe, prefix, ctx.n)
        if isinstance(p, _PyConst):
            pattern = p.value
        elif isinstance(p, pa.Scalar) and isinstance(p.as_py(), str):
            pattern = p.as_py()
        else:
            raise _RowFallback("replace_with non-constant pattern")
        count = -1
        if cntf is not None:
            cv, _ce = cntf(ctx)
            if not isinstance(cv, pa.Scalar) or not isinstance(
                    cv.as_py(), int):
                raise _RowFallback("replace_with non-constant count")
            count = cv.as_py()
        va = _as_array(v, ctx.n)
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        if isinstance(va, _Union) or not _is_str_type(va.type) \
                or va.null_count:
            # null / non-string inputs carry the interpreter's exact
            # argument-kind error texts — row path owns those
            raise _RowFallback("replace_with non-string input")
        d = va.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        out_u: list = [None] * len(uniq)
        err_u: list = [None] * len(uniq)
        for i, s in enumerate(uniq):
            try:
                out_u[i] = _rw_row(s, pattern, body_value, count)
            except VrlError as ex:
                err_u[i] = prefix + ex.message
        out = pc.take(pa.array(out_u, pa.string()), d.indices)
        errs = None
        if any(m is not None for m in err_u):
            errs = pc.take(pa.array(err_u, pa.string()), d.indices)
        return out, _merge_errs(ctx.n, e, pe, errs)
    return rw


def _infallible_node(node) -> bool:
    """Conservatively true when the expression can never raise a
    per-row error: literals and pure path/variable reads (a query on
    a missing/mistyped path yields null, never an error), plus
    containers of only those."""
    k = node[0]
    if k in ("lit", "regex", "ts", "path", "var"):
        return True
    if k == "array":
        return all(_infallible_node(x) for x in node[1])
    if k == "object":
        return all(_infallible_node(v) for _, v in node[1])
    return False


def _compile_siblings(nodes) -> list:
    """Compile a left-to-right sibling list (array elements, object
    fields): every sibling after the first potentially-failing one is
    conditionally reached in the interpreter and gets lazy-gated."""
    out = []
    prior_fallible = False
    for x in nodes:
        f = _compile_expr(x)
        if prior_fallible:
            f = _lazy_gate(f)
        prior_fallible = prior_fallible or not _infallible_node(x)
        out.append(f)
    return out


def _lazy_gate(f: Callable) -> Callable:
    """Mark `f`'s evaluation as conditionally reached: an EARLIER
    sibling (argument, container element, binop LHS) can fail per
    row, so the interpreter never reaches `f` on those rows. Bumping
    lazy_depth makes side-effecting expressions (del) fall back to
    the row path instead of applying batch-wide."""
    def g(ctx):
        ctx.lazy_depth += 1
        try:
            return f(ctx)
        finally:
            ctx.lazy_depth -= 1
    return g


def _compile_expr(node) -> Callable:
    kind = node[0]
    if kind == "lit":
        v = node[1]

        def lit(ctx):
            return pa.scalar(v), None
        return lit

    if kind == "lit_typedef":
        # compile-time-resolved type_def() (typecheck.annotate): a
        # constant dict — the inner expression never executes
        td = node[1]

        def littd(ctx):
            return pa.scalar(td), None
        return littd

    if kind == "regex":
        # regex literal → a COMPILED pattern constant (_PyConst):
        # the interpreter's regex VALUE. Pattern-consuming kernels
        # unwrap it via _pattern_str; value positions (to_int!(r'x'))
        # poison-degrade to the row path's exact coercion errors.
        import regex as _regex_mod
        try:
            pat = _regex_mod.compile(node[1])
        except _regex_mod.error:
            raise NotVectorizable("invalid regex literal")

        def rx(ctx):
            return _PyConst(pat), None
        return rx

    if kind == "ts":
        # timestamp literal (t'…') → one Arrow timestamp scalar,
        # exactly the interpreter's parse (UTC-normalized)
        from datetime import datetime, timezone
        s = node[1].strip()
        try:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError:
            raise NotVectorizable("invalid timestamp literal")
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        dt = dt.astimezone(timezone.utc)
        sc = pa.scalar(dt, pa.timestamp("us", tz="UTC"))

        def tsl(ctx):
            return sc, None
        return tsl

    if kind in ("array", "object"):
        # constant containers fold to one Arrow scalar (list/struct),
        # broadcast at use sites — `.tags = ["a", "b"]` is a common
        # remap idiom.
        fold_failed = False
        try:
            v = _const_container(node)
        except NotVectorizable:
            fold_failed = True
        if not fold_failed:
            try:
                s = pa.scalar(v)
                if not _typed_eq(s.as_py(), v):
                    # pa.scalar silently COERCED a numeric kind mix
                    # ([4.73, 2] → list<double>) — VRL keeps per-
                    # element kinds; the runtime builder unions them
                    raise pa.ArrowTypeError("kind coercion")

                def container(ctx):
                    return s, None
                return container
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError, TypeError):
                # heterogeneous constant (e.g. ["x", 1]): no single
                # Arrow element type — the runtime builder below emits
                # a list<sparse union> column instead (r4)
                pass
        # computed elements (r4): build the container column at
        # runtime — ListArray from interleaved element columns
        # (list<union> when element types mix), StructArray from
        # field columns (any per-field types). Element errors
        # become the container expression's per-row errors
        # (interpreter: the first erroring element propagates).
        if kind == "object":
            names = [k for k, _ in node[1]]
            fieldfs = _compile_siblings([x for _, x in node[1]])

            def objf(ctx):
                errs = None
                cols = []
                for ff in fieldfs:
                    fv, fe = ff(ctx)
                    errs = _merge_errs(ctx.n, errs, fe)
                    fva = _as_array(fv, ctx.n)
                    if isinstance(fva, _Union):
                        raise _RowFallback(
                            "union value in object literal")
                    cols.append(fva.combine_chunks()
                                if isinstance(fva, pa.ChunkedArray)
                                else fva)
                return pa.StructArray.from_arrays(cols, names=names), \
                    errs
            return objf

        elemfs = _compile_siblings(node[1])
        k = len(elemfs)

        def arrf(ctx):
            if k == 0:
                empty = pa.ListArray.from_arrays(
                    pa.array(np.zeros(ctx.n + 1, np.int32)),
                    pa.array([], pa.null()))
                return empty, None
            errs = None
            cols = []
            for ef in elemfs:
                ev_, ee = ef(ctx)
                errs = _merge_errs(ctx.n, errs, ee)
                eva = _as_array(ev_, ctx.n)
                if isinstance(eva, _Union):
                    raise _RowFallback("union value in array literal")
                cols.append(eva.combine_chunks()
                            if isinstance(eva, pa.ChunkedArray)
                            else eva)
            # row-major interleave: row i = [c0[i], c1[i], ...]
            idx = pa.array((np.arange(ctx.n)[:, None]
                            + np.arange(k)[None, :] * ctx.n).ravel(),
                           pa.int64())
            offsets = pa.array(np.arange(ctx.n + 1, dtype=np.int32)
                               * k)
            # unify null-typed elements into the common type when
            # exactly one non-null type exists; otherwise emit
            # list<sparse union> (per-element types — matches the
            # interpreter's mixed Python lists)
            types = []
            codes = []
            for c in cols:
                t = c.type
                code = next((i for i, lt in enumerate(types)
                             if lt == t), None)
                if code is None:
                    types.append(t)
                    code = len(types) - 1
                codes.append(code)
            non_null = [t for t in types if not pa.types.is_null(t)]
            if len(non_null) <= 1:
                common = non_null[0] if non_null else pa.null()
                cols = [c if c.type == common
                        else _nulls(ctx.n, common) for c in cols]
                values = pa.concat_arrays(cols).take(idx)
                return pa.ListArray.from_arrays(offsets, values), errs
            children = []
            for lane, t in enumerate(types):
                padded = [c if codes[j] == lane else _nulls(ctx.n, t)
                          for j, c in enumerate(cols)]
                children.append(pa.concat_arrays(padded).take(idx))
            tags = np.tile(np.array(codes, np.int8), ctx.n)
            values = _dense_union(tags, children, ctx.n * k)
            return pa.ListArray.from_arrays(offsets, values), errs
        return arrf

    if kind == "path":
        if node[1] == "event" and node[2] == []:
            # whole-event read (`.backup = .`, `encode_json(.)`):
            # a struct of the batch columns. Only while NO field has
            # been written — gated writes would need per-row key
            # presence the column set can't express
            def rootread(ctx):
                if ctx.written or ctx.root_cleared:
                    raise _RowFallback(". read after writes")
                names = ctx.batch.column_names
                if not names:
                    raise _RowFallback(". read of empty batch")
                arrs = []
                for nm in names:
                    c = ctx.col(nm)
                    if isinstance(c, _Union):
                        raise _RowFallback(". read over union column")
                    arrs.append(c)
                return pa.StructArray.from_arrays(arrs,
                                                  names=list(names)), \
                    None
            return rootread
        if node[1] == "meta" and node[2] == []:
            # metadata-root read (`%`): an object of the %fields
            # written so far (the remap stage passes no inbound
            # metadata, so ctx.written's mangled keys are the whole
            # namespace). GATED meta writes (if arms / post-abort)
            # mean per-row key presence — row path owns those.
            def metaroot(ctx):
                if getattr(ctx, "gated_meta", False):
                    raise _RowFallback("% read after gated meta write")
                names = [k_ for k_ in ctx.written
                         if isinstance(k_, str) and k_.startswith(_META)]
                if not names:
                    return pa.array([{}] * ctx.n, pa.struct([])), None
                arrs = []
                for k_ in names:
                    c = ctx.written[k_]
                    if isinstance(c, _Union):
                        raise _RowFallback("% read over union meta")
                    arrs.append(_as_array(c, ctx.n))
                return pa.StructArray.from_arrays(
                    arrs, names=[k_[len(_META):] for k_ in names]), None
            return metaroot
        if node[1] not in ("event", "meta") or not node[2] or \
                not isinstance(node[2][0], str) or \
                not all(isinstance(s, (str, int)) for s in node[2]):
            raise NotVectorizable(f"path {node!r}")
        segs = list(node[2])
        if node[1] == "meta":
            # transient per-event metadata: written-only namespace
            # (the remap stage passes no inbound metadata)
            segs[0] = _META + segs[0]
        if len(segs) == 1:
            field = segs[0]

            def path(ctx):
                return ctx.col(field), None
            return path

        def nested_path(ctx):
            # nested read: struct columns (.a.b → struct_field), list
            # elements (.a[0]); union columns (mixed row shapes) read
            # lane-wise — a lane without the field contributes nulls
            arr = ctx.col(segs[0])
            for s in segs[1:]:
                if isinstance(arr, _Union):
                    def rd(lane, _s=s):
                        return _seg_read(ctx, lane, _s), None
                    arr, _ = _u_lanes(ctx, arr, rd)
                    continue
                arr = _seg_read(ctx, arr, s)
                if isinstance(arr, pa.Array) and \
                        pa.types.is_union(arr.type):
                    arr = _from_arrow_union(arr, ctx.n)
                    continue
                if pa.types.is_null(arr.type):
                    return arr, None
            return arr, None
        return nested_path

    if kind == "index":
        # indexing an arbitrary expression: split(.s, ",")[0],
        # [1, 2][0], v[1], {"a": 1}.a — same query semantics as
        # path segments (out-of-range / missing → null)
        basef_i = _compile_expr(node[1])
        isegs = node[2]
        if not isegs or not all(isinstance(s, (str, int))
                                for s in isegs):
            raise NotVectorizable("index segs")

        def idxf(ctx):
            v, e = basef_i(ctx)
            arr = v
            for s in isegs:
                if isinstance(arr, _Union):
                    def rd(lane, _s=s):
                        return _seg_read(ctx, lane, _s), None
                    arr, _ = _u_lanes(ctx, arr, rd)
                    continue
                arr = _seg_read(ctx, _as_array(arr, ctx.n), s)
                if isinstance(arr, pa.Array) and \
                        pa.types.is_union(arr.type):
                    arr = _from_arrow_union(arr, ctx.n)
                    continue
                if pa.types.is_null(arr.type):
                    break
            return arr, e
        return idxf

    if kind == "var":
        name = node[1]

        def var(ctx):
            if name in ctx.closure_vars:
                return ctx.closure_vars[name], None
            if name in ctx.vars:
                return ctx.vars[name], None
            # a read of an undefined variable is a per-row runtime
            # error in the interpreter — out of the column plan
            raise _RowFallback(f"var {name}")
        return var

    if kind == "not":
        inner = _compile_expr(node[1])

        def notf(ctx):
            v, e = inner(ctx)
            va = _as_array(v, ctx.n)
            if not pa.types.is_boolean(va.type) and \
                    not pa.types.is_null(va.type):
                # `!` requires a boolean (not.rs); non-bool columns
                # carry the per-row error text only the row path builds
                raise _RowFallback("! on non-boolean column")
            errs = None
            if pc.any(pc.is_null(va)).as_py():
                # null operand is a per-row error, not a null result
                errs = _err_where(pc.is_null(va),
                                  "expected boolean, got null", ctx.n)
            return pc.invert(v), _merge_errs(ctx.n, e, errs)
        return notf

    if kind == "binop":
        return _compile_binop(node)

    if kind == "if":
        arms, els = node[1], node[2]
        condfs = [_compile_expr(c) for c, _ in arms]
        thenfs = [_compile_expr(_unwrap_block(b)) for _, b in arms]
        elsef = _compile_expr(_unwrap_block(els)) if els is not None \
            else None

        def iff(ctx):
            ctx.lazy_depth += 1
            try:
                return _iff_body(ctx)
            finally:
                ctx.lazy_depth -= 1

        def _iff_body(ctx):
            # else-if chain: each condition only RUNS on rows every
            # earlier arm left (mask its errors to `remaining` —
            # lazy-eval parity), and each arm's value/errors only
            # count on the rows that arm takes. Condition errors
            # shadow branch errors via first-wins merge order.
            errs = None
            conds = []
            remaining = None
            for k_, cf in enumerate(condfs):
                if k_ == 0:
                    # the FIRST predicate runs on every row — its
                    # side effects (block var captures: the `(ok,
                    # err = f(); err == null)` idiom) are sound at
                    # the enclosing laziness level
                    ctx.lazy_depth -= 1
                    try:
                        c, ce = cf(ctx)
                    finally:
                        ctx.lazy_depth += 1
                else:
                    c, ce = cf(ctx)
                ce = _merge_errs(ctx.n, ce, _predicate_errs(c, ctx.n))
                if ce is not None and remaining is not None:
                    ce = pc.if_else(remaining, ce, _nulls(ctx.n))
                errs = _merge_errs(ctx.n, errs, ce)
                cb = _as_array(
                    pc.fill_null(pc.cast(c, pa.bool_()), False), ctx.n)
                if remaining is not None:
                    cb = pc.and_(cb, remaining)
                conds.append(cb)
                inv = pc.invert(cb)
                remaining = inv if remaining is None \
                    else pc.and_(remaining, inv)
            if elsef is not None:
                acc, ee = elsef(ctx)
                if ee is not None:
                    errs = _merge_errs(
                        ctx.n, errs,
                        pc.if_else(remaining, ee, _nulls(ctx.n)))
            else:
                # `if` without `else` evaluates to null on untaken
                # rows (if.rs: Block::Empty resolves to Value::Null)
                acc = _nulls(ctx.n, pa.null())
            acc = _as_array(acc, ctx.n)
            for i in range(len(arms) - 1, -1, -1):
                tv, te = thenfs[i](ctx)
                if te is not None:
                    errs = _merge_errs(
                        ctx.n, errs,
                        pc.if_else(conds[i], te, _nulls(ctx.n)))
                acc = _blend(conds[i], tv, acc, ctx.n)
            return acc, errs
        return iff

    if kind == "call":
        _, name, bang, args, closure = node[:5]
        if closure is not None:
            span_c = node[5] if len(node) > 5 else None
            if name == "map_values":
                cbase = _compile_map_values(args, closure)
            elif name == "map_keys":
                cbase = _compile_map_keys(args, closure, span_c)
            elif name == "filter":
                cbase = _compile_filter(args, closure)
            elif name == "replace_with":
                cbase = _compile_replace_with(args, closure, span_c)
            else:
                raise NotVectorizable(f"closure call {name}")
            if not bang:
                return cbase

            def cbangf(ctx):
                # closure calls share the bang-abort semantics of the
                # plain-call path below: errors (incl. ARGUMENT
                # errors) become uncapturable abort tags
                v, e = cbase(ctx)
                if e is None or not pc.any(pc.is_valid(e)).as_py():
                    return v, None
                return v, _tag_abort(e)
            return cbangf
        if name in ("del", "exists"):
            return _compile_del_exists(name, args)
        row_loop = False
        if name not in _KERNELS and name not in _KERNELS_NODES \
                and name not in _KERNELS_SPAN:
            from ..functions import REGISTRY
            if name in REGISTRY and name not in _ROW_LOOP_EXCLUDE:
                row_loop = True     # generic statement-bounded tier
            else:
                raise NotVectorizable(f"call {name}")
        try:
            args = _canonicalize_named_args(name, args)
        except NotVectorizable:
            if not row_loop:
                raise
            # the row-loop tier calls the Python registry fn directly
            # (interpreter.py:437-441 semantics) — named args that
            # leave a positional hole (`flatten(., except: [...])`)
            # pass through as **kwargs instead of falling back
        kwnames = [an for an, _ in args]
        argfs = []
        argnodes = []
        prior_fallible = False
        for aname, aexpr in args:
            if aname is not None and not row_loop:
                raise NotVectorizable("named args")
            f = _compile_expr(aexpr)
            if prior_fallible:
                # an earlier argument can fail per row — the
                # interpreter never reaches this argument on those
                # rows, so side effects here (del) must defer
                f = _lazy_gate(f)
            prior_fallible = prior_fallible or \
                not _infallible_node(aexpr)
            argfs.append(f)
            argnodes.append(aexpr)
        span = node[5] if len(node) > 5 else None
        frame = _call_frame(name, span)

        def eval_args(ctx):
            # an errored ARGUMENT expression is reported inside the
            # outer call's positioned frame (interpreter _eval_call
            # wraps raw VrlErrors; already-framed ones pass through).
            # Constant-folded FIRST args broadcast to columns — the
            # kernels' per-row error paths assume array input (later
            # args stay scalar: literal bounds/patterns read .as_py()).
            out = []
            for i, f in enumerate(argfs):
                v, e = f(ctx)
                if i == 0 and isinstance(v, pa.Scalar):
                    v = _as_array(v, ctx.n)
                out.append((v, _frame_arg_errs(e, frame, ctx.n)))
            return out

        if row_loop:
            fnr = _row_loop_kernel(
                name, kwnames if any(kwnames) else None)

            def basef(ctx):
                return fnr(ctx, eval_args(ctx), span)
        elif name in _KERNELS_NODES:
            fn = _KERNELS_NODES[name]

            def basef(ctx):
                return _u_args(fn, ctx, eval_args(ctx), argnodes, span)
        elif name in _KERNELS_SPAN:
            fn = _KERNELS_SPAN[name]

            def basef(ctx):
                return _u_args(fn, ctx, eval_args(ctx), span)
        else:
            fn = _KERNELS[name]

            def basef(ctx):
                return _u_args(fn, ctx, eval_args(ctx))
        if not bang:
            return basef

        def bangf(ctx):
            # `f!()` errors ABORT the row's program — not capturable
            # by `ok, err =` / `??` (interpreter raises
            # VrlRuntimeError through both). Tag them in the error
            # lane; capture sites skip tagged rows, run() kills them.
            # Argument errors abort too (interpreter: the arg's
            # VrlCallError reaches _eval_call's bang re-raise), and
            # an already-tagged inner abort keeps its single tag.
            v, e = basef(ctx)
            if e is None or not pc.any(pc.is_valid(e)).as_py():
                return v, None
            return v, _tag_abort(e)
        return bangf

    if kind == "block":
        if len(node[1]) == 1 and node[1][0][0] != "assign":
            return _compile_expr(node[1][0])
        # multi-statement block EXPRESSION: statements run for their
        # effects (variable writes — and errors: the FIRST error per
        # row becomes the block's error, so `{ parse_json("bad") \n 2
        # } ?? 1` yields 1); the final expression is the value.
        # Writes gate on error-free rows (an errored row stops
        # executing its block). Pre-statements may be pure
        # expressions or SINGLE-target variable assigns; a var write
        # inside a block reached LAZILY (?? RHS, if arms/predicates,
        # closures) can't gate to the rows that actually reach it —
        # checked at runtime via ctx.lazy_depth → row path.
        def _block_stmt(st):
            """Block pre-statement → (kind, payload, exprfn):
            ('var', name) single var assign; ('capture', (ok, err))
            handled two-var capture; ('varpath', (name, segs)) nested
            write into a closure param / variable; ('expr', None)
            bare expression. None → unvectorizable."""
            if st[0] != "assign":
                if st[0] in ("if", "abort", "return"):
                    return None
                return ("expr", None, _compile_expr(st))
            if st[2] != "=":
                return None
            tgts = st[1]
            if len(tgts) == 1 and tgts[0][0] == "var" and \
                    isinstance(tgts[0][1], str):
                return ("var", tgts[0][1], _compile_expr(st[3]))
            if len(tgts) == 1 and tgts[0][0] == "varpath" and \
                    isinstance(tgts[0][1], str) and tgts[0][2] and \
                    all(isinstance(x, str) for x in tgts[0][2]):
                return ("varpath", (tgts[0][1], tuple(tgts[0][2])),
                        _compile_expr(st[3]))
            if len(tgts) == 2 and all(
                    t[0] == "var" and isinstance(t[1], str)
                    for t in tgts):
                return ("capture", (tgts[0][1], tgts[1][1]),
                        _with_handled_default(_compile_expr(st[3]),
                                              st[3]))
            if len(tgts) == 1 and tgts[0][0] == "path" and \
                    tgts[0][1] == "event" and tgts[0][2] and \
                    all(isinstance(x, str) for x in tgts[0][2]):
                # EVENT write inside a block expression: persists
                # beyond the block, so only sound when the block runs
                # on every row (strict lazy_depth == 0 at runtime —
                # element contexts hold discarded written-copies)
                return ("fieldw", tuple(tgts[0][2]),
                        _compile_expr(st[3]))
            return None

        pre = []       # (kind, payload, exprfn)
        for st in node[1][:-1]:
            ent = _block_stmt(st)
            if ent is None:
                raise NotVectorizable(
                    "multi-statement block expression")
            pre.append(ent)
        last = node[1][-1]
        final_ent = None
        finalf = None
        if last[0] == "assign":
            # an assignment in final position is both a write and the
            # block's value (assignment.rs: assignments are exprs)
            final_ent = _block_stmt(last)
            if final_ent is None or final_ent[0] in ("expr",
                                                     "capture"):
                raise NotVectorizable(
                    "multi-statement block expression")
        else:
            finalf = _compile_expr(last)
        all_ents = list(pre) + ([final_ent] if final_ent else [])
        has_writes = final_ent is not None or \
            any(k != "expr" for k, _, _ in pre)
        has_event_writes = any(k == "fieldw" for k, _, _ in all_ents)

        def blockf(ctx):
            in_elem = ctx.lazy_depth and ctx.lazy_depth == \
                getattr(ctx, "writes_ok_depth", -1)
            if has_writes and ctx.lazy_depth and not in_elem:
                raise _RowFallback("block var write in lazy position")
            if has_event_writes and ctx.lazy_depth:
                # event writes from element contexts land in the
                # sub's discarded written-overlay — row path
                raise _RowFallback("block event write in closure")
            # in an ELEMENT context (closure body) only NEW locals
            # and closure params may be written: the expanded outer
            # vars are copies discarded after the closure, while the
            # interpreter persists outer reassignments (last element
            # wins) — those take the row path
            outer_names = set(ctx.vars) if in_elem else frozenset()
            errs = None
            saved_mask = ctx.active_mask

            def live_for(e):
                """Rows still executing: outer-dead and own-error
                rows keep prior values."""
                live = ctx.active_mask
                if e is not None and pc.any(pc.is_valid(e)).as_py():
                    enull = pc.is_null(e)
                    live = enull if live is None \
                        else pc.and_(live, enull)
                return live

            def gated_var_write(store, name, v, live):
                if name in outer_names:
                    raise _RowFallback("closure body writes outer var")
                if live is None:
                    store[name] = v
                    return
                old = store.get(name)
                if old is None:
                    old = _nulls(ctx.n, pa.null())
                store[name] = _blend(live, v, old, ctx.n)

            try:
                for kind_, payload, f in all_ents:
                    v, e = f(ctx)
                    last_v, last_e = v, e
                    if kind_ == "var" and payload != "_":
                        gated_var_write(ctx.vars, payload, v,
                                        live_for(e))
                    elif kind_ == "fieldw":
                        segs = payload
                        va = v if isinstance(v, _Union) \
                            else _as_array(v, ctx.n)
                        live = live_for(e)
                        if len(segs) == 1:
                            if live is None:
                                ctx.written[segs[0]] = va
                            else:
                                ctx.written[segs[0]] = _blend(
                                    live, va, ctx.col(segs[0]), ctx.n)
                        elif live is None:
                            ctx.written[segs[0]] = _struct_set(
                                ctx, segs, va)
                        else:
                            ctx.written[segs[0]] = _struct_set_gated(
                                ctx, segs, va, pc.invert(live))
                    elif kind_ == "varpath":
                        vname, segs = payload
                        store = ctx.closure_vars \
                            if vname in ctx.closure_vars else ctx.vars
                        if store is ctx.vars and vname in outer_names:
                            raise _RowFallback(
                                "closure body writes outer var")
                        top = store.get(vname)
                        if top is None:
                            top = _nulls(ctx.n, pa.null())
                        elif not isinstance(top, _Union):
                            top = _as_array(top, ctx.n)
                        va = v if isinstance(v, _Union) \
                            else _as_array(v, ctx.n)
                        live = live_for(e)
                        segs_v = (vname,) + segs
                        if live is None:
                            store[vname] = _struct_set(
                                ctx, segs_v, va, top=top)
                        else:
                            store[vname] = _struct_set_gated(
                                ctx, segs_v, va, pc.invert(live),
                                top=top)
                    elif kind_ == "capture":
                        okname, errname = payload
                        ab = _abort_mask(e) if e is not None else None
                        live = ctx.active_mask
                        if ab is not None:
                            # abort rows: neither target written, the
                            # abort propagates as the block's error
                            nab = pc.invert(ab)
                            live = nab if live is None \
                                else pc.and_(live, nab)
                        if okname != "_":
                            gated_var_write(ctx.vars, okname, v, live)
                        if errname != "_":
                            catch = _nulls(ctx.n) if e is None else (
                                pc.if_else(ab, _nulls(ctx.n), e)
                                if ab is not None else e)
                            gated_var_write(ctx.vars, errname,
                                            catch, live)
                        # non-abort errors are CONSUMED by the capture
                        e = None if ab is None \
                            else pc.if_else(ab, last_e, _nulls(ctx.n))
                        last_e = e
                    errs = _merge_errs(ctx.n, errs, e)
                    if errs is not None and \
                            pc.any(pc.is_valid(errs)).as_py():
                        # rows errored inside the block stop
                        # executing it — later side-effectful
                        # statements (del) and var writes must see
                        # that
                        live = pc.is_null(errs)
                        ctx.active_mask = live if saved_mask is None \
                            else pc.and_(saved_mask, live)
                if final_ent is not None:
                    v, e = last_v, last_e
                else:
                    v, e = finalf(ctx)
            finally:
                ctx.active_mask = saved_mask
            return v, _merge_errs(ctx.n, errs, e)
        return blockf

    raise NotVectorizable(kind)


def _blend(c, tv, ev, n: int):
    """pc.if_else with null-type unification; branches whose Arrow
    types can't blend (e.g. int64 vs string — the interpreter allows
    per-branch types) produce a :class:`_Union` tagged-lane value
    (r4; previously a whole-batch row fallback)."""
    if isinstance(tv, _Union) or isinstance(ev, _Union):
        return _union_blend(c, tv, ev, n)
    tva, eva = _as_array(tv, n), _as_array(ev, n)
    if pa.types.is_null(tva.type) and not pa.types.is_null(eva.type):
        tva = _nulls(n, eva.type)
    elif pa.types.is_null(eva.type) and not pa.types.is_null(tva.type):
        eva = _nulls(n, tva.type)
    if (pa.types.is_integer(tva.type) and pa.types.is_floating(eva.type)) \
            or (pa.types.is_floating(tva.type)
                and pa.types.is_integer(eva.type)):
        # int/float branches keep per-row KINDS (the interpreter's
        # later error texts name the row's branch kind, and
        # to_string/encode_json render 0 vs 0.0) — Arrow's implicit
        # promotion to float64 would erase that per row.
        return _union_blend(c, tva, eva, n)
    try:
        return pc.if_else(c, tva, eva)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
            pa.ArrowTypeError):
        return _union_blend(c, tva, eva, n)


def _sel(mask, a, b, n: int):
    """pc.if_else that tolerates union operands (write-gating sites)."""
    if isinstance(a, _Union) or isinstance(b, _Union):
        return _blend(mask, a, b, n)
    return pc.if_else(mask, a, b)


_LANE_ERRS = (pa.ArrowNotImplementedError, pa.ArrowInvalid,
              pa.ArrowTypeError, TypeError, AttributeError)


def _u_lanes(ctx, union: _Union, run_lane):
    """Shared lane-wise dispatch: `run_lane(lane_array)` computes
    (values, errs) with the union operand replaced by one lane; each
    lane's result only counts on its owned rows. Arrow type errors
    from a lane (operand combinations no kernel covers) degrade to
    the row path."""
    acc_v = acc_e = None
    for mask, lane in union.iter_lanes():
        m = pa.array(mask)
        try:
            v2, e2 = run_lane(lane)
        except _RowFallback:
            raise
        except _LANE_ERRS:
            raise _RowFallback("union lane op")
        v2 = _as_array(v2, ctx.n)
        if e2 is not None:
            e2 = pc.if_else(m, e2, _nulls(ctx.n))
        acc_v = v2 if acc_v is None else _blend(m, v2, acc_v, ctx.n)
        acc_e = e2 if acc_e is None else _merge_errs(ctx.n, acc_e, e2)
    return acc_v, acc_e


def _u_args(fn, ctx, a, *rest):
    """Kernel-call dispatch: lane-split the first union argument
    (recursing covers several union args)."""
    for i, (v, _e) in enumerate(a):
        if isinstance(v, _Union):
            def run_lane(lane, _i=i):
                a2 = list(a)
                a2[_i] = (lane, a[_i][1])
                return _u_args(fn, ctx, a2, *rest)
            return _u_lanes(ctx, v, run_lane)
    return fn(ctx, a, *rest)


def _u_binop(core, ctx, lv, le, rv, re):
    """Binop dispatch: lane-split a union operand (left first)."""
    if isinstance(lv, _Union):
        return _u_lanes(ctx, lv,
                        lambda lane: _u_binop(core, ctx, lane, le, rv, re))
    if isinstance(rv, _Union):
        return _u_lanes(ctx, rv,
                        lambda lane: _u_binop(core, ctx, lv, le, lane, re))
    return core(ctx, lv, le, rv, re)


def _predicate_errs(c, n: int):
    """`if` predicates must be boolean (interpreter: 'if predicate
    must be boolean, got <kind>'): non-boolean columns punt to the
    row path; null rows of a boolean column error per row."""
    ca = _as_array(c, n)
    if pa.types.is_null(ca.type):
        return _err_where(pa.array([True] * n),
                          "if predicate must be boolean, got null", n)
    if not pa.types.is_boolean(ca.type):
        raise _RowFallback("non-boolean if predicate")
    nulls = pc.is_null(ca)
    if not pc.any(nulls).as_py():
        return None
    return _err_where(nulls,
                      "if predicate must be boolean, got null", n)


def _with_handled_default(f, expr):
    """Handled (`ok, err =`) capture: on error rows the ok target gets
    the OUTERMOST expression's type default — 0 for int arith, 0.0 for
    `/`, false for comparisons, the function's documented default for
    calls, else null — no matter where inside the expression the error
    originated (interpreter._eval_assign; assignment.rs:522-549)."""
    from .interpreter import _type_default
    default = _type_default(expr)

    def g(ctx):
        v, e = f(ctx)
        if e is None or not pc.any(pc.is_valid(e)).as_py():
            return v, e
        bad = pc.is_valid(e)
        ab = _abort_mask(e)
        if ab is not None:
            # abort rows never reach the capture — no default; their
            # writes are masked out and the row dies in run()
            bad = pc.and_(bad, pc.invert(ab))
            if not pc.any(bad).as_py():
                return v, e
        va = _as_array(v, ctx.n)
        if isinstance(va, _Union):
            if default is None:
                return va.mask_null(bad), e
            try:
                d = pa.scalar(default)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    pa.ArrowTypeError, TypeError, ValueError):
                raise _RowFallback("handled default type blend")
            return _blend(bad, d, va, ctx.n), e
        if default is None:
            if pa.types.is_null(va.type):
                return va, e
            return pc.if_else(bad, pa.scalar(None, va.type), va), e
        try:
            d = pa.scalar(default)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError, TypeError, ValueError):
            raise _RowFallback("handled default type blend")
        if pa.types.is_null(va.type):
            va = _nulls(ctx.n, d.type)
        # a default whose type differs from the value column (int 0
        # into a string expression) becomes a union blend (r4)
        return _blend(bad, d, va, ctx.n), e
    return g


def _frame_arg_errs(e, frame: str, n: int):
    """Prefix RAW per-row errors with the outer call's positioned
    frame; rows already carrying a `function call error for` frame
    (from a nested call) pass through unchanged, and abort-tagged
    rows too (VrlRuntimeError skips _eval_call's framing)."""
    if e is None:
        return None
    raw = pc.and_(pc.is_valid(e),
                  pc.invert(pc.or_(
                      pc.starts_with(
                          e, pattern='function call error for '),
                      pc.starts_with(e, pattern=_ABORT))))
    if not pc.any(raw).as_py():
        return e
    prefixed = pc.binary_join_element_wise(pa.scalar(frame), e, "")
    return pc.if_else(raw, prefixed, e)


def _canonicalize_named_args(name: str, args):
    """Kernels index arguments positionally (the reference docs'
    parameter order); named call arguments are rewritten into that
    order so `truncate(.t, 3, suffix: "…")` lowers like the
    positional form. A named arg that would leave a positional hole
    (an unset optional before it) can't be represented — fall back."""
    if all(an is None for an, _ in args):
        return args
    from ._stdlib_typedefs import STDLIB_TYPEDEFS
    spec = STDLIB_TYPEDEFS.get(name)
    if spec is None:
        raise NotVectorizable("named args")
    order = [p[0] for p in spec["args"]]
    canon = []
    named = {}
    for an, ae in args:
        if an is None:
            if named:
                raise NotVectorizable("positional after named")
            canon.append((None, ae))
        else:
            if an in named:
                raise NotVectorizable("duplicate named arg")
            named[an] = ae
    for pname in order[len(canon):]:
        if pname in named:
            canon.append((None, named.pop(pname)))
        elif named:
            raise NotVectorizable("named arg hole")
        else:
            break
    if named:
        raise NotVectorizable("unknown named arg")
    return canon


def _typed_eq(a, b) -> bool:
    """Equality that DISTINGUISHES python kinds (2 != 2.0 != True) —
    detects pa.scalar's silent numeric coercions on constants."""
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(
            _typed_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(
            _typed_eq(a[k], b[k]) for k in a)
    return a == b


def _const_container(node):
    """Compile-time Python value of a literal array/object node;
    NotVectorizable when any element is computed."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "array":
        return [_const_container(x) for x in node[1]]
    if kind == "object":
        return {k: _const_container(v) for k, v in node[1]}
    raise NotVectorizable("non-constant container literal")


def _unwrap_block(node):
    if node[0] == "block":
        if len(node[1]) != 1:
            # multi-statement blocks compile as block EXPRESSIONS
            # (var writes + final value) since r5
            return node
        if node[1][0][0] == "assign":
            # a lone assignment is still a WRITING block (`false &&
            # {x = "s"}`): the block compiler owns write gating /
            # lazy-position fallback and yields the assigned value
            return node
        return node[1][0]
    return node


def _nan_result(ctx, out):
    """float_result (compiler/value/arithmetic.rs:60-63): a NaN
    arithmetic RESULT is a per-row error (the VRL value model is
    NaN-free) — e.g. 0.0 * inf, inf - inf, inf / inf. Inputs are
    NaN-free, so this fires only when an operand is ±inf."""
    if not pa.types.is_floating(_typ(out)):
        return out, None
    nan = pc.fill_null(pc.is_nan(out), False)
    if not pc.any(nan).as_py():
        return out, None
    out = pc.if_else(nan, pa.scalar(0.0, pa.float64()),
                     _as_array(out, ctx.n))
    return out, _err_where(nan, "float operation produced NaN", ctx.n)


_NUM_OPS = {"+": "add", "-": "subtract", "*": "multiply"}
_CMP_OPS = {">": "greater", ">=": "greater_equal", "<": "less",
            "<=": "less_equal", "==": "equal", "!=": "not_equal"}


def _compile_binop(node) -> Callable:
    _, op, ln, rn = node
    lf, rf = _compile_expr(ln), _compile_expr(rn)
    if not _infallible_node(ln):
        # the interpreter evaluates LHS first and propagates its error
        # before ever reaching the RHS — a side effect there (del)
        # must not apply batch-wide. (??/&&/|| gate their RHS anyway;
        # an extra depth bump is harmless.)
        rf = _lazy_gate(rf)

    if op in _NUM_OPS:
        # pc.add/subtract/multiply wrap on int64 overflow — matching
        # VRL's wrapping_* semantics (arithmetic.rs:115,143); the
        # _checked variants would raise instead
        kernel = getattr(pc, _NUM_OPS[op])

        def arith(ctx):
            (lv, le), (rv, re) = lf(ctx), rf(ctx)
            return _u_binop(arith_core, ctx, lv, le, rv, re)

        def arith_core(ctx, lv, le, rv, re):
            if op == "+" and (pa.types.is_string(_typ(lv)) or
                              pa.types.is_string(_typ(rv))):
                # string + string concatenates; a null side is the
                # IDENTITY ("foo" + null == "foo" — reference corpus
                # arithmetic/addition/string_null.vrl), hence
                # null_handling="skip". Rows where a side is non-null
                # and NOT a string (mixed-type columns), or both sides
                # are null, are per-row ERRORS (value.py add order);
                # their ok-default (integer 0) can't live in a string
                # column, so error rows carry null — unhandled forms
                # mask the write out, and a DIRECT handled capture
                # falls back in _with_handled_default when the int
                # default won't blend.
                la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
                lt, rt = la.type, ra.type
                lnull = pc.is_null(la).to_numpy(zero_copy_only=False)
                rnull = pc.is_null(ra).to_numpy(zero_copy_only=False)
                l_str = pa.types.is_string(lt) or pa.types.is_large_string(lt)
                r_str = pa.types.is_string(rt) or pa.types.is_large_string(rt)
                bad = lnull & rnull
                if not l_str and not pa.types.is_null(lt):
                    bad = bad | ~lnull
                if not r_str and not pa.types.is_null(rt):
                    bad = bad | ~rnull
                las = la if l_str else _nulls(ctx.n, pa.string())
                ras = ra if r_str else _nulls(ctx.n, pa.string())
                # fill nulls with "" instead of null_handling="skip":
                # identical under the empty separator, and skip DROPS
                # rows whose operands are all null (length-changing)
                out = pc.binary_join_element_wise(
                    pc.fill_null(las, ""), pc.fill_null(ras, ""), "")
                errs3 = None
                if bad.any():
                    lk, rk = _vrl_kind_name(lt), _vrl_kind_name(rt)
                    msgs = np.full(ctx.n, None, dtype=object)
                    for i in np.flatnonzero(bad):
                        l_ = "null" if lnull[i] else lk
                        r_ = "null" if rnull[i] else rk
                        msgs[i] = f"can't add type {r_} to {l_}"
                    errs3 = pa.array(msgs, pa.string())
                    out = pc.if_else(pa.array(bad),
                                     pa.scalar(None, pa.string()), out)
                return out, _merge_errs(ctx.n, le, re, errs3)
            # numeric arithmetic: a null side is a per-row ERROR
            # (value.py add/sub/mul templates), not a silent null
            la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
            lt, rt = la.type, ra.type
            if op == "*" and (_is_str_type(lt) or _is_str_type(rt)):
                # string * int repetition (arithmetic.rs:68-95) —
                # per-row semantics the interpreter owns
                raise _RowFallback("string repetition")
            if not (_num_or_null(lt) and _num_or_null(rt)):
                # e.g. a boolean operand: every row errors (Arrow
                # would otherwise cast bool→1 and compute silently)
                tmpl = {"+": "can't add type {r} to {l}",
                        "-": "can't subtract type {r} from {l}",
                        "*": "can't multiply type {l} by {r}"}[op]
                errs3 = _type_pair_errs(ctx, tmpl, la, ra)
                # handled ok-default for + - * is integer 0
                out = pa.array(np.zeros(ctx.n, np.int64))
                return out, _merge_errs(ctx.n, le, re, errs3)
            lnull, rnull = pc.is_null(la), pc.is_null(ra)
            errs3 = None
            out = kernel(lv, rv)
            if pc.any(pc.or_(lnull, rnull)).as_py():
                lk, rk = _vrl_kind_name(la.type), _vrl_kind_name(ra.type)
                ln_np = lnull.to_numpy(zero_copy_only=False)
                rn_np = rnull.to_numpy(zero_copy_only=False)
                msgs = np.full(ctx.n, None, dtype=object)
                for i in np.flatnonzero(ln_np | rn_np):
                    l_ = "null" if ln_np[i] else lk
                    r_ = "null" if rn_np[i] else rk
                    if op == "+":
                        msgs[i] = f"can't add type {r_} to {l_}"
                    elif op == "-":
                        msgs[i] = f"can't subtract type {r_} from {l_}"
                    else:
                        msgs[i] = f"can't multiply type {l_} by {r_}"
                errs3 = pa.array(msgs, pa.string())
                # handled ok-default for + - * is 0 (_type_default)
                out = pc.fill_null(out, 0)
            out, nan_errs = _nan_result(ctx, out)
            return out, _merge_errs(ctx.n, le, re, errs3, nan_errs)
        return arith

    if op == "/":
        def divf(ctx):
            (lv, le), (rv, re) = lf(ctx), rf(ctx)
            return _u_binop(div_core, ctx, lv, le, rv, re)

        def div_core(ctx, lv, le, rv, re):
            la0, ra0 = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
            if not (_num_or_null(la0.type) and _num_or_null(ra0.type)):
                # e.g. "3.5" / 2 or 9 / true: the casts below would
                # silently compute — the interpreter errors per row
                errs = _type_pair_errs(
                    ctx, "can't divide type {l} by {r}", la0, ra0)
                out = pa.array(np.zeros(ctx.n, np.float64))
                return out, _merge_errs(ctx.n, le, re, errs)
            zero = pc.equal(pc.cast(rv, pa.float64()), 0.0)
            zmask = pc.fill_null(zero, False)
            safe_r = pc.if_else(zmask, pa.scalar(1.0, pa.float64()),
                                pc.cast(rv, pa.float64()))
            out = pc.divide(pc.cast(lv, pa.float64()), safe_r)
            # `ok, err =` default for / is 0.0 (_type_default;
            # assignment.rs:522-549 — corpus: 1/0 → ok == 0.0).
            # Unhandled forms mask this write out anyway.
            out = pc.if_else(zmask, pa.scalar(0.0, pa.float64()), out)
            errs = _err_where(zmask, "can't divide by zero", ctx.n)
            # null operands error per row like the interpreter
            la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
            lnull, rnull = pc.is_null(la), pc.is_null(ra)
            errs2 = None
            if pc.any(pc.or_(lnull, rnull)).as_py():
                lk, rk = _vrl_kind_name(la.type), _vrl_kind_name(ra.type)
                ln_np = lnull.to_numpy(zero_copy_only=False)
                rn_np = rnull.to_numpy(zero_copy_only=False)
                msgs = np.full(ctx.n, None, dtype=object)
                for i in np.flatnonzero(ln_np | rn_np):
                    l_ = "null" if ln_np[i] else lk
                    r_ = "null" if rn_np[i] else rk
                    msgs[i] = f"can't divide type {l_} by {r_}"
                errs2 = pa.array(msgs, pa.string())
                out = pc.fill_null(out, 0.0)
            out, nan_errs = _nan_result(ctx, out)
            return out, _merge_errs(ctx.n, le, re, errs2, errs,
                                    nan_errs)
        return divf

    if op == "%":
        def remf(ctx):
            """value.py rem: non-numeric (incl. null) operands error
            per row; zero divisor errors; int%int is Rust's TRUNCATED
            remainder via the interpreter's exact `a - int(a/b)*b`
            formula; any float side goes through fmod (NaN → error)."""
            (lv, le), (rv, re) = lf(ctx), rf(ctx)
            return _u_binop(rem_core, ctx, lv, le, rv, re)

        def rem_core(ctx, lv, le, rv, re):
            la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
            lt, rt = la.type, ra.type
            for t in (lt, rt):
                if not (_is_num_type(t) or pa.types.is_null(t)):
                    raise _RowFallback("% on non-numeric column")
            ln_np = pc.is_null(la).to_numpy(zero_copy_only=False)
            rn_np = pc.is_null(ra).to_numpy(zero_copy_only=False)
            a = (np.zeros(ctx.n) if pa.types.is_null(lt) else
                 pc.fill_null(pc.cast(la, pa.float64()), 0.0)
                 .to_numpy(zero_copy_only=False))
            b = (np.zeros(ctx.n) if pa.types.is_null(rt) else
                 pc.fill_null(pc.cast(ra, pa.float64()), 0.0)
                 .to_numpy(zero_copy_only=False))
            if np.any(np.abs(a) > 2.0 ** 53) or \
                    np.any(np.abs(b) > 2.0 ** 53):
                # the interpreter's int(a/b) is float-inexact past
                # 2^53 — match it by rerunning those rows per-row
                raise _RowFallback("% magnitude")
            zero = (b == 0.0) & ~rn_np
            bad = ln_np | rn_np | zero
            bsafe = np.where(b == 0.0, 1.0, b)
            int_case = pa.types.is_integer(lt) and pa.types.is_integer(rt)
            nan_rows = np.zeros(ctx.n, dtype=bool)
            if int_case:
                ai = a.astype(np.int64)
                bi = bsafe.astype(np.int64)
                r = ai - np.trunc(a / bsafe).astype(np.int64) * bi
                out = pa.array(np.where(bad, 0, r), pa.int64())
            else:
                r = np.fmod(a, bsafe)
                nan_rows = np.isnan(r) & ~bad
                bad = bad | nan_rows
                out = pa.array(np.where(bad, 0.0, r), pa.float64())
            errs = None
            if bad.any():
                lk, rk = _vrl_kind_name(lt), _vrl_kind_name(rt)
                msgs = np.full(ctx.n, None, dtype=object)
                for i in np.flatnonzero(ln_np | rn_np):
                    l_ = "null" if ln_np[i] else lk
                    r_ = "null" if rn_np[i] else rk
                    msgs[i] = ("can't calculate remainder of type "
                               f"{l_} and {r_}")
                for i in np.flatnonzero(zero & ~(ln_np | rn_np)):
                    msgs[i] = "can't divide by zero"
                for i in np.flatnonzero(nan_rows):
                    msgs[i] = "float operation produced NaN"
                errs = pa.array(msgs, pa.string())
            return out, _merge_errs(ctx.n, le, re, errs)
        return remf

    if op in _CMP_OPS:
        kernel = getattr(pc, _CMP_OPS[op])

        def cmpf(ctx):
            (lv, le), (rv, re) = lf(ctx), rf(ctx)
            return _u_binop(cmp_core, ctx, lv, le, rv, re)

        def cmp_core(ctx, lv, le, rv, re):
            if op in ("==", "!="):
                la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
                eq = _value_eq_arrays(ctx, la, ra)
                out = eq if op == "==" else pc.invert(eq)
                return out, _merge_errs(ctx.n, le, re)
            # ordering: a null side is a per-row ERROR in the
            # reference ("can't compare null > integer", value.py
            # compare), not a silent null result
            la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
            lt, rt = la.type, ra.type
            pair_ok = ((_is_str_type(lt) and _is_str_type(rt))
                       or (pa.types.is_timestamp(lt)
                           and pa.types.is_timestamp(rt))
                       or (_num_or_null(lt) and _num_or_null(rt)))
            if not pair_ok:
                # e.g. boolean > boolean: Arrow would compare —
                # value.py _cmp_ok errors per row
                errs = _type_pair_errs(
                    ctx, f"can't compare {{l}} {op} {{r}}", la, ra)
                out = pa.array(np.zeros(ctx.n, bool))
                return out, _merge_errs(ctx.n, le, re, errs)
            lnull, rnull = pc.is_null(la), pc.is_null(ra)
            errs = None
            if pc.any(pc.or_(lnull, rnull)).as_py():
                lk, rk = _vrl_kind_name(la.type), _vrl_kind_name(ra.type)
                ln_np = lnull.to_numpy(zero_copy_only=False)
                rn_np = rnull.to_numpy(zero_copy_only=False)
                msgs = np.full(ctx.n, None, dtype=object)
                for i in np.flatnonzero(ln_np | rn_np):
                    l_ = "null" if ln_np[i] else lk
                    r_ = "null" if rn_np[i] else rk
                    msgs[i] = f"can't compare {l_} {op} {r_}"
                errs = pa.array(msgs, pa.string())
            out = kernel(lv, rv)
            if errs is not None:
                # `ok, err =` default for a comparison is False
                # (_type_default); unhandled forms mask this write out
                out = pc.fill_null(out, False)
            return out, _merge_errs(ctx.n, le, re, errs)
        return cmpf

    if op == "|":
        def mgf(ctx):
            (lv, le), (rv, re) = lf(ctx), rf(ctx)
            return _u_binop(merge_core, ctx, lv, le, rv, re)

        def merge_core(ctx, lv, le, rv, re):
            """Shallow object merge (merge.rs / value.py merge):
            right's fields overwrite, field order = left's then
            right-only; a non-object or null side errors per row
            with the interpreter's template, handled default null."""
            la, ra = _as_array(lv, ctx.n), _as_array(rv, ctx.n)
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            if isinstance(ra, pa.ChunkedArray):
                ra = ra.combine_chunks()
            lt, rt = la.type, ra.type
            tmpl = "can't merge type {r} into {l}"
            l_ok = pa.types.is_struct(lt)
            r_ok = pa.types.is_struct(rt)
            if not (l_ok and r_ok):
                # a wholly non-object (or null-typed) side: every
                # row errors — null-typed sides render "null"
                errs = _type_pair_errs(ctx, tmpl, la, ra)
                return _nulls(ctx.n, pa.null()), \
                    _merge_errs(ctx.n, le, re, errs)
            for t_, arr_ in ((lt, la), (rt, ra)):
                if any(pa.types.is_union(t_.field(j).type)
                       for j in range(t_.num_fields)):
                    raise _RowFallback("merge near union child")
            lnull = pc.is_null(la)
            rnull = pc.is_null(ra)
            bad = pc.or_(lnull, rnull)
            fields: dict = {}
            for j in range(lt.num_fields):
                fields[lt.field(j).name] = la.field(j)
            for j in range(rt.num_fields):
                fields[rt.field(j).name] = ra.field(j)
            if fields:
                out = pa.StructArray.from_arrays(
                    list(fields.values()), names=list(fields),
                    mask=bad)
            else:
                bad_np = pc.fill_null(bad, False) \
                    .to_numpy(zero_copy_only=False)
                out = pa.array([None if b else {} for b in bad_np],
                               pa.struct([]))
            errs = None
            if pc.any(bad).as_py():
                ln = lnull.to_numpy(zero_copy_only=False)
                rn = rnull.to_numpy(zero_copy_only=False)
                msgs = np.full(ctx.n, None, dtype=object)
                for i in np.flatnonzero(ln | rn):
                    msgs[i] = tmpl.format(
                        l="null" if ln[i] else "object",
                        r="null" if rn[i] else "object")
                errs = pa.array(msgs, pa.string())
            return out, _merge_errs(ctx.n, le, re, errs)
        return mgf

    if op in ("&&", "||"):
        def boolf(ctx):
            lv, le = lf(ctx)
            ctx.lazy_depth += 1
            try:
                rv, re = rf(ctx)
            finally:
                ctx.lazy_depth -= 1
            for side in (lv, rv):
                t = _typ(side)
                if not pa.types.is_boolean(t) and \
                        not pa.types.is_null(t):
                    # && / || accept boolean or null only
                    # (arithmetic.rs and_/or_: non-bool is a per-row
                    # "expected boolean, got <kind>" error)
                    raise _RowFallback(f"{op} on non-boolean column")
            # null is falsy in predicates (arithmetic.rs:159-187)
            lb = _as_array(pc.fill_null(pc.cast(lv, pa.bool_()), False),
                           ctx.n)
            rb = pc.fill_null(pc.cast(rv, pa.bool_()), False)
            out = pc.and_(lb, rb) if op == "&&" else pc.or_(lb, rb)
            # short-circuit: the RHS only runs where `&&` saw a true
            # LHS / `||` a false one, and never after an LHS error
            if re is not None:
                ran = lb if op == "&&" else pc.invert(lb)
                if le is not None:
                    ran = pc.and_(ran, pc.is_null(le))
                re = pc.if_else(ran, re, _nulls(ctx.n))
            return out, _merge_errs(ctx.n, le, re)
        return boolf

    if op == "??":
        def coalf(ctx):
            lv, le = lf(ctx)
            if le is None:
                # LHS never errored: the RHS never runs (lazy)
                return lv, None
            bad = pc.is_valid(le)
            ab = _abort_mask(le)
            if ab is not None:
                # abort rows fall THROUGH `??` uncaught (interpreter:
                # VrlRuntimeError skips value.coalesce's except)
                bad = pc.and_(bad, pc.invert(ab))
            if not pc.any(bad).as_py():
                # nothing catchable: the RHS never runs; only the
                # abort errors (if any) propagate
                aborts = pc.if_else(ab, le, _nulls(ctx.n)) \
                    if ab is not None else None
                return lv, aborts
            ctx.lazy_depth += 1
            try:
                rv, re = rf(ctx)
            finally:
                ctx.lazy_depth -= 1
            # the RHS only ran on rows whose LHS errored catchably —
            # its errors elsewhere are eager-eval artifacts
            if re is not None:
                re = pc.if_else(bad, re, _nulls(ctx.n))
            aborts = pc.if_else(ab, le, _nulls(ctx.n)) \
                if ab is not None else None
            return _blend(bad, rv, lv, ctx.n), \
                _merge_errs(ctx.n, aborts, re)
        return coalf

    raise NotVectorizable(f"op {op}")


# ---------------------------------------------------------------------------
# program compiler

class VectorProgram:
    """Column-plan compilation of a full VRL program. Raises
    :class:`NotVectorizable` at compile time when any statement falls
    outside the subset."""

    def __init__(self, source: str):
        self.source = source
        stmts = parse(source)
        # same static pass as the interpreter (Program.__init__):
        # resolves type_def() to lit_typedef constants so both lanes
        # compile the SAME annotated AST
        from .typecheck import Unsupported, annotate
        try:
            stmts = annotate(stmts)
        except Unsupported:
            pass
        self._if_fields: list[list[str]] = []
        self._has_abort = False
        self.plan: list = [self._compile_stmt(s) for s in stmts]
        # target fields in execution order (for fallback schema parity)
        self.target_fields: list[str] = []
        if_i = 0
        for stmt in self.plan:
            for field, errfield, _ in stmt:
                if field == "__if__":
                    fs = self._if_fields[if_i]
                    if_i += 1
                elif field in ("__foreach__", "__abort__",
                               "__return__", "__expr__", "__root__",
                               "__rootmerge__", "__metaroot__"):
                    continue     # no output column of their own
                elif isinstance(field, tuple) and field \
                        and field[0] == "__fieldidx__":
                    fs = [field[1]]
                else:
                    fs = [f_ for f_ in
                          [field] + ([errfield] if errfield else [])
                          if not (isinstance(f_, tuple) and f_
                                  and f_[0] in ("__var__",
                                                "__varpath__",
                                                "__varidx__"))]
                for f_ in fs:
                    f_ = f_[0] if isinstance(f_, tuple) else f_
                    if f_.startswith(_META):
                        continue    # transient metadata
                    if f_ not in self.target_fields:
                        self.target_fields.append(f_)

    # → list of (field, errfield|None, exprfn) produced per statement
    def _compile_stmt(self, s):
        if s[0] == "assign":
            targets, op, expr = s[1], s[2], s[3]
            if expr[0] == "abort":
                # abort in expression position at statement level
                # (`.x = abort`): the assignment never happens — the
                # whole statement IS the abort (abort.vrl)
                self._has_abort = True
                msgf = _compile_expr(expr[1]) if expr[1] is not None \
                    else None
                return [("__abort__", None, msgf)]
            if op == "|=" and len(targets) == 1:
                t = targets[0]
                if t == ("path", "event", []):
                    # `. |= obj`: merge fields into the whole event
                    return [("__rootmerge__", None,
                             _compile_expr(expr))]
                if t[0] == "path" and t[1] == "event" and t[2] and \
                        all(isinstance(sg, str) for sg in t[2]):
                    f = _compile_merge_assign(tuple(t[2]),
                                              _compile_expr(expr))
                    field = t[2][0] if len(t[2]) == 1 \
                        else tuple(t[2])
                    return [(field, None, f)]
                if t[0] == "var" and isinstance(t[1], str):
                    # variable merge target (`x |= {...}`): same merge
                    # math, ctx.vars storage
                    f = _compile_merge_assign(
                        (), _compile_expr(expr),
                        read_cur=_var_reader(t[1]))
                    return [(("__var__", t[1]), None, f)]
                raise NotVectorizable("|= target")
            if op == "|=" and len(targets) == 2:
                # handled merge-assign (`.res, err |= parse_x(...)`):
                # error rows (expr OR merge-type) get the expression's
                # type default assigned PLAIN (interpreter._eval_assign
                # retries with op "="), err captures the message
                t0, t1 = targets
                if t1 == ("discard",):
                    errf = ("__var__", "\x00discard")
                elif t1[0] == "var" and isinstance(t1[1], str):
                    errf = ("__var__", t1[1])
                elif t1[0] == "path" and t1[1] == "event" and t1[2] \
                        and all(isinstance(sg, str) for sg in t1[2]):
                    errf = t1[2][0] if len(t1[2]) == 1 \
                        else tuple(t1[2])
                else:
                    raise NotVectorizable("|= err target")
                if t0[0] == "path" and t0[1] == "event" and t0[2] and \
                        all(isinstance(sg, str) for sg in t0[2]):
                    f = _with_handled_default(
                        _compile_merge_assign(tuple(t0[2]),
                                              _compile_expr(expr)),
                        expr)
                    field = t0[2][0] if len(t0[2]) == 1 \
                        else tuple(t0[2])
                    return [(field, errf, f)]
                if t0[0] == "var" and isinstance(t0[1], str):
                    f = _with_handled_default(
                        _compile_merge_assign(
                            (), _compile_expr(expr),
                            read_cur=_var_reader(t0[1])),
                        expr)
                    return [(("__var__", t0[1]), errf, f)]
                if t0 == ("path", "event", []):
                    # handled ROOT merge (`., err |= parse_x(...)`):
                    # ok rows merge rhs fields into the event; error
                    # rows (expr OR merge-type) REPLACE the whole
                    # event with the type default (null → empty
                    # event), err captures (interpreter._eval_assign)
                    from .interpreter import _type_default
                    if not (isinstance(errf, tuple)
                            and errf[0] == "__var__"):
                        raise NotVectorizable("|= root err target")
                    if _type_default(expr) is not None:
                        raise NotVectorizable("|= root non-null default")
                    return [("__rootmerge__", errf,
                             _compile_expr(expr))]
                raise NotVectorizable("|= target")
            if op != "=":
                raise NotVectorizable("|= assignment")
            if len(targets) == 1 and targets[0] == ("path", "meta",
                                                    []):
                # metadata-root replacement (`% = {}`): the namespace
                # becomes exactly the rhs object's fields
                return [("__metaroot__", None, _compile_expr(expr))]
            if len(targets) == 1 and targets[0] == ("path", "event",
                                                   []):
                # whole-event replacement (`. = parse_json!(.msg)` —
                # the canonical Vector remap program)
                return [("__root__", None, _compile_expr(expr))]
            if len(targets) == 2 and \
                    targets[0] == ("path", "event", []) and \
                    targets[1][0] in ("var", "discard"):
                # handled whole-event replacement (`., err = f(.log)`
                # — the canonical parse-with-fallback program): ok
                # rows replaced by the object, error rows replaced by
                # the expression DEFAULT (null → empty event), err
                # var carries the message
                errt = ("__var__", targets[1][1]
                        if targets[1][0] == "var" else "\x00discard")
                return [("__root__", errt,
                         _with_handled_default(_compile_expr(expr),
                                               expr))]
            fields = []
            for t in targets:
                if t == ("discard",):
                    # `_` target: written to an unreadable mangled
                    # var so the capture machinery stays uniform
                    fields.append(("__var__", "\x00discard"))
                    continue
                if t[0] == "var" and isinstance(t[1], str):
                    # per-event variable target → column in ctx.vars
                    fields.append(("__var__", t[1]))
                    continue
                if t[0] == "varpath" and isinstance(t[1], str):
                    # nested write INTO a variable (v.x = 1): same
                    # struct-column build, ctx.vars storage
                    if len(targets) == 1 and len(t[2]) == 1 and \
                            isinstance(t[2][0], int):
                        # list element write (xs[0] = v): per-row
                        # list surgery at a literal index
                        return [(("__varidx__", t[1], t[2][0]),
                                 None, _compile_expr(expr))]
                    if len(targets) != 1 or not t[2] or \
                            not all(isinstance(s, str) for s in t[2]):
                        raise NotVectorizable("varpath target")
                    return [(("__varpath__", t[1], tuple(t[2])),
                             None, _compile_expr(expr))]
                if t[0] == "path" and t[1] == "event" and \
                        len(targets) == 1 and len(t[2]) == 2 and \
                        isinstance(t[2][0], str) and \
                        isinstance(t[2][1], int):
                    # list element write into an event column
                    # (.x[5] = v): same surgery as the var form
                    return [(("__fieldidx__", t[2][0], t[2][1]),
                             None, _compile_expr(expr))]
                if t[0] != "path" or t[1] not in ("event", "meta") \
                        or not t[2] or \
                        not all(isinstance(s, str) for s in t[2]):
                    raise NotVectorizable("assignment target")
                # nested targets compile to struct-column writes;
                # %metadata is per-event TRANSIENT state — a mangled
                # column namespace excluded from the output
                segs_t = list(t[2])
                if t[1] == "meta":
                    segs_t[0] = _META + segs_t[0]
                fields.append(segs_t[0] if len(segs_t) == 1
                              else tuple(segs_t))
            f = _compile_expr(expr)
            if len(fields) == 1:
                return [(fields[0], None, f)]
            if len(fields) == 2:
                # handled capture: the ok target's value on error rows
                # is the OUTERMOST expression's type default, wherever
                # inside the expression the error originated
                # (interpreter._eval_assign / assignment.rs:522-549)
                return [(fields[0], fields[1],
                         _with_handled_default(f, expr))]
            raise NotVectorizable("assignment arity")
        if s[0] == "if":
            return [self._compile_if_stmt(s)]
        if s[0] == "call" and s[1] == "for_each" and s[4] is not None:
            return [self._compile_for_each(s)]
        if s[0] == "abort":
            # abort drops the event (Terminate::Abort): mutations so
            # far kept, later statements skip, `aborted` column true
            self._has_abort = True
            msgf = _compile_expr(s[1]) if s[1] is not None else None
            return [("__abort__", None, msgf)]
        if s[0] == "return":
            # return = early exit keeping mutations (runtime.rs:
            # Terminate::Return caught as Ok): later statements skip,
            # NOT aborted; an erroring return expression kills the row
            return [("__return__", None, _compile_expr(s[1]))]
        # bare expression statement (a call like del(.a), or a final
        # result-value expression): the remap lane keeps only the
        # EVENT, so the value is discarded — errors still stop rows
        return [("__expr__", None, _compile_expr(s))]

    def _compile_for_each(self, s):
        """Statement-level ``for_each(.list) -> |i, v| { acc = acc +
        expr }`` lowers to segmented reductions: the element expression
        runs ONCE over the flattened array and per-row prefix-sum
        differences update each accumulator variable — the common VRL
        aggregation idiom without per-row Python. Bodies outside the
        `acc = acc + <elem expr>` shape stay on the interpreter."""
        _, name, bang, args, closure = s[:5]
        params, body = closure
        if len(args) != 1 or args[0][0] is not None or len(params) != 2:
            raise NotVectorizable("for_each shape")
        argf = _compile_expr(args[0][1])
        iname, vname = params
        if body[0] != "block" or not body[1]:
            raise NotVectorizable("for_each body")
        def _acc_update(st):
            """``acc = acc + e`` → ('sum', acc, None, ef);
            ``acc = push(acc, e)`` → ('push', acc, None, ef);
            returns None when st isn't an accumulator update."""
            if st[0] != "assign" or st[2] != "=" or len(st[1]) != 1 \
                    or st[1][0][0] != "var":
                return None
            acc = st[1][0][1]
            ex = st[3]
            if ex[0] == "binop" and ex[1] == "+":
                if ex[2] == ("var", acc):
                    elem = ex[3]
                elif ex[3] == ("var", acc):
                    elem = ex[2]
                else:
                    return None
                return ("sum", acc, None, _compile_expr(elem))
            if ex[0] == "call" and ex[1] == "push" and ex[4] is None \
                    and len(ex[3]) == 2 and ex[3][0][0] is None \
                    and ex[3][1][0] is None \
                    and ex[3][0][1] == ("var", acc):
                return ("push", acc, None,
                        _compile_expr(ex[3][1][1]))
            return None

        plan = []   # ordered: ('local',name,_,ef) | ('sum'/'push',...)
        cap_nodes = []      # expr nodes, for the captures check
        local_names = set()
        for st in body[1]:
            if st[0] == "return":
                # UNCONDITIONAL return exits the closure invocation
                # for every element: statements after it never run
                # (return_in_closure.vrl); the value is discarded by
                # for_each, but its errors still kill rows — a
                # body-local evaluation covers both
                plan.append(("local", "\x00ret", None,
                             _compile_expr(st[1])))
                cap_nodes.append(st[1])
                local_names.add("\x00ret")
                break
            upd = _acc_update(st)
            if upd is not None:
                plan.append(upd)
                cap_nodes.append(st[3])
                continue
            if st[0] == "assign" and st[2] == "=" and \
                    len(st[1]) == 1 and st[1][0][0] == "var":
                # body-local per-element variable (scoped out after
                # the loop by closure scoping)
                plan.append(("local", st[1][0][1], None,
                             _compile_expr(st[3])))
                local_names.add(st[1][0][1])
                cap_nodes.append(st[3])
                continue
            if st[0] == "if" and len(st[1]) == 1 and st[2] is None \
                    and st[1][0][1][0] == "block" \
                    and len(st[1][0][1][1]) == 1:
                # single-arm conditional accumulator update:
                # ``if cond { acc = push(acc, e) }`` — the common
                # filter-and-collect idiom (rfcs/8381); a PLAIN
                # assign under the condition is the flag idiom
                # (``if v.a == 2 { found = true }``): last matching
                # element wins per row
                inner = st[1][0][1][1][0]
                upd = _acc_update(inner)
                if upd is not None:
                    kind_, acc_, _, ef_ = upd
                    plan.append((kind_, acc_,
                                 _compile_expr(st[1][0][0]), ef_))
                    cap_nodes.append(st[1][0][0])
                    cap_nodes.append(inner[3])
                    continue
                if inner[0] == "assign" and inner[2] == "=" and \
                        len(inner[1]) == 1 and inner[1][0][0] == "var":
                    plan.append(("setif", inner[1][0][1],
                                 _compile_expr(st[1][0][0]),
                                 _compile_expr(inner[3])))
                    cap_nodes.append(st[1][0][0])
                    cap_nodes.append(inner[3])
                    continue
                raise NotVectorizable("for_each body statement")
            raise NotVectorizable("for_each body statement")
        if not plan:
            raise NotVectorizable("for_each accumulator op")
        accs_in_plan = {a for k, a, *_ in plan
                        if k in ("sum", "push", "setif")}
        allowed = {iname, vname} | local_names | accs_in_plan
        captures = any(_reads_beyond_param(nd, allowed)
                       for nd in cap_nodes)

        def fe(ctx):
            v, e = argf(ctx)
            if e is not None and pc.any(pc.is_valid(e)).as_py():
                raise _RowFallback("for_each collection error")
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            v = _as_array(v, ctx.n)    # constant collections fold to
            if isinstance(v, _Union):  # a list SCALAR — broadcast
                raise _RowFallback("for_each union collection")
            if not pa.types.is_list(v.type):
                raise _RowFallback("for_each over non-list input")
            if v.null_count:
                raise _RowFallback("for_each over null list rows")
            flat = v.flatten()
            lens = pc.list_value_length(v) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            starts = np.cumsum(lens) - lens
            within = np.arange(len(flat)) - np.repeat(starts, lens)
            ridx = np.repeat(np.arange(ctx.n), lens) if captures \
                else None
            sub = _element_ctx(ctx, len(flat), ridx)
            # accumulators must NOT be readable inside the body: the
            # interpreter sees the PER-ELEMENT growing value, the
            # expansion would show the pre-loop one — row path
            for a_ in accs_in_plan:
                sub.vars.pop(a_, None)
            for k_, a_, *_ in plan:
                # a 'local' that is really an OUTER reassignment
                # becomes a set-accumulator at runtime: its running
                # value must not be readable either
                if k_ == "local" and a_ in ctx.vars:
                    sub.vars.pop(a_, None)
            sub.closure_vars[vname] = flat
            sub.closure_vars[iname] = pa.array(within, pa.int64())
            updates = {}

            def eval_elem(ef):
                ev_, ee = ef(sub)
                if ee is not None and pc.any(pc.is_valid(ee)).as_py():
                    raise _RowFallback("for_each element error")
                return ev_

            def cond_mask(cf):
                if cf is None:
                    return None
                cv = eval_elem(cf)
                ca = _as_array(cv, sub.n)
                if not pa.types.is_boolean(ca.type) and \
                        not pa.types.is_null(ca.type):
                    raise _RowFallback("for_each non-bool condition")
                return pc.fill_null(pc.cast(ca, pa.bool_()), False) \
                    .to_numpy(zero_copy_only=False)

            for kind_, acc, cf, ef in plan:
                if kind_ == "local":
                    if acc in ctx.closure_vars:
                        raise _RowFallback("for_each closure var write")
                    if acc in ctx.vars:
                        # unconditional OUTER reassignment per
                        # element: the LAST element wins per row
                        kind_ = "setif"
                    else:
                        sub.vars[acc] = eval_elem(ef)
                        continue
                prev = updates.get(acc, ctx.vars.get(acc))
                if prev is None:
                    raise _RowFallback("for_each accumulator undefined")
                if kind_ == "setif":
                    if acc in ctx.closure_vars:
                        raise _RowFallback("for_each closure var set")
                    keep = cond_mask(cf)
                    ev_ = eval_elem(ef)
                    if isinstance(ev_, _Union):
                        raise _RowFallback("for_each set union value")
                    arr = _as_array(ev_, sub.n)
                    pos = np.arange(len(flat), dtype=np.int64)
                    masked = np.where(keep, pos, -1) \
                        if keep is not None else pos
                    last = np.full(ctx.n, -1, np.int64)
                    nz = lens > 0
                    if nz.any():
                        # nonempty segments are adjacent in the flat
                        # stream, so their starts delimit reduceat
                        last[nz] = np.maximum.reduceat(
                            masked, starts[nz])
                    has = last >= 0
                    newv = arr.take(pa.array(
                        np.where(has, last, 0), pa.int64(),
                        mask=~has))
                    prev_a = prev if isinstance(prev, _Union) \
                        else _as_array(prev, ctx.n)
                    updates[acc] = _blend(pa.array(has), newv,
                                          prev_a, ctx.n)
                    continue
                keep = cond_mask(cf)
                if kind_ == "sum":
                    arr = _as_array(eval_elem(ef), sub.n)
                    if not _is_num_type(arr.type) or arr.null_count:
                        raise _RowFallback("for_each non-numeric element")
                    is_int = pa.types.is_integer(arr.type)
                    x = arr.to_numpy(zero_copy_only=False)
                    if keep is not None:
                        x = np.where(keep, x, 0)
                    csum = np.zeros(
                        len(flat) + 1,
                        dtype=np.int64 if is_int else np.float64)
                    np.cumsum(x, out=csum[1:])
                    inc = csum[starts + lens] - csum[starts]
                    updates[acc] = pc.add(_as_array(prev, ctx.n),
                                          pa.array(inc))
                    continue
                # push accumulator: per-row result = prior list ++
                # the (optionally cond-filtered) element expressions.
                # TWO pushes to the same acc interleave PER ELEMENT in
                # the interpreter (a1 b1 a2 b2) — batch concat would
                # give a1 a2 b1 b2: row path
                if acc in updates:
                    raise _RowFallback("for_each repeated push")
                ev_ = eval_elem(ef)
                if isinstance(ev_, _Union):
                    raise _RowFallback("for_each push union element")
                arr = _as_array(ev_, sub.n)
                pl = _as_array(prev, ctx.n)
                if isinstance(pl, pa.ChunkedArray):
                    pl = pl.combine_chunks()
                if not pa.types.is_list(pl.type) or pl.null_count:
                    raise _RowFallback("for_each push non-list acc")
                if keep is not None:
                    arr = arr.filter(pa.array(keep))
                    kcs = np.zeros(len(flat) + 1, dtype=np.int64)
                    np.cumsum(keep.astype(np.int64), out=kcs[1:])
                    n_lens = kcs[starts + lens] - kcs[starts]
                else:
                    n_lens = lens
                n_starts = np.cumsum(n_lens) - n_lens
                p_off = np.asarray(pl.offsets, np.int64)
                p_lens = np.diff(p_off)
                p_vals = pl.values
                if isinstance(p_vals, pa.ChunkedArray):
                    p_vals = p_vals.combine_chunks()
                p_total, n_total = len(p_vals), len(arr)
                if p_total and n_total and p_vals.type != arr.type:
                    if pa.types.is_null(p_vals.type):
                        p_vals = p_vals.cast(arr.type)
                    elif pa.types.is_null(arr.type):
                        arr = arr.cast(p_vals.type)
                    else:
                        raise _RowFallback("for_each push type mix")
                try:
                    combined = pa.concat_arrays([p_vals, arr])
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                        pa.ArrowTypeError):
                    raise _RowFallback("for_each push concat")
                out_lens = p_lens + n_lens
                out_off = np.zeros(ctx.n + 1, dtype=np.int64)
                np.cumsum(out_lens, out=out_off[1:])
                total = int(out_off[-1])
                row_rep = lambda a: np.repeat(a, out_lens)
                pos = np.arange(total) - row_rep(out_off[:-1])
                from_prior = pos < row_rep(p_lens)
                idx = np.where(
                    from_prior,
                    row_rep(p_off[:-1]) + pos,
                    p_total + row_rep(n_starts)
                    + (pos - row_rep(p_lens)))
                updates[acc] = pa.ListArray.from_arrays(
                    pa.array(out_off, pa.int64()).cast(pa.int32())
                    if total < 2**31 else pa.array(out_off),
                    combined.take(pa.array(idx, pa.int64())))
            return updates
        return ("__foreach__", None, fe)

    def _compile_if_stmt(self, s):
        arms, els = s[1], s[2]
        condfs = [_compile_expr(c) for c, _ in arms]
        arm_assigns = [self._branch_assigns(b) for _, b in arms]
        else_assigns = self._branch_assigns(els) if els is not None \
            else []
        fields: list[str] = []
        for pairs in arm_assigns + [else_assigns]:
            for f_, _ in pairs:
                if f_ in ("__abort__", "__return__",
                          "__exprstmt__") or (
                        isinstance(f_, tuple) and f_
                        and f_[0] == "__var__"):
                    continue
                name = f_[0] if isinstance(f_, tuple) else f_
                if name not in fields:
                    fields.append(name)
        self._if_fields.append(fields)

        def run(ctx):
            ctx.lazy_depth += 1
            try:
                return _run_body(ctx)
            finally:
                ctx.lazy_depth -= 1

        def _run_body(ctx):
            """Returns ({field: values}, errs|None). Else-if chain:
            each condition only RUNS on rows every earlier arm left
            (its errors are masked to `remaining` — lazy parity); a
            branch's errors only count on the rows it takes, and a
            branch that doesn't assign some field leaves that field's
            prior value on its rows (covers `if` without `else` and
            asymmetric branches)."""
            errs = None
            conds = []
            remaining = None
            for k_, cf in enumerate(condfs):
                if k_ == 0:
                    # first predicate runs on every row (see the if-
                    # expression compiler): capture writes allowed
                    ctx.lazy_depth -= 1
                    try:
                        c, ce = cf(ctx)
                    finally:
                        ctx.lazy_depth += 1
                else:
                    c, ce = cf(ctx)
                ce = _merge_errs(ctx.n, ce, _predicate_errs(c, ctx.n))
                if ce is not None and remaining is not None:
                    ce = pc.if_else(remaining, ce, _nulls(ctx.n))
                errs = _merge_errs(ctx.n, errs, ce)
                cb = _as_array(
                    pc.fill_null(pc.cast(c, pa.bool_()), False), ctx.n)
                if remaining is not None:
                    cb = pc.and_(cb, remaining)
                conds.append(cb)
                inv = pc.invert(cb)
                remaining = inv if remaining is None \
                    else pc.and_(remaining, inv)
            regions = list(zip(conds, arm_assigns))
            if else_assigns:
                regions.append((remaining, else_assigns))
            out = {}
            # statement-order gating: a row's write happens iff its
            # region took the row AND no error preceded the write
            # (condition errors, or an earlier statement of the SAME
            # branch — interpreter runs branch statements in order,
            # so writes before the row's first error stick)
            # later statements read earlier writes through a
            # ctx.written overlay: the blended column is exactly the
            # right per-row view (new value on rows the region took
            # and the statement succeeded, prior value elsewhere)
            saved = dict(ctx.written)
            saved_vars = dict(ctx.vars)
            aborted = None
            returned = None
            try:
                for mask, assigns in regions:
                    region_err = None
                    region_stop = None   # abort OR return rows
                    for field, fexpr in assigns:
                        ok = mask
                        if errs is not None:
                            ok = pc.and_(ok, pc.is_null(errs))
                        if region_err is not None:
                            ok = pc.and_(ok, pc.is_null(region_err))
                        if region_stop is not None:
                            ok = pc.and_(ok, pc.invert(region_stop))
                        if field in ("__abort__", "__return__"):
                            # rows reaching the abort/return stop
                            # here; an erroring message/return
                            # expression kills the row as an error
                            if fexpr is not None:
                                _, me = fexpr(ctx)
                                if me is not None:
                                    me = pc.if_else(ok, me,
                                                    _nulls(ctx.n))
                                    ok = pc.and_(ok, pc.is_null(me))
                                    region_err = _merge_errs(
                                        ctx.n, region_err, me)
                            if field == "__abort__":
                                aborted = ok if aborted is None \
                                    else pc.or_(aborted, ok)
                            else:
                                returned = ok if returned is None \
                                    else pc.or_(returned, ok)
                            region_stop = ok if region_stop is None \
                                else pc.or_(region_stop, ok)
                            continue
                        if field == "__exprstmt__":
                            # bare expression: value discarded, its
                            # errors stop the rows that reached it
                            _, ae = fexpr(ctx)
                            if ae is not None:
                                ae = pc.if_else(ok, ae, _nulls(ctx.n))
                                region_err = _merge_errs(
                                    ctx.n, region_err, ae)
                            continue
                        av, ae = fexpr(ctx)
                        if ae is not None:
                            ae = pc.if_else(mask, ae, _nulls(ctx.n))
                            # a statement whose own expression errored
                            # never assigns (interpreter order)
                            ok = pc.and_(ok, pc.is_null(ae))
                        if isinstance(field, tuple) and \
                                field[0] == "__var__":
                            # variable branch target: blend against
                            # the pre-if value (or an earlier branch
                            # write this run); write ctx.vars NOW so
                            # later branch statements read the
                            # per-row view — the finally restores
                            # pre-if vars and the OUTER runner
                            # re-applies with dead-row gating
                            acc = out.get(field)
                            if acc is None:
                                acc = ctx.vars.get(field[1])
                                if acc is None:
                                    acc = _nulls(ctx.n, pa.null())
                                elif not isinstance(acc, _Union):
                                    acc = _as_array(acc, ctx.n)
                            blended = _blend(ok, av, acc, ctx.n)
                            out[field] = blended
                            ctx.vars[field[1]] = blended
                        elif isinstance(field, tuple):
                            # nested (.a.b) branch target: gate at
                            # the leaf — untaken/errored rows keep
                            # their prior value AND shape
                            top = field[0]
                            if not isinstance(av, _Union):
                                av = _as_array(av, ctx.n)
                            new = _struct_set_gated(
                                ctx, field, av, pc.invert(ok))
                            out[top] = new
                            ctx.written[top] = new
                        else:
                            acc = out.get(field)
                            if acc is None:
                                acc = ctx.col(field)
                            out[field] = _as_array(
                                _blend(ok, av, acc, ctx.n), ctx.n)
                            ctx.written[field] = out[field]
                        if ae is not None:
                            region_err = _merge_errs(
                                ctx.n, region_err, ae)
                    if region_err is not None:
                        errs = _merge_errs(ctx.n, errs, region_err)
            finally:
                ctx.written.clear()
                ctx.written.update(saved)
                ctx.vars.clear()
                ctx.vars.update(saved_vars)
            for field in fields:
                if field not in out:
                    out[field] = _as_array(ctx.col(field), ctx.n)
            return out, errs, aborted, returned
        return ("__if__", None, run)

    def _branch_assigns(self, block) -> list:
        """Ordered (field, exprfn) pairs — duplicates preserved so
        sequential reassignment semantics survive compilation."""
        if block[0] != "block":
            raise NotVectorizable("if branch")
        out = []
        for st in block[1]:
            if st[0] == "abort":
                self._has_abort = True
                out.append((
                    "__abort__",
                    _compile_expr(st[1]) if st[1] is not None else None))
                continue
            if st[0] == "return":
                out.append(("__return__", _compile_expr(st[1])))
                continue
            if st[0] not in ("assign",):
                # bare expression branch statement ("yes" / f(x)):
                # the remap lane discards the value; it runs for its
                # per-row ERRORS only (side-effectful exprs like del
                # gate themselves via lazy_depth at runtime)
                out.append(("__exprstmt__", _compile_expr(st)))
                continue
            if st[2] != "=" or len(st[1]) != 1:
                raise NotVectorizable("if branch statement")
            t = st[1][0]
            if t[0] == "var" and isinstance(t[1], str):
                # per-event VARIABLE branch target (`if c { x = 1 }`)
                out.append((("__var__", t[1]), _compile_expr(st[3])))
                continue
            if t[0] != "path" or t[1] != "event" or not t[2] or \
                    not all(isinstance(sg, str) for sg in t[2]):
                raise NotVectorizable("if branch target")
            out.append((t[2][0] if len(t[2]) == 1 else tuple(t[2]),
                        _compile_expr(st[3])))
        return out

    def run(self, batch: pa.Table) -> pa.Table:
        """Execute the column plan; data-dependent Arrow kernel
        errors (a retyped field feeding a kernel with no matching
        signature, e.g. ``.obj.y = 1`` then ``upcase(.obj.y)``)
        surface as :class:`_RowFallback` so callers degrade to the
        per-row interpreter — the repo invariant is that data errors
        NEVER raise from a stage."""
        try:
            return self._run_impl(batch)
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
                pa.ArrowTypeError, TypeError) as ex:
            # ADVICE r5: a TypeError here may be a genuine kernel bug
            # degrading into a silent ~330x row-path slowdown — count
            # conversions (deepfuzz reports them) and optionally dump
            # the traceback via VRL_RAY_DEBUG_FALLBACK=1.
            FALLBACK_CONVERSIONS[type(ex).__name__] += 1
            if os.environ.get("VRL_RAY_DEBUG_FALLBACK"):
                import sys
                import traceback
                print(f"[vectorize] {type(ex).__name__} -> "
                      f"_RowFallback: {ex}", file=sys.stderr)
                traceback.print_exc()
            raise _RowFallback(f"data-dependent kernel error: {ex}") \
                from ex

    def _run_impl(self, batch: pa.Table) -> pa.Table:
        """Interpreter-parity error semantics: an UNHANDLED fallible
        expression (no ``.ok, .err =`` capture, no ``??``) that errors
        on a row stops that row's program — the target field keeps its
        prior value, later statements skip the row, and the error
        lands in a ``vrl_err`` column (always appended; null where no
        error) — matching RemapStage's per-row error lane instead of
        silently writing type defaults (ADVICE r1)."""
        ctx = _Ctx(batch)
        active = None            # None ⇒ all rows live (fast path)
        err_acc = None

        def gate_write(field, values):
            """Write `values` to field only on live rows; dead rows
            keep their pre-statement value (null for new fields)."""
            values = _as_array(values, ctx.n)
            if active is None:
                return values
            if isinstance(field, str) and field.startswith(_META):
                ctx.gated_meta = True   # % root read must row-path
            old = ctx.col(field)
            if isinstance(values, _Union) or isinstance(old, _Union):
                return _blend(active, values, old, ctx.n)
            if pa.types.is_null(old.type):
                old = _nulls(ctx.n, values.type) if not \
                    pa.types.is_null(values.type) else old
            return pc.if_else(active, values, old)

        def kill(rows_err):
            """Deactivate rows with a new unhandled error; record the
            first error per row."""
            nonlocal active, err_acc
            bad = pc.is_valid(rows_err)
            if active is not None:
                bad = pc.and_(bad, active)
            err_acc = (pc.if_else(bad, rows_err, err_acc)
                       if err_acc is not None
                       else pc.if_else(bad, rows_err, _nulls(ctx.n)))
            live = pc.invert(bad)
            active = live if active is None else pc.and_(active, live)

        aborted_acc = None

        def deactivate(mask):
            """Stop rows without an error (`return`): mutations so
            far kept, later statements skip."""
            nonlocal active
            if active is not None:
                mask = pc.and_(mask, active)
            live = pc.invert(mask)
            active = live if active is None else pc.and_(active, live)
            return mask

        def mark_aborted(mask):
            """Drop rows via `abort`: like `return` but `aborted`
            comes out true."""
            nonlocal aborted_acc
            mask = deactivate(mask)
            aborted_acc = mask if aborted_acc is None \
                else pc.or_(aborted_acc, mask)

        for stmt in self.plan:
            for field, errfield, f in stmt:
                ctx.active_mask = active
                if field == "__expr__":
                    # bare call statement (del(.a), to_int(.s), …):
                    # value discarded; an unhandled error stops the
                    # row exactly like an unhandled assignment
                    v, e = f(ctx)
                    if e is not None and \
                            pc.any(pc.is_valid(e)).as_py():
                        kill(e)
                    continue
                if field == "__metaroot__":
                    # `% = obj`: the metadata namespace becomes
                    # exactly the rhs object's fields
                    if active is not None:
                        ctx.gated_meta = True
                        raise _RowFallback(
                            "% assign on partially-stopped batch")
                    v, e = f(ctx)
                    if e is not None and \
                            pc.any(pc.is_valid(e)).as_py():
                        kill(e)
                    if isinstance(v, _Union):
                        raise _RowFallback("% assign mixed shapes")
                    va = _as_array(v, ctx.n)
                    if isinstance(va, pa.ChunkedArray):
                        va = va.combine_chunks()
                    if not pa.types.is_struct(va.type) or \
                            va.null_count:
                        raise _RowFallback("% assign non-object")
                    for k in [k_ for k_ in ctx.written
                              if isinstance(k_, str)
                              and k_.startswith(_META)]:
                        del ctx.written[k]
                    for j in range(va.type.num_fields):
                        ctx.written[_META + va.type.field(j).name] = \
                            _struct_field_safe(va, j)
                    continue
                if field == "__rootmerge__":
                    # `. |= obj`: rhs fields overwrite/extend the
                    # event; a null/non-object rhs errors per row
                    # ("can't merge type {kind} into object"), rows
                    # keeping their prior event
                    v, e = f(ctx)
                    if isinstance(v, _Union):
                        raise _RowFallback(". |= mixed shapes")
                    ra = _as_array(v, ctx.n)
                    if isinstance(ra, pa.ChunkedArray):
                        ra = ra.combine_chunks()
                    rt = ra.type
                    tmpl = "can't merge type {r} into object"
                    if not pa.types.is_struct(rt):
                        rn = pc.is_null(ra) \
                            .to_numpy(zero_copy_only=False)
                        rk = _vrl_kind_name(rt)
                        msgs = [tmpl.format(r="null" if bb else rk)
                                for bb in rn]
                        err2 = _merge_errs(ctx.n, e,
                                           pa.array(msgs, pa.string()))
                        if errfield is None:
                            # the rhs expression's OWN per-row errors
                            # win (e.g. parse_json's framed text)
                            kill(err2)
                            continue
                        ra = None           # handled: no ok fields
                        rt = None
                    else:
                        if any(pa.types.is_union(rt.field(j).type)
                               for j in range(rt.num_fields)):
                            raise _RowFallback(". |= union child")
                        err2 = _merge_errs(
                            ctx.n, e,
                            _err_where(pc.is_null(ra),
                                       tmpl.format(r="null"), ctx.n)
                            if ra.null_count else None)
                    ok = pa.array([True] * ctx.n)
                    if err2 is not None:
                        ok = pc.and_(ok, pc.is_null(err2))
                    if active is not None:
                        ok = pc.and_(ok, active)
                    if errfield is not None:
                        # handled root merge: error rows REPLACE the
                        # whole event with the (null → empty) default
                        # — all prior columns null there; err var
                        # captures instead of killing
                        if err2 is not None and \
                                _abort_mask(err2) is not None:
                            raise _RowFallback(
                                "abort under root merge capture")
                        err_live = pc.is_valid(err2) if err2 is not \
                            None else pa.array([False] * ctx.n)
                        if active is not None:
                            err_live = pc.and_(err_live, active)
                        if pc.any(err_live).as_py():
                            olds = set(ctx.batch.column_names) \
                                | {k for k in ctx.written
                                   if isinstance(k, str)
                                   and not k.startswith(_META)}
                            for c in olds:
                                oldc = ctx.col(c)
                                ctx.written[c] = _as_array(
                                    _blend(err_live,
                                           _nulls(ctx.n, pa.null()),
                                           oldc, ctx.n), ctx.n)
                        if rt is not None:
                            for j in range(rt.num_fields):
                                fname = rt.field(j).name
                                old = ctx.col(fname)
                                ctx.written[fname] = _as_array(
                                    _blend(ok, ra.field(j), old,
                                           ctx.n), ctx.n)
                        err_col = err2 if err2 is not None \
                            else _nulls(ctx.n)
                        if active is not None:
                            err_col = pc.if_else(
                                active, err_col, _nulls(ctx.n))
                        if errfield[1] != "\x00discard":
                            ctx.vars[errfield[1]] = err_col
                        continue
                    for j in range(rt.num_fields):
                        fname = rt.field(j).name
                        old = ctx.col(fname)
                        ctx.written[fname] = _as_array(
                            _blend(ok, ra.field(j), old, ctx.n),
                            ctx.n)
                    if err2 is not None and \
                            pc.any(pc.is_valid(err2)).as_py():
                        kill(err2)
                    continue
                if field == "__root__":
                    # whole-event replacement: the expression's
                    # object becomes the event. Error/dead rows keep
                    # their ORIGINAL event (columns blend per row);
                    # a clean batch drops the old columns entirely —
                    # exactly what the row path's materialization
                    # produces in each case.
                    v, e = f(ctx)
                    if isinstance(v, _Union):
                        # error rows commonly surface as a null lane
                        # beside ONE struct shape — those rows keep
                        # their old event anyway
                        slanes = [
                            (c, l) for c, l in enumerate(v.lanes)
                            if pa.types.is_struct(l.type)]
                        if len(slanes) != 1 or not all(
                                pa.types.is_null(l.type)
                                for c, l in enumerate(v.lanes)
                                if c != slanes[0][0]):
                            raise _RowFallback(
                                "root assign mixed shapes")
                        code, lane = slanes[0]
                        v = _null_rows(lane,
                                       pa.array(v.tag != code), ctx.n)
                    va = _as_array(v, ctx.n)
                    if isinstance(va, pa.ChunkedArray):
                        va = va.combine_chunks()
                    if not pa.types.is_struct(va.type):
                        raise _RowFallback("root assign non-object")
                    has_err = e is not None and \
                        pc.any(pc.is_valid(e)).as_py()
                    err_live = None
                    if errfield is not None and has_err:
                        # handled root capture: error rows are
                        # REPLACED BY THE DEFAULT (null → empty
                        # event), not killed
                        if _abort_mask(e) is not None:
                            raise _RowFallback(
                                "abort under root capture")
                        err_live = pc.is_valid(e)
                        if active is not None:
                            err_live = pc.and_(err_live, active)
                    news = {va.type.field(j).name: va.field(j)
                            for j in range(va.type.num_fields)}
                    if not has_err and active is None \
                            and not va.null_count:
                        # metadata SURVIVES event replacement
                        ctx.written = {k: w for k, w in
                                       ctx.written.items()
                                       if k.startswith(_META)}
                        ctx.vars = dict(ctx.vars)
                        ctx.written.update(news)
                        ctx.root_cleared = True
                        if isinstance(errfield, tuple) and \
                                errfield[0] == "__var__":
                            ctx.vars[errfield[1]] = _nulls(ctx.n)
                        continue
                    if va.null_count:
                        # a null object row with NO error has no
                        # defined replacement semantics here
                        uncovered = pc.is_null(va)
                        if e is not None:
                            uncovered = pc.and_(uncovered,
                                                pc.is_null(e))
                        if active is not None:
                            uncovered = pc.and_(uncovered, active)
                        if pc.any(uncovered).as_py():
                            raise _RowFallback("root assign null rows")
                    ok = pc.is_null(e) if e is not None \
                        else pa.array([True] * ctx.n)
                    if active is not None:
                        ok = pc.and_(ok, active)
                    clear = ok if err_live is None \
                        else pc.or_(ok, err_live)
                    olds = set(ctx.batch.column_names) \
                        | {k for k in ctx.written
                           if not k.startswith(_META)}
                    for c in olds:
                        if c in news and err_live is None:
                            continue
                        old = ctx.col(c)
                        ctx.written[c] = _as_array(
                            _blend(clear, _nulls(ctx.n, pa.null()),
                                   old, ctx.n), ctx.n)
                    for fname, child in news.items():
                        old = ctx.col(fname)
                        ctx.written[fname] = _as_array(
                            _blend(ok, child, old, ctx.n), ctx.n)
                    if isinstance(errfield, tuple) and \
                            errfield[0] == "__var__":
                        err_col = e if e is not None else _nulls(ctx.n)
                        if active is not None:
                            err_col = pc.if_else(active, err_col,
                                                 _nulls(ctx.n))
                        ctx.vars[errfield[1]] = err_col
                    elif has_err:
                        kill(e)
                    continue
                if field == "__foreach__":
                    updates = f(ctx)
                    for vn, arr in updates.items():
                        if active is not None:
                            cur = ctx.vars[vn]
                            if isinstance(arr, _Union) or \
                                    isinstance(cur, _Union):
                                # stopped rows keep the union lane
                                # they had (pc.if_else can't blend
                                # tagged lanes)
                                arr = _union_blend(
                                    active, arr, cur, ctx.n)
                            else:
                                arr = pc.if_else(
                                    active, arr,
                                    _as_array(cur, ctx.n))
                        ctx.vars[vn] = arr
                    continue
                if isinstance(field, tuple) and field \
                        and field[0] == "__var__":
                    vname = field[1]
                    v, e = f(ctx)
                    v = _as_array(v, ctx.n)
                    old = ctx.vars.get(vname)
                    if old is not None:
                        old = _as_array(old, ctx.n)
                    elif isinstance(v, _Union):
                        old = _nulls(ctx.n, pa.null())
                    else:
                        old = (_nulls(ctx.n, v.type)
                               if not pa.types.is_null(v.type)
                               else _nulls(ctx.n))
                    if errfield is not None:
                        ab = _abort_mask(e)
                        if ab is not None:
                            # abort falls through the capture: neither
                            # target written on abort rows; row dies
                            live = pc.invert(ab)
                            if active is not None:
                                live = pc.and_(live, active)
                            ctx.vars[vname] = _sel(live, v, old, ctx.n)
                            catch_err = pc.if_else(ab, _nulls(ctx.n), e)
                            if isinstance(errfield, tuple) and \
                                    errfield[0] == "__var__":
                                olde = ctx.vars.get(errfield[1])
                                olde = _as_array(olde, ctx.n) \
                                    if olde is not None else _nulls(ctx.n)
                                if pa.types.is_null(olde.type):
                                    olde = _nulls(ctx.n)
                                ctx.vars[errfield[1]] = pc.if_else(
                                    live, catch_err, olde)
                            elif isinstance(errfield, tuple):
                                raise _RowFallback("var ok + nested err")
                            else:
                                old_err = ctx.col(errfield)
                                if pa.types.is_null(old_err.type):
                                    old_err = _nulls(ctx.n)
                                ctx.written[errfield] = pc.if_else(
                                    live, catch_err, old_err)
                            kill(pc.if_else(ab, e, _nulls(ctx.n)))
                            continue
                        # handled: error-as-value, row lives on
                        if active is None:
                            ctx.vars[vname] = v
                        else:
                            ctx.vars[vname] = _sel(active, v, old, ctx.n)
                        err_col = e if e is not None else _nulls(ctx.n)
                        if isinstance(errfield, tuple) and \
                                errfield[0] == "__var__":
                            ctx.vars[errfield[1]] = err_col
                        elif isinstance(errfield, tuple):
                            raise _RowFallback("var ok + nested err")
                        else:
                            ctx.written[errfield] = gate_write(
                                errfield, err_col)
                        continue
                    if e is None:
                        ctx.vars[vname] = v if active is None \
                            else _sel(active, v, old, ctx.n)
                        continue
                    ok = pc.is_null(e)
                    if active is not None:
                        ok = pc.and_(ok, active)
                    ctx.vars[vname] = _sel(ok, v, old, ctx.n)
                    kill(e)
                    continue
                if field in ("__abort__", "__return__"):
                    rows = active if active is not None \
                        else pa.array([True] * ctx.n)
                    if f is not None:
                        _, me = f(ctx)
                        if me is not None:
                            # an erroring message/return expression
                            # kills the row as an ERROR instead
                            me = pc.if_else(rows, me, _nulls(ctx.n))
                            kill(me)
                            rows = pc.and_(rows, pc.is_null(me))
                    if field == "__abort__":
                        mark_aborted(rows)
                    else:
                        deactivate(rows)
                    continue
                if field == "__if__":
                    out_fields, errs, ab_mask, ret_mask = f(ctx)
                    # per-row error gating happened INSIDE the if
                    # compiler (statement order within a branch:
                    # writes preceding a row's first error stick) —
                    # only dead-row gating remains here, then the
                    # statement's unhandled errors kill their rows
                    # and its abort rows drop
                    for k, arr in out_fields.items():
                        if isinstance(k, tuple) and k \
                                and k[0] == "__var__":
                            # variable branch write: ctx.vars storage
                            if active is not None:
                                old = ctx.vars.get(k[1])
                                if old is None:
                                    old = _nulls(ctx.n, pa.null())
                                arr = _blend(active, arr, old, ctx.n)
                            ctx.vars[k[1]] = arr
                            continue
                        if isinstance(k, str) and k.startswith(_META):
                            # branch-gated meta: per-row key presence
                            ctx.gated_meta = True
                        ctx.written[k] = gate_write(k, arr)
                    if errs is not None:
                        kill(errs)
                    if ab_mask is not None:
                        mark_aborted(ab_mask)
                    if ret_mask is not None:
                        deactivate(ret_mask)
                    continue
                if isinstance(field, tuple) and field \
                        and field[0] == "__varpath__":
                    # nested write into a VARIABLE (v.x = 1):
                    # ctx.vars storage, same struct build
                    _, vname, vsegs = field
                    v, e = f(ctx)
                    has_err = e is not None and \
                        pc.any(pc.is_valid(e)).as_py()
                    dead = pc.invert(active) if active is not None \
                        else None
                    if has_err:
                        bad = pc.is_valid(e)
                        dead = bad if dead is None \
                            else pc.or_(dead, bad)
                    va = v if isinstance(v, _Union) \
                        else _as_array(v, ctx.n)
                    top = ctx.vars.get(vname,
                                       _nulls(ctx.n, pa.null()))
                    if not isinstance(top, _Union):
                        top = _as_array(top, ctx.n)
                    segs_v = (vname,) + vsegs
                    if dead is not None and pc.any(dead).as_py():
                        ctx.vars[vname] = _struct_set_gated(
                            ctx, segs_v, va, dead, top=top)
                    else:
                        ctx.vars[vname] = _struct_set(
                            ctx, segs_v, va, top=top)
                    if has_err:
                        kill(e)
                    continue
                if isinstance(field, tuple) and field \
                        and field[0] in ("__varidx__", "__fieldidx__"):
                    # list element write at a literal index — into a
                    # variable (xs[0] = v) or an event column
                    # (.x[5] = v): per-row list surgery
                    # (path_insert int-segment semantics for
                    # in-range / pad-above cases; the exotic shapes —
                    # non-list base, null lists, negative-out-of-range
                    # prepend — take the row path)
                    tag, vname, seg = field
                    v, e = f(ctx)
                    has_err = e is not None and \
                        pc.any(pc.is_valid(e)).as_py()
                    base = ctx.vars.get(vname) if tag == "__varidx__" \
                        else ctx.col(vname)
                    if base is None or isinstance(base, _Union):
                        raise _RowFallback("varidx base shape")
                    base = _as_array(base, ctx.n)
                    if isinstance(base, pa.ChunkedArray):
                        base = base.combine_chunks()
                    new_list = _list_set_at(ctx, base, seg, v)
                    dead = pc.invert(active) if active is not None \
                        else None
                    if has_err:
                        bad = pc.is_valid(e)
                        dead = bad if dead is None \
                            else pc.or_(dead, bad)
                    if dead is not None and pc.any(dead).as_py():
                        new_list = _sel(pc.invert(dead), new_list,
                                        base, ctx.n)
                    if tag == "__varidx__":
                        ctx.vars[vname] = new_list
                    else:
                        ctx.written[vname] = new_list
                    if has_err:
                        kill(e)
                    continue
                if isinstance(field, tuple):
                    # nested (.a.b) struct write; rows that must keep
                    # their prior value (dead rows / new unhandled
                    # errors) gate at the leaf via _struct_set_gated
                    v, e = f(ctx)
                    has_err = e is not None and \
                        pc.any(pc.is_valid(e)).as_py()
                    if errfield is not None and has_err and \
                            _abort_mask(e) is not None:
                        # abort through a nested-target capture: the
                        # leaf-gated struct write + kill combination
                        # isn't worth the complexity here
                        raise _RowFallback("abort under nested capture")
                    dead = pc.invert(active) if active is not None \
                        else None
                    if errfield is None and has_err:
                        bad = pc.is_valid(e)
                        dead = bad if dead is None else pc.or_(dead, bad)
                    va = _as_array(v, ctx.n)
                    if dead is not None and pc.any(dead).as_py():
                        ctx.written[field[0]] = _struct_set_gated(
                            ctx, field, va, dead)
                    else:
                        ctx.written[field[0]] = _struct_set(
                            ctx, field, va)
                    if errfield is not None:
                        err_col = e if e is not None else _nulls(ctx.n)
                        if isinstance(errfield, tuple) and \
                                errfield[0] == "__var__":
                            ctx.vars[errfield[1]] = _as_array(err_col,
                                                              ctx.n)
                        elif isinstance(errfield, tuple):
                            ec = _as_array(err_col, ctx.n)
                            if active is not None:
                                ctx.written[errfield[0]] = \
                                    _struct_set_gated(ctx, errfield, ec,
                                                      pc.invert(active))
                            else:
                                ctx.written[errfield[0]] = _struct_set(
                                    ctx, errfield, ec)
                        else:
                            ctx.written[errfield] = gate_write(
                                errfield, err_col)
                    elif has_err:
                        kill(e)
                    continue
                v, e = f(ctx)
                if errfield is not None:
                    ab = _abort_mask(e)
                    if ab is not None:
                        # `f!()` inside a handled capture: the abort
                        # falls THROUGH the capture (interpreter
                        # catches VrlError only) — neither target is
                        # written on abort rows, which then die
                        if isinstance(errfield, tuple):
                            raise _RowFallback(
                                "abort under tuple-target capture")
                        live = pc.invert(ab)
                        if active is not None:
                            live = pc.and_(live, active)
                        va = _as_array(v, ctx.n)
                        old = ctx.col(field)
                        ctx.written[field] = _as_array(
                            _blend(live, va, old, ctx.n), ctx.n)
                        old_err = ctx.col(errfield)
                        if pa.types.is_null(old_err.type):
                            old_err = _nulls(ctx.n)
                        ctx.written[errfield] = pc.if_else(
                            live, pc.if_else(ab, _nulls(ctx.n), e),
                            old_err)
                        kill(pc.if_else(ab, e, _nulls(ctx.n)))
                        continue
                    # handled (.ok, .err =): error-as-value, row lives on
                    ctx.written[field] = gate_write(field, v)
                    err_col = e if e is not None else _nulls(ctx.n)
                    if isinstance(errfield, tuple) and \
                            errfield[0] == "__var__":
                        # event-path ok + variable err (.x, e = ...)
                        ctx.vars[errfield[1]] = _as_array(err_col, ctx.n)
                    elif isinstance(errfield, tuple):
                        # flat ok + nested err (.x, .meta.err = ...)
                        ec = _as_array(err_col, ctx.n)
                        if active is not None:
                            ctx.written[errfield[0]] = _struct_set_gated(
                                ctx, errfield, ec, pc.invert(active))
                        else:
                            ctx.written[errfield[0]] = _struct_set(
                                ctx, errfield, ec)
                    else:
                        ctx.written[errfield] = gate_write(
                            errfield, err_col)
                    continue
                if e is None:
                    ctx.written[field] = gate_write(field, v)
                    continue
                # unhandled fallible: write only where no error, then
                # stop errored rows for the rest of the program.
                # _blend unifies null types and produces a _Union for
                # retyped overwrites (r4 — previously a row fallback)
                v = _as_array(v, ctx.n)
                old = ctx.col(field)
                ok = pc.is_null(e)
                if active is not None:
                    ok = pc.and_(ok, active)
                ctx.written[field] = _as_array(
                    _blend(ok, v, old, ctx.n), ctx.n)
                kill(e)
        out = batch.select([]) if ctx.root_cleared else batch
        for name, arr in ctx.written.items():
            if name.startswith(_META):
                continue            # transient metadata, never output
            if isinstance(arr, _Union):
                # per-row-typed result → sparse Arrow union column
                # (to_pylist/filter/take all work; parquet sinks and
                # joins reject unions, same as any mixed-type column)
                arr = arr.to_arrow()
            if name in out.column_names:
                out = out.set_column(
                    out.column_names.index(name),
                    name, arr)
            else:
                out = out.append_column(name, arr)
        if "vrl_err" not in out.column_names:
            out = out.append_column(
                "vrl_err", _strip_abort(err_acc) if err_acc is not None
                else _nulls(ctx.n))
        if self._has_abort:
            ab = pc.fill_null(aborted_acc, False) \
                if aborted_acc is not None \
                else pa.array([False] * ctx.n)
            if "aborted" in out.column_names:
                out = out.set_column(
                    out.column_names.index("aborted"), "aborted",
                    _as_array(ab, ctx.n))
            else:
                out = out.append_column("aborted", _as_array(ab, ctx.n))
        return out
