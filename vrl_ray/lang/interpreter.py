"""Tree-walking evaluator for the VRL subset — the analogue of the
reference's AST runtime (src/compiler/runtime.rs:96-128): one event
per resolve, in-place mutation, result = last expression.

Fallibility-as-value: stdlib kernels raise VrlError; ``f!()`` converts
an error into a program failure (VrlRuntimeError), ``??`` and
``ok, err = expr`` capture it (assignment.rs:522-549). ``abort`` stops
execution and marks the event dropped (runtime.rs:120-126).
"""

from __future__ import annotations

import copy
import re as _stdre
from datetime import datetime, timezone
from typing import Any, Optional

import regex as _regex

from .. import value as V
from ..value import VrlError
from ..functions import REGISTRY
from .parser import parse, ParseError


class VrlCallError(VrlError):
    """A fallible-call error already formatted with the reference's
    span-carrying diagnostic text (captured by ``ok, err =``)."""


class VrlRuntimeError(Exception):
    """Unrecoverable program error (the Terminate::Error lane)."""

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class Abort(Exception):
    """The `abort` expression (Terminate::Abort — event dropped)."""

    def __init__(self, message: Optional[str] = None):
        super().__init__(message or "aborted")
        self.message = message


class _Return(Exception):
    def __init__(self, value):
        self.value = value


def _btree_view(v):
    """Render-order view: objects observe BTreeMap (sorted) key order
    when stringified into assert/assert_eq messages, matching the
    reference's Value Display and our vector lane."""
    if isinstance(v, dict):
        return {k: _btree_view(v[k]) for k in sorted(v, key=str)}
    if isinstance(v, list):
        return [_btree_view(x) for x in v]
    return v


# named args whose VRL name collides with Python keywords / our impls
_ARG_RENAME = {
    "from": "from_", "else": "else_", "timezone": "timezone_name",
    "except": "except_", "null": "null", "object": "object",
    "array": "array", "string": "string", "with": "with_",
}

# registry entries implemented with trailing-underscore python names
_POSITIONAL_HINTS: dict[str, list[str]] = {}

# type-defaults for the error lane of `ok, err = expr`
# (assignment.rs:522-549: ok gets TypeDef::default_value()). Without a
# static type checker we derive the default from the failed node's
# shape: division → float, other arithmetic → int, known fallible
# functions → their return kind's default.
_FN_DEFAULTS = {
    "to_int": 0, "parse_int": 0, "to_unix_timestamp": 0, "strlen": 0,
    "length": 0, "to_float": 0.0, "parse_float": 0.0, "to_bool": False,
    "to_string": "", "downcase": "", "upcase": "", "encode_json": "",
    "format_timestamp": "", "join": "", "parse_json": None,
    # exactly-timestamp kinds default to the epoch
    # (kind.rs:60-66 Utc.timestamp(0,0); parse_timestamp.rs type_def)
    "parse_timestamp": __import__("datetime").datetime(
        1970, 1, 1, tzinfo=__import__("datetime").timezone.utc),
    # collection builders default to their container kind
    # (issues/11287: `ok, err = push(.undefined, x)` → ok == [])
    "push": [], "append": [], "merge": {},
}


def _type_default(node):
    kind = node[0]
    if kind == "binop":
        op = node[1]
        if op == "/":
            return 0.0
        if op in ("+", "-", "*", "%"):
            return 0
        if op in ("==", "!=", ">", ">=", "<", "<=", "&&"):
            return False
        return None
    if kind == "call":
        return _FN_DEFAULTS.get(node[1])
    return None


class Program:
    """A compiled VRL program. ``resolve(event)`` returns
    ``(result, event, aborted)``; event is mutated in place like the
    reference target."""

    def __init__(self, source: str, strict: bool = False,
                 read_only=None):
        self.source = source
        self.stmts = parse(source)
        # static pass: resolves type_def() to compile-time kinds and
        # (under strict) rejects unhandled fallible expressions —
        # the reference's compile step (compiler.rs:49-62). Programs
        # outside the modeled subset keep runtime semantics unchanged.
        from .typecheck import Unsupported, annotate, check_read_only

        if read_only:
            # E315 enforcement: standalone walk, never bails
            check_read_only(self.stmts, read_only)
        try:
            self.stmts = annotate(self.stmts, strict=strict)
        except Unsupported:
            pass

    def resolve(self, event: Any, metadata: Optional[dict] = None):
        ctx = _Ctx(event, metadata or {})
        result = None
        try:
            for s in self.stmts:
                result = ctx.eval(s)
        except Abort as a:
            return None, ctx.root[0], a
        except _Return as r:
            return r.value, ctx.root[0], None
        except Exception:
            # partial mutations persist on error (reference runtime:
            # the target keeps every change up to the failure) — a
            # root REPLACEMENT rebinds ctx.root, which callers holding
            # the original dict would otherwise never see
            if isinstance(event, dict) and ctx.root[0] is not event:
                if isinstance(ctx.root[0], dict):
                    event.clear()
                    event.update(ctx.root[0])
                elif ctx.root[0] is None:
                    # `., _ |= <error>` reset the root to the null
                    # default: the caller's event is now empty
                    event.clear()
            raise
        return result, ctx.root[0], None


def compile_program(source: str, strict: bool = True,
                    read_only=None) -> Program:
    """Reference-parity compile: static type pass ON (compile-time
    type_def + fallibility forcing where modeled; optional read-only
    path list as (prefix, segments, recursive) tuples). The lenient
    entry point for pipeline stages is ``Program(src)`` directly."""
    return Program(source, strict=strict, read_only=read_only)


class _Ctx:
    def __init__(self, event: Any, metadata: dict):
        self.root = [event]          # boxed: `. = expr` replaces the root
        self.meta = [metadata]
        self.vars: dict[str, Any] = {}

    # --- paths ---
    def _read_path(self, prefix: str, segs: list):
        base = self.root[0] if prefix == "event" else self.meta[0]
        return V.path_get(base, segs)

    def _write_path(self, prefix: str, segs: list, val):
        box = self.root if prefix == "event" else self.meta
        box[0] = V.path_insert(box[0], segs, val)

    # --- evaluation ---
    def eval(self, node) -> Any:
        kind = node[0]
        m = getattr(self, "_eval_" + kind, None)
        if m is None:
            raise VrlRuntimeError(f"unsupported node: {kind}")
        return m(node)

    _TEMPLATE = _regex.compile(r"\{\{\s*([A-Za-z_][\w.]*)\s*\}\}")

    def _eval_lit(self, n):
        # templates ("{{ var }}") desugar at PARSE time to variable
        # string concatenation (template_string.rs, compiler.rs:246) —
        # a literal node is always verbatim here
        return n[1]

    def _eval_lit_typedef(self, n):
        # compile-time-resolved type_def() result (typecheck.annotate)
        return copy.deepcopy(n[1])

    def _eval_regex(self, n):
        try:
            return _regex.compile(n[1])
        except _regex.error as e:
            raise VrlRuntimeError(f"invalid regex: {e}") from e

    def _eval_ts(self, n):
        s = n[1].strip()
        try:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError as e:
            raise VrlRuntimeError(f"invalid timestamp literal: {s}") from e
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)

    def _eval_path(self, n):
        return self._read_path(n[1], n[2])

    def _eval_var(self, n):
        name = n[1]
        if name not in self.vars:
            raise VrlError(f"undefined variable {name}")
        return self.vars[name]

    def _eval_array(self, n):
        return [self.eval(e) for e in n[1]]

    def _eval_object(self, n):
        return {k: self.eval(v) for k, v in n[1]}

    def _eval_index(self, n):
        base = self.eval(n[1])
        return V.path_get(base, n[2])

    def _eval_not(self, n):
        v = self.eval(n[1])
        if not isinstance(v, bool):
            raise VrlError(f"expected boolean, got {V.vrl_type(v)}")
        return not v

    def _eval_block(self, n):
        out = None
        for s in n[1]:
            out = self.eval(s)
        return out

    def _eval_if(self, n):
        for cond, body in n[1]:
            c = self.eval(cond)
            if not isinstance(c, bool):
                raise VrlRuntimeError(
                    f"if predicate must be boolean, got {V.vrl_type(c)}")
            if c:
                return self.eval(body)
        if n[2] is not None:
            return self.eval(n[2])
        return None

    def _eval_abort(self, n):
        msg = self.eval(n[1]) if n[1] is not None else None
        raise Abort(msg)

    def _eval_return(self, n):
        raise _Return(self.eval(n[1]))

    def _eval_binop(self, n):
        op, ln, rn = n[1], n[2], n[3]
        if op == "??":
            return V.coalesce(lambda: self.eval(ln), lambda: self.eval(rn))
        if op == "||":
            return V.logical_or(self.eval(ln), lambda: self.eval(rn))
        if op == "&&":
            return V.logical_and(self.eval(ln), lambda: self.eval(rn))
        l = self.eval(ln)
        r = self.eval(rn)
        if op == "==":
            return V.eq(l, r)
        if op == "!=":
            return not V.eq(l, r)
        if op == ">":
            return V.gt(l, r)
        if op == ">=":
            return V.ge(l, r)
        if op == "<":
            return V.lt(l, r)
        if op == "<=":
            return V.le(l, r)
        if op == "+":
            return V.add(l, r)
        if op == "-":
            return V.sub(l, r)
        if op == "*":
            return V.mul(l, r)
        if op == "/":
            return V.div(l, r)
        if op == "%":
            return V.rem(l, r)
        if op == "|":
            return V.merge_shallow(l, r)
        raise VrlRuntimeError(f"unknown operator {op}")

    def _eval_assign(self, n):
        targets, op, expr = n[1], n[2], n[3]
        infallible = len(targets) == 2
        err_val = None
        try:
            val = self.eval(expr)
            # the op application itself can fail too (`|=` on a
            # non-object) — inside the try so `ok, err =` captures it.
            # `a |= b` compiles as `a = a | b` (compiler.rs:500-521
            # rewrite_to_merge), so the assignment's VALUE is the
            # MERGED result, not the RHS
            val = self._assign_target(targets[0], val, op)
        except (VrlError,) as e:
            if infallible:
                # ok target gets the expression's TYPE DEFAULT, not
                # null (assignment.rs:522-549 — e.g. 1/0 → ok == 0.0)
                val = _type_default(expr)
                err_val = e.message if hasattr(e, "message") else str(e)
                self._assign_target(targets[0], val, "=")
            else:
                raise
        if infallible:
            self._assign_target(targets[1], err_val, "=")
        return val if err_val is None else err_val

    def _assign_target(self, tgt, val, op):
        """Returns the value actually assigned (the merged value for
        `|=` — it is also the assignment expression's value)."""
        kind = tgt[0]
        if kind == "discard":
            return val
        if kind == "path":
            if op == "|=":
                cur = self._read_path(tgt[1], tgt[2])
                val = V.merge_shallow(cur if isinstance(cur, dict) else {}, val)
            self._write_path(tgt[1], tgt[2], copy.deepcopy(val))
            return val
        if kind == "var":
            if op == "|=":
                cur = self.vars.get(tgt[1])
                val = V.merge_shallow(cur if isinstance(cur, dict) else {}, val)
            self.vars[tgt[1]] = val
            return val
        if kind == "varpath":
            base = self.vars.get(tgt[1])
            self.vars[tgt[1]] = V.path_insert(base, tgt[2], val)
            return val
        raise VrlRuntimeError(f"invalid assignment target {kind}")

    # --- function calls ---
    def _eval_call(self, n):
        _, name, bang, args, closure = n[:5]
        span = n[5] if len(n) > 5 else None
        try:
            return self._call(name, args, closure)
        except VrlCallError as e:
            # a nested call already attributed the error — don't
            # re-wrap (the reference points at the innermost call)
            if bang:
                raise VrlRuntimeError(e.message) from e
            raise
        except VrlError as e:
            # reference diagnostic shape (ExpressionError::Error):
            # `function call error for "f" at (start:end): message`
            at = f" at ({span[0]}:{span[1]})" if span else ""
            msg = f'function call error for "{name}"{at}: {e.message}'
            if bang:
                raise VrlRuntimeError(msg) from e
            raise VrlCallError(msg) from e

    def _call(self, name, args, closure):
        # path-argument builtins operate on the event / variables /
        # inline containers (del.rs, exists.rs take query arguments)
        if name in ("del", "exists") and args and args[0][1][0] in (
                "path", "index", "var"):
            anode = args[0][1]
            compact_flag = False
            for an, av in args[1:]:
                if an in (None, "compact"):
                    compact_flag = bool(self.eval(av))
            if anode[0] == "path":
                if name == "exists":
                    return self._path_exists(anode)
                box = self.root if anode[1] == "event" else self.meta
                box[0], removed = V.path_remove(box[0], anode[2],
                                                compact=compact_flag)
                return removed
            if anode[0] == "index" and anode[1][0] == "var":
                vname, segs = anode[1][1], anode[2]
                base = self.vars.get(vname)
                if name == "exists":
                    from ..functions.object import exists as _ex
                    return _ex(base, segs)
                new_base, removed = V.path_remove(base, segs,
                                                  compact=compact_flag)
                self.vars[vname] = new_base
                return removed
            # inline container expression: no persistence
            base = self.eval(anode[1]) if anode[0] == "index" else self.eval(anode)
            segs = anode[2] if anode[0] == "index" else []
            if name == "exists":
                from ..functions.object import exists as _ex
                return _ex(base, segs)
            _, removed = V.path_remove(base, segs, compact=compact_flag)
            return removed
        if name == "unnest" and args and (
                args[0][1][0] == "path"
                or args[0][1][0] == "var"
                or (args[0][1][0] == "index" and args[0][1][1][0] == "var")):
            # unnest(<path>) — N copies of the path's ROOT (event or
            # variable value), one per array element at the path
            # (unnest.rs:64-72); `. = unnest(...)` then makes the
            # event root an array → the host emits N events.
            from ..functions.misc import unnest as _unnest
            anode = args[0][1]
            if anode[0] == "path":
                if anode[1] != "event":
                    raise VrlError("unnest requires an event path")
                return _unnest(self.root[0], anode[2])
            vname = anode[1][1] if anode[0] == "index" else anode[1]
            segs = anode[2] if anode[0] == "index" else []
            if vname not in self.vars:
                raise VrlError(f"undefined variable {vname}")
            return _unnest(self.vars[vname], segs)
        if name == "assert":
            cond = self.eval(args[0][1])
            msg = self.eval(args[1][1]) if len(args) > 1 else "assertion failed"
            if cond is not True:
                raise VrlError(msg if isinstance(msg, str)
                               else str(_btree_view(msg)))
            return True
        if name == "assert_eq":
            l = self.eval(args[0][1])
            r = self.eval(args[1][1])
            if not V.eq(l, r):
                raise VrlError(f"assertion failed: "
                               f"{_btree_view(l)!r} == {_btree_view(r)!r}")
            return True

        fn = REGISTRY.get(name)
        if fn is None:
            raise VrlRuntimeError(f"undefined function {name}")
        pos, kw = [], {}
        for aname, aexpr in args:
            v = self.eval(aexpr)
            if aname is None:
                pos.append(v)
            else:
                kw[_ARG_RENAME.get(aname, aname)] = v
        if closure is not None:
            params, body = closure

            def closure_fn(*cargs):
                # closure scoping (E701 surface): params and NEW vars
                # defined inside the closure scope OUT afterwards;
                # reassignments of pre-existing outer vars persist
                # (the accumulator idiom)
                existing = set(self.vars)
                saved = {p: self.vars[p] for p in params
                         if p in self.vars}
                try:
                    for p, a in zip(params, cargs):
                        self.vars[p] = a
                    # single-param closures over 2-arg callbacks: pad
                    if len(params) > len(cargs):
                        for p in params[len(cargs):]:
                            self.vars[p] = None
                    try:
                        return self.eval(body)
                    except _Return as r:
                        # `return` exits the CLOSURE invocation only
                        # (return/return_in_closure.vrl)
                        return r.value
                finally:
                    for v in list(self.vars):
                        if v not in existing:
                            del self.vars[v]
                    for p in params:
                        if p in saved:
                            self.vars[p] = saved[p]
                        else:
                            self.vars.pop(p, None)

            # the closure binds its DECLARED parameter slot, not the
            # end of the list: later optional params given positionally
            # (replace_with's count, map_keys' recursive) come after it
            cf = _adapt_closure(name, closure_fn, len(params))
            slot = _CLOSURE_SLOT.get(name)
            if slot is not None and len(pos) > slot:
                pos.insert(slot, cf)
            else:
                pos.append(cf)
        try:
            return fn(*pos, **kw)
        except VrlError:
            raise
        except TypeError as e:
            # runtime argument-kind mismatch: the reference surfaces
            # these as CATCHABLE call errors with the parameter's
            # declared kinds ("expected string, got null" —
            # expressions/query/function_call_error.vrl), not a
            # program abort
            msg = _arg_kind_error(name, pos, kw)
            if msg is not None:
                raise VrlError(msg) from e
            raise VrlRuntimeError(f"bad arguments for {name}: {e}") from e

    def _path_exists(self, pnode) -> bool:
        from ..functions.object import exists as _exists
        base = self.root[0] if pnode[1] == "event" else self.meta[0]
        return _exists(base, pnode[2])


def _arg_kind_error(name: str, pos, kw) -> "str | None":
    """Reference-style runtime argument error: match actual values
    against the declared parameter kinds (the generated type table)
    and report the first mismatch as `expected <kinds>, got <kind>`
    (ArgumentError display, e.g. 'expected string, got null')."""
    from ..value import vrl_type
    from ._stdlib_typedefs import STDLIB_TYPEDEFS

    spec = STDLIB_TYPEDEFS.get(name)
    if spec is None:
        return None
    params = spec["args"]
    supplied = list(zip((p[0] for p in params), pos))
    supplied += [(k, v) for k, v in kw.items()]
    for pname, val in supplied:
        declared = next((p[1] for p in params if p[0] == pname), None)
        if declared is None or "any" in declared:
            continue
        try:
            actual = vrl_type(val)
        except TypeError:
            continue
        ok = actual in declared or (
            actual == "integer" and "float" in declared)
        if not ok:
            return f"expected {' or '.join(declared)}, got {actual}"
    return None


#: positional index of the closure parameter in the python stdlib
#: signatures (functions/object.py, functions/string.py:141)
_CLOSURE_SLOT = {"map_keys": 1, "map_values": 1, "for_each": 1,
                 "filter": 1, "replace_with": 2}


def _adapt_closure(fname: str, fn, nparams: int):
    """Bridge VRL closure arity to the python stdlib callbacks:
    map_keys/|k|, map_values/|v|, filter+for_each/|k,v| or |i,v|,
    replace_with/|m|."""
    if fname in ("map_keys", "map_values", "replace_with"):
        return lambda a: fn(a)
    if fname in ("filter", "for_each"):
        return lambda k, v: fn(k, v)
    # generic: pass through as-is
    return fn
