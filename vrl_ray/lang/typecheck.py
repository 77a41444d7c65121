"""Mini static type checker: Kind inference + compile-time
fallibility forcing over the modeled VRL subset.

The reference computes a TypeState while compiling
(src/compiler/compiler.rs:49-62, src/compiler/value/kind.rs) and
(a) resolves ``type_def(expr)`` to the STATIC kind of the expression,
(b) refuses to compile when an unhandled fallible expression remains
("error[E100] unhandled error").

This module reproduces both over the subset the typedef corpus
exercises: literals and containers, event/metadata paths (arbitrary
depth, array indices incl. negative + hole filling), locals,
assignment (plain and ``ok, err =`` infallible), if/else as statement
and expression, blocks, short-circuit ``&&``/``||`` with
literal-aware conditional state application, ``??``, ``|`` merge,
``abort``/``return`` (kind *never*), ``del``/``exists``/``push``/
``assert``/``assert_eq``/``type_def`` calls, arithmetic/comparison
operators with per-pair fallibility.

Anything outside the subset raises :class:`Unsupported` — the caller
(interpreter.Program) then keeps the original AST untouched, so
programs beyond the subset fall back to runtime ``type_def`` (the
previous behavior) instead of getting wrong static answers.

Kind model mirrors src/value/kind/debug.rs: primitive bit-set +
optional object/array collections (known fields + an "unknown"
element kind); rendering matches ``Kind::debug_info`` exactly
("never", "any", ``*_unknown_exact`` / ``*_unknown_infinite``).
"""

from __future__ import annotations

from typing import Optional

from ..value import VrlError

PRIMS = ("bytes", "integer", "float", "boolean", "timestamp", "regex",
         "null", "undefined")
_NUM = frozenset(("integer", "float"))


class Unsupported(Exception):
    """Program uses constructs outside the modeled subset — the
    static pass bails and runtime semantics are preserved."""


class VrlCompileError(VrlError):
    """Compile-time rejection (the reference's error[E100] lane)."""


class Coll:
    """A container collection: known keys (str for objects, int for
    arrays) → Kind, plus the kind of unknown keys (None = provably
    absent / undefined)."""

    __slots__ = ("known", "unknown")

    def __init__(self, known=None, unknown: Optional["Kind"] = None):
        self.known = dict(known or {})
        self.unknown = unknown

    def copy(self) -> "Coll":
        return Coll(dict(self.known), self.unknown)


class Kind:
    """Immutable-by-convention kind value. ``any`` is a flag (the
    reference's Kind::any is recursively infinite)."""

    __slots__ = ("bits", "obj", "arr", "is_any", "approx")

    def __init__(self, bits=(), obj: Optional[Coll] = None,
                 arr: Optional[Coll] = None, is_any: bool = False,
                 approx: bool = False):
        self.bits = frozenset(bits)
        self.obj = obj
        self.arr = arr
        self.is_any = is_any
        # approx: the kind came from the generated stdlib table whose
        # container contents are coarser than the reference's real
        # per-function type_def — never force fallibility from it
        self.approx = approx

    def with_approx(self) -> "Kind":
        if self.approx:
            return self
        k = Kind(self.bits, self.obj, self.arr, self.is_any)
        k.approx = True
        return k

    # --- constructors ---
    @staticmethod
    def prim(name: str) -> "Kind":
        return Kind((name,))

    @staticmethod
    def never() -> "Kind":
        return Kind()

    @staticmethod
    def any() -> "Kind":
        return Kind(is_any=True)

    @staticmethod
    def object(known=None, unknown=None) -> "Kind":
        return Kind(obj=Coll(known, unknown))

    @staticmethod
    def array(known=None, unknown=None) -> "Kind":
        return Kind(arr=Coll(known, unknown))

    # --- predicates ---
    @property
    def is_never(self) -> bool:
        return (not self.is_any and not self.bits and self.obj is None
                and self.arr is None)

    def contains(self, name: str) -> bool:
        return self.is_any or name in self.bits

    def only(self, names) -> bool:
        """True when every possible kind is within `names` (and the
        kind is not a container / any)."""
        return (not self.is_any and self.obj is None and self.arr is None
                and bool(self.bits) and self.bits <= frozenset(names))

    # --- algebra ---
    def union(self, other: "Kind") -> "Kind":
        ap = self.approx or other.approx
        if self.is_any or other.is_any:
            out = Kind.any()
        elif self.is_never:
            out = other
        elif other.is_never:
            out = self
        else:
            obj = _union_coll(self.obj, other.obj)
            arr = _union_coll(self.arr, other.arr)
            out = Kind(self.bits | other.bits, obj, arr)
        return out.with_approx() if ap else out

    def without(self, *names) -> "Kind":
        if self.is_any:
            raise Unsupported("subtract from any")
        return Kind(self.bits - frozenset(names), self.obj, self.arr)

    def upgrade_undefined(self) -> "Kind":
        """undefined → null (the assignment / container-literal
        upgrade, src/compiler/expression/levenstein... container.rs)."""
        if self.is_any or "undefined" not in self.bits:
            return self
        return Kind((self.bits - {"undefined"}) | {"null"},
                    self.obj, self.arr)

    # --- rendering (debug.rs parity) ---
    def debug_info(self) -> dict:
        out: dict = {}
        _insert_kind(out, self, True)
        return out


def _union_coll(a: Optional[Coll], b: Optional[Coll]) -> Optional[Coll]:
    if a is None and b is None:
        return None
    if a is None:
        return b.copy()
    if b is None:
        return a.copy()
    known = {}
    for k in set(a.known) | set(b.known):
        ka = a.known.get(k, a.unknown or Kind.prim("undefined"))
        kb = b.known.get(k, b.unknown or Kind.prim("undefined"))
        known[k] = ka.union(kb)
    if a.unknown is None and b.unknown is None:
        unk = None
    else:
        unk = (a.unknown or Kind.prim("undefined")).union(
            b.unknown or Kind.prim("undefined"))
    return Coll(known, unk)


def _insert_kind(tree: dict, kind: Kind, show_unknown: bool) -> None:
    if kind.is_never:
        tree["never"] = True
        return
    if kind.is_any:
        tree["any"] = True
        return
    for name in ("bytes", "integer", "float", "boolean", "timestamp",
                 "regex", "null", "undefined"):
        if name in kind.bits:
            tree[name] = True
    for coll, label in ((kind.obj, "object"), (kind.arr, "array")):
        if coll is None:
            continue
        sub: dict = {}
        for key in sorted(coll.known, key=str):
            field_tree: dict = {}
            _insert_kind(field_tree, coll.known[key], show_unknown)
            sub[str(key)] = field_tree
        tree[label] = sub
        if show_unknown and coll.unknown is not None \
                and not coll.unknown.only(("undefined",)):
            u: dict = {}
            exact = not coll.unknown.is_any
            _insert_kind(u, coll.unknown, exact)
            suffix = "_unknown_exact" if exact else "_unknown_infinite"
            tree[label + suffix] = u


# ---------------------------------------------------------------------------
# inference state

_NO_CONST = object()


class State:
    def __init__(self):
        # the reference's ExternalEnv: the event/metadata roots are
        # OBJECTS with any-kind fields (flatten(.) / compact(.)
        # compile infallibly; .anything is any)
        self.ext = Kind.object({}, unknown=Kind.any())
        self.meta = Kind.object({}, unknown=Kind.any())
        self.vars: dict[str, Kind] = {}
        # constant values of locals (the reference's resolve_constant
        # path, op.rs:169-176 — `foo = 4; 5 / foo` is infallible)
        self.consts: dict[str, object] = {}

    def clone(self) -> "State":
        s = State.__new__(State)
        s.ext = self.ext
        s.meta = self.meta
        s.vars = dict(self.vars)
        s.consts = dict(self.consts)
        return s

    def merge(self, other: "State") -> "State":
        s = State.__new__(State)
        s.ext = self.ext.union(other.ext)
        s.meta = self.meta.union(other.meta)
        s.vars = {}
        for v in set(self.vars) | set(other.vars):
            a = self.vars.get(v, Kind.prim("undefined"))
            b = other.vars.get(v, Kind.prim("undefined"))
            s.vars[v] = a.union(b)
        s.consts = {k: v for k, v in self.consts.items()
                    if other.consts.get(k, _NO_CONST) == v}
        return s


def _kind_at(kind: Kind, segs: list) -> Kind:
    """Kind of `kind` queried at a path (approx taint propagates
    downward — fields of an approx container are approx)."""
    for seg in segs:
        parent_approx = kind.approx
        if kind.is_any:
            # keep the approx taint: `any` from a coarse-table result
            # must not force fallibility downstream (unnest_typedefs)
            return kind
        if isinstance(seg, str):
            if kind.obj is not None:
                inner = kind.obj.known.get(
                    seg, kind.obj.unknown or Kind.prim("undefined"))
            else:
                inner = Kind.never()
            # non-object possibilities make the query undefined
            if kind.bits or kind.arr is not None:
                inner = inner.union(Kind.prim("undefined"))
            kind = inner
        elif isinstance(seg, int):
            if kind.arr is not None:
                if seg < 0:
                    raise Unsupported("negative index read")
                inner = kind.arr.known.get(
                    seg, kind.arr.unknown or Kind.prim("undefined"))
            else:
                inner = Kind.never()
            if kind.bits or kind.obj is not None:
                inner = inner.union(Kind.prim("undefined"))
            kind = inner
        else:
            raise Unsupported(f"path segment {seg!r}")
        if parent_approx:
            kind = kind.with_approx()
        if kind.is_never:
            return Kind.prim("undefined")
    return kind


def _kind_insert(kind: Kind, segs: list, val: Kind) -> Kind:
    """New kind after assigning `val` at the path (the target becomes
    a container along the way, like runtime path_insert)."""
    if not segs:
        return val
    seg, rest = segs[0], segs[1:]
    if isinstance(seg, str):
        coll = kind.obj.copy() if (not kind.is_any and kind.obj is not None) \
            else Coll(unknown=Kind.any() if kind.is_any else None)
        cur = coll.known.get(seg, coll.unknown or Kind.prim("undefined"))
        coll.known[seg] = _kind_insert(cur, rest, val)
        return Kind(obj=coll)
    if isinstance(seg, int):
        coll = kind.arr.copy() if (not kind.is_any and kind.arr is not None) \
            else Coll(unknown=Kind.any() if kind.is_any else None)
        if seg < 0:
            # negative index only modeled on exact-length arrays
            if coll.unknown is not None:
                raise Unsupported("negative index on unknown-length array")
            length = len(coll.known)
            idx = length + seg
            if idx < 0:
                # runtime prepends: [val, null × (-seg - length - 1), *old]
                shifted = {}
                pad = -seg - length
                shifted[0] = _kind_insert(Kind.prim("undefined"), rest, val)
                for j in range(1, pad):
                    shifted[j] = Kind.prim("null")
                for k, v in coll.known.items():
                    shifted[k + pad] = v
                return Kind(arr=Coll(shifted))
            seg = idx
        if coll.unknown is None:
            for j in range(seg):
                if j not in coll.known:
                    coll.known[j] = Kind.prim("null")  # hole fill
        cur = coll.known.get(seg, coll.unknown or Kind.prim("undefined"))
        coll.known[seg] = _kind_insert(cur, rest, val)
        return Kind(arr=coll)
    raise Unsupported(f"insert segment {seg!r}")


def _kind_remove(kind: Kind, segs: list) -> tuple[Kind, Kind]:
    """del at path → (new kind, removed-value kind)."""
    if not segs:
        raise Unsupported("del of root")
    seg, rest = segs[0], segs[1:]
    if kind.is_any:
        return kind, Kind.any()
    if isinstance(seg, str):
        if kind.obj is None:
            return kind, Kind.prim("null")
        coll = kind.obj.copy()
        if rest:
            cur = coll.known.get(seg, coll.unknown or Kind.prim("undefined"))
            new_inner, removed = _kind_remove(cur, rest)
            coll.known[seg] = new_inner
            return Kind(kind.bits, coll, kind.arr), removed
        removed = coll.known.pop(seg, coll.unknown or Kind.prim("undefined"))
        # del returns the removed value; a maybe-missing field returns
        # null (undefined upgrades), a definitely-present one doesn't
        removed_kind = Kind.any() if removed.is_any \
            else removed.upgrade_undefined()
        return Kind(kind.bits, coll, kind.arr), removed_kind
    if isinstance(seg, int):
        if kind.arr is None:
            return kind, Kind.prim("null")
        if rest or seg < 0:
            raise Unsupported("del nested/negative array index")
        coll = kind.arr.copy()
        if coll.unknown is not None:
            raise Unsupported("del on unknown-length array")
        removed = coll.known.pop(seg, Kind.prim("undefined"))
        # deletion shifts higher indices down
        shifted = {}
        for k, v in coll.known.items():
            shifted[k - 1 if k > seg else k] = v
        return Kind(kind.bits, kind.obj, Coll(shifted)), \
            removed.without("undefined").union(Kind.prim("null"))
    raise Unsupported("del segment")


# ---------------------------------------------------------------------------
# expression / statement inference

class _Infer:
    """Walks the AST mutating a State; returns (Kind, fallible) per
    expression and rewrites ``type_def`` calls to literal dicts."""

    def __init__(self, strict: bool, allow_generic: bool = True):
        self.state = State()
        self.strict = strict
        # generic-table calls return the DECLARED kinds, which are
        # coarser than the reference's per-function type_def math; a
        # program that inspects kinds via type_def() must not see
        # those — it bails to runtime instead
        self.allow_generic = allow_generic

    # --- helpers ---
    def _root(self, prefix: str) -> Kind:
        return self.state.ext if prefix == "event" else self.state.meta

    def _set_root(self, prefix: str, kind: Kind) -> None:
        if prefix == "event":
            self.state.ext = kind
        else:
            self.state.meta = kind

    def _const(self, node):
        """resolve_constant (op.rs:169): literal or constant local."""
        if node[0] == "lit":
            return node[1]
        if node[0] == "var":
            return self.state.consts.get(node[1], _NO_CONST)
        return _NO_CONST

    def _lit_bool(self, node):
        """True/False/None for literal truthiness, else 'unknown'."""
        if node[0] == "lit":
            v = node[1]
            if v is True:
                return True
            if v is False or v is None:
                return False
        return "unknown"

    # --- statements ---
    def stmt(self, s):
        """Returns (rewritten_stmt, Kind, fallible)."""
        if s[0] == "assign":
            return self._assign(s)
        if s[0] == "if":
            new, k, f = self._if(s)
            return new, k, f
        # bare expression statement
        new, k, f = self.expr(s)
        if f and self.strict:
            raise VrlCompileError(
                "unhandled error: expression can result in runtime error "
                "(error[E100])")
        return new, k, f

    def run(self, stmts):
        out = []
        last_kind = Kind.prim("null")
        for s in stmts:
            new, last_kind, _ = self.stmt(s)
            out.append(new)
        return out, last_kind

    def _assign(self, s):
        _, targets, op, expr = s
        if op != "=":
            raise Unsupported("|= assignment")
        new_expr, k, f = self.expr(expr)
        infallible = len(targets) == 2
        if infallible:
            ok_kind = k.union(_default_kind(expr))
            err_kind = Kind(("bytes", "null"))
            self._write_target(targets[0], ok_kind.upgrade_undefined())
            self._write_target(targets[1], err_kind)
            value_kind = k.union(Kind.prim("bytes"))
            return ("assign", targets, op, new_expr), value_kind, False
        if f and self.strict:
            raise VrlCompileError(
                "unhandled error: assigned expression can result in "
                "runtime error (error[E100])")
        self._write_target(targets[0], k.upgrade_undefined())
        if targets[0][0] == "var":
            c = self._const(expr)
            if c is not _NO_CONST:
                self.state.consts[targets[0][1]] = c
            else:
                self.state.consts.pop(targets[0][1], None)
        return ("assign", targets, op, new_expr), k, f

    def _write_target(self, tgt, kind: Kind) -> None:
        t = tgt[0]
        if t == "discard":
            return
        if t == "path":
            prefix, segs = tgt[1], tgt[2]
            self._set_root(prefix, _kind_insert(self._root(prefix),
                                                segs, kind))
            return
        if t == "var":
            self.state.vars[tgt[1]] = kind
            return
        if t == "varpath":
            name, segs = tgt[1], tgt[2]
            base = self.state.vars.get(name, Kind.prim("undefined"))
            self.state.vars[name] = _kind_insert(base, segs, kind)
            return
        raise Unsupported(f"target {t}")

    def _if(self, s):
        _, arms, els = s
        if len(arms) != 1:
            raise Unsupported("else-if chain")
        cond, body = arms[0]
        new_cond, ck, cf = self.expr(cond)
        if cf and self.strict:
            raise VrlCompileError(
                "unhandled error: fallible if-condition (error[E100])")
        base = self.state.clone()
        new_then, tk, tf = self.expr(body)
        s_then = self.state
        self.state = base.clone()
        if els is not None:
            new_else, ek, ef = self.expr(els)
        else:
            new_else, ek, ef = None, Kind.prim("null"), False
        self.state = self.state.merge(s_then)
        kind = tk.union(ek)
        return ("if", [(new_cond, new_then)], new_else), kind, tf or ef

    # --- expressions ---
    def expr(self, n):
        """Returns (rewritten_node, Kind, fallible)."""
        kind = n[0]
        m = getattr(self, "_e_" + kind, None)
        if m is None:
            raise Unsupported(kind)
        return m(n)

    def _e_lit(self, n):
        v = n[1]
        if v is None:
            return n, Kind.prim("null"), False
        if isinstance(v, bool):
            return n, Kind.prim("boolean"), False
        if isinstance(v, int):
            return n, Kind.prim("integer"), False
        if isinstance(v, float):
            return n, Kind.prim("float"), False
        if isinstance(v, str):
            return n, Kind.prim("bytes"), False
        raise Unsupported(f"literal {type(v)}")

    def _e_regex(self, n):
        return n, Kind.prim("regex"), False

    def _e_ts(self, n):
        return n, Kind.prim("timestamp"), False

    def _e_path(self, n):
        return n, _kind_at(self._root(n[1]), n[2]), False

    def _e_var(self, n):
        name = n[1]
        if name not in self.state.vars:
            raise Unsupported(f"read of unset var {name}")
        return n, self.state.vars[name], False

    def _e_index(self, n):
        if self.strict and n[1][0] == "lit" and \
                not isinstance(n[1][1], (dict, list)):
            # `true.foo` / `0[0]` — the reference rejects queries on
            # scalar literals at parse time (query/scalar.vrl)
            raise VrlCompileError(
                "syntax error: cannot query a scalar literal")
        new_base, bk, bf = self.expr(n[1])
        return ("index", new_base, n[2]), _kind_at(bk, n[2]), bf

    def _e_array(self, n):
        elems, kinds, fall = [], {}, False
        for i, e in enumerate(n[1]):
            ne, k, f = self.expr(e)
            elems.append(ne)
            kinds[i] = k.upgrade_undefined()
            fall = fall or f
        return ("array", elems), Kind.array(kinds), fall

    def _e_object(self, n):
        pairs, kinds, fall = [], {}, False
        for key, e in n[1]:
            ne, k, f = self.expr(e)
            pairs.append((key, ne))
            kinds[key] = k.upgrade_undefined()
            fall = fall or f
        return ("object", pairs), Kind.object(kinds), fall

    def _e_not(self, n):
        ne, k, f = self.expr(n[1])
        fall = f or not k.only(("boolean",))
        return ("not", ne), Kind.prim("boolean"), fall

    def _e_block(self, n):
        out, last_k, last_f = [], Kind.prim("null"), False
        for s in n[1]:
            ns, last_k, last_f = self.stmt(s)
            out.append(ns)
        return ("block", out), last_k, last_f

    def _e_if(self, n):
        new, k, f = self._if(("if", n[1], n[2]))
        return ("if", new[1], new[2]), k, f

    def _e_abort(self, n):
        if n[1] is not None:
            nm, _, _ = self.expr(n[1])
        else:
            nm = None
        return ("abort", nm), Kind.never(), False

    def _e_return(self, n):
        ne, _, _ = self.expr(n[1])
        return ("return", ne), Kind.never(), False

    def _e_binop(self, n):
        _, op, ln, rn = n
        if op in ("&&", "||"):
            return self._short_circuit(op, ln, rn)
        if op == "??":
            nl, lk, lf = self.expr(ln)
            if not lf:
                # left infallible → right never runs
                return ("binop", op, nl, rn), lk, False
            base = self.state.clone()
            nr, rk, rf = self.expr(rn)
            self.state = self.state.merge(base)
            return ("binop", op, nl, nr), lk.union(rk), rf
        if op == "|":
            nl, lk, lf = self.expr(ln)
            nr, rk, rf = self.expr(rn)
            kind, fall = _merge_kind(lk, rk)
            return ("binop", op, nl, nr), kind, lf or rf or fall
        nl, lk, lf = self.expr(ln)
        nr, rk, rf = self.expr(rn)
        kind, fall = _binop_kind(op, lk, rk, rn, self._const(rn))
        if fall and (lk.approx or rk.approx):
            # operands typed from the coarse generic table — the
            # reference's finer kinds compiled this; don't force
            fall = False
            kind = kind.with_approx()
        return ("binop", op, nl, nr), kind, lf or rf or fall

    def _short_circuit(self, op, ln, rn):
        """op.rs:222-260 And/Or rules, with literal + kind-based
        short-circuit detection and conditional rhs state application."""
        nl, lk, lf = self.expr(ln)
        truthy = self._lit_bool(ln)
        lhs_false = truthy is False or lk.only(("null",))
        lhs_true = truthy is True or (
            not lk.is_any and not lk.contains("null")
            and not lk.contains("boolean") and not lk.is_never
            and op == "||")
        if op == "&&":
            if lhs_false:
                return ("binop", op, nl, rn), Kind.prim("boolean"), lf
            if truthy is True:
                nr, rk, rf = self.expr(rn)
                return ("binop", op, nl, nr), Kind.prim("boolean"), rf
            base = self.state.clone()
            nr, rk, rf = self.expr(rn)
            self.state = self.state.merge(base)
            fall = (lf or rf or not lk.only(("null", "boolean"))
                    or not rk.only(("null", "boolean")))
            if fall and (lk.approx or rk.approx) and not (lf or rf):
                fall = False
            return ("binop", op, nl, nr), Kind.prim("boolean"), fall
        # ||
        if lhs_false:
            nr, rk, rf = self.expr(rn)
            return ("binop", op, nl, nr), rk, lf or rf
        if lhs_true:
            return ("binop", op, nl, rn), lk, lf
        base = self.state.clone()
        nr, rk, rf = self.expr(rn)
        self.state = self.state.merge(base)
        kind = Kind.any() if lk.is_any else \
            lk.without("null").union(rk)
        if lk.approx or rk.approx:
            kind = kind.with_approx()
        return ("binop", op, nl, nr), kind, lf or rf

    # --- calls ---
    def _e_call(self, n):
        _, name, bang, args, closure = n[:5]
        if closure is not None:
            if name == "replace_with" and self.strict:
                # E122: the closure must return bytes
                # (replace_with.rs closure return-type check)
                params, body = closure
                if len(params) == 1:
                    saved = self.state.vars.get(params[0])
                    self.state.vars[params[0]] = Kind.any()
                    try:
                        _, bk, _bf = self.expr(
                            body if body[0] != "block" or
                            len(body[1]) != 1 else body[1][0])
                    except Unsupported:
                        bk = None
                    finally:
                        if saved is None:
                            self.state.vars.pop(params[0], None)
                        else:
                            self.state.vars[params[0]] = saved
                    if bk is not None and not bk.is_any and \
                            not bk.contains("bytes"):
                        raise VrlCompileError(
                            "type mismatch in closure return type: "
                            "block returns invalid value type "
                            "(error[E122])")
            raise Unsupported("closure call")
        if name == "type_def":
            if len(args) != 1 or args[0][0] is not None:
                raise Unsupported("type_def args")
            _, k, f = self.expr(args[0][1])
            info = k.debug_info()
            if f:
                info["fallible"] = True
            # reference: the argument is compiled but never resolved
            # at runtime (type_def.rs:70-80) — the literal replaces it
            return ("lit_typedef", info), Kind.object(
                {k2: Kind.prim("boolean") for k2 in info}), False
        if name in _COERCE_CALLS:
            out_kind, bad_bits, bad_containers = _COERCE_CALLS[name]
            if len(args) != 1 or args[0][0] is not None:
                raise Unsupported(f"{name} args")
            na, k, f = self.expr(args[0][1])
            fallible = (k.is_any or bool(k.bits & bad_bits)
                        or (bad_containers and
                            (k.obj is not None or k.arr is not None)))
            return ("call", name, bang, [(None, na)], None) + tuple(n[5:]), \
                Kind.prim(out_kind), (f or fallible) and not bang
        if name in ("assert", "assert_eq"):
            new_args = [(an, self.expr(ae)[0]) for an, ae in args]
            return ("call", name, bang, new_args, None) + tuple(n[5:]), \
                Kind.prim("boolean"), not bang
        if name == "exists":
            return n, Kind.prim("boolean"), False
        if name == "del":
            return self._call_del(n)
        if name == "push":
            return self._call_push(n)
        if name == "slice" and args and args[0][0] is None:
            # slice.rs:154-161 exact type_def: bytes in → bytes out,
            # array in → the SAME array collection, else bytes|array
            new_args = []
            kinds = []
            fall = False
            for an, ae in args:
                ne, k, f = self.expr(ae)
                new_args.append((an, ne))
                kinds.append(k)
                fall = fall or f
            v = kinds[0]
            if v.only(("bytes",)):
                out = Kind.prim("bytes")
            elif not v.is_any and not v.bits and v.obj is None \
                    and v.arr is not None:
                out = v
            else:
                out = Kind(("bytes",), arr=Coll(None, Kind.any()))
            return ("call", name, bang, new_args, None) + tuple(n[5:]), \
                out, not bang
        if name == "merge":
            if len(args) < 2:
                raise Unsupported("merge args")
            na = []
            kinds = []
            fall = False
            for an, ae in args[:2]:
                ne, k, f = self.expr(ae)
                na.append((an, ne))
                kinds.append(k)
                fall = fall or f
            kind, mfall = _merge_kind(kinds[0], kinds[1])
            return ("call", name, bang, na + list(args[2:]), None) + tuple(n[5:]), \
                kind, (fall or mfall) and not bang
        return self._call_generic(n)

    #: functions whose Rust `fn type_def` is UNCONDITIONALLY
    #: `.fallible()` even though docs/generated/*.json lists no
    #: internal failure reasons, so the generated table (and the
    #: arg-verification rule below) would call them infallible.
    #: Audited against src/stdlib/*.rs in r3: slice.rs:154-160,
    #: join.rs:101-103, tally.rs:87-89, assert_eq.rs:132-134,
    #: community_id.rs:238-240, format_timestamp.rs:120-122,
    #: from_unix_timestamp.rs:192-194, encode_lz4.rs:98-101,
    #: dns_lookup.rs:254-257, http_request.rs:315-318,
    #: reverse_dns.rs:31-34. (hmac/xxhash/crc/chunks/random_*/mod/
    #: encode_gzip/zlib are CONDITIONAL — see _CONDITIONAL_FALLIBILITY
    #: below, exact constant resolution since r3.)
    _ALWAYS_FALLIBLE = frozenset({
        "slice", "join", "tally", "assert_eq", "community_id",
        "format_timestamp", "from_unix_timestamp", "encode_lz4",
        "dns_lookup", "http_request", "reverse_dns",
    })

    def _call_generic(self, n):
        """Any other stdlib call, typed from the generated reference
        metadata table (declared parameter kinds + intrinsic failure
        reasons): the call is fallible when the reference's compiler
        would say so — intrinsically, or because an argument's
        inferred Kind is not verified against the declared kinds."""
        from ._stdlib_typedefs import STDLIB_TYPEDEFS

        _, name, bang, args, closure = n[:5]
        spec = STDLIB_TYPEDEFS.get(name)
        if spec is None or closure is not None or not self.allow_generic:
            # unknown function / un-lowered closure body / a program
            # whose type_def answers would become imprecise: bail,
            # keep runtime semantics
            raise Unsupported(f"call {name}")
        new_args = []
        arg_kinds = []
        for aname, aexpr in args:
            ne, k, f = self.expr(aexpr)
            if f and not bang:
                # fallible argument expression keeps the call fallible
                arg_kinds.append((aname, None))
            else:
                arg_kinds.append((aname, k))
            new_args.append((aname, ne))
        # reference rule: a call is fallible when any argument's
        # inferred Kind is NOT verified against the declared parameter
        # kinds (intrinsic failure reasons alone don't force handling
        # when every argument type-checks — e.g. crc("foo") compiles
        # infallible in the reference docs examples) — EXCEPT the
        # functions whose Rust type_def is unconditionally fallible
        fallible = name in self._ALWAYS_FALLIBLE
        params = spec["args"]
        for idx, (aname, k) in enumerate(arg_kinds):
            if aname is None:
                declared = params[idx][1] if idx < len(params) else ("any",)
            else:
                declared = next((p[1] for p in params if p[0] == aname),
                                ("any",))
            if "any" in declared:
                continue
            if k is not None and k.approx:
                continue   # coarser-than-reference kind: don't force
            if k is None or not _kind_verified(k, declared):
                fallible = True
        ret_override = None
        cond = _CONDITIONAL_FALLIBILITY.get(name)
        if cond is not None:
            # per-function type_def fallibility that depends on
            # resolve_constant (the reference's conditional functions:
            # crc/hmac/xxhash variant args, chunks/random_* sizes,
            # encode_gzip/zlib level, mod) — exact constant resolution
            # via the checker's constant-locals map, replacing the r2
            # arg-kind approximation
            supplied: dict[str, object] = {}
            for idx, (aname, aexpr) in enumerate(args):
                pname = aname or (params[idx][0]
                                  if idx < len(params) else None)
                if pname:
                    supplied[pname] = self._const(aexpr)
            extra, ret_override = cond(supplied)
            fallible = fallible or extra
        ret = Kind.never()
        for t in (ret_override or spec["ret"]):
            ret = ret.union(_kind_from_name(t))
        return ("call", name, bang, new_args, closure) + tuple(n[5:]), \
            ret.with_approx(), fallible and not bang

    def _call_del(self, n):
        _, name, bang, args, _ = n[:5]
        if not args or args[0][1][0] != "path":
            raise Unsupported("del target")
        anode = args[0][1]
        prefix, segs = anode[1], anode[2]
        new_root, removed = _kind_remove(self._root(prefix), segs)
        self._set_root(prefix, new_root)
        return n, removed, False

    def _call_push(self, n):
        _, name, bang, args, _ = n[:5]
        if len(args) != 2:
            raise Unsupported("push args")
        na0, k0, f0 = self.expr(args[0][1])
        na1, k1, f1 = self.expr(args[1][1])
        elem = k1.upgrade_undefined()
        if k0.is_any:
            out = Kind.array({}, unknown=Kind.any())
            fallible = True
        else:
            coll = k0.arr.copy() if k0.arr is not None else Coll()
            if coll.unknown is None:
                coll.known[len(coll.known)] = elem
            else:
                coll.unknown = coll.unknown.union(elem)
            out = Kind(arr=coll)
            fallible = bool(k0.bits) or k0.obj is not None or k0.arr is None
        new_args = [(args[0][0], na0), (args[1][0], na1)]
        return ("call", name, bang, new_args, None) + tuple(n[5:]), \
            out, (f0 or f1 or fallible) and not bang


# reference coercion typedefs (to_int.rs:160-169, to_float.rs,
# to_bool.rs:200-206, to_string.rs:144-150): result kind + the input
# bits/containers that make the call fallible
# --- conditional type_def fallibility (resolve_constant-dependent) ---
# Mirrors the reference functions whose `fn type_def` consults
# resolve_constant: crc.rs:1011-1026, hmac.rs:178-198,
# xxhash.rs:145-158, chunks.rs:130-136, encode_gzip.rs:105-116 (zlib
# identical), random_bytes.rs:94-101 + get_length, random_int.rs /
# random_float.rs get_range, mod_func.rs type_def.
# A rule takes {param_name: constant | _NO_CONST} — param absent from
# the dict = argument omitted; _NO_CONST = supplied but not a
# compile-time constant — and returns (extra_fallible, ret_override).

_HMAC_ALGOS = frozenset(
    ("SHA1", "SHA-224", "SHA-256", "SHA-384", "SHA-512"))
_XXH_VARIANTS = frozenset(("XXH32", "XXH64", "XXH3-64", "XXH3-128"))


def _crc_algos() -> frozenset:
    from ..functions.checksum import _CRC_PARAMS
    return frozenset(_CRC_PARAMS)


def _cond_variant(pname, valid_fn):
    """Infallible iff the variant arg is omitted or a recognized
    constant string (uppercased compare, as the reference does)."""
    def rule(supplied):
        if pname not in supplied:
            return False, None
        c = supplied[pname]
        ok = isinstance(c, str) and c.upper() in valid_fn()
        return (not ok), None
    return rule


def _cond_chunks(supplied):
    # chunks.rs:130-136: fallible iff chunk_size is not a constant
    # (ANY constant makes it infallible — validity is not checked)
    return supplied.get("chunk_size", _NO_CONST) is _NO_CONST, None


def _cond_level(supplied):
    # encode_gzip.rs:105-116: level omitted → infallible; supplied →
    # must be a constant integer <= 10
    if "compression_level" not in supplied:
        return False, None
    c = supplied["compression_level"]
    ok = isinstance(c, int) and not isinstance(c, bool) and c <= 10
    return (not ok), None


def _cond_random_bytes(supplied):
    # random_bytes.rs get_length: constant integer in [0, 64 KiB]
    c = supplied.get("length", _NO_CONST)
    ok = (isinstance(c, int) and not isinstance(c, bool)
          and 0 <= c <= 1024 * 64)
    return (not ok), None


def _cond_random_range(want_float):
    # random_int.rs / random_float.rs get_range: both bounds constant
    # and max > min
    def rule(supplied):
        mn = supplied.get("min", _NO_CONST)
        mx = supplied.get("max", _NO_CONST)

        def num_ok(v):
            if want_float:
                return isinstance(v, float)
            return isinstance(v, int) and not isinstance(v, bool)
        ok = num_ok(mn) and num_ok(mx) and mx > mn
        return (not ok), None
    return rule


def _cond_mod(supplied):
    # mod_func.rs type_def: constant normal-float / nonzero-int
    # modulus narrows the return kind and drops fallibility, unless
    # the dividend is a constant infinity (NaN result)
    import math
    v = supplied.get("value", _NO_CONST)
    value_inf = isinstance(v, float) and math.isinf(v)
    m = supplied.get("modulus", _NO_CONST)
    if isinstance(m, float):
        normal = math.isfinite(m) and m != 0.0 and abs(m) >= 2.2250738585072014e-308
        return (not normal) or value_inf, ("float",)
    if isinstance(m, int) and not isinstance(m, bool):
        return (m == 0) or value_inf, ("integer",)
    return True, None


_CONDITIONAL_FALLIBILITY = {
    "crc": _cond_variant("algorithm", _crc_algos),
    "hmac": _cond_variant("algorithm", lambda: _HMAC_ALGOS),
    "xxhash": _cond_variant("variant", lambda: _XXH_VARIANTS),
    "chunks": _cond_chunks,
    "encode_gzip": _cond_level,
    "encode_zlib": _cond_level,
    "random_bytes": _cond_random_bytes,
    "random_int": _cond_random_range(want_float=False),
    "random_float": _cond_random_range(want_float=True),
    "mod": _cond_mod,
}


_COERCE_CALLS = {
    "to_int": ("integer", frozenset(("bytes", "regex")), True),
    "to_float": ("float", frozenset(("bytes", "regex")), True),
    "to_bool": ("boolean", frozenset(("bytes", "timestamp", "regex")),
                True),
    "to_string": ("bytes", frozenset(("regex",)), True),
}


def _kind_from_name(t: str) -> Kind:
    if t == "any":
        return Kind.any()
    if t == "string":
        return Kind.prim("bytes")
    if t == "object":
        return Kind.object({}, unknown=Kind.any())
    if t == "array":
        return Kind.array({}, unknown=Kind.any())
    return Kind.prim(t)


def _kind_verified(k: Kind, declared: tuple) -> bool:
    """True when every possible kind of `k` is within the declared
    parameter kinds (the reference's argument verification)."""
    if k.is_any:
        return False
    allowed = set(declared)
    for b in k.bits:
        name = {"bytes": "string"}.get(b, b)
        if name not in allowed:
            return False
    if k.obj is not None and "object" not in allowed:
        return False
    if k.arr is not None and "array" not in allowed:
        return False
    return True


def _merge_kind(lk: Kind, rk: Kind):
    """Kind of `a | b` / merge(a, b): object union, rhs precedence.
    never on either side contributes nothing (abort_typedef .d)."""
    if lk.is_never:
        return Kind(obj=(rk.obj.copy() if rk.obj else Coll())), False
    if rk.is_never:
        return Kind(obj=(lk.obj.copy() if lk.obj else Coll())), False
    if lk.is_any or rk.is_any:
        return Kind.object({}, unknown=Kind.any()), True
    lo = lk.obj or Coll()
    ro = rk.obj or Coll()
    known = dict(lo.known)
    known.update(ro.known)  # rhs wins
    unk = None
    if lo.unknown is not None or ro.unknown is not None:
        unk = (lo.unknown or Kind.prim("undefined")).union(
            ro.unknown or Kind.prim("undefined"))
    fallible = (bool(lk.bits) or lk.arr is not None or lk.obj is None or
                bool(rk.bits) or rk.arr is not None or rk.obj is None)
    return Kind(obj=Coll(known, unk)), fallible


def _is(k: Kind, names) -> bool:
    return k.only(names)


def _binop_kind(op, lk: Kind, rk: Kind, rn, rconst):
    """Reference parity: op.rs:280-385 (Add/Sub/Mul/Div/Rem rules,
    fallible_unless semantics; Div/Rem infallible only when the rhs
    resolves to a constant non-zero number and the lhs is numeric)."""
    num_l = _is(lk, _NUM)
    num_r = _is(rk, _NUM)
    if op == "+":
        if _is(lk, ("bytes",)) or _is(rk, ("bytes",)):
            fall = not (lk.only(("bytes", "null")) and
                        rk.only(("bytes", "null")))
            return Kind.prim("bytes"), fall
        if _is(lk, ("float",)) or _is(rk, ("float",)):
            return Kind.prim("float"), not (num_l and num_r)
        if _is(lk, ("integer",)) and _is(rk, ("integer",)):
            return Kind.prim("integer"), False
        return Kind(("bytes", "integer", "float")), True
    if op in ("-", "*"):
        if op == "*" and _is(lk, ("bytes",)) and _is(rk, ("integer",)):
            return Kind.prim("bytes"), False   # "bar" * 1 repetition
        if op == "*" and _is(lk, ("integer",)) and _is(rk, ("bytes",)):
            return Kind.prim("bytes"), False
        if _is(lk, ("float",)) or _is(rk, ("float",)):
            return Kind.prim("float"), not (num_l and num_r)
        if _is(lk, ("integer",)) and _is(rk, ("integer",)):
            return Kind.prim("integer"), False
        kind = Kind(("integer", "float")) if op == "-" else \
            Kind(("bytes", "integer", "float"))
        return kind, True
    if op in ("/", "%"):
        const_ok = (rconst is not _NO_CONST
                    and isinstance(rconst, (int, float))
                    and not isinstance(rconst, bool) and rconst != 0)
        if op == "/":
            return Kind.prim("float"), not (num_l and const_ok)
        kind = Kind.prim("integer") if _is(lk, ("integer",)) and \
            _is(rk, ("integer",)) else Kind(("integer", "float"))
        return kind, not (num_l and const_ok)
    if op in ("==", "!="):
        return Kind.prim("boolean"), False
    if op in (">", ">=", "<", "<="):
        ok = (num_l and num_r) \
            or (_is(lk, ("bytes",)) and _is(rk, ("bytes",))) \
            or (_is(lk, ("timestamp",)) and _is(rk, ("timestamp",)))
        return Kind.prim("boolean"), not ok
    raise Unsupported(f"op {op}")


def _poss(k: Kind):
    """Enumerate primitive possibilities (containers → marker)."""
    if k.is_any:
        return ["bytes", "integer", "float", "boolean", "timestamp",
                "regex", "null", "undefined", "object", "array"]
    out = list(k.bits)
    if k.obj is not None:
        out.append("object")
    if k.arr is not None:
        out.append("array")
    return out or ["undefined"]


def _default_kind(expr) -> Kind:
    """Kind of the type-default written to the ok target of
    ``ok, err = expr`` on error (assignment.rs:522-549), mirroring
    interpreter._type_default."""
    kind = expr[0]
    if kind == "binop":
        op = expr[1]
        if op == "/":
            return Kind.prim("float")
        if op in ("+", "-", "*", "%"):
            return Kind.prim("integer")
        if op in ("==", "!=", ">", ">=", "<", "<=", "&&"):
            return Kind.prim("boolean")
        return Kind.never()
    if kind == "call":
        from .interpreter import _FN_DEFAULTS

        name = expr[1]
        if name not in _FN_DEFAULTS:
            return Kind.never()
        v = _FN_DEFAULTS[name]
        if v is None:
            return Kind.prim("null")
        if isinstance(v, bool):
            return Kind.prim("boolean")
        if isinstance(v, int):
            return Kind.prim("integer")
        if isinstance(v, float):
            return Kind.prim("float")
        if isinstance(v, str):
            return Kind.prim("bytes")
        if isinstance(v, list):
            return Kind.array({})
        if isinstance(v, dict):
            return Kind.object({})
    return Kind.never()


# ---------------------------------------------------------------------------
# entry point

def check_read_only(stmts: list, read_only: list) -> None:
    """Compile-time read-only path enforcement (the reference's E315
    'mutation of read-only value'). ``read_only`` entries are
    ``(prefix, segments, recursive)`` with prefix 'event'/'meta'.

    Rules (read_only*.vrl corpus): assigning the marked path or any
    ANCESTOR of it (including the root) errors — replacing an
    ancestor would clobber the protected value; assigning BELOW a
    non-recursive marked path is allowed, below a recursive one
    errors. Runs as a standalone AST walk, independent of Kind
    inference (no bail)."""

    def conflicts(prefix: str, segs: list) -> bool:
        for r_prefix, r_segs, recursive in read_only:
            if prefix != r_prefix:
                continue
            n = min(len(segs), len(r_segs))
            if segs[:n] != r_segs[:n]:
                continue
            if len(segs) <= len(r_segs):
                return True          # exact match or ancestor (or root)
            if recursive:
                return True          # descendant of recursive mark
        return False

    def walk(node) -> None:
        if not isinstance(node, (list, tuple)):
            return
        if node and node[0] == "assign":
            for t in node[1]:
                if t[0] == "path" and conflicts(t[1], list(t[2])):
                    raise VrlCompileError("mutation of read-only value "
                                          "(error[E315])")
            walk(node[3])
            return
        for x in node:
            walk(x)

    for s in stmts:
        walk(s)


def _contains_type_def(node) -> bool:
    if isinstance(node, (list, tuple)):
        if len(node) > 1 and node[0] == "call" and node[1] == "type_def":
            return True
        return any(_contains_type_def(x) for x in node)
    return False


def annotate(stmts: list, strict: bool = False) -> list:
    """Static pass over a parsed program. Rewrites ``type_def(expr)``
    calls to their STATIC kind (a ``lit_typedef`` node the interpreter
    resolves to the dict); under ``strict``, raises
    :class:`VrlCompileError` for unhandled fallible statements.
    Raises :class:`Unsupported` (caller keeps the original AST) for
    programs outside the modeled subset."""
    inf = _Infer(strict, allow_generic=not _contains_type_def(stmts))
    out, _ = inf.run(stmts)
    return out
