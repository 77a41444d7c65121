"""Compile-time semantic diagnostics with the reference's rendered
text.

The reference compiler (src/compiler/compiler.rs) accumulates
positioned diagnostics while type-checking: hard errors push
immediately, fallibility is tracked on a *pending* stack that consumer
expressions (``??``, ``ok, err =`` assignment, ``abort``/``return``
message, predicates, function-argument validation) truncate, and
whatever is still pending at a root-statement boundary flushes as
an unhandled-error diagnostic (compiler.rs:182-330).  This module
reproduces that model over the parsed AST, emitting
:class:`~.diagnostics.Diagnostic` objects whose rendered text matches
the reference's diagnostics corpus
(/root/reference/lib/tests/tests/diagnostics/*.vrl) byte-for-byte.

Diagnostics covered (reference source for each label/note text):
- E100 unhandled error                  expression_error.rs:86-87
- E101/E601 invalid regex/timestamp     expression/literal.rs:291-343
- E102 non-boolean predicate            expression/predicate.rs:112-153
- E104/E103/E642/E652 assignment lane   expression/assignment.rs, op.rs
- E105/E106/E107/E108/E110/E630/E610    expression/function_call.rs
- E113/E631 abort message               expression/abort.rs
- E620 can't abort infallible (warning) function_call.rs:922-950
- E660 non-boolean negation             expression/not.rs
- E651 unnecessary error coalescing     expression/op.rs:406-478
- E701 call to undefined variable       expression/variable.rs

The kind lattice here (:class:`DK`) is intentionally small: precise
enough to reproduce every corpus diagnostic, with a ``precise`` taint
so coarse approximations FAIL OPEN (no diagnostic) instead of
emitting errors the reference would not.
"""

from __future__ import annotations

import regex as _regex
from datetime import datetime

from .parser import Parser, ParseError
from ._stdlib_typedefs import STDLIB_TYPEDEFS
from .diagnostics import (
    Diagnostic, Label, NOTE_COERCE, NOTE_FUNC_CHARACTERISTICS,
    NOTE_SEE_ERROR_DOCS, REF_FN_IDENTS, ast_display, best_guess,
    note_code_docs, note_func_docs, note_see_docs, note_solution,
    render_list,
)

#: display order (value/kind.rs Display impl, 43-109)
PRIMS = ("string", "integer", "float", "boolean", "timestamp", "regex",
         "null", "undefined", "array", "object")


class DK:
    """A diagnostic-pass kind: primitive-name set plus optional known
    object/array collections (value/kind.rs Kind, radically reduced).
    ``precise=False`` marks coarse approximations — checks that would
    emit a diagnostic must skip imprecise kinds."""

    __slots__ = ("names", "obj_known", "obj_unknown", "arr_known",
                 "arr_unknown", "precise")

    def __init__(self, names, obj_known=None, obj_unknown=None,
                 arr_known=None, arr_unknown=None, precise=True):
        self.names = frozenset(names)
        self.obj_known = obj_known
        self.obj_unknown = obj_unknown
        self.arr_known = arr_known
        self.arr_unknown = arr_unknown
        self.precise = precise

    # --- constructors ---
    @staticmethod
    def prim(name: str) -> "DK":
        return DK((name,))

    @staticmethod
    def any() -> "DK":
        k = DK(PRIMS, precise=False)
        k.obj_unknown = k
        k.arr_unknown = k
        return k

    @staticmethod
    def root_object() -> "DK":
        """External target root: object with any-kind unknown fields
        (state.rs ExternalEnv default)."""
        k = DK(("object",))
        k.obj_unknown = DK.any()
        return k

    @staticmethod
    def json() -> "DK":
        """parse_json's return kind: every JSON-representable kind,
        recursively (parse_json.rs type_def)."""
        k = DK(("string", "integer", "float", "boolean", "null",
                "array", "object"))
        k.obj_unknown = k
        k.arr_unknown = k
        return k

    # --- predicates ---
    def contains(self, name: str) -> bool:
        return name in self.names

    def is_exactly(self, name: str) -> bool:
        return self.names == frozenset((name,))

    def is_any(self) -> bool:
        return self.names == frozenset(PRIMS)

    # --- algebra ---
    def union(self, other: "DK") -> "DK":
        ok = _merge_known(self.obj_known, other.obj_known)
        ak = _merge_known(self.arr_known, other.arr_known)
        ou = _merge_unknown(self.obj_unknown, other.obj_unknown)
        au = _merge_unknown(self.arr_unknown, other.arr_unknown)
        return DK(self.names | other.names, ok, ou, ak, au,
                  self.precise and other.precise)

    def at_field(self, field: str) -> "DK":
        parts = []
        if "object" in self.names:
            if self.obj_known and field in self.obj_known:
                parts.append(self.obj_known[field])
            elif self.obj_unknown is not None:
                parts.append(self.obj_unknown)
                parts.append(DK.prim("undefined"))
            else:
                parts.append(DK.prim("undefined"))
        if self.names - {"object"}:
            parts.append(DK.prim("undefined"))
        return _union_all(parts, self.precise)

    def at_index(self, idx: int) -> "DK":
        parts = []
        if "array" in self.names:
            if self.arr_known and idx in self.arr_known:
                parts.append(self.arr_known[idx])
            elif self.arr_unknown is not None:
                parts.append(self.arr_unknown)
                parts.append(DK.prim("undefined"))
            else:
                parts.append(DK.prim("undefined"))
        if self.names - {"array"}:
            parts.append(DK.prim("undefined"))
        return _union_all(parts, self.precise)

    def at_path(self, segs) -> "DK":
        k = self
        for s in segs:
            k = k.at_field(s) if isinstance(s, str) else k.at_index(s)
        return k

    def insert(self, segs, val: "DK") -> "DK":
        """Kind after assigning ``val`` at ``segs`` (the assignment
        was verified, so the parent levels become exact containers)."""
        if not segs:
            return val
        s = segs[0]
        if isinstance(s, str):
            known = dict(self.obj_known or {}) if "object" in self.names \
                else {}
            prior = known.get(s, DK.prim("undefined"))
            known[s] = prior.insert(segs[1:], val)
            out = DK(("object",), obj_known=known,
                     obj_unknown=self.obj_unknown
                     if "object" in self.names else None,
                     precise=self.precise)
            return out
        known = dict(self.arr_known or {}) if "array" in self.names else {}
        prior = known.get(s, DK.prim("undefined"))
        known[s] = prior.insert(segs[1:], val)
        return DK(("array",), arr_known=known,
                  arr_unknown=self.arr_unknown
                  if "array" in self.names else None,
                  precise=self.precise)

    # --- display (value/kind.rs Display) ---
    def display(self) -> str:
        if self.is_any():
            return "any"
        if self.names == frozenset(("object",)):
            unknown_any = self.obj_unknown is not None
            if unknown_any or not self.obj_known:
                return "object"
            inner = ", ".join(f"{k}: {v.display()}"
                              for k, v in self.obj_known.items())
            return "{ " + inner + " }"
        if self.names == frozenset(("array",)):
            if self.arr_unknown is not None or not self.arr_known:
                return "array"
            inner = ", ".join(v.display() for _, v in
                              sorted(self.arr_known.items()))
            return "[" + inner + "]"
        ordered = [n for n in PRIMS if n in self.names]
        if not ordered:
            return "never"
        if len(ordered) == 1:
            return ordered[0]
        return ", ".join(ordered[:-1]) + " or " + ordered[-1]


def _merge_known(a, b):
    if a is None and b is None:
        return None
    out = dict(a or {})
    for k, v in (b or {}).items():
        out[k] = out[k].union(v) if k in out else v
    return out


def _merge_unknown(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a.union(b)


def _union_all(parts, precise):
    if not parts:
        return DK(("undefined",), precise=precise)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    if not precise:
        out = DK(out.names, out.obj_known, out.obj_unknown,
                 out.arr_known, out.arr_unknown, False)
    return out


def _decl_dk(declared) -> DK:
    """Declared parameter kind tuple → DK (metadata table names)."""
    if "any" in declared:
        return DK.any()
    return DK(tuple(declared))


def _kind_str(k: DK) -> str:
    """function_call.rs kind_str helper (E110 messages)."""
    if k.is_any():
        return "any"
    if len(k.names) == 1:
        return f"the exact type {k.display()}"
    return f"one of {k.display()}"


#: functions whose table-level ``fallible`` bit is purely
#: argument-kind-driven: the reference's compile refines them to
#: infallible when the argument kind rules the failure out
#: (unnest.rs type_def; to_*'s coercion TypeDefs)
_ARG_REFINED = {
    "unnest": frozenset(()),
    "to_int": frozenset(("string", "regex", "array", "object")),
    "to_float": frozenset(("string", "regex", "array", "object")),
    "to_bool": frozenset(("string", "timestamp", "regex", "array",
                          "object")),
    "to_string": frozenset(("regex", "array", "object")),
}

_NC = object()     # non-constant sentinel


class _Halt(Exception):
    """Statement compilation aborted after a hard diagnostic
    (the reference's Option::None propagation)."""


class _ArgCtx:
    """InvalidArgumentErrorContext (function_call.rs:26-33)."""

    __slots__ = ("function_ident", "abort", "arguments_fmt", "param_kw",
                 "param_kinds", "got", "argument_fmt", "expr_span",
                 "argument_span")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _owned(segs) -> str:
    """OwnedValuePath Display: no leading dot (assignment.rs solution
    notes render `foo.bar` as `foobar` via this quirk)."""
    out = []
    for s in segs:
        if isinstance(s, str):
            out.append(("." if out else "") + s)
        else:
            out.append(f"[{s}]")
    return "".join(out)


def _target_display(tgt) -> str:
    k = tgt[0]
    if k == "var":
        return tgt[1]
    if k == "varpath":
        return tgt[1] + _owned(tgt[2])
    if k == "path":
        base = "." if tgt[1] == "event" else "%"
        return base + _owned(tgt[2])
    return "_"


def _value_display(v) -> str:
    """Reference Value Display (used in E403 `received:` labels)."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, dict):
        inner = ", ".join(f'"{k}": {_value_display(x)}'
                          for k, x in v.items())
        return "{ " + inner + " }"
    if isinstance(v, list):
        return "[" + ", ".join(_value_display(x) for x in v) + "]"
    if hasattr(v, "pattern"):
        return f"r'{v.pattern}'"
    return str(v)


#: redact filter validation (stdlib/redact.rs Filter::try_from)
def _redact_filter_err(v):
    if isinstance(v, dict):
        if "type" not in v:
            return "filters specified as objects must have type parameter"
        t = v["type"]
        if not isinstance(t, str):
            return "type key in filters must be a string"
        if t == "us_social_security_number":
            return None
        if t == "pattern":
            if "patterns" not in v:
                return "pattern filter must have `patterns` specified"
            pats = v["patterns"]
            if not isinstance(pats, list):
                return "`patterns` must be array of regular expression literals"
            for p in pats:
                if not (isinstance(p, str) or hasattr(p, "pattern")):
                    return "`patterns` must be regular expressions"
            return None
        return "unknown filter name"
    if isinstance(v, str):
        if v == "pattern":
            return "pattern cannot be used without arguments"
        if v == "us_social_security_number":
            return None
        return "unknown filter name"
    if hasattr(v, "pattern"):
        return None
    return "unknown literal for filter, must be a regex, filter name, or object"


def _rust_regex_error(pattern: str, err: Exception) -> str:
    """Map the Python `regex` module's compile error onto the Rust
    regex crate's flattened phrasing (literal.rs:295-313)."""
    msg = str(err)
    if "unterminated character set" in msg or "missing ]" in msg:
        # the Rust snippet is the offending portion; for an unclosed
        # class that starts the run at the `[`
        at = pattern[pattern.index("["):] if "[" in pattern else pattern
        return f"unclosed character class: {at}"
    if "unbalanced parenthesis" in msg or "missing )" in msg:
        return f"unclosed group: {pattern}"
    if "nothing to repeat" in msg:
        return f"repetition operator missing expression: {pattern}"
    return f"{msg.split(' at position')[0]}: {pattern}"


_TS_CHARS = frozenset("0123456789-+:.TZz ")


def _chrono_ts_error(s: str) -> str:
    if any(c not in _TS_CHARS for c in s):
        return "input contains invalid characters"
    return "premature end of input"


class _DiagPass:
    def __init__(self, src: str):
        self.src = src
        self.diags: list = []
        self.pending: list = []          # [(span, _ArgCtx | None)]
        self.vars: dict = {}             # name -> DK (flat scope:
        # the reference's LocalEnv persists block-local definitions,
        # scoping_undefined_variable.vrl pins this)
        self.consts: dict = {}           # name -> constant value | _NC
        self.event = DK.root_object()
        self.meta = DK.root_object()
        self.parser = None

    # --- entry ---
    def run(self) -> list:
        try:
            self.parser = Parser(self.src)
            stmts = self.parser.parse_program()
        except ParseError as e:
            d = getattr(e, "diag", None)
            if d is None and self.parser is not None and self.parser.diags:
                return list(self.parser.diags)
            return [d] if d is not None else []
        if self.parser.diags:
            # parse-level recovery diagnostics (E203/E205/E650)
            # suppress the semantic pass, as in the reference where
            # these abort the affected statements
            return list(self.parser.diags)
        for s in stmts:
            self.pending.clear()
            try:
                self.stmt(s)
            except _Halt:
                pass
            for span, ctx in self.pending:
                self.diags.append(self._pending_diag(span, ctx))
            self.pending.clear()
        return self.diags

    # --- plumbing ---
    def span(self, node):
        return self.parser.spans.get(id(node), (0, 0))

    def metaof(self, node):
        return self.parser.meta.get(id(node), {})

    def _emit(self, diag):
        self.diags.append(diag)

    def _consume(self, pre):
        del self.pending[pre:]

    def _pending_diag(self, span, ctx):
        if ctx is None:
            return Diagnostic(100, "unhandled error", [
                Label("expression can result in runtime error", span),
                Label.context(
                    "handle the error case to ensure runtime success",
                    span)],
                notes=[NOTE_SEE_ERROR_DOCS])
        return self._invalid_arg_diag(ctx)

    def _invalid_arg_diag(self, ctx: _ArgCtx) -> Diagnostic:
        declared = _decl_dk(ctx.param_kinds)
        labels = [
            Label(f"this expression resolves to {_kind_str(ctx.got)}",
                  ctx.expr_span),
            Label.context(
                f'but the parameter "{ctx.param_kw}" expects '
                f"{_kind_str(declared)}", ctx.argument_span)]
        notes = []
        guard_coerce = {
            "string": ("string", 'to_string({a}) ?? "default"'),
            "integer": ("int", "to_int({a}) ?? 0"),
            "float": ("float", "to_float({a}) ?? 0"),
            "boolean": ("bool", "to_bool({a}) ?? false"),
            "object": ("object", None),
            "array": ("array", None),
            "timestamp": ("timestamp", "to_unix_timestamp({a}) ?? now()"),
        }
        for name in ("string", "integer", "float", "boolean", "object",
                     "array", "timestamp"):
            if name in ctx.param_kinds:
                fn, coerce = guard_coerce[name]
                a = ctx.argument_fmt
                bang = "!" if ctx.abort else ""
                call = (f"{ctx.function_ident}{bang}"
                        f"({', '.join(ctx.arguments_fmt)})")
                notes += note_solution(
                    "ensuring an appropriate type at runtime",
                    [f"{a} = {fn}!({a})", call])
                if coerce:
                    notes += note_solution(
                        "coercing to an appropriate type and specifying a "
                        "default value as a fallback in case coercion fails",
                        [f"{a} = {coerce.format(a=a)}", call])
                break
        notes.append(NOTE_SEE_ERROR_DOCS)
        return Diagnostic(110, "invalid argument type", labels, notes)

    # --- statements ---
    def stmt(self, s):
        k = s[0] if isinstance(s, tuple) else None
        if k == "assign":
            self._assign(s)
        elif k == "abort":
            self._abort(s)
        elif k == "return":
            pre = len(self.pending)
            self.compile_expr(s[1])
            self._consume(pre)
        else:
            self.compile_expr(s)

    # --- expression dispatch with the pending-stack wrapper
    # (compiler.rs:182-230) ---
    def compile_expr(self, node):
        pre = len(self.pending)
        k, f = self._expr(node)
        if f and len(self.pending) == pre:
            self.pending.append((self.span(node), None))
        return k, f

    def _expr(self, node):
        k = node[0]
        if k == "lit":
            v = node[1]
            if v is None:
                return DK.prim("null"), False
            if v is True or v is False:
                return DK.prim("boolean"), False
            if isinstance(v, bool):
                return DK.prim("boolean"), False
            if isinstance(v, int):
                return DK.prim("integer"), False
            if isinstance(v, float):
                return DK.prim("float"), False
            return DK.prim("string"), False
        if k == "regex":
            try:
                _regex.compile(node[1])
            except _regex.error as e:
                self._emit(Diagnostic(
                    101, "invalid regular expression",
                    [Label("regex parse error: "
                           + _rust_regex_error(node[1], e),
                           self.span(node))],
                    notes=[note_see_docs("regular expressions",
                                         "regular-expression")]))
                raise _Halt()
            return DK.prim("regex"), False
        if k == "ts":
            s = node[1]
            try:
                datetime.fromisoformat(s.replace("Z", "+00:00"))
            except ValueError:
                self._emit(Diagnostic(
                    601, "invalid timestamp",
                    [Label("invalid timestamp format: "
                           + _chrono_ts_error(s), self.span(node))],
                    notes=[note_see_docs("timestamps", "timestamp")]))
                raise _Halt()
            return DK.prim("timestamp"), False
        if k == "path":
            root = self.event if node[1] == "event" else self.meta
            return root.at_path(node[2]), False
        if k == "var":
            return self._variable(node)
        if k == "index":
            bk, bf = self.compile_expr(node[1])
            return bk.at_path(node[2]), bf
        if k == "array":
            known = {}
            f = False
            for i, it in enumerate(node[1]):
                ik, itf = self.compile_expr(it)
                known[i] = ik
                f = f or itf
            return DK(("array",), arr_known=known), f
        if k == "object":
            known = {}
            f = False
            for key, vexpr in node[1]:
                vk, vf = self.compile_expr(vexpr)
                known[key] = vk
                f = f or vf
            return DK(("object",), obj_known=known), f
        if k == "not":
            return self._not(node)
        if k == "binop":
            return self._binop(node)
        if k == "call":
            return self._call(node)
        if k == "if":
            return self._if(node)
        if k == "block":
            kk, ff = DK.prim("null"), False
            for st in node[1]:
                if isinstance(st, tuple) and st[0] in ("assign", "abort",
                                                       "return"):
                    self.stmt(st)
                    kk, ff = DK.any(), False
                else:
                    kk, ff = self.compile_expr(st)
            return kk, ff
        if k == "assign":
            # assignment in expression position: its value is the rhs
            self._assign(node)
            return DK.any(), False
        if k == "abort":
            self._abort(node)
            return DK(("undefined",), precise=False), False
        if k == "return":
            pre = len(self.pending)
            self.compile_expr(node[1])
            self._consume(pre)
            return DK(("undefined",), precise=False), False
        return DK.any(), False

    def _variable(self, node):
        name = node[1]
        if name in self.vars:
            return self.vars[name], False
        candidates = list(self.vars) + ["null", "true", "false"]
        labels = [Label("undefined variable", self.span(node))]
        guess = best_guess(name, candidates)
        if guess is not None:
            labels.append(Label.context(f'did you mean "{guess}"?',
                                        self.span(node)))
        self._emit(Diagnostic(701, "call to undefined variable", labels))
        raise _Halt()

    def _not(self, node):
        inner = node[1]
        ik, inf = self.compile_expr(inner)
        if ik.precise and not ik.is_exactly("boolean"):
            m = self.metaof(node)
            not_span = m.get("bang", self.span(node))
            self._emit(Diagnostic(
                660, "non-boolean negation",
                [Label("negation only works on boolean values", not_span),
                 Label.context(
                     f"this expression resolves to {ik.display()}",
                     self.span(inner))],
                notes=[NOTE_COERCE,
                       note_func_docs("type coercion", "#coerce-functions")]))
            raise _Halt()
        return DK.prim("boolean"), inf

    def _binop(self, node):
        _, op, l, r = node
        pre = len(self.pending)
        lk, lf = self.compile_expr(l)
        if op == "??":
            # `??` consumes lhs fallibility (compiler.rs:465-467)
            self._consume(pre)
            rk, rf = self.compile_expr(r)
            if not lf:
                m = self.metaof(node)
                self._consume(pre)
                self._emit(Diagnostic(
                    651, "unnecessary error coalescing operation",
                    [Label("this expression can't fail", self.span(l)),
                     Label.context("this expression never resolves",
                                   self.span(r)),
                     Label.context("remove this error coalescing operation",
                                   m.get("op_span", self.span(node)))]))
                raise _Halt()
            if not rf:
                self._consume(pre)
            return lk.union(rk), rf
        rk, rf = self.compile_expr(r)
        if op == "|":
            bad = []
            if lk.precise and not lk.is_exactly("object"):
                bad.append(self.span(l))
            if rk.precise and not rk.is_exactly("object"):
                bad.append(self.span(r))
            if bad:
                self._consume(pre)
                self._emit(Diagnostic(
                    652, "only objects can be merged",
                    [Label("this expression must resolve to an object", s)
                     for s in bad]))
                raise _Halt()
            return lk.union(rk), lf or rf
        if op in ("==", "!="):
            return DK.prim("boolean"), lf or rf
        if op in ("<", "<=", ">", ">="):
            return DK.prim("boolean"), lf or rf
        if op in ("&&", "||"):
            return DK.prim("boolean") if op == "&&" else lk.union(rk), \
                lf or rf
        if op in ("/", "%"):
            rhs_lit_nonzero = (r[0] == "lit"
                               and isinstance(r[1], (int, float))
                               and not isinstance(r[1], bool)
                               and r[1] != 0)
            return DK.prim("float" if op == "/" else "integer"), \
                lf or rf or not rhs_lit_nonzero
        # + - *
        numeric = frozenset(("integer", "float"))
        both_num = lk.names <= numeric and rk.names <= numeric
        both_str = (op == "+" and lk.is_exactly("string")
                    and rk.is_exactly("string"))
        certain = lk.precise and rk.precise
        fallible = lf or rf or (certain and not (both_num or both_str))
        out = DK(lk.names | rk.names,
                 precise=certain) if both_num else (
            DK.prim("string") if both_str
            else DK(("integer", "float", "string"), precise=False))
        return out, fallible

    def _if(self, node):
        _, arms, else_block = node
        for cond, body in arms:
            pre = len(self.pending)
            ck, cf = self.compile_expr(cond)
            # the predicate consumes its own fallibility
            # (compiler.rs:419-446)
            self._consume(pre)
            if not cf and ck.precise and not ck.is_exactly("boolean"):
                self._emit(Diagnostic(
                    102, "non-boolean predicate",
                    [Label("this predicate must resolve to a boolean",
                           self.span(cond)),
                     Label.context(f"instead it resolves to {ck.display()}",
                                   self.span(cond))],
                    notes=[NOTE_COERCE,
                           note_see_docs("if expressions", "if")]))
                raise _Halt()
            self.compile_expr(body)
        if else_block is not None:
            self.compile_expr(else_block)
        return DK.any(), False

    # --- abort (expression/abort.rs) ---
    def _abort(self, node):
        msg = node[1]
        if msg is None:
            return
        pre = len(self.pending)
        mk, mf = self.compile_expr(msg)
        self._consume(pre)     # abort consumes (compiler.rs:899)
        espan = self.span(msg)
        if mf:
            self._emit(Diagnostic(
                631, "unhandled fallible expression",
                [Label("abort only accepts an infallible expression "
                       "argument", espan),
                 Label.context("handle errors before using the expression "
                               "as an abort message", espan)],
                notes=[NOTE_SEE_ERROR_DOCS]))
            raise _Halt()
        if mk.precise and not mk.is_exactly("string"):
            self._emit(Diagnostic(
                113, "non-string abort message",
                [Label("abort only accepts an expression argument "
                       "resolving to a string", espan),
                 Label.context(
                     f"this expression resolves to {mk.display()}", espan)],
                notes=[NOTE_COERCE,
                       note_func_docs("type coercion",
                                      "#coerce-functions")]))
            raise _Halt()

    # --- assignment (expression/assignment.rs) ---
    def _assign(self, s):
        _, targets, op, expr = s
        m = self.metaof(s)
        tspans = m.get("tspans", [(0, 0)] * len(targets))
        pre = len(self.pending)
        espan = self.span(expr)

        if op == "|=":
            tk = self._target_kind(targets[0])
            ek, ef = self.compile_expr(expr)
            bad = []
            if tk.precise and not tk.is_exactly("object"):
                bad.append(tspans[0])
            if ek.precise and not ek.is_exactly("object"):
                bad.append(espan)
            if bad:
                self._consume(pre)
                self._emit(Diagnostic(
                    652, "only objects can be merged",
                    [Label("this expression must resolve to an object", sp)
                     for sp in bad]))
                raise _Halt()
            rhs_kind, expr_display = tk.union(ek), ast_display(expr)
        else:
            rhs_kind, _ef = self.compile_expr(expr)
            expr_display = ast_display(expr)

        entry = self.pending[pre] if len(self.pending) > pre else None

        if len(targets) == 1:
            tgt = targets[0]
            tspan = tspans[0]
            assignment_span = (tspan[0], max(tspan[0], espan[0] - 1))
            if entry is not None:
                self._fallible_assignment(tgt, tspan, expr, espan,
                                          assignment_span, entry[1],
                                          expr_display)
                # not reached
            self._verify_overwritable(tgt, tspan, expr, pre)
            self._apply_target(tgt, rhs_kind, expr, op)
            self._consume(pre)
            return

        # infallible form: ok, err = expr
        ok_t, err_t = targets[0], targets[1]
        ok_span, err_span = tspans[0], tspans[1]
        if entry is None:
            self._emit(Diagnostic(
                104, "unnecessary error assignment",
                [Label("this error assignment is unnecessary", err_span),
                 Label.context("because this expression can't fail", espan),
                 Label.context(
                     f"use: {_target_display(ok_t)} = {expr_display}",
                     ok_span)],
                notes=[NOTE_SEE_ERROR_DOCS]))
            raise _Halt()
        self._consume(pre)
        self._verify_overwritable(ok_t, ok_span, expr, pre)
        loose = DK(rhs_kind.names, rhs_kind.obj_known, rhs_kind.obj_unknown,
                   rhs_kind.arr_known, rhs_kind.arr_unknown, False)
        self._apply_target(ok_t, loose, expr, op)
        self._apply_target(err_t, DK(("string", "null"), precise=False),
                           None, op)

    def _fallible_assignment(self, tgt, tspan, expr, espan,
                             assignment_span, ctx, expr_display):
        """E103 (assignment.rs FallibleAssignment labels)."""
        target_display = _target_display(tgt)
        labels = [Label(
            "this expression is fallible because at least one argument's "
            "type cannot be verified to be valid", espan)]
        helper = "update the expression to be infallible by adding a `!`"
        if ctx is not None:
            if not ctx.arguments_fmt:
                labels.append(Label(helper, espan))
            else:
                declared = _decl_dk(ctx.param_kinds)
                labels.append(Label(
                    f"`{ctx.arguments_fmt[0]}` argument type is "
                    f"`{ctx.got.display()}` and this function expected a "
                    f"parameter `{ctx.param_kw}` of type "
                    f"`{declared.display()}`", espan))
                fixed = expr_display.replace(ctx.function_ident,
                                             ctx.function_ident + "!")
                labels.append(Label(f"{helper}: `{fixed}`", espan))
        labels += [
            Label.context("or change this to an infallible assignment:",
                          assignment_span),
            Label.context(f"{target_display}, err = {expr_display}",
                          assignment_span)]
        self._emit(Diagnostic(
            103, "unhandled fallible assignment", labels,
            notes=[NOTE_SEE_ERROR_DOCS, NOTE_FUNC_CHARACTERISTICS]))
        self.pending.clear()
        raise _Halt()

    def _target_kind(self, tgt) -> DK:
        k = tgt[0]
        if k == "var":
            return self.vars.get(tgt[1], DK(("undefined",)))
        if k == "varpath":
            return self.vars.get(tgt[1], DK.any()).at_path(tgt[2])
        if k == "path":
            root = self.event if tgt[1] == "event" else self.meta
            return root.at_path(tgt[2])
        return DK.any()

    def _verify_overwritable(self, tgt, tspan, expr, pre):
        """E642 walk (assignment.rs verify_overwritable:225-305):
        pop segments back-to-front, checking each parent kind."""
        k = tgt[0]
        if k == "var":
            segs, root, is_var, name = [], None, True, tgt[1]
        elif k == "varpath":
            name = tgt[1]
            segs = list(tgt[2])
            root = self.vars.get(name, DK.any())
            is_var = True
        elif k == "path":
            name = None
            segs = list(tgt[2])
            root = self.event if tgt[1] == "event" else self.meta
            is_var = False
        else:
            return
        if not segs:
            return
        path = list(segs)
        parent_span = tspan
        remainder = ""
        while path:
            last = path.pop()
            parent_kind = root.at_path(path)
            if isinstance(last, str):
                seg_str = last
                seg_start = max(0, parent_span[1] - len(seg_str))
                seg_span = (seg_start, parent_span[1])
                parent_span = (parent_span[0], max(0, seg_start - 1))
                remainder = "." + seg_str + remainder
                variant = "object"
                valid = (not parent_kind.precise
                         or parent_kind.contains("object"))
            else:
                seg_str = f"[{last}]"
                seg_start = max(0, parent_span[1] - len(seg_str))
                seg_span = (seg_start, parent_span[1])
                parent_span = (parent_span[0], seg_start)
                remainder = seg_str + remainder
                variant = "array"
                valid = (not parent_kind.precise
                         or parent_kind.contains("array"))
            if valid:
                continue
            if is_var:
                parent_str = name + _owned(path)
            else:
                if not path and remainder.startswith("."):
                    remainder = remainder[1:]
                parent_str = "." + _owned(path)
            seed = "{}" if variant == "object" else "[]"
            notes = note_solution(
                f"change parent value to {variant}, before assignment",
                [f"{parent_str} = {seed}",
                 f"{parent_str}{remainder} = {ast_display(expr)}"])
            notes.append(NOTE_SEE_ERROR_DOCS)
            msg = ("querying a field of a non-object type is unsupported"
                   if variant == "object"
                   else "indexing into a non-array type is unsupported")
            self._emit(Diagnostic(
                642, "parent path segment rejects this mutation",
                [Label(msg, seg_span),
                 Label.context("this path resolves to a value of type "
                               f"{parent_kind.display()}", parent_span)],
                notes=notes))
            self._consume(pre)
            raise _Halt()

    def _apply_target(self, tgt, kind: DK, expr, op):
        k = tgt[0]
        if k == "var":
            self.vars[tgt[1]] = kind
            self.consts[tgt[1]] = (self._const(expr)
                                   if expr is not None and op == "="
                                   else _NC)
        elif k == "varpath":
            base = self.vars.get(tgt[1], DK.any())
            self.vars[tgt[1]] = base.insert(tgt[2], kind)
            self.consts[tgt[1]] = _NC
        elif k == "path":
            if tgt[1] == "event":
                self.event = self.event.insert(tgt[2], kind)
            else:
                self.meta = self.meta.insert(tgt[2], kind)

    def _const(self, node):
        """Constant resolution (Expression::resolve_constant) for the
        static-argument checks; returns _NC when not static."""
        if node is None:
            return _NC
        k = node[0]
        if k == "lit":
            return node[1]
        if k == "regex":
            try:
                return _regex.compile(node[1])
            except _regex.error:
                return _NC
        if k == "array":
            out = []
            for it in node[1]:
                v = self._const(it)
                if v is _NC:
                    return _NC
                out.append(v)
            return out
        if k == "object":
            out = {}
            for key, vexpr in node[1]:
                v = self._const(vexpr)
                if v is _NC:
                    return _NC
                out[key] = v
            return out
        if k == "var":
            return self.consts.get(node[1], _NC)
        return _NC

    # --- function calls (function_call.rs Builder) ---
    def _call(self, node):
        _, name, bang, args, closure = node[:5]
        call_span = node[5] if len(node) > 5 and node[5] else \
            self.span(node)
        m = self.metaof(node)
        ident_span = m.get("ident_span", call_span)
        kw_spans = m.get("kw_spans", [None] * len(args))

        pre = len(self.pending)
        infos = []
        for i, (aname, aexpr) in enumerate(args):
            if closure is not None and aexpr is None:
                continue
            ak, af = self.compile_expr(aexpr)
            infos.append((aname, aexpr, ak, af, i))

        spec = STDLIB_TYPEDEFS.get(name)
        known = spec is not None or self._known_fn(name)
        if not known:
            self._consume(pre)
            labels = [Label("undefined function", ident_span)]
            guess = best_guess(name, REF_FN_IDENTS)
            if guess is not None:
                labels.append(Label.context(f'did you mean "{guess}"?',
                                            ident_span))
            self._emit(Diagnostic(105, "call to undefined function",
                                  labels, notes=[]))
            raise _Halt()

        if closure is not None:
            # compile the closure body with parameters in scope;
            # stay permissive beyond that
            params, body = closure
            saved = {p: self.vars.get(p) for p in params}
            for p in params:
                self.vars[p] = DK.any()
            try:
                self.compile_expr(body)
            except _Halt:
                pass
            finally:
                for p, v in saved.items():
                    if v is None:
                        self.vars.pop(p, None)
                    else:
                        self.vars[p] = v
            self._consume(pre)
            return DK.any(), False

        if spec is None:
            self._consume(pre)
            return DK.any(), False

        params = spec["args"]
        if len(infos) > len(params):
            self._consume(pre)
            first = infos[0]
            last = infos[-1]
            start = (kw_spans[first[4]][0]
                     if kw_spans[first[4]] else self.span(first[1])[0])
            args_span = (start, self.span(last[1])[1])
            mx = len(params)
            arg_word = "argument" if mx == 1 else "arguments"
            self._emit(Diagnostic(
                106, "wrong number of function arguments",
                [Label("too many function arguments", args_span),
                 Label.context(
                     f"this function takes a maximum of {mx} {arg_word}",
                     args_span)],
                notes=[note_see_docs("function arguments", "arguments")]))
            raise _Halt()

        index = 0
        supplied = set()
        unknown_validity = None
        for (aname, aexpr, ak, af, i) in infos:
            if aname is None:
                param = params[index] if index < len(params) else None
                index += 1
            else:
                param = next((p for p in params if p[0] == aname), None)
                if param is None:
                    self._consume(pre)
                    kws = ", ".join(f'"{p[0]}"' for p in params)
                    self._emit(Diagnostic(
                        108, "unknown function argument keyword",
                        [Label("unknown keyword",
                               kw_spans[i] or self.span(aexpr)),
                         Label.context("this function accepts the "
                                       f"following keywords: {kws}",
                                       ident_span)],
                        notes=[]))
                    raise _Halt()
                pos = params.index(param)
                if pos == index:
                    index += 1
            if param is None:
                continue
            supplied.add(param[0])
            declared = param[1]
            if "any" not in declared and ak.precise:
                inter = ak.names & frozenset(declared)
                subset = ak.names <= frozenset(declared)
                arg_span = kw_spans[i] or self.span(aexpr)
                ctx = _ArgCtx(
                    function_ident=name, abort=bang,
                    arguments_fmt=[
                        ((f"{an}: " if an else "") + ast_display(ae))
                        for an, ae, *_ in infos],
                    param_kw=param[0], param_kinds=declared, got=ak,
                    argument_fmt=((f"{aname}: " if aname else "")
                                  + ast_display(aexpr)),
                    expr_span=self.span(aexpr), argument_span=arg_span)
                if not inter:
                    self._consume(pre)
                    self._emit(self._invalid_arg_diag(ctx))
                    raise _Halt()
                if not subset and unknown_validity is None:
                    # re-point arguments_fmt[0] at the offending
                    # argument (function_call.rs:458-479 uses the
                    # *argument*'s display in the E103 message)
                    ctx.arguments_fmt = ([ctx.argument_fmt]
                                         + [x for x in ctx.arguments_fmt
                                            if x != ctx.argument_fmt])
                    unknown_validity = ctx
            if af:
                self._consume(pre)
                es = self.span(aexpr)
                self._emit(Diagnostic(
                    630, "fallible argument",
                    [Label("this expression can fail", es),
                     Label.context("handle the error before passing it "
                                   "in as an argument", es)],
                    notes=[NOTE_SEE_ERROR_DOCS]))
                raise _Halt()

        for i, p in enumerate(params):
            if p[2] and p[0] not in supplied:
                self._consume(pre)
                self._emit(Diagnostic(
                    107, "missing function argument",
                    [Label(f'required argument missing: "{p[0]}" '
                           f"(position {i})", call_span)],
                    notes=[]))
                raise _Halt()

        self._consume(pre)

        if name == "redact":
            self._redact_compile(infos, params, call_span, pre)

        intrinsic = bool(spec.get("fallible"))
        certain = True
        refine = _ARG_REFINED.get(name)
        if refine is not None and infos:
            ak = infos[0][2]
            # argument-kind-driven fallibility (the reference's
            # per-function type_def refinement: unnest.rs, the to_*
            # coercions) — fail open on imprecise kinds, which also
            # makes the call "possibly fallible" for the E620 check
            if ak.precise:
                intrinsic = bool(ak.names & refine)
            else:
                intrinsic = False
                certain = False
        if bang and unknown_validity is None and not intrinsic and certain:
            self._emit(Diagnostic(
                620, "can't abort infallible function",
                [Label("this function can't fail", ident_span),
                 Label.context("remove this abort (!) instruction",
                               (ident_span[1], ident_span[1] + 1))],
                notes=[NOTE_SEE_ERROR_DOCS], severity="warning"))

        if unknown_validity is not None and not bang:
            self.pending.append((call_span, unknown_validity))

        fallible = (intrinsic or unknown_validity is not None) and not bang
        return self._ret_kind(name, args), fallible

    def _known_fn(self, name) -> bool:
        try:
            from ..functions import REGISTRY
        except Exception:
            return False
        return name in REGISTRY or name in ("assert", "assert_eq",
                                            "unnest", "del", "exists",
                                            "type_def")

    def _ret_kind(self, name, args) -> DK:
        if name == "parse_json":
            return DK.json()
        if name in ("parse_regex_all", "parse_regex") and len(args) >= 2:
            pat = args[1][1]
            if pat is not None and pat[0] == "regex":
                groups = _regex.findall(r"\(\?P?<([A-Za-z_][\w]*)>",
                                        pat[1])
                field = DK(("string", "undefined"))
                obj = DK(("object",),
                         obj_known={g: field for g in groups})
                if name == "parse_regex":
                    return obj
                return DK(("array",), arr_unknown=obj)
        spec = STDLIB_TYPEDEFS.get(name, {})
        names = tuple(n for n in spec.get("ret", ("any",)) if n != "any")
        if not names or "any" in spec.get("ret", ()):
            return DK.any()
        k = DK(names, precise=False)
        return k

    def _redact_compile(self, infos, params, call_span, pre):
        """redact's compile-time filter validation → E610 wrapping
        E403 (stdlib/redact.rs Filter::try_from via
        function_call.rs Compilation error remapping)."""
        fexpr = None
        index = 0
        for (aname, aexpr, _ak, _af, _i) in infos:
            if aname == "filters" or (aname is None and index == 1):
                fexpr = aexpr
            if aname is None:
                index += 1
        if fexpr is None or fexpr[0] != "array":
            return
        for item in fexpr[1]:
            v = self._const(item)
            if v is _NC:
                continue
            err = _redact_filter_err(v)
            if err is None:
                continue
            self._consume(pre)
            self._emit(Diagnostic(
                610, "function compilation error: error[E403] "
                     "invalid argument",
                [Label('invalid argument "filters"', call_span),
                 Label.context(f"received: {_value_display(v)}", call_span),
                 Label.context(f"error: {err}", call_span)],
                notes=[note_code_docs(403)]))
            raise _Halt()


def collect_diagnostics(src: str) -> list:
    """All compile-time diagnostics (errors and warnings) for ``src``,
    in reference order. Empty list = clean compile."""
    return _DiagPass(src).run()


def render_diagnostics(src: str) -> str:
    """The reference's rendered diagnostic text for ``src``
    (empty string when the program compiles clean)."""
    return render_list(collect_diagnostics(src), src)
