"""Recursive-descent parser for the VRL expression subset.

Grammar follows /root/reference/src/parser/parser.lalrpop (operator
set ast.rs:708-723; expression variants ast.rs:225-237). AST nodes are
plain tuples: ('lit', v) ('regex', src) ('ts', src) ('path', prefix,
segs) ('var', name) ('array', items) ('object', pairs) ('call', name,
bang, args, closure) ('binop', op, l, r) ('not', e) ('if', arms,
else_block) ('block', stmts) ('assign', targets, op, expr)
('abort', expr|None) ('return', expr) ('index', expr, segs).

Positions: every expression node's source span is recorded in
``Parser.spans`` keyed by ``id(node)`` (nodes stay alive inside the
returned AST, so ids are stable); ``Parser.meta`` holds per-node
details diagnostics need (operator/keyword/segment spans).
``Parser.diags`` collects parse-level diagnostics the reference
reports with recovery — E650 chained comparison, E205 reserved
keyword, E203 unexpected end of query path (parser.lalrpop error
recovery; lex.rs reserved idents).
"""

from __future__ import annotations

from .lexer import tokenize, Token, LexError
from .diagnostics import Diagnostic, Label, RESERVED_IDENTS, note_see_docs


class ParseError(ValueError):
    def __init__(self, msg, diag=None):
        super().__init__(msg)
        self.diag = diag


class Parser:
    def __init__(self, src: str):
        self.src = src
        try:
            self.toks = tokenize(src)
        except LexError as e:
            err = ParseError(str(e))
            if e.code is not None:
                err.diag = Diagnostic(e.code, e.title,
                                      [Label(e.label, e.span)])
            raise err from e
        self.i = 0
        self.spans: dict = {}
        self.meta: dict = {}
        self.diags: list = []
        self._diag_spans: set = set()
        self._last_segspans: list = []

    # --- token helpers ---
    def peek(self, off=0) -> Token:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, value=None):
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            return self.next()
        return None

    def expect(self, kind, value=None) -> Token:
        t = self.accept(kind, value)
        if t is None:
            raise ParseError(
                f"expected {kind}{'' if value is None else ' ' + repr(value)}, "
                f"got {self.peek().kind} {self.peek().value!r} at {self.peek().pos}")
        return t

    def skip_nl(self):
        while self.peek().kind == "NL":
            self.next()

    def _last_end(self) -> int:
        return self.toks[self.i - 1].end if self.i else 0

    def _rec(self, node, start):
        if isinstance(node, tuple):
            self.spans[id(node)] = (start, self._last_end())
        return node

    def _diag(self, diag: Diagnostic):
        key = (diag.code, diag.labels[0].start)
        if key not in self._diag_spans:
            self._diag_spans.add(key)
            self.diags.append(diag)

    # --- program ---
    def parse_program(self) -> list:
        stmts = []
        self.skip_nl()
        while self.peek().kind != "EOF":
            stmts.append(self.parse_statement())
            while self.accept("SEMI") or self.accept("NL"):
                pass
        return stmts

    def parse_statement(self):
        if self.peek().kind == "ABORT":
            kw = self.next()
            msg = None
            if self.peek().kind not in ("EOF", "SEMI", "RBRACE", "NL"):
                msg = self.parse_expr()
            node = ("abort", msg)
            self.spans[id(node)] = (kw.pos, self._last_end())
            self.meta[id(node)] = {"kw": (kw.pos, kw.end)}
            return node
        if self.peek().kind == "RETURN":
            kw = self.next()
            node = ("return", self.parse_expr())
            self.spans[id(node)] = (kw.pos, self._last_end())
            return node
        # try assignment (backtracking)
        save = self.i
        asgn = self._try_assignment()
        if asgn is not None:
            return asgn
        self.i = save
        return self.parse_expr()

    def _try_assignment(self):
        start = self.peek().pos
        targets = []
        tspans = []
        while True:
            tstart = self.peek().pos
            t = self._try_target()
            if t is None:
                return None
            targets.append(t)
            tspans.append((tstart, self._last_end()))
            if not self.accept("COMMA"):
                break
        op = None
        op_tok = self.accept("ASSIGN")
        if op_tok is not None:
            op = "="
        else:
            op_tok = self.accept("OP", "|=")
            if op_tok is not None:
                op = "|="
            else:
                return None
        self.skip_nl()
        estart = self.peek().pos
        expr = self.parse_expr()
        node = ("assign", targets, op, expr)
        self.spans[id(node)] = (start, self._last_end())
        self.meta[id(node)] = {
            "tspans": tspans, "op_span": (op_tok.pos, op_tok.end),
            "expr_span": (estart, self._last_end())}
        return node

    def _try_target(self):
        t = self.peek()
        if t.kind == "OP" and t.value == ".":
            return self._parse_path()
        if t.kind == "PERCENT_PATH":
            return self._parse_path()
        if t.kind == "IDENT":
            # variable target, possibly var.path — but NOT a function call
            if self.peek(1).kind == "LPAREN":
                return None
            tok = self.next()
            name = tok.value
            if name in RESERVED_IDENTS:
                self._reserved(tok)
            if name == "_":
                return ("discard",)
            segs = self._parse_path_continuation()
            if segs:
                node = ("varpath", name, segs)
                self.meta[id(node)] = {
                    "name_span": (tok.pos, tok.end),
                    "segspans": list(self._last_segspans)}
                return node
            node = ("var", name)
            self.spans[id(node)] = (tok.pos, tok.end)
            return node
        return None

    def _reserved(self, tok):
        """E205 (lex.rs:220-226): reserved identifier outside
        function-call position."""
        self._diag(Diagnostic(205, "reserved keyword", [
            Label("this identifier name is reserved for future use "
                  "in the language", (tok.pos, tok.end)),
            Label.context("use a different name instead",
                          (tok.pos, tok.end))]))

    # --- expressions (precedence per ast.rs:708-723) ---
    def parse_expr(self):
        start = self.peek().pos
        return self._rec(self.parse_err(), start)

    def parse_err(self):
        start = self.peek().pos
        left = self._rec(self.parse_or(), start)
        while True:
            op_tok = self.accept("OP", "??")
            if op_tok is None:
                return left
            self.skip_nl()
            rstart = self.peek().pos
            right = self._rec(self.parse_or(), rstart)
            left = ("binop", "??", left, right)
            self._rec(left, start)
            self.meta[id(left)] = {"op_span": (op_tok.pos, op_tok.end)}

    def parse_or(self):
        start = self.peek().pos
        left = self._rec(self.parse_and(), start)
        while self.accept("OP", "||"):
            self.skip_nl()
            rstart = self.peek().pos
            left = ("binop", "||", left,
                    self._rec(self.parse_and(), rstart))
            self._rec(left, start)
        return left

    def parse_and(self):
        start = self.peek().pos
        left = self._rec(self.parse_eq(), start)
        while self.accept("OP", "&&"):
            self.skip_nl()
            rstart = self.peek().pos
            left = ("binop", "&&", left,
                    self._rec(self.parse_eq(), rstart))
            self._rec(left, start)
        return left

    def _chained_cmp(self, op_tok):
        """E650 (op.rs ChainedComparison): second comparison operator
        at the same precedence level."""
        self._diag(Diagnostic(
            650, "comparison operators can't be chained together",
            [Label("", (op_tok.pos, op_tok.end))],
            notes=[note_see_docs("comparisons", "comparison")]))

    def parse_eq(self):
        start = self.peek().pos
        left = self._rec(self.parse_cmp(), start)
        seen = False
        while True:
            op_tok = self.peek()
            if op_tok.kind == "OP" and op_tok.value in ("==", "!="):
                self.next()
                if seen:
                    self._chained_cmp(op_tok)
                seen = True
                self.skip_nl()
                rstart = self.peek().pos
                left = ("binop", op_tok.value, left,
                        self._rec(self.parse_cmp(), rstart))
                self._rec(left, start)
            else:
                return left

    def parse_cmp(self):
        start = self.peek().pos
        left = self._rec(self.parse_merge(), start)
        seen = False
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in (">", ">=", "<", "<="):
                self.next()
                if seen:
                    self._chained_cmp(t)
                seen = True
                self.skip_nl()
                rstart = self.peek().pos
                left = ("binop", t.value, left,
                        self._rec(self.parse_merge(), rstart))
                self._rec(left, start)
            else:
                return left

    def parse_merge(self):
        start = self.peek().pos
        left = self._rec(self.parse_add(), start)
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value == "|":
                # not a closure delimiter: merge operator
                self.next()
                self.skip_nl()
                rstart = self.peek().pos
                left = ("binop", "|", left,
                        self._rec(self.parse_add(), rstart))
                self._rec(left, start)
            else:
                return left

    def parse_add(self):
        start = self.peek().pos
        left = self._rec(self.parse_mul(), start)
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in ("+", "-"):
                self.next()
                self.skip_nl()
                rstart = self.peek().pos
                left = ("binop", t.value, left,
                        self._rec(self.parse_mul(), rstart))
                self._rec(left, start)
            else:
                return left

    def parse_mul(self):
        start = self.peek().pos
        left = self._rec(self.parse_unary(), start)
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in ("*", "/", "%"):
                self.next()
                self.skip_nl()
                rstart = self.peek().pos
                left = ("binop", t.value, left,
                        self._rec(self.parse_unary(), rstart))
                self._rec(left, start)
            else:
                return left

    def parse_unary(self):
        bang = self.accept("OP", "!")
        if bang is not None:
            node = ("not", self.parse_unary())
            self.spans[id(node)] = (bang.pos, self._last_end())
            self.meta[id(node)] = {"bang": (bang.pos, bang.end)}
            return node
        return self.parse_postfix()

    def parse_postfix(self):
        start = self.peek().pos
        e = self._rec(self.parse_primary(), start)
        segs = self._parse_path_continuation()
        if segs:
            node = ("index", e, segs)
            self._rec(node, start)
            self.meta[id(node)] = {"segspans": list(self._last_segspans)}
            return node
        return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return self._rec(("lit", t.value), t.pos)
        if t.kind == "TSTRING":
            # "{{ var }}" template: rewrite to concatenated strings of
            # literal segments and VARIABLE reads (template_string.rs
            # rewrite_to_concatenated_strings, compiler.rs:240-249) —
            # field paths do NOT interpolate; a non-string variable
            # errors like any string concat
            self.next()
            expr = None
            for kind, val in t.value:
                node = ("lit", val) if kind == "lit" else ("var", val)
                node = self._rec(node, t.pos)
                expr = node if expr is None else \
                    self._rec(("binop", "+", expr, node), t.pos)
            if expr is None:
                expr = self._rec(("lit", ""), t.pos)
            return expr
        if t.kind == "REGEX":
            self.next()
            return self._rec(("regex", t.value), t.pos)
        if t.kind == "TIMESTAMP":
            self.next()
            return self._rec(("ts", t.value), t.pos)
        if t.kind in ("INT", "FLOAT"):
            self.next()
            return self._rec(("lit", t.value), t.pos)
        if t.kind == "TRUE":
            self.next()
            return self._rec(("lit", True), t.pos)
        if t.kind == "FALSE":
            self.next()
            return self._rec(("lit", False), t.pos)
        if t.kind == "NULL":
            self.next()
            return self._rec(("lit", None), t.pos)
        if t.kind == "OP" and t.value == "-":
            self.next()
            inner = self.parse_unary()
            return self._rec(("binop", "-", ("lit", 0), inner), t.pos)
        if t.kind == "OP" and t.value == ".":
            return self._parse_path()
        if t.kind == "PERCENT_PATH":
            return self._parse_path()
        if t.kind == "ABORT":
            # `abort` in expression position (block/abort_check.vrl)
            self.next()
            return self._rec(("abort", None), t.pos)
        if t.kind == "LPAREN":
            # group: one or more statements (`;`/newline separated) —
            # multiline predicates are statement groups
            # (if_statement/multiline_predicates.vrl)
            self.next()
            stmts = []
            self.skip_nl()
            while not self.accept("RPAREN"):
                stmts.append(self.parse_statement())
                while self.accept("SEMI") or self.accept("NL"):
                    pass
            if len(stmts) == 1 and stmts[0][0] == "binop":
                return stmts[0]
            return ("block", stmts)
        if t.kind == "LBRACKET":
            return self._parse_array()
        if t.kind == "LBRACE":
            return self._parse_object_or_block()
        if t.kind == "IF":
            return self._parse_if()
        if t.kind == "IDENT":
            if self.peek(1).kind == "LPAREN" or (
                self.peek(1).kind == "OP" and self.peek(1).value == "!"
                and self.peek(2).kind == "LPAREN"
            ):
                return self._parse_call()
            self.next()
            if t.value in RESERVED_IDENTS:
                self._reserved(t)
            return self._rec(("var", t.value), t.pos)
        raise ParseError(f"unexpected token {t.kind} {t.value!r} at {t.pos}")

    # --- compound forms ---
    def _parse_array(self):
        start = self.expect("LBRACKET").pos
        items = []
        self.skip_nl()
        while not self.accept("RBRACKET"):
            items.append(self.parse_expr())
            self.skip_nl()
            if not self.accept("COMMA"):
                self.expect("RBRACKET")
                break
            self.skip_nl()
        return self._rec(("array", items), start)

    def _parse_object_or_block(self):
        # object: `{ "key": ... }` or `{}`; else block
        j = 1
        while self.peek(j).kind == "NL":
            j += 1
        if (self.peek(j).kind == "STRING" and self.peek(j + 1).kind == "COLON") \
                or self.peek(j).kind == "RBRACE":
            start = self.expect("LBRACE").pos
            pairs = []
            self.skip_nl()
            while not self.accept("RBRACE"):
                k = self.expect("STRING").value
                self.expect("COLON")
                self.skip_nl()
                pairs.append((k, self.parse_expr()))
                self.skip_nl()
                if not self.accept("COMMA"):
                    self.expect("RBRACE")
                    break
                self.skip_nl()
            return self._rec(("object", pairs), start)
        return self._parse_braced_block()

    def _parse_if(self):
        start = self.expect("IF").pos
        arms = []
        cond = self.parse_expr()
        body = self._parse_braced_block()
        arms.append((cond, body))
        else_block = None
        while True:
            save = self.i
            self.skip_nl()
            if not self.accept("ELSE"):
                self.i = save
                break
            self.skip_nl()
            if self.peek().kind == "IF":
                self.next()
                c = self.parse_expr()
                b = self._parse_braced_block()
                arms.append((c, b))
            else:
                else_block = self._parse_braced_block()
                break
        return self._rec(("if", arms, else_block), start)

    def _parse_braced_block(self):
        self.skip_nl()
        start = self.expect("LBRACE").pos
        stmts = []
        self.skip_nl()
        while not self.accept("RBRACE"):
            stmts.append(self.parse_statement())
            while self.accept("SEMI") or self.accept("NL"):
                pass
        return self._rec(("block", stmts), start)

    def _parse_call(self):
        name_tok = self.expect("IDENT")
        name = name_tok.value
        bang_tok = self.accept("OP", "!")
        bang = bang_tok is not None
        self.expect("LPAREN")
        args = []
        kw_spans = []
        end_pos = None
        self.skip_nl()
        args_start = self.peek().pos
        while True:
            rp = self.accept("RPAREN")
            if rp is not None:
                end_pos = rp.pos + 1
                break
            if self.peek().kind in ("IDENT", "NULL", "TRUE", "FALSE", "IF",
                                    "ELSE") and self.peek(1).kind == "COLON":
                kw_tok = self.next()
                aname = str(kw_tok.value)
                kw_spans.append((kw_tok.pos, kw_tok.end))
                self.next()  # colon
                self.skip_nl()
                args.append((aname, self.parse_expr()))
            else:
                kw_spans.append(None)
                args.append((None, self.parse_expr()))
            self.skip_nl()
            if not self.accept("COMMA"):
                rp = self.expect("RPAREN")
                end_pos = rp.pos + 1
                break
            self.skip_nl()
        args_end = rp.pos
        closure = None
        if self.accept("OP", "->"):
            self.expect("OP", "|")
            params = [self.expect("IDENT").value]
            while self.accept("COMMA"):
                params.append(self.expect("IDENT").value)
            self.expect("OP", "|")
            body = self._parse_braced_block()
            closure = (params, body)
        # span of the call expression (reference diagnostics carry it:
        # `function call error for "f" at (start:end): ...`)
        node = ("call", name, bang, args, closure,
                (name_tok.pos, end_pos))
        self.spans[id(node)] = (name_tok.pos, end_pos)
        self.meta[id(node)] = {
            "ident_span": (name_tok.pos, name_tok.end),
            "bang_span": (bang_tok.pos, bang_tok.end) if bang else None,
            "args_span": (args_start, args_end),
            "kw_spans": kw_spans}
        return node

    def _parse_path(self):
        prefix = "event"
        start = self.peek().pos
        pp = self.accept("PERCENT_PATH")
        if pp is not None:
            prefix = "meta"
            if self.peek().kind == "IDENT":
                tok = self.next()
                segspans = [(tok.pos, tok.end)]
                segs = [tok.value] + self._parse_path_continuation()
                segspans += self._last_segspans
                node = ("path", prefix, segs)
                self._rec(node, start)
                self.meta[id(node)] = {"segspans": segspans}
                return node
            # bare `%` = whole metadata
            return self._rec(("path", prefix, []), start)
        self.expect("OP", ".")
        t = self.peek()
        if t.kind == "IDENT" or t.kind == "STRING" or t.kind in (
                "IF", "ELSE", "TRUE", "FALSE", "NULL", "RETURN", "ABORT"):
            self.next()
            segspans = [(t.pos, t.end)]
            segs = [str(t.value)] + self._parse_path_continuation()
            segspans += self._last_segspans
            node = ("path", prefix, segs)
            self._rec(node, start)
            self.meta[id(node)] = {"segspans": segspans}
            return node
        if t.kind == "LPAREN":
            # coalesced field `.(a|b)` — take first alternative
            self.next()
            first = self.expect("IDENT").value
            while self.accept("OP", "|"):
                self.expect("IDENT")
            self.expect("RPAREN")
            segs = [first] + self._parse_path_continuation()
            return self._rec(("path", prefix, segs), start)
        # bare `.` = whole event
        return self._rec(("path", prefix, []), start)

    def _end_of_path(self, dot_tok):
        """E203 (parser.lalrpop error recovery, UnrecognizedToken):
        a query path's trailing `.` with no following segment."""
        self._diag(Diagnostic(203, "syntax error", [
            Label("unexpected end of query path",
                  (dot_tok.pos, dot_tok.end)),
            Label.context(
                'expected one of: "identifier", "path field", '
                '"string literal", "abort", "return"',
                (dot_tok.pos, dot_tok.end))]))

    def _parse_path_continuation(self) -> list:
        segs: list = []
        segspans: list = []
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value == ".":
                nxt = self.peek(1)
                if nxt.kind in ("IDENT", "STRING", "IF", "ELSE", "TRUE",
                                "FALSE", "NULL", "RETURN", "ABORT"):
                    self.next()
                    seg_tok = self.next()
                    segs.append(str(seg_tok.value))
                    segspans.append((seg_tok.pos, seg_tok.end))
                    continue
                if t.pos == self._last_end() and t.pos > 0 and \
                        nxt.kind in ("EOF", "NL", "SEMI", "RBRACE",
                                     "RPAREN", "RBRACKET", "COMMA"):
                    # `.foo.` — dot glued to the path, no segment after
                    self.next()
                    self._end_of_path(t)
                    continue
                self._last_segspans = segspans
                return segs
            if t.kind == "LBRACKET" and self.peek(1).kind == "INT" and \
                    self.peek(2).kind == "RBRACKET":
                self.next()
                segs.append(int(self.next().value))
                rb = self.next()
                segspans.append((t.pos, rb.end))
                continue
            self._last_segspans = segspans
            return segs


def parse(src: str) -> list:
    """Parse VRL source into a statement list."""
    return Parser(src).parse_program()
