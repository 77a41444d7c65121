"""Recursive-descent parser for the VRL expression subset.

Grammar follows /root/reference/src/parser/parser.lalrpop (operator
set ast.rs:708-723; expression variants ast.rs:225-237). AST nodes are
plain tuples: ('lit', v) ('regex', src) ('ts', src) ('path', prefix,
segs) ('var', name) ('array', items) ('object', pairs) ('call', name,
bang, args, closure) ('binop', op, l, r) ('not', e) ('if', arms,
else_block) ('block', stmts) ('assign', targets, op, expr)
('abort', expr|None) ('return', expr) ('index', expr, segs).
"""

from __future__ import annotations

from .lexer import tokenize, Token, LexError


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, src: str):
        try:
            self.toks = tokenize(src)
        except LexError as e:
            raise ParseError(str(e)) from e
        self.i = 0

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
            self.next()
            msg = None
            if self.peek().kind not in ("EOF", "SEMI", "RBRACE", "NL"):
                msg = self.parse_expr()
            return ("abort", msg)
        if self.peek().kind == "RETURN":
            self.next()
            return ("return", self.parse_expr())
        # try assignment (backtracking)
        save = self.i
        asgn = self._try_assignment()
        if asgn is not None:
            return asgn
        self.i = save
        return self.parse_expr()

    def _try_assignment(self):
        targets = []
        while True:
            t = self._try_target()
            if t is None:
                return None
            targets.append(t)
            if not self.accept("COMMA"):
                break
        op = None
        if self.accept("ASSIGN"):
            op = "="
        elif self.accept("OP", "|="):
            op = "|="
        else:
            return None
        self.skip_nl()
        expr = self.parse_expr()
        return ("assign", targets, op, expr)

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
            name = self.next().value
            if name == "_":
                return ("discard",)
            segs = self._parse_path_continuation()
            if segs:
                return ("varpath", name, segs)
            return ("var", name)
        return None

    # --- expressions (precedence per ast.rs:708-723) ---
    def parse_expr(self):
        return self.parse_err()

    def parse_err(self):
        left = self.parse_or()
        while self.accept("OP", "??"):
            self.skip_nl()
            right = self.parse_or()
            left = ("binop", "??", left, right)
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.accept("OP", "||"):
            self.skip_nl()
            left = ("binop", "||", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_eq()
        while self.accept("OP", "&&"):
            self.skip_nl()
            left = ("binop", "&&", left, self.parse_eq())
        return left

    def parse_eq(self):
        left = self.parse_cmp()
        while True:
            if self.accept("OP", "=="):
                self.skip_nl()
                left = ("binop", "==", left, self.parse_cmp())
            elif self.accept("OP", "!="):
                self.skip_nl()
                left = ("binop", "!=", left, self.parse_cmp())
            else:
                return left

    def parse_cmp(self):
        left = self.parse_merge()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in (">", ">=", "<", "<="):
                self.next()
                self.skip_nl()
                left = ("binop", t.value, left, self.parse_merge())
            else:
                return left

    def parse_merge(self):
        left = self.parse_add()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value == "|":
                # not a closure delimiter: merge operator
                self.next()
                self.skip_nl()
                left = ("binop", "|", left, self.parse_add())
            else:
                return left

    def parse_add(self):
        left = self.parse_mul()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in ("+", "-"):
                self.next()
                self.skip_nl()
                left = ("binop", t.value, left, self.parse_mul())
            else:
                return left

    def parse_mul(self):
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value in ("*", "/", "%"):
                self.next()
                self.skip_nl()
                left = ("binop", t.value, left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        if self.accept("OP", "!"):
            return ("not", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        segs = self._parse_path_continuation()
        if segs:
            return ("index", e, segs)
        return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return ("lit", t.value)
        if t.kind == "REGEX":
            self.next()
            return ("regex", t.value)
        if t.kind == "TIMESTAMP":
            self.next()
            return ("ts", t.value)
        if t.kind in ("INT", "FLOAT"):
            self.next()
            return ("lit", t.value)
        if t.kind == "TRUE":
            self.next()
            return ("lit", True)
        if t.kind == "FALSE":
            self.next()
            return ("lit", False)
        if t.kind == "NULL":
            self.next()
            return ("lit", None)
        if t.kind == "OP" and t.value == "-":
            self.next()
            inner = self.parse_unary()
            return ("binop", "-", ("lit", 0), inner)
        if t.kind == "OP" and t.value == ".":
            return self._parse_path()
        if t.kind == "PERCENT_PATH":
            return self._parse_path()
        if t.kind == "ABORT":
            # `abort` in expression position (block/abort_check.vrl)
            self.next()
            return ("abort", None)
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
            return ("var", t.value)
        raise ParseError(f"unexpected token {t.kind} {t.value!r} at {t.pos}")

    # --- compound forms ---
    def _parse_array(self):
        self.expect("LBRACKET")
        items = []
        self.skip_nl()
        while not self.accept("RBRACKET"):
            items.append(self.parse_expr())
            self.skip_nl()
            if not self.accept("COMMA"):
                self.expect("RBRACKET")
                break
            self.skip_nl()
        return ("array", items)

    def _parse_object_or_block(self):
        # object: `{ "key": ... }` or `{}`; else block
        j = 1
        while self.peek(j).kind == "NL":
            j += 1
        if (self.peek(j).kind == "STRING" and self.peek(j + 1).kind == "COLON") \
                or self.peek(j).kind == "RBRACE":
            self.expect("LBRACE")
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
            return ("object", pairs)
        return self._parse_braced_block()

    def _parse_if(self):
        self.expect("IF")
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
        return ("if", arms, else_block)

    def _parse_braced_block(self):
        self.skip_nl()
        self.expect("LBRACE")
        stmts = []
        self.skip_nl()
        while not self.accept("RBRACE"):
            stmts.append(self.parse_statement())
            while self.accept("SEMI") or self.accept("NL"):
                pass
        return ("block", stmts)

    def _parse_call(self):
        name_tok = self.expect("IDENT")
        name = name_tok.value
        bang = bool(self.accept("OP", "!"))
        self.expect("LPAREN")
        args = []
        end_pos = None
        self.skip_nl()
        while True:
            rp = self.accept("RPAREN")
            if rp is not None:
                end_pos = rp.pos + 1
                break
            if self.peek().kind in ("IDENT", "NULL", "TRUE", "FALSE", "IF",
                                    "ELSE") and self.peek(1).kind == "COLON":
                aname = str(self.next().value)
                self.next()  # colon
                self.skip_nl()
                args.append((aname, self.parse_expr()))
            else:
                args.append((None, self.parse_expr()))
            self.skip_nl()
            if not self.accept("COMMA"):
                rp = self.expect("RPAREN")
                end_pos = rp.pos + 1
                break
            self.skip_nl()
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
        return ("call", name, bang, args, closure,
                (name_tok.pos, end_pos))

    def _parse_path(self):
        prefix = "event"
        if self.accept("PERCENT_PATH"):
            prefix = "meta"
            if self.peek().kind == "IDENT":
                name = self.next().value
                segs = [name] + self._parse_path_continuation()
                return ("path", prefix, segs)
            # bare `%` = whole metadata
            return ("path", prefix, [])
        self.expect("OP", ".")
        t = self.peek()
        if t.kind == "IDENT" or t.kind == "STRING" or t.kind in (
                "IF", "ELSE", "TRUE", "FALSE", "NULL", "RETURN", "ABORT"):
            self.next()
            segs = [str(t.value)] + self._parse_path_continuation()
            return ("path", prefix, segs)
        if t.kind == "LPAREN":
            # coalesced field `.(a|b)` — take first alternative
            self.next()
            first = self.expect("IDENT").value
            while self.accept("OP", "|"):
                self.expect("IDENT")
            self.expect("RPAREN")
            segs = [first] + self._parse_path_continuation()
            return ("path", prefix, segs)
        # bare `.` = whole event
        return ("path", prefix, [])

    def _parse_path_continuation(self) -> list:
        segs: list = []
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value == "." and self.peek(1).kind in (
                    "IDENT", "STRING", "IF", "ELSE", "TRUE", "FALSE", "NULL",
                    "RETURN", "ABORT"):
                self.next()
                segs.append(str(self.next().value))
                continue
            if t.kind == "LBRACKET" and self.peek(1).kind == "INT" and \
                    self.peek(2).kind == "RBRACKET":
                self.next()
                segs.append(int(self.next().value))
                self.next()
                continue
            return segs


def parse(src: str) -> list:
    """Parse VRL source into a statement list."""
    return Parser(src).parse_program()
