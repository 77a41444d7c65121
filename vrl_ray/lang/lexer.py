"""VRL lexer (token subset of /root/reference/src/parser/lex.rs)."""

from __future__ import annotations

import re
from typing import NamedTuple


class Token(NamedTuple):
    kind: str
    value: object
    pos: int
    end: int = -1


class LexError(ValueError):
    """Lex failure; carries the reference's positioned diagnostic
    fields when the error class has one (lex.rs Error::labels):
    ``code``/``title``/``label``/``span``."""

    def __init__(self, msg, code=None, title=None, label=None, span=None):
        super().__init__(msg)
        self.code = code
        self.title = title
        self.label = label
        self.span = span


KEYWORDS = {"if", "else", "true", "false", "null", "abort", "return"}

_TWO_CHAR = ["??", "==", "!=", ">=", "<=", "&&", "||", "->", "|="]
_ONE_CHAR = list("{}[]()<>=+-*/%!|,;:.")

_NUM = re.compile(r"-?(?:\d[\d_]*\.\d[\d_]*|\d[\d_]*)")
#: `@` is legal in event-path fields (query/ampersat.vrl) — accepted
#: here context-free; the parser/semantics never produce @-names
#: outside paths
_IDENT = re.compile(r"[A-Za-z_@][A-Za-z0-9_@]*")
_WS = re.compile(r"[ \t]+")
_NL = re.compile(r"[\r\n]+")
_COMMENT = re.compile(r"#[^\n]*")


def _string(src: str, i: int, quote: str) -> tuple[str, int]:
    out = []
    start = i
    i += 1
    while i < len(src):
        c = src[i]
        if c == "\\":
            nxt = src[i + 1] if i + 1 < len(src) else ""
            if nxt == "\n":
                # line continuation: backslash-newline swallows the
                # newline AND the next line's leading whitespace
                # (lex.rs string-literal handling; literal/string.vrl)
                i += 2
                while i < len(src) and src[i] in " \t":
                    i += 1
                continue
            esc = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'",
                   "\\": "\\", "0": "\0", "{": "{", "}": "}"}.get(nxt)
            if esc is None:
                # lex.rs rejects unknown escapes (issues/6571);
                # E209 span = the escaped char (lex.rs:244-249)
                raise LexError(
                    f"invalid escape character: \\{nxt}", code=209,
                    title=f"invalid escape character: \\{nxt}",
                    label=f"invalid escape character: {nxt or 'none'}",
                    span=(i + 1, i + 2))
            out.append(esc); i += 2
            continue
        if c == quote:
            return "".join(out), i + 1
        out.append(c)
        i += 1
    raise LexError(f"unterminated string at {i}", code=207,
                   title="invalid string literal",
                   label="invalid string literal",
                   span=(start, start + 1))


def _scan_quoted_raw(src: str, i: int, quote: str) -> tuple[str, int, int]:
    """Find the closing quote WITHOUT unescaping; returns (raw body,
    body start, index past the close). Escapes are length-2 so the
    scan just skips the char after every backslash."""
    start = i
    i += 1
    body_start = i
    while i < len(src):
        c = src[i]
        if c == "\\":
            i += 2
            continue
        if c == quote:
            return src[body_start:i], body_start, i + 1
        i += 1
    raise LexError(f"unterminated string at {i}", code=207,
                   title="invalid string literal",
                   label="invalid string literal",
                   span=(start, start + 1))


def _template_segments(raw: str, base: int):
    """lex.rs template() (lex.rs:663-721): split a double-quoted
    string's RAW body into Literal / Template segments. `{{ ident }}`
    opens a template (inner text trimmed — it becomes a VARIABLE
    reference, template_string.rs rewrite_to_concatenated_strings);
    `\\{{` / `\\}}` escape literal braces. Returns None when the body
    holds no template (the common literal-string case)."""
    if "{{" not in raw:
        return None
    segments: list[tuple[str, str]] = []
    template = False
    current: list[str] = []
    cur_start = 0
    pos = 0
    n = len(raw)
    while pos < n:
        c = raw[pos]
        if c == "}" and template and pos + 1 < n and raw[pos + 1] == "}":
            if current:
                seg = "".join(current)
                current = []
                segments.append(("tpl", seg.strip()))
            template = False
            pos += 2
        elif c == "\\" and not template and raw[pos:pos + 3] == "\\{{":
            current.append("{{")
            pos += 3
        elif c == "\\" and not template and raw[pos:pos + 3] == "\\}}":
            current.append("}}")
            pos += 3
        elif c == "{" and not template and pos + 1 < n and raw[pos + 1] == "{":
            if current:
                seg = "".join(current)
                current = []
                segments.append(
                    ("lit", _unescape_body(seg, base + cur_start)))
            template = True
            pos += 2
        else:
            if not current:
                cur_start = pos
            current.append(c)
            pos += 1
    if current and not template:
        segments.append(("lit", _unescape_body("".join(current),
                                               base + cur_start)))
    return segments


def _unescape_body(body: str, base: int) -> str:
    """Unescape a raw double-quoted body slice (same table as
    _string); `base` keeps LexError spans absolute."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c == "\\":
            nxt = body[i + 1] if i + 1 < n else ""
            if nxt == "\n":
                i += 2
                while i < n and body[i] in " \t":
                    i += 1
                continue
            esc = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'",
                   "\\": "\\", "0": "\0", "{": "{", "}": "}"}.get(nxt)
            if esc is None:
                raise LexError(
                    f"invalid escape character: \\{nxt}", code=209,
                    title=f"invalid escape character: \\{nxt}",
                    label=f"invalid escape character: {nxt or 'none'}",
                    span=(base + i + 1, base + i + 2))
            out.append(esc)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _raw(src: str, i: int, err_pos: int) -> tuple[str, int]:
    # s'..' / r'..' / t'..' raw literal: only \' is an escape.
    # ``err_pos`` is where an unterminated literal is reported
    # (lex.rs Error::Literal start; see tokenize for the rule).
    quote = src[i]
    out = []
    i += 1
    while i < len(src):
        c = src[i]
        if c == "\\" and i + 1 < len(src) and src[i + 1] == quote:
            out.append(quote); i += 2
            continue
        if c == quote:
            return "".join(out), i + 1
        out.append(c); i += 1
    raise LexError(f"unterminated raw string at {i}", code=208,
                   title="invalid literal", label="invalid literal",
                   span=(err_pos, err_pos + 1))


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    open_parens = 0
    while i < n:
        m = _WS.match(src, i)
        if m:
            i = m.end(); continue
        m = _NL.match(src, i)
        if m:
            # newline = statement separator (parser skips where
            # insignificant); collapse runs
            if not toks or toks[-1].kind != "NL":
                toks.append(Token("NL", "\n", i, i + 1))
            i = m.end(); continue
        m = _COMMENT.match(src, i)
        if m:
            i = m.end(); continue
        c = src[i]
        # typed raw strings s'..' r'..' t'..'
        if c in "srt" and i + 1 < n and src[i + 1] == "'":
            # unterminated-literal position: the reference's direct
            # lexing reports the `s`/`r`/`t` char, while its LQuery
            # look-ahead scan (active inside call/query contexts)
            # reports the quote (lex.rs tests:1634-1636 vs 1852-1856);
            # open parens approximate "inside a scan context"
            err_pos = i + 1 if open_parens > 0 else i
            body, j = _raw(src, i + 1, err_pos)
            kind = {"s": "STRING", "r": "REGEX", "t": "TIMESTAMP"}[c]
            toks.append(Token(kind, body, i, j))
            i = j
            continue
        if c == '"' or c == "'":
            if c == '"':
                raw, body_start, j = _scan_quoted_raw(src, i, c)
                segs = _template_segments(raw, body_start)
                if segs is not None:
                    # template-scanned body. Exactly one Literal
                    # segment = a plain string (as_literal_string,
                    # template_string.rs:70-75 — "a {{" lexes to
                    # "a "); anything else desugars in the PARSER to
                    # concatenated variables (compiler.rs:240-249)
                    if len(segs) == 1 and segs[0][0] == "lit":
                        toks.append(Token("STRING", segs[0][1], i, j))
                    else:
                        toks.append(Token("TSTRING", segs, i, j))
                    i = j
                    continue
            body, j = _string(src, i, c)
            toks.append(Token("STRING", body, i, j))
            i = j
            continue
        if c.isascii() and c.isdigit() and toks and toks[-1].kind == "OP" \
                and toks[-1].value == ".":
            # digit-leading path field (`.0tar`, expressions/query/
            # mixed.vrl): after `.` a digits+letters run is a field
            m2 = re.match(r"[0-9][0-9A-Za-z_@]*", src[i:])
            if m2 and not m2.group(0).isdigit():
                toks.append(Token("IDENT", m2.group(0), i, i + m2.end()))
                i += m2.end()
                continue
        if (c.isascii() and c.isdigit()) or (
                c == "-" and i + 1 < n and src[i + 1].isascii()
                and src[i + 1].isdigit()
                           and toks and toks[-1].kind in
                           ("OP", "LPAREN", "LBRACKET", "LBRACE", "COMMA",
                            "COLON", "ASSIGN", "SEMI") ):
            m = _NUM.match(src, i)
            text = m.group(0).replace("_", "")
            if "." in text:
                toks.append(Token("FLOAT", float(text), i, m.end()))
            else:
                toks.append(Token("INT", int(text), i, m.end()))
            i = m.end()
            continue
        if c.isascii() and c.isdigit():
            m = _NUM.match(src, i)
            text = m.group(0).replace("_", "")
            toks.append(Token("FLOAT" if "." in text else "INT",
                              float(text) if "." in text else int(text),
                              i, m.end()))
            i = m.end()
            continue
        matched2 = next((t for t in _TWO_CHAR if src.startswith(t, i)), None)
        if matched2:
            toks.append(Token("OP", matched2, i, i + 2))
            i += 2
            continue
        m = _IDENT.match(src, i)
        if m:
            w = m.group(0)
            if w in KEYWORDS:
                toks.append(Token(w.upper(), w, i, m.end()))
            else:
                toks.append(Token("IDENT", w, i, m.end()))
            i = m.end()
            continue
        if c == "%":
            # `%` = metadata path unless it sits between two operands
            # (then it is the remainder operator) — lex.rs does the
            # same operand-context disambiguation
            prev = toks[-1].kind if toks else None
            operand_end = prev in ("INT", "FLOAT", "STRING", "REGEX",
                                   "TIMESTAMP", "IDENT", "RPAREN",
                                   "RBRACKET", "TRUE", "FALSE", "NULL")
            if not operand_end:
                toks.append(Token("PERCENT_PATH", "%", i, i + 1))
                i += 1
                continue
        if c in "{}[]()":
            kind = {"{": "LBRACE", "}": "RBRACE", "[": "LBRACKET",
                    "]": "RBRACKET", "(": "LPAREN", ")": "RPAREN"}[c]
            if kind == "LPAREN":
                open_parens += 1
            elif kind == "RPAREN":
                open_parens = max(0, open_parens - 1)
            toks.append(Token(kind, c, i, i + 1))
            i += 1
            continue
        if c == ",":
            toks.append(Token("COMMA", c, i, i + 1)); i += 1; continue
        if c == ";":
            toks.append(Token("SEMI", c, i, i + 1)); i += 1; continue
        if c == ":":
            toks.append(Token("COLON", c, i, i + 1)); i += 1; continue
        if c == "=":
            toks.append(Token("ASSIGN", c, i, i + 1)); i += 1; continue
        if c in "+-*/%<>!|.":
            toks.append(Token("OP", c, i, i + 1)); i += 1; continue
        raise LexError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", None, n, n))
    return toks
