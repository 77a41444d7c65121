"""match_datadog_query — Datadog log-search syntax over an event.

Reference: match_datadog_query.rs (2,023 LoC; grammar
src/datadog/search/grammar.rs, evaluator src/datadog/filter/). This is
VRL's native predicate/routing-condition form (SURVEY §2.2) — route
stages compile these to row masks.

Supported surface:
- boolean operators: OR, AND (implicit on adjacency), NOT / ``-``,
  parentheses
- bare terms: whole-token full-text match on the ``message`` field,
  with ``*``/``?`` wildcards
- ``@attr:value`` facets: event attribute paths (dot notation), with
  wildcards, quoted strings, numeric comparison (``>``, ``>=``, ``<``,
  ``<=``) and ranges ``[a TO b]`` (inclusive) / ``{a TO b}``
  (exclusive)
- ``key:value`` tag search over the ``tags`` array
- ``_exists_:field`` / ``_missing_:field``
- ``*`` matches everything
"""

from __future__ import annotations

import re as _re
from typing import Any, Optional

from ..value import VrlError

__all__ = ["match_datadog_query"]


# ---------------------------------------------------------------------------
# tokenizer

_TERM_RX = _re.compile(
    r"""
    \s*(?:
      (?P<lparen>\() |
      (?P<rparen>\)) |
      (?P<op>\bOR\b|\bAND\b|\bNOT\b) |
      (?P<minus>-) |
      (?P<term>
        (?:(?P<attr>@?[A-Za-z0-9_][\w.@-]*)\s*:)?
        (?P<value>
            "(?:[^"\\]|\\.)*" |
            [\[{][^\]}]*[\]}] |
            [<>]=?\s*[^\s()]+ |
            [^\s():]+
        )
      )
    )""", _re.X)


def _tokenize(q: str):
    toks = []
    i = 0
    while i < len(q):
        if q[i].isspace():
            i += 1
            continue
        m = _TERM_RX.match(q, i)
        if not m or m.end() == i:
            raise VrlError(f"unable to parse datadog query at {i}: {q[i:]!r}")
        if m.group("lparen"):
            toks.append(("(", None))
        elif m.group("rparen"):
            toks.append((")", None))
        elif m.group("op"):
            toks.append((m.group("op"), None))
        elif m.group("minus"):
            toks.append(("NOT", None))
        else:
            toks.append(("TERM", (m.group("attr"), m.group("value"))))
        i = m.end()
    return toks


# ---------------------------------------------------------------------------
# parser → AST: ("or", a, b) | ("and", a, b) | ("not", a) | ("term", attr, value)

class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        e = self.or_()
        if self.i != len(self.toks):
            raise VrlError("unable to parse datadog query: trailing tokens")
        return e

    def or_(self):
        left = self.and_()
        while self.peek() == "OR":
            self.take()
            left = ("or", left, self.and_())
        return left

    def and_(self):
        left = self.unary()
        while True:
            p = self.peek()
            if p == "AND":
                self.take()
                left = ("and", left, self.unary())
            elif p in ("TERM", "(", "NOT"):
                left = ("and", left, self.unary())
            else:
                return left

    def unary(self):
        p = self.peek()
        if p == "NOT":
            self.take()
            return ("not", self.unary())
        if p == "(":
            self.take()
            e = self.or_()
            if self.peek() != ")":
                raise VrlError("unable to parse datadog query: missing )")
            self.take()
            return e
        if p == "TERM":
            _, (attr, value) = self.take()
            return ("term", attr, value)
        raise VrlError("unable to parse datadog query")


# ---------------------------------------------------------------------------
# evaluation

def _unquote(v: str) -> str:
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return _re.sub(r"\\(.)", r"\1", v[1:-1])
    return v


def _wild_rx(pat: str, whole: bool = True) -> "_re.Pattern":
    out = []
    for c in pat:
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        else:
            out.append(_re.escape(c))
    body = "".join(out)
    return _re.compile(f"^{body}$" if whole else body)


def _num(v) -> Optional[float]:
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _get_path(event: dict, path: str):
    cur: Any = event
    for seg in path.split("."):
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return None
    return cur


def _match_scalar(actual, spec: str) -> bool:
    if actual is None:
        return False
    if isinstance(actual, bool):
        actual = "true" if actual else "false"
    if spec == "*":
        return True
    # range
    if spec and spec[0] in "[{" and spec[-1] in "]}":
        inner = spec[1:-1]
        m = _re.match(r'\s*("?[^"\s]*"?)\s+TO\s+("?[^"\s]*"?)\s*$', inner)
        if not m:
            raise VrlError(f"invalid range: {spec}")
        lo, hi = _unquote(m.group(1)), _unquote(m.group(2))
        incl_lo, incl_hi = spec[0] == "[", spec[-1] == "]"
        a_num, lo_num, hi_num = _num(actual), _num(lo), _num(hi)
        if a_num is not None and lo_num is not None and hi_num is not None:
            ok_lo = a_num >= lo_num if incl_lo else a_num > lo_num
            ok_hi = a_num <= hi_num if incl_hi else a_num < hi_num
            return ok_lo and ok_hi
        s = str(actual)
        ok_lo = (s >= lo) if incl_lo else (s > lo)
        ok_hi = (s <= hi) if incl_hi else (s < hi)
        return (lo == "*" or ok_lo) and (hi == "*" or ok_hi)
    # comparison
    m = _re.match(r"([<>]=?)\s*(.+)$", spec)
    if m:
        op, rhs = m.group(1), _unquote(m.group(2))
        a_num, r_num = _num(actual), _num(rhs)
        if a_num is None or r_num is None:
            a_cmp, r_cmp = str(actual), rhs
            res = {"<": a_cmp < r_cmp, "<=": a_cmp <= r_cmp,
                   ">": a_cmp > r_cmp, ">=": a_cmp >= r_cmp}
        else:
            res = {"<": a_num < r_num, "<=": a_num <= r_num,
                   ">": a_num > r_num, ">=": a_num >= r_num}
        return res[op]
    pat = _unquote(spec)
    a_num, p_num = _num(actual), _num(pat)
    if a_num is not None and p_num is not None and not _re.search(r"[*?]", pat):
        return a_num == p_num
    return bool(_wild_rx(pat).match(str(actual)))


def _match_value(actual, spec: str) -> bool:
    if isinstance(actual, list):
        return any(_match_scalar(a, spec) for a in actual)
    return _match_scalar(actual, spec)


def _eval(node, event: dict) -> bool:
    kind = node[0]
    if kind == "or":
        return _eval(node[1], event) or _eval(node[2], event)
    if kind == "and":
        return _eval(node[1], event) and _eval(node[2], event)
    if kind == "not":
        return not _eval(node[1], event)
    _, attr, value = node

    if attr is None:
        if value == "*":
            return True
        # full-text whole-token search on message
        msg = event.get("message")
        if msg is None:
            return False
        pat = _unquote(value)
        body = _wild_rx(pat, whole=False).pattern
        return bool(_re.search(rf"(?<!\w){body}(?!\w)", str(msg)))

    if attr == "_exists_":
        field = _unquote(value)
        if field.startswith("@"):
            return _get_path(event, field[1:]) is not None
        tags = event.get("tags") or []
        return any(str(t).split(":", 1)[0] == field for t in tags) \
            or _get_path(event, field) is not None
    if attr == "_missing_":
        return not _eval(("term", "_exists_", value), event)

    if attr.startswith("@"):
        return _match_value(_get_path(event, attr[1:]), value)

    # tag search: entries "key:value" in the tags array (bare key too)
    tags = event.get("tags") or []
    key = attr
    vals = []
    for t in tags:
        s = str(t)
        if s == key:
            vals.append("")
        elif s.startswith(key + ":"):
            vals.append(s[len(key) + 1:])
    if vals:
        return any(_match_scalar(v, value) for v in vals)
    return False


# ---------------------------------------------------------------------------
# vectorized evaluation: AST → boolean mask over an Arrow batch
# (the route-stage fast path; the row evaluator above is the oracle)


class NotVectorizableQuery(Exception):
    pass


def _vec_term(attr: Optional[str], value: str, batch) -> "Any":
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(batch)
    if attr is None or not attr.startswith("@"):
        # full-text / tag terms need row semantics
        raise NotVectorizableQuery("full-text or tag term")
    field = attr[1:]
    if "." in field or field not in batch.column_names:
        raise NotVectorizableQuery(f"attribute {field}")
    col = batch[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()

    if value == "*":
        return pc.is_valid(col)
    m = _re.match(r"([<>]=?)\s*(.+)$", value)
    if m:
        op, rhs = m.group(1), _unquote(m.group(2))
        r = _num(rhs)
        if r is None:
            raise NotVectorizableQuery("non-numeric comparison")
        kernel = {"<": pc.less, "<=": pc.less_equal,
                  ">": pc.greater, ">=": pc.greater_equal}[op]
        return pc.fill_null(kernel(pc.cast(col, pa.float64()), r), False)
    if value and value[0] in "[{" and value[-1] in "]}":
        mm = _re.match(r'\s*("?[^"\s]*"?)\s+TO\s+("?[^"\s]*"?)\s*$',
                       value[1:-1])
        if not mm:
            raise NotVectorizableQuery("range syntax")
        lo, hi = _unquote(mm.group(1)), _unquote(mm.group(2))
        lo_n, hi_n = _num(lo), _num(hi)
        if lo_n is None or hi_n is None:
            raise NotVectorizableQuery("non-numeric range")
        c = pc.cast(col, pa.float64())
        lo_ok = pc.greater_equal(c, lo_n) if value[0] == "[" else pc.greater(c, lo_n)
        hi_ok = pc.less_equal(c, hi_n) if value[-1] == "]" else pc.less(c, hi_n)
        return pc.fill_null(pc.and_(lo_ok, hi_ok), False)
    pat = _unquote(value)
    if _re.search(r"[*?]", pat):
        rx = _wild_rx(pat).pattern
        return pc.fill_null(
            pc.match_substring_regex(pc.cast(col, pa.string()), rx), False)
    p_num = _num(pat)
    if p_num is not None and str(col.type) in ("int64", "int32", "double",
                                               "float"):
        return pc.fill_null(pc.equal(pc.cast(col, pa.float64()), p_num),
                            False)
    if p_num is not None and pa.types.is_string(col.type):
        # row-matcher parity (_match_scalar): '@value:5' matches a
        # string '5.0' numerically. Arrow has no null-on-error cast,
        # so validate numeric strings with a regex, cast only those,
        # and fall back to string equality for the rest.
        is_num = pc.match_substring_regex(
            col, r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
        is_num = pc.fill_null(is_num, False)
        safe_strs = pc.if_else(is_num, col, pa.scalar("0", pa.string()))
        as_num = pc.cast(safe_strs, pa.float64())
        num_eq = pc.and_(is_num, pc.equal(as_num, p_num))
        str_eq = pc.and_(pc.invert(is_num), pc.equal(col, pat))
        return pc.fill_null(pc.or_(num_eq, str_eq), False)
    return pc.fill_null(pc.equal(pc.cast(col, pa.string()), pat), False)


def _vec_eval(node, batch):
    import pyarrow.compute as pc

    kind = node[0]
    if kind == "or":
        return pc.or_(_vec_eval(node[1], batch), _vec_eval(node[2], batch))
    if kind == "and":
        return pc.and_(_vec_eval(node[1], batch), _vec_eval(node[2], batch))
    if kind == "not":
        return pc.invert(_vec_eval(node[1], batch))
    _, attr, value = node
    return _vec_term(attr, value, batch)


def compile_query_mask(query: str):
    """Compile a Datadog query to ``fn(batch: pa.Table) -> BooleanArray``
    — vectorized route-condition evaluation (facet terms, numeric
    comparisons/ranges, wildcards, boolean ops). Raises
    :class:`NotVectorizableQuery` for full-text/tag terms; callers
    fall back to :func:`match_datadog_query` per row."""
    ast = _P(_tokenize(query)).parse()

    def run(batch):
        return _vec_eval(ast, batch)

    # validate the shape early on an empty batch with no columns is
    # impossible (needs the schema) — validation happens on first call
    return run


_QUERY_CACHE: dict[str, Any] = {}


def match_datadog_query(value: dict, query: str) -> bool:
    if not isinstance(value, dict):
        raise VrlError("match_datadog_query requires an object")
    ast = _QUERY_CACHE.get(query)
    if ast is None:
        ast = _P(_tokenize(query)).parse()
        _QUERY_CACHE[query] = ast
    return _eval(ast, value)
