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
        (?:(?P<attr>@?(?:\\"(?:[^"\\]|\\[^"])*\\"|"(?:[^"\\]|\\.)*"|
                       [A-Za-z0-9_][\w.@-]*))\s*:)?
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


# Field classification (src/datadog/search/field.rs): bare terms fan
# out over the DEFAULT_FIELDS; named fields are Default > Reserved >
# Tag; @-prefixed are Attributes.
_DD_DEFAULT_FIELDS = ("message", "custom.error.message",
                      "custom.error.stack", "custom.title", "_default_")
_DD_RESERVED = {"host", "source", "status", "service", "trace_id",
                "message", "timestamp", "tags"}


def _norm_fields(attr: Optional[str]):
    if attr is None or attr == "_default_":
        return [("default", f) for f in _DD_DEFAULT_FIELDS]
    name = attr
    is_attr = name.startswith("@")
    if is_attr:
        name = name[1:]
    # quoted field names, plain or backslash-escaped (@\"a-b\":1)
    if name.startswith('\\"') and name.endswith('\\"') and len(name) >= 4:
        name = name[2:-2]
    elif name.startswith('"') and name.endswith('"') and len(name) >= 2:
        name = _re.sub(r"\\(.)", r"\1", name[1:-1])
    if is_attr:
        return [("attr", name)]
    if name in _DD_DEFAULT_FIELDS:
        return [("default", name)]
    if name in _DD_RESERVED:
        return [("reserved", name)]
    return [("tag", name)]


def _string_value(v) -> str:
    """string_value (match_datadog_query.rs:453-458): bytes verbatim,
    everything else via Value Display."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float):
        from .coerce import _fmt_float
        return _fmt_float(v)
    if isinstance(v, (list, dict)):
        return ""  # Display of containers never matches term text
    return str(v)


def _word_rx(pat: str) -> "_re.Pattern":
    # filter/regex.rs word_regex: \b..\b, only '*' is a wildcard
    return _re.compile(r"\b" + _re.escape(pat).replace(r"\*", ".*") + r"\b")


def _wildcard_rx(pat: str) -> "_re.Pattern":
    return _re.compile("^" + _re.escape(pat).replace(r"\*", ".*") + "$")


def _cmp(op: str, lhs, rhs) -> bool:
    return {"<": lhs < rhs, "<=": lhs <= rhs,
            ">": lhs > rhs, ">=": lhs >= rhs}[op]


def _dd_compare(kind: str, field: str, actual, op: str, raw: str) -> bool:
    """compare (match_datadog_query.rs:309-420): attributes compare
    numerically only when BOTH sides are numeric (quoted bounds are
    strings); tags compare the value part of every `k:v` element; all
    other fields compare stringified."""
    quoted = len(raw) >= 2 and raw[0] == '"' and raw[-1] == '"'
    text = _unquote(raw)
    num = None if quoted else _num(text)
    if kind == "attr" and num is not None and \
            isinstance(actual, (int, float)) and not isinstance(actual, bool):
        return _cmp(op, float(actual), num)
    if kind == "tag":
        if not isinstance(actual, list):
            return False
        for t in actual:
            s = _string_value(t)
            if ":" in s and _cmp(op, s.split(":", 1)[1], text):
                return True
        return False
    return _cmp(op, _string_value(actual), text)


def _dd_exists(kind: str, field: str, event: dict) -> bool:
    if kind == "tag":
        tags = _get_path(event, "tags")
        if not isinstance(tags, list):
            return False
        return any(_string_value(t) == field
                   or _string_value(t).startswith(field + ":")
                   for t in tags)
    if kind == "reserved" and field == "tags":
        # match_datadog_query.rs:156-162 compares each element against
        # the whole array — always false; reproduced bug-for-bug
        return _has_path(event, "tags") and False
    return _has_path(event, field)


def _has_path(event: dict, path: str) -> bool:
    cur: Any = event
    for seg in path.split("."):
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return False
    return True


def _dd_term(kind: str, field: str, raw: str, event: dict) -> bool:
    path = "tags" if kind == "tag" else field
    # resolve_value: a missing path is false for every matcher
    if not _has_path(event, path):
        return False
    actual = _get_path(event, path)

    # ranges: [a TO b] / {a TO b}; * bounds degrade to one-sided
    # compares, both-* to exists (filter.rs range())
    if raw and raw[0] in "[{" and raw[-1] in "]}":
        m = _re.match(r'\s*("(?:[^"\\]|\\.)*"|[^\s]+)\s+TO\s+'
                      r'("(?:[^"\\]|\\.)*"|[^\s]+)\s*$', raw[1:-1])
        if not m:
            raise VrlError(f"invalid range: {raw}")
        lo_raw, hi_raw = m.group(1), m.group(2)
        lo_star = lo_raw == "*"
        hi_star = hi_raw == "*"
        if lo_star and hi_star:
            return _dd_exists(kind, field, event)
        ok = True
        if not lo_star:
            ok = ok and _dd_compare(kind, field, actual,
                                    ">=" if raw[0] == "[" else ">", lo_raw)
        if not hi_star:
            ok = ok and _dd_compare(kind, field, actual,
                                    "<=" if raw[-1] == "]" else "<", hi_raw)
        return ok

    # comparisons: >, >=, <, <=
    m = _re.match(r"([<>]=?)\s*(.+)$", raw)
    if m:
        return _dd_compare(kind, field, actual, m.group(1), m.group(2))

    if raw == "*":
        return _dd_exists(kind, field, event)

    pat = _unquote(raw)
    if "*" in pat:
        # wildcard / prefix matchers
        if kind == "default":
            return bool(_word_rx(pat).search(_string_value(actual)))
        if kind == "tag":
            rx = _wildcard_rx(f"{field}:{pat}")
            return isinstance(actual, list) and \
                any(rx.match(_string_value(t)) for t in actual)
        return bool(_wildcard_rx(pat).match(_string_value(actual)))

    # equality (match_datadog_query.rs equals())
    if kind == "default":
        # word-boundary match, STRING values only
        return isinstance(actual, str) and \
            bool(_word_rx(pat).search(actual))
    if kind == "reserved" and field == "tags":
        return isinstance(actual, list) and \
            any(isinstance(t, str) and t == pat for t in actual)
    if kind == "tag":
        want = f"{field}:{pat}"
        return isinstance(actual, list) and \
            any(isinstance(t, str) and t == want for t in actual)
    return _string_value(actual) == pat


def _eval(node, event: dict) -> bool:
    kind = node[0]
    if kind == "or":
        return _eval(node[1], event) or _eval(node[2], event)
    if kind == "and":
        return _eval(node[1], event) and _eval(node[2], event)
    if kind == "not":
        return not _eval(node[1], event)
    _, attr, value = node

    if attr is None and value == "*":
        return True  # MatchAllDocs

    if attr == "_exists_":
        return any(_dd_exists(k, f, event)
                   for k, f in _norm_fields(_unquote(value)))
    if attr == "_missing_":
        return not _eval(("term", "_exists_", value), event)

    return any(_dd_term(k, f, value, event)
               for k, f in _norm_fields(attr))


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

    numeric_col = pa.types.is_integer(col.type) or \
        pa.types.is_floating(col.type)
    if value == "*":
        return pc.is_valid(col)
    m = _re.match(r"([<>]=?)\s*(.+)$", value)
    if m:
        op, rhs = m.group(1), m.group(2)
        quoted = len(rhs) >= 2 and rhs[0] == '"' and rhs[-1] == '"'
        r = None if quoted else _num(rhs)
        # reference compare: numeric only when value AND bound numeric;
        # string comparisons take the row path
        if r is None or not numeric_col:
            raise NotVectorizableQuery("string comparison")
        kernel = {"<": pc.less, "<=": pc.less_equal,
                  ">": pc.greater, ">=": pc.greater_equal}[op]
        return pc.fill_null(kernel(pc.cast(col, pa.float64()), r), False)
    if value and value[0] in "[{" and value[-1] in "]}":
        mm = _re.match(r'\s*("?[^"\s]*"?)\s+TO\s+("?[^"\s]*"?)\s*$',
                       value[1:-1])
        if not mm:
            raise NotVectorizableQuery("range syntax")
        lo, hi = mm.group(1), mm.group(2)
        if lo == "*" and hi == "*":
            return pc.is_valid(col)
        if (len(lo) >= 2 and lo[0] == '"') or (len(hi) >= 2 and hi[0] == '"') \
                or not numeric_col:
            raise NotVectorizableQuery("string-compared range")
        lo_n = None if lo == "*" else _num(lo)
        hi_n = None if hi == "*" else _num(hi)
        if (lo != "*" and lo_n is None) or (hi != "*" and hi_n is None):
            raise NotVectorizableQuery("non-numeric range")
        c = pc.cast(col, pa.float64())
        ok = pc.is_valid(col)
        if lo_n is not None:
            lo_ok = pc.greater_equal(c, lo_n) if value[0] == "[" \
                else pc.greater(c, lo_n)
            ok = pc.and_(ok, pc.fill_null(lo_ok, False))
        if hi_n is not None:
            hi_ok = pc.less_equal(c, hi_n) if value[-1] == "]" \
                else pc.less(c, hi_n)
            ok = pc.and_(ok, pc.fill_null(hi_ok, False))
        return ok
    pat = _unquote(value)
    if "*" in pat:
        rx = _wildcard_rx(pat).pattern
        return pc.fill_null(
            pc.match_substring_regex(pc.cast(col, pa.string()), rx), False)
    # equality is string_value(actual) == text (equals(), attr arm);
    # for integer columns an integer pattern is equivalent numerically
    if numeric_col:
        if pa.types.is_integer(col.type) and _re.match(r"^-?\d+$", pat):
            return pc.fill_null(pc.equal(col, int(pat)), False)
        raise NotVectorizableQuery("display-equality on float column")
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
        try:
            ast = _P(_tokenize(query)).parse()
        except VrlError as e:
            # the reference parses `query` at COMPILE time
            # (match_datadog_query.rs:82 InvalidArgument Display)
            raise VrlError("invalid argument") from e
        _QUERY_CACHE[query] = ast
    return _eval(ast, value)
