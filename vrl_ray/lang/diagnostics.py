"""Positioned compiler diagnostics with the reference's rendered text.

The reference renders every compile error/warning through
codespan-reporting (src/diagnostic/): a ``error[E###]: title`` header,
a source frame with ``^``/``-`` label runs, per-label messages, and a
trailing note list.  This module reproduces that text exactly for the
subset of label shapes the reference emits (all labels of a diagnostic
on one source line) — verified character-for-character against the 37
files of the reference's diagnostics corpus
(lib/tests/tests/diagnostics/*.vrl, run by tests/test_vrl_corpus.py).

Structure mirrors src/diagnostic/{diagnostic,label,note}.rs:
- :class:`Label` — primary (``^``) or context (``-``) span + ONE
  message; labels sharing a span stack their messages.
- :class:`Diagnostic` — severity, numeric code, title, labels, notes.
  Codes 100..=110 get an automatic "learn more about error code"
  note; every diagnostic gets the lang-docs + REPL footers
  (diagnostic.rs:136-143).
- :func:`render` / :func:`render_list` — the codespan text.

Also here: the reference's "did you mean" suggestion rule (plain
Levenshtein, first minimum over registration-ordered candidates —
function_call.rs:993-1011, variable.rs:121-145) and the AST display
used inside messages (assignment.rs Display impls).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class Label:
    __slots__ = ("message", "start", "end", "primary")

    def __init__(self, message: str, span: Tuple[int, int],
                 primary: bool = True):
        self.message = message
        self.start, self.end = span
        self.primary = primary

    @staticmethod
    def context(message: str, span: Tuple[int, int]) -> "Label":
        return Label(message, span, primary=False)


class Diagnostic:
    __slots__ = ("severity", "code", "title", "labels", "notes")

    def __init__(self, code: int, title: str, labels: List[Label],
                 notes: Optional[List[str]] = None,
                 severity: str = "error"):
        self.severity = severity
        self.code = code
        self.title = title
        self.labels = labels
        self.notes = list(notes or [])


# --- note constructors (note.rs Display) ---

NOTE_SEE_ERROR_DOCS = \
    "see documentation about error handling at https://errors.vrl.dev/#handling"
NOTE_COERCE = ("hint: coerce the value to the required type using a "
               "coercion function")
NOTE_FUNC_CHARACTERISTICS = (
    "see functions characteristics documentation at "
    "https://vrl.dev/expressions/#function-call-characteristics")


def note_see_docs(kind: str, anchor: str) -> str:
    return f"see documentation about {kind} at https://vrl.dev/expressions/#{anchor}"


def note_func_docs(kind: str, anchor: str) -> str:
    return f"see documentation about {kind} at https://functions.vrl.dev/{anchor}"


def note_code_docs(code: int) -> str:
    return f"learn more about error code {code} at https://errors.vrl.dev/{code}"


def note_solution(title: str, content: List[str]) -> List[str]:
    """Note::solution (note.rs:26-35): title, blank, indented lines,
    blank."""
    return [f"try: {title}", " "] + [f"    {c}" for c in content] + [" "]


# --- rendering ---


def _line_starts(src: str) -> List[int]:
    starts = [0]
    for i, ch in enumerate(src):
        if ch == "\n":
            starts.append(i + 1)
    return starts


def _linecol(starts: List[int], pos: int) -> Tuple[int, int]:
    """1-based (line, col) for a char offset."""
    import bisect
    line = bisect.bisect_right(starts, pos)
    return line, pos - starts[line - 1] + 1


def render(diag: Diagnostic, src: str) -> str:
    """codespan-reporting text for a single-source-line diagnostic."""
    starts = _line_starts(src)
    primary = next((l for l in diag.labels if l.primary), diag.labels[0])
    aline, acol = _linecol(starts, primary.start)
    width = len(str(aline))
    pad = " " * (width + 1)
    out = [f"{diag.severity}[E{diag.code:03d}]: {diag.title}",
           f"{pad}┌─ :{aline}:{acol}",
           f"{pad}│"]

    line_text = src.splitlines()[aline - 1] if src else ""
    out.append(f"{str(aline).rjust(width)} │ {line_text}")

    # group labels by span; codespan renders same-span hanging
    # messages as FIRST label + remaining in reverse insertion order
    # (pinned by function_invalid_argument.vrl's E403 label order and
    # unhandled_parse_regex_all_type.vrl's E103 order)
    spans: List[Tuple[int, int]] = []
    by_span: dict = {}
    for l in diag.labels:
        key = (l.start, l.end)
        if key not in by_span:
            by_span[key] = []
            spans.append(key)
        by_span[key].append(l)
    for key, group in by_span.items():
        if len(group) > 2:
            by_span[key] = [group[0]] + group[:0:-1]
    spans.sort()

    def col(pos: int) -> int:
        return _linecol(starts, pos)[1]

    # caret line: ^ where any label on the span is primary, else -
    caret = []
    for (s, e) in spans:
        c0, c1 = col(s) - 1, col(s) - 1 + max(1, e - s)
        while len(caret) < c0:
            caret.append(" ")
        ch = "^" if any(l.primary for l in by_span[(s, e)]) else "-"
        while len(caret) < c1:
            caret.append(ch)
    caret_str = "".join(caret)

    # the rightmost span inlines its message iff it has exactly one
    # labelled message
    rightmost = spans[-1]
    inline = None
    msgs_right = [l.message for l in by_span[rightmost] if l.message]
    if len(msgs_right) == 1 and "\n" not in msgs_right[0]:
        inline = msgs_right[0]

    out.append(f"{pad}│ {caret_str}" + (f" {inline}" if inline else ""))

    pending = [key for key in reversed(spans)
               if any(l.message for l in by_span[key])
               and not (key == rightmost and inline)]
    if pending:
        cols = sorted(col(s) - 1 for s, _ in pending)
        ptr = []
        for c in cols:
            while len(ptr) < c:
                ptr.append(" ")
            ptr.append("│")
        out.append(f"{pad}│ " + "".join(ptr))
        for key in pending:  # right-to-left
            my_col = col(key[0]) - 1
            left_cols = [c for c in cols if c < my_col]
            prefix = []
            for c in left_cols:
                while len(prefix) < c:
                    prefix.append(" ")
                prefix.append("│")
            while len(prefix) < my_col:
                prefix.append(" ")
            p = "".join(prefix)
            for l in by_span[key]:
                for msg_line in l.message.split("\n"):
                    if msg_line:
                        out.append(f"{pad}│ {p}{msg_line}")

    out.append(f"{pad}│")

    notes = list(diag.notes)
    if 100 <= diag.code <= 110:
        notes.append(note_code_docs(diag.code))
    notes.append("see language documentation at https://vrl.dev")
    notes.append("try your code in the VRL REPL, learn more at "
                 "https://vrl.dev/examples")
    for n in notes:
        out.append(f"{pad}= {n}".rstrip())
    return "\n".join(out)


def render_list(diags: List[Diagnostic], src: str) -> str:
    return "\n\n".join(render(d, src) for d in diags)


# --- "did you mean" (levenstein::distance, first minimum wins) ---


def levenshtein(a: str, b: str) -> int:
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def best_guess(ident: str, candidates: List[str]) -> Optional[str]:
    best, best_d = None, None
    for c in candidates:
        d = levenshtein(ident, c)
        if best_d is None or d < best_d:
            best, best_d = c, d
    return best


#: reference stdlib identifiers in registration order
#: (src/stdlib/mod.rs stdlib_functions! + per-file fn identifier())
REF_FN_IDENTS = [
    'abs', 'append', 'assert', 'assert_eq', 'basename', 'bool', 'ceil',
    'chunks', 'compact', 'contains', 'contains_all', 'decode_base16',
    'decode_base64', 'decode_charset', 'decode_gzip', 'decode_lz4',
    'decode_mime_q', 'decode_percent', 'decode_punycode', 'decode_snappy',
    'decode_zlib', 'decode_zstd', 'del', 'dirname', 'downcase',
    'encode_base16', 'encode_base64', 'encode_charset', 'encode_csv',
    'encode_gzip', 'encode_json', 'encode_key_value', 'encode_logfmt',
    'encode_lz4', 'encode_percent', 'encode_punycode', 'encode_snappy',
    'encode_zlib', 'encode_zstd', 'ends_with', 'exists', 'filter', 'find',
    'flatten', 'float', 'floor', 'for_each', 'format_int', 'format_number',
    'format_timestamp', 'from_entries', 'from_unix_timestamp', 'get',
    'haversine', 'includes', 'int', 'ip_aton', 'ip_cidr_contains',
    'ip_ntoa', 'ip_ntop', 'ip_pton', 'ip_subnet', 'ip_to_ipv6',
    'ipv6_to_ipv4', 'is_array', 'is_boolean', 'is_empty', 'is_float',
    'is_integer', 'is_ipv4', 'is_ipv6', 'is_json', 'is_null', 'is_nullish',
    'is_object', 'is_regex', 'is_string', 'is_timestamp', 'join', 'keys',
    'length', 'log', 'map_keys', 'map_values', 'match_any', 'match_array',
    'match_datadog_query', 'merge', 'mod', 'now', 'object',
    'object_from_array', 'parse_apache_log', 'parse_aws_alb_log',
    'parse_aws_cloudwatch_log_subscription_message',
    'parse_aws_vpc_flow_log', 'parse_bytes', 'parse_cbor', 'parse_cef',
    'parse_common_log', 'parse_csv', 'parse_duration', 'parse_float',
    'parse_glog', 'parse_grok', 'parse_groks', 'parse_influxdb',
    'parse_int', 'parse_json', 'parse_key_value', 'parse_klog',
    'parse_linux_authorization', 'parse_logfmt', 'parse_nginx_log',
    'parse_query_string', 'parse_regex', 'parse_regex_all',
    'parse_ruby_hash', 'parse_syslog', 'parse_timestamp', 'parse_tokens',
    'parse_url', 'parse_user_agent', 'parse_xml', 'parse_yaml', 'pop',
    'push', 'random_bool', 'random_bytes', 'random_float', 'random_int',
    'redact', 'remove', 'replace', 'replace_with', 'round', 'set',
    'shannon_entropy', 'sieve', 'slice', 'split', 'split_path',
    'starts_with', 'string', 'strip_ansi_escape_codes', 'strip_whitespace',
    'strlen', 'tag_types_externally', 'tally', 'tally_value', 'timestamp',
    'to_bool', 'to_entries', 'to_float', 'to_int', 'to_regex', 'to_string',
    'to_syslog_facility_code', 'to_syslog_facility', 'to_syslog_level',
    'to_syslog_severity', 'to_unix_timestamp', 'truncate', 'type_def',
    'unflatten', 'unique', 'unnest', 'upcase', 'uuid_from_friendly_id',
    'uuid_v4', 'uuid_v7', 'values', 'zip', 'get_env_var', 'encode_proto',
    'get_hostname', 'get_timezone_name', 'parse_etld', 'parse_proto',
    'validate_json_schema', 'http_request', 'reverse_dns', 'decrypt',
    'decrypt_ip', 'encrypt', 'encrypt_ip',
]

#: reserved identifiers (lex.rs:641-646) — a parse error (E205)
#: anywhere outside function-call position
RESERVED_IDENTS = frozenset((
    "array", "bool", "boolean", "break", "continue", "do", "emit",
    "float", "for", "forall", "foreach", "all", "each", "any", "try",
    "undefined", "int", "integer", "iter", "object", "regex", "string",
    "traverse", "timestamp", "duration", "unless", "walk", "while",
    "loop"))


# --- Kind display (value/kind.rs Display: fixed order, "a, b or c") ---

_KIND_ORDER = ("bytes", "integer", "float", "boolean", "timestamp",
               "regex", "null", "undefined", "array", "object")
_KIND_NAMES = {"bytes": "string"}


def kind_display(names) -> str:
    """`names` is a set of primitive names (with 'array'/'object' for
    containers)."""
    ordered = [_KIND_NAMES.get(n, n) for n in _KIND_ORDER if n in names]
    if not ordered:
        return "never"
    if len(ordered) == 1:
        return ordered[0]
    return ", ".join(ordered[:-1]) + " or " + ordered[-1]


def kind_str(names) -> str:
    """function_call.rs kind_str: 'any' / 'the exact type X' /
    'one of X, Y'."""
    if names == {"any"}:
        return "any"
    if len(names) == 1:
        return f"the exact type {kind_display(names)}"
    return f"one of {kind_display(names)}"


# --- AST display (expression Display impls, used inside messages) ---


def ast_display(node) -> str:
    """Render an AST node the way the reference's Display impls do
    (assignment.rs:319-325, literal/container Display)."""
    k = node[0]
    if k == "lit":
        v = node[1]
        if v is None:
            return "null"
        if v is True:
            return "true"
        if v is False:
            return "false"
        if isinstance(v, str):
            return f'"{v}"'
        return str(v)
    if k == "regex":
        return f"r'{node[1]}'"
    if k == "ts":
        return f"t'{node[1]}'"
    if k == "var":
        return node[1]
    if k == "path":
        return path_display(node[1], node[2])
    if k == "array":
        return "[" + ", ".join(ast_display(e) for e in node[1]) + "]"
    if k == "object":
        inner = ", ".join(f'"{key}": {ast_display(v)}'
                          for key, v in node[1])
        return "{ " + inner + " }"
    if k == "call":
        name, bang, args = node[1], node[2], node[3]
        rendered = ", ".join(
            (f"{an}: " if an else "") + ast_display(ae) for an, ae in args)
        return f"{name}{'!' if bang else ''}({rendered})"
    if k == "binop":
        return f"{ast_display(node[2])} {node[1]} {ast_display(node[3])}"
    if k == "not":
        return f"!{ast_display(node[1])}"
    if k == "index":
        return ast_display(node[1]) + segs_display(node[2])
    return "<expr>"


def segs_display(segs) -> str:
    out = []
    for s in segs:
        if isinstance(s, int):
            out.append(f"[{s}]")
        else:
            out.append(f".{s}")
    return "".join(out)


def path_display(prefix: str, segs) -> str:
    base = "." if prefix == "event" else "%"
    s = segs_display(segs)
    if s.startswith("."):
        s = s[1:]
    return base + s
