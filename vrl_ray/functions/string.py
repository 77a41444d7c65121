"""String-category stdlib functions (row-level semantics).

Citations into /root/reference/src/stdlib/ per function. Vectorized
Arrow counterparts for hot ones live in ``functions.vectorized``.
"""

from __future__ import annotations

import hashlib
import math
import os.path
import re as _re
from collections import Counter
from typing import Any, Optional, Union

import regex as _regex

from ..value import VrlError

__all__ = [
    "downcase", "upcase", "camelcase", "kebabcase", "pascalcase",
    "snakecase", "screamingsnakecase", "contains", "contains_all",
    "starts_with", "ends_with", "match_", "match_any", "replace",
    "replace_with", "split", "join", "slice_", "truncate",
    "strip_whitespace", "strip_ansi_escape_codes", "strlen", "find",
    "basename", "dirname", "shannon_entropy", "redact", "sieve",
]


def _s(v: Any) -> str:
    if not isinstance(v, str):
        from ..value import vrl_type
        raise VrlError(f"expected string, got {vrl_type(v)}")
    return v


def downcase(value: str) -> str:
    return _s(value).lower()


def upcase(value: str) -> str:
    return _s(value).upper()


# casing/ (src/stdlib/casing/*.rs) — a faithful port of the
# `convert_case` 0.7.1 crate's Boundary model: the string is scanned
# char-by-char, each position tested against the active boundary set
# (first match wins), a match ends the current word `split_at` chars
# in and strips `strip` delimiter chars. Defaults exclude UPPER_LOWER
# (the crate's Boundary::defaults()); `original_case` narrows the set
# to that case's own boundaries (Case::boundaries()); snakecase's
# `excluded_boundaries` removes entries (snakecase.rs:143-162).
# Conditions use Unicode upper/lower (Rust char::is_uppercase) but
# ASCII-only digits (is_ascii_digit), exactly like the crate.
def _asc_digit(c: str) -> bool:
    return "0" <= c <= "9"


# name -> (window_width, condition, split_at, strip)
_BOUNDARIES = {
    "underscore": (1, lambda w: w == "_", 0, 1),
    "hyphen": (1, lambda w: w == "-", 0, 1),
    "space": (1, lambda w: w == " ", 0, 1),
    "lower_upper": (2, lambda w: w[0].islower() and w[1].isupper(), 1, 0),
    "upper_lower": (2, lambda w: w[0].isupper() and w[1].islower(), 1, 0),
    "acronym": (3, lambda w: w[0].isupper() and w[1].isupper()
                and w[2].islower(), 1, 0),
    "lower_digit": (2, lambda w: w[0].islower() and _asc_digit(w[1]), 1, 0),
    "upper_digit": (2, lambda w: w[0].isupper() and _asc_digit(w[1]), 1, 0),
    "digit_lower": (2, lambda w: _asc_digit(w[0]) and w[1].islower(), 1, 0),
    "digit_upper": (2, lambda w: _asc_digit(w[0]) and w[1].isupper(), 1, 0),
}
_DEFAULT_BOUNDARIES = (
    "underscore", "hyphen", "space", "lower_upper", "acronym",
    "lower_digit", "upper_digit", "digit_lower", "digit_upper",
)
# Case::boundaries() for the five original_case hints
_CASE_BOUNDARIES = {
    "snake_case": ("underscore",),
    "SCREAMING_SNAKE": ("underscore",),
    "kebab-case": ("hyphen",),
    "camelCase": ("lower_upper", "acronym", "lower_digit",
                  "upper_digit", "digit_lower", "digit_upper"),
    "PascalCase": ("lower_upper", "acronym", "lower_digit",
                   "upper_digit", "digit_lower", "digit_upper"),
}


def _words(value: str, original_case=None, excluded=None) -> list[str]:
    v = _s(value)
    if original_case is None:
        names = _DEFAULT_BOUNDARIES
    else:
        names = _CASE_BOUNDARIES.get(_s(original_case))
        if names is None:
            raise VrlError(
                "case must match one of: camelCase, PascalCase, "
                "SCREAMING_SNAKE, snake_case, kebab-case")
    if excluded is not None:
        drop = set()
        for b in excluded:
            if not isinstance(b, str) or b not in _BOUNDARIES:
                raise VrlError(
                    "boundary must match one of: lower_upper, "
                    "upper_lower, acronym, lower_digit, upper_digit, "
                    "digit_lower, digit_upper")
            drop.add(b)
        names = tuple(n for n in names if n not in drop)
    bs = [_BOUNDARIES[n] for n in names]
    words, start, n = [], 0, len(v)
    # crate segmentation::split: scan every char position; first
    # matching boundary cuts the word — no skip-ahead after a match.
    for i in range(n):
        for width, cond, split_at, strip in bs:
            w = v[i:i + width]
            if len(w) == width and cond(w):
                words.append(v[start:i + split_at])
                start = i + split_at + strip
                break
    words.append(v[start:])
    return [w for w in words if w]


def _capital(w: str) -> str:
    # Pattern::Capital — char::to_uppercase on the first char (full
    # uppercase, NOT Python titlecase), lowercase on the rest.
    return w[0].upper() + w[1:].lower()


def camelcase(value: str, original_case: Optional[str] = None) -> str:
    ws = _words(value, original_case)
    return "".join([ws[0].lower()] + [_capital(w) for w in ws[1:]]) \
        if ws else ""


def pascalcase(value: str, original_case: Optional[str] = None) -> str:
    return "".join(_capital(w) for w in _words(value, original_case))


def snakecase(value: str, original_case: Optional[str] = None,
        excluded_boundaries: Optional[list] = None) -> str:
    return "_".join(w.lower() for w in
                    _words(value, original_case, excluded_boundaries))


def screamingsnakecase(value: str, original_case: Optional[str] = None) -> str:
    return "_".join(w.upper() for w in _words(value, original_case))


def kebabcase(value: str, original_case: Optional[str] = None) -> str:
    return "-".join(w.lower() for w in _words(value, original_case))


def contains(value: str, substring: str, case_sensitive: bool = True) -> bool:
    v, s = _s(value), _s(substring)
    if not case_sensitive:
        v, s = v.lower(), s.lower()
    return s in v


def contains_all(value: str, substrings: list, case_sensitive: bool = True) -> bool:
    return all(contains(value, s, case_sensitive) for s in substrings)


def starts_with(value: str, substring: str, case_sensitive: bool = True) -> bool:
    v, s = _s(value), _s(substring)
    if not case_sensitive:
        v, s = v.lower(), s.lower()
    return v.startswith(s)


def ends_with(value: str, substring: str, case_sensitive: bool = True) -> bool:
    v, s = _s(value), _s(substring)
    if not case_sensitive:
        v, s = v.lower(), s.lower()
    return v.endswith(s)


def match_(value: str, pattern) -> bool:
    """`match` (match.rs): regex test."""
    if isinstance(pattern, str):
        pattern = _regex.compile(pattern)
    return pattern.search(_s(value)) is not None


def match_any(value: str, patterns: list) -> bool:
    return any(match_(value, p) for p in patterns)


def replace(value: str, pattern, with_: str, count: int = -1) -> str:
    """replace.rs: pattern may be literal string or regex; count -1 =
    all. Regex replacement supports $name/$1 capture refs."""
    v = _s(value)
    if count == 0:
        # replace.rs:33-51: count 0 = replace nothing, both pattern
        # kinds (python sub's count=0 would mean ALL)
        return v
    if isinstance(pattern, (_regex.Pattern, _re.Pattern)):
        repl = _re.sub(r"\$(\w+|\{\w+\})", lambda m: "\\g<" + m.group(1).strip("{}") + ">", with_)
        return pattern.sub(repl, v, count=count if count > 0 else 0)
    return v.replace(_s(pattern), with_, count if count > 0 else -1)


def replace_with(value: str, pattern, closure, count: int = -1) -> str:
    """replace_with.rs: closure receives the capture object
    ({"string":..., "captures":[...], <named>:...})."""
    if isinstance(pattern, str):
        pattern = _regex.compile(pattern)
    if any(g in ("string", "captures") for g in (pattern.groupindex or {})):
        # replace_with.rs: reserved closure-object keys
        raise VrlError('Capture group cannot be named "string" or "captures"')
    if count == 0:
        # count 0 = replace nothing (replace_with/zero_count.vrl);
        # -1 = all (python sub count=0)
        return _s(value)
    n = count if count > 0 else 0

    def _cb(m):
        obj = {"string": m.group(0),
               "captures": [m.group(i) for i in range(1, (m.re.groups or 0) + 1)]}
        obj.update({k: v for k, v in m.groupdict().items()})
        r = closure(obj)
        if not isinstance(r, str):
            raise VrlError("replace_with closure must return a string")
        return r

    return pattern.sub(_cb, _s(value), count=n)


def split(value: str, pattern, limit: Optional[int] = None) -> list:
    """split.rs: literal or regex separator; `limit` is Rust's
    splitn count — default 999_999_999 (split.rs:108), negative
    clamps to 0, and splitn(0) yields NO pieces (empty array)."""
    v = _s(value)
    if limit is None:
        limit = 999_999_999
    if limit < 0:
        limit = 0
    if limit == 0:
        return []
    if limit == 1:
        return [v]
    if isinstance(pattern, (_regex.Pattern, _re.Pattern)):
        return pattern.split(v, maxsplit=limit - 1)
    return v.split(_s(pattern), limit - 1)


def join(value: list, separator: str = "") -> str:
    """join.rs: array items must be strings (or numbers per docs? —
    strings only; numbers error in reference)."""
    if not isinstance(value, list):
        raise VrlError("expected array")
    parts = []
    for item in value:
        if not isinstance(item, str):
            raise VrlError("all array items must be strings")
        parts.append(item)
    return separator.join(parts)


def slice_(value: Union[str, list], start: int, end: Optional[int] = None):
    """slice.rs: BYTE indices for strings (Bytes.slice — a slice
    through a multi-byte character lossy-decodes to U+FFFD, exactly
    what the reference's bytes render as), element indices for
    arrays; negative indices count from the end; start out of
    [-len, len] and end < start are errors (slice.rs:29-50)."""
    if isinstance(value, str):
        b = value.encode("utf-8")
        n = len(b)
        s = start + n if start < 0 else start
        e = n if end is None else (end + n if end < 0 else end)
        if s < 0 or s > n:
            raise VrlError(f'"start" must be between "{-n}" and "{n}"')
        if e < s:
            raise VrlError('"end" must be greater or equal to "start"')
        return b[s:min(e, n)].decode("utf-8", "replace")
    if isinstance(value, list):
        n = len(value)
        s = start + n if start < 0 else start
        e = n if end is None else (end + n if end < 0 else end)
        if s < 0 or s > n:
            raise VrlError(f'"start" must be between "{-n}" and "{n}"')
        if e < s:
            raise VrlError('"end" must be greater or equal to "start"')
        return value[s:min(e, n)]
    from ..value import vrl_type
    raise VrlError(f"expected string or array, got {vrl_type(value)}")


def truncate(value: str, limit: int, suffix: str = "") -> str:
    """truncate.rs: cut to `limit` chars; `suffix` appended only when
    truncation happened (modern arg; legacy ellipsis flag maps to
    suffix='...')."""
    v = _s(value)
    limit = max(0, limit)    # truncate.rs clamps negatives, no error
    if len(v) <= limit:
        return v
    return v[:limit] + suffix


def strip_whitespace(value: str) -> str:
    return _s(value).strip()


# CSI per ECMA-48 (vte, the strip_ansi_escapes crate's parser):
# params 0x30-0x3F (digits ; : ? = < >), intermediates 0x20-0x2F,
# final 0x40-0x7E — '=' private modes like \x1b[=3l strip too
_ANSI = _re.compile(
    r"\x1b\[[0-?]*[ -/]*[@-~]|\x1b\].*?(?:\x07|\x1b\\)|\x1b[@-Z\\-_]")


def strip_ansi_escape_codes(value: str) -> str:
    return _ANSI.sub("", _s(value))


def strlen(value: str) -> int:
    """strlen.rs: number of UTF-8 characters (not bytes)."""
    return len(_s(value))


def find(value: str, pattern, from_: int = 0):
    """find.rs: BYTE index of the first occurrence at/after the byte
    offset `from_`, null if absent (find_bytes_in_bytes /
    regex.find_at both yield byte positions); pattern may be regex
    or literal. ASCII behavior is unchanged."""
    v = _s(value)
    b = v.encode("utf-8")
    if isinstance(pattern, (_regex.Pattern, _re.Pattern)):
        start_chars = len(b[:max(0, from_)].decode("utf-8", "ignore"))
        m = pattern.search(v, start_chars)
        if not m:
            return None
        return len(v[:m.start()].encode("utf-8"))
    if not isinstance(pattern, (str, bytes)):
        from ..value import vrl_type
        raise VrlError(
            f"expected string or regex, got {vrl_type(pattern)}")
    idx = b.find(_s(pattern).encode("utf-8"), from_)
    return idx if idx >= 0 else None


def basename(value: str, suffix: Optional[str] = None):
    """basename.rs (Rust Path::file_name): empty and "." segments are
    skipped entirely; a path whose last real component is ".." (or
    that has none — "/", ".", "") has NO file name -> null."""
    v = _s(value)
    parts = [p for p in v.split("/") if p not in ("", ".")]
    if not parts or parts[-1] == "..":
        return None
    b = parts[-1]
    if suffix and b.endswith(suffix):
        b = b[: -len(suffix)]
    return b


def dirname(value: str) -> str:
    """dirname.rs (Rust Path::parent, textually): "/" is its own
    parent; trailing separators and "." components are dropped to
    find the file-name boundary; an empty parent is "." (including
    dirname("") and dirname("."))."""
    v = _s(value)
    if v == "/":
        return "/"
    s = v
    while True:
        t = s.rstrip("/")
        if t == "." or t.endswith("/."):
            s = t[:-1]
            continue
        s = t
        break
    if "/" not in s:
        return "."
    d = s.rsplit("/", 1)[0].rstrip("/")
    return d or "/"


def shannon_entropy(value: str, segmentation: str = "byte") -> float:
    """shannon_entropy.rs: bits per symbol over byte (default) or
    grapheme segmentation."""
    v = _s(value)
    if not v:
        return 0.0
    if segmentation == "byte":
        symbols: list = list(v.encode("utf-8"))
    elif segmentation == "grapheme":
        symbols = _regex.findall(r"\X", v)  # true grapheme clusters
    elif segmentation == "codepoint":
        symbols = list(v)
    else:
        raise VrlError(f"invalid segmentation: {segmentation}")
    counts = Counter(symbols)
    n = len(symbols)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


# redact (redact.rs:24-110): PII masking. Filters: regex patterns or
# named filter "us_social_security_number"; redactor full|text|sha2|sha3.
_SSN = _re.compile(r"\b\d{3}-\d{2}-\d{4}\b")


_REDACT_SHA2 = {
    "SHA-224": hashlib.sha224, "SHA-256": hashlib.sha256,
    "SHA-384": hashlib.sha384, "SHA-512": hashlib.sha512,
    "SHA-512/224": lambda b: hashlib.new("sha512_224", b),
    "SHA-512/256": lambda b: hashlib.new("sha512_256", b),
}
_REDACT_SHA3 = {
    "SHA3-224": hashlib.sha3_224, "SHA3-256": hashlib.sha3_256,
    "SHA3-384": hashlib.sha3_384, "SHA3-512": hashlib.sha3_512,
}


def _redactor(redactor) -> "callable":
    """redact.rs redactor spec: "full" | "text" | "sha2" | "sha3" or
    {"type":..., "variant":..., "encoding": "base16"|"base64"}.
    Shorthand "sha2"/"sha3" = default variant (SHA-512/256, SHA3-512)
    base64-encoded."""
    import base64

    def _hash(fn, encoding):
        def apply(m):
            d = fn(m.encode()).digest()
            if encoding == "base16":
                return d.hex()
            return base64.b64encode(d).decode("ascii")
        return apply

    if redactor is None or redactor == "full":
        return lambda m: "[REDACTED]"
    if isinstance(redactor, dict):
        # Redactor::from_object (redact.rs:410-417): type is REQUIRED
        # and must be a string; unknown types error
        typ = redactor.get("type")
        if typ is None:
            raise VrlError("redactor specified as objects must have "
                           "type parameter")
        if not isinstance(typ, str):
            raise VrlError("type key in redactor must be a string")
        if typ == "full":
            return lambda m: "[REDACTED]"
        if typ not in ("text", "sha2", "sha3"):
            raise VrlError("unknown redactor name")
        if typ == "text":
            rep = redactor.get("replacement")
            if rep is None:
                raise VrlError("text redactor must have `replacement` "
                               "specified")
            if not isinstance(rep, str):
                raise VrlError("`replacement` must be a string")
            return lambda m: rep
        if typ == "sha2":
            fn = _REDACT_SHA2.get(redactor.get("variant", "SHA-512/256"))
            if fn is None:
                raise VrlError(f"invalid sha2 variant: {redactor.get('variant')}")
            return _hash(fn, redactor.get("encoding", "base64"))
        fn = _REDACT_SHA3.get(redactor.get("variant", "SHA3-512"))
        if fn is None:
            raise VrlError(f"invalid sha3 variant: {redactor.get('variant')}")
        return _hash(fn, redactor.get("encoding", "base64"))
    if redactor == "sha2":
        return _hash(_REDACT_SHA2["SHA-512/256"], "base64")
    if redactor == "sha3":
        return _hash(_REDACT_SHA3["SHA3-512"], "base64")
    raise VrlError(f"invalid redactor: {redactor!r}")


def redact(value, filters: list, redactor=None):
    """redact.rs: recurses into arrays/objects; strings get every
    filter applied in order. Filters follow TryFrom<Value> for Filter
    (redact.rs:288-334): regex literal, the name
    "us_social_security_number", or an object {type: "pattern",
    patterns: [regex|literal-string, ...]} — a literal string inside
    `patterns` is a PLAIN substring match, and arbitrary bare strings
    are "unknown filter name" errors, never implicit regexes."""
    # the reference validates filters/redactor at COMPILE time
    # (resolve_constant + function::Error::InvalidArgument, whose
    # Display is the fixed "invalid argument"); the detailed reason
    # rides the exception chain
    try:
        red = _redactor(redactor)
        pats = _redact_filters(filters)
    except VrlError as e:
        raise VrlError("invalid argument") from e

    def _apply(v):
        if isinstance(v, str):
            for kind, p in pats:
                if kind == "rx":
                    v = p.sub(lambda m: red(m.group(0)), v)
                elif p:  # literal substring (str_replace)
                    v = v.replace(p, red(p))
            return v
        if isinstance(v, list):
            return [_apply(x) for x in v]
        if isinstance(v, dict):
            return {k: _apply(x) for k, x in v.items()}
        return v

    return _apply(value)


def _redact_filters(filters: list) -> list:
    """TryFrom<Value> for Filter (redact.rs:288-334)."""
    pats: list = []  # ("rx", compiled) | ("str", literal)
    for f in filters:
        if isinstance(f, (_regex.Pattern, _re.Pattern)):
            pats.append(("rx", f))
        elif isinstance(f, str):
            if f == "us_social_security_number":
                pats.append(("rx", _SSN))
            elif f == "pattern":
                raise VrlError("pattern cannot be used without arguments")
            else:
                raise VrlError("unknown filter name")
        elif isinstance(f, dict):
            t = f.get("type")
            if t is None:
                raise VrlError("filters specified as objects must have "
                               "type parameter")
            if not isinstance(t, str):
                raise VrlError("type key in filters must be a string")
            if t == "us_social_security_number":
                pats.append(("rx", _SSN))
            elif t == "pattern":
                ps = f.get("patterns")
                if ps is None:
                    raise VrlError("pattern filter must have `patterns` "
                                   "specified")
                if not isinstance(ps, list):
                    raise VrlError("`patterns` must be array of regular "
                                   "expression literals")
                for p in ps:
                    if isinstance(p, (_regex.Pattern, _re.Pattern)):
                        pats.append(("rx", p))
                    elif isinstance(p, str):
                        pats.append(("str", p))
                    else:
                        raise VrlError("`patterns` must be regular "
                                       "expressions")
            else:
                raise VrlError("unknown filter name")
        else:
            raise VrlError("unknown literal for filter, must be a "
                           "regex, filter name, or object")
    return pats


def sieve(value: str, permitted_characters, replace_single: str = "",
          replace_repeated: str = "") -> str:
    """sieve.rs: keep only characters matching `permitted_characters`
    (a regex); runs of removed chars collapse to replace_* strings."""
    if isinstance(permitted_characters, str):
        permitted_characters = _regex.compile(permitted_characters)
    v = _s(value)
    out = []
    i = 0
    while i < len(v):
        m = permitted_characters.match(v, i)
        if m and m.end() > i:
            out.append(v[i:m.end()])
            i = m.end()
        else:
            j = i
            while j < len(v):
                m2 = permitted_characters.match(v, j)
                if m2 and m2.end() > j:
                    break
                j += 1
            out.append(replace_repeated if j - i > 1 else replace_single)
            i = j
    return "".join(out)
