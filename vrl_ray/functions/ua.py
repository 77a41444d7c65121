"""uap-core user-agent matching engine (reference
src/stdlib/parse_user_agent.rs:608-652, which drives the Rust
``ua_parser`` crate over the same table baked from regexes.yaml).

Semantics follow the uap-core specification (docs/specification.md of
https://github.com/ua-parser/uap-core):

- parsers are tried in FILE ORDER; the first regex whose ``search``
  hits wins; no match at all -> ``None`` (the reference's
  ``Extractor::extract`` returns ``Option``, so an unmatched section
  yields all-null fields — see the w3m doc example).
- every ``*_replacement`` may reference ``$1``..``$9``; missing groups
  substitute as empty; the result is whitespace-trimmed and an empty
  result is null.
- without a replacement the defaults are: ua family=$1 v1..v3=$2..$4;
  os family=$1 v1..v4=$2..$5; device family=$1, model=$1, brand has NO
  default.
- device entries may carry ``regex_flag: 'i'``.

Tables live in the generated ``_ua_db`` module (scripts/gen_ua_db.py).
Regexes compile lazily on first use and extraction is memoized per
distinct UA string — real-world UA columns are heavily repeated, so a
pipeline pays the 1270-regex scan once per distinct value, not per row.
"""

from __future__ import annotations

import re as _re
from functools import lru_cache
from typing import Optional

_SUB = _re.compile(r"\$(\d)")

_UA_C: Optional[list] = None
_OS_C: Optional[list] = None
_DEV_C: Optional[list] = None


def _compile() -> None:
    global _UA_C, _OS_C, _DEV_C
    if _UA_C is not None:
        return
    from . import _ua_db as db
    _UA_C = [(_re.compile(r[0]),) + r[1:] for r in db.UA]
    _OS_C = [(_re.compile(r[0]),) + r[1:] for r in db.OS]
    _DEV_C = [(_re.compile(r[0], _re.I if r[1] else 0),) + r[2:]
              for r in db.DEV]


def _field(m: "_re.Match", repl: Optional[str],
           default_group: Optional[int]) -> Optional[str]:
    if repl is not None:
        def g(mm):
            try:
                return m.group(int(mm.group(1))) or ""
            except IndexError:
                return ""
        out = _SUB.sub(g, repl).strip()
        return out or None
    if default_group is None:
        return None
    try:
        g = m.group(default_group)
    except IndexError:
        return None
    return g if g else None


@lru_cache(maxsize=8192)
def extract_browser(ua: str):
    """-> (family, major, minor, patch) or None if no parser matched."""
    _compile()
    for rx, fam, v1, v2, v3 in _UA_C:
        m = rx.search(ua)
        if m:
            return (_field(m, fam, 1), _field(m, v1, 2),
                    _field(m, v2, 3), _field(m, v3, 4))
    return None


@lru_cache(maxsize=8192)
def extract_os(ua: str):
    """-> (family, v1, v2, v3, v4) or None."""
    _compile()
    for rx, fam, v1, v2, v3, v4 in _OS_C:
        m = rx.search(ua)
        if m:
            return (_field(m, fam, 1), _field(m, v1, 2), _field(m, v2, 3),
                    _field(m, v3, 4), _field(m, v4, 5))
    return None


@lru_cache(maxsize=8192)
def extract_device(ua: str):
    """-> (family, brand, model) or None."""
    _compile()
    for rx, fam, brand, model in _DEV_C:
        m = rx.search(ua)
        if m:
            return (_field(m, fam, 1), _field(m, brand, None),
                    _field(m, model, 1))
    return None
