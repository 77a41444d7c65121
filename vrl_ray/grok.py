"""Grok pattern support: expand ``%{NAME:field}`` patterns into
named-group regexes, compiled once and reused per actor.

Mirrors the behavior of the reference's ``parse_grok``
(/root/reference/src/stdlib/parse_grok.rs:12-25): the pattern is
compiled ONCE at program-compile time; at runtime a non-matching input
is an error ("unable to parse input with grok pattern"); matches
become an object of named captures (strings). Like the upstream grok
crate, ``%{PAT:field:type}`` supports ``int``/``float`` conversions.

The built-in pattern set is the commonly published grok base set
(logstash/grok "patterns" file, public domain) — the subset relevant
to log parsing; custom patterns can be supplied via ``definitions``.

Uses the ``regex`` module (not ``re``) for atomic-group compatibility
with oniguruma-style patterns.
"""

from __future__ import annotations

import regex as _regex
from typing import Optional

# Base grok patterns (names and regexes per the public logstash set).
BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?<![0-9.+-])(?>[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"""(?>(?<!\\)(?>"(?>\\.|[^\\"]+)+"|""|(?>'(?>\\.|[^\\']+)+')|''|(?>`(?>\\.|[^\\`]+)+`)|``))""",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    # network
    "IPV4": r"(?<![0-9])(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))(?![0-9])",
    "IPV6": r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:)+:(?:[0-9A-Fa-f]{1,4}:?)*|::(?:[0-9A-Fa-f]{1,4}:?)+|::)",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(\.?|\b)",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # paths
    "UNIXPATH": r"(/[\w_%!$@:.,+~-]+)+",
    "WINPATH": r"(?>[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    # remainder of the grok crate's default set (classic logstash
    # grok-patterns; texts match patterns/grok.pattern)
    "BASE16FLOAT": r"\b(?<![0-9A-Fa-f.])(?:[+-]?(?:0x)?(?:(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?)|(?:\.[0-9A-Fa-f]+)))\b",
    "URN": r"urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:(?:%[0-9a-fA-F]{2}|[0-9A-Za-z()+,.:=@;$_!*'/?#-])+",
    "CISCOMAC": r"(?:(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4})",
    "WINDOWSMAC": r"(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})",
    "COMMONMAC": r"(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "TTY": r"(?:/dev/(pts|tty([pq])?)(\w+)?/?(?:[0-9]+))",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "URIPROTO": r"[A-Za-z]+(\+[A-Za-z+]+)?",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # dates / times
    "MONTH": r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?>\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"(?:[APMCE][SD]T|UTC)",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # composite HTTP log lines
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    "COMMONAPACHELOG": r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} \[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" %{NUMBER:response} (?:%{NUMBER:bytes}|-)",
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    "QS": r"%{QUOTEDSTRING}",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
}

_GROK_REF = _regex.compile(
    r"%\{(?P<name>[A-Z0-9_@]+)(?::(?P<field>[A-Za-z0-9_@.\[\]-]+))?(?::(?P<type>int|float|integer|string))?\}"
)

_MAX_DEPTH = 32


class GrokError(ValueError):
    pass


def _sanitize_group(field: str, taken: set[str]) -> str:
    g = _regex.sub(r"[^A-Za-z0-9_]", "_", field)
    if not g or g[0].isdigit():
        g = "f_" + g
    base, i = g, 1
    while g in taken:
        g = f"{base}_{i}"
        i += 1
    return g


class GrokPattern:
    """A compiled grok pattern: ``match(line) -> dict | None``.

    Compile once (driver or actor ``__init__``), call per row/batch —
    the same lifecycle as the reference's ``Arc<grok::Pattern>``
    (parse_grok.rs:148-169).
    """

    def __init__(self, pattern: str, definitions: Optional[dict[str, str]] = None):
        self.source = pattern
        self._defs = dict(BASE_PATTERNS)
        if definitions:
            self._defs.update(definitions)
        # group name -> (output field name, conversion)
        self._fields: dict[str, tuple[str, Optional[str]]] = {}
        expanded = self._expand(pattern, 0, capture=True)
        try:
            self.regex = _regex.compile(expanded)
        except _regex.error as e:  # pragma: no cover
            raise GrokError(f"invalid grok pattern {pattern!r}: {e}") from e

    def _expand(self, pat: str, depth: int, capture: bool) -> str:
        if depth > _MAX_DEPTH:
            raise GrokError(f"grok pattern recursion too deep: {self.source!r}")

        def repl(m: "_regex.Match") -> str:
            name, field, typ = m.group("name"), m.group("field"), m.group("type")
            if name not in self._defs:
                # the grok crate's Error::DefinitionNotFound Display
                raise GrokError(
                    f'The given pattern definition name "{name}" could '
                    "not be found in the definition map")
            inner = self._expand(self._defs[name], depth + 1, capture)
            if field and capture:
                group = _sanitize_group(field, set(self._fields))
                self._fields[group] = (field, typ)
                return f"(?P<{group}>{inner})"
            return f"(?:{inner})"

        return _GROK_REF.sub(repl, pat)

    def match(self, line: str) -> Optional[dict]:
        """Named captures as an object; unmatched named groups are
        omitted (grok-crate behavior, parse_grok.rs:228-235 test:
        alternation drops unmatched groups)."""
        m = self.regex.match(line)
        if m is None:
            return None
        out: dict = {}
        for group, (field, typ) in self._fields.items():
            v = m.group(group)
            if v is None:
                continue
            if typ in ("int", "integer"):
                try:
                    out[field] = int(v)
                except ValueError:
                    out[field] = None
            elif typ == "float":
                try:
                    out[field] = float(v)
                except ValueError:
                    out[field] = None
            else:
                out[field] = v
        return out

    @property
    def fields(self) -> list[str]:
        """Output field names in pattern order (static schema)."""
        return [f for f, _ in self._fields.values()]
