"""Vendor log-format parsers (row-level semantics).

Mirrors the reference's log parsers (citations per function into
/root/reference/src/stdlib/): parse_apache_log, parse_nginx_log,
parse_klog, parse_linux_authorization, parse_cef, parse_aws_alb_log,
parse_aws_vpc_flow_log, parse_aws_cloudwatch_log_subscription_message,
parse_influxdb.

Shared semantics (log_util.rs:208-300): a `-` field is absent from the
result (capture group does not participate); typed captures — status/
size/pid/tid/cid/port/body_bytes_size/request_length/
upstream_response_length/upstream_status → int; excess/request_time/
upstream_response_time → float; timestamp parsed with a strptime
format (default "%d/%b/%Y:%T %z" for access logs).
"""

from __future__ import annotations

import json as _json
import re as _re
from datetime import datetime, timezone
from typing import Any, Optional

from ..value import VrlError

__all__ = [
    "parse_apache_log", "parse_nginx_log", "parse_klog",
    "parse_linux_authorization", "parse_cef", "parse_aws_alb_log",
    "parse_aws_vpc_flow_log",
    "parse_aws_cloudwatch_log_subscription_message", "parse_influxdb",
]

_INT_FIELDS = {"status", "size", "pid", "tid", "cid", "port",
               "body_bytes_size", "request_length",
               "upstream_response_length", "upstream_status", "id",
               "line"}
_FLOAT_FIELDS = {"excess", "request_time", "upstream_response_time"}


def _chrono_strptime(fmt: str) -> str:
    # chrono %T == %H:%M:%S; %.f fractional handled by caller
    return fmt.replace("%T", "%H:%M:%S")


def _chrono_parse_err(e: ValueError) -> str:
    """Map Python's strptime ValueError onto chrono ParseErrorKind
    Display text (log_util.rs:216 interpolates it verbatim)."""
    msg = str(e)
    if "unconverted data remains" in msg:
        return "trailing input"
    if "out of range" in msg or "must be in" in msg:
        return "input is out of range"
    return "input contains invalid characters"


def _parse_ts(value: str, fmt: str, tz: Optional[str] = None) -> datetime:
    if "%+" in fmt:  # chrono %+ = ISO 8601 / RFC 3339
        try:
            dt = datetime.fromisoformat(
                value.strip().replace("Z", "+00:00"))
        except ValueError as e:
            raise VrlError(
                f"failed parsing timestamp {value} using format {fmt}: "
                f"{_chrono_parse_err(e)}") from e
        return dt.astimezone(timezone.utc)
    val = value.strip()
    ns = 0
    if "%f" in fmt and "%.f" not in fmt:
        # chrono %f = NANOSECONDS since the last whole second, NO
        # implied dot (Python's %f is a µs fraction) — extract the
        # digit run and parse the remainder without it
        fm = _re.search(r"(\d{2}:\d{2}:\d{2})\.(\d+)", val)
        if fm:
            ns = int(fm.group(2))
            val = val[: fm.start(2) - 1] + val[fm.end(2):]
        pyfmt = _chrono_strptime(fmt.replace(".%f", "").replace("%f", ""))
    else:
        pyfmt = _chrono_strptime(
            fmt.replace("%.f", ".%f").replace("%.3f", ".%f")
            .replace("%.6f", ".%f").replace("%.9f", ".%f"))
    try:
        dt = datetime.strptime(val, pyfmt)
    except ValueError as e:
        # the message shows the ORIGINAL chrono format string
        raise VrlError(
            f"failed parsing timestamp {value} using format {fmt}: "
            f"{_chrono_parse_err(e)}") from e
    if ns:
        dt = dt.replace(microsecond=ns // 1000)
    if dt.tzinfo is None:
        if tz is None:
            from .timestamp import get_context_timezone
            tz = get_context_timezone()
        if tz and tz not in ("UTC", "utc"):
            # ctx timezone (TimeZone::Named): naive stamps live there
            from zoneinfo import ZoneInfo
            dt = dt.replace(tzinfo=ZoneInfo(tz))
        else:
            dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def _typed_fields(m: "_re.Match", ts_fmt: str,
                  tz: Optional[str] = None) -> dict:
    out: dict[str, Any] = {}
    for name, value in m.groupdict().items():
        if value is None:
            continue
        if name == "timestamp":
            out[name] = _parse_ts(value, ts_fmt, tz)
        elif name in _INT_FIELDS:
            try:
                out[name] = int(value)
            except ValueError as e:
                raise VrlError(f"failed parsing {name}") from e
        elif name in _FLOAT_FIELDS:
            try:
                out[name] = float(value)
            except ValueError as e:
                raise VrlError(f"failed parsing {name}") from e
        else:
            out[name] = value
    return out


# ---------------------------------------------------------------------------
# parse_apache_log (parse_apache_log.rs; regexes log_util.rs:12-110)

_APACHE_COMMON = _re.compile(
    r'^\s*'
    r'(-|(?P<host>.*?))\s+'
    r'(-|(?P<identity>.*?))\s+'
    r'(-|(?P<user>.*?))\s+'
    r'(-|\[(-|(?P<timestamp>[^\[]*))\])\s+'
    r'(-|"(-|(\s*(?P<message>((?P<method>\w+)\s+(?P<path>[^"]*?)\s+'
    r'(?P<protocol>[^"]*?)\s*|[^"]*?))\s*))")\s+'
    r'(-|(?P<status>\d+))\s+'
    r'(-|(?P<size>\d+))'
    r'\s*$')

_APACHE_COMBINED = _re.compile(
    r'^\s*'
    r'(-|(?P<host>.*?))\s+'
    r'(-|(?P<identity>.*?))\s+'
    r'(-|(?P<user>.*?))\s+'
    r'(-|\[(-|(?P<timestamp>[^\[]*))\])\s+'
    r'(-|"(-|(\s*(?P<message>((?P<method>\w+)\s+(?P<path>[^"]*?)\s+'
    r'(?P<protocol>[^"]*?)\s*|[^"]*?))\s*))")\s+'
    r'(-|(?P<status>\d+))\s+'
    r'(-|(?P<size>\d+))\s+'
    # log_util.rs:58-64: the closing quote sits INSIDE the alternation
    # (a bare `-` needs no quote) and combined has NO end anchor (the
    # reference's \s*$ is commented out)
    r'(-|"(-|(\s*(?P<referrer>[^"]*?)")))\s+'
    r'(-|"(-|(\s*(?P<agent>[^"]*?)")))')

# simple error format, then threaded-MPM format (log_util.rs:73-108)
_APACHE_ERROR = [
    _re.compile(
        r'^\s*'
        r'(-|\[(-|(?P<timestamp>[^\[]*))\])\s+'
        r'(-|\[(-|(?P<module>[^:]*):(?P<severity>[^\[]*))\])\s+'
        r'(-|\[\s*pid\s*(-|(?P<pid>[^:\]]*)(:\s*tid\s*(?P<thread>[^\[\]]*))?)\])\s'
        r'(-|\[\s*client\s*(-|(?P<client>.*):(?P<port>[^\[\]]*))\])\s'
        r'(-|(?P<message>.*?))'
        r'\s*$'),
    _re.compile(
        r'^\s*'
        r'\[(?P<timestamp>[^\]]+)\]\s+'
        r'\[(-|(?P<module>[^:]+)):(?P<severity>[^\]]+)\]\s+'
        r'\[pid\s+(?P<pid>\d+)(:tid\s+(?P<thread>\d+))?\]\s+'
        r'(?P<message1>[^\[]*?:\s+([^\[]*?:\s+)?)?'
        r'(\[client\s+(?P<client>.+?):(?P<port>\d+)\]\s+)?'
        # greedy, like log_util.rs:104 — the optional referer group
        # there never matches; message2 keeps any referer suffix, and
        # message1/message2 are emitted AS-IS (capture_value default)
        r'(?P<message2>.*)'
        r'\s*$'),
]


def parse_apache_log(value: str, format: str = "common",
                     timestamp_format: Optional[str] = None,
                     timezone_name: Optional[str] = None) -> dict:
    """Apache httpd access/error log parser
    (parse_apache_log.rs:24-120; default ts format
    parse_apache_log.rs:8). timezone_name mirrors the reference's
    ctx.timezone() for naive timestamps (our parse_timestamp has the
    same extension)."""
    ts_fmt = timestamp_format or "%d/%b/%Y:%T %z"
    if format == "common":
        regexes = [_APACHE_COMMON]
    elif format == "combined":
        regexes = [_APACHE_COMBINED]
    elif format == "error":
        regexes = _APACHE_ERROR
    else:
        raise VrlError(f"unknown format {format}")
    for rx in regexes:
        m = rx.match(value)
        if m:
            return _typed_fields(m, ts_fmt, timezone_name)
    raise VrlError(f"failed parsing {format} log line")


# ---------------------------------------------------------------------------
# parse_nginx_log (parse_nginx_log.rs; regexes log_util.rs:112-205)

_NGINX_COMBINED = _re.compile(
    r'^\s*'
    r'(-|(?P<client>\S+))\s+'
    r'\-\s+'
    r'(-|(?P<user>\S+))\s+'
    r'\[(?P<timestamp>.+)\]\s+'
    r'"(?P<request>[^"]*)"\s+'
    r'(?P<status>\d+)\s+'
    r'(?P<size>\d+)\s+'
    r'"(?P<referer>[^"]*)"\s+'
    r'"(?P<agent>[^"]*)"'
    r'(\s+"(-|(?P<compression>[^"]+))")?'
    r'\s*$')

_NGINX_MAIN = _re.compile(
    r'^\s*'
    r'(-|(?P<remote_addr>\S+))\s+'
    r'\-\s+'
    r'(-|(?P<remote_user>\S+))\s+'
    r'\[(?P<timestamp>[^\]]+)\]\s+'
    r'"(?P<request>[^"]*)"\s+'
    r'(?P<status>\d+)\s+'
    r'(?P<body_bytes_size>\d+)\s+'
    r'"(-|(?P<http_referer>[^"]*))"\s+'
    r'"(-|(?P<http_user_agent>[^"]+))"\s+'
    r'"(-|(?P<http_x_forwarded_for>[^"]+))"'
    r'\s*$')

_NGINX_INGRESS = _re.compile(
    r'^\s*'
    r'(-|(?P<remote_addr>\S+))\s+'
    r'\-\s+'
    r'(-|(?P<remote_user>\S+))\s+'
    r'\[(?P<timestamp>[^\]]+)\]\s+'
    r'"(?P<request>[^"]*)"\s+'
    r'(?P<status>\d+)\s+'
    r'(?P<body_bytes_size>\d+)\s+'
    r'"(-|(?P<http_referer>[^"]*))"\s+'
    r'"(-|(?P<http_user_agent>[^"]+))"\s+'
    r'(?P<request_length>\d+)\s+'
    r'(?P<request_time>\d+\.\d+)\s+'
    r'\[(?P<proxy_upstream_name>[^\]]+)\]\s+'
    r'\[(?P<proxy_alternative_upstream_name>[^\]]+)?\]\s+'
    r'(?P<upstream_addr>\S+)\s+'
    r'(-|(?P<upstream_response_length>\d+))\s+'
    r'(-|(?P<upstream_response_time>\d+\.\d+))\s+'
    r'(-|(?P<upstream_status>\d+))\s+'
    r'(?P<req_id>\S+)'
    r'\s*$')

_NGINX_ERROR = _re.compile(
    r'^\s*'
    r'(?P<timestamp>.+)\s+'
    r'\[(?P<severity>\w+)\]\s+'
    r'(?P<pid>\d+)\#'
    r'(?P<tid>\d+):'
    r'(\s+\*(?P<cid>\d+))?'
    r'\s+(?P<message>.+?)'
    r'(,\s+excess:\s+(?P<excess>[^\s,]+),?\sby\szone\s"(?P<zone>[^,]+)")?'
    r'(,\s+client:\s+(?P<client>[^,]+))?'
    r'(,\s+server:\s+(?P<server>[^,]*))?'
    r'(,\s+request:\s+"(?P<request>[^"]*)")?'
    r'(,\s+upstream:\s+"(?P<upstream>[^"]*)")?'
    r'(,\s+host:\s+"(?P<host>[^"]*)")?'
    r'(,\s+refer?rer:\s+"(?P<referer>[^"]*)")?'
    r'\s*$')


def parse_nginx_log(value: str, format: str = "combined",
                    timestamp_format: Optional[str] = None,
                    timezone_name: Optional[str] = None) -> dict:
    """Nginx access/error log parser (parse_nginx_log.rs:52-120;
    default ts formats parse_nginx_log.rs:279)."""
    if format == "combined":
        rx, ts_fmt = _NGINX_COMBINED, "%d/%b/%Y:%T %z"
    elif format == "main":
        rx, ts_fmt = _NGINX_MAIN, "%d/%b/%Y:%T %z"
    elif format == "ingress_upstreaminfo":
        rx, ts_fmt = _NGINX_INGRESS, "%d/%b/%Y:%T %z"
    elif format == "error":
        rx, ts_fmt = _NGINX_ERROR, "%Y/%m/%d %H:%M:%S"
    else:
        raise VrlError(f"unknown format {format}")
    if timestamp_format:
        ts_fmt = timestamp_format
    m = rx.match(value)
    if m is None:
        # parse_nginx_log.rs:65 — no format interpolation here
        raise VrlError("failed parsing log line")
    return _typed_fields(m, ts_fmt, timezone_name)


# ---------------------------------------------------------------------------
# parse_klog (parse_klog.rs): kubernetes klog header
# Lmmdd hh:mm:ss.uuuuuu threadid file:line] msg

# mirrors REGEX_KLOG (parse_klog.rs:59-71): single \w level mapped
# after the match, MMDD + exactly-6-digit fraction, greedy file
_KLOG = _re.compile(
    r'^\s*(?P<level>\w)'
    r'(?P<timestamp>(?P<mo>\d{2})(?P<d>\d{2})\s'
    r'(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})\.(?P<usec>\d{6}))\s+'
    r'(?P<id>\d+)\s(?P<file>.+):(?P<line>\d+)\]\s(?P<message>.*?)\s*$')


def parse_klog(value: str) -> dict:
    """Kubernetes klog parser (parse_klog.rs). klog omits the year:
    resolve_year (parse_klog.rs:171-177) uses the current year, except
    a December log seen in January belongs to LAST year."""
    from .parse import _glog_fields
    m = _KLOG.match(value)
    if m is None:
        raise VrlError("failed parsing klog message")
    d = m.groupdict()
    now = datetime.now(timezone.utc)
    d["y"] = str(now.year - 1 if d["mo"] == "12" and now.month == 1
                 else now.year)
    return _glog_fields(d)


# ---------------------------------------------------------------------------
# parse_linux_authorization (parse_linux_authorization.rs): RFC-3164
# syslog restricted to the auth facility; delegates to parse_syslog
# semantics, with the year defaulted to the current year.

def parse_linux_authorization(value: str) -> dict:
    from .parse import parse_syslog

    out = parse_syslog(value)
    # auth logs are plain 3164: drop syslog fields that never occur
    return out


# ---------------------------------------------------------------------------
# parse_cef (parse_cef.rs): ArcSight Common Event Format

_CEF_HEADER_KEYS = ["cefVersion", "deviceVendor", "deviceProduct",
                    "deviceVersion", "deviceEventClassId", "name",
                    "severity"]

_CEF_KEY = _re.compile(r'([A-Za-z0-9_.\[\]-]+)=')


def _cef_unescape_header(s: str) -> str:
    return s.replace(r"\|", "|").replace(r"\\", "\\")


def _cef_unescape_ext(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "n":
                out.append("\n")
            elif n == "r":
                out.append("\r")
            elif n in ("=", "\\", "|"):
                out.append(n)
            else:
                out.append(c)
                out.append(n)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_cef(value: str, translate_custom_fields: bool = False,
              strict: bool = True) -> dict:
    """CEF parser (parse_cef.rs). Header: 7 |-separated fields after
    the ``CEF:`` marker (an optional syslog-ish prefix before ``CEF:``
    is skipped); extension: key=value pairs where values run until the
    next ``key=`` token; ``\\|`` ``\\=`` ``\\n`` escapes."""
    idx = value.find("CEF:")
    if idx < 0:
        raise VrlError("invalid CEF message: no CEF: marker")
    rest = value[idx + len("CEF:"):]

    # split header on unescaped '|' (7 fields, then extension remainder)
    fields: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(rest) and len(fields) < 7:
        c = rest[i]
        if c == "\\" and i + 1 < len(rest):
            cur.append(c)
            cur.append(rest[i + 1])
            i += 2
            continue
        if c == "|":
            fields.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    extension = rest[i:] if len(fields) == 7 else ""
    if len(fields) < 7:
        raise VrlError("invalid CEF message: incomplete header")

    out: dict[str, Any] = {}
    for k, v in zip(_CEF_HEADER_KEYS, fields):
        out[k] = _cef_unescape_header(v)

    ext = extension.strip()
    if ext:
        # tokenize on unescaped `key=` boundaries
        matches = [m for m in _CEF_KEY.finditer(ext)
                   if m.start() == 0 or ext[m.start() - 1] == " "
                   if not (m.start() >= 1 and ext[m.start() - 2:m.start() - 1] == "\\")]
        for j, m in enumerate(matches):
            key = m.group(1)
            end = matches[j + 1].start() if j + 1 < len(matches) else len(ext)
            raw = ext[m.end():end]
            out[key] = _cef_unescape_ext(raw.rstrip(" ") if j + 1 < len(matches) else raw)

    if translate_custom_fields:
        # cs1/cs1Label → {label: value} (parse_cef.rs custom-field mode)
        labels = {k[:-len("Label")]: v for k, v in out.items()
                  if k.endswith("Label")}
        translated: dict[str, Any] = {}
        for k, v in out.items():
            if k.endswith("Label"):
                continue
            if k in labels:
                translated[labels[k]] = v
            else:
                translated[k] = v
        out = translated
    return out


# ---------------------------------------------------------------------------
# parse_aws_alb_log (parse_aws_alb_log.rs:250-400): positional
# space-separated fields, quoted where noted; `-` → null;
# *_list fields → arrays; trailing unknown fields error unless
# strict_mode=false.

class _Cursor:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def done(self) -> bool:
        return self.i >= len(self.s)

    def take_plain(self, name: str) -> str:
        if self.i > 0:
            if self.i >= len(self.s) or self.s[self.i] != " ":
                raise VrlError(f"failed to get field `{name}`")
            self.i += 1
        j = self.s.find(" ", self.i)
        if j == -1:
            j = len(self.s)
        if j == self.i:
            raise VrlError(f"failed to get field `{name}`")
        v = self.s[self.i:j]
        self.i = j
        return v

    def take_quoted(self, name: str) -> str:
        if self.s[self.i:self.i + 2] != ' "':
            raise VrlError(f"failed to get field `{name}`")
        j = self.s.find('"', self.i + 2)
        if j == -1:
            raise VrlError(f"failed to get field `{name}`")
        v = self.s[self.i + 2:j]
        self.i = j + 1
        return v


def _null_if_dash(v: str):
    return None if v == "-" else v


def parse_aws_alb_log(value: str, strict_mode: bool = True) -> dict:
    c = _Cursor(value)
    out: dict[str, Any] = {}
    out["type"] = _null_if_dash(c.take_plain("type"))
    out["timestamp"] = _null_if_dash(c.take_plain("timestamp"))
    out["elb"] = _null_if_dash(c.take_plain("elb"))
    out["client_host"] = _null_if_dash(c.take_plain("client_host"))
    out["target_host"] = _null_if_dash(c.take_plain("target_host"))
    for f in ("request_processing_time", "target_processing_time",
              "response_processing_time"):
        v = c.take_plain(f)
        try:
            out[f] = float(v)
        except ValueError as e:
            raise VrlError(f"failed to get field `{f}`") from e
    out["elb_status_code"] = _null_if_dash(c.take_plain("elb_status_code"))
    out["target_status_code"] = _null_if_dash(c.take_plain("target_status_code"))
    for f in ("received_bytes", "sent_bytes"):
        v = c.take_plain(f)
        try:
            out[f] = int(v)
        except ValueError as e:
            raise VrlError(f"failed to get field `{f}`") from e
    request = c.take_quoted("request")
    parts = request.split(" ", 1)
    out["request_method"] = _null_if_dash(parts[0])
    if len(parts) < 2:
        raise VrlError("failed to get field `request_url`")
    url_proto = parts[1].rsplit(" ", 1)
    if len(url_proto) < 2:
        raise VrlError("failed to get field `request_url`")
    out["request_url"] = url_proto[0]
    out["request_protocol"] = _null_if_dash(url_proto[1])
    out["user_agent"] = _null_if_dash(c.take_quoted("user_agent"))
    out["ssl_cipher"] = _null_if_dash(c.take_plain("ssl_cipher"))
    out["ssl_protocol"] = _null_if_dash(c.take_plain("ssl_protocol"))
    out["target_group_arn"] = _null_if_dash(c.take_plain("target_group_arn"))
    out["trace_id"] = _null_if_dash(c.take_quoted("trace_id"))
    out["domain_name"] = _null_if_dash(c.take_quoted("domain_name"))
    out["chosen_cert_arn"] = _null_if_dash(c.take_quoted("chosen_cert_arn"))
    out["matched_rule_priority"] = _null_if_dash(c.take_plain("matched_rule_priority"))
    out["request_creation_time"] = _null_if_dash(c.take_plain("request_creation_time"))
    out["actions_executed"] = _null_if_dash(c.take_quoted("actions_executed"))
    out["redirect_url"] = _null_if_dash(c.take_quoted("redirect_url"))
    out["error_reason"] = _null_if_dash(c.take_quoted("error_reason"))
    for f in ("target_port_list", "target_status_code_list"):
        # maybe-quoted space-separated list; "-" → []
        if c.s[c.i:c.i + 2] == ' "':
            raw = c.take_quoted(f)
        else:
            raw = c.take_plain(f)
        out[f] = [] if raw == "-" else raw.split()
    if c.s[c.i:c.i + 2] == ' "':
        out["classification"] = _null_if_dash(c.take_quoted("classification"))
        out["classification_reason"] = _null_if_dash(c.take_quoted("classification_reason"))
    else:
        out["classification"] = None
        out["classification_reason"] = None
    # traceability_id: ` TID_xxx` token or nothing (take_tid_or_nothing)
    if c.s[c.i:].startswith(" TID_"):
        out["traceability_id"] = c.take_plain("traceability_id")
    else:
        out["traceability_id"] = None
    rest = c.s[c.i:]
    if rest and strict_mode:
        raise VrlError(f'Log should be fully consumed: "{rest}"')
    return out


# ---------------------------------------------------------------------------
# parse_aws_vpc_flow_log (parse_aws_vpc_flow_log.rs): positional
# fields per a (customizable) format string; `-` → null; typed per
# field name.

_VPC_DEFAULT_FORMAT = ("version account_id interface_id srcaddr dstaddr "
                       "srcport dstport protocol packets bytes start end "
                       "action log_status")

_VPC_INT_FIELDS = {"version", "srcport", "dstport", "protocol", "packets",
                   "bytes", "start", "end", "tcp_flags",
                   "traffic_path", "encryption_status"}


def parse_aws_vpc_flow_log(value: str, format: Optional[str] = None) -> dict:
    names = (format or _VPC_DEFAULT_FORMAT).split()
    toks = value.split()
    if len(toks) != len(names):
        raise VrlError(
            f"value contains {len(toks)} fields, but format has {len(names)}")
    out: dict[str, Any] = {}
    for name, tok in zip(names, toks):
        if tok == "-":
            out[name] = None
        elif name in _VPC_INT_FIELDS:
            try:
                out[name] = int(tok)
            except ValueError as e:
                raise VrlError(f"failed to parse value as i64 (field `{name}`)") from e
        else:
            out[name] = tok
    return out


# ---------------------------------------------------------------------------
# parse_aws_cloudwatch_log_subscription_message
# (parse_aws_cloudwatch_log_subscription_message.rs): typed JSON view
# of a CloudWatch Logs subscription payload.

def _serde_json_err(e: ValueError) -> str:
    """Map Python json.JSONDecodeError onto serde_json's message +
    'at line L column C' form (the texts the reference interpolates)."""
    msg, line, col = getattr(e, "msg", str(e)), \
        getattr(e, "lineno", 1), getattr(e, "colno", 1)
    table = {
        "Expecting property name enclosed in double quotes":
            "key must be a string",
        "Expecting value": "expected value",
        "Expecting ',' delimiter": "expected `,` or `}`",
        "Expecting ':' delimiter": "expected `:`",
        "Unterminated string starting at": "EOF while parsing a string",
    }
    what = next((v for k, v in table.items() if msg.startswith(k)), msg)
    return f"{what} at line {line} column {col}"


def parse_aws_cloudwatch_log_subscription_message(value: str) -> dict:
    try:
        d = _json.loads(value)
    except ValueError as e:
        raise VrlError(f"unable to parse: {_serde_json_err(e)}") from e
    if not isinstance(d, dict):
        # serde: invalid type: <kind> `<value>`, expected struct ...
        # (positioned at the end of the offending top-level token)
        kind = {bool: "boolean", int: "integer", float: "floating point",
                str: "string", list: "sequence"}.get(
            type(d), "null" if d is None else "value")
        shown = _json.dumps(d) if isinstance(d, str) else \
            _json.dumps(d) if isinstance(d, bool) else d
        raise VrlError(
            f"unable to parse: invalid type: {kind} `{shown}`, "
            "expected struct AwsCloudWatchLogsSubscriptionMessage "
            f"at line 1 column {len(value.strip())}")
    try:
        events = [
            {
                "id": ev["id"],
                "timestamp": datetime.fromtimestamp(
                    ev["timestamp"] / 1000.0, tz=timezone.utc),
                "message": ev["message"],
            }
            for ev in d["logEvents"]
        ]
        return {
            "owner": d["owner"],
            "message_type": d["messageType"],
            "log_group": d["logGroup"],
            "log_stream": d["logStream"],
            "subscription_filters": d["subscriptionFilters"],
            "log_events": events,
        }
    except (KeyError, TypeError) as e:
        raise VrlError(f"unable to parse: missing field {e}") from e


# ---------------------------------------------------------------------------
# parse_influxdb (parse_influxdb.rs): InfluxDB line protocol →
# vector-metric-shaped objects (one per field; name =
# measurement_field; bools → 1.0/0.0 gauges).

def _influx_split(s: str, sep: str) -> list[str]:
    """Split on unescaped `sep` (line protocol escapes with \\)."""
    parts, cur, i = [], [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(c)
            cur.append(s[i + 1])
            i += 2
            continue
        if c == sep:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _influx_unescape(s: str) -> str:
    return _re.sub(r"\\([,= ])", r"\1", s)


def parse_influxdb(value: str) -> list:
    # measurement[,tag=v...] field=v[,field=v...] [timestamp]
    head_fields = _influx_split(value.strip(), " ")
    head_fields = [p for p in head_fields if p != ""]
    if len(head_fields) < 2:
        # influxdb_line_protocol::Error::FieldSetMissing Display,
        # wrapped by parse_influxdb.rs:118
        raise VrlError(
            "InfluxDB line protocol parsing error: No fields were provided")
    head = head_fields[0]
    fields_part = head_fields[1]
    ts = None
    if len(head_fields) >= 3:
        try:
            ns = int(head_fields[2])
        except ValueError as e:
            raise VrlError("InfluxDB line protocol parsing error: "
                           f"invalid timestamp: {head_fields[2]}") from e
        ts = datetime.fromtimestamp(ns / 1e9, tz=timezone.utc)
        # preserve sub-microsecond truncation like the reference (ns→µs)
        ts = ts.replace(microsecond=(ns // 1000) % 1_000_000)

    head_parts = _influx_split(head, ",")
    measurement = _influx_unescape(head_parts[0])
    tags = {}
    for t in head_parts[1:]:
        kv = _influx_split(t, "=")
        if len(kv) != 2:
            raise VrlError("InfluxDB line protocol parsing error: "
                           f"invalid tag: {t}")
        tags[_influx_unescape(kv[0])] = _influx_unescape(kv[1])

    out = []
    for f in _influx_split(fields_part, ","):
        kv = _influx_split(f, "=")
        if len(kv) != 2:
            raise VrlError("InfluxDB line protocol parsing error: "
                           f"invalid field: {f}")
        k = _influx_unescape(kv[0])
        raw = kv[1]
        if raw.startswith('"') and raw.endswith('"'):
            # parse_influxdb.rs:79 — string field values are an ERROR
            raise VrlError(
                "Error while converting InfluxDB line protocol metric "
                "to Vector's metric model: field set values of type "
                "string are not supported")
        if raw in ("t", "T", "true", "True", "TRUE"):
            v = 1.0
        elif raw in ("f", "F", "false", "False", "FALSE"):
            v = 0.0
        elif raw.endswith(("i", "u")):
            try:
                v = float(int(raw[:-1]))
            except ValueError as e:
                raise VrlError("InfluxDB line protocol parsing error: "
                               f"invalid field value: {raw}") from e
        else:
            try:
                v = float(raw)
            except ValueError as e:
                raise VrlError("InfluxDB line protocol parsing error: "
                               f"invalid field value: {raw}") from e
        item: dict[str, Any] = {"name": f"{measurement}_{k}"}
        if tags:
            # parse_influxdb.rs: the tags key is OMITTED when empty
            item["tags"] = tags
        item["kind"] = "absolute"
        item["gauge"] = {"value": v}
        if ts is not None:
            item["timestamp"] = ts
        out.append(item)
    return out
