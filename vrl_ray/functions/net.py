"""Network I/O stdlib functions: ``dns_lookup`` (reference
src/stdlib/dns_lookup.rs), ``reverse_dns`` (reverse_dns.rs) and
``http_request`` (http_request.rs) — REAL implementations with a
pluggable I/O backend.

The reference performs live I/O (domain crate stub resolver, reqwest
client). Here the protocol work is real — a pure-Python RFC 1035 wire
codec and stdlib urllib transport — and the TRANSPORT is injectable:

- ``SystemDnsBackend`` (default): UDP/TCP stub resolver over stdlib
  sockets against /etc/resolv.conf (or ``options.servers``); on a
  network-enabled deployment this resolves for real, in a sandboxed
  one the failure surfaces as the reference's error-as-value
  (``query failed: …``) — never an exception out of a stage.
- ``StaticDnsBackend(zones)``: deterministic in-process zone table —
  what tests and air-gapped pipelines inject via
  :func:`set_dns_backend`.
- ``SystemHttpBackend`` / ``StaticHttpBackend`` mirror the same split
  for ``http_request``.

Response shapes match the reference exactly: dns_lookup returns the
full answer object (fullRcode/rcodeName/header/question/answers/
authority/additional — dns_lookup.rs parse_answer:158-215),
reverse_dns returns the bare hostname string, http_request the
response body string with sensitive-header redaction in error texts
(http_request.rs:57-80).
"""

from __future__ import annotations

import ipaddress
import socket
import struct
from typing import Any, Callable, Optional

from ..value import VrlError

# ---------------------------------------------------------------------------
# RFC 1035 wire codec

_QTYPES = {
    "A": 1, "NS": 2, "CNAME": 5, "SOA": 6, "PTR": 12, "HINFO": 13,
    "MX": 15, "TXT": 16, "AAAA": 28, "SRV": 33, "OPT": 41, "DS": 43,
    "RRSIG": 46, "NSEC": 47, "DNSKEY": 48, "SVCB": 64, "HTTPS": 65,
    "CAA": 257, "ANY": 255,
}
_QTYPE_NAMES = {v: k for k, v in _QTYPES.items()}
_QCLASSES = {"IN": 1, "CH": 3, "HS": 4, "NONE": 254, "ANY": 255}
_QCLASS_NAMES = {v: k for k, v in _QCLASSES.items()}
_RCODES = {0: "NOERROR", 1: "FORMERR", 2: "SERVFAIL", 3: "NXDOMAIN",
           4: "NOTIMP", 5: "REFUSED", 6: "YXDOMAIN", 7: "YXRRSET",
           8: "NXRRSET", 9: "NOTAUTH", 10: "NOTZONE"}


def _parse_qtype(qtype: str) -> int:
    q = qtype.upper()
    if q in _QTYPES:
        return _QTYPES[q]
    if q.startswith("TYPE") and q[4:].isdigit():
        return int(q[4:])
    raise VrlError(f"parsing query type failed: unknown type {qtype}")


def _parse_qclass(qclass: str) -> int:
    c = qclass.upper()
    if c in _QCLASSES:
        return _QCLASSES[c]
    if c.startswith("CLASS") and c[5:].isdigit():
        return int(c[5:])
    raise VrlError(f"parsing query class failed: unknown class {qclass}")


def _encode_name(name: str) -> bytes:
    out = bytearray()
    name = name.rstrip(".")
    if name:
        for label in name.split("."):
            raw = label.encode("idna") if not label.isascii() \
                else label.encode()
            if not 0 < len(raw) < 64:
                raise VrlError(
                    f"parsing host name failed: bad label {label!r}")
            out.append(len(raw))
            out += raw
    out.append(0)
    return bytes(out)


def encode_query(name: str, qtype: int, qclass: int, *, qid: int = 0,
                 rd: bool = True) -> bytes:
    flags = 0x0100 if rd else 0
    head = struct.pack(">HHHHHH", qid, flags, 1, 0, 0, 0)
    return head + _encode_name(name) + struct.pack(">HH", qtype, qclass)


def _decode_name(data: bytes, pos: int) -> tuple[str, int]:
    """Decompressing name reader → (dotted name, next position)."""
    labels = []
    jumps = 0
    end = None
    while True:
        if pos >= len(data):
            raise VrlError("parsing response sections failed: truncated")
        ln = data[pos]
        if ln & 0xC0 == 0xC0:           # compression pointer
            if pos + 1 >= len(data):
                raise VrlError(
                    "parsing response sections failed: bad pointer")
            target = ((ln & 0x3F) << 8) | data[pos + 1]
            if end is None:
                end = pos + 2
            pos = target
            jumps += 1
            if jumps > 64:
                raise VrlError(
                    "parsing response sections failed: pointer loop")
            continue
        pos += 1
        if ln == 0:
            break
        labels.append(data[pos:pos + ln].decode("ascii", "replace"))
        pos += ln
    return ".".join(labels), (end if end is not None else pos)


def _render_rdata(rtype: int, data: bytes, rd_start: int, rd_len: int,
                  whole: bytes) -> str:
    """Human-readable rData per record type — mirrors the Display
    impls the reference's ``AllRecordData`` stringification uses."""
    rd = whole[rd_start:rd_start + rd_len]
    try:
        if rtype == 1 and rd_len == 4:              # A
            return str(ipaddress.IPv4Address(rd))
        if rtype == 28 and rd_len == 16:            # AAAA
            return str(ipaddress.IPv6Address(rd))
        if rtype in (2, 5, 12):                     # NS / CNAME / PTR
            return _decode_name(whole, rd_start)[0]
        if rtype == 15:                             # MX
            pref = struct.unpack(">H", rd[:2])[0]
            return f"{pref} {_decode_name(whole, rd_start + 2)[0]}"
        if rtype == 16:                             # TXT
            out, p = [], 0
            while p < len(rd):
                ln = rd[p]
                out.append(rd[p + 1:p + 1 + ln].decode("utf-8", "replace"))
                p += 1 + ln
            return "".join(out)
        if rtype == 6:                              # SOA
            mname, p = _decode_name(whole, rd_start)
            rname, p = _decode_name(whole, p)
            ser, ref, ret, exp, mini = struct.unpack(
                ">IIIII", whole[p:p + 20])
            return f"{mname} {rname} {ser} {ref} {ret} {exp} {mini}"
        if rtype == 33:                             # SRV
            pri, wei, port = struct.unpack(">HHH", rd[:6])
            return (f"{pri} {wei} {port} "
                    f"{_decode_name(whole, rd_start + 6)[0]}")
        if rtype == 41:                             # OPT pseudo-record
            return "OPT ..."
    except (struct.error, ValueError, VrlError):
        pass
    return rd.hex()


def decode_response(data: bytes) -> dict:
    """Wire response → the reference's answer object
    (dns_lookup.rs parse_answer:158-215 / parse_record_section).
    Malformed bytes raise VrlError ONLY (error-as-value contract)."""
    try:
        return _decode_response(data)
    except struct.error:
        raise VrlError(
            "parsing response sections failed: truncated record")
    except IndexError:
        raise VrlError(
            "parsing response sections failed: truncated response")


def _decode_response(data: bytes) -> dict:
    if len(data) < 12:
        raise VrlError("query failed: truncated response")
    (qid, flags, qd, an, ns, ar) = struct.unpack(">HHHHHH", data[:12])
    rcode = flags & 0xF
    header = {
        "aa": bool(flags & 0x0400), "ad": bool(flags & 0x0020),
        "cd": bool(flags & 0x0010), "ra": bool(flags & 0x0080),
        "rd": bool(flags & 0x0100), "tc": bool(flags & 0x0200),
        "qr": bool(flags & 0x8000),
        "opcode": (flags >> 11) & 0xF, "rcode": rcode,
        "anCount": an, "arCount": ar, "nsCount": ns, "qdCount": qd,
    }
    pos = 12
    question = []
    for _ in range(qd):
        qname, pos = _decode_name(data, pos)
        qtype, qclass = struct.unpack(">HH", data[pos:pos + 4])
        pos += 4
        question.append({
            "class": _QCLASS_NAMES.get(qclass, f"CLASS{qclass}"),
            "domainName": qname,
            "questionType": _QTYPE_NAMES.get(qtype, f"TYPE{qtype}"),
            "questionTypeId": qtype,
        })

    def read_section(count: int, pos: int) -> tuple[list, int]:
        recs = []
        for _ in range(count):
            rname, pos = _decode_name(data, pos)
            rtype, rclass, ttl, rd_len = struct.unpack(
                ">HHIH", data[pos:pos + 10])
            pos += 10
            recs.append({
                "class": _QCLASS_NAMES.get(rclass, f"CLASS{rclass}"),
                "domainName": rname,
                "rData": _render_rdata(rtype, data, pos, rd_len, data),
                "recordType": _QTYPE_NAMES.get(rtype, f"TYPE{rtype}"),
                "recordTypeId": rtype,
                "ttl": ttl,
            })
            pos += rd_len
        return recs, pos

    answers, pos = read_section(an, pos)
    authority, pos = read_section(ns, pos)
    additional, pos = read_section(ar, pos)
    return {
        "fullRcode": rcode,
        "rcodeName": _RCODES.get(rcode, str(rcode)),
        "header": header,
        "question": question,
        "answers": answers,
        "authority": authority,
        "additional": additional,
    }


# ---------------------------------------------------------------------------
# DNS backends

class SystemDnsBackend:
    """Stub resolver over stdlib sockets (UDP with TCP fallback on
    truncation), servers from /etc/resolv.conf unless overridden."""

    def _servers(self, options: dict) -> list[tuple[str, int]]:
        servers = []
        for s in options.get("servers") or []:
            host, _, port = str(s).partition(":")
            servers.append((host, int(port) if port else 53))
        if servers:
            return servers
        try:
            with open("/etc/resolv.conf") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2 and parts[0] == "nameserver":
                        servers.append((parts[1], 53))
        except OSError:
            pass
        return servers or [("127.0.0.53", 53)]

    def query(self, name: str, qtype: int, qclass: int,
              options: dict) -> dict:
        timeout = float(options.get("timeout", 5))
        attempts = int(options.get("attempts", 2))
        use_tcp = bool(options.get("tcp", False))
        rd = bool(options.get("recurse", True))
        import os as _os
        qid = int.from_bytes(_os.urandom(2), "big")
        msg = encode_query(name, qtype, qclass, qid=qid, rd=rd)
        last_err: Optional[str] = None
        for server in self._servers(options):
            for _ in range(max(1, attempts)):
                try:
                    if use_tcp:
                        data = self._tcp(msg, server, timeout)
                    else:
                        data = self._udp(msg, server, timeout, qid)
                        if len(data) >= 4 and (data[2] & 0x02):  # TC
                            data = self._tcp(msg, server, timeout)
                    return decode_response(data)
                except (OSError, socket.timeout) as e:
                    last_err = str(e) or type(e).__name__
        raise VrlError(f"query failed: {last_err or 'no nameservers'}")

    @staticmethod
    def _udp(msg: bytes, server: tuple[str, int], timeout: float,
             qid: int) -> bytes:
        import time as _time

        fam = socket.AF_INET6 if ":" in server[0] else socket.AF_INET
        with socket.socket(fam, socket.SOCK_DGRAM) as s:
            s.settimeout(timeout)
            s.sendto(msg, server)
            # discard datagrams whose id doesn't match the query —
            # late answers from a previous timed-out attempt (or stray
            # packets on the ephemeral port) must not be attributed to
            # this name (the reference's resolver does the same check)
            deadline = _time.monotonic() + timeout
            while True:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    raise socket.timeout("timed out")
                s.settimeout(remaining)
                data = s.recv(4096)
                if len(data) >= 2 and \
                        int.from_bytes(data[:2], "big") == qid:
                    return data

    @staticmethod
    def _tcp(msg: bytes, server: tuple[str, int], timeout: float) -> bytes:
        fam = socket.AF_INET6 if ":" in server[0] else socket.AF_INET
        with socket.socket(fam, socket.SOCK_STREAM) as s:
            s.settimeout(timeout)
            s.connect(server)
            s.sendall(struct.pack(">H", len(msg)) + msg)
            hdr = s.recv(2)
            if len(hdr) < 2:
                raise OSError("connection closed before length prefix")
            ln = struct.unpack(">H", hdr)[0]
            buf = b""
            while len(buf) < ln:
                chunk = s.recv(ln - len(buf))
                if not chunk:
                    break
                buf += chunk
            return buf

    def lookup_addr(self, ip: str) -> str:
        try:
            return socket.gethostbyaddr(ip)[0]
        except OSError as e:
            raise VrlError(f"unable to perform a lookup : {e}")


class StaticDnsBackend:
    """Deterministic zone table: ``zones[(name, qtype)] -> list of
    (ttl, rdata)`` (or bare rdata strings, ttl 300). Synthesizes the
    same response shape the wire path decodes — inject via
    :func:`set_dns_backend` for tests / air-gapped runs."""

    def __init__(self, zones: dict, ptr: Optional[dict] = None):
        self.zones = {(k[0].rstrip(".").lower(), k[1].upper()): v
                      for k, v in zones.items()}
        self.ptr = {k: v for k, v in (ptr or {}).items()}

    def query(self, name: str, qtype: int, qclass: int,
              options: dict) -> dict:
        qtype_name = _QTYPE_NAMES.get(qtype, f"TYPE{qtype}")
        key = (name.rstrip(".").lower(), qtype_name)
        recs = self.zones.get(key)
        rcode = 0 if recs is not None else 3      # NXDOMAIN
        answers = []
        for r in recs or []:
            ttl, rdata = r if isinstance(r, tuple) else (300, r)
            answers.append({
                "class": _QCLASS_NAMES.get(qclass, f"CLASS{qclass}"),
                "domainName": name.rstrip("."),
                "rData": str(rdata),
                "recordType": qtype_name,
                "recordTypeId": qtype,
                "ttl": int(ttl),
            })
        return {
            "fullRcode": rcode,
            "rcodeName": _RCODES.get(rcode, str(rcode)),
            "header": {
                "aa": True, "ad": False, "cd": False, "ra": True,
                "rd": True, "tc": False, "qr": True, "opcode": 0,
                "rcode": rcode, "anCount": len(answers), "arCount": 0,
                "nsCount": 0, "qdCount": 1,
            },
            "question": [{
                "class": _QCLASS_NAMES.get(qclass, f"CLASS{qclass}"),
                "domainName": name.rstrip("."),
                "questionType": qtype_name,
                "questionTypeId": qtype,
            }],
            "answers": answers,
            "authority": [],
            "additional": [],
        }

    def lookup_addr(self, ip: str) -> str:
        host = self.ptr.get(ip)
        if host is None:
            raise VrlError(
                "unable to perform a lookup : no PTR record")
        return host


_DNS_BACKEND: Any = SystemDnsBackend()
_HTTP_BACKEND: Any = None  # created lazily below


def set_dns_backend(backend) -> None:
    """Inject a DNS backend (``query``/``lookup_addr`` duck type).
    Pass None to restore the system resolver."""
    global _DNS_BACKEND
    _DNS_BACKEND = backend if backend is not None else SystemDnsBackend()


# ---------------------------------------------------------------------------
# stdlib functions

def dns_lookup(value: str, qtype: str = "A", qclass: str = "IN",
               options: Optional[dict] = None) -> dict:
    if not isinstance(value, str):
        raise VrlError("expected string")
    host = value.strip()
    try:
        _encode_name(host)
    except VrlError:
        raise
    except Exception as e:  # idna etc.
        raise VrlError(f"parsing host name failed: {e}")
    t = _parse_qtype(qtype if isinstance(qtype, str) else str(qtype))
    c = _parse_qclass(qclass if isinstance(qclass, str) else str(qclass))
    opts = dict(options or {})
    for int_opt in ("ndots", "attempts", "timeout"):
        if int_opt in opts and (not isinstance(opts[int_opt], int)
                                or opts[int_opt] < 0):
            raise VrlError(f"{int_opt} has to be a positive integer, "
                           f"got: {opts[int_opt]}")
    return _DNS_BACKEND.query(host, t, c, opts)


def reverse_dns(value: str) -> str:
    if not isinstance(value, str):
        raise VrlError("expected string")
    try:
        ipaddress.ip_address(value)
    except ValueError as e:
        raise VrlError(f"unable to parse IP address: {e}")
    return _DNS_BACKEND.lookup_addr(value)


# ---------------------------------------------------------------------------
# HTTP

_SENSITIVE_HEADERS = {"authorization", "cookie", "set-cookie",
                      "x-api-key", "api-key", "x-auth-token",
                      "proxy-authorization"}


def _redact_headers(headers: dict, redact: bool) -> dict:
    """http_request.rs:57-80: sensitive header values become ``***``
    in error messages."""
    if not redact:
        return dict(headers)
    out = {}
    for k, v in headers.items():
        kl = str(k).lower()
        if kl in _SENSITIVE_HEADERS or "token" in kl or "secret" in kl \
                or "password" in kl:
            out[k] = "***"
        else:
            out[k] = v
    return out


class SystemHttpBackend:
    """stdlib urllib transport (proxy-aware). Returns the body text;
    transport failures raise with the reference's message shape."""

    def request(self, url: str, method: str, headers: dict, body: str,
                proxies: dict) -> str:
        import urllib.error
        import urllib.request

        handlers = []
        if proxies:
            handlers.append(urllib.request.ProxyHandler(proxies))
        opener = urllib.request.build_opener(*handlers)
        req = urllib.request.Request(
            url, data=body.encode() if body else None,
            headers={str(k): str(v) for k, v in headers.items()},
            method=method.upper())
        try:
            with opener.open(req, timeout=30) as resp:
                return resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            # reqwest yields the body for non-2xx too (no error_for_status)
            try:
                return e.read().decode("utf-8", "replace")
            except Exception:
                raise OSError(str(e))


class StaticHttpBackend:
    """Deterministic handler table for tests / air-gapped runs:
    ``handlers[url]`` or a ``(url, method, headers, body) -> str``
    callable registered as the fallback."""

    def __init__(self, handlers: Optional[dict] = None,
                 fallback: Optional[Callable] = None):
        self.handlers = dict(handlers or {})
        self.fallback = fallback

    def request(self, url: str, method: str, headers: dict, body: str,
                proxies: dict) -> str:
        h = self.handlers.get(url)
        if h is not None:
            return h(url, method, headers, body) if callable(h) else str(h)
        if self.fallback is not None:
            return str(self.fallback(url, method, headers, body))
        raise OSError(f"no handler for {url}")


def set_http_backend(backend) -> None:
    """Inject an HTTP backend (``request`` duck type). Pass None to
    restore the system transport."""
    global _HTTP_BACKEND
    _HTTP_BACKEND = backend if backend is not None else SystemHttpBackend()


_HTTP_BACKEND = SystemHttpBackend()

_HTTP_METHODS = {"get", "post", "put", "delete", "head", "options",
                 "patch", "trace", "connect"}


def http_request(url: str, method: str = "get",
                 headers: Optional[dict] = None, body: str = "",
                 http_proxy: Optional[str] = None,
                 https_proxy: Optional[str] = None,
                 redact_headers: bool = True) -> str:
    if not isinstance(url, str):
        raise VrlError("expected string")
    headers = dict(headers or {})
    m = str(method).lower()
    if m not in _HTTP_METHODS:
        raise VrlError(f"Unsupported HTTP method: {method}")
    for k, v in headers.items():
        if not isinstance(v, (str, bytes)):
            raise VrlError(
                f"Invalid header value for key '{k}' (headers: "
                f"{_redact_headers(headers, redact_headers)})")
    proxies = {}
    if http_proxy:
        proxies["http"] = http_proxy
    if https_proxy:
        proxies["https"] = https_proxy
    try:
        return _HTTP_BACKEND.request(url, m, headers, body or "", proxies)
    except Exception as e:
        raise VrlError(
            f"HTTP request failed: {e} (url: {url}, method: "
            f"{m.upper()}, headers: "
            f"{_redact_headers(headers, redact_headers)})")
