"""Network stdlib functions (r4): pure-Python RFC 1035 stub resolver
+ pluggable backends (reference src/stdlib/dns_lookup.rs,
reverse_dns.rs, http_request.rs). The wire path is exercised against
a REAL loopback UDP server; the static backends cover the air-gapped
injection point."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from vrl_ray.functions.net import (StaticDnsBackend, StaticHttpBackend,
                                   decode_response, dns_lookup,
                                   encode_query, http_request,
                                   reverse_dns, set_dns_backend,
                                   set_http_backend)
from vrl_ray.value import VrlError


def _canned_response(query: bytes) -> bytes:
    """NOERROR answer for any A query: two A records + a CNAME using
    a compression pointer back to the question name."""
    qid = query[:2]
    # header: QR|RD|RA, rcode 0, 1 question, 3 answers
    head = qid + struct.pack(">HHHHH", 0x8180, 1, 3, 0, 0)
    # echo the question section (starts at offset 12 in the query)
    question = query[12:]
    out = head + question
    name_ptr = struct.pack(">H", 0xC00C)      # pointer to qname @12
    a1 = name_ptr + struct.pack(">HHIH", 1, 1, 600, 4) + bytes(
        [93, 184, 216, 34])
    a2 = name_ptr + struct.pack(">HHIH", 1, 1, 600, 4) + bytes(
        [93, 184, 216, 35])
    cname_rd = b"\x03www" + struct.pack(">H", 0xC00C)[:0] + b"\xc0\x0c"
    cname = name_ptr + struct.pack(">HHIH", 5, 1, 300,
                                   len(cname_rd)) + cname_rd
    return out + a1 + a2 + cname


class TestWireCodec:
    def test_roundtrip_with_compression_pointers(self):
        q = encode_query("example.com", 1, 1, qid=42)
        r = decode_response(_canned_response(q))
        assert r["rcodeName"] == "NOERROR"
        assert r["header"]["anCount"] == 3
        assert r["question"][0] == {"class": "IN",
                                    "domainName": "example.com",
                                    "questionType": "A",
                                    "questionTypeId": 1}
        assert [a["rData"] for a in r["answers"][:2]] == [
            "93.184.216.34", "93.184.216.35"]
        assert r["answers"][0]["ttl"] == 600
        # CNAME rData decompresses through the pointer
        assert r["answers"][2]["recordType"] == "CNAME"
        assert r["answers"][2]["rData"] == "www.example.com"

    def test_bad_qtype_and_host_errors(self):
        with pytest.raises(VrlError, match="parsing query type failed"):
            dns_lookup("example.com", qtype="BOGUS")
        with pytest.raises(VrlError, match="parsing query class failed"):
            dns_lookup("example.com", qclass="WAT")
        with pytest.raises(VrlError, match="parsing host name failed"):
            dns_lookup("a" * 80 + ".com")


class TestSystemBackendLoopback:
    """Drive the REAL socket path against an in-test UDP server."""

    def test_udp_query_roundtrip(self):
        srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]

        def serve():
            data, addr = srv.recvfrom(4096)
            srv.sendto(_canned_response(data), addr)

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        try:
            r = dns_lookup("example.com",
                           options={"servers": [f"127.0.0.1:{port}"],
                                    "timeout": 5})
        finally:
            t.join(timeout=5)
            srv.close()
        assert r["rcodeName"] == "NOERROR"
        assert r["answers"][0]["rData"] == "93.184.216.34"
        assert r["header"]["qr"] is True

    def test_unreachable_server_is_error_as_value(self):
        with pytest.raises(VrlError, match="query failed"):
            dns_lookup("example.com",
                       options={"servers": ["127.0.0.1:1"],
                                "timeout": 1, "attempts": 1})


class TestStaticBackends:
    def teardown_method(self):
        set_dns_backend(None)
        set_http_backend(None)

    def test_static_zones_full_shape(self):
        set_dns_backend(StaticDnsBackend(
            {("dns.google", "A"): [(600, "8.8.8.8")],
             ("example.com", "MX"): ["10 mail.example.com"]},
            ptr={"127.0.0.1": "localhost"}))
        r = dns_lookup("dns.google")
        # the reference's answer-object shape (dns_lookup.rs:158-215)
        assert set(r) == {"fullRcode", "rcodeName", "header", "question",
                          "answers", "authority", "additional"}
        assert set(r["header"]) == {"aa", "ad", "cd", "ra", "rd", "tc",
                                    "qr", "opcode", "rcode", "anCount",
                                    "arCount", "nsCount", "qdCount"}
        assert r["answers"][0] == {"class": "IN",
                                   "domainName": "dns.google",
                                   "rData": "8.8.8.8",
                                   "recordType": "A", "recordTypeId": 1,
                                   "ttl": 600}
        mx = dns_lookup("example.com", qtype="MX")
        assert mx["answers"][0]["rData"] == "10 mail.example.com"
        assert dns_lookup("nope.invalid")["rcodeName"] == "NXDOMAIN"

    def test_reverse_dns(self):
        set_dns_backend(StaticDnsBackend({}, ptr={"127.0.0.1": "localhost"}))
        assert reverse_dns("127.0.0.1") == "localhost"
        with pytest.raises(VrlError, match="unable to parse IP address"):
            reverse_dns("not.an.ip.addr")
        with pytest.raises(VrlError, match="unable to perform a lookup"):
            reverse_dns("10.9.9.9")

    def test_http_static_and_redaction(self):
        set_http_backend(StaticHttpBackend(
            {"https://api.test/get": '{"ok":true}'}))
        assert http_request("https://api.test/get") == '{"ok":true}'
        with pytest.raises(VrlError) as ei:
            http_request("https://api.test/missing",
                         headers={"Authorization": "Bearer sekret",
                                  "X-Trace": "t1"})
        msg = str(ei.value)
        # http_request.rs:57-80 — sensitive values never reach errors
        assert "sekret" not in msg and "***" in msg and "t1" in msg
        assert msg.startswith("HTTP request failed:")

    def test_http_bad_method(self):
        with pytest.raises(VrlError, match="Unsupported HTTP method"):
            http_request("https://api.test/x", method="yolo")

    def test_language_surface(self):
        """dns_lookup through the VRL interpreter (error-as-value on
        capture, object result on success)."""
        set_dns_backend(StaticDnsBackend(
            {("svc.internal", "A"): [(60, "10.0.0.5")]}))
        from vrl_ray.lang import compile_program

        p = compile_program(
            '.res, .err = dns_lookup(.host)\n'
            '.ip = .res.answers[0].rData')
        _, ev, _ = p.resolve({"host": "svc.internal"})
        assert ev["ip"] == "10.0.0.5" and ev["err"] is None


class TestMalformedResponses:
    """r4 review fixes: malformed wire bytes surface as VrlError only
    (never struct.error), and stray datagrams with a wrong query id
    are discarded, not attributed to the query."""

    def test_truncated_record_is_vrl_error(self):
        q = encode_query("x.com", 1, 1, qid=3)
        bad = q[:2] + struct.pack(">HHHHH", 0x8180, 1, 3, 0, 0) \
            + q[12:] + b"\xc0\x0c\x00\x01"
        with pytest.raises(VrlError, match="truncated"):
            decode_response(bad)

    def test_udp_discards_wrong_qid(self):
        srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]

        def serve():
            data, addr = srv.recvfrom(4096)
            # first a stray datagram with a mismatched id...
            stray = _canned_response(b"\xde\xad" + data[2:])
            srv.sendto(stray, addr)
            # ...then the real answer
            srv.sendto(_canned_response(data), addr)

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        try:
            r = dns_lookup("example.com",
                           options={"servers": [f"127.0.0.1:{port}"],
                                    "timeout": 5})
        finally:
            t.join(timeout=5)
            srv.close()
        assert r["rcodeName"] == "NOERROR"
        assert r["answers"][0]["rData"] == "93.184.216.34"
