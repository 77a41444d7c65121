"""Unit tests for the extended stdlib surface (vendor log parsers,
structured-data codecs, crypto, Datadog grok/query) — vectors beyond
the docs-example conformance suite."""

from __future__ import annotations

import base64
from datetime import datetime, timezone

import pytest

from vrl_ray.functions import REGISTRY as R
from vrl_ray.value import VrlError


class TestLogParsers:
    def test_apache_common_dash_fields(self):
        out = R["parse_apache_log"](
            '127.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 -',
            format="common")
        assert out["host"] == "127.0.0.1"
        assert "identity" not in out and "user" not in out and "size" not in out
        assert out["status"] == 200

    def test_nginx_error_fields(self):
        out = R["parse_nginx_log"](
            '2021/04/01 13:02:31 [error] 31#31: *1 oops, client: 1.2.3.4, '
            'server: localhost, request: "POST /x HTTP/1.1", host: "h:8081"',
            format="error")
        assert out["cid"] == 1 and out["pid"] == 31 and out["tid"] == 31
        assert out["client"] == "1.2.3.4"
        assert out["timestamp"].tzinfo is not None

    def test_klog_roundtrip(self):
        out = R["parse_klog"]("E0505 17:59:40.692994   28133 main.go:7] boom")
        assert out["level"] == "error" and out["id"] == 28133
        assert out["file"] == "main.go" and out["line"] == 7

    def test_cef_escapes(self):
        out = R["parse_cef"](
            r"CEF:0|v|p|1|100|Detected a \| pipe|5|msg=a \= b act=ok")
        assert out["name"] == "Detected a | pipe"
        assert out["msg"] == "a = b" and out["act"] == "ok"

    def test_vpc_flow_log_types(self):
        out = R["parse_aws_vpc_flow_log"](
            "2 123456789010 eni-x - - - - - - - 1431280876 1431280934 - NODATA")
        assert out["version"] == 2 and out["srcaddr"] is None
        assert out["start"] == 1431280876

    def test_vpc_flow_log_wrong_arity(self):
        with pytest.raises(VrlError):
            R["parse_aws_vpc_flow_log"]("1 2 3", format="a b")

    def test_influxdb_bool_gauges(self):
        out = R["parse_influxdb"]("m,host=h on=true,off=false 1590488773254420000")
        assert [o["gauge"]["value"] for o in out] == [1.0, 0.0]
        assert out[0]["name"] == "m_on" and out[0]["tags"] == {"host": "h"}


class TestStructuredData:
    def test_ruby_hash_nested(self):
        out = R["parse_ruby_hash"](
            '{ "a" => { "b" => nil, "c" => [1, 2.5, true] }, :sym => "x" }')
        assert out == {"a": {"b": None, "c": [1, 2.5, True]}, "sym": "x"}

    def test_xml_repeated_children(self):
        out = R["parse_xml"]("<r><i>1</i><i>2</i></r>")
        assert out == {"r": {"i": [1, 2]}}

    def test_yaml_scalar(self):
        assert R["parse_yaml"]("42.13") == 42.13

    def test_cbor_roundtrip_map(self):
        assert R["parse_cbor"](base64.b64decode("oWVmaWVsZGV2YWx1ZQ==")) == \
            {"field": "value"}

    def test_etld(self):
        out = R["parse_etld"]("sub.sussex.ac.uk", plus_parts=1)
        assert out == {"etld": "ac.uk", "etld_plus": "sussex.ac.uk",
                       "known_suffix": True}
        assert R["parse_etld"]("vector.acmecorp")["known_suffix"] is False


class TestCrypto:
    KEY16 = "16_byte_keyxxxxx"
    IV16 = "1234567890123456"

    @pytest.mark.parametrize("alg", [
        "AES-128-CBC-PKCS7", "AES-128-CBC-ANSIX923", "AES-128-CBC-ISO7816",
        "AES-128-CBC-ISO10126", "AES-128-CFB", "AES-128-OFB",
        "AES-128-CTR", "AES-128-CTR-BE"])
    def test_encrypt_decrypt_roundtrip(self, alg):
        ct = R["encrypt"]("payload x", alg, key=self.KEY16, iv=self.IV16)
        assert R["decrypt"](ct, alg, key=self.KEY16, iv=self.IV16) == "payload x"

    def test_chacha20poly1305_roundtrip(self):
        key, iv = "k" * 32, "n" * 12
        ct = R["encrypt"]("secret", "CHACHA20-POLY1305", key=key, iv=iv)
        assert R["decrypt"](ct, "CHACHA20-POLY1305", key=key, iv=iv) == "secret"

    def test_bad_key_size(self):
        with pytest.raises(VrlError):
            R["encrypt"]("x", "AES-256-CFB", key="short", iv="0" * 16)

    def test_ipcrypt_deterministic_vectors(self):
        assert R["encrypt_ip"]("192.168.1.1", "sixteen byte key", "aes128") == \
            "72b9:a747:f2e9:72af:76ca:5866:6dcf:c3b0"
        assert R["decrypt_ip"]("72b9:a747:f2e9:72af:76ca:5866:6dcf:c3b0",
                               "sixteen byte key", "aes128") == "192.168.1.1"

    def test_ipcrypt_pfx_vectors(self):
        k = "thirty-two bytes key for pfx use"
        assert R["encrypt_ip"]("192.168.1.1", k, "pfx") == "33.245.248.61"
        assert R["decrypt_ip"]("33.245.248.61", k, "pfx") == "192.168.1.1"
        # prefix preservation: same /24 in, same /24 out
        a = R["encrypt_ip"]("10.1.2.3", k, "pfx")
        b = R["encrypt_ip"]("10.1.2.200", k, "pfx")
        assert a.rsplit(".", 1)[0] == b.rsplit(".", 1)[0]


class TestMisc:
    def test_community_id_vectors(self):
        assert R["community_id"](source_ip="1.2.3.4", destination_ip="5.6.7.8",
                                 source_port=1122, destination_port=3344,
                                 protocol=6) == "1:wCb3OG7yAFWelaUydu0D+125CLM="
        # symmetric under flow direction
        assert R["community_id"](source_ip="5.6.7.8", destination_ip="1.2.3.4",
                                 source_port=3344, destination_port=1122,
                                 protocol=6) == "1:wCb3OG7yAFWelaUydu0D+125CLM="

    def test_haversine(self):
        out = R["haversine"](0.0, 0.0, 10.0, 10.0)
        assert out == {"distance": 1568.5227233, "bearing": 44.561}

    def test_uuid_v7_ordering(self):
        t1 = datetime(2020, 1, 1, tzinfo=timezone.utc)
        t2 = datetime(2021, 1, 1, tzinfo=timezone.utc)
        assert R["uuid_v7"](t1) < R["uuid_v7"](t2)

    def test_random_seeded(self):
        assert R["random_int"](0, 100, seed=7) == R["random_int"](0, 100, seed=7)

    def test_charset_roundtrip(self):
        raw = R["encode_charset"]("안녕하세요", "euc-kr")
        assert R["decode_charset"](raw, "euc-kr") == "안녕하세요"

    def test_split_path_relative(self):
        assert R["split_path"]("a/b/c") == ["a", "b", "c"]

    def test_network_stubs_raise(self):
        for f in ("dns_lookup", "reverse_dns", "http_request"):
            with pytest.raises(VrlError):
                R[f]("example.com")


class TestGroks:
    def test_first_match_wins_and_types(self):
        out = R["parse_groks"](
            "status=404 time=1.5",
            patterns=[r"status=%{integer:status} time=%{number:t}"])
        assert out == {"status": 404, "t": 1.5}

    def test_filters(self):
        out = R["parse_groks"](
            "UP 300",
            patterns=[r"%{word:state:lowercase} %{integer:ms:scale(0.001)}"])
        assert out == {"state": "up", "ms": 0.3}

    def test_nested_destination(self):
        out = R["parse_groks"]("a=1", patterns=[r"a=%{integer:http.status}"])
        assert out == {"http": {"status": 1}}

    def test_cycle_detection(self):
        with pytest.raises(VrlError):
            R["parse_groks"]("x", patterns=["%{a}"],
                             aliases={"a": "%{b}", "b": "%{a}"})

    def test_no_match_errors(self):
        with pytest.raises(VrlError):
            R["parse_groks"]("zzz", patterns=[r"%{integer:n}"])


class TestDatadogQuery:
    E = {"message": "error connecting to db", "status": 500,
         "tags": ["env:prod", "service:api"], "http": {"method": "GET"}}

    @pytest.mark.parametrize("q,want", [
        ("error", True),
        ("warning", False),
        ("error AND db", True),
        ("error AND NOT db", False),
        ("warning OR db", True),
        ("-warning", True),
        ("err*", True),
        ("@status:500", True),
        ("@status:>400", True),
        ("@status:[200 TO 599]", True),
        ("@status:{500 TO 600}", False),
        ("@http.method:GET", True),
        ("@http.method:POST", False),
        ("env:prod", True),
        ("env:dev", False),
        ("service:a*", True),
        ("_exists_:env", True),
        ("_missing_:region", True),
        ("(env:prod OR env:dev) AND @status:500", True),
        ("*", True),
    ])
    def test_queries(self, q, want):
        assert R["match_datadog_query"](self.E, q) is want


class TestDatadogQueryVectorized:
    """compile_query_mask must agree with the row evaluator."""

    def test_mask_matches_row_eval(self):
        import pyarrow as pa

        from vrl_ray.functions.datadog_query import (compile_query_mask,
                                                     match_datadog_query)

        batch = pa.table({
            "event_type": pa.array(["error", "view", None, "click"]),
            "value": pa.array([5.0, 150.0, 99.0, None]),
        })
        queries = ["@event_type:error", "@value:>=100",
                   "@value:[90 TO 160]", "@event_type:err*",
                   "@event_type:error OR @value:>=100",
                   "NOT @event_type:view AND @value:<100",
                   "@event_type:*"]
        rows = batch.to_pylist()
        for q in queries:
            mask = compile_query_mask(q)(batch).to_pylist()
            want = [match_datadog_query(
                {k: v for k, v in r.items() if v is not None}, q)
                for r in rows]
            assert mask == want, q

    def test_numeric_spec_on_string_column_matches_row_eval(self):
        """ADVICE r1: '@value:5' over a STRING column must match '5.0'
        numerically (like _match_scalar), not by exact string
        equality."""
        import pyarrow as pa

        from vrl_ray.functions.datadog_query import (compile_query_mask,
                                                     match_datadog_query)

        vals = ["5.0", "5", "4", "abc", None, "5e0"]
        batch = pa.table({"value": pa.array(vals, pa.string())})
        mask = compile_query_mask("@value:5")(batch).to_pylist()
        want = [match_datadog_query({"value": v} if v is not None else {},
                                    "@value:5") for v in vals]
        assert mask == want

    def test_full_text_not_vectorizable(self):
        import pyarrow as pa
        import pytest as _pytest

        from vrl_ray.functions.datadog_query import (NotVectorizableQuery,
                                                     compile_query_mask)

        batch = pa.table({"message": pa.array(["a b"])})
        with _pytest.raises(NotVectorizableQuery):
            compile_query_mask("bare_term")(batch)


class TestXxh3:
    """XXH3-64/128 against the reference's own unit-test vectors
    (xxhash.rs:166-220) plus the published empty-input value."""

    def test_reference_vectors(self):
        from vrl_ray.functions import REGISTRY

        xx = REGISTRY["xxhash"]
        assert xx("foo", "XXH3-64") == -6093828362558603894
        assert xx("foo", "XXH3-128") == \
            "161745101148472925293886522910304009610"
        assert xx("vrl xxhash hash function", "XXH3-64") == \
            -7714906473624552998
        assert xx("vrl xxhash hash function", "XXH3-128") == \
            "89621485359950851650871997518391357172"

    def test_empty_input(self):
        from vrl_ray.functions.checksum import xxh3_64

        assert xxh3_64(b"") == 0x2D06800538D394C2
