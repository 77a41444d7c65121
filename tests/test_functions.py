"""stdlib function conformance — hand-ported cases from the
reference's docs/generated/*.json examples and test_function! vectors
(see tests/test_docs_examples.py for the mechanically generated set).
"""

from datetime import datetime, timedelta, timezone

import pytest

from vrl_ray.functions import REGISTRY as R
from vrl_ray.value import VrlError


class TestParse:
    def test_parse_json(self):
        assert R["parse_json"]('{"field": "value"}') == {"field": "value"}

    def test_parse_json_max_depth(self):
        out = R["parse_json"]('{"a":{"b":{"c":1}}}', 1)
        assert out == {"a": '{"b":{"c":1}}'}

    def test_parse_json_error(self):
        with pytest.raises(VrlError):
            R["parse_json"]('{"truncated":')

    def test_parse_key_value_simple(self):
        assert R["parse_key_value"]("zork=zook zonk=nork") == {
            "zork": "zook", "zonk": "nork"}

    def test_parse_key_value_quoted_and_standalone(self):
        out = R["parse_key_value"]('level=info msg="Stopping all fetchers" flag')
        assert out == {"level": "info", "msg": "Stopping all fetchers", "flag": True}

    def test_parse_key_value_duplicates_group(self):
        # parse_key_value.rs:72-95
        assert R["parse_key_value"]("a=1 a=2 a=3") == {"a": ["1", "2", "3"]}

    def test_parse_grok_canonical(self):
        # parse_grok.rs:128-144 example
        out = R["parse_grok"](
            "2020-10-02T23:22:12.223222Z info Hello world",
            "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:message}",
        )
        assert out == {
            "timestamp": "2020-10-02T23:22:12.223222Z",
            "level": "info",
            "message": "Hello world",
        }

    def test_parse_grok_no_match_errors(self):
        with pytest.raises(VrlError, match="unable to parse input with grok pattern"):
            R["parse_grok"]("not a log line", "%{TIMESTAMP_ISO8601:timestamp}")

    def test_parse_grok_alternation_drops_unmatched(self):
        # parse_grok.rs:228-235
        out = R["parse_grok"]("hello", "(?:%{INT:n}|%{WORD:w})")
        assert out == {"w": "hello"}

    def test_parse_regex(self):
        out = R["parse_regex"]("8.7.6.5 - zorp", r"^(?P<host>[\w\.]+) - (?P<user>[\w]+)")
        assert out == {"host": "8.7.6.5", "user": "zorp"}

    def test_parse_regex_numeric_groups(self):
        out = R["parse_regex"]("first group and second group",
                               r"(?P<number>.*?) group", numeric_groups=True)
        assert out == {"number": "first", "0": "first group", "1": "first"}

    def test_parse_regex_all(self):
        out = R["parse_regex_all"]("apples and carrots, peaches and peas",
                                   r"(?P<fruit>\w+) and (?P<veg>\w+)")
        assert out == [{"fruit": "apples", "veg": "carrots"},
                       {"fruit": "peaches", "veg": "peas"}]

    def test_parse_timestamp(self):
        out = R["parse_timestamp"]("2020-10-02T23:22:12Z", "%Y-%m-%dT%H:%M:%SZ")
        assert out == datetime(2020, 10, 2, 23, 22, 12, tzinfo=timezone.utc)

    def test_parse_csv(self):
        assert R["parse_csv"]('foo,"b,ar",baz') == ["foo", "b,ar", "baz"]

    def test_parse_tokens(self):
        out = R["parse_tokens"](
            'A sentence "with \\"a\\" sentence inside" and [some brackets]')
        assert out == ["A", "sentence", 'with \\"a\\" sentence inside',
                       "and", "some brackets"]

    def test_parse_url(self):
        out = R["parse_url"]("https://vector.dev/path?x=1")
        assert out["scheme"] == "https"
        assert out["host"] == "vector.dev"
        assert out["path"] == "/path"
        assert out["query"] == {"x": "1"}

    def test_parse_query_string(self):
        assert R["parse_query_string"]("foo=%2B1&bar=2&bar=3&xyz") == {
            "foo": "+1", "bar": ["2", "3"], "xyz": ""}
        # form_urlencoded skips EMPTY sequences, keeps empty keys
        assert R["parse_query_string"]("a=1&&b=2&") == {"a": "1", "b": "2"}
        assert R["parse_query_string"]("=&=") == {"": ["", ""]}
        # the datadog grok `querystring` filter passes
        # ignore_keys_without_values=true (grok_filter.rs:207)
        from vrl_ray.functions.groks import parse_groks
        assert parse_groks("?a=1&a=2&b=&c", ["%{data:q:querystring}"]) \
            == {"q": {"a": ["1", "2"]}}

    def test_parse_url_whatwg(self):
        """url-crate (WHATWG) semantics, pinned to parse_url.rs tests
        plus the spec behaviors the crate inherits."""
        u = R["parse_url"]
        # reference test: a specified default port is ELIDED
        assert u("https://vector.dev:443")["port"] is None
        assert u("https://vector.dev", True)["port"] == 443
        # reference tests: IDNA punycode, case-normalized
        assert u("https://www.CAFé.com")["host"] == "www.xn--caf-dma.com"
        # dot segments collapse; spaces percent-encode; \ acts as /
        assert u("https://EXAMPLE.com/a/../b/./c")["path"] == "/b/c"
        assert u("https://x.com/a b#f g") == {
            **u("https://x.com/a b#f g")}  # parse is deterministic
        assert u("https://x.com/a b")["path"] == "/a%20b"
        assert u("https://x.com#f g")["fragment"] == "f%20g"
        assert u("https://x.com\\p1\\p2")["path"] == "/p1/p2"
        # special scheme without slashes still takes an authority
        assert u("https:foo/bar")["host"] == "foo"
        # IPv6 keeps brackets; IPv4 hex/octal forms normalize
        assert u("http://[::1]:8080/x")["host"] == "[::1]"
        assert u("http://0x7f.1/")["host"] == "127.0.0.1"
        # non-special scheme: no authority → host null, opaque path
        m = u("mailto:user@x.com")
        assert m["host"] is None and m["path"] == "user@x.com"
        import pytest as _pt
        from vrl_ray.value import VrlError as _VE
        with _pt.raises(_VE, match="empty host"):
            u("https://")
        with _pt.raises(_VE, match="invalid port number"):
            u("http://x.com:99999/")
        with _pt.raises(_VE, match="invalid IPv4 address"):
            u("http://1.2.3.4.5.6/")

    def test_parse_duration(self):
        assert R["parse_duration"]("1005ms", "s") == 1.005
        assert R["parse_duration"]("5m30s", "s") == 330.0
        # reference test vectors (parse_duration.rs mod tests)
        assert R["parse_duration"]("30s", "m") == 0.5
        assert R["parse_duration"]("1ms1 µs", "ms") == 1.001
        assert R["parse_duration"]("1s", "w") == 0.0000016534391534391535
        assert R["parse_duration"](".5s", "s") == 0.5
        # captures() searches: leading garbage before a match is skipped
        assert R["parse_duration"]("abc 1s", "s") == 1.0
        # f64 accumulation happens per component (parse_duration.rs:86)
        assert R["parse_duration"]("0.1s0.2s", "s") == 0.30000000000000004
        import pytest as _pt
        from vrl_ray.value import VrlError as _VE
        with _pt.raises(_VE, match="unable to parse duration: ' foo'"):
            R["parse_duration"]("1d foo", "s")
        with _pt.raises(_VE, match="unknown duration unit: 'y'"):
            R["parse_duration"]("1y", "s")  # no year unit in UNITS
        with _pt.raises(_VE, match="unable to convert duration"):
            R["parse_duration"]("1234567890123456789012345d", "s")

    def test_parse_bytes(self):
        # parse-size returns a ROUNDED u64 byte count (1.2*1024 =
        # 1228.8 → 1229), then divides by the output-unit factor
        assert R["parse_bytes"]("1.2KiB", "B") == 1229.0
        assert R["parse_bytes"]("4MiB", "KiB") == 4096.0
        # reference test vectors (parse_bytes.rs mod tests)
        assert R["parse_bytes"]("3.5GiB", "KiB") == 3670016.0
        assert R["parse_bytes"]("1MB", "B") == 1048576.0  # ambiguous=2
        assert R["parse_bytes"]("3B", "kB", "10") == 0.003
        assert R["parse_bytes"]("3.007GB", "kB", "10") == 3007000.0
        assert R["parse_bytes"]("768MB", "PB", "10") == 0.000000768
        import pytest as _pt
        from vrl_ray.value import VrlError as _VE
        # output-unit maps are case-sensitive per base: base 10 has
        # kB (not KB/KiB), base 2 has KiB/KB (not kB)
        with _pt.raises(_VE, match="unknown unit format: 'KiB'"):
            R["parse_bytes"]("1KB", "KiB", "10")
        with _pt.raises(_VE, match="unknown unit format: 'kB'"):
            R["parse_bytes"]("1KB", "kB", "2")
        with _pt.raises(_VE, match="invalid digit found in string"):
            R["parse_bytes"]("1YiB", "MiB")

    def test_parse_int(self):
        assert R["parse_int"]("-42") == -42
        assert R["parse_int"]("0x2a") == 42
        assert R["parse_int"]("2a", 16) == 42

    def test_parse_common_log(self):
        out = R["parse_common_log"](
            '127.0.0.1 bob frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326')
        assert out["host"] == "127.0.0.1"
        assert out["status"] == 200
        assert out["size"] == 2326
        assert out["timestamp"] == datetime(2000, 10, 10, 20, 55, 36, tzinfo=timezone.utc)

    def test_parse_syslog_5424(self):
        out = R["parse_syslog"](
            "<13>1 2020-03-13T20:45:38.119Z dynamicwireless.name "
            "non 2426 ID931 - Try to override the THX port!")
        assert out["severity"] == "notice"
        assert out["facility"] == "user"
        assert out["hostname"] == "dynamicwireless.name"
        assert out["message"] == "Try to override the THX port!"


class TestString:
    def test_cases(self):
        assert R["downcase"]("HELLO") == "hello"
        assert R["upcase"]("hello") == "HELLO"
        assert R["snakecase"]("InputString") == "input_string"
        assert R["camelcase"]("input_string") == "inputString"
        assert R["pascalcase"]("input_string") == "InputString"
        assert R["kebabcase"]("inputString") == "input-string"
        assert R["screamingsnakecase"]("input_string") == "INPUT_STRING"

    def test_convert_case_boundaries(self):
        """convert_case 0.7.1 parity, pinned to the reference's own
        test vectors (src/stdlib/casing/snakecase.rs tests) plus the
        crate's documented boundary semantics."""
        # digit boundaries are ON by default (snakecase.rs
        # with_s3_bucket_details)
        assert R["snakecase"]("s3BucketDetails") == "s_3_bucket_details"
        # excluded_boundaries removes specific boundaries
        assert R["snakecase"]("s3BucketDetails", excluded_boundaries=[
            "digit_lower", "lower_digit", "upper_digit"]) == \
            "s3_bucket_details"
        assert R["snakecase"]("camelCase",
                              excluded_boundaries=["lower_upper"]) == \
            "camelcase"
        assert R["snakecase"]("camelCase", excluded_boundaries=[]) == \
            "camel_case"
        # ACRONYM boundary: XML|Http, not X|M|L
        assert R["snakecase"]("XMLHttpRequest") == "xml_http_request"
        # original_case hint narrows to Case::boundaries() — camel's
        # set includes acronym + digit boundaries, NOT underscore
        assert R["snakecase"]("XMLHttpRequest", "camelCase") == \
            "xml_http_request"
        assert R["camelcase"]("foo_bar-baz qux", "snake_case") == \
            "fooBar-baz qux"
        # non-boundary punctuation stays inside the word
        assert R["pascalcase"]("foo.bar") == "Foo.bar"
        assert R["snakecase"]("version2Release") == "version_2_release"
        import pytest as _pt
        from vrl_ray.value import VrlError as _VE
        with _pt.raises(_VE):
            R["snakecase"]("x", "bogusCase")
        with _pt.raises(_VE):
            R["snakecase"]("x", excluded_boundaries=["bogus"])

    def test_contains(self):
        assert R["contains"]("The Needle In The Haystack", "Needle")
        assert not R["contains"]("the NEEDLE in the haystack", "needle")
        assert R["contains"]("the NEEDLE in the haystack", "needle",
                             case_sensitive=False)

    def test_starts_ends(self):
        assert R["starts_with"]("foobar", "foo")
        assert R["ends_with"]("foobar", "bar")

    def test_replace(self):
        assert R["replace"]("Apples and Bananas", "and", "not") == "Apples not Bananas"
        import regex
        assert R["replace"]("Apples and Bananas", regex.compile(r"[Aa]"), "o") == "opples ond Bononos"
        assert R["replace"]("Bananas", "a", "A", count=2) == "BAnAnas"

    def test_split_join(self):
        assert R["split"]("apples and pears and bananas", " and ") == [
            "apples", "pears", "bananas"]
        assert R["split"]("apples and pears and bananas", " and ", limit=2) == [
            "apples", "pears and bananas"]
        assert R["join"](["a", "b", "c"], ", ") == "a, b, c"

    def test_slice(self):
        assert R["slice"]("Supercalifragilisticexpialidocious", 5, 13) == "califrag"
        assert R["slice"]("foobar", -3) == "bar"

    def test_truncate(self):
        assert R["truncate"]("A rather long sentence.", 11, "...") == "A rather lo..."
        assert R["truncate"]("short", 11, "...") == "short"

    def test_strlen_chars(self):
        assert R["strlen"]("ñandú") == 5

    def test_find(self):
        assert R["find"]("foobar", "bar") == 3
        assert R["find"]("foobar", "baz") is None

    def test_redact(self):
        import re as _re2
        out = R["redact"]("my id is 123-45-6789", ["us_social_security_number"])
        assert out == "my id is [REDACTED]"
        # a VRL regex literal arrives as a compiled pattern
        out = R["redact"]({"name": "John Doe"}, [_re2.compile(r"John")])
        assert out == {"name": "[REDACTED] Doe"}
        # reference filter forms (redact.rs TryFrom<Value>):
        # {type: pattern, patterns: [...]} — strings are LITERALS
        out = R["redact"]("hello 123456 world",
                          [{"type": "pattern", "patterns": ["123456"]}])
        assert out == "hello [REDACTED] world"
        # filter validation is compile-time in the reference; its
        # InvalidArgument Display is the fixed "invalid argument"
        with pytest.raises(VrlError, match="invalid argument"):
            R["redact"]("x", ["not a filter"])

    def test_shannon_entropy(self):
        assert R["shannon_entropy"]("aaaa") == 0.0
        assert abs(R["shannon_entropy"]("ab") - 1.0) < 1e-9


class TestCoerce:
    def test_to_bool(self):
        assert R["to_bool"]("yes") is True
        assert R["to_bool"]("no") is False
        assert R["to_bool"](0) is False
        assert R["to_bool"](None) is False
        with pytest.raises(VrlError):
            R["to_bool"]("maybe")

    def test_to_int(self):
        assert R["to_int"]("2") == 2
        assert R["to_int"](2.7) == 2
        assert R["to_int"](True) == 1
        assert R["to_int"](None) == 0

    def test_to_float(self):
        assert R["to_float"]("3.14") == 3.14
        assert R["to_float"](True) == 1.0

    def test_to_string(self):
        assert R["to_string"](52) == "52"
        assert R["to_string"](True) == "true"
        assert R["to_string"](None) == ""
        assert R["to_string"](52.5) == "52.5"
        assert R["to_string"](52.0) == "52"

    def test_is_nullish(self):
        # is_nullish.rs: null, "", "-", whitespace
        assert R["is_nullish"](None)
        assert R["is_nullish"]("")
        assert R["is_nullish"]("-")
        assert R["is_nullish"]("   ")
        assert not R["is_nullish"]("x")
        assert not R["is_nullish"](0)

    def test_predicates(self):
        assert R["is_integer"](1) and not R["is_integer"](True)
        assert R["is_boolean"](False)
        assert R["is_string"]("")
        assert R["type_def"]([1]) == {"array": {"0": {"integer": True}}}
        assert R["type_def"](42) == {"integer": True}


class TestNumberTimestamp:
    def test_round_floor_ceil(self):
        assert R["round"](4.345, 2) == 4.35
        assert R["round"](4.5) == 5
        assert R["floor"](5.8) == 5.0
        assert R["ceil"](5.2) == 6.0
        assert R["floor"](42.472, 2) == 42.47

    def test_abs_mod(self):
        assert R["abs"](-42) == 42
        assert R["mod"](5, 2) == 1

    def test_format_int(self):
        assert R["format_int"](42, 16) == "2a"
        assert R["format_int"](-42, 2) == "-101010"

    def test_format_number(self):
        assert R["format_number"](1234567.89, 3, grouping_separator=",") == "1,234,567.890"
        assert R["format_number"](1234567, grouping_separator="_") == "1_234_567"
        # reference vectors (format_number.rs tests): scale TRUNCATES
        assert R["format_number"](1234.567, 2) == "1234.56"
        assert R["format_number"](1234.567, 2, ",", " ") == "1 234,56"
        assert R["format_number"](11222333444.56789, 3, ",", ".") == \
            "11.222.333.444,567"
        assert R["format_number"](100.0) == "100"
        assert R["format_number"](100.0, 2) == "100.00"
        assert R["format_number"](123.45, 0) == "123"
        # format_number.rs:90-103 quirk: integral length % 3 == 0
        # puts a separator at position 0 — reproduced bug-for-bug
        assert R["format_number"](123456, None, ".", ",") == ",123,456"
        assert R["format_number"](1e20) == "100000000000000000000"

    def test_timestamps(self):
        ts = datetime(2021, 2, 10, 23, 32, 0, tzinfo=timezone.utc)
        assert R["format_timestamp"](ts, "%Y-%m-%dT%H:%M:%SZ") == "2021-02-10T23:32:00Z"
        assert R["to_unix_timestamp"](ts) == 1612999920
        assert R["from_unix_timestamp"](1612999920) == ts
        assert R["to_unix_timestamp"](ts, "milliseconds") == 1612999920000

    def test_to_unix_timestamp_exact_integer_math(self):
        """chrono timestamp_*() parity: nanoseconds are EXACT past
        2^53 (the float `.timestamp()*1e9` path rounded them), and
        pre-epoch instants FLOOR rather than truncate toward zero
        (to_unix_timestamp.rs:36-39; r3 deep-fuzz finding)."""
        ts = datetime(1970, 1, 1, tzinfo=timezone.utc) \
            + timedelta(microseconds=1234567890999999)
        assert R["to_unix_timestamp"](ts, "nanoseconds") == 1234567890999999000
        assert R["to_unix_timestamp"](ts, "microseconds") == 1234567890999999
        pre = datetime(1970, 1, 1, tzinfo=timezone.utc) \
            - timedelta(microseconds=500)   # 1969-12-31T23:59:59.9995
        assert R["to_unix_timestamp"](pre) == -1            # floor, not 0
        assert R["to_unix_timestamp"](pre, "milliseconds") == -1

    def test_syslog_mappings(self):
        assert R["to_syslog_severity"]("alert") == 1
        assert R["to_syslog_level"](5) == "notice"
        assert R["to_syslog_facility"](0) == "kern"


class TestObject:
    def test_merge(self):
        assert R["merge"]({"a": 1}, {"b": 2}) == {"a": 1, "b": 2}
        deep = R["merge"]({"a": {"x": 1}}, {"a": {"y": 2}}, deep=True)
        assert deep == {"a": {"x": 1, "y": 2}}

    def test_keys_values_length(self):
        assert R["keys"]({"a": 1, "b": 2}) == ["a", "b"]
        assert R["values"]({"a": 1}) == [1]
        assert R["length"]({"a": 1}) == 1
        assert R["length"]([1, 2, 3]) == 3
        assert R["length"]("ñ") == 2  # bytes

    def test_compact(self):
        assert R["compact"]({"a": None, "b": "", "c": 1}) == {"c": 1}
        assert R["compact"]([None, [], 1]) == [1]

    def test_flatten_unflatten(self):
        assert R["flatten"]({"a": {"b": 1}}) == {"a.b": 1}
        assert R["unflatten"]({"a.b": 1}) == {"a": {"b": 1}}

    def test_entries(self):
        assert R["to_entries"]({"a": 1}) == [{"key": "a", "value": 1}]
        assert R["from_entries"]([{"key": "a", "value": 1}]) == {"a": 1}

    def test_array_ops(self):
        assert R["unique"]([1, 2, 1, 3]) == [1, 2, 3]
        assert R["append"]([1], [2, 3]) == [1, 2, 3]
        assert R["push"]([1], 2) == [1, 2]
        assert R["chunks"]([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
        assert R["includes"]([1, 2], 2)
        assert R["tally"](["a", "b", "a"]) == {"a": 2, "b": 1}
        assert R["tally_value"](["a", "b", "a"], "a") == 2

    def test_closures(self):
        assert R["map_keys"]({"a": 1}, lambda k: k.upper()) == {"A": 1}
        assert R["map_values"]({"a": 1}, lambda v: v + 1) == {"a": 2}
        assert R["filter"]([1, 2, 3], lambda i, v: v > 1) == [2, 3]

    def test_path_functions(self):
        e = {"a": {"b": 1}, "keep": True}
        assert R["exists"](e, ".a.b")
        assert R["del"](e, ".a.b") == 1
        assert e == {"a": {}, "keep": True}
        assert R["get"]({"x": [1, 2]}, ["x", 1]) == 2
        assert R["set"]({}, ["a", "b"], 5) == {"a": {"b": 5}}
        assert R["remove"]({"a": 1, "b": 2}, ["a"]) == {"b": 2}


class TestCodecChecksum:
    def test_base64(self):
        assert R["encode_base64"]("some+data") == "c29tZStkYXRh"
        assert R["decode_base64"]("c29tZStkYXRh") == "some+data"
        assert R["encode_base64"]("some+data", padding=False) == "c29tZStkYXRh"

    def test_base16(self):
        assert R["encode_base16"]("some+data") == "736f6d652b64617461"
        assert R["decode_base16"]("736f6d652b64617461") == "some+data"

    def test_percent(self):
        assert R["encode_percent"]("foo bar?") == "foo%20bar%3F"
        assert R["decode_percent"]("foo%20bar%3F") == "foo bar?"

    def test_gzip_roundtrip(self):
        assert R["decode_gzip"](R["encode_gzip"]("hello world")) == "hello world"
        assert R["decode_zlib"](R["encode_zlib"]("hello world")) == "hello world"

    def test_arrow_codecs_roundtrip(self):
        for enc, dec in (("encode_zstd", "decode_zstd"),
                         ("encode_lz4", "decode_lz4"),
                         ("encode_snappy", "decode_snappy")):
            try:
                assert R[dec](R[enc]("hello world")) == "hello world"
            except VrlError:
                pytest.skip(f"{enc} codec unavailable in this pyarrow build")

    def test_encode_json_sorted(self):
        assert R["encode_json"]({"b": 1, "a": 2}) == '{"a":2,"b":1}'

    def test_encode_csv(self):
        assert R["encode_csv"](["foo", "b,ar", "baz"]) == 'foo,"b,ar",baz'

    def test_encode_logfmt(self):
        assert R["encode_logfmt"]({"msg": "hello world", "level": "info"}) == \
            'level=info msg="hello world"'

    def test_kv_roundtrip(self):
        obj = {"level": "info", "msg": "hello world", "code": "200"}
        assert R["parse_key_value"](R["encode_key_value"](obj)) == obj

    def test_hashes(self):
        assert R["md5"]("foo") == "acbd18db4cc2f85cedef654fccc4a4d8"
        assert R["sha1"]("foo") == "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33"
        assert R["sha2"]("foo", "SHA-256") == \
            "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae"
        assert R["crc"]("foo") == "2356372769"
        import hmac as _pyhmac
        # hmac.rs returns RAW digest bytes (encode with base16/base64)
        assert R["hmac"]("foo", "key") == \
            _pyhmac.new(b"key", b"foo", "sha256").digest()
        # xxhash.rs: integer digests, default variant XXH32; XXH64
        # wraps into i64 (docs/generated/xxhash.json vectors)
        assert R["xxhash"]("foo") == 3792637401
        assert R["xxhash"]("foo", "XXH64") == 3728699739546630719
        # seahash.rs reference vectors
        assert R["seahash"]("foobar") == 5348458858952426560
        assert R["seahash"]("bar") == -2796170501982571315

    def test_crc_full_catalogue(self):
        """The full 112-algorithm RevEng catalogue (crc.rs:7-118):
        every entry's computed CRC of b'123456789' must equal the
        catalogue's published check value — params and check are
        independent facts, so agreement validates both."""
        from vrl_ray.functions.checksum import _CRC_PARAMS, _crc_generic
        assert len(_CRC_PARAMS) == 112
        for name, p in _CRC_PARAMS.items():
            assert _crc_generic(b"123456789", *p[:6]) == p[6], name

    def test_crc_reference_vectors(self):
        # crc.rs test module expectations, incl. exact error text
        c = R["crc"]
        assert c("foo", algorithm="CRC_8_MAXIM_DOW") == "18"
        assert c("foo", algorithm="CRC_32_CKSUM") == "4271552933"
        assert c("foo", algorithm="CRC_64_REDIS") == \
            "12626267673720558670"
        # sub-byte and >64-bit widths (bit-serial engine paths)
        assert c("123456789", "CRC_3_GSM") == "4"
        assert c("123456789", "CRC_82_DARC") == \
            "749237524598872659187218"
        # uppercase-only normalization, as the reference
        assert c("foo", "crc_32_cksum") == "4271552933"
        with pytest.raises(Exception) as ei:
            c("foo", algorithm="CRC_UNKNOWN")
        assert str(ei.value) == "Invalid CRC algorithm: CRC_UNKNOWN"


class TestIp:
    def test_aton_ntoa(self):
        assert R["ip_aton"]("1.2.3.4") == 16909060
        assert R["ip_ntoa"](16909060) == "1.2.3.4"

    def test_cidr(self):
        assert R["ip_cidr_contains"]("192.168.0.0/16", "192.168.10.32")
        assert not R["ip_cidr_contains"]("192.168.0.0/24", "192.168.10.32")

    def test_subnet(self):
        assert R["ip_subnet"]("192.168.10.32", "/16") == "192.168.0.0"
        assert R["ip_subnet"]("192.168.10.32", "255.255.0.0") == "192.168.0.0"

    def test_v6(self):
        assert R["ip_to_ipv6"]("192.168.10.32") == "::ffff:192.168.10.32"
        assert R["ipv6_to_ipv4"]("::ffff:192.168.10.32") == "192.168.10.32"
        assert R["is_ipv4"]("1.2.3.4") and not R["is_ipv4"]("::1")
        assert R["is_ipv6"]("::1")


class TestParseJsonMaxDepth:
    """parse_json.rs depth-limited mode: subtrees at the limit keep
    their RAW ORIGINAL text (&RawValue slices — original whitespace
    preserved), scalars always parse; malformed docs error as
    'unable to read json' (parse_json.rs:57-61, tests :26-47)."""

    def test_reference_vectors(self):
        pj = R["parse_json"]
        assert pj('{"top_layer": {"layer_one": "finish", "layer_two": 2}}',
                  max_depth=1) == \
            {"top_layer": '{"layer_one": "finish", "layer_two": 2}'}
        assert pj('[{"top_layer": {"next_layer": ["finish"]}}]',
                  max_depth=2) == \
            [{"top_layer": '{"next_layer": ["finish"]}'}]
        assert pj('{"top_layer": {"layer_one": "finish", "layer_two": 2}}',
                  max_depth=10) == \
            {"top_layer": {"layer_one": "finish", "layer_two": 2}}

    def test_raw_whitespace_preserved(self):
        got = R["parse_json"]('{"a":  {"b":\t1} , "c": [ 1,  {"d": 2} ] }',
                              max_depth=1)
        assert got == {"a": '{"b":\t1}', "c": '[ 1,  {"d": 2} ]'}

    def test_serde_number_widths_at_depth(self):
        got = R["parse_json"]('{"n": 9223372036854775808, "o": {"x": 1}}',
                              max_depth=1)
        assert got == {"n": 9.223372036854776e18, "o": '{"x": 1}'}

    def test_read_error_text(self):
        import pytest
        from vrl_ray.value import VrlError
        with pytest.raises(VrlError, match=r"unable to read json: EOF "
                           r"while parsing a string at line 1 column 16"):
            R["parse_json"]('{"field": "value', max_depth=3)
        with pytest.raises(VrlError, match=r"unable to parse json: EOF "
                           r"while parsing a string at line 1 column 16"):
            R["parse_json"]('{"field": "value')


class TestChronoFormatSpecifiers:
    """chrono strftime dialect (format_timestamp.rs; chrono
    format/strftime docs — example timestamp 2001-07-08T00:34:59.026490
    UTC): %f is 9-digit NANOSECONDS, the %.f family prints SI-group
    fractions, %:z offset variants, %s epoch, %%f stays literal."""

    def test_fraction_families(self):
        from datetime import datetime, timezone
        dt = datetime(2001, 7, 8, 0, 34, 59, 26490, tzinfo=timezone.utc)
        ft = R["format_timestamp"]
        assert ft(dt, "%f") == "026490000"
        assert ft(dt, "%.f") == ".026490"
        assert ft(dt, "%.3f") == ".026"
        assert ft(dt, "%.9f") == ".026490000"
        assert ft(dt, "%3f") == "026"
        assert ft(dt, "%9f") == "026490000"

    def test_offsets_epoch_literal(self):
        from datetime import datetime, timezone
        dt = datetime(2001, 7, 8, 0, 34, 59, 26490, tzinfo=timezone.utc)
        ft = R["format_timestamp"]
        assert ft(dt, "%:z") == "+00:00"
        assert ft(dt, "%::z") == "+00:00:00"
        assert ft(dt, "%:::z") == "+00"
        assert ft(dt, "%s") == "994552499"
        assert ft(dt, "%%f") == "%f"
        assert ft(dt, "%v") == " 8-Jul-2001"


class TestPunycodePercent:
    """Reference test vectors for encode/decode_punycode and
    encode_percent (encode_punycode.rs / decode_punycode.rs /
    encode_percent.rs mod tests)."""

    def test_encode_punycode(self):
        import pytest as _pt
        from vrl_ray.value import VrlError as _VE
        assert R["encode_punycode"]("www.CAFé.com") == "www.xn--caf-dma.com"
        assert R["encode_punycode"]("www.CAFé.com", False) == \
            "www.xn--caf-dma.com"
        # rust domain_to_ascii is UTS46 beStrict=false: underscores
        # and emoji are fine (IDNA2008-strict would reject both)
        assert R["encode_punycode"]("_dmarc.example.com") == \
            "_dmarc.example.com"
        assert R["encode_punycode"]("😉.com") == "xn--n28h.com"
        # bidi-rule violations error under validate (RFC 5893 applies
        # to ALL labels once the domain contains any RTL run)
        with _pt.raises(_VE, match="unable to encode to punycode"):
            R["encode_punycode"]("xn--8hbb.xn--fiba.xn--8hbf.xn--eib.")
        # ...but pass through unvalidated
        assert R["encode_punycode"](
            "xn--8hbb.xn--fiba.xn--8hbf.xn--eib.", False) == \
            "xn--8hbb.xn--fiba.xn--8hbf.xn--eib."

    def test_decode_punycode(self):
        import pytest as _pt
        from vrl_ray.value import VrlError as _VE
        assert R["decode_punycode"]("www.xn--caf-dma.com") == "www.café.com"
        # no xn-- anywhere → verbatim passthrough
        assert R["decode_punycode"]("www.CAFE.com") == "www.CAFE.com"
        assert R["decode_punycode"](
            "xn--8hbb.xn--fiba.xn--8hbf.xn--eib.", False) == "١٠.٦٦.٣٠.٥."
        with _pt.raises(_VE, match="unable to decode punycode"):
            R["decode_punycode"]("xn--8hbb.xn--fiba.xn--8hbf.xn--eib.")

    def test_encode_percent_sets(self):
        # NON_ALPHANUMERIC encodes _.-~ too (percent_encoding crate,
        # unlike Python's quote())
        assert R["encode_percent"]("a_b.c-d~e") == "a%5Fb%2Ec%2Dd%7Ee"
        assert R["encode_percent"]("foo bar?") == "foo%20bar%3F"
        assert R["encode_percent"]('foo #"<>\'bar', "SPECIAL") == \
            "foo%20%23%22%3C%3E%27bar"
        assert R["encode_percent"]("foo !'()~bar", "WWW_FORM_URLENCODED") \
            == "foo%20%21%27%28%29%7Ebar"
        assert R["encode_percent"]("foo \x14bar", "CONTROLS") == \
            "foo %14bar"
