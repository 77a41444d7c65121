"""VRL Value semantics — cases ported from the reference's expression
test corpus (lib/tests/tests/expressions/*) and
src/compiler/value/arithmetic.rs unit tests."""

import math

import pytest

from vrl_ray import value as V
from vrl_ray.value import VrlError


class TestArithmetic:
    def test_int_add(self):
        assert V.add(1, 2) == 3

    def test_int_wrapping(self):
        # arithmetic.rs:115 wrapping_add
        assert V.add(V.I64_MAX, 1) == V.I64_MIN
        assert V.mul(2**62, 4) == 0
        assert V.sub(V.I64_MIN, 1) == V.I64_MAX

    def test_division_always_float(self):
        # arithmetic.rs:98-110
        assert V.div(4, 2) == 2.0 and isinstance(V.div(4, 2), float)
        assert V.div(3, 2) == 1.5

    def test_div_by_zero_errors(self):
        with pytest.raises(VrlError):
            V.div(1, 0)
        with pytest.raises(VrlError):
            V.rem(5, 0)

    def test_string_concat(self):
        assert V.add("foo", "bar") == "foobar"
        # string + null passthrough (arithmetic.rs:125-133)
        assert V.add("foo", None) == "foo"
        assert V.add(None, "bar") == "bar"

    def test_string_repeat(self):
        # arithmetic.rs:68-95
        assert V.mul("ab", 3) == "ababab"
        assert V.mul(3, "ab") == "ababab"

    def test_nan_errors(self):
        # arithmetic.rs:60-64,305-338
        inf = float("inf")
        with pytest.raises(VrlError):
            V.add(inf, -inf)
        with pytest.raises(VrlError):
            V.mul(0.0, inf)

    def test_rem_truncates_like_rust(self):
        assert V.rem(-7, 2) == -1  # Rust: -7 % 2 == -1 (Python would give 1)
        assert V.rem(7, -2) == 1

    def test_mixed_int_float(self):
        assert V.add(1, 0.5) == 1.5

    def test_bool_not_numeric(self):
        with pytest.raises(VrlError):
            V.add(True, 1)


class TestComparison:
    def test_eq_lossy_int_float(self):
        # eq_lossy arithmetic.rs:283-293
        assert V.eq(1, 1.0)
        assert V.eq(1.0, 1)
        assert not V.eq(1, True)  # bool is a distinct kind

    def test_eq_cross_kind(self):
        assert not V.eq("1", 1)
        assert V.eq(None, None)

    def test_ordering(self):
        assert V.gt(2, 1.5)
        assert V.le("a", "b")
        with pytest.raises(VrlError):
            V.gt("a", 1)


class TestLogical:
    def test_truthiness_only_null_false(self):
        # op.rs:131-146
        assert V.is_truthy(0)
        assert V.is_truthy("")
        assert not V.is_truthy(None)
        assert not V.is_truthy(False)

    def test_and_null_is_false(self):
        # arithmetic.rs:159-175
        assert V.logical_and(None, lambda: True) is False
        assert V.logical_and(True, lambda: None) is False
        assert V.logical_and(True, lambda: True) is True
        with pytest.raises(VrlError):
            V.logical_and(1, lambda: True)

    def test_or_lhs_null_false(self):
        assert V.logical_or(None, lambda: "x") == "x"
        assert V.logical_or(False, lambda: 2) == 2
        assert V.logical_or(0, lambda: "no") == 0  # 0 is truthy

    def test_coalesce(self):
        def boom():
            raise VrlError("nope")
        assert V.coalesce(boom, lambda: "fallback") == "fallback"
        assert V.coalesce(lambda: "ok", lambda: "fallback") == "ok"

    def test_merge_operator(self):
        # arithmetic.rs:272-279 shallow, right wins
        assert V.merge_shallow({"a": 1, "b": 1}, {"b": 2}) == {"a": 1, "b": 2}
        with pytest.raises(VrlError):
            V.merge_shallow({"a": 1}, [1])


class TestPaths:
    def test_parse(self):
        assert V.parse_path(".a.b") == ["a", "b"]
        assert V.parse_path(".a[0].b") == ["a", 0, "b"]
        assert V.parse_path('."c d"') == ["c d"]
        assert V.parse_path(".") == []

    def test_get_negative_index(self):
        # owned.rs:327-330 negative indices
        assert V.path_get({"a": [1, 2, 3]}, ".a[-1]") == 3
        assert V.path_get({"a": [1, 2, 3]}, ".a[-4]") is None

    def test_get_missing(self):
        assert V.path_get({}, ".x.y") is None

    def test_insert_autocreate(self):
        # crud/insert.rs:7
        assert V.path_insert({}, ".a.b", 1) == {"a": {"b": 1}}
        assert V.path_insert({}, ".a[2]", "x") == {"a": [None, None, "x"]}

    def test_insert_negative_prepends(self):
        # crud/insert.rs:82-87, crud/mod.rs:81-95
        assert V.path_insert({}, ".a[-3]", 1) == {"a": [1, None, None]}
        assert V.path_insert({"a": [9]}, ".a[-3]", 1) == {"a": [1, None, 9]}

    def test_remove_compact(self):
        # target.rs:58-72
        root, rem = V.path_remove({"a": {"b": 1}}, ".a.b", compact=True)
        assert root == {} and rem == 1
        root, rem = V.path_remove({"a": {"b": 1}}, ".a.b", compact=False)
        assert root == {"a": {}} and rem == 1


class TestEncodeJson:
    def test_sorted_keys(self):
        # BTreeMap ordering value.rs:33-34
        assert V.encode_json({"b": 1, "a": 2}) == '{"a":2,"b":1}'

    def test_nested(self):
        assert V.encode_json({"z": [1, {"y": None}]}) == '{"z":[1,{"y":null}]}'


class TestFloatText:
    """Rust f64 Display vs serde_json/ryu float text (r5 formatter
    rewrite; value/value/display.rs:19, serde_json via ryu)."""

    def test_rust_display_positional(self):
        from vrl_ray.functions.coerce import _fmt_float
        # Rust `{}` NEVER emits scientific notation
        assert _fmt_float(1e20) == "100000000000000000000"
        assert _fmt_float(1e-5) == "0.00001"
        assert _fmt_float(5e-324) == "0." + "0" * 323 + "5"
        assert _fmt_float(1.2345678901234567e19) == "12345678901234567000"

    def test_rust_display_drops_point_zero(self):
        from vrl_ray.functions.coerce import _fmt_float
        assert _fmt_float(2.0) == "2"
        assert _fmt_float(0.0) == "0"
        assert _fmt_float(-0.0) == "-0"      # sign of negative zero kept
        assert _fmt_float(1.5) == "1.5"
        assert _fmt_float(float("inf")) == "inf"
        assert _fmt_float(float("-inf")) == "-inf"

    def test_ryu_thresholds(self):
        # fixed iff -5 < kk <= 16 (ryu pretty format64)
        assert V.ryu_f64(1e15) == "1000000000000000.0"
        assert V.ryu_f64(1e16) == "1e16"
        assert V.ryu_f64(1e-5) == "0.00001"
        assert V.ryu_f64(9.9e-5) == "0.000099"
        assert V.ryu_f64(1e-6) == "1e-6"
        assert V.ryu_f64(1.5e16) == "1.5e16"
        assert V.ryu_f64(-0.0) == "-0.0"
        assert V.ryu_f64(100.0) == "100.0"

    def test_encode_json_scientific(self):
        assert V.encode_json([1e20, 1e-6, 9.9e-5]) == "[1e20,1e-6,0.000099]"
        # strings containing "e-" must not trigger a wrong rewrite
        assert V.encode_json({"m": "large-scale", "x": 1.5}) == \
            '{"m":"large-scale","x":1.5}'


class TestEncodeKeyValueCore:
    """Reference core serializer vectors
    (src/stdlib/encode_key_value.rs:296-460 test_function!)."""

    def test_indexed_arrays(self):
        from vrl_ray.functions.codec import encode_key_value
        got = encode_key_value({
            "log": {"file": {"path": "encode_key_value.rs"}},
            "agent": {"name": "vector", "id": 1234},
            "network": {"ip": [127, 0, 0, 1], "proto": "tcp"},
            "event": "log"})
        assert got == ("agent.id=1234 agent.name=vector event=log "
                       "log.file.path=encode_key_value.rs network.ip.0=127 "
                       "network.ip.1=0 network.ip.2=0 network.ip.3=1 "
                       "network.proto=tcp")

    def test_escaping(self):
        from vrl_ray.functions.codec import encode_key_value
        got = encode_key_value({
            "another_field": "some\nfield\\and things",
            "msg": 'payload: {"code": 200}\\n',
            "space key": "foo", "lvl": "info"})
        assert got == (r'another_field="some\\nfield\\and things" lvl=info '
                       r'msg="payload: {\"code\": 200}\\n" "space key"=foo')

    def test_null_and_empty(self):
        from vrl_ray.functions.codec import encode_key_value
        assert encode_key_value({"v": None}) == "v=null"   # Data::None
        assert encode_key_value({"v": ""}) == "v="          # bare empty
        assert encode_key_value({"v": "a\tb"}) == 'v="a\tb"'


class TestBTreeMapOrder:
    """Reference objects are BTreeMap<KeyString, Value>
    (value/value.rs): iteration observes lexicographic key order,
    never insertion order (r5 fix — keys/values/for_each/map_*/
    filter/flatten/unflatten all sort)."""

    def test_keys_values_sorted(self):
        from vrl_ray.functions.object import keys, values
        assert keys({"b": 1, "a": 2, "C": 3}) == ["C", "a", "b"]
        assert values({"b": 1, "a": 2, "C": 3}) == [3, 2, 1]

    def test_for_each_order(self):
        from vrl_ray.lang import compile_program
        _, ev, _ = compile_program(
            '.acc = []; for_each({"b":1,"a":2}) -> |k,v| '
            '{ .acc = push(.acc, k) }').resolve({})
        assert ev["acc"] == ["a", "b"]

    def test_parsed_json_keys_sorted(self):
        from vrl_ray.lang import compile_program
        _, ev, _ = compile_program(
            '.k = keys(parse_json!(s\'{"z":1,"m":2,"a":3}\'))'
        ).resolve({})
        assert ev["k"] == ["a", "m", "z"]

    def test_flatten_sorted(self):
        from vrl_ray.functions.object import flatten
        assert list(flatten({"z": {"y": 1}, "a": {"b": 2}})) == \
            ["a.b", "z.y"]
