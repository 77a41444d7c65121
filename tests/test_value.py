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
