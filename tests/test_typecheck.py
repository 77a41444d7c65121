"""Unit tests for the static type checker (vrl_ray/lang/typecheck.py)
— Kind algebra, type_def compile-time resolution, and compile-time
fallibility forcing (the reference's compiler.rs:49-62 /
value/kind/debug.rs surface). The corpus (test_vrl_corpus.py) is the
integration evidence; these pin the unit behaviors directly."""

from __future__ import annotations

import pytest

from vrl_ray.lang import compile_program
from vrl_ray.lang.typecheck import Kind, VrlCompileError


def run(src, obj=None, strict=True):
    r, ev, ab = compile_program(src, strict=strict).resolve(obj or {})
    return r


class TestKindAlgebra:
    def test_union_object_fields_gain_undefined(self):
        a = Kind.object({"x": Kind.prim("boolean")})
        b = Kind.object({"y": Kind.prim("bytes")})
        u = a.union(b)
        assert u.debug_info() == {"object": {
            "x": {"boolean": True, "undefined": True},
            "y": {"bytes": True, "undefined": True}}}

    def test_never_and_any_render(self):
        assert Kind.never().debug_info() == {"never": True}
        assert Kind.any().debug_info() == {"any": True}

    def test_union_with_never_is_identity(self):
        k = Kind.prim("bytes").union(Kind.never())
        assert k.debug_info() == {"bytes": True}


class TestTypeDefStatic:
    def test_if_without_else_is_value_or_null(self):
        assert run('x = if false { "y" }\ntype_def(x)') == \
            {"bytes": True, "null": True}

    def test_branch_assignment_unions(self):
        src = ('. = {}\n_r = if true { .x = true } else { .y = "hi" }\n'
               'type_def(.)')
        assert run(src) == {"object": {
            "x": {"boolean": True, "undefined": True},
            "y": {"bytes": True, "undefined": True}}}

    def test_abort_is_never(self):
        assert run("type_def({abort})", strict=True) == {"never": True}

    def test_short_circuit_state_application(self):
        src = ('x = false\n_x = false && {x = "s"}\ntype_def(x)')
        assert run(src) == {"boolean": True}
        src = ('x = false\n_x = true && {x = "s"; true}\ntype_def(x)')
        assert run(src) == {"bytes": True}

    def test_push_on_unknown_external(self):
        assert run("type_def(push!(.x, 5))") == \
            {"array": {}, "array_unknown_infinite": {"any": True}}

    def test_array_holes_fill_null(self):
        assert run('.x = []\n.x[3] = "v"\ntype_def(.x)') == \
            {"array": {"0": {"null": True}, "1": {"null": True},
                       "2": {"null": True}, "3": {"bytes": True}}}

    def test_runtime_fallback_outside_subset(self):
        # slice() isn't statically modeled → runtime type_def kinds
        assert run("type_def(slice!([1], 0))", strict=False) == \
            {"array": {"0": {"integer": True}}}


class TestFallibilityForcing:
    def test_unhandled_fallible_call_rejected(self):
        with pytest.raises(VrlCompileError):
            compile_program("5 + to_int(.foo)")

    def test_possibly_undefined_arithmetic_rejected(self):
        with pytest.raises(VrlCompileError):
            compile_program('.onk = ["a", "b"]\ndel(.onk[0])\n'
                            '.onk[1] + "nork"')

    def test_handled_forms_accepted(self):
        compile_program("x = to_int!(.foo)")
        compile_program("x, err = to_int(.foo)")
        compile_program('x = to_int(.foo) ?? 0')

    def test_division_constant_propagation(self):
        compile_program("foo = 4\nx = 5 / foo")      # infallible
        with pytest.raises(VrlCompileError):
            compile_program("x = 5 / .n")            # unknown divisor

    def test_lenient_mode_still_compiles(self):
        compile_program("5 + to_int(.foo)", strict=False)

    def test_unconditionally_fallible_type_defs_forced(self):
        """r3: functions whose Rust type_def is always .fallible()
        even with fully-verified args (slice.rs:154-160, join.rs:
        101-103, format_timestamp.rs:120-122) must be handled — the
        docs metadata alone would call them infallible."""
        for src in ('.x = slice("hello", 1)',
                    '.x = join(["a", "b"], ",")',
                    '.x = tally(["a", "a"])'):
            with pytest.raises(VrlCompileError):
                compile_program(src)
        # handled / aborting forms compile
        compile_program('.x = slice!("hello", 1)')
        compile_program('.x, .e = join(["a", "b"], ",")')
        compile_program('.x = tally(["a"]) ?? {}')
        # conditional type_defs (xxhash.rs:145-157): a valid constant
        # variant stays infallible
        compile_program('.h = xxhash("foo")')

    def test_conditional_fallibility_exact(self):
        """r3: exact resolve_constant-based conditional fallibility
        (crc.rs:1011-1026, hmac.rs:178-198, xxhash.rs:145-158,
        chunks.rs:130-136, random_*.rs get_length/get_range,
        encode_gzip.rs:105-116, mod_func.rs type_def)."""
        # valid constant variant → infallible
        compile_program('.h = crc("foo", algorithm: "CRC_3_GSM")')
        compile_program('.h = hmac("foo", "key", algorithm: "SHA1")')
        compile_program('.h = xxhash("foo", variant: "XXH3-64")')
        # constant propagated through a local is resolved too
        compile_program('a = "CRC_32_CKSUM"\n.h = crc("foo", algorithm: a)')
        # INVALID constant variant → fallible, must be handled
        for src in ('.h = crc("foo", algorithm: "CRC_BOGUS")',
                    '.h = hmac("foo", "key", algorithm: "MD5")',
                    '.h = xxhash("foo", variant: "XXH128")'):
            with pytest.raises(VrlCompileError):
                compile_program(src)
        # non-constant variant → fallible even though it's a string
        with pytest.raises(VrlCompileError):
            compile_program('a = to_string!(.v)\n'
                            '.h = crc("foo", algorithm: a)')
        # chunks: ANY constant size is infallible; expression is not
        compile_program('.c = chunks("abcdef", 2)')
        with pytest.raises(VrlCompileError):
            compile_program('n = to_int!(.n)\n.c = chunks("abcdef", n)')
        # random_*: constant in-range bounds are infallible
        compile_program('.r = random_bytes(16)')
        compile_program('.r = random_int(0, 10)')
        compile_program('.r = random_float(0.0, 1.0)')
        for src in ('.r = random_bytes(65537)',      # > 64 KiB
                    '.r = random_int(10, 10)',       # max <= min
                    '.r = random_float(2.0, 1.0)'):
            with pytest.raises(VrlCompileError):
                compile_program(src)
        # encode_gzip/zlib: omitted or constant level <= 10
        compile_program('.z = encode_gzip("x")')
        compile_program('.z = encode_zlib("x", compression_level: 9)')
        with pytest.raises(VrlCompileError):
            compile_program('.z = encode_gzip("x", compression_level: 11)')
        # mod: constant nonzero modulus narrows kind and fallibility
        compile_program('.m = mod(10, 3)')
        with pytest.raises(VrlCompileError):
            compile_program('.m = mod(10, 0)')
        with pytest.raises(VrlCompileError):
            compile_program('.m = mod(to_int!(.a), to_int!(.b))')
