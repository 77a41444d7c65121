"""Mechanically generated conformance suite: every example in the
reference's machine-readable function catalog
(/root/reference/docs/generated/*.json, 623 examples — SURVEY §5
"docs-as-tests", mirroring lib/tests/src/main.rs get_tests_from_functions)
is compiled by our VRL front end and executed by the row-level engine;
the result must match the documented return value (or raise when the
example is marked ``raises``).

Skips: functions we deliberately don't implement (crypto encrypt/
decrypt suites, dns/http I/O, nondeterministic random/now — see
SURVEY §2.2 [X] category) and a short known-divergence list.
"""

from __future__ import annotations

import glob
import json
import re
from datetime import datetime, timezone

import pytest
import regex as _rx

from vrl_ray.lang import compile_program, VrlRuntimeError, ParseError
from vrl_ray.value import VrlError
from vrl_ray.functions import REGISTRY

DOCS = "/root/reference/docs/generated"

# nondeterministic (reference marks these via Example.deterministic,
# function.rs:121-123) — value comparison meaningless
NONDET = {"now", "uuid_v4", "uuid_v7", "random_bool", "random_bytes",
          "random_float", "random_int", "get_hostname", "get_timezone_name",
          # network I/O — stubbed ([X] category), results machine-dependent
          "dns_lookup", "reverse_dns", "http_request", "get_env_var"}

# no known divergences remain (r1 had ua-parser/XXH3/zstd entries)
KNOWN_DIVERGENT: set = set()

_WRAP = re.compile(r"^[srt]'(.*)'$", re.S)


def _unwrap(w):
    if isinstance(w, str):
        m = _WRAP.match(w)
        if m:
            return m.group(1)
    if isinstance(w, dict):
        return {k: _unwrap(v) for k, v in w.items()}
    if isinstance(w, list):
        return [_unwrap(v) for v in w]
    return w


def _jsonable(v):
    if isinstance(v, datetime):
        # chrono prints fractional seconds in 3/6/9-digit groups
        u = v.astimezone(timezone.utc)
        s = u.strftime("%Y-%m-%dT%H:%M:%S")
        if u.microsecond:
            if u.microsecond % 1000 == 0:
                s += f".{u.microsecond // 1000:03d}"
            else:
                s += f".{u.microsecond:06d}"
        return s + "Z"
    if isinstance(v, (_rx.Pattern, re.Pattern)):
        return v.pattern
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def _close(a, b):
    if (isinstance(a, (int, float)) and isinstance(b, (int, float))
            and not isinstance(a, bool) and not isinstance(b, bool)):
        return abs(float(a) - float(b)) < 1e-9 or (
            b != 0 and abs(float(a) - float(b)) / abs(float(b)) < 1e-9)
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_close(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


def _collect():
    cases = []
    for f in sorted(glob.glob(f"{DOCS}/*.json")):
        try:
            d = json.load(open(f))
        except ValueError:
            continue
        name = d.get("name")
        for idx, ex in enumerate(d.get("examples", [])):
            src = ex.get("source", "")
            called = set(_rx.findall(r"([a-z_][a-z0-9_]*)!?\(", src))
            if called & NONDET:
                continue
            if called - set(REGISTRY) - {"del", "exists", "assert",
                                         "assert_eq", "if", "abort",
                                         "unnest"}:
                continue  # functions outside our surface ([X] category)
            marks = []
            if (name, idx) in KNOWN_DIVERGENT:
                marks.append(pytest.mark.xfail(
                    reason="documented divergence", strict=False))
            cases.append(pytest.param(
                src, ex.get("input") or {}, _unwrap(ex.get("return")),
                bool(ex.get("raises")), id=f"{name}[{idx}]", marks=marks))
    return cases


CASES = _collect()


@pytest.mark.parametrize("src,inp,want,raises", CASES)
def test_docs_example(src, inp, want, raises):
    try:
        res, _event, _aborted = compile_program(src).resolve(dict(inp))
    except (VrlError, VrlRuntimeError):
        assert raises, f"unexpected error for: {src}"
        return
    got = _jsonable(res)
    if raises:
        pytest.fail(f"expected error, got {got!r} for: {src}")
    assert _close(got, want), f"{src}\n got: {got!r}\nwant: {want!r}"


def test_coverage_floor():
    """The evaluable-example count must not silently shrink."""
    assert len(CASES) >= 590, len(CASES)
