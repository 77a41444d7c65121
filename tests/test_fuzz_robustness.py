"""Hypothesis fuzzing of the parser surface: the error-lane contract
says data errors NEVER raise anything but VrlError (stages catch
VrlError per row; any other exception would crash a pipeline stage
and break retry idempotency)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from vrl_ray.functions import REGISTRY as R
from vrl_ray.value import VrlError

TEXT = st.text(max_size=200)

# parsers that take a single string argument
SINGLE_ARG_PARSERS = [
    "parse_json", "parse_key_value", "parse_logfmt", "parse_csv",
    "parse_tokens", "parse_url", "parse_query_string", "parse_syslog",
    "parse_glog", "parse_klog", "parse_linux_authorization",
    "parse_cef", "parse_aws_alb_log", "parse_aws_vpc_flow_log",
    "parse_aws_cloudwatch_log_subscription_message", "parse_influxdb",
    "parse_ruby_hash", "parse_xml", "parse_yaml",
    "parse_common_log", "parse_nginx_log", "parse_apache_log",
    "parse_user_agent", "parse_etld", "parse_float",
]


@settings(max_examples=150, deadline=None)
@given(s=TEXT, which=st.sampled_from(SINGLE_ARG_PARSERS))
def test_parsers_raise_only_vrl_errors(s, which):
    try:
        R[which](s)
    except VrlError:
        pass  # the error lane — fine


@settings(max_examples=100, deadline=None)
@given(s=TEXT)
def test_parse_groks_never_crashes(s):
    try:
        R["parse_groks"](s, patterns=[r"%{TIMESTAMP_ISO8601:t} %{GREEDYDATA:m}"])
    except VrlError:
        pass


@settings(max_examples=100, deadline=None)
@given(s=TEXT)
def test_match_datadog_query_bad_queries(s):
    try:
        R["match_datadog_query"]({"message": "x", "value": 1}, s)
    except VrlError:
        pass


@settings(max_examples=100, deadline=None)
@given(s=TEXT)
def test_coercions_never_crash(s):
    for f in ("to_int", "to_float", "to_bool", "parse_int",
              "parse_duration"):
        try:
            if f == "parse_duration":
                R[f](s, "s")
            else:
                R[f](s)
        except VrlError:
            pass


@settings(max_examples=80, deadline=None)
@given(s=TEXT)
def test_interpreter_source_errors_are_typed(s):
    """Arbitrary program text → ParseError/VrlError family only."""
    from vrl_ray.lang import compile_program, ParseError, VrlRuntimeError

    try:
        compile_program(s).resolve({})
    except (ParseError, VrlError, VrlRuntimeError, RecursionError):
        pass


WRONG_TYPES = [None, 5, 2.5, True, [], {}, float("inf")]
SKIP_TYPE_SWEEP = {"dns_lookup", "reverse_dns", "http_request", "log",
                   "random_bytes", "random_int", "random_float",
                   "get_env_var", "encrypt", "decrypt", "hmac",
                   "encrypt_ip", "decrypt_ip", "validate_json_schema",
                   "parse_proto", "encode_proto"}


def test_wrong_type_arguments_raise_only_vrl_errors():
    """Every registry function called with a wrong-typed single
    argument raises VrlError (or TypeError for arity, which the
    interpreter maps) — never a bare Python exception. This is the
    error-lane contract for direct stdlib calls."""
    for name, fn in R.items():
        if name in SKIP_TYPE_SWEEP:
            continue
        for v in WRONG_TYPES:
            try:
                fn(v)
            except (VrlError, TypeError):
                pass


# ---------------------------------------------------------------------------
# property-based parity: random vectorizable programs must agree with
# the row interpreter exactly (the column plan's correctness gate)

import pyarrow as pa

_NUM_COLS = ["a", "b"]
_STR_COLS = ["s", "t"]

_num_expr = st.deferred(lambda: st.one_of(
    st.sampled_from([f".{c}" for c in _NUM_COLS]),
    st.integers(-100, 100).map(str),
    st.floats(-100, 100, allow_nan=False).map(lambda f: f"{f:.3f}"),
    st.tuples(_num_expr, st.sampled_from(["+", "-", "*"]), _num_expr)
      .map(lambda p: f"({p[0]} {p[1]} {p[2]})"),
))

_str_expr = st.one_of(
    st.sampled_from([f".{c}" for c in _STR_COLS]),
    st.sampled_from(['"x"', '"Foo Bar"', '""']),
)

_bool_expr = st.one_of(
    st.tuples(_num_expr, st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
              _num_expr).map(lambda p: f"({p[0]} {p[1]} {p[2]})"),
    st.tuples(_str_expr, st.sampled_from(["==", "!="]), _str_expr)
      .map(lambda p: f"({p[0]} {p[1]} {p[2]})"),
)

_stmt = st.one_of(
    _num_expr.map(lambda e: f".o1 = {e}"),
    st.tuples(_str_expr, st.sampled_from(["downcase", "upcase", "strlen",
                                          "strip_whitespace"]))
      .map(lambda p: f".o2 = {p[1]}({p[0]})"),
    _bool_expr.map(lambda e: f".o3 = {e}"),
    st.tuples(_bool_expr, _num_expr, _num_expr)
      .map(lambda p: f"if {p[0]} {{ .o4 = {p[1]} }} else {{ .o4 = {p[2]} }}"),
    # r3 kernels: handled forms so per-row errors stay comparable
    st.tuples(_str_expr, st.integers(0, 5), st.sampled_from(['', '..']))
      .map(lambda p: f'.o5, .e5 = truncate({p[0]}, {p[1]}, "{p[2]}")'),
    st.one_of(_str_expr, _num_expr)
      .map(lambda e: f".o6, .e6 = to_bool({e})"),
    # optional-argument forms (case_sensitive / precision / count —
    # each was a silent vector-lane divergence before r3)
    st.tuples(_str_expr, st.sampled_from(["contains", "starts_with",
                                          "ends_with"]),
              st.sampled_from(['"o"', '"B"', '""']),
              st.booleans())
      .map(lambda p: f".o7, .e7 = {p[1]}({p[0]}, {p[2]}, "
                     f"{str(p[3]).lower()})"),
    st.tuples(_num_expr, st.sampled_from(["round", "floor", "ceil"]),
              st.integers(0, 3))
      .map(lambda p: f".o8, .e8 = {p[1]}({p[0]}, {p[2]})"),
    st.tuples(_str_expr, st.sampled_from(['"o"', '"a b"']),
              st.integers(-1, 3))
      .map(lambda p: f'.o9, .e9 = replace({p[0]}, {p[1]}, "_", {p[2]})'),
)

_program = st.lists(_stmt, min_size=1, max_size=4).map("\n".join)


@settings(max_examples=120, deadline=None)
@given(src=_program,
       a=st.lists(st.integers(-1000, 1000), min_size=3, max_size=3),
       b=st.lists(st.floats(-1000, 1000, allow_nan=False),
                  min_size=3, max_size=3))
def test_vector_plan_matches_interpreter(src, a, b):
    from vrl_ray.lang.interpreter import Program
    from vrl_ray.lang.vectorize import NotVectorizable, VectorProgram

    batch = pa.table({
        # one null int row: null arithmetic/comparison must match the
        # interpreter's per-row errors (r3 divergence class)
        "a": pa.array(a[:2] + [None], pa.int64()),
        "b": pa.array(b, pa.float64()),
        "s": pa.array(["Ab", "", "zz Q"]),
        "t": pa.array(["x", None, " y "]),  # null + padded: concat identity, trim, null rules
    })
    from vrl_ray.lang.vectorize import _RowFallback
    try:
        vp = VectorProgram(src)
        out = vp.run(batch)
    except (NotVectorizable, _RowFallback):
        return  # falls back to the row path in VectorRemapStage
    prog = Program(src)
    for i, row in enumerate(batch.to_pylist()):
        try:
            _, ev, _ = prog.resolve(dict(row))
        except (VrlError, Exception):
            continue  # row errors → vector path may produce anything defined
        for f in ("o1", "o2", "o3", "o4", "o5", "e5", "o6", "e6",
                  "o7", "e7", "o8", "e8", "o9", "e9"):
            if f in ev and f in out.column_names:
                got = out[f][i].as_py()
                want = ev[f]
                if isinstance(want, float) and isinstance(got, (int, float)):
                    assert abs(got - want) < 1e-6 or (
                        want != 0 and abs(got - want) / abs(want) < 1e-9), \
                        (src, f, got, want)
                else:
                    assert got == want, (src, f, i, got, want)


@settings(max_examples=120, deadline=None)
@given(src=_program,
       a=st.lists(st.integers(-1000, 1000), min_size=3, max_size=3),
       b=st.lists(st.floats(-1000, 1000, allow_nan=False),
                  min_size=3, max_size=3))
def test_annotate_preserves_runtime_semantics(src, a, b):
    """The static pass rebuilds the AST (rewriting only type_def
    nodes); for programs without type_def the annotated tree must be
    RUNTIME-equivalent to the raw parse — same results, same errors,
    same event mutations."""
    from vrl_ray.lang.interpreter import Program
    from vrl_ray.lang.parser import parse
    from vrl_ray.lang.typecheck import (Unsupported, VrlCompileError,
                                        annotate)

    rows = [{"a": x, "b": y, "s": "Ab", "t": "zz"}
            for x, y in zip(a, b)]
    raw = Program.__new__(Program)
    raw.source = src
    raw.stmts = parse(src)
    try:
        ann_stmts = annotate(parse(src), strict=False)
    except Unsupported:
        return
    ann = Program.__new__(Program)
    ann.source = src
    ann.stmts = ann_stmts
    for row in rows:
        def run(p):
            ev = dict(row)
            try:
                r, ev2, ab = p.resolve(ev)
                return ("ok", r, ev2, ab is not None)
            except Exception as e:
                return ("err", type(e).__name__)
        assert run(raw) == run(ann), src


def test_deepfuzz_grammar_parity():
    """scripts/deepfuzz.py: seeded random programs over the FULL
    vectorizable grammar (if exprs/stmts, ??, &&/||, handled captures,
    variables, bang calls, every kernel) — vector lane vs interpreter,
    all fields + error lanes compared exactly. This generator found
    the r3 lazy-evaluation and bang-capture divergence classes the
    narrower hypothesis grammar above missed."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from deepfuzz import run_fuzz
    assert run_fuzz(seed=1, n_programs=250, verbose=False) == 0
    assert run_fuzz(seed=4, n_programs=250, verbose=False) == 0
