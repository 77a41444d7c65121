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
