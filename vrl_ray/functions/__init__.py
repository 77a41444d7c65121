"""stdlib function registry.

The reference registers its stdlib as ``Vec<Box<dyn Function>>``
(/root/reference/src/stdlib/mod.rs:260-506); users extend the language
by appending functions (src/compiler/function.rs:25-108). Our
equivalent is this flat ``REGISTRY: {identifier: callable}`` — the
row-level semantic implementations. Register extra functions with
:func:`register`.

Vectorized Arrow counterparts for pipeline hot paths are in
``vrl_ray.functions.vectorized`` (stage kernels pull from there and
fall back to these row implementations wrapped by
:func:`vrl_ray.stages.kernel.rowwise`).
"""

from __future__ import annotations

from typing import Callable

from . import parse as _parse
from . import parse_logs as _parse_logs
from . import parse_data as _parse_data
from . import crypto as _crypto
from . import misc as _misc
from . import string as _string
from . import coerce as _coerce
from . import number as _number
from . import timestamp as _timestamp
from . import object as _object
from . import codec as _codec
from . import checksum as _checksum
from . import ip as _ip

REGISTRY: dict[str, Callable] = {}


def _vrl_guard(name: str, fn: Callable) -> Callable:
    """Error-lane contract: stdlib calls raise ONLY VrlError for bad
    data/argument values (the reference rejects wrong argument kinds
    at compile time; we surface them as runtime VRL errors).
    TypeError passes through — the interpreter maps it to its
    bad-arguments diagnostic."""
    import functools

    from ..value import VrlError

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (VrlError, TypeError):
            raise
        except (AttributeError, ValueError, KeyError, IndexError,
                OverflowError, UnicodeError, ZeroDivisionError,
                ArithmeticError) as e:
            raise VrlError(
                f'invalid argument to "{name}": '
                f"{type(e).__name__}: {e}") from e

    return wrapped


def register(name: str, fn: Callable) -> None:
    REGISTRY[name] = _vrl_guard(name, fn)


def _bulk(mod, names: dict[str, str]) -> None:
    for ident, attr in names.items():
        register(ident, getattr(mod, attr))


_bulk(_parse, {
    "parse_json": "parse_json", "parse_key_value": "parse_key_value",
    "parse_logfmt": "parse_logfmt", "parse_regex": "parse_regex",
    "parse_regex_all": "parse_regex_all", "parse_grok": "parse_grok",
    "parse_timestamp": "parse_timestamp", "parse_csv": "parse_csv",
    "parse_tokens": "parse_tokens", "parse_url": "parse_url",
    "parse_query_string": "parse_query_string",
    "parse_duration": "parse_duration", "parse_bytes": "parse_bytes",
    "parse_int": "parse_int", "parse_float": "parse_float",
    "parse_common_log": "parse_common_log", "parse_glog": "parse_glog",
    "parse_syslog": "parse_syslog", "parse_user_agent": "parse_user_agent",
})
_bulk(_parse_logs, {
    "parse_apache_log": "parse_apache_log",
    "parse_nginx_log": "parse_nginx_log",
    "parse_klog": "parse_klog",
    "parse_linux_authorization": "parse_linux_authorization",
    "parse_cef": "parse_cef",
    "parse_aws_alb_log": "parse_aws_alb_log",
    "parse_aws_vpc_flow_log": "parse_aws_vpc_flow_log",
    "parse_aws_cloudwatch_log_subscription_message":
        "parse_aws_cloudwatch_log_subscription_message",
    "parse_influxdb": "parse_influxdb",
})
_bulk(_parse_data, {
    "parse_ruby_hash": "parse_ruby_hash", "parse_xml": "parse_xml",
    "parse_yaml": "parse_yaml", "parse_cbor": "parse_cbor",
    "parse_proto": "parse_proto", "encode_proto": "encode_proto",
    "parse_etld": "parse_etld",
    "validate_json_schema": "validate_json_schema",
})
from . import groks as _groks
from . import datadog_query as _ddq

register("parse_groks", _groks.parse_groks)
register("match_datadog_query", _ddq.match_datadog_query)
_bulk(_crypto, {
    "encrypt": "encrypt", "decrypt": "decrypt",
    "encrypt_ip": "encrypt_ip", "decrypt_ip": "decrypt_ip",
})
_bulk(_misc, {
    "split_path": "split_path", "community_id": "community_id",
    "haversine": "haversine",
    "tag_types_externally": "tag_types_externally",
    "uuid_v4": "uuid_v4", "uuid_v7": "uuid_v7",
    "uuid_from_friendly_id": "uuid_from_friendly_id",
    "random_bool": "random_bool", "random_bytes": "random_bytes",
    "random_float": "random_float", "random_int": "random_int",
    "get_env_var": "get_env_var", "get_hostname": "get_hostname",
    "get_timezone_name": "get_timezone_name", "log": "log",
    "to_syslog_facility_code": "to_syslog_facility_code",
    "decode_mime_q": "decode_mime_q",
    "encode_charset": "encode_charset",
    "decode_charset": "decode_charset",
    "dns_lookup": "dns_lookup", "reverse_dns": "reverse_dns",
    "http_request": "http_request",
})
_bulk(_string, {
    "downcase": "downcase", "upcase": "upcase", "camelcase": "camelcase",
    "kebabcase": "kebabcase", "pascalcase": "pascalcase",
    "snakecase": "snakecase", "screamingsnakecase": "screamingsnakecase",
    "contains": "contains", "contains_all": "contains_all",
    "starts_with": "starts_with", "ends_with": "ends_with",
    "match": "match_", "match_any": "match_any", "replace": "replace",
    "replace_with": "replace_with", "split": "split", "join": "join",
    "slice": "slice_", "truncate": "truncate",
    "strip_whitespace": "strip_whitespace",
    "strip_ansi_escape_codes": "strip_ansi_escape_codes",
    "strlen": "strlen", "find": "find", "basename": "basename",
    "dirname": "dirname", "shannon_entropy": "shannon_entropy",
    "redact": "redact", "sieve": "sieve",
})
_bulk(_coerce, {
    "to_bool": "to_bool", "to_int": "to_int", "to_float": "to_float",
    "to_string": "to_string", "to_regex": "to_regex",
    "bool": "assert_bool", "int": "assert_int", "float": "assert_float",
    "string": "assert_string", "object": "assert_object",
    "array": "assert_array", "timestamp": "assert_timestamp",
    "is_array": "is_array", "is_boolean": "is_boolean",
    "is_empty": "is_empty", "is_float": "is_float",
    "is_integer": "is_integer", "is_json": "is_json",
    "is_null": "is_null", "is_nullish": "is_nullish",
    "is_object": "is_object", "is_regex": "is_regex",
    "is_string": "is_string", "is_timestamp": "is_timestamp",
    "type_def": "type_def",
})
_bulk(_number, {
    "abs": "abs_", "ceil": "ceil", "floor": "floor", "round": "round_",
    "mod": "mod_", "format_int": "format_int",
    "format_number": "format_number",
})
_bulk(_timestamp, {
    "now": "now", "format_timestamp": "format_timestamp",
    "from_unix_timestamp": "from_unix_timestamp",
    "to_unix_timestamp": "to_unix_timestamp",
    "to_syslog_severity": "to_syslog_severity",
    "to_syslog_level": "to_syslog_level",
    "to_syslog_facility": "to_syslog_facility",
})
_bulk(_object, {
    "merge": "merge", "keys": "keys", "values": "values",
    "length": "length", "compact": "compact", "flatten": "flatten",
    "unflatten": "unflatten", "from_entries": "from_entries",
    "to_entries": "to_entries", "object_from_array": "object_from_array",
    "zip": "zip_", "map_keys": "map_keys", "map_values": "map_values",
    "for_each": "for_each", "filter": "filter_", "includes": "includes",
    "match_array": "match_array", "unique": "unique", "append": "append",
    "push": "push", "pop": "pop", "chunks": "chunks", "tally": "tally",
    "tally_value": "tally_value", "get": "get", "set": "set_",
    "remove": "remove", "exists": "exists", "del": "del_",
})
_bulk(_codec, {
    "decode_base16": "decode_base16", "encode_base16": "encode_base16",
    "decode_base64": "decode_base64", "encode_base64": "encode_base64",
    "decode_percent": "decode_percent", "encode_percent": "encode_percent",
    "decode_punycode": "decode_punycode", "encode_punycode": "encode_punycode",
    "decode_gzip": "decode_gzip", "encode_gzip": "encode_gzip",
    "decode_zlib": "decode_zlib", "encode_zlib": "encode_zlib",
    "decode_zstd": "decode_zstd", "encode_zstd": "encode_zstd",
    "decode_snappy": "decode_snappy", "encode_snappy": "encode_snappy",
    "decode_lz4": "decode_lz4", "encode_lz4": "encode_lz4",
    "encode_json": "encode_json", "encode_csv": "encode_csv",
    "encode_key_value": "encode_key_value", "encode_logfmt": "encode_logfmt",
})
_bulk(_checksum, {
    "md5": "md5", "sha1": "sha1", "sha2": "sha2", "sha3": "sha3",
    "crc": "crc", "hmac": "hmac", "xxhash": "xxhash", "seahash": "seahash",
})
_bulk(_ip, {
    "ip_aton": "ip_aton", "ip_ntoa": "ip_ntoa",
    "ip_cidr_contains": "ip_cidr_contains", "ip_subnet": "ip_subnet",
    "ip_to_ipv6": "ip_to_ipv6", "ipv6_to_ipv4": "ipv6_to_ipv4",
    "is_ipv4": "is_ipv4", "is_ipv6": "is_ipv6",
    "ip_pton": "ip_pton", "ip_ntop": "ip_ntop",
})
