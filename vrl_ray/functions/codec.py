"""Codec-category stdlib functions: encode_/decode_ pairs.

Mirrors /root/reference/src/stdlib/{decode,encode}_*.rs. Compression
codecs (gzip/zlib/zstd/lz4/snappy) route through ``pyarrow.Codec`` /
stdlib ``gzip``/``zlib`` so no extra packages are needed; codecs the
container lacks raise a clear VrlError (gated, never ImportError).
"""

from __future__ import annotations

import base64 as _b64
import csv as _csv
import gzip as _gzip
import io
import json as _json
import zlib as _zlib
from typing import Any, Optional
from urllib.parse import quote, unquote

from ..value import VrlError, encode_json as _encode_json_sorted

__all__ = [
    "decode_base16", "encode_base16", "decode_base64", "encode_base64",
    "decode_percent", "encode_percent", "decode_punycode",
    "encode_punycode", "decode_gzip", "encode_gzip", "decode_zlib",
    "encode_zlib", "decode_zstd", "encode_zstd", "decode_snappy",
    "encode_snappy", "decode_lz4", "encode_lz4", "encode_json",
    "encode_csv", "encode_key_value", "encode_logfmt",
]


def decode_base16(value: str) -> str:
    try:
        return bytes.fromhex(value).decode("utf-8", "replace")
    except ValueError as e:
        raise VrlError(f"unable to decode value to base16: {e}") from e


def encode_base16(value: str) -> str:
    return value.encode("utf-8").hex()


def decode_base64(value: str, charset: str = "standard") -> str:
    try:
        raw = value.encode("ascii")
        pad = raw + b"=" * (-len(raw) % 4)
        if charset == "url_safe":
            return _b64.urlsafe_b64decode(pad).decode("utf-8", "replace")
        return _b64.b64decode(pad).decode("utf-8", "replace")
    except Exception as e:
        raise VrlError(f"unable to decode value to base64: {e}") from e


def encode_base64(value: str, padding: bool = True, charset: str = "standard") -> str:
    raw = value.encode("utf-8")
    out = (_b64.urlsafe_b64encode(raw) if charset == "url_safe" else _b64.b64encode(raw)).decode("ascii")
    if not padding:
        out = out.rstrip("=")
    return out


def decode_percent(value: str) -> str:
    return unquote(value)


def encode_percent(value: str, ascii_set: str = "NON_ALPHANUMERIC") -> str:
    """encode_percent.rs: percent-encoding ascii sets (subset)."""
    safe = {
        "NON_ALPHANUMERIC": "",
        "CONTROLS": "".join(chr(c) for c in range(0x20, 0x7F)),
        "FRAGMENT": "!$&'()*+,;=:@/?" + "-._~",
        "QUERY": "!$&'()*+,;=:@/?" + "-._~",
        "PATH": "!$&'()*+,;=:@" + "-._~",
        "USERINFO": "!$&'()*+,;=" + "-._~",
        "COMPONENT": "-._~",
    }.get(ascii_set)
    if safe is None:
        raise VrlError(f"invalid ascii_set: {ascii_set}")
    return quote(value, safe=safe)


def decode_punycode(value: str) -> str:
    try:
        return value.encode("ascii").decode("idna")
    except Exception as e:
        raise VrlError(f"unable to decode punycode: {e}") from e


def encode_punycode(value: str, validate: bool = True) -> str:
    try:
        return value.encode("idna").decode("ascii")
    except Exception as e:
        if validate:
            raise VrlError(f"unable to encode punycode: {e}") from e
        return value.lower()


# --- compression (bytes in VRL are strings; we use latin-1 round-trip
# for binary-safety like try_bytes_utf8_lossy does in reverse) ---------

def _to_bytes(value) -> bytes:
    if isinstance(value, bytes):
        return value
    return value.encode("utf-8")


def decode_gzip(value: bytes) -> str:
    try:
        return _gzip.decompress(_raw(value)).decode("utf-8", "replace")
    except Exception as e:
        raise VrlError(f"unable to decode value with Gzip decoder: {e}") from e


def encode_gzip(value: str, compression_level: int = 6) -> bytes:
    return _gzip.compress(_to_bytes(value), compresslevel=compression_level)


def decode_zlib(value: bytes) -> str:
    try:
        return _zlib.decompress(_raw(value)).decode("utf-8", "replace")
    except Exception as e:
        raise VrlError(f"unable to decode value with Zlib decoder: {e}") from e


def encode_zlib(value: str, compression_level: int = 6) -> bytes:
    return _zlib.compress(_to_bytes(value), level=compression_level)


def _raw(value) -> bytes:
    if isinstance(value, bytes):
        return value
    return value.encode("latin-1", "replace")


def _pa_codec(name: str):
    import pyarrow as pa
    try:
        return pa.Codec(name)
    except Exception as e:
        raise VrlError(f"codec {name} unavailable in this environment: {e}") from e


def encode_zstd(value: str, compression_level: int = 3) -> bytes:
    import pyarrow as pa
    codec = _pa_codec("zstd")
    return codec.compress(_to_bytes(value), asbytes=True)


def decode_zstd(value: bytes) -> str:
    codec = _pa_codec("zstd")
    try:
        return codec.decompress(_raw(value), asbytes=True).decode("utf-8", "replace")
    except Exception as e:
        raise VrlError(f"unable to decode value with Zstd decoder: {e}") from e


def encode_snappy(value: str) -> bytes:
    codec = _pa_codec("snappy")
    return codec.compress(_to_bytes(value), asbytes=True)


def decode_snappy(value: bytes) -> str:
    codec = _pa_codec("snappy")
    try:
        return codec.decompress(_raw(value), asbytes=True).decode("utf-8", "replace")
    except Exception as e:
        raise VrlError(f"unable to decode value with Snappy decoder: {e}") from e


def encode_lz4(value: str, prepend_size: bool = True) -> bytes:
    codec = _pa_codec("lz4")
    return codec.compress(_to_bytes(value), asbytes=True)


def decode_lz4(value: bytes, prepend_size: bool = True) -> str:
    codec = _pa_codec("lz4")
    try:
        return codec.decompress(_raw(value), asbytes=True).decode("utf-8", "replace")
    except Exception as e:
        raise VrlError(f"unable to decode value with Lz4 decoder: {e}") from e


# --- structured encoders ---------------------------------------------------

def encode_json(value: Any, pretty: bool = False) -> str:
    """encode_json.rs: sorted object keys (BTreeMap order,
    value.rs:33-34)."""
    if pretty:
        return _json.dumps(value, sort_keys=True, indent=2, ensure_ascii=False)
    return _encode_json_sorted(value)


def encode_csv(value: list, fields: Optional[list] = None) -> str:
    """encode_csv.rs: one CSV record from an array (or object +
    field list)."""
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="")
    if isinstance(value, dict):
        if not fields:
            raise VrlError("fields required to encode an object")
        w.writerow([_plain(value.get(f, "")) for f in fields])
    elif isinstance(value, list):
        w.writerow([_plain(v) for v in value])
    else:
        raise VrlError("expected array or object")
    return buf.getvalue()


def _plain(v) -> str:
    from .coerce import to_string
    if v is None:
        return ""
    return to_string(v)


def encode_key_value(
    value: dict,
    fields_ordering: Optional[list] = None,
    key_value_delimiter: str = "=",
    field_delimiter: str = " ",
    flatten_boolean: bool = False,
) -> str:
    """encode_key_value.rs (core impl src/core/encode_key_value.rs):
    values with spaces/quotes are double-quoted with escapes; nested
    objects flatten to dotted keys; ordered fields first, the rest
    sorted."""
    if not isinstance(value, dict):
        raise VrlError("expected object")
    from .object import flatten as _flatten
    flat = _flatten(value)

    def fmt(v) -> str:
        s = _plain(v)
        if s == "" or any(c in s for c in (' ', '"', '=')) or s != s.strip():
            return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return s

    def pair(k, v) -> str:
        if flatten_boolean and v is True:
            return fmt(k)
        return f"{fmt(k)}{key_value_delimiter}{fmt(v)}"

    ordered = list(fields_ordering or [])
    rest = sorted(k for k in flat if k not in ordered)
    parts = [pair(k, flat[k]) for k in ordered if k in flat]
    parts += [pair(k, flat[k]) for k in rest]
    return field_delimiter.join(parts)


def encode_logfmt(value: dict, fields_ordering: Optional[list] = None) -> str:
    """encode_logfmt.rs: encode_key_value with logfmt defaults +
    boolean flattening."""
    return encode_key_value(value, fields_ordering, "=", " ", flatten_boolean=True)
