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

from ..value import VrlError, encode_json as _encode_json_sorted, vrl_type

__all__ = [
    "decode_base16", "encode_base16", "decode_base64", "encode_base64",
    "decode_percent", "encode_percent", "decode_punycode",
    "encode_punycode", "decode_gzip", "encode_gzip", "decode_zlib",
    "encode_zlib", "decode_zstd", "encode_zstd", "decode_snappy",
    "encode_snappy", "decode_lz4", "encode_lz4", "encode_json",
    "encode_csv", "encode_key_value", "encode_logfmt",
]


def decode_base16(value: str):
    try:
        out = bytes.fromhex(value)
    except ValueError as e:
        raise VrlError(f"unable to decode value to base16: {e}") from e
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out


def encode_base16(value) -> str:
    raw = value if isinstance(value, bytes) else value.encode("utf-8")
    return raw.hex()


_B64_STD = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
            "0123456789+/")


def decode_base64(value: str, charset: str = "standard"):
    """decode_base64.rs: trailing '=' stripped, then a STRICT no-pad
    decode (base64_simd) — non-zero trailing bits and non-alphabet
    chars are errors, unlike Python's forgiving binascii. Returns str
    when the payload is valid UTF-8, else raw bytes."""
    if charset not in ("standard", "url_safe"):
        raise VrlError("unknown charset")
    try:
        raw = value.encode("ascii") if isinstance(value, str) else value
    except UnicodeEncodeError as e:
        raise VrlError("unable to decode value from base64") from e
    raw = raw.rstrip(b"=")
    rem = len(raw) % 4
    alphabet = (_B64_STD[:-2] + "-_") if charset == "url_safe" else _B64_STD
    if rem == 1 or any(chr(c) not in alphabet for c in raw):
        raise VrlError("unable to decode value from base64")
    if rem:
        # canonical check: unused low bits of the final symbol are 0
        if alphabet.index(chr(raw[-1])) & (0xF if rem == 2 else 0x3):
            raise VrlError("unable to decode value from base64")
    pad = raw + b"=" * (-len(raw) % 4)
    try:
        out = _b64.b64decode(pad, altchars=b"-_"
                             if charset == "url_safe" else None)
    except Exception as e:
        raise VrlError("unable to decode value from base64") from e
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out


def encode_base64(value, padding: bool = True, charset: str = "standard") -> str:
    if charset not in ("standard", "url_safe"):
        raise VrlError("unknown charset")
    raw = value if isinstance(value, bytes) else value.encode("utf-8")
    out = (_b64.urlsafe_b64encode(raw) if charset == "url_safe"
           else _b64.b64encode(raw)).decode("ascii")
    if not padding:
        out = out.rstrip("=")
    return out


def decode_percent(value: str) -> str:
    return unquote(value)


# encode_percent.rs:77-116 — the percent_encoding crate's AsciiSets,
# byte-for-byte: CONTROLS = C0 + DEL; each WHATWG set builds on it;
# every byte ≥ 0x80 is ALWAYS encoded (utf8_percent_encode).
def _pct_sets() -> dict:
    controls = set(range(0x20)) | {0x7F}
    fragment = controls | set(b' "<>`')
    query = controls | set(b' "#<>')
    special = query | set(b"'")
    path = query | set(b"?`{}")
    userinfo = path | set(b"/:;=@[\\]^|")
    component = userinfo | set(b"$%&+,")
    www = component | set(b"!'()~")
    non_alnum = {b for b in range(0x80)
                 if not (0x30 <= b <= 0x39 or 0x41 <= b <= 0x5A
                         or 0x61 <= b <= 0x7A)}
    return {"NON_ALPHANUMERIC": non_alnum, "CONTROLS": controls,
            "FRAGMENT": fragment, "QUERY": query, "SPECIAL": special,
            "PATH": path, "USERINFO": userinfo, "COMPONENT": component,
            "WWW_FORM_URLENCODED": www}


_PCT_ASCII_SETS = _pct_sets()


def encode_percent(value: str, ascii_set: str = "NON_ALPHANUMERIC") -> str:
    """encode_percent.rs: utf8_percent_encode over the named AsciiSet
    — unlike Python's quote(), alphanumeric-adjacent bytes like
    ``_.-~`` DO encode under NON_ALPHANUMERIC."""
    enc = _PCT_ASCII_SETS.get(ascii_set)
    if enc is None:
        raise VrlError(f"invalid ascii_set: {ascii_set}")
    out = []
    for b in value.encode("utf-8"):
        if b >= 0x80 or b in enc:
            out.append("%%%02X" % b)
        else:
            out.append(chr(b))
    return "".join(out)


# --- punycode (encode_punycode.rs / decode_punycode.rs, idna crate) --

def _uts46_labels(domain: str):
    """idna::uts46 processing as domain_to_ascii/unicode run it
    (beStrict=false → std3 rules OFF, non-transitional): remap + NFC,
    split labels, punycode-decode xn-- labels (failure = error), and
    run the RFC 5893 bidi check across ALL labels when the domain is
    bidi. Returns (remapped_labels, decoded_labels)."""
    import unicodedata

    import idna
    from idna.core import check_bidi

    remapped = idna.uts46_remap(domain, std3_rules=False,
                                transitional=False)
    labels = remapped.split(".")
    decoded = []
    for lab in labels:
        if lab.lower().startswith("xn--"):
            d = lab[4:].encode("ascii").decode("punycode")
            decoded.append(d)
        else:
            decoded.append(lab)
    if any(unicodedata.bidirectional(c) in ("R", "AL", "AN")
           for lab in decoded for c in lab):
        for lab in decoded:
            if lab:
                check_bidi(lab, check_ltr=True)
    return labels, decoded


def encode_punycode(value: str, validate: bool = True) -> str:
    if validate:
        # encode_punycode.rs:99-102 — idna::domain_to_ascii
        try:
            labels, _ = _uts46_labels(value)
            return ".".join(
                lab if lab.isascii()
                else "xn--" + lab.encode("punycode").decode("ascii")
                for lab in labels)
        except Exception as e:
            raise VrlError("unable to encode to punycode") from e
    # validate=false branch (encode_punycode.rs:104-126): pure
    # lowercase-ascii-digit-dot passes through; otherwise per-label
    # lowercase, punycode only the non-ASCII labels
    if all(c.islower() or c.isdigit() or c == "."
           for c in value) and value.isascii():
        return value
    out = []
    for part in value.split("."):
        if part.startswith("xn--") or part.isascii():
            out.append(part.lower())
        else:
            low = part.lower()
            try:
                out.append("xn--" + low.encode("punycode").decode("ascii"))
            except Exception:
                out.append(low)
    return ".".join(out)


def decode_punycode(value: str, validate: bool = True) -> str:
    if "xn--" not in value:
        # decode_punycode.rs:96-98 — untouched passthrough
        return value
    if validate:
        # idna::domain_to_unicode
        try:
            _, decoded = _uts46_labels(value)
            return ".".join(decoded)
        except Exception as e:
            raise VrlError("unable to decode punycode") from e
    out = []
    for part in value.split("."):
        if part.startswith("xn--"):
            try:
                out.append(part[4:].encode("ascii").decode("punycode"))
            except Exception:
                out.append(part)
        else:
            out.append(part)
    return ".".join(out)




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
        # decode_gzip.rs:12 — fixed text, no detail
        raise VrlError("unable to decode value with Gzip decoder") from e


def encode_gzip(value: str, compression_level: int = 6) -> bytes:
    """Byte-compatible with the reference's flate2 output: mtime=0,
    XFL=0, OS=0xFF (python's gzip writes OS=Unix, so build the member
    manually around a raw-deflate body)."""
    import struct
    raw = _to_bytes(value)
    co = _zlib.compressobj(_flate2_level(compression_level),
                           _zlib.DEFLATED, -15)
    body = co.compress(raw) + co.flush()
    header = b"\x1f\x8b\x08\x00" + b"\x00\x00\x00\x00" + b"\x00\xff"
    trailer = struct.pack("<II", _zlib.crc32(raw) & 0xFFFFFFFF,
                          len(raw) & 0xFFFFFFFF)
    return header + body + trailer


def decode_zlib(value: bytes) -> str:
    try:
        return _zlib.decompress(_raw(value)).decode("utf-8", "replace")
    except Exception as e:
        # decode_zlib.rs:12 — fixed text, no detail
        raise VrlError("unable to decode value with Zlib decoder") from e


def _flate2_level(level: int) -> int:
    """encode_gzip.rs:10,26 / encode_zlib.rs: `level as u32` then a
    > 10 check — negative or > 10 errors; flate2's level 10 has no
    zlib equivalent, so it maps to Python's 9."""
    lv = int(level)
    if lv < 0 or lv > 10:
        raise VrlError("compression level must be <= 10")
    return min(lv, 9)


def encode_zlib(value: str, compression_level: int = 6) -> bytes:
    return _zlib.compress(_to_bytes(value),
                          level=_flate2_level(compression_level))


def _raw(value) -> bytes:
    if isinstance(value, bytes):
        return value
    return value.encode("latin-1", "replace")


def _decompress_sized(codec, raw: bytes, size):
    """pyarrow codecs require decompressed_size; probing with an
    oversized buffer can return trailing garbage, so only the exact
    header-derived size (or the codec's own inference) is trusted."""
    if size is not None:
        return codec.decompress(raw, decompressed_size=size, asbytes=True)
    return codec.decompress(raw, asbytes=True)


def _pa_codec(name: str):
    import pyarrow as pa
    try:
        return pa.Codec(name)
    except Exception as e:
        raise VrlError(f"codec {name} unavailable in this environment: {e}") from e


# zstd default window-log per compression level (the zstd library's
# published clevels table for the streaming/unknown-size path — what
# the reference's zstd-crate Encoder emits, encode_zstd.rs)
_ZSTD_WLOG = {1: 19, 2: 20, 3: 21, 4: 21, 5: 21, 6: 21, 7: 21, 8: 21,
              9: 22, 10: 22, 11: 22, 12: 22, 13: 22, 14: 22, 15: 22,
              16: 22, 17: 23, 18: 23, 19: 23, 20: 25, 21: 26, 22: 27}

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _zstd_crate_frame(raw: bytes, level: int) -> bytes:
    """Rewrite a pyarrow-produced zstd frame header to the byte form
    the reference's zstd-crate streaming encoder emits: no
    Frame_Content_Size, no single-segment flag, window descriptor from
    the level's default window log. The compressed blocks are
    identical — only the header descriptor bytes differ."""
    if len(raw) < 6 or raw[:4] != _ZSTD_MAGIC:
        return raw
    fhd = raw[4]
    if fhd & 0b11:          # dictionary id present — don't touch
        return raw
    single = (fhd >> 5) & 1
    fcs_flag = fhd >> 6
    if not single and fcs_flag == 0:
        return raw          # already crate-shaped
    pos = 5
    wd = None
    if not single:
        wd = raw[5]
        pos += 1
    pos += {0: (1 if single else 0), 1: 2, 2: 4, 3: 8}[fcs_flag]
    if wd is None:
        wd = (_ZSTD_WLOG.get(level, 21) - 10) << 3
    new_fhd = fhd & 0b100   # keep only the checksum flag
    return _ZSTD_MAGIC + bytes([new_fhd, wd]) + raw[pos:]


def encode_zstd(value: str, compression_level: int = 3) -> bytes:
    import pyarrow as pa
    try:
        codec = pa.Codec("zstd", int(compression_level))
    except Exception as e:
        raise VrlError(f"codec zstd unavailable: {e}") from e
    raw = codec.compress(_to_bytes(value), asbytes=True)
    return _zstd_crate_frame(raw, compression_level)


def _zstd_content_size(raw: bytes):
    """Parse the zstd frame header for Frame_Content_Size
    (RFC 8878 §3.1.1); None when the frame does not carry it."""
    if len(raw) < 6 or raw[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = raw[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    if fhd & 0b11:  # dictionary id
        pos += {1: 1, 2: 2, 3: 4}[fhd & 0b11]
    try:
        if fcs_flag == 0:
            return raw[pos] if single_segment else None
        if fcs_flag == 1:
            return int.from_bytes(raw[pos:pos + 2], "little") + 256
        if fcs_flag == 2:
            return int.from_bytes(raw[pos:pos + 4], "little")
        return int.from_bytes(raw[pos:pos + 8], "little")
    except IndexError:
        return None


def _zstd_probe_size(codec, raw: bytes) -> bytes:
    """Decompress a zstd frame that carries NO Frame_Content_Size.
    pyarrow needs the exact size, but under- and over-shoots raise
    DISTINGUISHABLE errors ("Destination buffer is too small" vs
    "Corrupt"), so the exact size is found by exponential growth +
    binary search — O(log n) decompression attempts."""
    def attempt(n):
        try:
            return codec.decompress(raw, decompressed_size=n,
                                    asbytes=True), 0
        except Exception as e:
            return None, (-1 if "too small" in str(e).lower() else 1)

    lo, hi = 0, max(64, len(raw) * 4)
    while True:
        out, sign = attempt(hi)
        if out is not None:
            return out
        if sign > 0:
            break
        lo, hi = hi, hi * 4
        if hi > 1 << 34:
            raise VrlError("zstd frame too large to probe")
    while lo <= hi:
        mid = (lo + hi) // 2
        out, sign = attempt(mid)
        if out is not None:
            return out
        if sign < 0:
            lo = mid + 1
        else:
            hi = mid - 1
    raise VrlError("unable to determine zstd decompressed size")


def decode_zstd(value: bytes) -> str:
    codec = _pa_codec("zstd")
    raw = _raw(value)
    size = _zstd_content_size(raw)
    try:
        if size is not None:
            out = _decompress_sized(codec, raw, size)
        else:
            out = _zstd_probe_size(codec, raw)
        return out.decode("utf-8", "replace")
    except Exception as e:
        # decode_zstd.rs:10 — fixed text, no detail
        raise VrlError("unable to decode value with Zstd decoder") from e


def encode_snappy(value: str) -> bytes:
    codec = _pa_codec("snappy")
    return codec.compress(_to_bytes(value), asbytes=True)


def decode_snappy(value: bytes) -> str:
    """Raw snappy stores the uncompressed length as a leading uvarint
    — parse it so pyarrow gets the exact decompressed_size."""
    codec = _pa_codec("snappy")
    raw = _raw(value)
    size = 0
    shift = 0
    for i, b in enumerate(raw[:5]):
        size |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    try:
        out = codec.decompress(raw, decompressed_size=size, asbytes=True)
        return out.decode("utf-8", "replace")
    except Exception as e:
        # decode_snappy.rs:11 — fixed text, no detail
        raise VrlError("unable to decode value with Snappy decoder") from e


def encode_lz4(value: str, prepend_size: bool = True) -> bytes:
    """encode_lz4.rs: lz4 BLOCK format with the uncompressed size
    prepended little-endian (prepend_size=True, the VRL default)."""
    import struct
    raw = _to_bytes(value)
    codec = _pa_codec("lz4_raw")
    body = codec.compress(raw, asbytes=True)
    if prepend_size:
        return struct.pack("<I", len(raw)) + body
    return body


def _lz4_block_decompress(data: bytes, cap: int) -> bytes:
    """Pure-Python LZ4 block decode with lz4_flex's exact semantics and
    error TEXTS (lz4_flex block/decompress.rs: cap is a hard output
    bound, never grown; decode_lz4.rs:147-160 interpolates the error).
    Used when pyarrow's lz4_raw codec can't (no size prefix) or as the
    error-reporting rerun when it fails."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        token = data[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise VrlError("expected another byte, found none")
                b = data[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if len(out) + lit > cap:
            raise VrlError(
                "provided output is too small for the decompressed "
                f"data, actual {cap}, expected {len(out) + lit}")
        if i + lit > n:
            raise VrlError("literal is out of bounds of the input")
        out += data[i:i + lit]
        i += lit
        if i >= n:
            break  # last sequence ends with literals
        if i + 2 > n:
            raise VrlError("expected another byte, found none")
        off = data[i] | (data[i + 1] << 8)
        i += 2
        if off == 0 or off > len(out):
            raise VrlError("the offset to copy is not contained in the "
                           "decompressed buffer")
        ml = (token & 0xF) + 4
        if token & 0xF == 15:
            while True:
                if i >= n:
                    raise VrlError("expected another byte, found none")
                b = data[i]
                i += 1
                ml += b
                if b != 255:
                    break
        if len(out) + ml > cap:
            raise VrlError(
                "provided output is too small for the decompressed "
                f"data, actual {cap}, expected {len(out) + ml}")
        if off >= ml:
            out += out[-off:len(out) - off + ml]
        else:  # overlapping copy replicates byte-by-byte
            for _ in range(ml):
                out.append(out[-off])
    return bytes(out)


def decode_lz4(value: bytes, prepended_size: bool = True,
               buf_size: int = 1024 * 1024) -> str:
    """decode_lz4.rs: block format w/ prepended size, or LZ4 frame."""
    import struct
    raw = _raw(value)
    if raw[:4] == b"\x04\x22\x4d\x18":  # LZ4 frame magic
        # FLG bit 3 = content-size present (8 bytes LE after FLG/BD)
        size = None
        flg = raw[4]
        hdr = 6
        if (flg >> 3) & 1:
            size = int.from_bytes(raw[6:14], "little")
            hdr = 14
        hdr += 1  # header checksum byte
        if size is None:
            # walk the frame: uncompressed blocks (high bit set in the
            # block size) can be extracted without the codec
            out_parts = []
            pos = hdr
            ok = True
            while pos + 4 <= len(raw):
                bsz = int.from_bytes(raw[pos:pos + 4], "little")
                pos += 4
                if bsz == 0:
                    break  # EndMark
                uncompressed = bool(bsz & 0x80000000)
                bsz &= 0x7FFFFFFF
                if not uncompressed:
                    ok = False
                    break
                out_parts.append(raw[pos:pos + bsz])
                pos += bsz
                if (flg >> 4) & 1:
                    pos += 4  # block checksum
            if ok and out_parts:
                return b"".join(out_parts).decode("utf-8", "replace")
            raise VrlError(
                "unable to decode value with lz4 frame decoder: frame "
                "carries no content size")
        codec = _pa_codec("lz4")
        try:
            out = _decompress_sized(codec, raw, size)
            return out.decode("utf-8", "replace")
        except Exception as e:
            raise VrlError(
                f"unable to decode value with lz4 frame decoder: {e}") from e
    # block format (lz4_flex decompress[_size_prepended] semantics)
    try:
        if prepended_size:
            if len(raw) < 4:
                raise VrlError("expected another byte, found none")
            size = struct.unpack("<I", raw[:4])[0]
            codec = _pa_codec("lz4_raw")
            try:  # fast path: exact-size C decode
                out = codec.decompress(raw[4:], decompressed_size=size,
                                       asbytes=True)
            except Exception:
                out = _lz4_block_decompress(raw[4:], size)
        else:
            out = _lz4_block_decompress(raw, buf_size)
    except VrlError as e:
        raise VrlError(
            f"unable to decode value with lz4 block decoder: {e}") from e
    return out.decode("utf-8", "replace")


# --- structured encoders ---------------------------------------------------

def encode_json(value: Any, pretty: bool = False) -> str:
    """encode_json.rs: sorted object keys (BTreeMap order,
    value.rs:33-34)."""
    if pretty:
        from ..value import _has_sci_float, _json_default, _pretty_json_ryu

        try:
            s = _json.dumps(value, sort_keys=True, indent=2,
                            default=_json_default,
                            ensure_ascii=False, allow_nan=False)
        except ValueError:
            return _pretty_json_ryu(value)
        if ("e+" in s or "e-" in s) and _has_sci_float(value):
            return _pretty_json_ryu(value)  # ryu float text
        return s
    return _encode_json_sorted(value)


def encode_csv(value: list, delimiter: str = ",") -> str:
    """encode_csv.rs: one CSV record from an array of STRINGS
    (elements go through try_bytes — non-strings error, no coercion);
    the delimiter must be a single byte (csv_utils.rs:3-11); an empty
    array returns "" (encode_csv.rs:24-28); fields containing the
    delimiter, quotes or CR/LF are double-quoted (csv crate
    QuoteStyle::Necessary)."""
    if not isinstance(value, list):
        raise VrlError(f"expected array, got {vrl_type(value)}")
    items = []
    for v in value:
        if isinstance(v, bytes):
            v = v.decode("utf-8", "replace")
        if not isinstance(v, str):
            raise VrlError(f"expected string, got {vrl_type(v)}")
        items.append(v)
    if not items:
        return ""
    d = delimiter.encode("utf-8")
    if len(d) != 1:
        raise VrlError("delimiter must be a single character")

    def q(s: str) -> str:
        if any(ch in s for ch in (delimiter, '"', "\n", "\r")):
            return '"' + s.replace('"', '""') + '"'
        return s

    return delimiter.join(q(s) for s in items)


def _plain(v) -> str:
    from .coerce import to_string
    if v is None:
        return ""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    try:
        # regex leaves serialize as their pattern text (Value
        # Serialize, value/value/serde.rs:67)
        import re as _stdre

        import regex as _rx
        if isinstance(v, (_stdre.Pattern, _rx.Pattern)):
            return v.pattern
    except ImportError:
        pass
    return to_string(v)


# Rust char::is_whitespace = the Unicode White_Space property; Python
# str.isspace() additionally counts U+001C..001F (file separators)
_RUST_WS = frozenset(map(chr, [
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680,
    *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
]))


def _kv_escape(s: str) -> str:
    """core/encode_key_value.rs encode_string: quote iff the text has
    whitespace / '"' / '='; escape '\\' -> '\\\\', '"' -> '\\"' and a
    REAL newline -> '\\\\n' (two backslashes + n, lex verbatim from
    the reference); empty strings stay bare."""
    needs_quoting = any(c in _RUST_WS or c in '"=' for c in s)
    out = []
    for c in s:
        if c == "\\":
            out.append("\\\\")
        elif c == '"':
            out.append('\\"')
        elif c == "\n":
            out.append("\\\\n")
        else:
            out.append(c)
    body = "".join(out)
    return f'"{body}"' if needs_quoting else body


def _kv_flatten(value, key: str, out: dict) -> None:
    """core/encode_key_value.rs KeyValueSerializer: objects descend as
    `parent.key`, arrays as `parent.<index>`; leaves keep their Data
    kind so flatten_boolean and Display formatting apply per leaf.
    Empty containers contribute nothing."""
    if isinstance(value, dict):
        for k, v in value.items():
            _kv_flatten(v, f"{key}.{k}" if key else str(k), out)
    elif isinstance(value, list):
        for i, v in enumerate(value):
            _kv_flatten(v, f"{key}.{i}" if key else str(i), out)
    else:
        out[key] = value


def encode_key_value(
    value: dict,
    fields_ordering: Optional[list] = None,
    key_value_delimiter: str = "=",
    field_delimiter: str = " ",
    flatten_boolean: bool = False,
) -> str:
    """encode_key_value.rs (core impl src/core/encode_key_value.rs):
    nested objects flatten to dotted keys and arrays to indexed keys
    (network.ip.0=127); null renders as `null` (Data::None); ordered
    fields first, the rest in BTreeMap (sorted) order; quoting /
    escaping per encode_string."""
    if not isinstance(value, dict):
        raise VrlError("expected object")
    flat: dict = {}
    for k, v in value.items():
        _kv_flatten(v, str(k), flat)

    def render(v) -> str:
        # Data Display (core/encode_key_value.rs:140-153)
        if v is None:
            return "null"
        return _plain(v)

    def pair(k, v):
        if flatten_boolean and v is True:
            return _kv_escape(k)
        if flatten_boolean and v is False:
            return None  # false booleans are dropped entirely
        return f"{_kv_escape(k)}{key_value_delimiter}{_kv_escape(render(v))}"

    parts = []
    ordered = []
    for k in (fields_ordering or []):
        if k in flat:
            ordered.append(k)
            parts.append(pair(k, flat.pop(k)))
    parts += [pair(k, flat[k]) for k in sorted(flat)]
    return field_delimiter.join(p for p in parts if p is not None)


def encode_logfmt(value: dict, fields_ordering: Optional[list] = None) -> str:
    """encode_logfmt.rs: encode_key_value with logfmt defaults +
    boolean flattening."""
    return encode_key_value(value, fields_ordering, "=", " ", flatten_boolean=True)
