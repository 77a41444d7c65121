"""Sweep the reference's `test_function!` vectors against our registry.

Extracts every case whose args/want are expressible as plain literals
(`value!(...)`, strings, numbers, vec![..]) from
/root/reference/src/stdlib/*.rs and runs it against
vrl_ray.functions.REGISTRY, reporting divergences. Cases using
non-literal Rust constructs (chrono builders, Regex::new, local
variables) are skipped and counted.

Usage: python scripts/ref_vectors.py [--verbose] [fn_name ...]
"""

from __future__ import annotations

import glob
import json
import math
import re
import sys

sys.path.insert(0, "/root/repo")

from vrl_ray.functions import REGISTRY
from vrl_ray.lang.interpreter import _ARG_RENAME
from vrl_ray.value import VrlError

REF = "/root/reference/src/stdlib"

# stdlib identifiers whose vectors can't run meaningfully here
SKIP_FNS = {
    "now", "uuid_v4", "uuid_v7", "uuid_from_friendly_id", "random_bool",
    "random_bytes", "random_float", "random_int", "get_env_var",
    "get_hostname", "dns_lookup", "reverse_dns", "http_request",
    "get_enrichment_table_record", "find_enrichment_table_records",
    "get_secret", "set_secret", "remove_secret", "log",
    "set_semantic_meaning",
    # interpreter special forms, not REGISTRY entries (tested in
    # tests/test_lang.py)
    "assert", "assert_eq",
}


class Unparseable(Exception):
    pass


def _balanced(src: str, start: int, open_c: str, close_c: str) -> int:
    """Index just past the matching close for the open at `start`."""
    depth = 0
    i = start
    in_str = None
    while i < len(src):
        c = src[i]
        if in_str:
            if in_str == '"' and c == "\\":
                i += 2
                continue
            if src.startswith(in_str, i):
                i += len(in_str)
                in_str = None
                continue
            i += 1
            continue
        if c == '"':
            # raw string?
            j = i - 1
            hashes = 0
            while j >= 0 and src[j] == "#":
                hashes += 1
                j -= 1
            if j >= 0 and src[j] == "r" and hashes:
                in_str = '"' + "#" * hashes
            else:
                in_str = '"'
            i += 1
            continue
        if c == open_c:
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise Unparseable("unbalanced")


def _split_top(s: str, sep: str = ",") -> list[str]:
    out, depth, cur, i, in_str = [], 0, [], 0, None
    while i < len(s):
        c = s[i]
        if in_str:
            cur.append(c)
            if in_str == '"' and c == "\\":
                cur.append(s[i + 1])
                i += 2
                continue
            if s.startswith(in_str, i):
                cur.extend(in_str[1:])
                i += len(in_str)
                in_str = None
                continue
            i += 1
            continue
        if c == '"':
            j = i - 1
            hashes = 0
            while j >= 0 and s[j] == "#":
                hashes += 1
                j -= 1
            in_str = '"' + "#" * hashes if (j >= 0 and s[j] == "r"
                                            and hashes) else '"'
            cur.append(c)
            i += 1
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        if c == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


_NUM_RE = re.compile(r"^-?[\d_]+(\.[\d_]+)?(_f64|_i64|f64|i64)?$")


# set per-file by extract() so data-dir helpers resolve relative paths
CURRENT_FILE = ""
_DATA_ROOT = "/root/reference/tests/data"


def _rfc_dt(kind: str, s: str):
    from datetime import datetime, timezone
    if kind == "rfc3339":
        s = re.sub(r"(\.\d{6})\d+", r"\1", s)  # ns → µs precision
        return datetime.fromisoformat(s.replace("Z", "+00:00")) \
            .astimezone(timezone.utc)
    from email.utils import parsedate_to_datetime
    return parsedate_to_datetime(s).astimezone(timezone.utc)


def _find_data(rel: str) -> str:
    import os
    for sub in ("protobuf", "cbor", "jsonschema", "grok", "fixtures", ""):
        cand = os.path.join(_DATA_ROOT, sub, rel)
        if os.path.exists(cand):
            return cand
    raise Unparseable(f"data file {rel}")


def rust_val(expr: str):
    """A Rust literal / value!() / vec![] expression → Python value."""
    e = expr.strip()
    if e.startswith("&"):
        e = e[1:].strip()
    while True:
        for suf in (".to_string()", ".to_owned()", ".into()", ".unwrap()",
                    ".as_bytes()", ".as_ref()", ".clone()"):
            if e.endswith(suf):
                e = e[: -len(suf)]
                break
        else:
            break
    if e.startswith("value!"):
        o = len(e) - len(e[6:].lstrip()) - 6 + 6  # first non-space
        o = 6 + (len(e[6:]) - len(e[6:].lstrip()))
        br = e[o]
        close = {"(": ")", "[": "]", "{": "}"}[br]
        inner = e[o + 1: _balanced(e, o, br, close) - 1]
        if br == "{":  # value!{..} object body keeps its braces
            inner = e[o: _balanced(e, o, br, close)]
        return _value_macro(inner)
    if e.startswith("Value::from(") or e.startswith("Bytes::from("):
        inner = e[e.index("(") + 1: _balanced(e, e.index("("), "(", ")") - 1]
        return rust_val(inner)
    if e in ("Value::Null", "NULL", "()"):
        return None
    if e == "true":
        return True
    if e == "false":
        return False
    m = re.match(r'"((?:[^"\\]|\\.)*)"\s*\.\s*repeat\((\d[\d_]*)\)$', e)
    if m:
        return (json.loads(f'"{m.group(1)}"', strict=False)
                * int(m.group(2).replace("_", "")))
    if e == "KB_256":  # decode_lz4.rs test const
        return 262144
    if e.startswith("r#\"") or e.startswith("r\""):
        hashes = len(e) - len(e.lstrip("r")) if False else 0
        m = re.match(r'^r(#*)"', e)
        body = e[len(m.group(0)): -(1 + len(m.group(1)))]
        return body
    if e.startswith('"'):
        return json.loads(_unescape_rust_str(e), strict=False)
    if _NUM_RE.match(e):
        is_f = "f64" in e or "." in e
        t = e.replace("_f64", "").replace("_i64", "").replace("f64", "") \
            .replace("i64", "").replace("_", "")
        return float(t) if is_f else int(t)
    if e.startswith("vec!["):
        inner = e[5: _balanced(e, 4, "[", "]") - 1]
        return [rust_val(x) for x in _split_top(inner)]
    if e.startswith("btreemap!"):
        open_i = 9 + len(e[9:]) - len(e[9:].lstrip())
        close = _balanced(e, open_i, e[open_i],
                          {"{": "}", "(": ")", "[": "]"}[e[open_i]])
        inner = e[open_i + 1: close - 1]
        out = {}
        for item in _split_top(inner):
            if not item.strip():
                continue
            k, _, v = item.partition("=>")
            out[rust_val(k)] = rust_val(v)
        return out
    m = re.match(r"(?:regex::)?Regex::new\(", e)
    if m:
        inner = e[m.end(): _balanced(e, m.end() - 1, "(", ")") - 1]
        import regex as regex_mod
        return regex_mod.compile(rust_val(inner))
    fm = re.search(r'\.\s*format\("([^"]*)"\)$', e)
    if fm and re.match(r"Utc\s*\.|\"?DateTime\"?::", e):
        # chrono .format(..) chain; sandbox Local == UTC
        from vrl_ray.functions.timestamp import format_timestamp
        return format_timestamp(rust_val(e[: fm.start()]), fm.group(1))
    m = re.match(r"Utc\s*\.\s*with_ymd_and_hms\(", e)
    if m:
        close = _balanced(e, m.end() - 1, "(", ")")
        inner = e[m.end(): close - 1]
        from datetime import datetime, timezone
        now_year = str(datetime.now(timezone.utc).year)
        parts = [int(x.strip().replace("Utc::now().year()", now_year))
                 for x in _split_top(inner)]
        dt = datetime(*parts, tzinfo=timezone.utc)
        # chained .with_nanosecond(N) fraction (test fixtures chain it
        # after .unwrap())
        nm = re.search(r"with_nanosecond\((\d[\d_]*)\)", e[close:])
        if nm:
            dt = dt.replace(
                microsecond=int(nm.group(1).replace("_", "")) // 1000)
        return dt
    m = re.match(r"Utc\s*\.\s*timestamp_opt\(", e)
    if m:
        inner = e[m.end(): _balanced(e, m.end() - 1, "(", ")") - 1]
        from datetime import datetime, timezone
        secs, nanos = [int(x) for x in _split_top(inner)]
        return datetime.fromtimestamp(secs, tz=timezone.utc).replace(
            microsecond=nanos // 1000)
    m = re.match(r'b"', e)
    if m:
        body = e[2:e.rindex('"')]
        return body.encode("latin-1").decode("unicode_escape") \
            .encode("latin-1")
    m = re.match(r"indoc!\s*[({]\s*", e)
    if m:
        import textwrap
        inner = rust_val(e[m.end(): -1].strip())
        return textwrap.dedent(inner).strip("\n")
    # wrappers that evaluate to their inner value
    for wrap in ("Value::Timestamp(", "Value::Regex(", "Value::Array(",
                 "Value::Bytes(", "Value::Integer(", "Value::Float("):
        if e.startswith(wrap):
            o = len(wrap) - 1
            return rust_val(e[o + 1: _balanced(e, o, "(", ")") - 1])
    m = re.match(r'(?:"?DateTime"?::)?parse_from_str\(', e)
    if m:
        close = _balanced(e, m.end() - 1, "(", ")")
        text, fmt = [rust_val(x)
                     for x in _split_top(e[m.end(): close - 1])]
        from vrl_ray.functions.parse_logs import _parse_ts
        return _parse_ts(text, fmt)
    m = re.match(r'(?:"?DateTime"?::)?from_timestamp_nanos\(', e)
    if m:
        from datetime import datetime, timezone
        close = _balanced(e, m.end() - 1, "(", ")")
        ns = int(e[m.end(): close - 1].replace("_", ""))
        return (datetime(1970, 1, 1, tzinfo=timezone.utc)
                + __import__("datetime").timedelta(microseconds=ns // 1000))
    m = re.match(r'(?:"?DateTime"?::)?parse_from_(rfc3339|rfc2822)\(', e)
    if m and "parse_from_" in e[:m.end()]:
        close = _balanced(e, m.end() - 1, "(", ")")
        dt = _rfc_dt(m.group(1), rust_val(e[m.end(): close - 1]))
        nm = re.search(r"with_nanosecond\((\d[\d_]*)\)", e[close:])
        if nm:
            dt = dt.replace(
                microsecond=int(nm.group(1).replace("_", "")) // 1000)
        return dt
    if e in ("BTreeMap::new()", "ObjectMap::new()"):
        return {}
    if e == "f64::INFINITY":
        return float("inf")
    if e == "f64::NEG_INFINITY":
        return float("-inf")
    if e == "f64::MAX":
        return 1.7976931348623157e308
    if e == "f64::MIN":
        return -1.7976931348623157e308
    if e == "i64::from(u32::MAX) + 1":
        return 4294967296
    if e == "i64::MAX - 1":
        return 9223372036854775806
    if e.startswith("get_name_for_timezone(") and "Tz::UTC" in e:
        return "UTC"
    m = re.match(r'"((?:[^"\\]|\\.)*)"\s*\.\s*repeat\((\d[\d_]*)\)', e)
    if m:
        return (json.loads(f'"{m.group(1)}"', strict=False)
                * int(m.group(2).replace("_", "")))
    m = re.match(r"format!\s*\(", e)
    if m:
        close = _balanced(e, m.end() - 1, "(", ")")
        parts = _split_top(e[m.end(): close - 1])
        tmpl = rust_val(parts[0])
        vals_iter = iter(parts[1:])

        def _slot(sm):  # left-to-right like Rust: {{, }}, {}
            t = sm.group(0)
            if t == "{{":
                return "{"
            if t == "}}":
                return "}"
            return str(rust_val(next(vals_iter)))

        return re.sub(r"\{\{|\}\}|\{\}", _slot, tmpl)
    if e.startswith("Value::Object("):
        return rust_val(e[14: _balanced(e, 13, "(", ")") - 1])
    for mapper in ("ObjectMap::from(", "Value::from_iter("):
        if e.startswith(mapper):
            o = len(mapper) - 1
            inner = e[o + 1: _balanced(e, o, "(", ")") - 1].strip()
            if inner.startswith("[") and inner.endswith("]"):
                inner = inner[1:-1]
            out = {}
            for item in _split_top(inner):
                item = item.strip()
                if not item:
                    continue
                if not item.startswith("("):
                    raise Unparseable(item[:40])
                kv = _split_top(item[1: _balanced(item, 0, "(", ")") - 1])
                k = kv[0].strip()
                km = re.match(r'(?:KeyString|String)::from\(', k)
                if km:
                    k = k[km.end(): _balanced(k, km.end() - 1,
                                              "(", ")") - 1]
                out[rust_val(k)] = rust_val(kv[1])
            return out
    if e == "Utc::now().year()":
        from datetime import datetime, timezone
        return datetime.now(timezone.utc).year
    if re.match(r"(?:std::)?char::REPLACEMENT_CHARACTER", e):
        return "�"
    m = re.match(r'Bytes::copy_from_slice\(&(b?"(?:[^"\\]|\\.)*")\[\.\.\]\)',
                 e)
    if m:
        return rust_val(m.group(1))
    if e == "u64::MAX":
        return 18446744073709551615
    if e in ("i64::MAX", "u64::MAX as i64"):
        return 9223372036854775807
    if e == "i64::MIN":
        return -9223372036854775808
    m = re.match(r"Bytes::from_static\(&\[", e)
    if m:
        inner = e[m.end(): _balanced(e, m.end() - 1, "[", "]") - 1]
        return bytes(int(x.strip(), 0) for x in _split_top(inner)
                     if x.strip())
    m = re.match(r"decode_base64\(", e)
    if m:
        import base64
        inner = rust_val(e[m.end(): _balanced(e, m.end() - 1, "(", ")") - 1])
        return base64.b64decode(inner)
    m = re.match(r"get_encoded_bytes\(", e)
    if m and CURRENT_FILE.startswith("decode_"):
        # decode-test INPUT helper: any valid stream of the codec
        # under test exercises the real decode path (the `encode(`
        # helper in encode_* tests stays skipped — using our own
        # encoder as its oracle would be circular)
        inner = _split_top(e[m.end(): _balanced(e, m.end() - 1,
                                                "(", ")") - 1])
        text = rust_val(inner[0])
        raw = text.encode() if isinstance(text, str) else text
        if "gzip" in CURRENT_FILE:
            from vrl_ray.functions.codec import encode_gzip
            return encode_gzip(text, 1)
        if "zlib" in CURRENT_FILE:
            import zlib
            return zlib.compress(raw, 1)
        if "zstd" in CURRENT_FILE:
            import pyarrow as pa
            return pa.Codec("zstd").compress(raw, asbytes=True)
        if "snappy" in CURRENT_FILE:
            import pyarrow as pa
            return pa.Codec("snappy").compress(raw, asbytes=True)
        raise Unparseable(e[:60])
    m = re.match(r"read_pb_file\(", e)
    if m:
        rel = rust_val(e[m.end(): _balanced(e, m.end() - 1, "(", ")") - 1])
        with open(_find_data(rel), "rb") as f:
            return f.read().decode("utf-8")
    m = re.match(r"read_cbor_file\(", e)
    if m:
        rel = rust_val(e[m.end(): _balanced(e, m.end() - 1, "(", ")") - 1])
        with open(_find_data(rel), "rb") as f:
            return f.read()
    m = re.match(r"test_data_dir\(\)\s*\.\s*join\(", e)
    if m:
        rel = rust_val(e[m.end(): _balanced(e, m.end() - 1, "(", ")") - 1])
        return _find_data(rel)
    if re.match(r"^-?\d+\.\d*e-?\d+$", e):
        return float(e)
    raise Unparseable(e[:60])


def _unescape_rust_str(tok: str) -> str:
    """Rust string literal → JSON string literal: \\xNN, \\u{..},
    \\', \\0 are Rust-only escapes (escape-aware scan so a literal
    backslash-x survives)."""
    out = []
    i, n = 0, len(tok)
    while i < n:
        c = tok[i]
        if c == "\\" and i + 1 < n:
            nx = tok[i + 1]
            if nx == "x" and i + 3 < n:
                out.append("\\u00" + tok[i + 2: i + 4])
                i += 4
                continue
            if nx == "u" and tok[i + 2: i + 3] == "{":
                j = tok.index("}", i)
                cp = int(tok[i + 3: j], 16)
                if cp <= 0xFFFF:
                    out.append("\\u%04x" % cp)
                else:
                    cp -= 0x10000
                    out.append("\\u%04x\\u%04x"
                               % (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)))
                i = j + 1
                continue
            if nx == "'":
                out.append("'")
                i += 2
                continue
            if nx == "0":
                out.append("\\u0000")
                i += 2
                continue
            out.append(tok[i: i + 2])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


_EMBED_RE = re.compile(
    r'b"|(?:regex::)?Regex::new\(|'
    r'(?:"?DateTime"?::)?(?:parse_from_rfc\d+|parse_from_str|'
    r"from_timestamp_nanos)\(|"
    r"Utc\s*\.\s*(?:with_ymd_and_hms|timestamp_opt)\(|"
    r"Bytes::from_static\(|decode_base64\(|get_encoded_bytes\(|"
    r"read_pb_file\(|read_cbor_file\(|format!\s*\(|"
    r'"(?:[^"\\]|\\.)*"\s*\.\s*repeat\(|'
    r"Bytes::copy_from_slice\(|"
    r"(?:std::)?char::REPLACEMENT_CHARACTER")


def _extract_embedded(s: str):
    """Replace non-JSON Rust subexpressions inside a value!() body with
    quoted placeholders; returns (new_body, values). String-literal
    content is never touched."""
    out = []
    vals: list = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        m = _EMBED_RE.match(s, i)
        if m:
            tok = m.group(0)
            if tok == 'b"':
                k = i + 2
                while k < n:
                    if s[k] == "\\":
                        k += 2
                        continue
                    if s[k] == '"':
                        k += 1
                        break
                    k += 1
            elif tok.endswith("REPLACEMENT_CHARACTER"):
                k = m.end()
            else:
                k = _balanced(s, m.end() - 1, "(", ")")
            # swallow trailing .ident(...) chains (.unwrap(),
            # .with_nanosecond(n), .into(), ...), which test
            # formatting may put on their own lines
            while True:
                dm = re.match(r"\s*\.\s*\w+\(", s[k:])
                if not dm:
                    break
                k = _balanced(s, k + dm.end() - 1, "(", ")")
            vals.append(rust_val(s[i:k]))
            out.append(f'"\x02{len(vals) - 1}\x02"')
            i = k
            continue
        if c == '"':  # skip string literals (incl. raw)
            j = i - 1
            hashes = 0
            while j >= 0 and s[j] == "#":
                hashes += 1
                j -= 1
            is_raw = j >= 0 and s[j] == "r" and hashes
            end_tok = '"' + "#" * hashes if is_raw else '"'
            k = i + 1
            while k < n:
                if not is_raw and s[k] == "\\":
                    k += 2
                    continue
                if s.startswith(end_tok, k):
                    k += len(end_tok)
                    break
                k += 1
            out.append(s[i:k])
            i = k
            continue
        out.append(c)
        i += 1
    return "".join(out), vals


def _subst_embedded(v, vals):
    if isinstance(v, str) and len(v) >= 3 and v[0] == "\x02" \
            and v[-1] == "\x02":
        return vals[int(v[1:-1])]
    if isinstance(v, dict):
        return {k: _subst_embedded(x, vals) for k, x in v.items()}
    if isinstance(v, list):
        return [_subst_embedded(x, vals) for x in v]
    return v


def _value_macro(s: str):
    """value!(...) body → Python via a JSON-ification pass. Embedded
    non-JSON Rust subexpressions (b"...", DateTime builders, regexes)
    ride quoted placeholders and are substituted back after parse."""
    s = s.strip()
    # whole-body Rust expressions inside value!() delegate straight
    # back to the expression parser
    if re.match(r"vec!\[|get_name_for_timezone\(|Bytes::|KB_256$", s):
        return rust_val(s)
    s, embedded = _extract_embedded(s)
    out = []
    i = 0
    in_str = None
    while i < len(s):
        c = s[i]
        if in_str:
            if in_str == '"' and c == "\\":
                out.append(c)
                out.append(s[i + 1])
                i += 2
                continue
            if s.startswith(in_str, i):
                if in_str != '"':
                    out.append('"')
                    i += len(in_str)
                else:
                    out.append(c)
                    i += 1
                in_str = None
                continue
            if in_str != '"' and c in '"\\':
                out.append("\\" + c)
                i += 1
                continue
            if c == "\n":
                out.append("\\n")
                i += 1
                continue
            out.append(c)
            i += 1
            continue
        if c == '"':
            j = i - 1
            hashes = 0
            while j >= 0 and s[j] == "#":
                hashes += 1
                j -= 1
            if j >= 0 and s[j] == "r" and hashes:
                # we already emitted 'r' and hashes — drop them
                for _ in range(hashes + 1):
                    out.pop()
                in_str = '"' + "#" * hashes
                out.append('"')
            else:
                in_str = '"'
                out.append(c)
            i += 1
            continue
        out.append(c)
        i += 1
    j = "".join(out)
    # mask string literals so the JSON-ification regexes can't touch
    # their contents
    strs: list[str] = []

    def _mask(m):
        strs.append(m.group(0))
        return f'"\x00{len(strs) - 1}\x00"'

    j = re.sub(r'"(?:[^"\\]|\\.)*"', _mask, j)
    # () → null, bare keys → quoted, trailing commas removed,
    # underscore-grouped numbers joined, f64/i64 suffixes dropped
    j = re.sub(r"\(\)", "null", j)
    # parenthesized numeric literals: (-1.0)
    j = re.sub(r"\((-?\d+(?:\.\d+)?)\)", r"\1", j)
    j = re.sub(r"(?<=[\d])_(?=[\d])", "", j)
    j = re.sub(r"(\d+\.\d+)_?f64", r"\1", j)
    j = re.sub(r"(\d+)_?f64", r"\1.0", j)
    j = re.sub(r"(\d+)_?i64", r"\1", j)
    j = re.sub(r"([,{\[]\s*)([A-Za-z_][A-Za-z0-9_.-]*)(\s*:)", r'\1"\2"\3', j)
    j = re.sub(r"^\s*([A-Za-z_][A-Za-z0-9_.-]*)(\s*:)", r'"\1"\2', j)
    j = re.sub(r",(\s*[}\]])", r"\1", j)
    j = re.sub(r"(-?\d+)\.([,}\]\s])", r"\1.0\2", j)
    j = re.sub(r'"\x00(\d+)\x00"',
               lambda m: _unescape_rust_str(strs[int(m.group(1))]), j)
    try:
        # strict=False: the \x02 embed placeholders are control chars
        return _subst_embedded(json.loads(j, strict=False), embedded)
    except Exception as exc:
        raise Unparseable(f"value! {j[:60]}") from exc


def extract(path: str) -> list[dict]:
    global CURRENT_FILE
    CURRENT_FILE = path.rsplit("/", 1)[-1]
    src = open(path).read()
    # drop test_function! blocks gated on the ABSENCE of a
    # default-build feature (e.g. redact.rs sha2_rejected_without_crypto
    # under #[cfg(not(feature = "enable_crypto_functions"))]) — those
    # vectors describe the stripped-down build. float_roundtrip is NOT
    # a default feature, so its not()-gated block stays active.
    for gm in reversed(list(re.finditer(
            r'#\[cfg\(not\(feature\s*=\s*"enable_\w+"\)\)\]\s*'
            r'test_function!\[', src))):
        end = _balanced(src, gm.end() - 1, "[", "]")
        src = src[: gm.start()] + src[end:]
    m = re.search(r"test_function!\[\s*(\w+)\s*=>", src)
    if not m:
        return []
    # the block's local name can differ from the stdlib identifier
    # (e.g. to_code => ToSyslogFacilityCode) — trust fn identifier()
    im = re.search(r'fn identifier\(&self\) -> &\'static str \{\s*"(\w+)"',
                   src)
    fn_name = im.group(1) if im else m.group(1)
    cases = []
    i = src.index(";", m.end()) + 1
    case_re = re.compile(r"(\w+)\s*\{")
    while True:
        cm = case_re.search(src, i)
        if not cm:
            break
        try:
            end = _balanced(src, cm.end() - 1, "{", "}")
        except Unparseable:
            break
        body = src[cm.end(): end - 1]
        i = end
        am = re.search(r"args:\s*func_args!\[", body)
        wm = re.search(r"want:\s*", body)
        if not am or not wm:
            continue
        try:
            aend = _balanced(body, am.end() - 1, "[", "]")
            args_src = body[am.end(): aend - 1]
            want_src = body[wm.end():]
            # want runs to the matching end of Ok(...)/Err(...)
            om = re.match(r"(Ok|Err)\s*\(", want_src)
            if not om:
                raise Unparseable("want " + want_src[:40])
            wend = _balanced(want_src, om.end() - 1, "(", ")")
            kind = om.group(1)
            want_inner = want_src[om.end(): wend - 1]
            args = {}
            for item in _split_top(args_src):
                if not item.strip():
                    continue
                k, _, v = item.partition(":")
                args[k.strip()] = rust_val(v)
            if kind == "Ok":
                want = ("ok", rust_val(want_inner))
            else:
                want = ("err", rust_val(want_inner))
            # per-test context timezone (TimeZone::Named) → the
            # timezone_name extension our log parsers accept
            tzm = re.search(
                r"tz:\s*TimeZone::Named\(chrono_tz::(\w+)::(\w+)\)", body)
            if tzm and tzm.group(2) != "UTC" and "timezone" not in args \
                    and "timezone_name" not in args:
                args["timezone_name"] = \
                    f"{tzm.group(1)}/{tzm.group(2).replace('__', '-')}"
            cases.append({"fn": fn_name, "case": cm.group(1),
                          "args": args, "want": want,
                          "file": path.rsplit("/", 1)[-1]})
        except Exception as exc:  # any non-literal construct → skip
            cases.append({"fn": fn_name, "case": cm.group(1),
                          "skip": f"{type(exc).__name__} {exc}"[:80],
                          "file": path.rsplit("/", 1)[-1]})
    return cases


def _eq(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b or a == b
    if isinstance(a, float) and isinstance(b, (int, float)):
        if math.isnan(a):
            return isinstance(b, float) and math.isnan(b)
        return math.isclose(a, float(b), rel_tol=1e-12, abs_tol=1e-12)
    if isinstance(a, int) and isinstance(b, float):
        return _eq(float(a), b)
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, bytes) and isinstance(b, str):
        return a.decode("utf-8", "replace") == b
    if isinstance(b, bytes) and isinstance(a, str):
        return _eq(b, a)
    return a == b


def _norm(v):
    from datetime import datetime
    if isinstance(v, datetime):
        from vrl_ray.value import timestamp_rfc3339
        return timestamp_rfc3339(v)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def main(argv):
    verbose = "--verbose" in argv
    only = {a for a in argv if not a.startswith("-")}
    files = sorted(glob.glob(REF + "/*.rs"))
    total = skipped = passed = 0
    diverged, err_msgs = [], []
    for path in files:
        for case in extract(path):
            fn = case["fn"]
            if only and fn not in only:
                continue
            if fn in SKIP_FNS:
                continue
            total += 1
            if "skip" in case:
                skipped += 1
                if verbose:
                    print(f"SKIP  {fn}.{case['case']}: {case['skip']}")
                continue
            impl = REGISTRY.get(fn)
            if impl is None:
                diverged.append((case, "NOT IN REGISTRY"))
                continue
            kind, want = case["want"]
            want = _norm(want)
            kwargs = {_ARG_RENAME.get(k, k): v
                      for k, v in case["args"].items()}
            if fn == "chunks":
                # chunks.rs has no utf8 parameter; the test harness
                # silently drops the stray arg
                kwargs.pop("utf8", None)
            try:
                got = _norm(impl(**kwargs))
                if kind == "err":
                    diverged.append((case, f"expected error {want!r}, "
                                           f"got {got!r}"))
                elif _eq(got, want):
                    passed += 1
                else:
                    diverged.append((case, f"got {got!r} want {want!r}"))
            except VrlError as e:
                if kind == "err":
                    passed += 1
                    if isinstance(want, str) and str(e) != want:
                        err_msgs.append((case, str(e), want))
                else:
                    diverged.append((case, f"raised {e} want {want!r}"))
            except TypeError as e:
                diverged.append((case, f"SIGNATURE: {e}"))
            except Exception as e:
                diverged.append((case, f"CRASH {type(e).__name__}: {e}"))
    print(f"\n{total} cases: {passed} pass, {len(diverged)} diverge, "
          f"{skipped} skipped (non-literal)")
    for case, why in diverged:
        print(f"DIVERGE {case['file']} {case['fn']}.{case['case']}: "
              f"args={case['args']!r:.120} :: {why[:300]}")
    if verbose:
        for case, got, want in err_msgs:
            print(f"ERRMSG {case['fn']}.{case['case']}: got {got!r} "
                  f"want {want!r}")
    print(f"\n({len(err_msgs)} error-message texts differ; "
          f"run --verbose to list)")


if __name__ == "__main__":
    main(sys.argv[1:])
