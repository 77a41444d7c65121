"""Structured-data parsers: ruby hash, XML, YAML, CBOR, protobuf,
eTLD, JSON-schema validation (row-level semantics).

Reference files: parse_ruby_hash.rs, parse_xml.rs (src/parsing/xml.rs),
parse_yaml.rs, parse_cbor.rs, parse_proto.rs / encode_proto.rs
(src/protobuf/), parse_etld.rs, validate_json_schema.rs.

File-path arguments (protobuf descriptors, PSL files, schema files,
grok alias sources) resolve relative to the working directory first,
then against ``$VRL_DATA_ROOT`` (defaults to the reference checkout so
the ported conformance examples find their fixtures).
"""

from __future__ import annotations

import json as _json
import math
import os
import re as _re
import struct
from typing import Any, Optional

from ..value import VrlError

__all__ = [
    "parse_ruby_hash", "parse_xml", "parse_yaml", "parse_cbor",
    "parse_proto", "encode_proto", "parse_etld", "validate_json_schema",
    "resolve_data_path",
]


def resolve_data_path(path: str) -> str:
    if os.path.isabs(path) or os.path.exists(path):
        return path
    root = os.environ.get("VRL_DATA_ROOT", "/root/reference")
    cand = os.path.join(root, path)
    if os.path.exists(cand):
        return cand
    raise VrlError(f"file not found: {path}")


# ---------------------------------------------------------------------------
# parse_ruby_hash (parse_ruby_hash.rs): `{ "k" => v, :sym => v }`

class _RubyParser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def err(self, msg):
        return VrlError(f"unable to parse ruby hash: {msg} at {self.i}")

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\r\n":
            self.i += 1

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, c):
        if self.peek() != c:
            raise self.err(f"expected {c!r}")
        self.i += 1

    def value(self):
        self.ws()
        c = self.peek()
        if c == "{":
            return self.hash_()
        if c == "[":
            return self.array()
        if c in "\"'":
            return self.string(c)
        if c == ":":
            return self.symbol()
        m = _re.compile(r"(nil|true|false|-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)") \
            .match(self.s, self.i)
        if not m:
            raise self.err("expected value")
        self.i = m.end()
        tok = m.group(0)
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        if "." in tok or "e" in tok or "E" in tok:
            return float(tok)
        return int(tok)

    def string(self, q):
        self.expect(q)
        out = []
        while True:
            c = self.peek()
            if c == "":
                raise self.err("unterminated string")
            if c == "\\":
                self.i += 1
                n = self.peek()
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(n, n))
                self.i += 1
                continue
            if c == q:
                self.i += 1
                return "".join(out)
            out.append(c)
            self.i += 1

    def symbol(self):
        self.expect(":")
        m = _re.compile(r"\w+").match(self.s, self.i)
        if not m:
            raise self.err("bad symbol")
        self.i = m.end()
        return m.group(0)

    def hash_(self):
        self.expect("{")
        out = {}
        self.ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.ws()
            c = self.peek()
            if c in "\"'":
                k = self.string(c)
            elif c == ":":
                k = self.symbol()
            else:
                m = _re.compile(r"\w+").match(self.s, self.i)
                if not m:
                    raise self.err("bad key")
                self.i = m.end()
                k = m.group(0)
            self.ws()
            if self.s[self.i:self.i + 2] == "=>":
                self.i += 2
            elif self.peek() == ":":
                self.i += 1
            else:
                raise self.err("expected =>")
            out[k] = self.value()
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.expect("}")
            return out

    def array(self):
        self.expect("[")
        out = []
        self.ws()
        if self.peek() == "]":
            self.i += 1
            return out
        while True:
            out.append(self.value())
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.expect("]")
            return out


def parse_ruby_hash(value: str) -> Any:
    p = _RubyParser(value)
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise p.err("trailing input")
    return v


# ---------------------------------------------------------------------------
# parse_xml (parse_xml.rs / src/parsing/xml.rs)

def _xml_scalar(text: str, parse_null: bool, parse_bool: bool,
                parse_number: bool):
    if parse_null and text in ("", "null"):
        # parsing/xml.rs:254 — "" | "null" if parse_null => Null
        return None
    if parse_bool and text in ("true", "false"):
        return text == "true"
    if parse_number:
        try:
            return int(text)
        except ValueError:
            pass
        try:
            f = float(text)
            if math.isfinite(f):
                return f
        except ValueError:
            pass
    return text


def parse_xml(value: str, include_attr: bool = True,
              attr_prefix: str = "@", text_key: str = "text",
              always_use_text_key: bool = False, parse_bool: bool = True,
              parse_null: bool = True, parse_number: bool = True,
              trim: bool = True) -> dict:
    import xml.etree.ElementTree as ET

    # roxmltree tolerates an <?xml..?> PI inside the document (ET does
    # not — "XML declaration not at start"); rename non-leading ones
    # and keep PIs/comments as tree nodes so they still count as
    # element children for the lone-text-vs-object shape decision
    # (parse_xml.rs header_inside_element test).
    body = value
    if body.lstrip().startswith("<?xml"):
        cut = body.find("<?xml") + 5  # keep the legal leading decl
        body = body[:cut] + body[cut:].replace("<?xml", "<?xml-pi")
    else:
        body = body.replace("<?xml", "<?xml-pi")
    try:
        parser = ET.XMLParser(target=ET.TreeBuilder(
            insert_comments=True, insert_pis=True))
        root = ET.fromstring(body, parser=parser)
    except ET.ParseError as e:
        # roxmltree reports token-level failures as
        # "unknown token at L:C" (1-based col; expat's is 0-based)
        em = _re.match(r"(syntax error|not well-formed \(invalid token\))"
                       r": line (\d+), column (\d+)", str(e))
        if em:
            raise VrlError("unable to parse xml: unknown token at "
                           f"{em.group(2)}:{int(em.group(3)) + 1}") from e
        raise VrlError(f"unable to parse xml: {e}") from e

    def conv(el):
        obj: dict[str, Any] = {}
        if include_attr:
            for k, v in el.attrib.items():
                obj[attr_prefix + k] = v
        nodes = list(el)  # elements + PIs/comments (tails carry text)
        children = [c for c in nodes if isinstance(c.tag, str)]
        for child in children:
            c = conv(child)
            tag = child.tag
            if tag in obj:
                if not isinstance(obj[tag], list):
                    obj[tag] = [obj[tag]]
                obj[tag].append(c)
            else:
                obj[tag] = c
        # every text node collects separately (el.text + child tails);
        # multiple survivors become a LIST under text_key
        # (parse_xml.rs untrimmed test)
        texts = [] if el.text is None else [el.text]
        texts += [c.tail for c in nodes if c.tail is not None]
        if trim:
            texts = [t.strip() for t in texts]
        texts = [t for t in texts if t != ""]
        if texts:
            scalars = [_xml_scalar(t, parse_null, parse_bool,
                                   parse_number) for t in texts]
            text_val = scalars[0] if len(scalars) == 1 else scalars
            # a lone text child collapses to a scalar — but any other
            # NODE (element, PI, comment) forces object shape
            if not obj and not nodes and not always_use_text_key \
                    and len(scalars) == 1:
                return text_val
            obj[text_key] = text_val
        if not obj and not texts:
            # empty element is ALWAYS an empty object (parsing/xml.rs
            # process_node: 0 children → Value::Object(recurse) = {});
            # parse_null applies to TEXT nodes, not element shape
            return {}
        return obj

    return {root.tag: conv(root)}


# ---------------------------------------------------------------------------
# parse_yaml (parse_yaml.rs): serde_yaml-compatible load

def parse_yaml(value: str) -> Any:
    import yaml

    try:
        return yaml.safe_load(value)
    except yaml.YAMLError as e:
        # serde_yaml renders MarkedYAMLError as one line:
        # "{problem} at line L column C, {context} at line L column C"
        prob = getattr(e, "problem", None)
        pm = getattr(e, "problem_mark", None)
        if prob and pm is not None:
            msg = f"{prob} at line {pm.line + 1} column {pm.column + 1}"
            ctx, cm = getattr(e, "context", None), \
                getattr(e, "context_mark", None)
            if ctx and cm is not None:
                msg += f", {ctx} at line {cm.line + 1} column {cm.column + 1}"
            raise VrlError(f"unable to parse yaml: {msg}") from e
        raise VrlError(f"unable to parse yaml: {e}") from e


# ---------------------------------------------------------------------------
# parse_cbor (parse_cbor.rs): RFC 8949 decoder (the subset serde_cbor
# produces: ints, floats, bytes, text, arrays, maps, bool/null, tags)

def _cbor_decode(data: bytes, i: int):
    if i >= len(data):
        raise VrlError("unable to parse cbor: truncated")
    ib = data[i]
    major, info = ib >> 5, ib & 0x1F
    i += 1

    def uint(n_info, j):
        if n_info < 24:
            return n_info, j
        size = {24: 1, 25: 2, 26: 4, 27: 8}.get(n_info)
        if size is None:
            raise VrlError("unable to parse cbor: bad length")
        if j + size > len(data):
            raise VrlError("unable to parse cbor: truncated")
        return int.from_bytes(data[j:j + size], "big"), j + size

    if major == 0:
        return uint(info, i)
    if major == 1:
        n, i = uint(info, i)
        return -1 - n, i
    if major == 2 or major == 3:
        n, i = uint(info, i)
        if i + n > len(data):
            raise VrlError("unable to parse cbor: truncated")
        raw = data[i:i + n]
        return (raw.decode("utf-8", "replace") if major == 3 else raw), i + n
    if major == 4:
        n, i = uint(info, i)
        out = []
        for _ in range(n):
            v, i = _cbor_decode(data, i)
            out.append(v)
        return out, i
    if major == 5:
        n, i = uint(info, i)
        out = {}
        for _ in range(n):
            k, i = _cbor_decode(data, i)
            v, i = _cbor_decode(data, i)
            out[k if isinstance(k, str) else str(k)] = v
        return out, i
    if major == 6:  # tag: skip, decode inner
        _, i = uint(info, i)
        return _cbor_decode(data, i)
    # major 7: simple / float
    if info == 20:
        return False, i
    if info == 21:
        return True, i
    if info in (22, 23):
        return None, i
    if info == 25:
        (v,) = struct.unpack(">e", data[i:i + 2])
        return float(v), i + 2
    if info == 26:
        (v,) = struct.unpack(">f", data[i:i + 4])
        return float(v), i + 4
    if info == 27:
        (v,) = struct.unpack(">d", data[i:i + 8])
        return float(v), i + 8
    raise VrlError("unable to parse cbor: unsupported item")


def parse_cbor(value: bytes) -> Any:
    if isinstance(value, str):
        value = value.encode("latin-1")
    v, end = _cbor_decode(value, 0)
    if end != len(value):
        raise VrlError("unable to parse cbor: trailing bytes")
    return v


# ---------------------------------------------------------------------------
# parse_proto / encode_proto (parse_proto.rs, encode_proto.rs,
# src/protobuf/): protobuf by FileDescriptorSet file + message type

_DESC_CACHE: dict[str, Any] = {}


def _message_class(desc_file: str, message_type: str):
    key = f"{desc_file}::{message_type}"
    cls = _DESC_CACHE.get(key)
    if cls is not None:
        return cls
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    path = resolve_data_path(desc_file)
    fds = descriptor_pb2.FileDescriptorSet()
    with open(path, "rb") as f:
        fds.ParseFromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in fds.file:
        try:
            pool.Add(fd)
        except Exception:
            pass
    try:
        desc = pool.FindMessageTypeByName(message_type)
    except KeyError as e:
        raise VrlError(f"message type {message_type} not found") from e
    cls = message_factory.GetMessageClass(desc)
    _DESC_CACHE[key] = cls
    return cls


def parse_proto(value: bytes, desc_file: str, message_type: str) -> dict:
    from google.protobuf.json_format import MessageToDict

    if isinstance(value, str):
        value = value.encode("latin-1")
    cls = _message_class(desc_file, message_type)
    msg = cls()
    try:
        msg.ParseFromString(value)
    except Exception as e:
        raise VrlError(f"unable to parse protobuf: {e}") from e
    return MessageToDict(msg, preserving_proto_field_name=True)


def _rust_scalar_str(v) -> str:
    """Rust Display of the scalar (protobuf/encode.rs:189-200
    to_string calls): bool "true", f64 "123"/"1.5", chrono
    "YYYY-MM-DD HH:MM:SS[.f] UTC"."""
    import datetime as _dt
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        s = repr(v)
        return s[:-2] if s.endswith(".0") else s
    if isinstance(v, _dt.datetime):
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            base += (".%06d" % v.microsecond).rstrip("0")
        return base + " UTC"
    return str(v)


def _coerce_strings(value, desc, allow: bool):
    """protobuf/encode.rs:189-205: bool/int/float/timestamp values
    headed into proto `string` fields stringify when
    allow_lossy_string_coercion (default), else error."""
    import datetime as _dt
    from google.protobuf.descriptor import FieldDescriptor as FD
    if not isinstance(value, dict):
        return value
    out = {}
    for k, v in value.items():
        f = desc.fields_by_name.get(k)
        if f is None:
            out[k] = v
            continue

        def scalar(x, fname=k, fd=f):
            if fd.type == FD.TYPE_STRING and isinstance(
                    x, (bool, int, float, _dt.datetime)):
                if allow:
                    return _rust_scalar_str(x)
                from ..value import vrl_type
                raise VrlError(
                    f"Error converting {fname} field: Cannot encode "
                    f"`{vrl_type(x)}` into protobuf `string`")
            return x

        if f.message_type is not None and \
                f.message_type.GetOptions().map_entry:
            vf = f.message_type.fields_by_name["value"]
            if isinstance(v, dict):
                out[k] = {mk: (_coerce_strings(mv, vf.message_type, allow)
                               if vf.message_type else scalar(mv, k, vf))
                          for mk, mv in v.items()}
            else:
                out[k] = v
        elif f.message_type is not None:
            if f.is_repeated and isinstance(v, list):
                out[k] = [_coerce_strings(x, f.message_type, allow)
                          for x in v]
            else:
                out[k] = _coerce_strings(v, f.message_type, allow)
        elif f.is_repeated and isinstance(v, list):
            out[k] = [scalar(x) for x in v]
        else:
            out[k] = scalar(v)
    return out


def encode_proto(value: dict, desc_file: str, message_type: str,
                 allow_lossy_string_coercion: bool = True) -> bytes:
    from google.protobuf.json_format import ParseDict, ParseError

    cls = _message_class(desc_file, message_type)
    msg = cls()
    value = _coerce_strings(value, msg.DESCRIPTOR,
                            bool(allow_lossy_string_coercion))
    try:
        ParseDict(value, msg)
    except ParseError as e:
        raise VrlError(f"unable to encode protobuf: {e}") from e
    return msg.SerializeToString()


# ---------------------------------------------------------------------------
# parse_etld (parse_etld.rs): effective TLD via public suffix rules.
# The reference embeds the full PSL via the `psl` crate; we load the
# system copy of the same list (Debian `publicsuffix` package at
# /usr/share/publicsuffix/public_suffix_list.dat) when present, and
# fall back to a built-in ICANN-section subset on boxes without it.
# `psl:` still overrides with a caller-supplied file.

_SYSTEM_PSL = "/usr/share/publicsuffix/public_suffix_list.dat"

_BUILTIN_SUFFIXES = {
    # generic
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "io", "co", "me", "tv", "cc", "dev", "app", "ai", "xyz",
    "online", "site", "cloud", "store", "tech",
    # ccTLDs (flat)
    "us", "uk", "de", "fr", "nl", "be", "es", "it", "pt", "ch", "at",
    "se", "no", "dk", "fi", "pl", "cz", "ru", "ua", "jp", "kr", "cn",
    "tw", "hk", "sg", "in", "au", "nz", "br", "mx", "ar", "cl", "za",
    "ca", "ie", "il", "tr", "gr", "hu", "ro", "sk", "si", "lt", "lv",
    "ee", "is", "lu",
    # second-level public suffixes
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "gov.tw", "edu.tw",
    "com.hk", "org.hk", "gov.hk", "edu.hk",
    "com.sg", "org.sg", "gov.sg", "edu.sg",
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "edu.in", "res.in",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "org.ar", "gob.ar", "edu.ar",
    "co.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.tr", "org.tr", "gov.tr", "edu.tr",
    "com.es", "org.es", "gob.es", "edu.es", "nom.es",
    "co.it", "gov.it", "edu.it",
    "asso.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "edu.ru", "gov.ru", "msk.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "kiev.ua",
    "com.sa", "com.eg", "com.ng", "com.gh", "com.ke", "co.ke",
    "com.my", "com.ph", "com.vn", "com.id", "co.id", "or.id", "ac.id",
    "com.th", "co.th", "or.th", "ac.th", "go.th", "in.th",
}

_PSL_CACHE: dict[str, tuple[set, set, set]] = {}
# a PSL rule: dot-separated labels of letters/digits/-/_ (unicode
# labels allowed — the real list has IDN entries)
_PSL_RULE = _re.compile(r"^[\w\-]+(\.[\w\-]+)*$", _re.UNICODE)


def _psl_rule_ok(body: str) -> bool:
    """True if `body` looks like a PSL rule. `\\w` alone rejects IDN
    entries carrying combining marks (e.g. Devanagari virama in the
    real list), so allow Unicode mark categories too — while still
    rejecting structural characters (JSON braces, quotes, spaces)
    that signal a non-PSL file."""
    if _PSL_RULE.match(body):
        return True
    import unicodedata
    if not body or body.startswith(".") or body.endswith("."):
        return False
    for ch in body:
        if ch.isalnum() or ch in "-_.":
            continue
        if unicodedata.category(ch).startswith("M"):
            continue
        return False
    return ".." not in body


def _load_psl(path: str) -> tuple[set, set, set]:
    """Parse a PSL file → (rules, wildcard bases, exceptions)."""
    cached = _PSL_CACHE.get(path)
    if cached:
        return cached
    rules, wild, exc = set(), set(), set()
    with open(resolve_data_path(path), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            body = line[1:] if line.startswith("!") else \
                line[2:] if line.startswith("*.") else line
            # format validation (publicsuffix-crate parity: feeding a
            # non-PSL file must ERROR, parse_etld/custom_psl_file_
            # wrong_format.vrl): rules are dot-separated labels of
            # [letters digits - _ *], nothing else
            if not _psl_rule_ok(body):
                raise VrlError("Unable to parse psl file")
            if line.startswith("!"):
                exc.add(body)
            elif line.startswith("*."):
                wild.add(body)
            else:
                rules.add(body)
    if not rules and not wild and not exc:
        raise VrlError("Unable to parse psl file")
    _PSL_CACHE[path] = (rules, wild, exc)
    return rules, wild, exc


_DEFAULT_PSL_CACHE: Optional[tuple[set, set, set]] = None


def _default_psl() -> tuple[set, set, set]:
    """Full PSL from the OS `publicsuffix` package, else the subset."""
    global _DEFAULT_PSL_CACHE
    if _DEFAULT_PSL_CACHE is None:
        try:
            _DEFAULT_PSL_CACHE = _load_psl(_SYSTEM_PSL)
        except Exception:
            _DEFAULT_PSL_CACHE = (_BUILTIN_SUFFIXES, set(), set())
    return _DEFAULT_PSL_CACHE


def parse_etld(value: str, plus_parts: int = 0,
               psl: Optional[str] = None) -> dict:
    host = value.strip().strip(".").lower()
    if not host:
        # parse_etld.rs:185 interpolates the (emptied) input
        raise VrlError(f"unable to determine eTLD for {host}")
    labels = host.split(".")
    if psl:
        try:
            rules, wild, exc = _load_psl(psl)
        except VrlError as e:
            # the reference validates the psl argument at COMPILE time
            # (function::Error::InvalidArgument Display)
            raise VrlError("invalid argument") from e
    else:
        rules, wild, exc = _default_psl()

    etld = None
    known = False
    # longest matching rule wins (PSL algorithm)
    for start in range(len(labels)):
        cand = ".".join(labels[start:])
        parent = ".".join(labels[start + 1:])
        if cand in exc:
            etld, known = parent, True
            break
        if cand in rules:
            etld, known = cand, True
            break
        if parent and parent in wild:
            etld, known = cand, True
            break
    if etld is None:
        etld, known = labels[-1], False

    n_suffix = len(etld.split("."))
    plus_n = min(len(labels), n_suffix + max(0, int(plus_parts)))
    etld_plus = ".".join(labels[len(labels) - plus_n:])
    return {"etld": etld, "etld_plus": etld_plus, "known_suffix": known}


# ---------------------------------------------------------------------------
# validate_json_schema (validate_json_schema.rs)

_SCHEMA_CACHE: dict[str, Any] = {}


def validate_json_schema(value: str, schema_definition: str,
                         ignore_unknown_formats: bool = False) -> bool:
    import jsonschema

    path = resolve_data_path(schema_definition)
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        try:
            with open(path, encoding="utf-8") as f:
                schema = _json.load(f)
        except (OSError, ValueError) as e:
            raise VrlError(f"Failed to compile schema: {e}") from e
        _SCHEMA_CACHE[path] = schema

    checker = jsonschema.FormatChecker()
    if not ignore_unknown_formats:
        known = set(checker.checkers)
        unknown = {
            v for v in _iter_formats(schema) if v not in known
        }
        if unknown:
            raise VrlError(
                "Failed to compile schema: Unknown format: "
                f"{sorted(unknown)!r}. Adjust configuration to ignore "
                "unrecognized formats")

    if value == "" or (isinstance(value, bytes) and not value):
        # validate_json_schema.rs:237
        raise VrlError("Empty JSON value")
    try:
        instance = _json.loads(value)
    except ValueError as e:
        raise VrlError(f"Invalid JSON: {e}") from e

    def _rust_err(e) -> str:
        # the Rust jsonschema crate renders instances/format names via
        # serde_json Display (double quotes; Python's repr uses single)
        msg = e.message
        if e.validator == "format":
            msg = (f"{_json.dumps(e.instance)} is not a "
                   f"{_json.dumps(e.validator_value)}")
        path = "/" + "/".join(str(p) for p in e.absolute_path)
        return f"{msg} at {path or '/'}"

    try:
        validator = jsonschema.validators.validator_for(schema)(
            schema, format_checker=checker)
        errors = list(validator.iter_errors(instance))
    except jsonschema.SchemaError as e:
        raise VrlError(f"Failed to compile schema: {e.message}") from None
    if errors:
        # validate_json_schema.rs:249-270 joins EVERY error
        raise VrlError("JSON schema validation failed: "
                       + ", ".join(_rust_err(e) for e in errors))
    return True


def _iter_formats(schema):
    if isinstance(schema, dict):
        for k, v in schema.items():
            if k == "format" and isinstance(v, str):
                yield v
            else:
                yield from _iter_formats(v)
    elif isinstance(schema, list):
        for v in schema:
            yield from _iter_formats(v)
