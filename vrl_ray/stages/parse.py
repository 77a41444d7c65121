r"""Parse stage: VRL parse_grok / parse_key_value / parse_json over the
``text`` column, vectorized, with an error lane.

The per-event program this stage vectorizes (reference semantics):

    if starts_with(.text, "{") {
        obj, err = parse_json(.text)            # parse_json.rs
    } else if match(.text, r'^\d{4}-\d{2}-\d{2}[T ]') {
        obj, err = parse_grok(.text, "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:message}")
    } else if match(.text, r'^[A-Za-z_@#.][\w@#.-]*\s*=') {
        obj, err = parse_key_value(.text)       # parse_key_value.rs defaults
    } else { err = "no parser matched input" }
    .status   = to_int(obj.status)   ?? null    # to_int.rs
    .duration = to_float(obj.duration) ?? null
    ...

Fallible results land in ``parse_err`` (infallible-assignment
semantics, assignment.rs:522-549) — data errors NEVER raise, so Ray
task retries stay idempotent.

State (compiled grok regex, per-key extractors) is built once per
worker process and reused across batches, the vectorized analogue of
compile-time pattern state (parse_grok.rs:148-169).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.vectorized import (
    VectorGrok, VectorKV, json_extract_typed,
    to_int64_lane, to_float64_lane, combine_str,
)

FLAGSHIP_GROK = "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:message}"
KV_KEYS = ["duration", "status", "path", "method"]
JSON_KEYS = ["status", "duration", "path"]

#: output columns appended by this stage (static schema — the analogue
#: of the compiler's inferred TypeState, SURVEY §1.3)
PARSE_FIELDS = [
    ("level", pa.string()),
    ("message", pa.string()),
    ("event_ts", pa.string()),
    ("status", pa.int64()),
    ("duration", pa.float64()),
    ("path", pa.string()),
    ("method", pa.string()),
    ("parse_fmt", pa.string()),
    ("parse_err", pa.string()),
]

_ERR_NO_PARSER = "no parser matched input"
_ERR_GROK = "unable to parse input with grok pattern"  # parse_grok.rs:23
_ERR_JSON = "unable to parse json"

_STATE = None


def _state():
    global _STATE
    if _STATE is None:
        _STATE = (VectorGrok(FLAGSHIP_GROK), VectorKV(KV_KEYS))
    return _STATE


def classify(texts: pa.Array):
    """Deterministic format classifier (shared with the row oracle):
    json | grok | kv | none, priority in that order."""
    is_json = pc.starts_with(texts, "{")
    is_grok = pc.match_substring_regex(texts, r"^\d{4}-\d{2}-\d{2}[T ]")
    is_kv = pc.match_substring_regex(texts, r"^[A-Za-z_@#.][A-Za-z0-9_@#.-]*\s*=")
    j = pc.fill_null(is_json, False).to_numpy(zero_copy_only=False)
    g = pc.fill_null(is_grok, False).to_numpy(zero_copy_only=False) & ~j
    k = pc.fill_null(is_kv, False).to_numpy(zero_copy_only=False) & ~j & ~g
    return j, g, k


def parse_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches kernel (batch_format="pyarrow")."""
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    grok, kv = _state()

    j_mask, g_mask, k_mask = classify(texts)

    # --- grok subset: RE2 pass over all rows (cheap, branchless),
    # exact Python fallback ONLY on grok-classified rows RE2 missed
    g_fields, g_matched = grok.extract(texts, consider=g_mask)

    # --- kv subset (RE2 on classified rows only, scatter back)
    kv_fields = kv.extract(texts, consider=k_mask)

    # --- json subset: RE2 flat-shape fast path, json.loads fallback
    # only for nested/escaped/malformed rows (~1% of the stream) —
    # the parse stage's only remaining Python loop (VERDICT r2 item 3)
    j_cols, j_ok = json_extract_typed(
        texts, j_mask,
        [("status", "int"), ("duration", "float"), ("path", "str")])

    ga = pa.array(g_mask & g_matched)
    ka = pa.array(k_mask)

    def masked(arr, mask_pa):
        return pc.if_else(mask_pa, arr, pa.nulls(n, arr.type))

    level = masked(g_fields["level"], ga)
    message = masked(g_fields["message"], ga)
    event_ts = masked(g_fields["timestamp"], ga)

    # status: kv (string) / json (number or string)
    kv_status = masked(kv_fields["status"], ka)
    kv_duration = masked(kv_fields["duration"], ka)
    kv_path = masked(kv_fields["path"], ka)
    kv_method = masked(kv_fields["method"], ka)

    jm = pa.array(j_mask & j_ok)

    status = pc.if_else(jm, j_cols["status"], to_int64_lane(kv_status))
    duration = pc.if_else(jm, j_cols["duration"],
                          to_float64_lane(kv_duration))
    path = pc.if_else(jm, j_cols["path"], kv_path)
    method = kv_method

    # parse_fmt + error lane
    fmt = np.full(n, None, dtype=object)
    fmt[k_mask] = "kv"
    fmt[g_mask] = "grok"
    fmt[j_mask] = "json"
    err = np.full(n, None, dtype=object)
    err[~(j_mask | g_mask | k_mask)] = _ERR_NO_PARSER
    err[g_mask & ~g_matched] = _ERR_GROK
    err[j_mask & ~j_ok] = _ERR_JSON

    out = batch
    for name, arr in [
        ("level", level), ("message", message), ("event_ts", event_ts),
        ("status", status), ("duration", duration), ("path", path),
        ("method", method),
        ("parse_fmt", pa.array(fmt, pa.string())),
        ("parse_err", pa.array(err, pa.string())),
    ]:
        out = out.append_column(name, arr)
    return out
