"""Single-process reference evaluator for the flagship pipeline.

Runs the SAME per-event program as the Ray stages but strictly
row-by-row through the row-level stdlib (``vrl_ray.functions``) — the
way the reference executes one event per ``Runtime::resolve``
(runtime.rs:96-128, sequential CLI loop cmd.rs:156-170). Pipeline
golden tests assert the Ray output equals this, row for row
(FIXTURES.md F5 equality gates).
"""

from __future__ import annotations

import re
from collections import Counter

from ..functions.parse import parse_json, parse_key_value, parse_grok
from ..functions.coerce import to_int, to_float
from ..value import VrlError
from ..stages.parse import FLAGSHIP_GROK
from ..stages.enrich import TOOL_TABLE, ROLE_TABLE, DEFAULT_CATEGORY, DEFAULT_RISK
from ..stages.route import SINK_NAMES

_GROK_LINE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]")
_KV_LINE = re.compile(r"^[A-Za-z_@#.][A-Za-z0-9_@#.-]*\s*=")


def oracle_transform(row: dict) -> dict:
    """One event through parse → enrich → route. Mutates/returns a new
    row dict with the same output columns as the Ray stages."""
    out = dict(row)
    text = row["text"]
    obj: dict = {}
    fmt = None
    err = None
    if text.startswith("{"):
        fmt = "json"
        try:
            o = parse_json(text)
            if isinstance(o, dict):
                obj = {k: v for k, v in o.items() if not isinstance(v, (dict, list))}
            else:
                err = "unable to parse json"
        except VrlError:
            err = "unable to parse json"
    elif _GROK_LINE.match(text):
        fmt = "grok"
        try:
            obj = parse_grok(text, FLAGSHIP_GROK)
        except VrlError:
            err = "unable to parse input with grok pattern"
    elif _KV_LINE.match(text):
        fmt = "kv"
        obj = parse_key_value(text)
    else:
        err = "no parser matched input"

    def _coerce(key, fn):
        v = obj.get(key)
        if v is None or isinstance(v, bool):
            return None
        try:
            return fn(v)
        except VrlError:
            return None  # `?? null` recovery

    out["level"] = obj.get("level") if fmt == "grok" else None
    out["message"] = obj.get("message") if fmt == "grok" else None
    out["event_ts"] = obj.get("timestamp") if fmt == "grok" else None
    out["status"] = _coerce("status", to_int) if fmt in ("kv", "json") else None
    out["duration"] = _coerce("duration", to_float) if fmt in ("kv", "json") else None
    p = obj.get("path") if fmt in ("kv", "json") else None
    out["path"] = p if isinstance(p, str) else None
    m = obj.get("method") if fmt == "kv" else None
    out["method"] = m if isinstance(m, str) else None
    out["parse_fmt"] = fmt
    out["parse_err"] = err

    # enrich
    tool = row["tool"]
    if tool == "" or tool is None:
        out["tool_category"], out["tool_risk"], out["enrich_err"] = "", 0, None
    elif tool in TOOL_TABLE:
        cat, risk = TOOL_TABLE[tool]
        out["tool_category"], out["tool_risk"], out["enrich_err"] = cat, risk, None
    else:
        out["tool_category"], out["tool_risk"] = DEFAULT_CATEGORY, DEFAULT_RISK
        out["enrich_err"] = f"tool not found in enrichment table: {tool}"
    rc, human = ROLE_TABLE.get(row["role"], ("other", False))
    out["role_class"], out["is_human"] = rc, human

    # route (first-match priority, route.py order)
    status = out["status"] or 0
    duration = out["duration"] or 0.0
    if out["parse_err"] is not None or out["enrich_err"] is not None:
        sid = 0
    elif row["role"] == "tool" and out["tool_risk"] >= 3:
        sid = 1
    elif status >= 500:
        sid = 2
    elif duration > 5.0:
        sid = 3
    else:
        sid = 4
    out["sink_id"] = sid
    out["sink"] = SINK_NAMES[sid]
    return out


def oracle_aggregate(rows: list[dict]):
    """Per-sink counts keyed (sink, tool) and (sink, conv_id)."""
    by_tool: Counter = Counter()
    by_conv: Counter = Counter()
    for r in rows:
        by_tool[(r["sink"], r["tool"])] += 1
        by_conv[(r["sink"], r["conv_id"])] += 1
    return by_tool, by_conv
