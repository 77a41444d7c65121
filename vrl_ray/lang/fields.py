"""Static input-column analysis: which top-level event fields does a
VRL program (or a datadog route query) READ?  Used to prune parquet
reads (`columns=[...]`) in the declarative builder's resumable path —
at 100 TB, reading every column for a two-column transform is the
difference between a storage-bound and a compute-bound job
(VERDICT r2 finding 2).

Conservative by construction: any whole-event access (``.``, dynamic
path, free-text query term) returns ``None`` = "cannot prune".  The
result is a SUPERSET of reads (targets of writes are included — they
may be read-modify-write via ``|=`` or later statements), which is
always safe to intersect with the file schema.
"""

from __future__ import annotations

from typing import Optional


class _WholeEvent(Exception):
    """A construct touches the whole event — pruning impossible."""


def _segs_root(segs) -> list:
    """First path segment → candidate field names, or raise."""
    if not segs:
        raise _WholeEvent
    s0 = segs[0]
    if isinstance(s0, str):
        return [s0]
    if isinstance(s0, (list, tuple)) and all(isinstance(x, str) for x in s0):
        return list(s0)            # coalesce segment .(a | b)
    raise _WholeEvent              # dynamic / index-rooted path


def _walk(node, out: set):
    if isinstance(node, tuple) and len(node) >= 3 and node[0] == "path" \
            and node[1] == "event":
        out.update(_segs_root(node[2]))
        # nested segments can hold coalesce sub-paths — no event roots
        # below, so stop here
        return
    if isinstance(node, (tuple, list)):
        for child in node:
            _walk(child, out)


def referenced_event_fields(source: str) -> Optional[set]:
    """Top-level event fields a VRL program touches, or ``None`` when
    the program accesses the whole event (``.``/dynamic paths) or does
    not parse (the runtime stage will surface the parse error)."""
    from .parser import parse

    try:
        ast = parse(source)
    except Exception:
        return None
    out: set = set()
    try:
        _walk(ast, out)
    except _WholeEvent:
        return None
    return out


def query_event_fields(query: str) -> Optional[set]:
    """Top-level event fields a datadog route query reads, or ``None``
    for free-text terms (which scan every field)."""
    from ..functions.datadog_query import _P, _tokenize

    try:
        node = _P(_tokenize(query)).parse()
    except Exception:
        return None

    out: set = set()

    def walk(n):
        if not isinstance(n, tuple):
            return
        if n[0] == "term":
            attr = n[1]
            if attr is None:
                raise _WholeEvent
            out.add(attr.lstrip("@").split(".", 1)[0])
            return
        for child in n[1:]:
            walk(child)

    try:
        walk(node)
    except _WholeEvent:
        return None
    return out


def spec_input_columns(spec, extra: Optional[set] = None) -> Optional[list]:
    """Input columns a PipelineSpec needs: program reads + route-query
    fields + aggregate/window/dedup keys (+ ``extra``).  ``None`` when
    any component defeats static analysis.  Intersect with the file
    schema before passing to ``read_parquet(columns=...)`` — program
    OUTPUT fields land in the superset but may not exist on disk."""
    fields = referenced_event_fields(spec.program)
    if fields is None:
        return None
    for _name, q in spec.routes:
        qf = query_event_fields(q)
        if qf is None:
            return None
        fields |= qf
    for ks in spec.aggregates.values():
        fields |= {k for k in ks if k != "sink"}
    for w in spec.windows.values():
        fields |= {c for c in ([w.get("key"), w.get("ts"), w.get("value"),
                                w.get("order_col"), w.get("tiebreak")]
                               + list(w.get("order_by", []))
                               + list(w.get("keep", []))) if c}
    if spec.dedup:
        fields |= {spec.dedup["column"], spec.dedup["id_column"]}
    if extra:
        fields |= set(extra)
    return sorted(fields)
