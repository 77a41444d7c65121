"""Enrich stage: VRL enrichment-table-style lookups as an actor pool.

Per-event program this stage vectorizes:

    row, err = get_enrichment_table_record("tools", {"tool": .tool})
    .tool_category = row.category ?? "unknown"   # default + error —
    .tool_risk     = row.risk     ?? 2           # infallible-assignment
    .enrich_err    = err                         # (assignment.rs:522-549)
    .role_class, .is_human = lookup("roles", .role)

Ray design: a callable CLASS passed to ``map_batches(Enrich,
concurrency=N, batch_size=B)`` — the dictionaries are built ONCE per
actor in ``__init__`` (broadcast-small-side join semantics; the
analogue of VRL baking lookup state into expression nodes at compile
time, parse_grok.rs:148-169). Lookups are vectorized via
dictionary-encode + table over the (tiny) dictionary, never per-row
over the batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# FIXTURES.md F3: tool -> (category, risk_level)
TOOL_TABLE: dict[str, tuple[str, int]] = {
    "bash": ("shell", 4),
    "edit": ("fs_write", 3),
    "write": ("fs_write", 3),
    "read": ("fs_read", 1),
    "grep": ("search", 1),
    "glob": ("search", 1),
    "search": ("search", 1),
    "fetch": ("network", 3),
    "browser": ("network", 3),
    "sql": ("data", 2),
    "notebook": ("code", 2),
    "task": ("orchestration", 2),
}
DEFAULT_CATEGORY, DEFAULT_RISK = "unknown", 2

# role -> (role_class, is_human)
ROLE_TABLE: dict[str, tuple[str, bool]] = {
    "user": ("human", True),
    "assistant": ("model", False),
    "system": ("control", False),
    "tool": ("machine", False),
}

ENRICH_FIELDS = [
    ("tool_category", pa.string()),
    ("tool_risk", pa.int32()),
    ("role_class", pa.string()),
    ("is_human", pa.bool_()),
    ("enrich_err", pa.string()),
]


def load_enrichment_table(path: str) -> dict:
    """Load a Vector-style enrichment table: first column is the key,
    remaining columns the enrichment payload (CSV or Parquet).
    Returns {key: tuple(payload...)}."""
    import os

    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
    else:
        import pyarrow.csv as pacsv

        t = pacsv.read_csv(path)
    if t.num_columns < 2:
        raise ValueError(f"enrichment table {path} needs >=2 columns")
    keys = t.column(0).to_pylist()
    rest = [t.column(i).to_pylist() for i in range(1, t.num_columns)]
    return {k: tuple(col[i] for col in rest) for i, k in enumerate(keys)}


_ENRICH_CACHE: dict = {}


def enrich_batch(batch: pa.Table, *, tool_table_path=None) -> pa.Table:
    """Task-pool form of :class:`Enrich`: the lookup dicts build once
    per WORKER PROCESS (keyed by the table source), so plain tasks get
    actor-like state reuse without a dedicated pool."""
    st = _ENRICH_CACHE.get(tool_table_path)
    if st is None:
        st = _ENRICH_CACHE[tool_table_path] = Enrich(
            tool_table_path=tool_table_path)
    return st(batch)


class Enrich:
    """Actor-pool stage: ``ds.map_batches(Enrich, concurrency=N,
    batch_format="pyarrow")``; prefer :func:`enrich_batch` (tasks)
    unless per-actor state must be pinned."""

    def __init__(self, tool_table: Optional[dict] = None,
                 role_table: Optional[dict] = None,
                 tool_table_path: Optional[str] = None):
        # Once per actor. In a multi-node deployment the tables arrive
        # via ray.put-broadcast object refs resolved here; defaults are
        # module constants (zero-cost). ``tool_table_path`` loads a
        # Vector-style enrichment table file (CSV with key,category,
        # risk columns, or parquet) — the file is read once per actor,
        # exactly like VRL's enrichment-table setup phase.
        if tool_table_path is not None:
            tool_table = load_enrichment_table(tool_table_path)
        self.tools = dict(tool_table or TOOL_TABLE)
        self.roles = dict(role_table or ROLE_TABLE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tools = batch["tool"]
        if isinstance(tools, pa.ChunkedArray):
            tools = tools.combine_chunks()

        # Vectorized lookup: dictionary-encode the column (tiny
        # dictionary), map the dictionary through the python dict,
        # take() back out — O(unique) python work per batch.
        d = tools.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        cats, risks, errs = [], [], []
        for u in uniq:
            m = self.tools.get(u)
            if m is not None:
                cats.append(m[0]); risks.append(m[1]); errs.append(None)
            elif u == "" or u is None:
                # non-tool turn: no lookup attempted, no error
                cats.append(""); risks.append(0); errs.append(None)
            else:
                cats.append(DEFAULT_CATEGORY); risks.append(DEFAULT_RISK)
                errs.append(f"tool not found in enrichment table: {u}")
        tool_category = pc.take(pa.array(cats, pa.string()), d.indices)
        tool_risk = pc.take(pa.array(risks, pa.int32()), d.indices)
        enrich_err = pc.take(pa.array(errs, pa.string()), d.indices)

        roles = batch["role"]
        if isinstance(roles, pa.ChunkedArray):
            roles = roles.combine_chunks()
        rd = roles.dictionary_encode()
        runiq = rd.dictionary.to_pylist()
        rc = [self.roles.get(u, ("other", False))[0] for u in runiq]
        rh = [self.roles.get(u, ("other", False))[1] for u in runiq]
        role_class = pc.take(pa.array(rc, pa.string()), rd.indices)
        is_human = pc.take(pa.array(rh, pa.bool_()), rd.indices)

        out = batch
        for name, arr in [
            ("tool_category", tool_category), ("tool_risk", tool_risk),
            ("role_class", role_class), ("is_human", is_human),
            ("enrich_err", enrich_err),
        ]:
            out = out.append_column(name, arr)
        return out
