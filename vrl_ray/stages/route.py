"""Route stage: predicate fan-out to K sinks.

VRL predicates are the route conditions (boolean-only, null/false
falsy — predicate.rs:41,113; `abort` and fallible-call errors route to
the reject lane, runtime.rs:120-126). Vector's `route` transform sends
an event to the FIRST matching route here (exclusive priority routing,
documented partitioning assumption) with `_unmatched` ≙ "default".

Ray design: ONE vectorized ``map_batches`` computes an ``int8
sink_id`` column; sinks are written in a single pass with
``write_parquet(partition_cols=["sink"])`` — no K re-executions of the
upstream pipeline and no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: sink_id -> name; order IS the routing priority
SINK_NAMES = ["errors", "high_risk", "server_errors", "slow", "default"]


def route_batch(batch: pa.Table) -> pa.Table:
    """Append ``sink_id:int8`` + ``sink:string``."""
    n = len(batch)

    def col(name):
        c = batch[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    parse_err = pc.is_valid(col("parse_err")).to_numpy(zero_copy_only=False)
    enrich_err = pc.is_valid(col("enrich_err")).to_numpy(zero_copy_only=False)
    role = col("role")
    risk = pc.fill_null(col("tool_risk"), 0).to_numpy(zero_copy_only=False)
    status = pc.fill_null(col("status"), 0).to_numpy(zero_copy_only=False)
    duration = pc.fill_null(col("duration"), 0.0).to_numpy(zero_copy_only=False)
    # null role is falsy (VRL predicate semantics: only null/false are
    # falsy — arithmetic.rs:159-187); fill before the numpy cast or a
    # single null row poisons the mask with object dtype
    is_tool = pc.fill_null(pc.equal(role, "tool"), False) \
        .to_numpy(zero_copy_only=False)

    # first-match-wins priority (np.select evaluates in order)
    sink_id = np.select(
        [
            parse_err | enrich_err,                 # 0 errors (abort/error lane)
            is_tool & (risk >= 3),                  # 1 high_risk
            status >= 500,                          # 2 server_errors
            duration > 5.0,                         # 3 slow
        ],
        [0, 1, 2, 3],
        default=4,                                  # 4 default
    ).astype(np.int8)

    names = pa.array(SINK_NAMES, pa.string())
    sink = pc.take(names, pa.array(sink_id, pa.int8()))
    out = batch.append_column("sink_id", pa.array(sink_id, pa.int8()))
    return out.append_column("sink", sink)
