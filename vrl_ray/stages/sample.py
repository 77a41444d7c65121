"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be reproducible across reruns and workers, so
both operators key on a CONTENT-derived hash (md5 of the id), not an
RNG: the same row always makes the same decision, resumable shards
agree, and a SQL engine can verify the exact output (md5 exists
everywhere — the driver's DuckDB oracle checks these row for row).

- :func:`hash_sample` — Bernoulli sample at ``fraction`` via an md5
  threshold; one stateless map, no shuffle.
- :func:`sample_k_per_key` — EXACTLY k rows per key (deterministic
  reservoir stand-in): rank rows by md5(id) within each key with the
  bounded-partition window machinery; one shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _md5_hex(batch_ids) -> list[str]:
    return [hashlib.md5(str(v).encode()).hexdigest()
            for v in batch_ids.to_pylist()]


def hash_sample(ds, *, id_column: str, fraction: float):
    """Keep rows whose md5(id) hex falls under the fraction threshold
    — deterministic Bernoulli sampling, stateless, shuffle-free."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return ds
    if fraction <= 0.0:
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow")
    # Compare numerically: a lexical compare against format(16**8) (9 hex
    # chars at fraction=1.0) would silently drop ~94% of rows.
    bound = int(fraction * 16 ** 8)

    def keep(b: pa.Table) -> pa.Table:
        hx = _md5_hex(b[id_column])
        mask = pa.array([int(h[:8], 16) < bound for h in hx])
        return b.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_k_per_key(ds, *, key: str, id_column: str, k: int,
                     num_partitions: int = 64):
    """Exactly min(k, group size) rows per key, chosen by md5(id)
    order — a deterministic per-key reservoir. Built on the
    bounded-partition window idiom (hash-partition → sort → segmented
    rank): Python cost is O(num_partitions), not O(keys)."""
    from .window import top_k_per_key

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_h", pa.array(_md5_hex(b[id_column]),
                                              pa.string()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    out = top_k_per_key(tagged, key=key, order_col="_h", k=k,
                        descending=False, tiebreak=id_column,
                        num_partitions=num_partitions)
    return out.drop_columns(["_h"])
