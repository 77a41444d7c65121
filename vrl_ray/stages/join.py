"""Join stages.

Two shapes, chosen by side size (SURVEY §2.3 enrich row):

- :func:`broadcast_join` — small side shipped ONCE via ``ray.put``,
  resolved per actor in ``__init__``, probed vectorized per batch
  (dictionary-encode + take). No shuffle; the Ray-native analogue of a
  broadcast hash join. Use whenever one side fits in worker memory
  (enrichment tables, dimensions).
- native ``Dataset.join`` (hash shuffle both sides) for big⋈big —
  used directly by callers; partitioning assumption: both sides are
  hash-partitioned on the key by ``num_partitions``.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


def join_partitions(requested: Optional[int] = None,
                    lo: int = 2, hi: int = 256, *,
                    rows: Optional[int] = None,
                    rows_per_partition: int = 2_000_000) -> int:
    """Size a hash-join's ``num_partitions`` to the DATA first, the
    cluster second. The shuffle spawns one aggregator actor per
    partition (capped at 64), each holding CPU slots — so partitions ≫
    cores starve the map side (a 16-partition join deadlocks a 4-CPU
    test session), and the per-partition fixed cost is large: measured
    A/B on one 32-CPU node, an 80 k-row self-join runs 9.3 s at 16
    partitions vs 3.1 s at 2, and even a 2 M-row join is 2.6 s at 2-4
    partitions vs 17 s at 16 (r4). Oversizing the partition count is
    never free.

    - ``rows``: pass the larger input side's row count when it is
      known (already-materialized input, or a metadata-only count on a
      pruned read) — partitions = ceil(rows / rows_per_partition),
      clamped to [lo, min(hi, ncpu/2)]. ~2 M rows per aggregator
      amortizes the fixed cost and stays well inside a worker heap at
      typical row widths; at 100-TB scale this yields hundreds of
      partitions (the hi cap), exactly the multi-node sweet spot.
    - ``requested``: explicit override for callers whose per-partition
      size would exceed worker memory; clamped to the same cap.
    - neither: half the cluster CPUs (the unknown-size fallback)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cap = max(lo, min(hi, ncpu // 2))
    if requested is not None:
        return max(lo, min(requested, cap))
    if rows is not None:
        need = -(-max(rows, 1) // rows_per_partition)
        return max(lo, min(need, cap))
    return cap


def drop_empty_blocks(mat):
    """Rebuild a MATERIALIZED dataset without its empty blocks.

    Distributed groupbys/joins emit empty partitions as zero-column
    blocks (no schema), which a downstream Acero hash join rejects
    ("No match ... for key field on left side"); ``map_batches`` can't
    fix them because Ray skips empty blocks in map operators. This
    inspects only block METADATA (num_rows) — block data never moves
    to the driver. Returns None when every block is empty."""
    import ray.data as rd

    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(block_ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


def broadcast_join(ds, small: "pa.Table", on: str, right_on: Optional[str] = None,
                   columns: Optional[list[str]] = None, concurrency=None,
                   how: str = "inner"):
    """Broadcast-hash-join `ds` (big, streaming) with `small` (a
    pyarrow Table): ship the small side once, probe per batch.

    how="inner" drops non-matching rows; "left" keeps them with nulls.
    """
    import ray

    right_on = right_on or on
    if columns is None:
        columns = [c for c in small.column_names if c != right_on]
    small_ref = ray.put(small.select([right_on] + columns))

    class Probe:
        def __init__(self):
            t = ray.get(small_ref)
            self.keys = {v: i for i, v in enumerate(t[right_on].to_pylist())}
            self.cols = {c: t[c] for c in columns}

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch[on]
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            enc = k.dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            # map unique keys -> row index in small (or null)
            idx = pa.array([self.keys.get(u) for u in uniq], pa.int64())
            row_idx = pc.take(idx, enc.indices)
            out = batch
            for c in columns:
                out = out.append_column(c, pc.take(self.cols[c], row_idx))
            if how == "inner":
                out = out.filter(pc.is_valid(row_idx))
            return out

    if concurrency is None:
        from .pool import fixed_pool

        concurrency = fixed_pool()
    return ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=concurrency)
