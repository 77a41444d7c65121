"""Aggregate stage: skew-aware two-phase grouped counts.

A bare ``ds.groupby(keys).count()`` shuffles EVERY row — with
zipf-skewed conv_ids the hot key's partition straggles. Two-phase
instead (SURVEY §2.3 / §7 Phase 6):

1. map-side partial: inside ``map_batches``, group the batch with
   pyarrow's hash kernel and emit one row per distinct key per batch
   (combiner);
2. final: ``groupby(keys).sum("n")`` over the much smaller partials.

The shuffle then moves O(distinct keys x blocks) rows instead of
O(rows), and a hot conv_id contributes one partial row per block —
skew is flattened before the exchange.
"""

from __future__ import annotations

import pyarrow as pa


def _partial_counts(keys):
    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            empty = {k: pa.array([], batch.schema.field(k).type) for k in keys}
            empty["n"] = pa.array([], pa.int64())
            return pa.table(empty)
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["n"])
    return partial


def count_by(ds, keys: list[str]):
    """Two-phase distributed count; returns a Dataset with columns
    ``keys + ['n']``."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(_partial_counts(keys), batch_format="pyarrow")
    out = partials.groupby(keys).aggregate(Sum("n", alias_name="n"))
    return out
